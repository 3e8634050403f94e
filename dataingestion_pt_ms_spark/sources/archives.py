"""Archive-container sources (round 8, VERDICT r7 #7): WARC and TAR.

A raw web crawl lands in object storage as a few thousand MULTI-MEMBER
archive files (Common Crawl ships ~1 GB ``.warc.gz`` segments; curated
dumps often arrive as TARs of page files). The scan unit Spark gives us is
the FILE (``binaryFile``: one row per archive, content as one binary
column); the processing unit the pipeline needs is the MEMBER (one row per
archived page). These operators do that split EXECUTOR-SIDE — the driver
never lists, downloads, or walks an archive — so a 10^4-archive crawl
fans out across the cluster with one row per archive in flight and one
Arrow batch of member rows out the other end.

Same codec-free discipline as operators/multimodal.py: the WARC walker is
a first-principles implementation of the ISO 28500 record grammar
(version line, CRLF header block, Content-Length payload, CRLF CRLF
separator) plus the per-record-gzip member framing of ``.warc.gz``
(RFC 1952 magic + zlib with the gzip wrapper, chained via
``Decompress.unused_data``); the TAR side is stdlib ``tarfile`` over an
in-memory buffer (ustar is a stdlib affair — no third-party dep).

Reference parity: the reference ingests remote payloads one HTTP response
at a time (``app/alpaca_service.py:117-135``); an archive source is that
same acquisition step re-shaped for batch scale — the fetch already
happened, the engine re-plays it from the container.

Scale notes: each archive is held in memory once per task (Common-Crawl
sized segments are ~1 GB — size ``spark.sql.files.maxPartitionBytes`` /
executor memory so one task holds a handful); members stream out as Arrow
batches, so downstream operators (HTML extract, curation gates) never see
the container. Splitting is CPU-trivial (header walks + inflate), so the
scan parallelism equals the archive count — exactly the geometry a
1000-executor crawl read wants.
"""

from __future__ import annotations

import gzip
import io
import tarfile
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"

WARC_RECORD_SCHEMA = (
    "archive string, record_offset long, warc_type string, "
    "target_uri string, record_id string, content_length long, "
    "http_status int, payload binary"
)

TAR_MEMBER_SCHEMA = (
    "archive string, member_name string, member_size long, payload binary"
)


def _gunzip_members(blob: bytes) -> bytes:
    """Concatenate every gzip member of a ``.warc.gz`` blob (one member per
    record, chained back to back per the WARC-gzip convention). A plain
    single-member gzip stream is the degenerate case of the same loop."""
    out = []
    rest = blob
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    return b"".join(out)


def _dechunk(body: bytes) -> bytes:
    """RFC 7230 §4.1 chunked framing → entity bytes (hex size lines,
    per-chunk CRLF, 0-size terminator; chunk extensions and trailers
    ignored). A malformed/truncated capture returns the INPUT unchanged
    — real crawls contain cut-off responses and a walker must not
    corrupt what it cannot prove is framing."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return bytes(body)
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body)
        pos = eol + 2
        if size == 0:
            return bytes(out)
        chunk = body[pos : pos + size]
        if len(chunk) < size:
            return bytes(body)
        out += chunk
        pos += size + 2  # the chunk's own trailing CRLF


def _decode_http_body(headers: dict[bytes, bytes], payload: bytes) -> bytes:
    """Entity bytes from a captured HTTP message body: chunked framing
    removed (Transfer-Encoding) then Content-Encoding gzip/x-gzip/
    deflate decompressed (both zlib-wrapped and raw-deflate forms, as
    real servers disagree). Undecodable bodies stay raw — downstream
    sniffing routes them as unknown instead of the task dying."""
    if b"chunked" in headers.get(b"transfer-encoding", b"").lower():
        payload = _dechunk(payload)
    enc = headers.get(b"content-encoding", b"").lower()
    if enc in (b"gzip", b"x-gzip"):
        try:
            payload = gzip.decompress(payload)
        except Exception:
            pass
    elif enc == b"deflate":
        try:
            payload = zlib.decompress(payload)
        except Exception:
            try:
                payload = zlib.decompress(payload, -zlib.MAX_WBITS)
            except Exception:
                pass
    return payload


def parse_warc(blob: bytes, archive: str) -> Iterator[tuple]:
    """Walk one (possibly per-record-gzipped) WARC blob, yielding one tuple
    per record: (archive, record_offset, warc_type, target_uri, record_id,
    content_length, http_status, payload). ``record_offset`` is the byte
    offset in the INFLATED stream (stable, engine-independent). For
    ``application/http`` response records the HTTP header block is split
    off: ``http_status`` carries the status-line code and ``payload`` the
    entity body; for every other record the raw block payload is kept and
    ``http_status`` is NULL."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(bytes(blob))
    else:
        blob = bytes(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate stray separators before a version line (robust resume)
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = blob.find(_CRLF2, pos)
        if head_end < 0:
            break
        header_block = blob[pos:head_end].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(
                f"{archive}: expected WARC version line at offset {pos}, "
                f"got {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in lines[1:]:
            key, sep, val = line.partition(":")
            if sep:
                headers[key.strip().lower()] = val.strip()
        clen = int(headers.get("content-length", "0"))
        body_start = head_end + len(_CRLF2)
        payload = blob[body_start : body_start + clen]
        http_status = None
        ctype = headers.get("content-type", "")
        if ctype.startswith("application/http") and payload[:5] == b"HTTP/":
            http_end = payload.find(_CRLF2)
            if http_end >= 0:
                status_line, _, header_rest = payload[:http_end].partition(
                    b"\r\n"
                )
                parts = status_line.split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    http_status = int(parts[1])
                hh: dict[bytes, bytes] = {}
                for hline in header_rest.split(b"\r\n"):
                    key, sep, val = hline.partition(b":")
                    if sep:
                        hh[key.strip().lower()] = val.strip()
                payload = _decode_http_body(
                    hh, payload[http_end + len(_CRLF2) :]
                )
        yield (
            archive,
            pos,
            headers.get("warc-type", ""),
            headers.get("warc-target-uri"),
            headers.get("warc-record-id"),
            clen,
            http_status,
            bytearray(payload),
        )
        pos = body_start + clen


def split_warc_records(
    df: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per WARC record from a DataFrame of whole archives
    (``binaryFile`` shape: one row per file). The split runs inside
    ``mapInPandas`` — executor-side, Arrow-batched, no driver involvement —
    so archives fan out across the cluster and members stream straight
    into downstream operators."""
    import pandas as pd

    cols = df.select(path_col, content_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                rows.extend(parse_warc(blob, str(path)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "archive",
                    "record_offset",
                    "warc_type",
                    "target_uri",
                    "record_id",
                    "content_length",
                    "http_status",
                    "payload",
                ],
            )

    return cols.mapInPandas(gen, WARC_RECORD_SCHEMA)


def split_tar_members(
    df: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per regular-file member from a DataFrame of whole TAR
    archives (plain or gzipped — ``tarfile`` sniffs the compression from
    the buffer). Directories / links are skipped; member order follows the
    archive, but output carries no order dependence (name + size + bytes)."""
    import pandas as pd

    cols = df.select(path_col, content_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        fh = tf.extractfile(m)
                        data = fh.read() if fh is not None else b""
                        rows.append(
                            (str(path), m.name, len(data), bytearray(data))
                        )
            yield pd.DataFrame(
                rows,
                columns=["archive", "member_name", "member_size", "payload"],
            )

    return cols.mapInPandas(gen, TAR_MEMBER_SCHEMA)


def split_zip_members(
    df: DataFrame, content_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per file member from a DataFrame of whole ZIP archives
    (round 10 — the third container format next to WARC and TAR; doc
    dumps and dataset drops commonly arrive zipped). stdlib ``zipfile``
    walks the central directory, so stored and deflated members, zip64
    and data-descriptor variants all read. Directory entries are
    skipped; the output carries no member-order dependence."""
    import pandas as pd
    import zipfile

    cols = df.select(path_col, content_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        # read via the ZipInfo, NOT the name: a foreign
                        # zip may carry duplicate member names (appended
                        # updates), and a by-name read would return the
                        # first entry's bytes for every duplicate
                        with zf.open(info) as fh:
                            data = fh.read()
                        rows.append(
                            (str(path), info.filename, len(data), bytearray(data))
                        )
            yield pd.DataFrame(
                rows,
                columns=["archive", "member_name", "member_size", "payload"],
            )

    return cols.mapInPandas(gen, TAR_MEMBER_SCHEMA)


def read_warc_files(
    spark: SparkSession, path: str, glob: str | None = "*.warc*"
) -> DataFrame:
    """The end-to-end crawl-dump source: distributed ``binaryFile`` listing
    over ``path`` (any Hadoop scheme) → executor-side record split."""
    from .readers import read_binary_files

    return split_warc_records(read_binary_files(spark, path, glob))


def read_tar_files(
    spark: SparkSession, path: str, glob: str | None = "*.tar*"
) -> DataFrame:
    from .readers import read_binary_files

    return split_tar_members(read_binary_files(spark, path, glob))


def read_zip_files(
    spark: SparkSession, path: str, glob: str | None = "*.zip"
) -> DataFrame:
    from .readers import read_binary_files

    return split_zip_members(read_binary_files(spark, path, glob))


# ---------------------------------------------------------------------------
# Writers (test/synthesis side): spec-shaped WARC / TAR bytes so engine
# tests and oracle-backed queries can build real archives deterministically.
# ---------------------------------------------------------------------------


def encode_warc_record(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """One ISO-28500 record: version line, headers, Content-Length, blank
    line, payload, record separator."""
    lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    if record_id is not None:
        lines.append(b"WARC-Record-ID: " + record_id.encode())
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    if content_type is not None:
        lines.append(b"Content-Type: " + content_type.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + _CRLF2 + payload + _CRLF2


def encode_http_response(
    body: bytes,
    content_type: str = "text/html",
    chunked: bool = False,
    gzip_body: bool = False,
) -> bytes:
    """A captured HTTP/1.1 response. ``chunked`` stores the body in
    RFC 7230 chunked framing (split deterministically into ≤512-byte
    chunks) and ``gzip_body`` applies Content-Encoding gzip BEFORE the
    chunking, both exactly as an origin server would — real crawl WARCs
    carry the raw capture, so the walker must undo both to hand
    downstream decoders entity bytes."""
    head = b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type.encode()
    if gzip_body:
        body = gzip.compress(body, compresslevel=6, mtime=0)
        head += b"\r\nContent-Encoding: gzip"
    if chunked:
        head += b"\r\nTransfer-Encoding: chunked"
        framed = bytearray()
        for i in range(0, len(body), 512):
            chunk = body[i : i + 512]
            framed += f"{len(chunk):x}".encode() + b"\r\n" + chunk + b"\r\n"
        framed += b"0\r\n\r\n"
        body = bytes(framed)
    return head + b"\r\n\r\n" + body


def encode_warc(records: list[bytes], per_record_gzip: bool = False) -> bytes:
    """Concatenate records into one archive; ``per_record_gzip=True``
    emits the standard ``.warc.gz`` member-per-record framing (mtime
    pinned to 0 so output is byte-deterministic)."""
    if not per_record_gzip:
        return b"".join(records)
    return b"".join(
        gzip.compress(r, compresslevel=6, mtime=0) for r in records
    )


def encode_zip(members: list[tuple[str, bytes]], compress: bool = True) -> bytes:
    """ZIP archive of (name, bytes) members with pinned metadata
    (epoch date_time, explicit unix create_system, fixed compresslevel)
    so the bytes are deterministic across runs and platforms."""
    import zipfile

    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.create_system = 3  # unix, pinned (platform-dependent default)
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, compress_type=method, compresslevel=6)
    return buf.getvalue()


def encode_tar(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    """ustar archive of (name, bytes) members with pinned metadata
    (mtime/uid/gid zero) so the bytes are deterministic."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw, compresslevel=6, mtime=0) if gz else raw
