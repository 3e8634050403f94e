"""PDF text extraction — the eighth media kind (round 9, VERDICT r8 #4).

Round 8's WARC ingestion made real crawl archives readable, and PDF is
the largest crawl payload type the curation head still dropped. Same
codec-free discipline as PNG (operators/multimodal.py) and HTML
(operators/htmltext.py): stdlib ``zlib`` for FlateDecode plus a
first-principles content-stream tokenizer over the PUBLIC PDF grammar
(ISO 32000-1 §7 syntax, §9.4 text-showing operators) — no PDF library.

Two halves, mirroring the archive/codec pattern:

- **encode** (``encode_text_ops`` + ``encode_pdf``): synthesize a
  structurally complete single-page PDF — catalog / pages / page / font
  objects, a (optionally FlateDecode-compressed) content stream, a byte-
  correct xref table and trailer — whose text is rendered through every
  text-showing operator class: ``Tj`` (plain show), ``'`` (next-line
  show), ``TJ`` (array show with kerning adjustments splitting strings
  mid-word), and hex strings, with ``Td``/``T*`` line advances and
  literal-string escapes (``\\(`` ``\\)`` ``\\\\``). Used by tests and
  by the ``multimodal_pdf_extract`` oracle recipe (synthesized per-doc
  PDFs whose expected extraction is recomputable from source columns —
  the text_html_extraction pattern).
- **decode** (``extract_pdf_text``): walk the raw bytes for content
  streams (``<<dict>> stream … endstream``), FlateDecode where the dict
  says so, then run a text-operator machine: literal strings with
  nesting, all spec escapes (``\\n \\r \\t \\b \\f \\( \\) \\\\``,
  3-digit octal, backslash-EOL continuation, raw EOL → 0x0A), hex
  strings (whitespace-tolerant, odd-digit zero-pad), ``Tj '' " TJ``
  shows, ``Td TD T* Tm`` line breaks, BT/ET blocks. TJ kerning
  adjustments ≤ −180 thousandths render as a space (the word-gap
  heuristic every extractor uses); smaller nudges are intra-word.

Round 10 (VERDICT r9 #2): decoding grew an OBJECT-GRAPH layer — a
byte-scanned object table (last definition wins, which is exactly the
incremental-update rule), /Type /ObjStm expansion (PDF 1.5 compressed
object streams), indirect ``/Length N 0 R`` resolution, trailer-or-
catalog /Root discovery, a /Pages tree walk, and per-page
concatenation of multi-``/Contents`` arrays — so structure variants a
foreign writer emits (xref STREAMS, object streams, CR-only EOLs,
tokens split across /Contents parts) extract correctly. The xref table
itself is never trusted: objects are found by scanning, never by
offset, which is also why damaged/lying xrefs don't matter. When no
catalog is discoverable the walker falls back to the round-9 behavior:
every decodable top-level stream in document order.

Composite fonts (round 10, closing the stated-scope gap): the text
machine now tracks the active font (``Tf``) per page, resolves each
font's **/ToUnicode CMap** (§9.10.3 — codespacerange + bfchar +
bfrange, incrementing and array forms) through the page's /Resources,
and decodes shown bytes through it as fixed-width codes — so Type0/CID
documents, where the byte stream is 2-byte glyph codes and UTF-8
decoding is guaranteed mojibake, extract their real text.
``encode_pdf_cid`` writes such a document with a deliberately
NON-identity code assignment, so every round-trip test proves the CMap
is load-bearing, not decorative.

Scope (stated, not hidden): byte strings decode as UTF-8 for simple
fonts — correct for the synthetic corpus and simple-font ASCII PDFs;
composite fonts decode through their ToUnicode CMap as above; a Type0
font WITHOUT a ToUnicode stream (predefined CMaps like pure
Identity-H) keeps the UTF-8 passthrough — mapping CIDs to text without
the embedded map needs external CMap tables, which a codec-free walker
does not ship. Streams
decode through /Filter chains of FlateDecode / ASCIIHexDecode /
ASCII85Decode (incl. arrays); anything else (DCT, LZW, font programs)
is skipped as not-a-text-stream. Encrypted documents (a trailer
``/Encrypt``) raise loudly instead of emitting mojibake. A /Contents
array split mid-TOKEN is nonconforming (§7.8.2: division only at token
boundaries) and stays out of scope; splits at token boundaries —
including inside a TJ array — are handled by page-level concatenation.
Multi-page documents extract in page-tree order.

At 100 TB: ``pdf_text_extract`` is one Arrow-batched ``mapInPandas``
pass over the binary column — embarrassingly parallel, no shuffle; the
extracted text feeds the existing quality/dedup/langid operators.
Reference provenance: beyond-reference [NS] (multimodal family).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Encoding: synthesize a minimal-but-complete PDF
# ---------------------------------------------------------------------------


def escape_pdf_string(s: bytes) -> bytes:
    """Escape the three bytes a literal string must escape."""
    return (
        s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def encode_text_ops(lines: list[str]) -> bytes:
    """One BT/ET block rendering ``lines`` through a deterministic cycle
    of show-operator styles (line i uses style i % 4):

    0. ``T*`` advance + literal-string ``Tj`` (first line: ``Td``);
    1. ``'`` — combined next-line-and-show;
    2. ``TJ`` array — the line split into three chunks with intra-word
       kerning nudges (−50 and 120: NOT word gaps) between them;
    3. ``T*`` advance + hex-string ``Tj`` with embedded whitespace.
    """
    out = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for i, line in enumerate(lines):
        raw = line.encode("utf-8")
        style = i % 4
        if style == 0:
            if i > 0:
                out.append(b"T*")
            out.append(b"(" + escape_pdf_string(raw) + b") Tj")
        elif style == 1:
            out.append(b"(" + escape_pdf_string(raw) + b") '")
        elif style == 2:
            if i > 0:
                out.append(b"T*")
            a, b, c = raw[:2], raw[2:5], raw[5:]
            parts = [b"[", b"(" + escape_pdf_string(a) + b")", b"-50"]
            parts += [b"(" + escape_pdf_string(b) + b")", b"120"]
            parts += [b"(" + escape_pdf_string(c) + b")", b"] TJ"]
            out.append(b" ".join(parts))
        else:
            if i > 0:
                out.append(b"T*")
            hx = raw.hex().upper().encode("ascii")
            spaced = b" ".join(hx[j : j + 8] for j in range(0, len(hx), 8))
            out.append(b"<" + spaced + b"> Tj")
    out.append(b"ET")
    return b"\n".join(out) + b"\n"


def encode_pdf(content: bytes | list[bytes], compress: bool = True) -> bytes:
    """Wrap one or more content streams in a structurally complete PDF —
    header, one page object PER content stream under a shared /Pages
    node, a byte-accurate xref table and a trailer — every offset real,
    so any spec-conformant reader (or this module's own walker) can
    parse it. ``content`` as bytes is the one-page form; a list builds a
    multi-page document (page order = list order = extraction order)."""
    pages = [content] if isinstance(content, (bytes, bytearray)) else list(content)
    n = len(pages)
    # object numbering: 1 catalog, 2 pages, then per page i (0-based):
    # 3+2i page, 4+2i content stream; font is the last object
    font_num = 3 + 2 * n
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("ascii"),
    ]
    for i, page_ops in enumerate(pages):
        stream = zlib.compress(bytes(page_ops), 6) if compress else bytes(page_ops)
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {4 + 2 * i} 0 R >>".encode("ascii")
        )
        objs.append(
            b"<< /Length "
            + str(len(stream)).encode("ascii")
            + b" "
            + filt
            + b">>\nstream\n"
            + stream
            + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    buf = bytearray(b"%PDF-1.4\n%\xc2\xa5\xc2\xb1\n")  # binary-marker comment
    offsets = [0]  # object 0 is the free head
    for n, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{n} 0 obj\n".encode("ascii") + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode("ascii")
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode("ascii")
    buf += (
        b"trailer\n<< /Size "
        + str(len(objs) + 1).encode("ascii")
        + b" /Root 1 0 R >>\nstartxref\n"
        + str(xref_at).encode("ascii")
        + b"\n%%EOF\n"
    )
    return bytes(buf)


def encode_cmap(mapping: dict[int, str]) -> bytes:
    """A minimal /ToUnicode CMap (§9.10.3): 2-byte codespace, bfchar
    blocks of ≤100 entries (the spec's block cap), UTF-16BE
    destinations (surrogate pairs for astral chars come free from
    Python's encoder)."""
    out = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    items = sorted(mapping.items())
    for i in range(0, len(items), 100):
        chunk = items[i : i + 100]
        out.append(f"{len(chunk)} beginbfchar".encode("ascii"))
        for code, ch in chunk:
            dst = ch.encode("utf-16-be").hex().upper()
            out.append(f"<{code:04X}> <{dst}>".encode("ascii"))
        out.append(b"endbfchar")
    out += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(out)


def encode_pdf_cid(lines: list[str], compress: bool = True) -> bytes:
    """Single-page Type0/CID document (round 10): every shown string is
    2-byte codes in a deliberately NON-identity assignment (code
    0x0100+i for the i-th distinct char), so the text is recoverable
    ONLY through the embedded /ToUnicode CMap — a UTF-8 or identity
    decode of the byte stream is guaranteed mojibake. This is the
    composite-font shape every CJK and most subsetted-font crawl PDFs
    use."""
    chars = sorted({ch for line in lines for ch in line})
    if len(chars) > 0xFEFF:
        raise ValueError("too many distinct chars for a 2-byte code page")
    code_of = {ch: 0x0100 + i for i, ch in enumerate(chars)}
    cmap = encode_cmap({c: ch for ch, c in code_of.items()})
    ops = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"T*")
        hx = "".join(f"{code_of[ch]:04X}" for ch in line)
        ops.append(b"<" + hx.encode("ascii") + b"> Tj")
    ops.append(b"ET")
    content = b"\n".join(ops) + b"\n"

    stream = zlib.compress(content, 6) if compress else content
    filt = b"/Filter /FlateDecode " if compress else b""
    cmap_z = zlib.compress(cmap, 6)
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(stream)).encode("ascii") + b" " + filt
        + b">>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-CID "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap_z)).encode("ascii")
        + b" /Filter /FlateDecode >>\nstream\n" + cmap_z + b"\nendstream",
    ]
    buf = bytearray(b"%PDF-1.4\n%\xc2\xa5\xc2\xb1\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{n} 0 obj\n".encode("ascii") + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode("ascii")
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode("ascii")
    buf += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode("ascii")
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode("ascii")
        + b"\n%%EOF\n"
    )
    return bytes(buf)


def normalize_corpus_line(s) -> str:
    """A corpus ``text`` value as ONE PDF text line, normalized so the
    encode→extract round trip is the identity on it (ADVICE r9): raw
    CR/CRLF fold to LF (the literal-string spec maps every raw EOL
    marker to 0x0A on extraction) and empty maps to a sentinel (the
    extractor drops empty lines at flush). Every oracle that recomputes
    an expected extraction mirrors this expression in SQL — see
    PDF_LINE_SQL next to PDF_EXTRACTION_ORACLE."""
    if s is None or (isinstance(s, float) and s != s):  # None / NaN
        s = ""
    t = str(s).replace("\r\n", "\n").replace("\r", "\n")
    return t if t else "(empty)"


def encode_pdf_objstm(content: bytes | list[bytes], compress: bool = True) -> bytes:
    """The PDF 1.5 form of :func:`encode_pdf` (round 10, VERDICT r9 #2):
    every non-stream object (catalog, pages node, page dicts, font)
    lives COMPRESSED inside a /Type /ObjStm object stream, and the
    cross-reference table is a binary /Type /XRef STREAM (W [1 4 2]
    fields, type-1 entries for top-level objects, type-2 for the
    ObjStm-packed ones) — the structure every modern writer emits and a
    table-only reader cannot open. Same page/content layout and object
    numbering as :func:`encode_pdf`, so extraction output is identical
    by construction."""
    import struct

    pages = [content] if isinstance(content, (bytes, bytearray)) else list(content)
    n = len(pages)
    font_num = 3 + 2 * n
    objstm_num = font_num + 1
    xref_num = objstm_num + 1
    size = xref_num + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    packed: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("ascii")),
    ]
    for i in range(n):
        packed.append(
            (
                3 + 2 * i,
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {4 + 2 * i} 0 R >>".encode("ascii"),
            )
        )
    packed.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    # ObjStm payload: "num off num off…\n" header, then the bodies at
    # those offsets (relative to /First = header length)
    offs, cur = [], 0
    for num, body in packed:
        offs.append(f"{num} {cur}")
        cur += len(body) + 1  # joined with a single \n below
    header = (" ".join(offs) + "\n").encode("ascii")
    payload = header + b"\n".join(body for _, body in packed)

    buf = bytearray(b"%PDF-1.5\n%\xc2\xa5\xc2\xb1\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(f"{num} 0 obj\n".encode("ascii") + body + b"\nendobj\n")

    for i, page_ops in enumerate(pages):
        stream = zlib.compress(bytes(page_ops), 6) if compress else bytes(page_ops)
        filt = b"/Filter /FlateDecode " if compress else b""
        emit(
            4 + 2 * i,
            b"<< /Length " + str(len(stream)).encode("ascii") + b" " + filt
            + b">>\nstream\n" + stream + b"\nendstream",
        )
    stm = zlib.compress(payload, 6)
    emit(
        objstm_num,
        f"<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Length {len(stm)} /Filter /FlateDecode >>".encode("ascii")
        + b"\nstream\n" + stm + b"\nendstream",
    )
    xref_at = len(buf)
    in_stm = {num: idx for idx, (num, _) in enumerate(packed)}
    rows = bytearray()
    rows += struct.pack(">BIH", 0, 0, 65535)  # object 0: free head
    for num in range(1, size):
        if num == xref_num:
            rows += struct.pack(">BIH", 1, xref_at, 0)
        elif num in offsets:
            rows += struct.pack(">BIH", 1, offsets[num], 0)
        else:
            rows += struct.pack(">BIH", 2, objstm_num, in_stm[num])
    xbody = zlib.compress(bytes(rows), 6)
    buf.extend(
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Index [0 {size}] /Root 1 0 R /Length {len(xbody)} "
        f"/Filter /FlateDecode >>".encode("ascii")
        + b"\nstream\n" + xbody + b"\nendstream\nendobj\n"
    )
    buf.extend(b"startxref\n" + str(xref_at).encode("ascii") + b"\n%%EOF\n")
    return bytes(buf)


# ---------------------------------------------------------------------------
# Decoding: content-stream discovery + text-operator machine
# ---------------------------------------------------------------------------

_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/\w+)")
_NAME_RE = re.compile(rb"/(\w+)")


def _apply_filters(body: bytes, d: bytes) -> bytes:
    """Run the dict's /Filter chain in decoding order. Supports the
    codec-free trio every text-bearing PDF uses — FlateDecode,
    ASCIIHexDecode, ASCII85Decode (PDF framing: no <~ prefix, ``~>``
    EOD) — including chained arrays like [/ASCII85Decode /FlateDecode].
    Raises ValueError on any other filter (image/font codecs), which the
    caller treats as not-a-text-stream."""
    fm = _FILTER_RE.search(d)
    if not fm:
        return body
    for name in _NAME_RE.findall(fm.group(1)):
        if name == b"FlateDecode":
            body = zlib.decompress(body)
        elif name == b"ASCIIHexDecode":
            digits = bytearray(c for c in body.split(b">")[0] if c not in _WS)
            if len(digits) % 2:
                digits.append(0x30)
            body = bytes.fromhex(digits.decode("ascii"))
        elif name == b"ASCII85Decode":
            import base64

            data = bytes(c for c in body if c not in _WS)
            if data.endswith(b"~>"):
                data = data[:-2]
            body = base64.a85decode(data)
        else:
            raise ValueError(f"unsupported filter {name!r}")
    return body
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\x0c",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}

# a TJ adjustment at or below this (thousandths of text-space units,
# subtracted from the advance) is a word gap; smaller nudges are kerning
_TJ_SPACE_THRESHOLD = -180.0


# --- object-graph layer (round 10, VERDICT r9 #2) ------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_KW_RE = re.compile(rb"\s*stream(?:\r\n|\n|\r)?")
_LEN_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R\b")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R\b")
_TYPE_RE = re.compile(rb"/Type\s*/(\w+)")
_SUBTYPE_RE = re.compile(rb"/Subtype\s*/(\w+)")
_INT_RE = re.compile(rb"^\s*(\d+)\s*$")

# stream /Type values that are structural, never page text: expanding an
# ObjStm is the graph layer's job; a decoded XRef stream is binary that
# the tokenizer must never see; Metadata is XML
_NON_TEXT_TYPES = {b"ObjStm", b"XRef", b"Metadata", b"EmbeddedFile"}
_NON_TEXT_SUBTYPES = {b"Image", b"XML", b"Type1C", b"CIDFontType0C", b"OpenType"}


def _dict_span(data: bytes, i: int) -> int:
    """``data[i:]`` starts at ``<<``; index just past the matching
    ``>>``, skipping literal strings and comments (a string may contain
    ``>>`` bytes)."""
    depth, n = 0, len(data)
    while i < n:
        two = data[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        elif data[i] == 0x28:  # (
            _, i = _parse_literal(data, i)
        elif data[i] == 0x25:  # % comment
            while i < n and data[i] not in (0x0D, 0x0A):
                i += 1
        else:
            i += 1
    return i


def _dict_int(d: bytes, key: bytes) -> int | None:
    """Direct integer value of /key (``/Length 42``); None when absent
    or indirect (``/Length 5 0 R`` must not read as 5)."""
    m = re.search(rb"/" + key + rb"\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", d)
    return int(m.group(1)) if m else None


def _dict_ref(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R\b", d)
    return int(m.group(1)) if m else None


def _dict_refs(d: bytes, key: bytes) -> list[int]:
    """/key as one ref or an array of refs (``/Contents 4 0 R`` and
    ``/Contents [4 0 R 5 0 R]``), in array order."""
    m = re.search(rb"/" + key + rb"\s*\[([^\]]*)\]", d)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R\b", m.group(1))]
    one = _dict_ref(d, key)
    return [one] if one is not None else []


def _scan_objects(data: bytes) -> tuple[dict[int, dict], list[dict]]:
    """Byte-scan the top-level object table: objnum → {"dict": dict
    bytes or None, "value": non-stream body bytes, "span": raw stream
    (start, end) or None, "at": file offset}. The scan position always
    advances PAST consumed dict/stream bytes, so Flate bodies that
    happen to contain ``<< /Length … stream`` byte runs can never shift
    object boundaries (ADVICE r9). Re-definitions overwrite — later
    offset wins, which is the incremental-update rule; the overwritten
    entries come back as the second element so the caller can suppress
    streams only a superseded revision referenced. The xref table is
    deliberately ignored: objects are found by scan, not offset, so
    lying or damaged xrefs cost nothing."""
    objs: dict[int, dict] = {}
    superseded: list[dict] = []
    pos = 0
    n = len(data)
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        i = m.end()
        while i < n and data[i] in _WS:
            i += 1
        d: bytes | None = None
        span = None
        if data[i : i + 2] == b"<<":
            dict_end = _dict_span(data, i)
            d = data[i + 2 : dict_end - 2]
            i = dict_end
            sm = _STREAM_KW_RE.match(data, i)
            if sm:
                start = sm.end()
                length = _dict_int(d, b"Length")
                exact = False
                if length is not None:
                    end = start + length
                    exact = data[end : end + 20].lstrip()[:9] == b"endstream"
                if not exact:
                    end = data.find(b"endstream", start)  # indirect/lying Length
                    if end < 0:
                        break  # truncated: stop scanning, keep what we have
                span = (start, end, exact)
                i = end
        eo = data.find(b"endobj", i)
        value = data[i:eo] if (span is None and eo >= 0) else b""
        if num in objs:
            superseded.append(objs[num])
        objs[num] = {"dict": d, "value": value.strip(), "span": span, "at": m.start()}
        pos = (eo + 6) if eo >= 0 else i
        if pos <= m.start():  # safety: always advance
            pos = m.end()
    # second pass: exact-slice bodies whose /Length was indirect, now that
    # the referenced integer object is in the table (a Flate body ending in
    # EOL bytes must not be rstripped — the round-9 lesson)
    for o in objs.values():
        d = o["dict"]
        if o["span"] is None or o["span"][2] or d is None:
            continue
        rm = _LEN_REF_RE.search(d)
        if not rm:
            continue
        ref = objs.get(int(rm.group(1)))
        if not ref:
            continue
        im = _INT_RE.match(ref["value"])
        if not im:
            continue
        start = o["span"][0]
        end = start + int(im.group(1))
        if data[end : end + 20].lstrip()[:9] == b"endstream":
            o["span"] = (start, end, True)
    return objs, superseded


def _body(data: bytes, o: dict) -> bytes | None:
    """Decoded stream body of a scanned object (filters applied); None
    when not a stream or not decodable."""
    if o["span"] is None:
        return None
    start, end, exact = o["span"]
    body = data[start:end]
    if not exact:
        # scan-derived span includes the pre-endstream EOL framing; an
        # EXACT span must not be stripped (Flate bodies may end in EOLs)
        body = body.rstrip(b"\r\n")
    try:
        return _apply_filters(body, o["dict"] or b"")
    except Exception:  # DCT/LZW/corrupt — not a text stream we can walk
        return None


def _expand_objstms(data: bytes, objs: dict[int, dict]) -> None:
    """Inline every /Type /ObjStm's compressed objects into the table
    (PDF 1.5+): the decoded stream is ``/First`` header bytes of
    (objnum, offset) int pairs, then the N object bodies — dict-only
    objects (streams cannot live inside an ObjStm). A top-level
    definition of the same objnum wins (it is either the only one or a
    newer incremental update)."""
    for o in list(objs.values()):
        d = o["dict"]
        if d is None or _TYPE_RE.search(d) is None:
            continue
        if _TYPE_RE.search(d).group(1) != b"ObjStm":
            continue
        first = _dict_int(d, b"First")
        count = _dict_int(d, b"N")
        decoded = _body(data, o)
        if decoded is None or first is None or count is None:
            continue
        try:
            header = [int(x) for x in decoded[:first].split()]
        except ValueError:
            continue
        pairs = list(zip(header[0::2], header[1::2]))[:count]
        for idx, (num, off) in enumerate(pairs):
            if num in objs:  # top-level (= newer or only) definition wins
                continue
            nxt = pairs[idx + 1][1] if idx + 1 < len(pairs) else len(decoded) - first
            content = decoded[first + off : first + nxt].strip()
            objs[num] = {
                "dict": content[2:-2] if content[:2] == b"<<" else None,
                "value": content,
                "span": None,
                "at": o["at"],
            }


def _find_root(data: bytes, objs: dict[int, dict]) -> int | None:
    """Catalog objnum: the LAST /Root reference in the file (trailer
    dicts and xref-stream dicts both carry it; last = newest update),
    else the newest object whose dict says /Type /Catalog."""
    roots = _ROOT_RE.findall(data)
    if roots:
        num = int(roots[-1])
        if num in objs:
            return num
    best = None
    for num, o in objs.items():
        d = o["dict"]
        if d is not None and re.search(rb"/Type\s*/Catalog\b", d):
            if best is None or o["at"] > objs[best]["at"]:
                best = num
    return best


def _check_encrypted(data: bytes) -> None:
    """Raise on encrypted documents (strings/streams are RC4/AES
    ciphertext — walking them would emit mojibake, not text). /Encrypt
    is looked for only inside trailer dicts and xref-stream dicts, not
    the whole byte stream, so page text MENTIONING /Encrypt can't
    false-positive."""
    regions = []
    for m in re.finditer(rb"trailer", data):
        regions.append(data[m.end() : m.end() + 2048])
    for m in re.finditer(rb"/Type\s*/XRef\b", data):
        lo = max(0, m.start() - 2048)
        regions.append(data[lo : m.start() + 2048])
    for r in regions:
        if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R\b", r):
            raise ValueError("encrypted PDF: cannot extract text")


# --- ToUnicode CMap resolution (round 10: composite-font text) ------------

_CSRANGE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.DOTALL)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CMAP_TOK_RE = re.compile(rb"<[0-9A-Fa-f\s]*>|\[|\]")


def _hx(tok: bytes) -> bytes:
    digits = re.sub(rb"[\s<>]", b"", tok)
    if len(digits) % 2:  # odd digit count zero-pads, as in hex strings
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _parse_cmap(body: bytes) -> tuple[int, dict[int, str]] | None:
    """(code byte-length, code → unicode) from a ToUnicode CMap stream:
    codespacerange sets the code width (default 2), bfchar maps single
    codes, bfrange maps runs — both the incrementing-destination and
    the per-code array forms (§9.10.3). Destinations are UTF-16BE."""
    codelen = 2
    m = _CSRANGE_RE.search(body)
    if m:
        toks = _CMAP_TOK_RE.findall(m.group(1))
        if toks and toks[0] not in (b"[", b"]"):
            codelen = max(1, len(_hx(toks[0])))
    table: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(body):
        toks = [t for t in _CMAP_TOK_RE.findall(m.group(1)) if t[:1] == b"<"]
        for i in range(0, len(toks) - 1, 2):
            table[int.from_bytes(_hx(toks[i]), "big")] = _hx(
                toks[i + 1]
            ).decode("utf-16-be", errors="replace")
    for m in _BFRANGE_RE.finditer(body):
        toks = _CMAP_TOK_RE.findall(m.group(1))
        i = 0
        while i + 1 < len(toks):
            if toks[i][:1] != b"<" or toks[i + 1][:1] != b"<":
                i += 1
                continue
            lo = int.from_bytes(_hx(toks[i]), "big")
            hi = int.from_bytes(_hx(toks[i + 1]), "big")
            if i + 2 < len(toks) and toks[i + 2] == b"[":
                j = i + 3
                code = lo
                while j < len(toks) and toks[j] != b"]":
                    if code <= hi:
                        table[code] = _hx(toks[j]).decode(
                            "utf-16-be", errors="replace"
                        )
                        code += 1
                    j += 1
                i = j + 1
            elif i + 2 < len(toks):
                dst = _hx(toks[i + 2])
                base = int.from_bytes(dst, "big")
                width = len(dst)
                for k in range(hi - lo + 1):
                    table[lo + k] = (base + k).to_bytes(width, "big").decode(
                        "utf-16-be", errors="replace"
                    )
                i += 3
            else:
                break
    return (codelen, table) if table else None


def _dict_value_dict(objs: dict[int, dict], d: bytes, key: bytes) -> bytes | None:
    """Inner dict bytes of /key — inline ``<< … >>`` or an indirect
    reference to a dict object."""
    m = re.search(rb"/" + key + rb"\s*<<", d)
    if m:
        end = _dict_span(d, m.end() - 2)
        return d[m.end() : end - 2]
    ref = _dict_ref(d, key)
    if ref is not None and ref in objs:
        return objs[ref]["dict"]
    return None


def _page_font_table(
    data: bytes, objs: dict[int, dict], page_d: bytes
) -> dict[bytes, tuple[int, dict[int, str]]]:
    """Font name → parsed ToUnicode CMap for one page's /Resources
    /Font dict. /Resources is INHERITABLE (§7.7.3.4): a page without
    its own entry walks /Parent up the Pages tree — writers commonly
    hoist a shared font dict to the root node. Fonts without a
    ToUnicode stream are simply absent — the text machine falls back
    to the UTF-8 passthrough for them."""
    res = _dict_value_dict(objs, page_d, b"Resources")
    seen: set[int] = set()
    d = page_d
    while not res:  # inherit from the Pages tree
        parent = _dict_ref(d, b"Parent")
        if parent is None or parent in seen or parent not in objs:
            break
        seen.add(parent)
        d = objs[parent]["dict"] or b""
        res = _dict_value_dict(objs, d, b"Resources")
    if not res:
        return {}
    fdict = _dict_value_dict(objs, res, b"Font")
    if not fdict:
        return {}
    fonts: dict[bytes, tuple[int, dict[int, str]]] = {}
    for name, num in re.findall(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fdict):
        fo = objs.get(int(num))
        if not fo or fo["dict"] is None:
            continue
        tu = _dict_ref(fo["dict"], b"ToUnicode")
        if tu is None or tu not in objs:
            continue
        body = _body(data, objs[tu])
        if body is None:
            continue
        cm = _parse_cmap(body)
        if cm:
            fonts[name] = cm
    return fonts


def _page_nums(objs: dict[int, dict], node: int, seen: set[int]) -> list[int]:
    """Leaf page objnums under a /Pages tree node, in /Kids order;
    cycle-safe."""
    if node in seen or node not in objs:
        return []
    seen.add(node)
    d = objs[node]["dict"]
    if d is None:
        return []
    tm = _TYPE_RE.search(d)
    if tm and tm.group(1) == b"Page":
        return [node]
    out: list[int] = []
    for kid in _dict_refs(d, b"Kids"):
        out.extend(_page_nums(objs, kid, seen))
    return out


def _page_streams(data: bytes) -> list[tuple[bytes, dict]]:
    """(content, font table) pairs to tokenize, in reading order.
    Graph path: one CONCATENATED blob per page (multi-/Contents arrays
    joined with a newline — §7.8.2 says the parts form a single stream
    with divisions only at token boundaries, so a separator is safe and
    a TJ array may legally open in one part and close in the next) with
    that page's resolved ToUnicode fonts, followed by any decodable
    top-level streams the page walk didn't consume (appended
    annotation/Form content keeps extracting, as in round 9) — except
    streams only a SUPERSEDED incremental-update revision referenced
    (the old page's content must not resurface after an update).
    Fallback path (no discoverable catalog): every decodable top-level
    stream in document order, minus structural kinds (ObjStm/XRef/
    Metadata/images/fonts), with no font context."""
    objs, superseded = _scan_objects(data)
    _expand_objstms(data, objs)
    current_refs: set[int] = set()
    for o in objs.values():
        for src in (o["dict"] or b"", o["value"]):
            current_refs.update(
                int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R\b", src)
            )
    stale: set[int] = set()
    for o in superseded:
        for src in (o["dict"] or b"", o["value"]):
            stale.update(int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R\b", src))
    stale -= current_refs
    consumed: set[int] = set()
    out: list[tuple[bytes, dict]] = []
    root = _find_root(data, objs)
    if root is not None:
        cat = objs[root]["dict"]
        pages_ref = _dict_ref(cat or b"", b"Pages")
        if pages_ref is not None:
            for page in _page_nums(objs, pages_ref, set()):
                page_d = objs[page]["dict"] or b""
                parts = []
                for ref in _dict_refs(page_d, b"Contents"):
                    if ref in objs:
                        body = _body(data, objs[ref])
                        if body is not None:
                            parts.append(body)
                            consumed.add(ref)
                if parts:
                    out.append(
                        (b"\n".join(parts), _page_font_table(data, objs, page_d))
                    )
    for num in sorted(objs, key=lambda k: objs[k]["at"]):
        o = objs[num]
        if num in consumed or num in stale or o["span"] is None:
            continue
        d = o["dict"] or b""
        tm, sm = _TYPE_RE.search(d), _SUBTYPE_RE.search(d)
        if tm and tm.group(1) in _NON_TEXT_TYPES:
            continue
        if sm and sm.group(1) in _NON_TEXT_SUBTYPES:
            continue
        if _dict_int(d, b"Length1") is not None:  # embedded font program
            continue
        body = _body(data, o)
        if body is not None:
            # a ToUnicode CMap stream is structural, not page text (its
            # hex tokens carry no show operators, but skip it outright)
            if body.lstrip().startswith(b"/CIDInit"):
                continue
            out.append((body, {}))
    return out


def _content_streams(data: bytes) -> list[bytes]:
    """Decoded content bodies only — the round-9 surface, kept for
    callers that don't need font context."""
    return [body for body, _ in _page_streams(data)]


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at ``data[i] == '('``; returns
    (decoded bytes, index past the closing paren). All §7.3.4.2 escape
    forms; a raw EOL marker becomes 0x0A."""
    depth, out = 1, bytearray()
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_digits = bytearray([e])
                i += 1
                while (
                    i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37
                ):
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode("ascii"), 8) & 0xFF)
            elif e in (0x0D, 0x0A):  # line continuation: swallow the EOL
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the backslash is dropped
                out.append(e)
                i += 1
        elif c == 0x28:  # ( — balanced nesting
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        elif c == 0x0D:  # raw EOL → 0x0A (CRLF is one marker)
            out.append(0x0A)
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a hex string starting at ``data[i] == '<'``; whitespace is
    ignored, an odd final digit is zero-padded (§7.3.4.3)."""
    i += 1
    digits = bytearray()
    n = len(data)
    while i < n and data[i] != 0x3E:  # >
        if data[i] not in _WS:
            digits.append(data[i])
        i += 1
    i += 1
    if len(digits) % 2:
        digits.append(0x30)
    try:
        return bytes.fromhex(digits.decode("ascii")), i
    except ValueError:
        return b"", i


def _tokenize(content: bytes):
    """Yield ('str', bytes) | ('num', float) | ('name', bytes) |
    ('op', name) | ('arr', '['/']') tokens from a content stream.
    Dicts (``<<``), comments and inline-image payloads are consumed
    without emitting; names ARE emitted so ``Tf`` can select the
    active font."""
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and content[i] not in (0x0D, 0x0A):
                i += 1
        elif c == 0x28:  # (
            s, i = _parse_literal(content, i)
            yield ("str", s)
        elif c == 0x3C:  # < or <<
            if i + 1 < n and content[i + 1] == 0x3C:
                depth, i = 1, i + 2  # skip balanced << ... >>
                while i < n and depth:
                    if content[i : i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif content[i : i + 2] == b">>":
                        depth -= 1
                        i += 2
                    else:
                        i += 1
            else:
                s, i = _parse_hex(content, i)
                yield ("str", s)
        elif c in (0x5B, 0x5D):  # [ ]
            yield ("arr", chr(c))
            i += 1
        elif c == 0x2F:  # /name — emitted so Tf can select a font
            i += 1
            j = i
            while j < n and content[j] not in _WS and content[j] not in _DELIM:
                j += 1
            yield ("name", content[i:j])
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and content[j] in b"+-.0123456789":
                j += 1
            try:
                yield ("num", float(content[i:j]))
            except ValueError:
                pass
            i = j
        else:  # operator keyword
            j = i
            while j < n and content[j] not in _WS and content[j] not in _DELIM:
                j += 1
            op = content[i:j]
            i = j
            if op == b"BI":
                # inline image: skip to EI at a TOKEN BOUNDARY — raw
                # sample bytes can contain the two letters "EI", so the
                # first match is only trusted when whitespace precedes
                # it and whitespace/delimiter/EOF follows (the same
                # heuristic real extractors use)
                k = i
                while True:
                    e = content.find(b"EI", k)
                    if e < 0:
                        i = n
                        break
                    after = content[e + 2 : e + 3]
                    if (e == 0 or content[e - 1] in _WS) and (
                        after == b"" or after[0] in _WS or after[0] in _DELIM
                    ):
                        i = e + 2
                        break
                    k = e + 2
            else:
                yield ("op", op)


def _decode_segments(segs: list[tuple[object, bytes]]) -> str:
    """Decode a line's accumulated (font cmap, bytes) segments:
    adjacent same-font segments concatenate BEFORE decoding — a
    conforming writer may split a multi-byte UTF-8 sequence across TJ
    array elements (the glyph stream is the byte concatenation), so
    per-string decoding would mojibake exactly those splits (found by
    the round-9 hypothesis property). No-cmap runs decode UTF-8;
    ToUnicode runs decode as fixed-width codes through the map."""
    out: list[str] = []
    i = 0
    while i < len(segs):
        cmap = segs[i][0]
        buf = bytearray(segs[i][1])
        j = i + 1
        while j < len(segs) and segs[j][0] is cmap:
            buf += segs[j][1]
            j += 1
        if cmap is None:
            out.append(buf.decode("utf-8", errors="replace"))
        else:
            codelen, table = cmap
            usable = len(buf) - len(buf) % codelen
            out.append(
                "".join(
                    table.get(
                        int.from_bytes(buf[k : k + codelen], "big"), "\ufffd"
                    )
                    for k in range(0, usable, codelen)
                )
            )
        i = j
    return "".join(out)


def extract_pdf_text(data: bytes) -> str:
    """Extract the text a viewer would show: one output line per text
    line (``Td``/``TD``/``T*``/``Tm``/``'``/``\"`` advances and ``ET``
    flush), TJ word-gap kerning rendered as a space, empty lines
    dropped, lines joined with ``\\n``. ``Tf`` switches the active
    font; fonts with a /ToUnicode CMap decode through it (composite
    Type0/CID text), everything else through the UTF-8 passthrough —
    see :func:`_decode_segments` for the split-safety rule."""
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF: missing %PDF- header")
    _check_encrypted(data)
    lines: list[str] = []
    cur: list[tuple[object, bytes]] = []

    def flush() -> None:
        text = _decode_segments(cur)
        cur.clear()
        if text:
            lines.append(text)

    for stream, fonts in _page_streams(data):
        stack: list = []  # operand accumulator (strings/nums/names/arrays)
        arr: list | None = None
        font = None  # active font's cmap (None = UTF-8 passthrough)
        for kind, val in _tokenize(stream):
            if kind == "arr":
                arr = [] if val == "[" else arr
                if val == "]" and arr is not None:
                    stack.append(arr)
                    arr = None
                continue
            if kind in ("str", "num", "name"):
                (arr if arr is not None else stack).append((kind, val))
                continue
            op = val
            if op == b"Tj":
                if stack and stack[-1][0] == "str":
                    cur.append((font, stack[-1][1]))
            elif op == b"'":
                flush()
                if stack and stack[-1][0] == "str":
                    cur.append((font, stack[-1][1]))
            elif op == b'"':
                flush()
                if stack and stack[-1][0] == "str":
                    cur.append((font, stack[-1][1]))
            elif op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for k, v in stack[-1]:
                        if k == "str":
                            cur.append((font, v))
                        elif k == "num" and v <= _TJ_SPACE_THRESHOLD:
                            cur.append((None, b" "))
            elif op == b"Tf":
                names = [v for k, v in stack if k == "name"]
                if names:
                    font = fonts.get(names[-1])
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                flush()
            elif op in (b"BT", b"ET"):
                flush()
            stack = []  # operands are consumed by their operator
        flush()
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


def pdf_text_extract(
    df: DataFrame, key_col: str = "doc_id", pdf_col: str = "pdf_bytes"
) -> DataFrame:
    """Arrow-batched extraction over a PDF binary column: emits the
    extracted text plus the length the differential layer compares —
    the html_text_extract shape (operators/htmltext.py).

    Per-payload error channel (round 10, VERDICT r9 #3 — the R24
    dead-letter discipline): a payload that isn't a PDF, is encrypted,
    or trips any walker bug yields a quarantine row (NULL extracted,
    ``err`` = the message) instead of killing the task — one mislabeled
    blob in a 100 TB batch must not fail the batch. Successful rows
    carry ``err`` NULL; route ``err IS NOT NULL`` to the audit sink,
    as events_dead_letter_audit does."""
    schema = f"{key_col} long, extracted string, n_chars long, err string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    text = extract_pdf_text(bytes(r[pdf_col]))
                    rows.append((r[key_col], text, len(text), None))
                except Exception as exc:
                    rows.append((r[key_col], None, None, f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows, columns=[key_col, "extracted", "n_chars", "err"]
            )

    return df.select(key_col, pdf_col).mapInPandas(run, schema)
