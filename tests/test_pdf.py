"""PDF text-extraction tests (operators/pdf.py, round 9 VERDICT r8 #4)
— the codec-free encode/extract round trip plus the spec edge cases the
synthesized oracle PDFs don't all exercise."""

from __future__ import annotations

import zlib

import pytest

from dataingestion_pt_ms_spark.operators import pdf as P
from dataingestion_pt_ms_spark.operators.multimodal import sniff_media_kind


def _pdf_of_ops(ops: bytes, compress: bool = False) -> bytes:
    return P.encode_pdf(ops, compress=compress)


def test_roundtrip_all_show_operator_styles():
    # 8 lines → each of the 4 styles (Tj / ' / TJ / hex) twice
    lines = [
        "Doc 7 (A) \\ B",
        "Token 7",
        "key agg row scan",
        "tail 7 end",
        "fifth (line)",
        "sixth",
        "seventh \\ back",
        "eighth",
    ]
    for compress in (True, False):
        blob = P.encode_pdf(P.encode_text_ops(lines), compress=compress)
        assert P.extract_pdf_text(blob) == "\n".join(lines)


def test_flate_body_ending_in_eol_bytes_not_stripped():
    """The bug the sf0.001 differential caught: a Flate body can
    legitimately END in 0x0A/0x0D bytes — an exact /Length span must
    not be rstripped or inflate fails and the page goes silent."""
    lines = ["alpha zeta theta", "x alpha"]  # known EOL-terminated output
    ops = P.encode_text_ops(lines)
    assert zlib.compress(ops, 6).endswith((b"\n", b"\r"))
    blob = P.encode_pdf(ops, compress=True)
    assert P.extract_pdf_text(blob) == "\n".join(lines)


def test_literal_string_escapes():
    ops = rb"BT 72 720 Td (a\(b\)c\\d\n\t\101) Tj ET"
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "a(b)c\\d\n\tA"


def test_literal_string_raw_eol_and_continuation():
    # raw CR, LF, CRLF inside a literal all become 0x0A; a backslash-EOL
    # is a line continuation and vanishes
    ops = b"BT 72 720 Td (x\ry\nz\r\nw) Tj T* (a\\\nb) Tj ET"
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "x\ny\nz\nw\nab"


def test_balanced_parens_unescaped():
    ops = b"BT 72 720 Td (a (nested (deep)) b) Tj ET"
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "a (nested (deep)) b"


def test_hex_strings_whitespace_and_odd_padding():
    # "Hi" = 4869; odd digit count zero-pads: 48697 -> 4869 70 = "Hip"
    ops = b"BT 72 720 Td <48 69> Tj T* <48697> Tj ET"
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "Hi\nHip"


def test_tj_kerning_word_gap_threshold():
    # -250 (<= -180) renders as a space; -50 and +120 do not
    ops = b"BT 72 720 Td [(Hello) -250 (world) -50 (!) 120 (?)] TJ ET"
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "Hello world!?"


def test_quote_operators_advance_lines():
    ops = b"BT 72 720 Td (one) Tj (two) ' 2 3 (three) \" ET"
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "one\ntwo\nthree"


def test_td_tm_tstar_break_lines_and_bt_blocks():
    ops = (
        b"BT 72 720 Td (a) Tj 0 -14 TD (b) Tj T* (c) Tj "
        b"1 0 0 1 72 100 Tm (d) Tj ET BT 72 50 Td (e) Tj ET"
    )
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "a\nb\nc\nd\ne"


def test_dicts_names_comments_inline_images_skipped():
    ops = (
        b"BT 72 720 Td\n% a comment (not text) Tj\n"
        b"/GS1 gs << /K [(not shown)] >> BDC (real) Tj ET\n"
        b"BI /W 2 /H 2 ID \x00\x01(fake) Tj\x02\x03 EI\n"
        b"BT 72 700 Td (after) Tj ET"
    )
    assert P.extract_pdf_text(_pdf_of_ops(ops)) == "real\nafter"


def test_non_flate_streams_skipped_and_uncompressed_walked():
    # a DCTDecode (image) stream must not contribute garbage
    img = b"5 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\n\xff\xd8\xff\xe0\nendstream\nendobj\n"
    blob = _pdf_of_ops(b"BT 72 720 Td (text) Tj ET") + img
    assert P.extract_pdf_text(blob) == "text"


def test_not_a_pdf_raises():
    with pytest.raises(ValueError, match="%PDF-"):
        P.extract_pdf_text(b"GIF89a not a pdf")


def test_sniff_pdf_magic():
    blob = P.encode_pdf(P.encode_text_ops(["x"]))
    assert sniff_media_kind(blob) == "application/pdf"
    assert sniff_media_kind(b"%PDF-1.7\n") == "application/pdf"


def test_utf8_payload_roundtrip():
    lines = ["café — naïve", "中文 text"]
    blob = P.encode_pdf(P.encode_text_ops(lines), compress=True)
    assert P.extract_pdf_text(blob) == "\n".join(lines)


def test_pdf_text_extract_operator(spark):
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, pdf_bytes=bytearray(
            P.encode_pdf(P.encode_text_ops([f"line a {i}", f"line b {i}"]),
                         compress=i % 2 == 0)
        ))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf_bytes binary")
    got = {r.doc_id: (r.extracted, r.n_chars)
           for r in P.pdf_text_extract(df).collect()}
    for i in range(6):
        exp = f"line a {i}\nline b {i}"
        assert got[i] == (exp, len(exp))


def test_multipage_roundtrip():
    pages = [
        P.encode_text_ops([f"page {p} line {i}" for i in range(3)])
        for p in range(4)
    ]
    for compress in (True, False):
        blob = P.encode_pdf(pages, compress=compress)
        expected = "\n".join(
            f"page {p} line {i}" for p in range(4) for i in range(3)
        )
        assert P.extract_pdf_text(blob) == expected


def _obj_stream(filters: bytes, body: bytes) -> bytes:
    return (
        b"9 0 obj\n<< /Length " + str(len(body)).encode() + b" /Filter "
        + filters + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
    )


def test_asciihex_filter_stream():
    ops = b"BT 72 720 Td (hexed) Tj ET"
    body = ops.hex().upper().encode() + b">"
    blob = P.encode_pdf(b"BT 72 720 Td (base) Tj ET", compress=False)
    blob += _obj_stream(b"/ASCIIHexDecode", body)
    assert P.extract_pdf_text(blob) == "base\nhexed"


def test_ascii85_filter_stream():
    import base64

    ops = b"BT 72 720 Td (eighty-five) Tj ET"
    body = base64.a85encode(ops) + b"~>"
    blob = P.encode_pdf(b"BT 72 720 Td (base) Tj ET", compress=False)
    blob += _obj_stream(b"/ASCII85Decode", body)
    assert P.extract_pdf_text(blob) == "base\neighty-five"


def test_chained_filter_array():
    import base64
    import zlib as _z

    ops = b"BT 72 720 Td (chained) Tj ET"
    body = base64.a85encode(_z.compress(ops)) + b"~>"
    blob = P.encode_pdf(b"BT 72 720 Td (base) Tj ET", compress=False)
    blob += _obj_stream(b"[/ASCII85Decode /FlateDecode]", body)
    assert P.extract_pdf_text(blob) == "base\nchained"


# --- round-10 conformance matrix (VERDICT r9 #2): structure variants a
# FOREIGN writer emits, which the synthesized 1.4 fixtures never produce.


def _min_pdf(objects: list[bytes], root: int = 1, eol: bytes = b"\n") -> bytes:
    """Hand-assembled PDF from raw object bodies (no xref — the walker
    never trusts one anyway); ``eol`` lets the CR-only test build a
    document whose every line ends in 0x0D."""
    buf = b"%PDF-1.4" + eol
    for n, body in enumerate(objects, start=1):
        if body is None:
            continue
        buf += f"{n} 0 obj".encode() + eol + body + eol + b"endobj" + eol
    buf += (
        b"trailer" + eol + b"<< /Root " + str(root).encode() + b" 0 R >>"
        + eol + b"%%EOF" + eol
    )
    return buf


def _page_objs(contents: bytes, eol: bytes = b"\n") -> list[bytes]:
    return [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents " + contents + b" >>",
    ]


def test_objstm_xref_stream_document():
    # PDF 1.5: catalog/pages/page/font packed in a /Type /ObjStm, xref
    # as a binary /Type /XRef stream, no `trailer` keyword at all
    lines = ["Doc 5 (A) \\ B", "Token 5", "objstm body text", "tail 5 end"]
    for compress in (True, False):
        blob = P.encode_pdf_objstm(P.encode_text_ops(lines), compress=compress)
        assert b"/Type /ObjStm" in blob and b"/Type /XRef" in blob
        assert b"trailer" not in blob
        assert blob.count(b" obj") <= 4  # only streams live at top level
        assert P.extract_pdf_text(blob) == "\n".join(lines)


def test_objstm_multipage():
    pages = [P.encode_text_ops([f"page {p} row {i}" for i in range(2)])
             for p in range(3)]
    blob = P.encode_pdf_objstm(pages)
    assert P.extract_pdf_text(blob) == "\n".join(
        f"page {p} row {i}" for p in range(3) for i in range(2)
    )


def test_indirect_length_forward_ref():
    # /Length as an object reference DEFINED AFTER the stream — forces
    # the two-pass exact slice (a Flate body ending in EOL bytes would
    # die under the scan-and-rstrip fallback)
    ops = P.encode_text_ops(["alpha zeta theta", "x alpha"])
    z = zlib.compress(ops, 6)
    assert z.endswith((b"\n", b"\r"))
    objs = _page_objs(b"4 0 R")
    objs.append(
        b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n" + z
        + b"\nendstream"
    )
    objs.append(str(len(z)).encode())
    assert P.extract_pdf_text(_min_pdf(objs)) == "alpha zeta theta\nx alpha"


def test_cr_only_eols():
    # some legacy Mac writers end EVERY line with bare 0x0D, including
    # the one after the `stream` keyword
    body = b"BT 72 720 Td (cr only) Tj ET"
    objs = _page_objs(b"4 0 R", eol=b"\r")
    objs.append(
        b"<< /Length " + str(len(body)).encode() + b" >>\rstream\r"
        + body + b"\rendstream"
    )
    blob = _min_pdf(objs, eol=b"\r")
    assert b"\n" not in blob
    assert P.extract_pdf_text(blob) == "cr only"


def test_multi_contents_array_token_boundary_split():
    # /Contents [4 0 R 5 0 R]: one logical stream in two parts, split
    # at a token boundary INSIDE a TJ array (§7.8.2 allows exactly
    # this) — per-stream tokenizing would lose the whole TJ
    s1 = b"BT 72 720 Td [(Hello)"
    s2 = b"-250 (world)] TJ T* (second) Tj ET"
    objs = _page_objs(b"[4 0 R 5 0 R]")
    objs.append(b"<< /Length " + str(len(s1)).encode() + b" >>\nstream\n"
                + s1 + b"\nendstream")
    objs.append(b"<< /Length " + str(len(s2)).encode() + b" >>\nstream\n"
                + s2 + b"\nendstream")
    assert P.extract_pdf_text(_min_pdf(objs)) == "Hello world\nsecond"


def test_incremental_update_supersedes_page():
    # appended revision redefines page 3 to new content; the OLD
    # content stream is still in the file but must not resurface
    base = P.encode_pdf(P.encode_text_ops(["old text"]))
    new = b"BT 72 720 Td (new text) Tj ET"
    upd = (
        base
        + b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>\nendobj\n"
        + b"9 0 obj\n<< /Length " + str(len(new)).encode() + b" >>\nstream\n"
        + new + b"\nendstream\nendobj\n"
        + b"trailer\n<< /Root 1 0 R /Prev 9 >>\n%%EOF\n"
    )
    assert P.extract_pdf_text(upd) == "new text"


def test_lying_xref_is_ignored():
    # corrupt every xref offset: the walker finds objects by scan
    blob = P.encode_pdf(P.encode_text_ops(["xref lies"]))
    start = blob.index(b"xref\n")
    end = blob.index(b"trailer")
    table = blob[start:end]
    import re as _re

    broken = _re.sub(rb"\d{10}", b"9999999999", table)
    assert P.extract_pdf_text(blob[:start] + broken + blob[end:]) == "xref lies"


def test_encrypted_document_raises():
    blob = P.encode_pdf(P.encode_text_ops(["secret"]))
    enc = blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 99 0 R")
    with pytest.raises(ValueError, match="encrypted"):
        P.extract_pdf_text(enc)
    # the phrase inside page TEXT must not false-positive
    ok = P.encode_pdf(P.encode_text_ops(["mentions /Encrypt 9 0 R here"]))
    assert "Encrypt" in P.extract_pdf_text(ok)


def test_stream_body_containing_dict_keyword_bytes():
    # ADVICE r9: an UNCOMPRESSED body whose bytes spell out another
    # `<< /Length N >> stream` must not shift object boundaries — the
    # scan advances past consumed bodies
    decoy = b"BT 72 720 Td (<< /Length 4 >>\\nstream garbage endstream) Tj ET"
    real = b"BT 72 700 Td (real) Tj ET"
    objs = _page_objs(b"[4 0 R 5 0 R]")
    objs.append(b"<< /Length " + str(len(decoy)).encode() + b" >>\nstream\n"
                + decoy + b"\nendstream")
    objs.append(b"<< /Length " + str(len(real)).encode() + b" >>\nstream\n"
                + real + b"\nendstream")
    got = P.extract_pdf_text(_min_pdf(objs))
    assert got.endswith("\nreal") and "garbage" not in got.splitlines()[-1]


def test_form_xobject_text_appends_after_pages():
    # a /Subtype /Form XObject (annotation appearance / stamped content)
    # is not in /Contents; the union path appends its text AFTER the
    # page text — pinned so the documented semantics stay true
    form = b"BT 72 50 Td (stamped) Tj ET"
    blob = P.encode_pdf(P.encode_text_ops(["page body"]))
    blob += (
        b"9 0 obj\n<< /Type /XObject /Subtype /Form /Length "
        + str(len(form)).encode() + b" >>\nstream\n" + form
        + b"\nendstream\nendobj\n"
    )
    assert P.extract_pdf_text(blob) == "page body\nstamped"


def test_structural_streams_never_tokenized():
    # ObjStm/XRef stream bodies are structural binary: the 1.5 document
    # must emit ONLY its page text even though both decode via Flate
    blob = P.encode_pdf_objstm(P.encode_text_ops(["only this"]))
    assert P.extract_pdf_text(blob) == "only this"
    # and an embedded font program (/Length1) is skipped in union mode
    font = zlib.compress(b"(fake glyf) Tj" * 4)
    blob2 = P.encode_pdf(P.encode_text_ops(["body"]))
    blob2 += (
        b"9 0 obj\n<< /Length " + str(len(font)).encode()
        + b" /Length1 56 /Filter /FlateDecode >>\nstream\n" + font
        + b"\nendstream\nendobj\n"
    )
    assert P.extract_pdf_text(blob2) == "body"


def test_third_party_extractor_cross_check():
    """Skip-gated conformance cross-check (the Pillow/JPEG precedent):
    when a real extractor is installed, BOTH writer generations must
    yield the same text through it as through ours (whitespace-
    normalized — extractors differ on intra-line spacing rules)."""
    pypdf = pytest.importorskip("pypdf")
    import io

    lines = ["Doc 3 (A) B", "Token 3", "body text here", "tail 3 end"]
    for enc in (P.encode_pdf, P.encode_pdf_objstm):
        blob = enc(P.encode_text_ops(lines), compress=True)
        reader = pypdf.PdfReader(io.BytesIO(blob))
        theirs = "\n".join(page.extract_text() for page in reader.pages)
        norm = lambda s: " ".join(s.split())  # noqa: E731
        assert norm(theirs) == norm("\n".join(lines))


def test_inline_image_ei_bytes_inside_sample_data():
    # raw inline-image samples containing the letters "EI" must not end
    # the image early (token-boundary heuristic): "xEIx" has no
    # whitespace before EI, so the walker skips it
    ops = (
        b"BT 72 720 Td (before) Tj ET\n"
        b"BI /W 2 /H 2 ID xEIx(fake) Tj\x00\xffEI more EI\n"
        b"BT 72 700 Td (after) Tj ET"
    )
    got = P.extract_pdf_text(_pdf_of_ops(ops))
    assert got.startswith("before") and got.endswith("after")
    assert "fake" not in got


def test_cid_tounicode_roundtrip():
    # Type0/CID document: 2-byte codes in a NON-identity assignment —
    # text is recoverable only through the embedded /ToUnicode CMap
    lines = ["Doc 9 (A) \\ B", "Token 9", "cid body — naïve 中文", "tail 9 end"]
    for compress in (True, False):
        blob = P.encode_pdf_cid(lines, compress=compress)
        assert P.extract_pdf_text(blob) == "\n".join(lines)
    # the map is load-bearing: stripping the ToUnicode ref mojibakes
    blob = P.encode_pdf_cid(lines)
    broken = blob.replace(b"/ToUnicode 6 0 R ", b"")
    assert P.extract_pdf_text(broken) != "\n".join(lines)


def test_cid_astral_chars_via_surrogate_pairs():
    lines = ["astral \U0001F600 pair"]
    assert P.extract_pdf_text(P.encode_pdf_cid(lines)) == lines[0]


def test_mixed_fonts_on_one_page():
    # /F1 is a CID font (via encode_pdf_cid's layout), /F2 a simple
    # font: Tf switches decode mode mid-page
    cid_lines = ["mapped"]
    blob = P.encode_pdf_cid(cid_lines, compress=False)
    # splice a second font and a simple-font show into the content
    # stream: the content object is 4 0 obj (uncompressed)
    old = b"ET"
    new = b"/F2 12 Tf T* (plain utf8) Tj ET"
    content_old = P.encode_pdf_cid(cid_lines, compress=False)
    start = content_old.index(b"stream\n") + 7
    end = content_old.index(b"\nendstream")
    body = content_old[start:end].replace(old, new)
    page_patch = content_old.replace(
        b"/Font << /F1 5 0 R >>", b"/Font << /F1 5 0 R /F2 7 0 R >>"
    )
    rebuilt = page_patch.replace(content_old[start:end], body).replace(
        b"/Length " + str(end - start).encode(),
        b"/Length " + str(len(body)).encode(),
    )
    rebuilt += (
        b"7 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        b"\nendobj\n"
    )
    assert P.extract_pdf_text(rebuilt) == "mapped\nplain utf8"


def test_inherited_resources_from_pages_tree():
    # §7.7.3.4: /Resources is inheritable — hoist the CID font dict to
    # the Pages node and strip it from the page; the CMap must still
    # resolve through /Parent
    blob = P.encode_pdf_cid(["inherited mapping"], compress=False)
    hoisted = blob.replace(
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
    ).replace(b"/Resources << /Font << /F1 5 0 R >> >> /Contents", b"/Contents")
    assert b"/Parent 2 0 R" in hoisted
    # sanity: the page object itself no longer carries Resources
    assert hoisted.count(b"/Resources") == 1
    assert P.extract_pdf_text(hoisted) == "inherited mapping"


def test_parse_cmap_bfrange_forms():
    # incrementing-destination and array-destination bfrange forms
    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfrange\n"
        b"<0041> <0043> <0061>\n"
        b"<0100> <0101> [<0058> <0059>]\n"
        b"endbfrange\n"
        b"1 beginbfchar <0200> <00660069> endbfchar\n"
    )
    codelen, table = P._parse_cmap(cmap)
    assert codelen == 2
    assert table[0x41] == "a" and table[0x42] == "b" and table[0x43] == "c"
    assert table[0x100] == "X" and table[0x101] == "Y"
    assert table[0x200] == "fi"  # multi-char destination


def test_pdf_text_extract_error_channel(spark):
    # VERDICT r9 #3: one bad blob quarantines, the batch survives (R24)
    from pyspark.sql import Row

    good = P.encode_pdf(P.encode_text_ops(["fine"]))
    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    rows = [
        Row(doc_id=0, pdf_bytes=bytearray(good)),
        Row(doc_id=1, pdf_bytes=bytearray(b"GIF89a not a pdf")),
        Row(doc_id=2, pdf_bytes=bytearray(enc)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf_bytes binary")
    got = {r.doc_id: r for r in P.pdf_text_extract(df).collect()}
    assert got[0].extracted == "fine" and got[0].err is None
    assert got[1].extracted is None and "%PDF-" in got[1].err
    assert got[2].extracted is None and "encrypted" in got[2].err


def test_sniff_html_magic():
    assert sniff_media_kind(b"<html><head></head></html>") == "text/html"
    assert sniff_media_kind(b"  \n<!DOCTYPE html><html>") == "text/html"
    assert sniff_media_kind(b"<HTML><BODY>caps</BODY>") == "text/html"
    assert sniff_media_kind(b"plain text, not markup") == (
        "application/octet-stream"
    )


# Property tests (hypothesis): the literal-string escape/parse pair and
# the full ops round trip must hold for ARBITRARY content, not just the
# hand-picked cases above — the walker is the oracle recipe's foundation.
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_prop_literal_string_roundtrip(payload):
        # escape -> parse returns the exact bytes, except raw EOL bytes,
        # which the spec normalizes to 0x0A inside literal strings
        raw = b"(" + P.escape_pdf_string(payload) + b")"
        parsed, idx = P._parse_literal(raw, 0)
        expected = (
            payload.replace(b"\r\n", b"\n").replace(b"\r", b"\n")
        )
        assert parsed == expected
        assert idx == len(raw)

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\r"
                ),
                min_size=1,
                max_size=60,
            ).map(str.strip).filter(bool),
            min_size=1,
            max_size=6,
        ),
        st.booleans(),
    )
    @settings(max_examples=60, deadline=None)
    def test_prop_text_ops_roundtrip(lines, compress):
        # arbitrary unicode lines through all four show-operator styles
        # and both stream framings come back byte-exact (modulo the \r
        # normalization the literal-string spec mandates; \r is excluded
        # above because expected-line identity is the property) — and
        # the 1.5 ObjStm/xref-stream framing extracts identically
        ops = P.encode_text_ops(lines)
        expected = "\n".join(lines)
        assert P.extract_pdf_text(P.encode_pdf(ops, compress=compress)) == expected
        assert P.extract_pdf_text(P.encode_pdf_objstm(ops, compress=compress)) == expected
        assert P.extract_pdf_text(P.encode_pdf_cid(lines, compress=compress)) == expected

    @given(st.binary(max_size=400))
    @settings(max_examples=300, deadline=None)
    def test_prop_walker_never_crashes_on_junk(junk):
        # the operator's error channel catches everything, but the
        # walker itself must only ever raise ValueError (encrypted /
        # not-a-PDF) — no IndexError/RecursionError/zlib leak on
        # adversarial bytes
        try:
            P.extract_pdf_text(b"%PDF-1.4\n" + junk)
        except ValueError:
            pass

    @given(st.binary(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_prop_junk_objects_never_shift_real_page(junk):
        # arbitrary trailing bytes (fake obj headers, stream keywords,
        # broken dicts) must never change the REAL document's text
        blob = P.encode_pdf(P.encode_text_ops(["anchor line"]))
        try:
            got = P.extract_pdf_text(blob + junk)
        except ValueError:
            return  # junk formed an /Encrypt trailer — loud is correct
        assert got.splitlines()[0] == "anchor line"

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
