"""Baseline JPEG codec tests (operators/jpeg.py) — the round-7
continuation that retires the container's last Pillow-gated format.

Strategy mirrors the PNG/BMP/WAV codec tests: (1) exact closed-form
pixels for constant blocks (the SQL oracle's arithmetic), (2) the
entropy coder pinned EXACTLY — decoder-parsed quantized coefficients
must equal the encoder's quantizer output integer-for-integer, (3) the
IDCT checked against an independent O(64²) dense cosine-sum reference,
(4) lossy round-trip error bounds, (5) structural edge cases: byte
stuffing, restart markers, odd dimensions, progressive rejection,
(6) Pillow cross-validation when a real codec is importable.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from dataingestion_pt_ms_spark.operators import jpeg as J
from dataingestion_pt_ms_spark.operators import multimodal as M


def _const_block_image(doc: int, bi_n: int = 2, bj_n: int = 4) -> np.ndarray:
    gray = np.zeros((bi_n * 8, bj_n * 8), dtype=np.uint8)
    for bi in range(bi_n):
        for bj in range(bj_n):
            gray[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = (
                doc * 31 + bi * 17 + bj * 7
            ) % 256
    return gray


def _closed_form(g: int) -> int:
    """clip(2·floor((g−128)/2 + 0.5) + 128) — quality-50 luminance DC
    quantum 16, the formula the DuckDB oracle replays."""
    return min(255, max(0, 2 * math.floor((g - 128) / 2.0 + 0.5) + 128))


def test_zigzag_is_t81_order():
    """The generated zigzag must match an independently-coded diagonal
    walk and the spec's pinned prefix/suffix."""
    walk, y, x, up = [], 0, 0, True
    for _ in range(64):
        walk.append(y * 8 + x)
        if up:
            if x == 7:
                y, up = y + 1, False
            elif y == 0:
                x, up = x + 1, False
            else:
                y, x = y - 1, x + 1
        else:
            if y == 7:
                x, up = x + 1, True
            elif x == 0:
                y, up = y + 1, True
            else:
                y, x = y + 1, x - 1
    assert list(J.ZIGZAG) == walk
    assert list(J.ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(J.ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(J.ZIGZAG) == list(range(64))


def test_huffman_specs_complete_for_encoder_range():
    """Every symbol the encoder can emit must exist in the Annex-K
    tables: DC size 0..11, AC (run<<4)|size for run 0..15 / size 1..10,
    plus EOB and ZRL. (DCT of 8-bit blocks bounds |AC| < 1024 → size
    ≤ 10; DC diff spans ±2047 → size ≤ 11.)"""
    for spec in (J.HUFF_DC_LUM, J.HUFF_DC_CHROM):
        codes = J._canonical_codes(*spec)
        assert set(range(12)) <= set(codes)
    for spec in (J.HUFF_AC_LUM, J.HUFF_AC_CHROM):
        codes = J._canonical_codes(*spec)
        need = {0x00, 0xF0} | {
            (run << 4) | size for run in range(16) for size in range(1, 11)
        }
        assert need <= set(codes)
        assert max(length for _, length in codes.values()) <= 16


def test_constant_blocks_closed_form_all_variants():
    """Gray, 4:4:4 color and 4:2:0+restart must ALL decode constant
    blocks to the same closed form — gray-valued RGB survives the
    fixed-point YCbCr round-trip exactly (Y=g, Cb=Cr=128)."""
    for doc in (0, 1, 2, 5, 97):
        gray = _const_block_image(doc)
        rgb = np.stack([gray, gray, gray], axis=-1)
        encoded = [
            J.encode_jpeg(gray, quality=50),
            J.encode_jpeg(rgb, quality=50, subsampling="444"),
            J.encode_jpeg(rgb, quality=50, subsampling="420", restart_interval=2),
        ]
        for data in encoded:
            out = J.decode_jpeg(data)
            assert out.shape == (16, 32, 3)
            for bi in range(2):
                for bj in range(4):
                    g = (doc * 31 + bi * 17 + bj * 7) % 256
                    blk = out[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8]
                    assert (blk == _closed_form(g)).all(), (doc, g)


def test_constant_blocks_extreme_values():
    for g in (0, 1, 127, 128, 129, 254, 255):
        img = np.full((8, 8), g, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=50))
        assert (out == _closed_form(g)).all(), g


def test_entropy_coder_exact_coefficients():
    """The decoder's parsed quantized coefficients must equal the
    encoder's quantizer output EXACTLY — any Huffman table, magnitude
    coding, run-length, zigzag or DC-prediction bug shows here."""
    rng = np.random.default_rng(11)
    for quality in (30, 50, 80, 95):
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        coefs = J.decode_jpeg(J.encode_jpeg(img, quality=quality), coefficients=True)
        q = J.scaled_quant_table(J.QUANT_LUM, quality)
        expected = J.quantize_plane(img.astype(np.float64), q).astype(np.int32)
        assert np.array_equal(coefs[1], expected), quality
    # color 4:4:4: all three components exact
    img3 = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    coefs = J.decode_jpeg(J.encode_jpeg(img3, 75, "444"), coefficients=True)
    ycc = J._rgb_to_ycbcr(img3)
    for cid, (plane, base) in enumerate(
        [(ycc[..., 0], J.QUANT_LUM), (ycc[..., 1], J.QUANT_CHROM), (ycc[..., 2], J.QUANT_CHROM)],
        start=1,
    ):
        q = J.scaled_quant_table(base, 75)
        expected = J.quantize_plane(plane.astype(np.float64), q).astype(np.int32)
        assert np.array_equal(coefs[cid], expected), cid


def test_idct_matches_dense_reference():
    """The fast separable IDCT vs an O(64²) direct cosine sum written
    independently here."""
    rng = np.random.default_rng(3)
    coef = rng.integers(-500, 500, (8, 8)).astype(np.float64)
    fast = J.DCT_T.T @ coef @ J.DCT_T
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4.0 * coef[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = s
    assert np.abs(fast - ref).max() < 1e-9


def test_fdct_idct_inverse_pair():
    rng = np.random.default_rng(5)
    block = rng.uniform(-128, 127, (8, 8))
    coefs = np.einsum("ux,xw,vw->uv", J.DCT_T, block, J.DCT_T)
    back = J.DCT_T.T @ coefs @ J.DCT_T
    assert np.abs(back - block).max() < 1e-10


def test_roundtrip_error_bounds():
    """Lossy but bounded: smooth content at q95 within ±4; random noise
    (worst case for DCT truncation) within ±12 gray / ±24 color (chroma
    fixed-point + quantization)."""
    rng = np.random.default_rng(17)
    yy, xx = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
    smooth = ((np.sin(yy / 9.0) + np.cos(xx / 13.0)) * 60 + 128).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(smooth, quality=95))[:, :, 0]
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 4

    noise = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(noise, quality=95))[:, :, 0]
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 12

    noise3 = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    out3 = J.decode_jpeg(J.encode_jpeg(noise3, quality=95, subsampling="444"))
    assert np.abs(out3.astype(int) - noise3.astype(int)).max() <= 24


def test_compression_actually_compresses():
    yy, xx = np.meshgrid(np.arange(64), np.arange(96), indexing="ij")
    smooth = ((np.sin(yy / 9.0) + np.cos(xx / 13.0)) * 60 + 128).astype(np.uint8)
    data = J.encode_jpeg(smooth, quality=30)
    assert len(data) < smooth.size // 5  # ≥5× smaller than raw


def test_restart_markers_bit_identical_and_present():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (35, 51, 3), dtype=np.uint8)
    plain = J.encode_jpeg(img, 80, "420")
    rst = J.encode_jpeg(img, 80, "420", restart_interval=1)
    assert np.array_equal(J.decode_jpeg(plain), J.decode_jpeg(rst))
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI emitted
    scan = rst[rst.index(b"\xff\xda") :]
    assert any(bytes([0xFF, 0xD0 + m]) in scan for m in range(8))


def test_byte_stuffing_occurs_and_unstuffs():
    """An all-0xFF entropy byte must be stuffed (FF 00) on write and
    transparently un-stuffed on read. Scan several seeds so at least one
    stream contains a stuffed byte in its entropy segment."""
    rng = np.random.default_rng(29)
    found = False
    for _ in range(8):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        data = J.encode_jpeg(img, quality=90)
        scan = data[data.index(b"\xff\xda") + 14 : -2]
        found = found or b"\xff\x00" in scan
        out = J.decode_jpeg(data)  # must decode regardless
        assert out.shape == (16, 16, 3)
    assert found, "no stuffed byte in 8 random streams — stuffing untested"


def test_odd_dimensions_edge_padding():
    """Non-multiple-of-8 dims: shape preserved; a constant image stays
    exactly closed-form (edge replication keeps every block constant)."""
    for shape in ((17, 13), (1, 1), (9, 24), (8, 7)):
        img = np.full(shape, 200, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(img, quality=50))
        assert out.shape == (*shape, 3)
        assert (out == _closed_form(200)).all()
    rgb = np.full((11, 19, 3), 77, dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(rgb, 50, "420"))
    assert out.shape == (11, 19, 3)
    assert (out == _closed_form(77)).all()


def test_progressive_and_garbage_rejected():
    img = np.full((8, 8), 100, dtype=np.uint8)
    data = bytearray(J.encode_jpeg(img, quality=50))
    sof_at = bytes(data).index(b"\xff\xc0")
    data[sof_at + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="SOF2"):
        J.decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x01\x02\x03")


def test_quality_scaling_table():
    assert J.scaled_quant_table(J.QUANT_LUM, 50)[0, 0] == 16  # Annex-K base
    assert (J.scaled_quant_table(J.QUANT_LUM, 100) >= 1).all()
    assert J.scaled_quant_table(J.QUANT_LUM, 100).max() <= 3
    assert (
        J.scaled_quant_table(J.QUANT_LUM, 10) > J.scaled_quant_table(J.QUANT_LUM, 90)
    ).all()


def test_decode_image_dispatches_jpeg():
    gray = _const_block_image(3)
    data = J.encode_jpeg(gray, quality=50)
    assert np.array_equal(M.decode_image(data), J.decode_jpeg(data))


def test_dht_drives_decoder_not_module_constants():
    """The decoder must honor the FILE's Huffman tables: swap the DC
    luminance table id in DHT+SOS to table 1 (writing the DC table under
    id 1 instead) and the stream must still decode identically."""
    img = _const_block_image(9)
    data = bytearray(J.encode_jpeg(img, quality=50))
    # grayscale stream: one DC table (class 0, id 0) and one AC (1, 0).
    at = bytes(data).index(b"\xff\xc4")
    assert data[at + 4] == 0x00  # class 0, id 0
    data[at + 4] = 0x01  # now advertise it as DC table id 1
    sos_at = bytes(data).index(b"\xff\xda")
    assert data[sos_at + 6] == 0x00  # comp 1: DC table 0, AC table 0
    data[sos_at + 6] = 0x10  # point the scan at DC table 1
    out = J.decode_jpeg(bytes(data))
    assert np.array_equal(out, J.decode_jpeg(J.encode_jpeg(img, quality=50)))


@pytest.mark.skipif(not M.HAVE_PIL, reason="Pillow not installed in container")
def test_pillow_cross_validation():  # pragma: no cover - needs real codec
    """Real-codec interop: Pillow must read our bytes (≤ ±1 of our own
    decode) and we must read Pillow-encoded baseline JPEG."""
    import io

    from PIL import Image

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    ours = J.encode_jpeg(img, 75, "420")
    pil_out = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    our_out = J.decode_jpeg(ours)
    assert np.abs(pil_out.astype(int) - our_out.astype(int)).max() <= 2

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=80)
    theirs = J.decode_jpeg(buf.getvalue())
    assert theirs.shape == img.shape
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.abs(theirs.astype(int) - ref.astype(int)).max() <= 2
