"""GIF codec tests (operators/gif.py) — LZW + container framing.

Lossless, so every test is exact-equality: LZW round-trips (including
the KwKwK self-reference and 12-bit dictionary overflow with
clear-and-restart), the four-pass interlace de-interleave, local-color-
table override, extension skipping, and the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from dataingestion_pt_ms_spark.operators import gif as G
from dataingestion_pt_ms_spark.operators import multimodal as M

PAL256 = np.stack(
    [(np.arange(256) * 7) % 256, (np.arange(256) * 11) % 256, (np.arange(256) * 13) % 256],
    axis=-1,
).astype(np.uint8)


def test_lzw_roundtrip_various_alphabets():
    rng = np.random.default_rng(41)
    for mcs, hi in ((2, 4), (4, 16), (8, 256)):
        for n in (1, 2, 100, 5000):
            seq = rng.integers(0, hi, n)
            back = G.lzw_decompress(G.lzw_compress(seq, mcs), mcs)
            assert np.array_equal(back, seq), (mcs, n)


def test_lzw_kwkwk_self_reference():
    """'ababab…' forces the decoder's code == len(table) branch."""
    seq = np.array([0, 1] * 50)
    assert np.array_equal(G.lzw_decompress(G.lzw_compress(seq, 2), 2), seq)
    # single-symbol runs: aaaa… is pure KwKwK chains
    seq = np.zeros(1000, dtype=int)
    assert np.array_equal(G.lzw_decompress(G.lzw_compress(seq, 2), 2), seq)


def test_lzw_dictionary_overflow_clear_restart():
    """>4096 dictionary entries: the encoder must emit CLEAR and both
    sides must resync (the width-growth off-by-one lives here)."""
    rng = np.random.default_rng(43)
    seq = rng.integers(0, 256, 200_000)
    back = G.lzw_decompress(G.lzw_compress(seq, 8), 8)
    assert np.array_equal(back, seq)


def test_lzw_truncation_raises():
    data = G.lzw_compress(np.arange(100) % 4, 2)
    with pytest.raises(ValueError, match="truncated"):
        G.lzw_decompress(data[: len(data) // 2], 2)


def test_interlace_order_is_spec_permutation():
    assert G._interlace_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    for h in (1, 2, 5, 16, 33):
        order = G._interlace_order(h)
        assert sorted(order) == list(range(h))


def test_container_roundtrip_variants():
    rng = np.random.default_rng(47)
    idx = rng.integers(0, 256, (23, 37))
    expected = PAL256[idx]
    for kw in (
        {},
        {"interlace": True},
        {"local_palette": True},
        {"comment": b"x" * 700},  # multi-sub-block extension
        {"interlace": True, "local_palette": True, "comment": b"y"},
    ):
        out = G.decode_gif(G.encode_gif(idx, PAL256, **kw))
        assert np.array_equal(out, expected), kw


def test_container_large_image_multiple_clears():
    rng = np.random.default_rng(53)
    idx = rng.integers(0, 256, (513, 301))  # ~154k px, several CLEARs
    assert np.array_equal(G.decode_gif(G.encode_gif(idx, PAL256)), PAL256[idx])


def test_small_palette_and_compression():
    pal4 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    rng = np.random.default_rng(59)
    idx = rng.integers(0, 4, (15, 9))
    assert np.array_equal(G.decode_gif(G.encode_gif(idx, pal4)), pal4[idx])
    flat = np.zeros((100, 100), dtype=int)
    assert len(G.encode_gif(flat, pal4)) < 10_000 // 5  # ≥5× vs raw indices


def test_error_paths():
    with pytest.raises(ValueError, match="magic"):
        G.decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="palette index"):
        G.encode_gif(np.array([[0, 5]]), np.zeros((4, 3), dtype=np.uint8))
    # image descriptor with no color table anywhere
    data = bytearray(G.encode_gif(np.array([[0]]), np.zeros((2, 3), dtype=np.uint8)))
    data[10] &= 0x7F  # clear the GCT flag but keep the bytes in place
    with pytest.raises(ValueError):
        G.decode_gif(bytes(data))


def test_lzw_tail_width_boundary_regression():
    """The final data code makes the DECODER append an entry (possibly
    widening before EOI) with no matching encoder assignment — without
    the encoder's phantom pre-EOI check, streams whose last append lands
    one short of 2^width desync. rng(9) 16×16 0..200 is the seed that
    caught it; the dense length sweep hammers every boundary."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 200, (16, 16))
    assert np.array_equal(G.decode_gif(G.encode_gif(base, PAL256)), PAL256[base])
    for n in range(1, 400):
        seq = np.arange(n) % 4
        assert np.array_equal(G.lzw_decompress(G.lzw_compress(seq, 2), 2), seq), n


def test_animated_gif_demux_and_delta_frames():
    """Multi-frame container: encode_animated_gif delta-encodes (changed
    bounding rect per frame; unchanged frame → 1×1 rect) and
    decode_gif_frames must re-composite every frame exactly."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 200, (16, 16))
    frames = [(base + (f // 4) * 50 + f) % 256 for f in range(12)]
    data = G.encode_animated_gif(frames, PAL256)
    out = G.decode_gif_frames(data)
    assert out.shape == (12, 16, 16, 3)
    for f, fr in enumerate(frames):
        assert np.array_equal(out[f], PAL256[fr]), f
    # single-pixel delta → tiny sub-rect; identical frame → 1×1 rect
    f2 = base.copy()
    f2[7, 3] = (f2[7, 3] + 5) % 256
    out2 = G.decode_gif_frames(G.encode_animated_gif([base, f2, f2], PAL256))
    assert np.array_equal(out2[1], PAL256[f2])
    assert np.array_equal(out2[2], PAL256[f2])
    # the delta stream must actually be smaller than full-frame re-encode
    full = G.encode_animated_gif([base, base.copy()], PAL256)
    assert len(full) < 2 * len(G.encode_gif(base, PAL256))
    # decode_gif on an animated payload returns the FIRST frame
    assert np.array_equal(G.decode_gif(data), PAL256[frames[0]])


def test_animated_gif_validates_input():
    with pytest.raises(ValueError, match="shape"):
        G.encode_animated_gif(
            [np.zeros((4, 4), dtype=int), np.zeros((4, 5), dtype=int)], PAL256
        )
    with pytest.raises(ValueError, match="at least one"):
        G.encode_animated_gif([], PAL256)


def test_decode_image_dispatches_gif():
    idx = (np.add.outer(np.arange(6), np.arange(9)) * 3) % 256
    data = G.encode_gif(idx, PAL256, interlace=True)
    assert np.array_equal(M.decode_image(data), PAL256[idx])


@pytest.mark.skipif(not M.HAVE_PIL, reason="Pillow not installed in container")
def test_pillow_cross_validation():  # pragma: no cover - needs real codec
    import io

    from PIL import Image

    rng = np.random.default_rng(61)
    idx = rng.integers(0, 256, (20, 30))
    ours = G.encode_gif(idx, PAL256)
    pil_out = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.array_equal(pil_out, PAL256[idx])

    img = Image.fromarray(PAL256[idx]).convert("P", palette=Image.ADAPTIVE)
    buf = io.BytesIO()
    img.save(buf, format="GIF")
    theirs = G.decode_gif(buf.getvalue())
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.array_equal(theirs, ref)
