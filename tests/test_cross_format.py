"""Cross-format perceptual dedup tests: image_ahash64 + the
PNG-vs-JPEG re-encode pairing that multimodal_cross_format_dedup's
oracle pins end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from dataingestion_pt_ms_spark.operators import gif as G
from dataingestion_pt_ms_spark.operators import jpeg as J
from dataingestion_pt_ms_spark.operators import multimodal as M


def _ahash_of(spark, payloads):
    df = spark.createDataFrame(
        [(k, bytearray(b)) for k, b in payloads], "key long, media_bytes binary"
    )
    return {
        r.key: r.ahash for r in M.image_ahash64(df, key_col="key").collect()
    }


def _blocky(m: int) -> np.ndarray:
    bi, bj = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    g = (m * 31 + bi * 7 + bj * 3 + (m + 1) * (bi * 8 + bj + 1) * 2654435761) % 256
    return np.repeat(np.repeat(g, 8, axis=0), 8, axis=1).astype("uint8")


def test_ahash_format_invariant_for_lossless(spark):
    """The SAME pixels as PNG, BMP and GIF must hash bit-identically —
    the fingerprint sees pixels, not container bytes."""
    pix = _blocky(5)
    rgb = np.stack([pix] * 3, axis=-1)
    pal = np.stack([np.arange(256)] * 3, axis=-1).astype("uint8")  # identity gray
    hashes = _ahash_of(
        spark,
        [
            (1, M.encode_png(rgb)),
            (2, M.encode_bmp(rgb)),
            (3, G.encode_gif(pix.astype(int), pal)),
        ],
    )
    assert hashes[1] == hashes[2] == hashes[3]


def test_ahash_jpeg_twin_within_two_bits(spark):
    """Quality-50 JPEG of constant 8×8 blocks moves each block ≤1 gray
    level, so the box-sum aHash stays within hamming 2 of the lossless
    twin (the threshold the dedup query uses)."""
    for m in (0, 3, 7, 42):
        pix = _blocky(m)
        hashes = _ahash_of(
            spark,
            [
                (1, M.encode_png(np.stack([pix] * 3, axis=-1))),
                (2, J.encode_jpeg(pix, quality=50)),
            ],
        )
        assert bin(hashes[1] ^ hashes[2]).count("1") <= 2, m


def test_ahash_rejects_nondivisible_dims(spark):
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_bmp(np.zeros((9, 16, 3), dtype="uint8"))))],
        "key long, media_bytes binary",
    )
    with pytest.raises(Exception, match="not divisible"):
        M.image_ahash64(df, key_col="key").collect()


def test_sniff_media_kind_magic_bytes():
    pix = np.zeros((8, 8, 3), dtype="uint8")
    pal = np.zeros((4, 3), dtype="uint8")
    assert M.sniff_media_kind(M.encode_png(pix)) == "image/png"
    assert M.sniff_media_kind(M.encode_bmp(pix)) == "image/bmp"
    assert M.sniff_media_kind(G.encode_gif(np.zeros((4, 4), dtype=int), pal)) == "image/gif"
    assert M.sniff_media_kind(J.encode_jpeg(pix[:, :, 0], 50)) == "image/jpeg"
    s = np.zeros(8, dtype=np.int16)
    for codec in ("pcm16", "mulaw", "alaw", "ima_adpcm"):
        assert M.sniff_media_kind(M.encode_wav(s, 8000, codec)) == "audio/wav"
    assert M.sniff_media_kind(b"plain text bytes") == "application/octet-stream"


def test_media_triage_groups(spark):
    from dataingestion_pt_ms_spark.queries.llm_similarity import (
        multimodal_media_triage,
    )

    rows = multimodal_media_triage(spark, "/root/testdata/sf0.001").collect()
    got = {(r.media_kind, r.codec): r.n_payloads for r in rows}
    assert got == {
        ("audio/wav", "ima_adpcm"): 20,
        ("audio/wav", "mulaw"): 20,
        ("audio/wav", "pcm16"): 20,
        ("image/bmp", "bmp"): 20,
        ("image/gif", "gif"): 20,
        ("image/jpeg", "jpeg"): 20,
        ("image/png", "png"): 20,
    }
    assert all(r.avg_metric > 0 for r in rows)


def test_cross_format_query_finds_exactly_planted_pairs(spark):
    from dataingestion_pt_ms_spark.queries.llm_similarity import (
        _XF_JKEY,
        _XF_PANEL,
        multimodal_cross_format_dedup,
    )

    rows = multimodal_cross_format_dedup(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r.key_a, r.key_b) for r in rows}
    assert pairs == {(d, d + _XF_JKEY) for d in range(_XF_PANEL)}
    assert all(r.hamming <= 2 for r in rows)
