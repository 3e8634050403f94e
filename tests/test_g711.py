"""G.711 μ-law / A-law companding tests (operators/multimodal.py).

The central claim the multimodal_g711_roundtrip oracle rests on: the SQL
closed forms equal the numpy codecs for EVERY int16 value — verified
exhaustively here (65 536 values per law), alongside the classic G.711
properties (idempotence after one compand cycle, bounded segment error,
monotonicity) and the WAV format-tag 6/7 container dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from dataingestion_pt_ms_spark.operators import multimodal as M

V = np.arange(-32768, 32768, dtype=np.int64)


def _mulaw_closed_form(v: np.ndarray) -> np.ndarray:
    sign = v < 0
    m = np.minimum(np.abs(v), 32635) + 132
    e = np.select(
        [m < 256, m < 512, m < 1024, m < 2048, m < 4096, m < 8192, m < 16384],
        [0, 1, 2, 3, 4, 5, 6], 7,
    )
    mant = (m // (1 << (e + 3))) % 16
    mag = (mant * 8 + 132) * (1 << e) - 132
    return np.where(sign, -mag, mag)


def _alaw_closed_form(v: np.ndarray) -> np.ndarray:
    x13 = np.floor_divide(v, 8)
    neg = x13 < 0
    mag = np.where(neg, -x13 - 1, x13)
    e = np.select(
        [mag < 32, mag < 64, mag < 128, mag < 256, mag < 512, mag < 1024, mag < 2048],
        [0, 1, 2, 3, 4, 5, 6], 7,
    )
    low = np.where(e < 2, (mag // 2) % 16, (mag // (1 << e)) % 16)
    magp = np.where(e == 0, 2 * low + 1, (2 * low + 33) * (1 << np.maximum(e - 1, 0)))
    return 8 * np.where(neg, -magp - 1, magp)


def test_mulaw_sql_closed_form_exhaustive():
    dec = M.mulaw_decode(M.mulaw_encode(V.astype(np.int16))).astype(np.int64)
    assert np.array_equal(dec, _mulaw_closed_form(V))


def test_alaw_sql_closed_form_exhaustive():
    dec = M.alaw_decode(M.alaw_encode(V.astype(np.int16))).astype(np.int64)
    assert np.array_equal(dec, _alaw_closed_form(V))


def test_companding_idempotent_after_one_cycle():
    for enc, dec in ((M.mulaw_encode, M.mulaw_decode), (M.alaw_encode, M.alaw_decode)):
        once = dec(enc(V.astype(np.int16)))
        twice = dec(enc(once))
        assert np.array_equal(once, twice)


def test_error_bounds_per_segment():
    """μ-law: |err| ≤ half the top-segment quantum (512) vs the CLIPPED
    input; A-law: ≤ 512 + the 8-unit 13-bit truncation."""
    dec = M.mulaw_decode(M.mulaw_encode(V.astype(np.int16))).astype(np.int64)
    clipped = np.clip(V, -32635, 32635)
    assert np.abs(dec - clipped).max() <= 512
    deca = M.alaw_decode(M.alaw_encode(V.astype(np.int16))).astype(np.int64)
    assert np.abs(deca - V).max() <= 520


def test_decode_is_monotone_nondecreasing():
    """Companding must preserve order: decode(encode(x)) is monotone in x."""
    for enc, dec in ((M.mulaw_encode, M.mulaw_decode), (M.alaw_encode, M.alaw_decode)):
        d = dec(enc(V.astype(np.int16))).astype(np.int64)
        assert (np.diff(d) >= 0).all()


def test_mulaw_all_256_codes_decode_in_range():
    codes = np.arange(256, dtype=np.uint8)
    d = M.mulaw_decode(codes).astype(np.int64)
    assert d.min() >= -32635 and d.max() <= 32635
    # sign structure: bit 7 of the un-complemented byte selects sign
    assert (d[: 128] <= 0).all() and (d[128:] >= 0).all()


def test_wav_format_tags_6_and_7():
    s = ((np.arange(800) * 37) % 64001 - 32000).astype(np.int16)
    for codec, fmt_ref in (("mulaw", M.mulaw_decode), ("alaw", M.alaw_decode)):
        enc = (M.mulaw_encode if codec == "mulaw" else M.alaw_encode)(s)
        data = M.encode_wav(s, 8000, codec)
        assert len(data) == 44 + len(s)  # one byte per sample
        got, rate = M.decode_wav(data)
        assert rate == 8000
        assert np.array_equal(got, fmt_ref(enc))
    # PCM16 unchanged
    got, _ = M.decode_wav(M.encode_wav(s, 8000))
    assert np.array_equal(got, s)


def test_wav_rejects_stereo_and_bad_bits():
    import struct

    s = np.zeros(4, dtype=np.int16)
    data = bytearray(M.encode_wav(s, 8000, "mulaw"))
    # fmt chunk starts at byte 20: tag(2) channels(2) ...bits at +14
    struct.pack_into("<H", data, 34, 16)  # claim 16-bit μ-law
    with pytest.raises(ValueError, match="format 7"):
        M.decode_wav(bytes(data))
