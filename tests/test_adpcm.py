"""IMA-ADPCM codec tests (operators/adpcm.py + the WAV 0x11 container).

The stateful audio codec: pytest pins the state machine against an
independently-written reference decoder, the clamp edges, the nibble
packing, and the container dispatch; the cross-engine exactness of the
full recursion lives in multimodal_adpcm_roundtrip's recursive-CTE
oracle."""

from __future__ import annotations

import numpy as np
import pytest

from dataingestion_pt_ms_spark.operators import adpcm as A
from dataingestion_pt_ms_spark.operators import multimodal as M


def _reference_decode(codes, predictor=0, index=0):
    """Independent transcription of the IMA spec, structured differently
    from the module (per-bit list sum instead of cascaded ifs)."""
    out, pred, idx = [], predictor, index
    for code in codes:
        step = int(A.STEP_TABLE[idx])
        delta = (step >> 3) + sum(
            step >> s for b, s in ((4, 0), (2, 1), (1, 2)) if code & b
        )
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(A.INDEX_TABLE[code & 7])))
        out.append(pred)
    return np.array(out, dtype=np.int16)


def test_decoder_matches_independent_reference():
    rng = np.random.default_rng(13)
    codes = rng.integers(0, 16, 500)
    got = A.adpcm_decode(codes, predictor=100, index=5)
    assert np.array_equal(got, _reference_decode(codes, 100, 5))


def test_encoder_decoder_shared_state():
    """decode(encode(x)) must equal the encoder's own reconstruction —
    and re-encoding the reconstruction must be lossless (fixed point)."""
    t = np.arange(400)
    s = (8000 * np.sin(t / 9) + 3000 * np.sin(t / 37)).astype(np.int16)
    codes, fp, fi = A.adpcm_encode(s, predictor=int(s[0]), index=0)
    dec = A.adpcm_decode(codes, predictor=int(s[0]), index=0)
    codes2, _, _ = A.adpcm_encode(dec, predictor=int(s[0]), index=0)
    dec2 = A.adpcm_decode(codes2, predictor=int(s[0]), index=0)
    err2 = np.abs(dec2.astype(int) - dec.astype(int))
    # fixed-point within one step quantum on an already-reconstructed signal
    assert np.median(err2) == 0


def test_error_bound_tracks_step_table():
    """When the quantizer is NOT slope-overloaded (code magnitude < 7),
    the per-sample error is bounded by the CURRENT step (the quantizer
    cell width). Saturated codes — the attack transient while the index
    ramps from 0 — are exactly ADPCM's slope-overload and are exempt;
    the test also asserts the ramp ends (no saturation after it)."""
    t = np.arange(600)
    s = (6000 * np.sin(t / 11)).astype(np.int16)
    codes, _, _ = A.adpcm_encode(s[1:], predictor=int(s[0]), index=0)
    pred, idx = int(s[0]), 0
    last_saturated = -1
    for i, code in enumerate(codes):
        step = int(A.STEP_TABLE[idx])
        dec = A.adpcm_decode([code], predictor=pred, index=idx)
        target = int(s[i + 1])
        if (code & 7) != 7 and -32768 < dec[0] < 32767:
            assert abs(int(dec[0]) - target) <= step, (i, step)
        elif (code & 7) == 7:
            last_saturated = i
        pred = int(dec[0])
        idx = max(0, min(88, idx + int(A.INDEX_TABLE[code & 7])))
    assert last_saturated < 40  # the attack ramp converges quickly


def test_state_clamps_at_extremes():
    """Alternating full-scale forces the index to its 88 ceiling and the
    predictor through both int16 clamps without leaving the domain."""
    s = np.tile([32767, -32768], 300).astype(np.int16)
    codes, fp, fi = A.adpcm_encode(s, predictor=0, index=0)
    dec = A.adpcm_decode(codes, predictor=0, index=0)
    assert dec.min() >= -32768 and dec.max() <= 32767
    assert 0 <= fi <= 88
    # the step should have ramped to the table top
    assert fi > 80


def test_nibble_pack_roundtrip():
    rng = np.random.default_rng(17)
    for n in (0, 1, 2, 7, 100, 255):
        codes = rng.integers(0, 16, n).astype(np.uint8)
        assert np.array_equal(A.unpack_nibbles(A.pack_nibbles(codes), n), codes)


def test_wav_container_format_0x11():
    t = np.arange(256)
    s = (8000 * np.sin(t / 9)).astype(np.int16)
    data = M.encode_wav(s, 8000, "ima_adpcm")
    got, rate = M.decode_wav(data)
    assert rate == 8000 and len(got) == 256
    assert got[0] == s[0]  # block header carries sample 0 verbatim
    codes, _, _ = A.adpcm_encode(s[1:], predictor=int(s[0]), index=0)
    expect = np.concatenate(
        [s[:1], A.adpcm_decode(codes, predictor=int(s[0]), index=0)]
    )
    assert np.array_equal(got, expect)
    # fidelity sanity on smooth content
    assert np.abs(got.astype(int) - s.astype(int)).mean() < 500


def test_wav_rejects_bad_adpcm_bits():
    import struct

    data = bytearray(M.encode_wav(np.zeros(8, dtype=np.int16), 8000, "ima_adpcm"))
    struct.pack_into("<H", data, 34, 16)  # claim 16-bit ADPCM
    with pytest.raises(ValueError, match="format 17"):
        M.decode_wav(bytes(data))
    with pytest.raises(ValueError, match="at least one"):
        M.encode_wav(np.zeros(0, dtype=np.int16), 8000, "ima_adpcm")
