"""IMA-ADPCM (DVI4) codec — the STATEFUL audio codec of the multimodal
family (round 7 continuation).

μ-law/A-law are memoryless per-sample maps; IMA-ADPCM carries a
(predictor, step-index) state across samples — 4 bits per sample, the
classic telephony/game-audio WAV format tag 0x11. The state machine is
pure integer arithmetic (shifts, clamps, two public lookup tables from
the IMA ADPCM spec), so the ENTIRE encode+decode recursion is
replayable in SQL as a recursive CTE — the multimodal_adpcm_roundtrip
oracle does exactly that, making this the registry's demonstration that
even sequential-by-spec decoders stay under full value oracles.

Parallelism shape: sequential WITHIN a payload by spec (each nibble
depends on the previous state), embarrassingly parallel ACROSS payloads
via Arrow-batched mapInPandas — same argument as PNG's per-row
unfiltering. The numpy loop below is per-payload; payloads are small
(audio blocks), corpora are wide.

Reference provenance: beyond-reference [NS] (the 688-LoC ingest service
has no audio surface). Tables are the public IMA spec constants.
"""

from __future__ import annotations

import numpy as np

# IMA ADPCM spec tables (public constants).
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def adpcm_encode(samples, predictor: int = 0, index: int = 0):
    """Encode int16 PCM to 4-bit IMA-ADPCM nibble codes (one uint8 code
    value 0..15 per sample; WAV packing pairs them elsewhere). Returns
    (codes, final_predictor, final_index). The encoder tracks the SAME
    reconstructed predictor the decoder will — that shared-state
    discipline is what makes the codec converge."""
    x = np.asarray(samples, dtype=np.int64)
    codes = np.empty(len(x), dtype=np.uint8)
    pred, idx = int(predictor), int(index)
    for i, v in enumerate(x):
        step = int(STEP_TABLE[idx])
        diff = int(v) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        codes[i] = code
        # reconstruct exactly as the decoder will
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred = _clamp16(pred - delta if code & 8 else pred + delta)
        idx = max(0, min(88, idx + int(INDEX_TABLE[code & 7])))
    return codes, pred, idx


def adpcm_decode(codes, predictor: int = 0, index: int = 0):
    """Decode 4-bit IMA-ADPCM codes back to int16 PCM."""
    c = np.asarray(codes, dtype=np.int64)
    out = np.empty(len(c), dtype=np.int16)
    pred, idx = int(predictor), int(index)
    for i, code in enumerate(c):
        step = int(STEP_TABLE[idx])
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred = _clamp16(pred - delta if code & 8 else pred + delta)
        idx = max(0, min(88, idx + int(INDEX_TABLE[code & 7])))
        out[i] = pred
    return out


def pack_nibbles(codes) -> bytes:
    """WAV IMA-ADPCM nibble order: low nibble first."""
    c = np.asarray(codes, dtype=np.uint8)
    if len(c) % 2:
        c = np.append(c, np.uint8(0))
    return (c[0::2] | (c[1::2] << 4)).astype(np.uint8).tobytes()


def unpack_nibbles(data: bytes, n: int):
    b = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(len(b) * 2, dtype=np.uint8)
    out[0::2] = b & 0x0F
    out[1::2] = b >> 4
    return out[:n]
