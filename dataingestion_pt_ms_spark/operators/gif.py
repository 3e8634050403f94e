"""Codec-free GIF (87a/89a) encode/decode — stdlib + numpy.

Completes the legacy-web-format family (BMP, PNG, baseline JPEG, now
GIF): GIF is the fourth format a web-scrape curation pipeline actually
meets, and its LZW entropy coder is fully implementable with integers —
so, unlike JPEG, the decode is LOSSLESS and the SQL oracle replays exact
pixels, PNG-style.

Implemented surface:
- encoder: GIF89a framing, global color table, real variable-width LZW
  compression (LSB-first bit packing, clear/EOI codes, dictionary growth
  to 12 bits with clear-and-restart on overflow), 255-byte sub-block
  chunking, optional interlaced row order, optional local color table.
- decoder: header + logical-screen parse, extension-block skipping
  (graphic control / comment / application), local-color-table override,
  interlace de-interleave (the four 8/8/4/2-stride passes), LZW decode
  honoring dynamic code-width growth and mid-stream clear codes.

Animation frames beyond the first are out of scope (the decoder returns
the first image descriptor's frame; multi-frame sampling belongs to the
video family, queries/llm_similarity.py:multimodal_video_shot_boundaries).

At 100 TB: like the other codecs, decode rides Arrow-batched
``mapInPandas`` over the binary column — embarrassingly parallel.
Reference provenance: beyond-reference [NS] (the 688-LoC ingest service,
app/main.py, has no media surface).
"""

from __future__ import annotations

import struct

import numpy as np

# The canonical interlace passes: (row offset, row stride).
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for off, stride in _INTERLACE_PASSES:
        order.extend(range(off, height, stride))
    return order


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


class _LSBBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= (code & ((1 << width) - 1)) << self._n
        self._n += width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytearray:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return self.out


def lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW over a palette-index stream: emits CLEAR first,
    grows the code width at dictionary sizes 2^w, clears and restarts at
    4096 entries, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    writer = _LSBBitWriter()

    def fresh() -> tuple[dict, int, int]:
        return (
            {(i,): i for i in range(clear)},
            eoi + 1,  # next code to assign
            min_code_size + 1,  # current code width
        )

    table, next_code, width = fresh()
    writer.write(clear, width)
    seq: tuple[int, ...] = ()
    for raw in indices:
        sym = int(raw)
        trial = seq + (sym,)
        if trial in table:
            seq = trial
            continue
        writer.write(table[seq], width)
        table[trial] = next_code
        next_code += 1
        # standard EARLY width growth (mirrored in lzw_decompress): grow
        # as soon as the NEXT code to assign needs more bits, so an
        # immediately-emitted KwKwK code always fits; at 4096 the table
        # is full — emit CLEAR and restart (never deferred-clear on the
        # write side, though the decoder tolerates it)
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4096:
            writer.write(clear, width)
            table, next_code, width = fresh()
        seq = (sym,)
    if seq:
        writer.write(table[seq], width)
        # tail off-by-one: the decoder APPENDS an entry while processing
        # this final code (bringing its table to next_code entries) and,
        # under the early-growth rule, widens before reading EOI when
        # that append lands one short of the boundary — but no encoder
        # assignment happens after the flush, so mirror the decoder's
        # check explicitly or EOI is written and read at different
        # widths (data-dependent ~1/2^w of streams; regression test
        # pins the seed that caught it)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    writer.write(eoi, width)
    return bytes(writer.flush())


def lzw_decompress(data: bytes, min_code_size: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                new = prev + (entry[0],)
            elif code == len(table):  # the KwKwK case
                entry = prev + (prev[0],)
                new = entry
            else:
                raise ValueError(f"LZW code {code} beyond table size {len(table)}")
            if len(table) < 4096:  # full table: tolerate deferred clear
                table.append(new)
                # width growth mirrors lzw_compress's next_code == 2^w,
                # MINUS ONE: the decoder's table lags the encoder's by
                # exactly one entry (the encoder assigns the entry for a
                # string the decoder can only reconstruct from the NEXT
                # code), so the reader must widen one entry early
                if len(table) == (1 << width) - 1 and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    return np.array(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# Container framing
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(
    indices,
    palette,
    interlace: bool = False,
    local_palette: bool = False,
    comment: bytes | None = None,
) -> bytes:
    """Serialize an (h, w) palette-index array + (n, 3) uint8 palette to
    GIF89a bytes. ``local_palette`` moves the table into the image
    descriptor (exercising the decoder's LCT override); ``comment`` adds
    an extension block (exercising extension skipping)."""
    idx = np.asarray(indices, dtype=np.int64)
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3) uint8")
    if idx.min() < 0 or idx.max() >= len(pal):
        raise ValueError("palette index out of range")
    h, w = idx.shape
    # color-table size field: 2^(s+1) entries, padded with zeros
    s = max(1, (max(2, int(len(pal))) - 1).bit_length() - 1)
    n_slots = 1 << (s + 1)
    if n_slots < len(pal):
        s += 1
        n_slots = 1 << (s + 1)
    table = np.zeros((n_slots, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    min_code_size = max(2, s + 1)

    out = bytearray()
    out += b"GIF89a"
    gct_flag = 0 if local_palette else 1
    out += struct.pack("<HH", w, h)
    out += bytes([(gct_flag << 7) | (7 << 4) | s, 0, 0])
    if gct_flag:
        out += table.tobytes()
    if comment is not None:
        out += b"\x21\xfe" + _sub_blocks(comment)
    # graphic control extension (fixed, exercises extension skipping too)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += _image_descriptor(
        idx, table, s, min_code_size,
        local_palette=local_palette, interlace=interlace,
    )
    out += b"\x3b"
    return bytes(out)


def _iter_gif_frames(data: bytes):
    """Yield (left, top, index_array, palette) per image descriptor,
    walking the whole stream; shared by decode_gif / decode_gif_frames."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad magic")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    yield (sw, sh)  # first item: the logical screen size
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        ipacked = data[pos + 9]
        pos += 10
        pal = gct
        if ipacked & 0x80:  # local color table overrides
            n = 1 << ((ipacked & 0x07) + 1)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("no color table (global or local)")
        interlaced = bool(ipacked & 0x40)
        min_code_size = data[pos]
        pos += 1
        compressed = bytearray()
        while data[pos] != 0:
            size = data[pos]
            compressed += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1  # the 0x00 block terminator
        indices = lzw_decompress(bytes(compressed), min_code_size)
        if len(indices) < h * w:
            raise ValueError(f"LZW yielded {len(indices)} indices, need {h * w}")
        idx = indices[: h * w].reshape(h, w)
        if interlaced:
            rows = np.empty((h, w), dtype=np.int64)
            rows[_interlace_order(h)] = idx
            idx = rows
        if idx.max() >= len(pal):
            raise ValueError("palette index out of range")
        yield (left, top, idx, pal)


def decode_gif(data: bytes):
    """Decode GIF bytes to an (h, w, 3) uint8 RGB array (first frame)."""
    it = _iter_gif_frames(data)
    next(it)  # screen size
    for left, top, idx, pal in it:
        return pal[idx]
    raise ValueError("GIF has no image descriptor")


def decode_gif_frames(data: bytes):
    """Demux an animated GIF into an (n_frames, H, W, 3) uint8 array.

    Frames after the first may be SUB-RECTANGLES (the standard
    delta-frame optimization; see encode_animated_gif) — each is
    composited onto the running canvas at its (left, top) offset, i.e.
    disposal method 1 "leave in place". Transparency and
    restore-to-background disposal are out of scope (our encoder never
    emits them; a ValueError-free parse of third-party files only needs
    the compositing implemented here when those flags are unset)."""
    it = _iter_gif_frames(data)
    sw, sh = next(it)
    canvas = np.zeros((sh, sw), dtype=np.int64)
    frames = []
    for left, top, idx, pal in it:
        h, w = idx.shape
        if top + h > sh or left + w > sw:
            raise ValueError("frame rectangle outside logical screen")
        canvas[top : top + h, left : left + w] = idx
        frames.append(pal[canvas])
    if not frames:
        raise ValueError("GIF has no image descriptor")
    return np.stack(frames)


def _image_descriptor(
    idx: np.ndarray,
    table: np.ndarray,
    s: int,
    min_code_size: int,
    left: int = 0,
    top: int = 0,
    local_palette: bool = False,
    interlace: bool = False,
) -> bytes:
    h, w = idx.shape
    out = bytearray()
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    out += bytes(
        [(int(local_palette) << 7) | (int(interlace) << 6) | (s if local_palette else 0)]
    )
    if local_palette:
        out += table.tobytes()
    rows = idx[_interlace_order(h)] if interlace else idx
    out += bytes([min_code_size])
    out += _sub_blocks(lzw_compress(rows.reshape(-1), min_code_size))
    return bytes(out)


def encode_animated_gif(frames, palette, loop: bool = True) -> bytes:
    """Serialize a list/array of (h, w) index frames (all the same shape,
    one shared global palette) to an animated GIF89a. Frames after the
    first are DELTA-ENCODED: only the bounding rectangle of pixels that
    changed vs the previous frame is stored (emitting the full frame
    would be legal but this is what real GIF optimizers do, and it
    exercises the decoder's sub-rect compositing); an unchanged frame
    stores a 1×1 rect. Each frame gets a graphic-control extension;
    ``loop`` adds the NETSCAPE2.0 application extension."""
    frames = [np.asarray(f, dtype=np.int64) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all frames must share one shape")
    pal = np.asarray(palette, dtype=np.uint8)
    hi = max(int(f.max()) for f in frames)
    if hi >= len(pal) or min(int(f.min()) for f in frames) < 0:
        raise ValueError("palette index out of range")
    s = max(1, (max(2, int(len(pal))) - 1).bit_length() - 1)
    if (1 << (s + 1)) < len(pal):
        s += 1
    table = np.zeros((1 << (s + 1), 3), dtype=np.uint8)
    table[: len(pal)] = pal
    min_code_size = max(2, s + 1)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([(1 << 7) | (7 << 4) | s, 0, 0])
    out += table.tobytes()
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    prev = None
    for f in frames:
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE: 4cs delay
        if prev is None:
            out += _image_descriptor(f, table, s, min_code_size)
        else:
            changed = np.nonzero(f != prev)
            if len(changed[0]) == 0:
                out += _image_descriptor(f[:1, :1], table, s, min_code_size)
            else:
                y0, y1 = int(changed[0].min()), int(changed[0].max()) + 1
                x0, x1 = int(changed[1].min()), int(changed[1].max()) + 1
                out += _image_descriptor(
                    f[y0:y1, x0:x1], table, s, min_code_size, left=x0, top=y0
                )
        prev = f
    out += b"\x3b"
    return bytes(out)
