"""Full GIF (87a/89a) codec in pure numpy + stdlib.

Round-5 wall removal, completing the crawled-web raster surface next to
baseline/progressive JPEG (functions/jpeg.py) and full-spec PNG
(functions/png.py): GIF is the third format a real image corpus contains,
and the engine previously had no reader at all. This module decodes the
whole spec surface:

- GIF87a and GIF89a, global and per-frame local color tables
- variable-width LSB-first LZW with clear/EOI codes, dictionary growth to
  4095 and the deferred-clear edge (width pinned at 12 until a clear code)
- the 4-pass row interlace
- Graphic Control Extension: transparency index, frame delay, disposal
  methods 0/1 (leave), 2 (restore to background), 3 (restore to previous)
- multi-frame animations, composited frame-by-frame on the logical screen

Canonical output is the engine's standard uint8 RGB (h, w, 3) on the
LOGICAL SCREEN: undrawn / transparent background pixels are opaque white —
the same alpha-over-white convention as functions/png.py (a fully
transparent pixel has alpha 0, and (c*0 + 255*255 + 127)//255 == 255).
``decode`` returns the first composited frame; ``decode_frames`` returns
every composited frame with its delay for the video/frame-sample pipeline
(operators/media.py).

The encoder (``encode_ex``) writes indexed frames with any of the above
features — local palettes, transparency, all disposal methods, interlace —
so tests and fixtures can plant every decode path deterministically
without external files; like the PNG writer it does no color quantization
(fixtures are born indexed). The LZW vectors in tests/test_gif.py are
built from the spec algorithm independently of this module.

Reference parity: the reference (TheTinHat/MaskMyPy) delegates raster IO
to its geopandas/PIL stack; this engine ships its own codecs because the
sandbox has no PIL (SURVEY §7 consequence 4).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4095  # 12-bit code cap (GIF89a appendix F)


# ---------------------------------------------------------------------- LZW

def lzw_decode(mcs: int, data: bytes, n_expected: int) -> np.ndarray:
    """Variable-width LSB-first GIF-LZW. ``mcs`` = minimum code size from
    the image data block; returns exactly ``n_expected`` indices."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    # dictionary: suffix byte + prefix link, rebuilt on clear
    prefix = np.empty(_MAX_CODE + 1, dtype=np.int32)
    suffix = np.empty(_MAX_CODE + 1, dtype=np.int32)
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    width = mcs + 1
    next_code = eoi + 1
    prev = -1
    acc = 0
    nbits = 0
    buf = bytearray(_MAX_CODE + 1)

    def emit(code: int) -> int:
        # walk the prefix chain (reversed), return first index of the string
        n = 0
        c = code
        while c >= clear:  # chained entry (codes < clear are literals)
            buf[n] = suffix[c]
            n += 1
            c = prefix[c]
        buf[n] = c
        n += 1
        nonlocal n_out
        if n_out + n > n_expected:
            raise ValueError("gif: LZW output exceeds image size")
        out[n_out : n_out + n] = np.frombuffer(bytes(buf[:n]), dtype=np.uint8)[
            ::-1
        ]
        n_out += n
        return c

    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                next_code = eoi + 1
                width = mcs + 1
                prev = -1
                continue
            if code == eoi:
                if n_out != n_expected:
                    raise ValueError(
                        f"gif: EOI after {n_out} of {n_expected} pixels"
                    )
                return out
            if prev < 0:
                if code >= clear:
                    raise ValueError("gif: first code must be a literal")
                out[n_out] = code
                n_out += 1
                prev = code
                continue
            if code < next_code:
                first = emit(code)
            elif code == next_code:
                # KwKwK case: string = prev + first(prev)
                c = prev
                while c >= clear:
                    c = prefix[c]
                first = c
                if n_out + 1 > n_expected:
                    raise ValueError("gif: LZW output exceeds image size")
                emit(prev)
                out[n_out] = first
                n_out += 1
            else:
                raise ValueError(f"gif: code {code} beyond dictionary")
            if next_code <= _MAX_CODE:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
    if n_out != n_expected:
        raise ValueError(f"gif: stream ended at {n_out} of {n_expected} pixels")
    return out


def lzw_encode(mcs: int, indices: np.ndarray) -> bytes:
    """GIF-LZW compress ``indices`` (values < 2**mcs' where mcs >= 2)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = mcs + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8

    put(clear)
    prev = -1
    for v in indices.reshape(-1):
        v = int(v)
        if prev < 0:
            prev = v
            continue
        got = table.get((prev, v))
        if got is not None:
            prev = got
            continue
        put(prev)
        if next_code > _MAX_CODE:
            put(clear)
            table.clear()
            next_code = eoi + 1
            width = mcs + 1
        else:
            # lock-step with the decoder: widen AFTER writing this code but
            # BEFORE assigning its entry (giflib's RunningCode >= MaxCode1
            # check in EGifCompressOutput precedes the hash-table insert).
            # The decoder's first code after a clear creates no entry, so
            # its entry counter lags the writer by one; checking pre-insert
            # here makes both switch widths at the same absolute position.
            if next_code >= (1 << width) and width < 12:
                width += 1
            table[(prev, v)] = next_code
            next_code += 1
        prev = v
    if prev >= 0:
        put(prev)
    put(eoi)
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Split a payload into <=255-byte counted sub-blocks + terminator."""
    out = bytearray()
    for s in range(0, len(data), 255):
        part = data[s : s + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for y0, dy in _INTERLACE_PASSES:
        n = len(range(y0, h, dy))
        out[y0::dy] = rows[src : src + n]
        src += n
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    return np.concatenate([rows[y0::dy] for y0, dy in _INTERLACE_PASSES])


# ------------------------------------------------------------------ decode

def decode_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """All composited frames of a GIF as (delay_centiseconds, uint8 RGB on
    the logical screen). Undrawn / transparent-background pixels are white
    (the engine's canonical alpha-over-white)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = (
            np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
            .reshape(n, 3)
            .astype(np.int32)
        )
        pos += 3 * n
    canvas = np.full((h, w, 3), 255, dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    transparent = -1
    disposal = 0
    delay = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                ln = data[pos]
                gflags, delay, tidx = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                pos += 1 + ln
                if data[pos] != 0:
                    raise ValueError("gif: unterminated GCE")
                pos += 1
                disposal = (gflags >> 2) & 7
                transparent = tidx if gflags & 1 else -1
            else:  # skip any other extension's sub-blocks
                while True:
                    ln = data[pos]
                    pos += 1 + ln
                    if ln == 0:
                        break
            continue
        if b != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{b:02X}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = (
                np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
                .reshape(n, 3)
                .astype(np.int32)
            )
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: frame without any color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            lzw += data[pos : pos + ln]
            pos += ln
        idx = lzw_decode(mcs, bytes(lzw), fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("gif: color index out of range")
        if disposal == 3:
            saved = canvas[fy : fy + fh, fx : fx + fw].copy()
        rgb = ct[idx].astype(np.uint8)
        target = canvas[fy : fy + fh, fx : fx + fw]
        if transparent >= 0:
            opaque = idx != transparent
            target[opaque] = rgb[opaque]
        else:
            target[:] = rgb
        frames.append((delay, canvas.copy()))
        if disposal == 2:  # restore rect to background (canonical: white)
            canvas[fy : fy + fh, fx : fx + fw] = 255
        elif disposal == 3:
            canvas[fy : fy + fh, fx : fx + fw] = saved
        transparent = -1
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("gif: no image data")
    return frames


def decode(data: bytes) -> np.ndarray:
    """First composited frame as canonical uint8 RGB (h, w, 3)."""
    return decode_frames(data)[0][1]


# ------------------------------------------------------------------ encode

def encode_ex(
    frames,
    palette: np.ndarray,
    *,
    screen: tuple[int, int] | None = None,
    rects=None,
    local_palettes=None,
    delays=None,
    disposals=None,
    transparents=None,
    interlace: bool = False,
    loop: bool = True,
    version: bytes = b"GIF89a",
) -> bytes:
    """Write indexed frames as a GIF.

    frames: list of (h, w) uint8 index arrays. palette: global (n, 3)
    color table (n a power of two, 4..256 — GIF's minimum code size is 2).
    rects: per-frame (x, y) placement on the logical screen (default 0,0);
    local_palettes / delays (centiseconds) / disposals / transparents:
    per-frame, None entries fall back to global/defaults. This writer
    exists so tests/fixtures can plant every decode path deterministically
    (like png.encode_ex); it quantizes nothing — frames are born indexed."""
    k = len(frames)
    rects = rects or [(0, 0)] * k
    local_palettes = local_palettes or [None] * k
    delays = delays or [0] * k
    disposals = disposals or [0] * k
    transparents = transparents if transparents is not None else [-1] * k
    if screen is None:
        screen = (
            max(r[0] + f.shape[1] for r, f in zip(rects, frames)),
            max(r[1] + f.shape[0] for r, f in zip(rects, frames)),
        )
    sw, sh = screen

    def _ct_bits(pal: np.ndarray) -> int:
        n = len(pal)
        if n < 4 or n > 256 or n & (n - 1):
            raise ValueError("gif: palette size must be a power of two in 4..256")
        return n.bit_length() - 2  # log2(n) - 1

    out = bytearray(version)
    gbits = _ct_bits(palette)
    out += struct.pack("<HHBBB", sw, sh, 0x80 | gbits, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    if loop and k > 1:
        # application extension: NETSCAPE2.0 infinite loop
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(k):
        idx = np.asarray(frames[f], dtype=np.uint8)
        fh, fw = idx.shape
        fx, fy = rects[f]
        pal = local_palettes[f]
        tr = transparents[f]
        if tr >= 0 or delays[f] or disposals[f]:
            gflags = ((disposals[f] & 7) << 2) | (1 if tr >= 0 else 0)
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", gflags, delays[f], max(tr, 0)
            ) + b"\x00"
        iflags = (0x40 if interlace else 0) | (
            0x80 | _ct_bits(pal) if pal is not None else 0
        )
        out += b"\x2c" + struct.pack("<HHHHB", fx, fy, fw, fh, iflags)
        if pal is not None:
            out += pal.astype(np.uint8).tobytes()
        n_colors = len(pal if pal is not None else palette)
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("gif: frame index exceeds palette")
        mcs = max(2, (n_colors - 1).bit_length())
        body = _interlace(idx) if interlace else idx
        out += bytes([mcs]) + _sub_blocks(lzw_encode(mcs, body))
    out += b"\x3b"
    return bytes(out)


def encode_gif(img_idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Single-frame, global-palette, non-interlaced — the simple layout."""
    return encode_ex([img_idx], palette)


def palettize(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(index array, power-of-two-padded palette) for uint8 RGB ``pixels``
    of shape (..., 3) with <= 256 distinct colors (np.unique builds the
    global table deterministically). GIF's color-QUANTIZATION step is
    deliberately out of scope — rich-color content must be quantized
    first, so the error names that step."""
    flat = pixels.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"gif encode needs <= 256 distinct colors, got {len(pal)} "
            "(quantize first)"
        )
    size = max(4, 1 << (len(pal) - 1).bit_length())
    pal = np.vstack([pal, np.zeros((size - len(pal), 3), np.uint8)])
    return inv.astype(np.uint8).reshape(pixels.shape[:-1]), pal
