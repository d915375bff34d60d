"""Full PNG (ISO/IEC 15948 / RFC 2083) codec in pure numpy + stdlib zlib.

Round-5 wall removal, same class as the JPEG 4:2:0 work: the previous
decoder read only 8-bit RGB with filters 0/2 — i.e. only this engine's own
output — while real crawled PNGs use all five filter types (libpng's
adaptive writer emits Sub/Average/Paeth constantly), palette and grayscale
color types, alpha, 16-bit depth, and Adam7 interlacing. This module
decodes the full baseline spec surface:

- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
- bit depths 1/2/4/8/16 (as the spec permits per color type)
- all five scanline filters (None/Sub/Up/Average/Paeth)
- PLTE and tRNS (palette alpha, gray/RGB color-key transparency)
- Adam7 interlace
- chunk CRC validation; unknown ancillary chunks skipped

Canonical output is the engine's standard uint8 RGB (h, w, 3):

- 16-bit samples reduce to their high byte (the standard 8-bit reduction:
  floor(v / 257 + 0.5) differs from v >> 8 by at most 1 LSB; we use the
  high byte, which is exact for all v = k*257 round-trip values and is
  what the engine's own 16-bit writer inverts bit-exactly)
- sub-8-bit grayscale scales by 255/(2^depth - 1) (exact integer: bit
  replication), palette indices are looked up unscaled
- alpha composites over opaque white with the integer-rounded formula
  out = (c*a + 255*(255 - a) + 127) // 255

The encoder writes any of the above layouts (``encode_ex``), with the
standard per-row adaptive filter heuristic (minimum sum of absolute
signed residuals) or a fixed filter, and optional Adam7 — so tests and
fixtures can plant every decode path without external files. The planted
spec vectors in tests/test_png.py are built from the filter equations
independently of this module.

Reference parity: the reference (TheTinHat/MaskMyPy) delegates raster IO
to its geopandas/PIL stack; this engine ships its own codec because the
sandbox has no PIL (SURVEY §7 consequence 4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: spec-legal bit depths per color type (ISO 15948 table 11.1)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 pass origins and strides: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


# ---------------------------------------------------------------- filtering

def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over the bpp lanes of one pixel unit."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _unfilter(raw: bytes, height: int, w_bytes: int, bpp: int) -> np.ndarray:
    """Reverse the five scanline filters over one (sub-)image.

    Returns (height, w_bytes) uint8. Sub is vectorized as a mod-256 prefix
    sum over bpp-strided lanes; Average/Paeth carry a true left dependency
    and run one pixel unit at a time, vectorized over the unit's bpp bytes.
    """
    stride = w_bytes + 1
    if len(raw) < height * stride:
        raise ValueError("png: truncated image data")
    out = np.empty((height, w_bytes), dtype=np.uint8)
    prev = np.zeros(w_bytes, dtype=np.int64)
    n_units = w_bytes // bpp  # w_bytes is always a multiple of bpp
    for r in range(height):
        line = raw[r * stride : (r + 1) * stride]
        filt = line[0]
        body = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        if filt == 0:
            cur = body
        elif filt == 1:  # Sub: prefix sum along each bpp lane
            cur = body.reshape(n_units, bpp).cumsum(axis=0).reshape(-1) & 255
        elif filt == 2:  # Up
            cur = (body + prev) & 255
        elif filt == 3:  # Average
            cur = np.empty(w_bytes, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            for k in range(n_units):
                s = k * bpp
                left = (body[s : s + bpp] + ((left + prev[s : s + bpp]) >> 1)) & 255
                cur[s : s + bpp] = left
        elif filt == 4:  # Paeth
            cur = np.empty(w_bytes, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for k in range(n_units):
                s = k * bpp
                up = prev[s : s + bpp]
                left = (body[s : s + bpp] + _paeth_vec(left, up, upleft)) & 255
                cur[s : s + bpp] = left
                upleft = up
        else:
            raise ValueError(f"png: bad filter type {filt}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def _filter_rows(rows: np.ndarray, bpp: int, strategy) -> bytes:
    """Apply per-row filtering to (h, w_bytes) uint8 sample bytes.

    strategy: an int 0-4 (fixed filter) or "adaptive" (per-row minimum
    sum of absolute signed residuals — the standard libpng heuristic).
    """
    h, w_bytes = rows.shape
    wide = rows.astype(np.int64)
    prev = np.zeros(w_bytes, dtype=np.int64)
    out = bytearray()
    for r in range(h):
        cur = wide[r]
        left = np.zeros(w_bytes, dtype=np.int64)
        left[bpp:] = cur[:-bpp]
        upleft = np.zeros(w_bytes, dtype=np.int64)
        upleft[bpp:] = prev[:-bpp]
        cands = {
            0: cur,
            1: (cur - left) & 255,
            2: (cur - prev) & 255,
            3: (cur - ((left + prev) >> 1)) & 255,
            4: (cur - _paeth_vec(left, prev, upleft)) & 255,
        }
        if strategy == "adaptive":
            # minimize sum of residuals interpreted as signed bytes
            best = min(
                cands,
                key=lambda f: int(
                    np.abs(((cands[f] + 128) & 255) - 128).sum()
                ),
            )
        else:
            best = int(strategy)
        out += bytes([best]) + cands[best].astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


# ------------------------------------------------------- sample <-> bytes

def _row_bytes(width: int, depth: int, channels: int) -> int:
    return (width * depth * channels + 7) // 8


def _extract_samples(
    rows: np.ndarray, width: int, depth: int, channels: int
) -> np.ndarray:
    """(h, w_bytes) unfiltered bytes -> (h, width, channels) int32 samples
    (unscaled; depth 16 keeps the FULL 16-bit value — reduction to the
    display byte happens in _samples_to_rgb, AFTER color-key matching, so a
    third-party 16-bit key compares all 16 bits, ADVICE r05 #3)."""
    h = rows.shape[0]
    if depth == 8:
        return (
            rows[:, : width * channels]
            .reshape(h, width, channels)
            .astype(np.int32)
        )
    if depth == 16:
        pairs = rows[:, : width * channels * 2].astype(np.int32)
        return (
            (pairs[:, ::2] << 8) | pairs[:, 1::2]
        ).reshape(h, width, channels)
    # 1/2/4-bit: single channel only (gray or palette index), MSB first
    bits = np.unpackbits(rows, axis=1)[:, : width * depth].reshape(
        h, width, depth
    )
    weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.int32)
    return (bits.astype(np.int32) @ weights).reshape(h, width, 1)


def _pack_rows(
    samples: np.ndarray, depth: int
) -> np.ndarray:
    """(h, w, channels) int samples -> (h, w_bytes) uint8 scanline bytes."""
    h, w, ch = samples.shape
    if depth == 8:
        return samples.astype(np.uint8).reshape(h, w * ch)
    if depth == 16:
        flat = samples.astype(np.uint16).reshape(h, w * ch)
        out = np.empty((h, w * ch * 2), dtype=np.uint8)
        out[:, ::2] = flat >> 8
        out[:, 1::2] = flat & 255
        return out
    # sub-8-bit single channel, MSB first, rows padded to byte boundary
    vals = samples.reshape(h, w).astype(np.uint8)
    bits = (
        (vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(h, w * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.pad(bits, ((0, 0), (0, pad)))
    return np.packbits(bits, axis=1)


# ------------------------------------------------------------- canonical RGB

def _composite_white(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Integer-rounded source-over onto opaque white."""
    a = alpha.astype(np.int64)[..., None]
    return ((rgb.astype(np.int64) * a + 255 * (255 - a) + 127) // 255).astype(
        np.uint8
    )


def _scale_gray(v: np.ndarray, depth: int) -> np.ndarray:
    """Exact sub-8-bit -> 8-bit expansion (bit replication)."""
    if depth >= 8:
        return v.astype(np.uint8)
    return (v * 255 // ((1 << depth) - 1)).astype(np.uint8)


def _samples_to_rgb(
    samples: np.ndarray,
    depth: int,
    ctype: int,
    palette: np.ndarray | None,
    trns: bytes | None,
) -> np.ndarray:
    """Assembled raw samples -> canonical uint8 RGB (alpha over white).

    ``samples`` carries FULL-precision values for depth 16; the color-key
    comparison happens on the full 16 bits (spec semantics — exact for any
    third-party stream, ADVICE r05 #3), then values reduce to the display
    high byte (exact for the engine's k*257 round-trip values)."""
    full = samples
    if depth == 16:
        samples = samples >> 8
    h, w = samples.shape[:2]
    if ctype == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("png: palette index out of range")
        rgb = palette[idx]
        if trns:
            pal_a = np.full(len(palette), 255, dtype=np.int64)
            pal_a[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return _composite_white(rgb, pal_a[idx])
        return rgb.astype(np.uint8)
    if ctype == 0:
        g = _scale_gray(samples[:, :, 0], depth)
        rgb = np.repeat(g[:, :, None], 3, axis=2)
        if trns and len(trns) >= 2:
            key = struct.unpack(">H", trns[:2])[0]
            alpha = np.where(
                full[:, :, 0] == key, 0, 255
            ).astype(np.int64)
            return _composite_white(rgb, alpha)
        return rgb
    if ctype == 2:
        rgb = samples.astype(np.uint8)
        if trns and len(trns) >= 6:
            kr, kg, kb = struct.unpack(">HHH", trns[:6])
            hit = (
                (full[:, :, 0] == kr)
                & (full[:, :, 1] == kg)
                & (full[:, :, 2] == kb)
            )
            return _composite_white(rgb, np.where(hit, 0, 255))
        return rgb
    if ctype == 4:
        g = np.repeat(samples[:, :, :1], 3, axis=2)
        return _composite_white(g, samples[:, :, 1])
    if ctype == 6:
        return _composite_white(samples[:, :, :3], samples[:, :, 3])
    raise ValueError(f"png: bad color type {ctype}")


# ------------------------------------------------------------------ decode

def decode(data: bytes, *, verify_crc: bool = True) -> np.ndarray:
    """Decode any baseline-spec PNG to canonical uint8 RGB (h, w, 3)."""
    if data[:8] != _SIG:
        raise ValueError("not a png")
    pos = 8
    w = h = depth = ctype = interlace = None
    palette: np.ndarray | None = None
    trns: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) != ln or pos + 12 + ln > len(data):
            raise ValueError("png: truncated chunk")
        if verify_crc:
            (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
            if crc != zlib.crc32(tag + payload) & 0xFFFFFFFF:
                raise ValueError(f"png: CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            if comp != 0 or filt != 0:
                raise ValueError("png: unknown compression/filter method")
            if interlace not in (0, 1):
                raise ValueError("png: unknown interlace method")
            if depth not in _LEGAL_DEPTHS.get(ctype, ()):
                raise ValueError(
                    f"png: illegal depth {depth} for color type {ctype}"
                )
        elif tag == b"PLTE":
            palette = (
                np.frombuffer(payload, dtype=np.uint8)
                .reshape(-1, 3)
                .astype(np.int64)
            )
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("png: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    channels = _CHANNELS[ctype]
    bpp = max(1, depth * channels // 8)
    if interlace == 0:
        rows = _unfilter(raw, h, _row_bytes(w, depth, channels), bpp)
        samples = _extract_samples(rows, w, depth, channels)
    else:  # Adam7: each pass is an independently filtered sub-image
        samples = np.zeros((h, w, channels), dtype=np.int32)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            wb = _row_bytes(pw, depth, channels)
            need = ph * (wb + 1)
            sub = _unfilter(raw[off : off + need], ph, wb, bpp)
            samples[y0::dy, x0::dx] = _extract_samples(sub, pw, depth, channels)
            off += need
    return _samples_to_rgb(samples, depth, ctype, palette, trns)


# ------------------------------------------------------------------ encode

def encode_ex(
    samples: np.ndarray,
    *,
    color_type: int = 2,
    depth: int = 8,
    filters="adaptive",
    interlace: bool = False,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
    level: int = 6,
) -> bytes:
    """Encode raw samples as any baseline-spec PNG layout.

    samples: (h, w) for single-channel color types 0/3, else
    (h, w, channels); values must fit the declared depth (16-bit samples
    as ints 0..65535). This writer exists so tests/fixtures can plant
    every decode path (all filters, Adam7, palette, alpha, 16-bit)
    deterministically without external files.
    """
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, ch = samples.shape
    if ch != _CHANNELS[color_type]:
        raise ValueError(
            f"png: {ch} channels does not match color type {color_type}"
        )
    if depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(f"png: illegal depth {depth} for color type {color_type}")
    bpp = max(1, depth * ch // 8)
    if interlace:
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += _filter_rows(_pack_rows(sub, depth), bpp, filters)
        raw = bytes(body)
    else:
        raw = _filter_rows(_pack_rows(samples, depth), bpp, filters)
    out = bytearray(_SIG)
    out += _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, int(interlace)),
    )
    if color_type == 3:
        if palette is None:
            raise ValueError("png: palette color type requires palette")
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw, level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
