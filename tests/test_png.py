"""Full-spec PNG codec tests (functions/png.py). The filter vectors here
are computed IN-TEST from the ISO 15948 §9 equations (straight per-byte
loops, no shared code with the module), so encoder and decoder are each
pinned against the spec independently, in both directions. No Spark
session; everything runs in milliseconds."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from maskmypy_spark.functions import png


# --------------------------------------------------- in-test spec reference

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _ref_filter_row(filt, cur, prev, bpp):
    """Forward filter one scanline per ISO 15948 §9.2 (per-byte loop)."""
    out = []
    for k, x in enumerate(cur):
        a = cur[k - bpp] if k >= bpp else 0
        b = prev[k]
        c = prev[k - bpp] if k >= bpp else 0
        if filt == 0:
            out.append(x)
        elif filt == 1:
            out.append((x - a) & 255)
        elif filt == 2:
            out.append((x - b) & 255)
        elif filt == 3:
            out.append((x - (a + b) // 2) & 255)
        else:
            out.append((x - _paeth(a, b, c)) & 255)
    return out


def _ref_unfilter_row(filt, body, prev, bpp):
    """Reverse filter one scanline per ISO 15948 §9.2 (per-byte loop)."""
    out = []
    for k, x in enumerate(body):
        a = out[k - bpp] if k >= bpp else 0
        b = prev[k]
        c = prev[k - bpp] if k >= bpp else 0
        if filt == 0:
            out.append(x & 255)
        elif filt == 1:
            out.append((x + a) & 255)
        elif filt == 2:
            out.append((x + b) & 255)
        elif filt == 3:
            out.append((x + (a + b) // 2) & 255)
        else:
            out.append((x + _paeth(a, b, c)) & 255)
    return out


def _chunk(tag, payload):
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _build_png(w, h, raw, depth=8, ctype=2, interlace=0):
    """Assemble a PNG byte stream in-test (independent chunk writer)."""
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _rand_img(h, w, ch, seed):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, (h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)


# --------------------------------------------------- decoder vs spec vectors

@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_decode_matches_spec_filtering(h, w, seed):
    """Plant per-row filters 0-4 cycling, forward-filter with the IN-TEST
    spec loop, and require the module decoder to recover the pixels."""
    img = _rand_img(h, w, 3, seed)
    bpp = 3
    raw = bytearray()
    prev = [0] * (w * 3)
    for r in range(h):
        cur = [int(v) for v in img[r].reshape(-1)]
        filt = (r + seed) % 5
        raw.append(filt)
        raw += bytes(_ref_filter_row(filt, cur, prev, bpp))
        prev = cur
    out = png.decode(_build_png(w, h, bytes(raw)))
    assert np.array_equal(out, img)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    filt=st.integers(0, 4),
)
def test_encoder_emits_spec_filtering(h, w, seed, filt):
    """Fixed-filter encode, then walk the stream in-test and reverse the
    filtering with the spec loop — must recover the pixels."""
    img = _rand_img(h, w, 3, seed)
    data = png.encode_ex(img, color_type=2, depth=8, filters=filt)
    # in-test chunk walk
    pos, idat = 8, bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * 3 + 1
    prev = [0] * (w * 3)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == filt
        prev = _ref_unfilter_row(line[0], list(line[1:]), prev, 3)
        assert prev == [int(v) for v in img[r].reshape(-1)]


# --------------------------------------------------------- round-trip matrix

@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    filters=st.sampled_from([0, 1, 2, 3, 4, "adaptive"]),
    interlace=st.booleans(),
)
def test_rgb8_roundtrip_all_filters(h, w, seed, filters, interlace):
    img = _rand_img(h, w, 3, seed)
    back = png.decode(
        png.encode_ex(img, color_type=2, depth=8, filters=filters, interlace=interlace)
    )
    assert np.array_equal(back, img)


def test_adam7_exhaustive_tiny_sizes():
    """Every (h, w) in 1..9 — all Adam7 pass-skipping edge cases."""
    for h in range(1, 10):
        for w in range(1, 10):
            img = _rand_img(h, w, 3, seed=h * 100 + w)
            back = png.decode(
                png.encode_ex(img, color_type=2, depth=8, interlace=True)
            )
            assert np.array_equal(back, img), (h, w)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
def test_rgba8_composites_over_white(h, w, seed, interlace):
    rgba = _rand_img(h, w, 4, seed)
    back = png.decode(png.encode_ex(rgba, color_type=6, interlace=interlace))
    a = rgba[:, :, 3:].astype(np.int64)
    want = (rgba[:, :, :3].astype(np.int64) * a + 255 * (255 - a) + 127) // 255
    assert np.array_equal(back, want.astype(np.uint8))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_alpha_roundtrip(h, w, seed):
    ga = _rand_img(h, w, 2, seed)
    back = png.decode(png.encode_ex(ga, color_type=4))
    g = ga[:, :, 0].astype(np.int64)[:, :, None]
    a = ga[:, :, 1].astype(np.int64)[:, :, None]
    want = (np.repeat(g, 3, axis=2) * a + 255 * (255 - a) + 127) // 255
    assert np.array_equal(back, want.astype(np.uint8))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    depth=st.sampled_from([1, 2, 4, 8]),
    interlace=st.booleans(),
)
def test_palette_roundtrip(h, w, seed, depth, interlace):
    n = 1 << depth
    rs = np.random.RandomState(seed)
    pal = rs.randint(0, 256, (n, 3), dtype=np.uint8)
    idx = rs.randint(0, n, (h, w), dtype=np.uint8)
    back = png.decode(
        png.encode_ex(
            idx, color_type=3, depth=depth, palette=pal, interlace=interlace
        )
    )
    assert np.array_equal(back, pal[idx])


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    depth=st.sampled_from([1, 2, 4, 8]),
)
def test_gray_sub8_bit_replication(h, w, seed, depth):
    n = 1 << depth
    rs = np.random.RandomState(seed)
    v = rs.randint(0, n, (h, w), dtype=np.uint8)
    back = png.decode(png.encode_ex(v, color_type=0, depth=depth))
    want = (v.astype(np.int64) * 255 // (n - 1)).astype(np.uint8)
    assert np.array_equal(back, np.repeat(want[:, :, None], 3, axis=2))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    ctype=st.sampled_from([0, 2, 4, 6]),
)
def test_depth16_reduces_to_high_byte(h, w, seed, ctype):
    """Arbitrary 16-bit samples (not only the v*257 grid) reduce to their
    high byte before canonicalization."""
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    rs = np.random.RandomState(seed)
    s16 = rs.randint(0, 65536, (h, w, ch)).astype(np.int64)
    back = png.decode(png.encode_ex(s16, color_type=ctype, depth=16))
    hi = (s16 >> 8).astype(np.uint8)
    want = png.decode(png.encode_ex(hi, color_type=ctype, depth=8))
    assert np.array_equal(back, want)


def test_trns_color_key_gray_and_rgb():
    # gray: key value 7 -> transparent -> white after compositing
    g = np.array([[7, 8], [9, 7]], dtype=np.uint8)
    out = png.decode(
        png.encode_ex(g, color_type=0, depth=8, trns=struct.pack(">H", 7))
    )
    assert (out[0, 0] == 255).all() and (out[1, 1] == 255).all()
    assert (out[0, 1] == 8).all() and (out[1, 0] == 9).all()
    # rgb: key (1, 2, 3)
    img = np.array([[[1, 2, 3], [1, 2, 4]]], dtype=np.uint8)
    out = png.decode(
        png.encode_ex(img, color_type=2, trns=struct.pack(">HHH", 1, 2, 3))
    )
    assert (out[0, 0] == 255).all()
    assert np.array_equal(out[0, 1], [1, 2, 4])


def test_trns_color_key_depth16_full_16bit_compare():
    """ADVICE r05 #3: a 16-bit color key must compare ALL 16 bits — a pixel
    matching only the key's high byte stays OPAQUE. (Before the fix the
    reduced high-byte compare wrongly composited it transparent.) Exact
    k*257 matches still go transparent."""
    key = 0x0102
    # gray16: pixel 0x0103 shares the key's high byte but differs in the low
    g16 = np.array([[0x0102, 0x0103]], dtype=np.int64)
    out = png.decode(
        png.encode_ex(g16, color_type=0, depth=16, trns=struct.pack(">H", key))
    )
    assert (out[0, 0] == 255).all()            # exact 16-bit match -> white
    assert (out[0, 1] == 0x01).all()           # high-byte-only match -> opaque
    # rgb16 analogue
    img = np.array(
        [[[0x0102, 0x0203, 0x0304], [0x0102, 0x0203, 0x0305]]], dtype=np.int64
    )
    out = png.decode(
        png.encode_ex(
            img, color_type=2, depth=16,
            trns=struct.pack(">HHH", 0x0102, 0x0203, 0x0304),
        )
    )
    assert (out[0, 0] == 255).all()
    assert np.array_equal(out[0, 1], [0x01, 0x02, 0x03])
    # engine-written k*257 streams: unchanged semantics
    g = np.array([[7, 8]], dtype=np.uint8).astype(np.int64) * 257
    out = png.decode(
        png.encode_ex(g, color_type=0, depth=16, trns=struct.pack(">H", 7 * 257))
    )
    assert (out[0, 0] == 255).all() and (out[0, 1] == 8).all()


def test_palette_trns_partial_alpha():
    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    idx = np.array([[0, 1]], dtype=np.uint8)
    out = png.decode(
        png.encode_ex(idx, color_type=3, depth=8, palette=pal, trns=bytes([128]))
    )
    want0 = (np.array([10, 20, 30]) * 128 + 255 * 127 + 127) // 255
    assert np.array_equal(out[0, 0], want0)
    assert np.array_equal(out[0, 1], [40, 50, 60])  # beyond tRNS => opaque


# ------------------------------------------------------------- stream errors

def test_crc_validation():
    img = _rand_img(6, 6, 3, seed=1)
    data = bytearray(png.encode_ex(img))
    # flip one byte inside the IDAT payload
    pos = data.find(b"IDAT") + 6
    data[pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png.decode(bytes(data))


def test_unknown_ancillary_chunks_skipped():
    img = _rand_img(5, 7, 3, seed=2)
    data = png.encode_ex(img)
    ihdr_end = 8 + 12 + 13
    patched = (
        data[:ihdr_end]
        + _chunk(b"tEXt", b"Comment\x00planted")
        + _chunk(b"gAMA", struct.pack(">I", 45455))
        + data[ihdr_end:]
    )
    assert np.array_equal(png.decode(patched), img)


def test_palette_index_out_of_range_raises():
    pal = np.array([[1, 2, 3]], dtype=np.uint8)  # 1 entry
    idx = np.array([[0, 1]], dtype=np.uint8)  # index 1 out of range
    data = png.encode_ex(idx, color_type=3, depth=8, palette=pal)
    with pytest.raises(ValueError, match="palette index"):
        png.decode(data)


def test_illegal_depth_rejected():
    with pytest.raises(ValueError, match="illegal depth"):
        png.encode_ex(np.zeros((2, 2, 3), dtype=np.uint8), color_type=2, depth=4)
    # decoder side: patch a legal stream's IHDR to depth 4 / color 2
    img = _rand_img(2, 2, 3, seed=3)
    data = bytearray(png.encode_ex(img))
    data[8 + 8 + 8] = 4  # IHDR depth byte
    ihdr = data[8 + 8 : 8 + 8 + 13]
    data[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="illegal depth"):
        png.decode(bytes(data))


def test_truncated_stream_raises():
    img = _rand_img(8, 8, 3, seed=4)
    data = png.encode_ex(img)
    with pytest.raises(ValueError):
        png.decode(data[: len(data) // 2])


# ------------------------------------------------- engine default stability

def test_legacy_engine_layout_byte_stable():
    """imagecodec.encode_png (filter 0, RGB8) must produce the exact bytes
    of the pre-round-5 writer — fixture phashes and frozen oracles depend
    on decode(bytes) stability, and replay contracts on byte stability."""
    from maskmypy_spark.functions import imagecodec

    img = _rand_img(9, 5, 3, seed=5)
    data = imagecodec.encode_png(img)
    h, w = 9, 5
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    legacy = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
    assert data == legacy
