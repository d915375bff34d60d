"""Spec-vector tests for the GIF codec (maskmypy_spark/functions/gif.py).

Like tests/test_png.py, the ground truth here is INDEPENDENT of the module:
``_ref_lzw_decode`` below is the GIF89a Appendix-F algorithm transcribed
directly from the spec prose (dict of code -> byte string, rebuilt on
clear, the KwKwK rule as string = prev + prev[0]), plus hand-computed
bit-level vectors; the module's array-based decoder and its
streaming-width encoder are both checked against them in both directions.
"""

import struct

import numpy as np
import pytest

from maskmypy_spark.functions import gif, imagecodec


# ------------------------------------------------------- independent LZW --

def _ref_bits_lsb(data: bytes):
    """LSB-first bit reader as spec prose: yield one bit at a time."""
    for byte in data:
        for k in range(8):
            yield (byte >> k) & 1


def _ref_lzw_decode(mcs: int, data: bytes) -> bytes:
    """GIF89a Appendix-F LZW decode, transcribed independently of the
    module: explicit code->bytes dictionary, variable width grows when the
    next assignable code no longer fits, capped at 12 bits."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = _ref_bits_lsb(data)

    def read_code(width):
        v = 0
        for k in range(width):
            try:
                v |= next(bits) << k
            except StopIteration:
                raise ValueError("ref: out of bits")
        return v

    table = {c: bytes([c]) for c in range(clear)}
    width = mcs + 1
    next_code = eoi + 1
    out = bytearray()
    prev = None
    while True:
        code = read_code(width)
        if code == clear:
            table = {c: bytes([c]) for c in range(clear)}
            width = mcs + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            out += table[code]
            prev = code
            continue
        if code in table:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]  # KwKwK
        else:
            raise ValueError("ref: bad code")
        out += entry
        if next_code <= 4095:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    raise AssertionError("unreachable")


def test_lzw_hand_vector():
    """[1,1,1,1] at mcs=2: encoder emits codes [clear=4, 1, 6, 1, 5=eoi]
    at width 3 — pair (1,1) becomes code 6, the third symbol extends it,
    the miss on (6,1) emits 6 and restarts the match at the final literal
    1. LSB-first packing: 4 | 1<<3 | 6<<6 | 1<<9 | 5<<12 = 21388 = 0x538C
    -> bytes 0x8C, 0x53."""
    enc = gif.lzw_encode(2, np.array([1, 1, 1, 1], dtype=np.uint8))
    assert enc == bytes([0x8C, 0x53])
    assert gif.lzw_decode(2, enc, 4).tolist() == [1, 1, 1, 1]
    assert _ref_lzw_decode(2, enc) == bytes([1, 1, 1, 1])


def test_lzw_kwkwk_first_use():
    """[0,0,0] makes the decoder receive code 6 == next_code right after
    its first literal — the KwKwK rule's earliest possible trigger."""
    enc = gif.lzw_encode(2, np.array([0, 0, 0], dtype=np.uint8))
    assert gif.lzw_decode(2, enc, 3).tolist() == [0, 0, 0]
    assert _ref_lzw_decode(2, enc) == bytes([0, 0, 0])


@pytest.mark.parametrize("mcs", [2, 3, 4, 8])
def test_lzw_roundtrip_and_ref_agreement(mcs):
    rng = np.random.default_rng(mcs)
    for n in (1, 2, 7, 300, 5000):
        arr = rng.integers(0, 1 << mcs, n).astype(np.uint8)
        enc = gif.lzw_encode(mcs, arr)
        assert gif.lzw_decode(mcs, enc, n).tolist() == arr.tolist()
        assert _ref_lzw_decode(mcs, enc) == arr.tobytes()


def test_lzw_adversarial_patterns():
    # repeated short period (constant KwKwK pressure) + long runs
    for pat in (
        np.tile(np.array([0, 1], dtype=np.uint8), 500),
        np.tile(np.array([0, 0, 1], dtype=np.uint8), 400),
        np.zeros(4000, dtype=np.uint8),
        np.concatenate([np.full(97, v, dtype=np.uint8) for v in range(4)] * 9),
    ):
        enc = gif.lzw_encode(2, pat)
        assert gif.lzw_decode(2, enc, len(pat)).tolist() == pat.tolist()
        assert _ref_lzw_decode(2, enc) == pat.tobytes()


def test_lzw_12bit_growth_and_midstream_clear():
    """Enough distinct pairs to exhaust the 12-bit dictionary: the encoder
    must emit a mid-stream clear and both decoders must track the rebuild
    (fixtures' lzw12 layout rests on this)."""
    rng = np.random.default_rng(99)
    arr = rng.integers(0, 256, 12000).astype(np.uint8)
    enc = gif.lzw_encode(8, arr)
    assert gif.lzw_decode(8, enc, len(arr)).tolist() == arr.tolist()
    assert _ref_lzw_decode(8, enc) == arr.tobytes()


def test_lzw_error_paths():
    enc = gif.lzw_encode(2, np.array([1, 2, 3], dtype=np.uint8))
    with pytest.raises(ValueError):  # EOI before n_expected
        gif.lzw_decode(2, enc, 5)
    with pytest.raises(ValueError):  # output exceeds n_expected
        gif.lzw_decode(2, enc, 2)
    with pytest.raises(ValueError):  # truncated stream
        gif.lzw_decode(2, enc[:1], 3)


# --------------------------------------------------------------- interlace

def test_interlace_spec_row_order():
    # GIF89a appendix E: for h=8 the pass order is rows 0, 4, 2, 6, 1,3,5,7
    rows = np.arange(8).reshape(8, 1)
    assert gif._interlace(rows).reshape(-1).tolist() == [0, 4, 2, 6, 1, 3, 5, 7]


@pytest.mark.parametrize("h", [1, 2, 3, 4, 5, 7, 8, 9, 16, 17])
def test_interlace_inverse(h):
    rows = np.arange(h * 3).reshape(h, 3)
    assert np.array_equal(gif._deinterlace(gif._interlace(rows)), rows)


# ------------------------------------------------------------- frame logic

_PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
)


def test_disposal_none_accumulates():
    f0 = np.zeros((2, 2), dtype=np.uint8)            # all black
    f1 = np.array([[1]], dtype=np.uint8)             # red pixel at (0, 0)
    data = gif.encode_ex([f0, f1], _PAL, rects=[(0, 0), (0, 0)])
    frames = [f for _d, f in gif.decode_frames(data)]
    assert np.array_equal(frames[0], _PAL[f0])
    want = _PAL[f0].copy()
    want[0, 0] = [255, 0, 0]
    assert np.array_equal(frames[1], want)


def test_disposal_background_restores_white():
    # frame 0 paints black everywhere with disposal 2 over rect (0,0,2,2):
    # frame 1's canvas starts white in that rect (canonical background)
    f0 = np.zeros((2, 2), dtype=np.uint8)
    f1 = np.array([[1]], dtype=np.uint8)
    data = gif.encode_ex(
        [f0, f1], _PAL, rects=[(0, 0), (1, 1)], disposals=[2, 0]
    )
    frames = [f for _d, f in gif.decode_frames(data)]
    want = np.full((2, 2, 3), 255, dtype=np.uint8)
    want[1, 1] = [255, 0, 0]
    assert np.array_equal(frames[1], want)


def test_disposal_previous_restores_saved_rect():
    # frame 1 paints (0,0) green with disposal 3 -> frame 2's canvas shows
    # frame 0's black there again
    f0 = np.zeros((2, 2), dtype=np.uint8)
    f1 = np.array([[2]], dtype=np.uint8)
    f2 = np.array([[3]], dtype=np.uint8)
    data = gif.encode_ex(
        [f0, f1, f2], _PAL, rects=[(0, 0), (0, 0), (1, 0)],
        disposals=[0, 3, 0],
    )
    frames = [f for _d, f in gif.decode_frames(data)]
    assert np.array_equal(frames[1][0, 0], [0, 255, 0])
    want = _PAL[f0].copy()
    want[0, 1] = [0, 0, 255]  # frame 2's pixel at rect (1, 0)
    assert np.array_equal(frames[2], want)  # (0,0) black again


def test_transparency_over_white_and_over_prior_frame():
    # single frame: transparent index shows the white canvas
    f0 = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    data = gif.encode_ex([f0], _PAL, transparents=[0])
    img = gif.decode(data)
    assert np.array_equal(img[0, 0], [255, 0, 0])
    assert np.array_equal(img[0, 1], [255, 255, 255])
    # two frames: transparent pixels preserve the prior frame's pixels
    f1 = np.array([[0, 2], [2, 0]], dtype=np.uint8)
    data = gif.encode_ex([f0, f1], _PAL, transparents=[0, 0])
    frames = [f for _d, f in gif.decode_frames(data)]
    assert np.array_equal(frames[1][0, 0], [255, 0, 0])   # preserved
    assert np.array_equal(frames[1][0, 1], [0, 255, 0])   # painted


def test_local_palette_wins_over_global():
    lp = np.array(
        [[9, 9, 9], [7, 7, 7], [5, 5, 5], [3, 3, 3]], dtype=np.uint8
    )
    f0 = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    data = gif.encode_ex([f0], _PAL, local_palettes=[lp])
    assert np.array_equal(gif.decode(data), lp[f0])


def test_offset_rect_margins_white():
    f0 = np.array([[1]], dtype=np.uint8)
    data = gif.encode_ex([f0], _PAL, screen=(3, 3), rects=[(1, 1)])
    img = gif.decode(data)
    want = np.full((3, 3, 3), 255, dtype=np.uint8)
    want[1, 1] = [255, 0, 0]
    assert np.array_equal(img, want)


def test_interlaced_frame_roundtrip():
    rng = np.random.default_rng(3)
    f0 = rng.integers(0, 4, (13, 9)).astype(np.uint8)
    data = gif.encode_ex([f0], _PAL, interlace=True)
    assert np.array_equal(gif.decode(data), _PAL[f0])


def test_sub_block_splitting_large_payload():
    # LZW payload far beyond one 255-byte sub-block
    rng = np.random.default_rng(11)
    f0 = rng.integers(0, 4, (64, 64)).astype(np.uint8)
    data = gif.encode_ex([f0], _PAL)
    assert np.array_equal(gif.decode(data), _PAL[f0])


def test_header_and_error_paths():
    f0 = np.zeros((2, 2), dtype=np.uint8)
    data = gif.encode_ex([f0], _PAL, version=b"GIF87a")
    assert data[:6] == b"GIF87a"
    assert np.array_equal(gif.decode(data), _PAL[f0])
    with pytest.raises(ValueError):
        gif.decode(b"NOTGIF" + data[6:])
    with pytest.raises(ValueError):  # index beyond palette
        gif.encode_ex([np.full((2, 2), 7, dtype=np.uint8)], _PAL)
    with pytest.raises(ValueError):  # palette size not a power of two
        gif.encode_ex([f0], _PAL[:3])


def test_netscape_loop_and_unknown_extensions_skipped():
    # multi-frame writer emits the NETSCAPE2.0 extension; inject a comment
    # extension too — both must be skipped cleanly
    f0 = np.zeros((2, 2), dtype=np.uint8)
    f1 = np.ones((2, 2), dtype=np.uint8)
    data = gif.encode_ex([f0, f1], _PAL, delays=[5, 7])
    assert b"NETSCAPE2.0" in data
    # inject after header + 4-entry global color table (13 + 12 bytes)
    patched = data[:25] + b"\x21\xfe\x05hello\x00" + data[25:]
    frames = gif.decode_frames(patched)
    assert len(frames) == 2
    assert frames[0][0] == 5 and frames[1][0] == 7  # delays preserved
    assert np.array_equal(frames[1][1], _PAL[f1])


# --------------------------------------------------- imagecodec integration

def test_imagecodec_gif_roundtrip_lossless():
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 200, (24, 31))]
    data = imagecodec.encode(img, "gif")
    assert np.array_equal(imagecodec.decode(data, "gif"), img)
    assert "gif" not in imagecodec.LOSSY  # lossless on palette content


def test_imagecodec_gif_rejects_rich_color():
    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(ValueError, match="quantize"):
        imagecodec.encode(img, "gif")


def test_media_video_gif_roundtrip():
    from maskmypy_spark.operators import media

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (50, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 50, (4, 10, 14))]
    data = media.encode_video(frames, "gif")
    assert np.array_equal(media.decode_video(data, 14, 10, "gif"), frames)
    with pytest.raises(ValueError, match="metadata"):
        media.decode_video(data, 10, 14, "gif")


def test_video_clip_gif_transcode_lossless():
    """The property the video_transcode_gif oracle RESTS ON: the rawrgb
    clip fixture is palette-friendly (colors are (v, 2v%256, 3v%256) —
    <= 256 distinct), so the animated-GIF transcode must round-trip
    BIT-EXACTLY. If an engine change breaks this, the contract entry's
    closed-form brightness oracle stops being a write-path proof — fail
    here with the clip index instead."""
    from maskmypy_spark.operators import media

    for i in (0, 1, 7, 23, 39):
        w, h = 16, 12
        n_f = 4 + i % 5
        yy, xx = np.mgrid[0:h, 0:w]
        fr = np.stack(
            [((xx * 5 + yy * 3 + i * 7 + f * 11) % 256).astype(np.uint8)
             for f in range(n_f)]
        )
        rgb = np.stack([fr, (fr * 2) % 256, (fr * 3) % 256], axis=-1).astype(
            np.uint8
        )
        data = media.encode_video(rgb, "gif")
        assert np.array_equal(media.decode_video(data, w, h, "gif"), rgb), i


def test_decode_robust_to_truncation_and_corruption():
    """Malformed streams must raise ValueError (or decode to SOME frame
    set when the corruption lands in pixel data that still parses) —
    never hang, never index out of bounds, never return a wrong-shape
    array. Exercises every truncation point and single-byte corruptions
    across a real multi-feature stream."""
    rng = np.random.default_rng(77)
    f0 = rng.integers(0, 4, (9, 7)).astype(np.uint8)
    f1 = rng.integers(0, 4, (4, 5)).astype(np.uint8)
    data = gif.encode_ex(
        [f0, f1], _PAL, rects=[(0, 0), (1, 2)], disposals=[3, 0],
        transparents=[-1, 0], interlace=True, delays=[3, 4],
    )
    ok = gif.decode_frames(data)
    assert len(ok) == 2 and ok[0][1].shape == (9, 7, 3)
    for cut in range(len(data)):
        try:
            frames = gif.decode_frames(data[:cut])
        except (ValueError, IndexError, struct.error):
            continue
        for _d, f in frames:
            assert f.shape == (9, 7, 3)
    for pos in range(len(data)):
        for delta in (1, 128):
            bad = bytearray(data)
            bad[pos] = (bad[pos] + delta) % 256
            try:
                frames = gif.decode_frames(bytes(bad))
            except (ValueError, IndexError, struct.error):
                continue
            for _d, f in frames:
                assert f.ndim == 3 and f.shape[2] == 3
