"""Deterministic synthetic fixtures (FIXTURES.md), including the
image+caption sensitive table from ``input_hint``.

All randomness comes from the engine's own counter-based hash (functions/
rng.py) keyed on row id — identical tables regardless of process, partition
count, or generation order. Small tables are built driver-side; the bench-
scale image table is generated DISTRIBUTED via mapInPandas over
``spark.range`` so 10^6–10^7-row fixtures never sit in driver memory
(and the same plan would generate 10^12 rows on a real cluster).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import imagecodec, rng

BOX_W = 20000.0
BOX_H = 10000.0
N_CLUSTERS = 5
SIGMA = 800.0
BACKGROUND = 0.10  # uniform background fraction
FMTS = ["ppm", "bmp", "png"]
SIZES = [16, 32, 64]

# fixture-local draw tags (disjoint from mask tags)
_T_CL, _T_BG, _T_GX1, _T_GX2, _T_GY1, _T_GY2, _T_UX, _T_UY = range(201, 209)
_T_W, _T_H, _T_PIX, _T_CAP = range(210, 214)
_T_SW, _T_SH, _T_SG = range(214, 217)

_WORDS = [
    "harbor", "pine", "granite", "raven", "tide", "lantern", "moss",
    "ferry", "cedar", "gull", "slope", "inlet", "bridge", "fog",
]


def cluster_centers(seed: int) -> np.ndarray:
    ids = np.arange(1, N_CLUSTERS + 1)
    cx = rng.u_np(ids, _T_CL, seed, 1) * BOX_W
    cy = rng.u_np(ids, _T_CL, seed, 2) * BOX_H
    return np.stack([cx, cy], axis=1)


def point_pattern(ids: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Clustered coordinates: gaussian blobs around 5 centers + uniform
    background (FIXTURES.md §1). Vectorized Box-Muller on hash uniforms."""
    centers = cluster_centers(seed)
    is_bg = rng.u_np(ids, _T_BG, seed) < BACKGROUND
    which = (rng.u_np(ids, _T_CL, seed) * N_CLUSTERS).astype(np.int64) % N_CLUSTERS
    u1 = rng.u_np(ids, _T_GX1, seed)
    u2 = rng.u_np(ids, _T_GX2, seed)
    u3 = rng.u_np(ids, _T_GY1, seed)
    u4 = rng.u_np(ids, _T_GY2, seed)
    gx = np.sqrt(-2.0 * np.log(1.0 - u1)) * np.cos(2.0 * np.pi * u2)
    gy = np.sqrt(-2.0 * np.log(1.0 - u3)) * np.cos(2.0 * np.pi * u4)
    x = centers[which, 0] + SIGMA * gx
    y = centers[which, 1] + SIGMA * gy
    bx = rng.u_np(ids, _T_UX, seed) * BOX_W
    by = rng.u_np(ids, _T_UY, seed) * BOX_H
    # clip gaussian tails strictly inside the box (boundary-exact points
    # would sit on container tiling edges — degenerate for PIP)
    x = np.where(is_bg, bx, np.clip(x, 1.0, BOX_W - 1.0))
    y = np.where(is_bg, by, np.clip(y, 1.0, BOX_H - 1.0))
    return x, y


def make_image(i: int, seed: int) -> tuple[bytes, int, int, str, int]:
    """Deterministic synthetic image: gradient + hash noise."""
    w = SIZES[int(rng.u_np(np.array([i]), _T_W, seed)[0] * len(SIZES)) % len(SIZES)]
    h = SIZES[int(rng.u_np(np.array([i]), _T_H, seed)[0] * len(SIZES)) % len(SIZES)]
    fmt = FMTS[i % len(FMTS)]
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 7 + i * 13) % 256
    noise_keys = (np.arange(h * w, dtype=np.int64) * 977 + i) % (1 << 31)
    noise = (rng.u_np(noise_keys, _T_PIX, seed) * 64).astype(np.uint8).reshape(h, w)
    img = np.stack(
        [
            (base + noise) % 256,
            (base * 2 + noise) % 256,
            (base * 3 + noise // 2) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    data = imagecodec.encode(img, fmt)
    return data, w, h, fmt, imagecodec.average_hash(img)


TILE = 16  # one 4:2:0 MCU
TILE_SIZES = (32, 64)


def make_tile_image(i: int, seed: int) -> tuple[bytes, int, int, str, int]:
    """Deterministic flat-tile image: constant 16x16 RGB tiles (graphic /
    cartoon web content). The tiles align with the 4:2:0 MCU lattice, so
    chroma is CONSTANT within every 2x2 subsampling neighborhood and every
    8x8 DCT block is constant (DC-only; the quality-98 DC quant step is 1)
    — a jpg420 round trip of this corpus is PIXEL-EXACT, which is what
    lets the image_decode_420 contract entry pin the full 4:2:0
    encode->decode chain against an independent phash-of-original oracle.
    (make_image's per-pixel chroma noise is the designed opposite pole,
    where subsampling discards detail by construction — its signal-level
    behavior is covered by the PSNR property tests.)"""
    w = TILE_SIZES[int(rng.u_np(np.array([i]), _T_SW, seed)[0] * 2) % 2]
    h = TILE_SIZES[int(rng.u_np(np.array([i]), _T_SH, seed)[0] * 2) % 2]
    fmt = FMTS[i % len(FMTS)]
    tw, th = w // TILE, h // TILE
    u = rng.u_np(np.arange(3 * tw * th, dtype=np.int64) + i * 97, _T_SG, seed)
    vals = np.floor(u * 256.0).astype(np.int64).reshape(th, tw, 3)
    img = (
        np.repeat(np.repeat(vals, TILE, axis=0), TILE, axis=1)
        .clip(0, 255)
        .astype(np.uint8)
    )
    data = imagecodec.encode(img, fmt)
    return data, w, h, fmt, imagecodec.average_hash(img)


def tile_images(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """input_hint-shaped table of the flat-tile corpus (same schema and
    distributed generation as :func:`sensitive_images`)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            xs, ys = point_pattern(ids, seed)
            rows = []
            for k, i in enumerate(ids):
                data, w, h, fmt, ph = make_tile_image(int(i), seed)
                rows.append(
                    (f"til{int(i):08d}", int(i), data, w, h, fmt,
                     caption(int(i), seed), ph, float(xs[k]), float(ys[k]))
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "pid", "bytes", "w", "h", "fmt",
                         "caption", "phash", "x", "y"],
            )

    parts = max(8, min(256, n // 2000 + 1))
    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=IMAGE_SCHEMA)


_T_PW, _T_PH, _T_PPIX = 240, 241, 242

#: the nine full-spec PNG layouts of the web_pngs corpus, cycled by i % 9
PNG_LAYOUTS = (
    "rgb8",     # color type 2, adaptive filters (Sub/Up/Average/Paeth mix)
    "rgba8",    # color type 6, alpha composites over white
    "pal8",     # color type 3 + tRNS palette alpha
    "gray8",    # color type 0
    "rgb16",    # color type 2, 16-bit samples (high-byte reduction)
    "gray4",    # color type 0, 4-bit (bit-replication expansion)
    "rgb8i",    # color type 2, Adam7 interlaced
    "graya8",   # color type 4 (gray + alpha)
    "pal4i",    # color type 3, 4-bit palette, Adam7 interlaced
)


def _png_planes(i: int, seed: int):
    """The web-PNG corpus content definition: four deterministic 8-bit
    planes (r, g, b, a) from the engine's hash RNG. Re-derived
    independently by plans/media_oracle.py:_png_canonical — change one and
    the other must move with it (tests/test_media_oracle.py cross-checks)."""
    one = np.array([i], dtype=np.int64)
    w = SIZES[int(rng.u_np(one, _T_PW, seed)[0] * len(SIZES)) % len(SIZES)]
    h = SIZES[int(rng.u_np(one, _T_PH, seed)[0] * len(SIZES)) % len(SIZES)]
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 5 + yy * 11 + i * 7) % 256
    keys = (np.arange(h * w, dtype=np.int64) * 997 + i) % (1 << 31)
    noise = (rng.u_np(keys, _T_PPIX, seed) * 96).astype(np.int64).reshape(h, w)
    r = (base + noise) % 256
    g = (base * 3 + noise) % 256
    b = (base * 5 + noise // 3) % 256
    a = (base * 7 + noise * 2) % 256
    return r, g, b, a


#: deterministic palettes for the pal8 / pal4i layouts (corpus definition)
def _png_pal256() -> np.ndarray:
    j = np.arange(256, dtype=np.int64)
    return np.stack([(j * 37) % 256, (j * 73 + 11) % 256, (j * 151 + 29) % 256], axis=1)


def _png_pal16() -> np.ndarray:
    j = np.arange(16, dtype=np.int64)
    return np.stack([(j * 53) % 256, (j * 97 + 5) % 256, (j * 29 + 160) % 256], axis=1)


_PNG_TRNS256 = bytes((j * 16) % 256 for j in range(64))  # entries >= 64 opaque
_PNG_TRNS16 = bytes((j * 32) % 256 for j in range(8))


def make_web_png(i: int, seed: int) -> tuple[bytes, int, int, str, str, int]:
    """One 'crawled web PNG': full-spec layout cycled by i % 9 over
    PNG_LAYOUTS (palette/alpha/16-bit/sub-8-bit/Adam7, adaptive per-row
    filters throughout — the layouts libpng-era writers actually emit,
    which the engine's pre-round-5 RGB/filter-0 reader rejected).
    Returns (data, w, h, layout, fmt, phash) where phash is the engine
    hash of a FRESH DECODE of the bytes (canonical RGB, alpha over white)
    — the invariant every image operator maintains."""
    from ..functions import png

    r, g, b, a = _png_planes(i, seed)
    h, w = r.shape
    layout = PNG_LAYOUTS[i % len(PNG_LAYOUTS)]
    kw: dict = {"filters": "adaptive"}
    if layout == "rgb8":
        samples = np.stack([r, g, b], axis=2)
        kw.update(color_type=2, depth=8)
    elif layout == "rgba8":
        samples = np.stack([r, g, b, a], axis=2)
        kw.update(color_type=6, depth=8)
    elif layout == "pal8":
        samples = (r + a) % 256
        kw.update(color_type=3, depth=8, palette=_png_pal256(), trns=_PNG_TRNS256)
    elif layout == "gray8":
        samples = g
        kw.update(color_type=0, depth=8)
    elif layout == "rgb16":
        samples = np.stack([r, g, b], axis=2) * 257
        kw.update(color_type=2, depth=16)
    elif layout == "gray4":
        samples = g % 16
        kw.update(color_type=0, depth=4)
    elif layout == "rgb8i":
        samples = np.stack([r, g, b], axis=2)
        kw.update(color_type=2, depth=8, interlace=True)
    elif layout == "graya8":
        samples = np.stack([g, a], axis=2)
        kw.update(color_type=4, depth=8)
    else:  # pal4i
        samples = (r + a) % 16
        kw.update(
            color_type=3, depth=4, palette=_png_pal16(), trns=_PNG_TRNS16,
            interlace=True,
        )
    data = png.encode_ex(samples, **kw)
    canon = png.decode(data)
    return data, w, h, layout, "png", imagecodec.average_hash(canon)


def web_pngs(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """input_hint-shaped table of the full-spec PNG corpus (layout rides
    the caption column; schema and distributed generation as
    :func:`sensitive_images`)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            xs, ys = point_pattern(ids, seed)
            rows = []
            for k, i in enumerate(ids):
                data, w, h, layout, fmt, ph = make_web_png(int(i), seed)
                rows.append(
                    (f"web{int(i):08d}", int(i), data, w, h, fmt,
                     layout, ph, float(xs[k]), float(ys[k]))
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "pid", "bytes", "w", "h", "fmt",
                         "caption", "phash", "x", "y"],
            )

    parts = max(8, min(256, n // 2000 + 1))
    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=IMAGE_SCHEMA)


#: the six GIF layouts of the web_gifs corpus, cycled by i % 6
GIF_LAYOUTS = (
    "gp8",     # 256-color global palette, GIF87a
    "lp16",    # local color table overrides a deliberately-wrong global one
    "tr",      # GCE transparency index over the white logical screen
    "il",      # 4-pass row interlace
    "off",     # frame rect offset inside a larger screen (white margins)
    "lzw12",   # 96x96 noise: LZW width grows to 12 bits + mid-stream clear
)

_T_GW, _T_GH, _T_GPIX = 250, 251, 252


def _gif_indices(i: int, seed: int) -> np.ndarray:
    """The web-GIF corpus content definition: one deterministic 8-bit index
    plane from the engine's hash RNG (layouts reduce it mod their palette
    size). Re-derived independently by plans/media_oracle.py:_gif_canonical
    — change one and the other must move with it
    (tests/test_media_oracle.py cross-checks)."""
    one = np.array([i], dtype=np.int64)
    if GIF_LAYOUTS[i % len(GIF_LAYOUTS)] == "lzw12":
        w = h = 96  # enough distinct pairs to push the dictionary past 4095
    else:
        w = SIZES[int(rng.u_np(one, _T_GW, seed)[0] * len(SIZES)) % len(SIZES)]
        h = SIZES[int(rng.u_np(one, _T_GH, seed)[0] * len(SIZES)) % len(SIZES)]
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 7 + yy * 13 + i * 5) % 256
    keys = (np.arange(h * w, dtype=np.int64) * 1009 + i) % (1 << 31)
    noise = (rng.u_np(keys, _T_GPIX, seed) * 128).astype(np.int64).reshape(h, w)
    return ((base + noise) % 256).astype(np.uint8)


#: deterministic palettes (corpus definition, mirrored in media_oracle)
def _gif_pal256() -> np.ndarray:
    j = np.arange(256, dtype=np.int64)
    return np.stack([(j * 41) % 256, (j * 89 + 17) % 256, (j * 139 + 51) % 256], axis=1)


def _gif_pal16() -> np.ndarray:
    j = np.arange(16, dtype=np.int64)
    return np.stack([(j * 61 + 7) % 256, (j * 113 + 29) % 256, (j * 31 + 180) % 256], axis=1)


_GIF_TR_IDX = 5  # transparency index of the "tr" layout


def make_web_gif(i: int, seed: int) -> tuple[bytes, int, int, str, str, int]:
    """One 'crawled web GIF': full-spec layout cycled by i % 6 over
    GIF_LAYOUTS — global/local color tables, transparency, interlace,
    offset frame rects, and the 12-bit/deferred-clear LZW edge (the
    features real web GIFs actually use). Returns (data, w, h, layout,
    fmt, phash) where (w, h) is the LOGICAL SCREEN and phash is the engine
    hash of a fresh decode of the bytes — the invariant every image
    operator maintains."""
    from ..functions import gif

    idx = _gif_indices(i, seed)
    h, w = idx.shape
    layout = GIF_LAYOUTS[i % len(GIF_LAYOUTS)]
    kw: dict = {}
    pal = _gif_pal256()
    if layout == "gp8":
        kw.update(version=b"GIF87a")
    elif layout == "lp16":
        idx = idx % 16
        # global table is a wrong 4-color stub: decode must use the local one
        pal = np.tile(np.array([[255, 0, 255]], dtype=np.int64), (4, 1))
        kw.update(local_palettes=[_gif_pal16()])
    elif layout == "tr":
        idx = idx % 16
        pal = _gif_pal16()
        kw.update(transparents=[_GIF_TR_IDX])
    elif layout == "il":
        idx = idx % 16
        pal = _gif_pal16()
        kw.update(interlace=True)
    elif layout == "off":
        fh, fw = h // 2, w // 2
        fy, fx = h // 4, w // 4
        idx = idx[fy : fy + fh, fx : fx + fw]
        kw.update(screen=(w, h), rects=[(fx, fy)])
    # lzw12 is the plain layout at 96x96 — the size IS the feature
    data = gif.encode_ex([idx], pal, **kw)
    canon = gif.decode(data)
    return data, w, h, layout, "gif", imagecodec.average_hash(canon)


def web_gifs(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """input_hint-shaped table of the full-spec GIF corpus (layout rides
    the caption column; schema and distributed generation as
    :func:`sensitive_images`)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            xs, ys = point_pattern(ids, seed)
            rows = []
            for k, i in enumerate(ids):
                data, w, h, layout, fmt, ph = make_web_gif(int(i), seed)
                rows.append(
                    (f"gif{int(i):08d}", int(i), data, w, h, fmt,
                     layout, ph, float(xs[k]), float(ys[k]))
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "pid", "bytes", "w", "h", "fmt",
                         "caption", "phash", "x", "y"],
            )

    parts = max(8, min(256, n // 2000 + 1))
    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=IMAGE_SCHEMA)


def caption(i: int, seed: int) -> str:
    ks = np.arange(5, dtype=np.int64) + i * 11
    idx = (rng.u_np(ks, _T_CAP, seed) * len(_WORDS)).astype(np.int64) % len(_WORDS)
    return f"caption for img{i:08d}: " + " ".join(_WORDS[j] for j in idx)


def _image_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    xs, ys = point_pattern(ids, seed)
    rows = []
    for n, i in enumerate(ids):
        data, w, h, fmt, ph = make_image(int(i), seed)
        rows.append(
            (f"img{int(i):08d}", int(i), data, w, h, fmt, caption(int(i), seed), ph,
             float(xs[n]), float(ys[n]))
        )
    return pd.DataFrame(
        rows,
        columns=["image_id", "pid", "bytes", "w", "h", "fmt", "caption", "phash", "x", "y"],
    )


IMAGE_SCHEMA = (
    "image_id string, pid long, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, x double, y double"
)


def sensitive_images(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Distributed generation: spark.range -> per-batch numpy synthesis.
    ``pid`` (long) is the engine key; ``image_id`` the input_hint string id."""
    def gen(batches):
        for pdf in batches:
            yield _image_batch(pdf["id"].to_numpy(), seed)

    parts = max(8, min(256, n // 2000 + 1))
    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=IMAGE_SCHEMA)


def audio_clips(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic raw-PCM16 clips (hash-driven sine + noise) of varying
    length/rate — the audio analogue of sensitive_images."""
    from ..operators import media

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                sr = (8000, 16000, 22050)[i % 3]
                n_s = 400 + int(rng.u_np(np.array([i]), 231, seed)[0] * 1200)
                t = np.arange(n_s, dtype=np.float64)
                freq = 100.0 + float(rng.u_np(np.array([i]), 232, seed)[0]) * 800.0
                noise = (rng.u_np((t.astype(np.int64) * 131 + i) % (1 << 31), 233, seed) - 0.5) * 2000
                x = 8000.0 * np.sin(2 * np.pi * freq * t / sr) + noise
                rows.append(
                    (f"aud{i:06d}", media.encode_audio(np.round(x), "pcm16"),
                     sr, n_s, "pcm16", f"clip {i}")
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "bytes", "sample_rate", "n_samples", "fmt", "caption"],
            )

    return spark.range(0, n, 1, max(4, n // 100 + 1)).mapInPandas(
        gen, schema=media.AUDIO_SCHEMA
    )


def video_clips(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic raw-RGB clips: a handful of gradient frames per video."""
    from ..operators import media

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w, h = 16, 12
                n_f = 4 + i % 5
                yy, xx = np.mgrid[0:h, 0:w]
                frames = np.stack(
                    [((xx * 5 + yy * 3 + i * 7 + f * 11) % 256).astype(np.uint8)
                     for f in range(n_f)]
                )
                rgb = np.stack([frames, (frames * 2) % 256, (frames * 3) % 256], axis=-1)
                rows.append(
                    (f"vid{i:06d}", rgb.astype(np.uint8).tobytes(), w, h,
                     n_f, 10.0, "rawrgb", f"video {i}")
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "w", "h", "n_frames", "fps", "fmt", "caption"],
            )

    return spark.range(0, n, 1, max(4, n // 100 + 1)).mapInPandas(
        gen, schema=media.VIDEO_SCHEMA
    )


#: the four animation scenarios of gif_animations, cycled by i % 4
GIF_ANIM_SCENARIOS = ("d0", "d2", "d3", "mix")
_GIF_ANIM_W, _GIF_ANIM_H, _GIF_ANIM_FRAMES = 20, 16, 4
#: partial-frame rects for frames 1..3: (x, y, w, h) on the logical screen
_GIF_ANIM_RECTS = ((2, 1, 10, 8), (8, 6, 10, 8), (4, 3, 10, 8))


def _gif_pal16b() -> np.ndarray:
    """Second 16-color palette (the 'mix' scenario's frame-2 local table)."""
    j = np.arange(16, dtype=np.int64)
    return np.stack([(j * 19 + 33) % 256, (j * 47 + 90) % 256, (j * 71 + 12) % 256], axis=1)


def _gif_anim_frame_idx(i: int, f: int, fh: int, fw: int) -> np.ndarray:
    """Closed-form frame content (like video_clips — no RNG needed)."""
    yy, xx = np.mgrid[0:fh, 0:fw]
    return ((xx * 3 + yy * 5 + i * 7 + f * 11) % 16).astype(np.uint8)


def make_gif_animation(i: int) -> bytes:
    """One animated GIF exercising inter-frame compositing: frame 0 paints
    the full screen, frames 1..3 are partial rects, and the scenario
    (i % 4) picks the disposal/transparency/local-palette combination —
    'd0' leave-in-place, 'd2' restore-to-background (white), 'd3'
    restore-to-previous, 'mix' = transparency on frames 1-2 + a local
    palette on frame 2 + disposals 2 then 3. plans/media_oracle.py:
    _gif_anim_frames re-composites the same definition independently."""
    from ..functions import gif

    scen = GIF_ANIM_SCENARIOS[i % len(GIF_ANIM_SCENARIOS)]
    w, h, k = _GIF_ANIM_W, _GIF_ANIM_H, _GIF_ANIM_FRAMES
    frames = [_gif_anim_frame_idx(i, 0, h, w)]
    rects = [(0, 0)]
    for f in range(1, k):
        fx, fy, fw, fh = _GIF_ANIM_RECTS[f - 1]
        frames.append(_gif_anim_frame_idx(i, f, fh, fw))
        rects.append((fx, fy))
    disposals = {
        "d0": [0, 0, 0, 0],
        "d2": [0, 2, 2, 0],
        "d3": [0, 3, 3, 0],
        "mix": [0, 2, 3, 0],
    }[scen]
    transparents = [-1, _GIF_TR_IDX, _GIF_TR_IDX, -1] if scen == "mix" else None
    local_palettes = (
        [None, None, _gif_pal16b(), None] if scen == "mix" else None
    )
    return gif.encode_ex(
        frames,
        _gif_pal16(),
        screen=(w, h),
        rects=rects,
        delays=[10] * k,
        disposals=disposals,
        transparents=transparents,
        local_palettes=local_palettes,
    )


def gif_animations(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """VIDEO_SCHEMA table of animated GIFs (fmt 'gif', scenario in the
    caption) — real compressed multi-frame bytes for the frame-sample /
    stats pipeline, next to rawrgb/mjpeg (video_clips)."""
    from ..operators import media

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rows.append(
                    (f"gan{i:06d}", make_gif_animation(i), _GIF_ANIM_W,
                     _GIF_ANIM_H, _GIF_ANIM_FRAMES, 10.0, "gif",
                     GIF_ANIM_SCENARIOS[i % len(GIF_ANIM_SCENARIOS)])
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "w", "h", "n_frames", "fps",
                         "fmt", "caption"],
            )

    return spark.range(0, n, 1, max(4, n // 100 + 1)).mapInPandas(
        gen, schema=media.VIDEO_SCHEMA
    )


def sensitive_points_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side small point fixture (no image payload)."""
    ids = np.arange(n, dtype=np.int64)
    x, y = point_pattern(ids, seed)
    return pd.DataFrame({"pid": ids, "x": x, "y": y})


def addresses_pdf(m: int, seed: int = 43) -> pd.DataFrame:
    ids = np.arange(m, dtype=np.int64)
    x, y = point_pattern(ids, seed)
    return pd.DataFrame({"aid": ids, "ax": x, "ay": y})


def road_nodes_pdf(spacing: float = 150.0, seed: int = 44) -> pd.DataFrame:
    """Perturbed grid road nodes over the box (FIXTURES.md §4); ~1% deleted
    to create dead ends."""
    nx = int(BOX_W / spacing)
    ny = int(BOX_H / spacing)
    ids = np.arange(nx * ny, dtype=np.int64)
    gx = (ids % nx).astype(np.float64) * spacing + spacing / 2
    gy = (ids // nx).astype(np.float64) * spacing + spacing / 2
    jx = (rng.u_np(ids, 221, seed) - 0.5) * 60.0
    jy = (rng.u_np(ids, 222, seed) - 0.5) * 60.0
    keep = rng.u_np(ids, 223, seed) >= 0.01
    return pd.DataFrame(
        {"node_id": ids[keep], "nx": (gx + jx)[keep], "ny": (gy + jy)[keep]}
    )


def road_edges_pdf(nodes: pd.DataFrame, spacing: float = 150.0) -> pd.DataFrame:
    """4-neighbor grid edges between surviving nodes, both directions."""
    nx = int(BOX_W / spacing)
    idx = {int(i): (float(x), float(y)) for i, x, y in nodes.itertuples(index=False)}
    src, dst, length = [], [], []
    for i, (x, y) in idx.items():
        for j in (i + 1, i + nx):
            if (i + 1 == j and (i % nx) == nx - 1) or j not in idx:
                continue
            x2, y2 = idx[j]
            d = float(np.hypot(x - x2, y - y2))
            src += [i, j]
            dst += [j, i]
            length += [d, d]
    return pd.DataFrame({"src": src, "dst": dst, "length": length})
