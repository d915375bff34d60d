"""Audio / video payload operators — the remaining multimodal columns of
the 100 TB curation pipeline, handled like images (operators/images.py):
opaque ``binary`` columns + typed metadata, every sample/pixel operation an
Arrow-batched ``mapInPandas`` with explicit schemas and bounded batches.

Codecs: RAW and COMPRESSED formats are REAL and dependency-free —
audio 'pcm16' (little-endian int16) and 'adpcm' (IMA ADPCM 4:1,
functions/adpcm.py); video 'rawrgb' (concatenated H x W x 3 uint8 frames)
and 'mjpeg' (length-framed Motion-JPEG over the baseline JFIF codec,
functions/jpeg.py), plus 'gif' (animated GIF via functions/gif.py — LZW,
local palettes, transparency, all disposal methods; frames decode already
composited on the logical screen) — so resample / transcode / frame-sample
/ stats run end-to-end on actual compressed bytes. Only PERCEPTUAL/
INTER-FRAME formats (mp3/aac/h264/vp9), which need licensed
psychoacoustic/motion machinery, remain STUBBED behind a clearly-marked
``NotImplementedError`` (per the build brief) with identical, tested
Spark-side plumbing.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, "
    "fmt string, caption string"
)
VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, fps double, "
    "fmt string, caption string"
)

_RAW_AUDIO = {"pcm16"}
_RAW_VIDEO = {"rawrgb"}


def decode_audio(data: bytes, fmt: str, n_samples: int | None = None) -> np.ndarray:
    """int16 sample array. Real codecs: 'pcm16' (raw little-endian) and
    'adpcm' (IMA ADPCM 4:1, functions/adpcm.py — pass ``n_samples`` to trim
    the nibble pad). Perceptual formats (mp3/aac) stay stubbed."""
    if fmt in _RAW_AUDIO:
        return np.frombuffer(data, dtype="<i2")
    if fmt == "adpcm":
        from ..functions import adpcm

        return adpcm.decode_adpcm(data, n_samples)
    raise NotImplementedError(
        f"audio format {fmt!r}: perceptual codecs are not available in this "
        "environment — STUB (plumbing is format-agnostic; swap the codec in; "
        "'adpcm' is the real compressed path)."
    )


def encode_audio(samples: np.ndarray, fmt: str = "pcm16") -> bytes:
    if fmt in _RAW_AUDIO:
        return samples.astype("<i2").tobytes()
    if fmt == "adpcm":
        from ..functions import adpcm

        return adpcm.encode_adpcm(np.asarray(samples, dtype=np.int64))
    raise NotImplementedError(f"audio format {fmt!r}: see decode_audio")


def decode_video(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """(n_frames, h, w, 3) uint8 array. Real codecs: 'rawrgb' (concatenated
    frames) and 'mjpeg' (length-framed Motion-JPEG: per frame a u32-LE byte
    length + a baseline JFIF stream, functions/jpeg.py). Inter-frame
    formats (h264/vp9) stay stubbed."""
    if fmt in _RAW_VIDEO:
        frame = w * h * 3
        n = len(data) // frame
        return np.frombuffer(data[: n * frame], dtype=np.uint8).reshape(n, h, w, 3)
    if fmt == "mjpeg":
        import struct as _struct

        from ..functions import jpeg as _jpeg

        frames = []
        pos = 0
        while pos + 4 <= len(data):
            (ln,) = _struct.unpack("<I", data[pos : pos + 4])
            frames.append(_jpeg.decode_jpeg(data[pos + 4 : pos + 4 + ln]))
            pos += 4 + ln
        out = np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)
        if out.shape[1:3] != (h, w):
            raise ValueError(
                f"mjpeg frames decode to {out.shape[2]}x{out.shape[1]}, "
                f"metadata says {w}x{h}"
            )
        return out
    if fmt == "gif":
        from ..functions import gif as _gif

        out = np.stack([f for _, f in _gif.decode_frames(data)])
        if out.shape[1:3] != (h, w):
            raise ValueError(
                f"gif logical screen is {out.shape[2]}x{out.shape[1]}, "
                f"metadata says {w}x{h}"
            )
        return out
    raise NotImplementedError(
        f"video format {fmt!r}: inter-frame codecs are not available in this "
        "environment — STUB (plumbing is format-agnostic; swap the codec in; "
        "'mjpeg' is the real compressed path)."
    )


def encode_video(frames: np.ndarray, fmt: str = "rawrgb", quality: int = 98) -> bytes:
    """(n, h, w, 3) uint8 -> bytes in ``fmt`` (see :func:`decode_video`)."""
    if fmt in _RAW_VIDEO:
        return np.ascontiguousarray(frames, dtype=np.uint8).tobytes()
    if fmt == "mjpeg":
        import struct as _struct

        from ..functions import jpeg as _jpeg

        parts = []
        for f in frames:
            enc = _jpeg.encode_jpeg(np.asarray(f, dtype=np.uint8), quality)
            parts.append(_struct.pack("<I", len(enc)) + enc)
        return b"".join(parts)
    if fmt == "gif":
        # indexed-color writer (functions/gif.py): a shared <=256-color
        # palette must exist — GIF's quantization step is out of scope,
        # exactly like the still-image 'gif' codec (imagecodec.py)
        from ..functions import gif as _gif

        arr = np.ascontiguousarray(frames, dtype=np.uint8)
        idx, pal = _gif.palettize(arr)
        return _gif.encode_ex(list(idx), pal, delays=[10] * len(idx))
    raise NotImplementedError(f"video format {fmt!r}: see decode_video")


# ------------------------------------------------------------ audio ops ---

def audio_resample(
    audio: DataFrame, target_rate: int, key: str = "audio_id"
) -> DataFrame:
    """Linear-interpolation resample to ``target_rate`` (deterministic,
    numpy); bytes/sample_rate/n_samples refreshed, payload columns pass
    through."""
    import pandas as pd

    cols = audio.columns
    out_schema = audio.schema

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            nb, nn = [], []
            for b, sr, fmt, ns in zip(
                pdf["bytes"], pdf["sample_rate"], pdf["fmt"], pdf["n_samples"]
            ):
                x = decode_audio(bytes(b), fmt, int(ns)).astype(np.float64)
                n_out = max(1, int(round(len(x) * target_rate / sr)))
                t_out = np.linspace(0.0, len(x) - 1.0, n_out)
                y = np.interp(t_out, np.arange(len(x)), x)
                nb.append(encode_audio(np.clip(np.round(y), -32768, 32767), "pcm16"))
                nn.append(n_out)
            out = pdf.copy()
            out["bytes"] = nb
            out["sample_rate"] = pd.Series([target_rate] * len(pdf), index=pdf.index, dtype="int32")
            out["n_samples"] = pd.Series(nn, index=pdf.index, dtype="int32")
            out["fmt"] = "pcm16"
            yield out[cols]

    return audio.mapInPandas(batches, schema=out_schema)


def audio_stats(audio: DataFrame, key: str = "audio_id") -> DataFrame:
    """RMS level + duration per clip (one numpy pass per row)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for aid, b, sr, fmt, ns in zip(
                pdf[key], pdf["bytes"], pdf["sample_rate"], pdf["fmt"],
                pdf["n_samples"],
            ):
                x = decode_audio(bytes(b), fmt, int(ns)).astype(np.float64)
                rows.append(
                    (aid, float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                     len(x) / float(sr))
                )
            yield pd.DataFrame(rows, columns=[key, "rms", "duration_sec"])

    # prune to the consumed columns before the Python boundary (guide §4)
    return audio.select(key, "bytes", "sample_rate", "fmt", "n_samples").mapInPandas(
        batches, schema=f"{key} string, rms double, duration_sec double"
    )


def audio_transcode(
    audio: DataFrame, fmt: str = "adpcm", key: str = "audio_id"
) -> DataFrame:
    """Decode -> re-encode each clip in ``fmt`` (bytes/fmt refreshed,
    sample count and rate unchanged, payload columns pass through) — the
    compression step of an audio curation pipeline. 'adpcm' is the real
    4:1 lossy path (SNR bounds asserted in tests/test_media.py)."""
    import pandas as pd

    cols = audio.columns
    out_schema = audio.schema

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            nb = [
                encode_audio(
                    decode_audio(bytes(b), f0, int(ns)).astype(np.int64), fmt
                )
                for b, f0, ns in zip(pdf["bytes"], pdf["fmt"], pdf["n_samples"])
            ]
            out = pdf.copy()
            out["bytes"] = nb
            out["fmt"] = fmt
            yield out[cols]

    return audio.mapInPandas(batches, schema=out_schema)


def video_transcode(
    video: DataFrame, fmt: str = "mjpeg", quality: int = 98,
    key: str = "video_id",
) -> DataFrame:
    """Decode -> re-encode each clip in ``fmt`` (bytes/fmt refreshed) —
    'mjpeg' chains every frame through the baseline JPEG codec
    (functions/jpeg.py), giving a real compressed video path whose frames
    still flow through video_frame_sample / image_stats unchanged."""
    import pandas as pd

    cols = video.columns
    out_schema = video.schema

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            nb = [
                encode_video(
                    decode_video(bytes(b), int(w), int(h), f0), fmt, quality
                )
                for b, w, h, f0 in zip(
                    pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
                )
            ]
            out = pdf.copy()
            out["bytes"] = nb
            out["fmt"] = fmt
            yield out[cols]

    return video.mapInPandas(batches, schema=out_schema)


# ------------------------------------------------------------ video ops ---

def video_frame_sample(
    video: DataFrame, every_n: int = 5, key: str = "video_id", img_fmt: str = "ppm"
) -> DataFrame:
    """Sample every ``every_n``-th frame and emit IMAGE rows (image_id,
    bytes, w, h, fmt, phash) — the handoff into the image pipeline
    (operators/images.py: dedup, stats, re-encode). One video row fans out
    to ceil(n_frames / every_n) image rows inside the Arrow batch."""
    import pandas as pd

    from ..functions import imagecodec

    def batches(it):
        for pdf in it:
            rows = []
            for vid, b, w, h, fmt in zip(
                pdf[key], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                frames = decode_video(bytes(b), int(w), int(h), fmt)
                for i in range(0, len(frames), every_n):
                    img = frames[i]
                    enc = imagecodec.encode(img, img_fmt)
                    # lossy image targets: phash matches a fresh decode
                    if img_fmt in imagecodec.LOSSY:
                        img = imagecodec.decode(enc, img_fmt)
                    rows.append(
                        (f"{vid}_f{i:05d}", enc, int(w), int(h), img_fmt,
                         imagecodec.average_hash(img))
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "phash"]
            )

    # prune to the consumed columns before the Python boundary (guide §4)
    return video.select(key, "bytes", "w", "h", "fmt").mapInPandas(
        batches,
        schema="image_id string, bytes binary, w int, h int, fmt string, phash long",
    )


def video_stats(video: DataFrame, key: str = "video_id") -> DataFrame:
    """Per-video mean frame brightness + duration."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for vid, b, w, h, fmt, n, fps in zip(
                pdf[key], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"],
                pdf["n_frames"], pdf["fps"],
            ):
                frames = decode_video(bytes(b), int(w), int(h), fmt).astype(np.float64)
                rows.append(
                    (vid, float(frames.mean()) if frames.size else 0.0,
                     int(n) / float(fps))
                )
            yield pd.DataFrame(rows, columns=[key, "brightness", "duration_sec"])

    # prune to the consumed columns before the Python boundary (guide §4)
    return video.select(
        key, "bytes", "w", "h", "fmt", "n_frames", "fps"
    ).mapInPandas(
        batches, schema=f"{key} string, brightness double, duration_sec double"
    )
