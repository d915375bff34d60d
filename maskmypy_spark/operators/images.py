"""Multimodal (image) operators over binary-payload tables of shape
``input_hint``: (image_id, bytes, w, h, fmt, caption, phash, ...).

Images are opaque ``binary`` columns with typed metadata; every pixel
operation is an Arrow-batched ``mapInPandas`` over the engine's pure-numpy
codecs (functions/imagecodec.py — PPM/BMP/PNG lossless plus a real baseline
JPEG in functions/jpeg.py; no PIL/opencv in this environment). The batch shape, schema pass-through, and partitioning are
the real 100 TB plumbing: batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so image bytes never
accumulate beyond a batch per core, and all non-payload columns (captions,
coordinates, ids) flow through untouched — the per-row fidelity invariant
(PSNR >= 40 dB for lossy re-encode, byte-identical captions) holds by
construction and is asserted in tests/test_images.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import imagecodec
from .dedup import dedup_clusters, hamming_pairs


def reencode(
    images: DataFrame,
    fmt: str | None = None,
    bits: int | None = None,
    key: str = "image_id",
    suffix: str = "",
) -> DataFrame:
    """Decode -> optional bit-depth quantization (the engine's explicit
    'lossy' path, PSNR >= 40 dB at bits=5) -> re-encode (optionally to a
    different format) -> refresh (bytes, fmt, phash). All other columns
    pass through unchanged; ``suffix`` optionally tags the id so planted
    re-encodes coexist with their originals."""
    import pandas as pd

    cols = images.columns
    out_schema = images.schema

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            new_bytes, new_fmt, new_phash, new_ids = [], [], [], []
            for b, f0, iid in zip(pdf["bytes"], pdf["fmt"], pdf[key]):
                img = imagecodec.decode(bytes(b), f0)
                if bits is not None:
                    img = imagecodec.quantize(img, bits)
                f1 = fmt or f0
                enc = imagecodec.encode(img, f1)
                new_bytes.append(enc)
                new_fmt.append(f1)
                # invariant: phash always matches a fresh decode of bytes —
                # lossy targets (jpg) must hash the codec's output pixels
                if f1 in imagecodec.LOSSY:
                    img = imagecodec.decode(enc, f1)
                new_phash.append(imagecodec.average_hash(img))
                new_ids.append(f"{iid}{suffix}")
            out = pdf.copy()
            out["bytes"] = new_bytes
            out["fmt"] = new_fmt
            out["phash"] = pd.Series(new_phash, index=pdf.index, dtype="int64")
            out[key] = new_ids
            yield out[cols]

    return images.mapInPandas(batches, schema=out_schema)


def image_resize(
    images: DataFrame,
    out_w: int,
    out_h: int,
    key: str = "image_id",
) -> DataFrame:
    """Decode -> nearest-neighbor resample to (out_w, out_h) -> re-encode,
    refreshing (bytes, w, h, phash); every other column passes through.
    Nearest-neighbor keeps the kernel pure-numpy index arithmetic (no
    scipy/PIL in env) and is deterministic: output pixel (i, j) takes
    source pixel (floor(i*H/out_h), floor(j*W/out_w)) — the standard
    thumbnailing step of an image-pretraining pipeline; plumbing (Arrow
    batches, schema, bounded memory) identical to :func:`reencode`."""
    import numpy as np
    import pandas as pd

    cols = images.columns
    out_schema = images.schema

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            new_bytes, new_phash = [], []
            for b, f0 in zip(pdf["bytes"], pdf["fmt"]):
                img = imagecodec.decode(bytes(b), f0)
                h, w = img.shape[:2]
                ri = (np.arange(out_h) * h // out_h).astype(np.int64)
                ci = (np.arange(out_w) * w // out_w).astype(np.int64)
                img = img[ri][:, ci]
                enc = imagecodec.encode(img, f0)
                new_bytes.append(enc)
                # lossy targets: phash must match a fresh decode of bytes
                if f0 in imagecodec.LOSSY:
                    img = imagecodec.decode(enc, f0)
                new_phash.append(imagecodec.average_hash(img))
            out = pdf.copy()
            out["bytes"] = new_bytes
            out["w"] = out_w
            out["h"] = out_h
            out["phash"] = pd.Series(new_phash, index=pdf.index, dtype="int64")
            yield out[cols]

    return images.mapInPandas(batches, schema=out_schema)


def image_stats(images: DataFrame, key: str = "image_id") -> DataFrame:
    """Cheap per-image features (mean/std brightness per channel) — the
    feature-extraction step of a multimodal curation pipeline, decoded
    batch-wise (one numpy pass per image, no Python per-pixel work)."""
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for iid, b, f0 in zip(pdf[key], pdf["bytes"], pdf["fmt"]):
                img = imagecodec.decode(bytes(b), f0).astype(np.float64)
                rows.append(
                    (iid, float(img.mean()), float(img.std()),
                     *[float(img[:, :, c].mean()) for c in range(3)])
                )
            yield pd.DataFrame(
                rows, columns=[key, "brightness", "contrast", "mean_r", "mean_g", "mean_b"]
            )

    # only the consumed columns cross the Arrow boundary (guide §4: Spark
    # cannot see which columns an opaque function reads — an explicit
    # select keeps captions/payload out of the JVM->Python transfer)
    return images.select(key, "bytes", "fmt").mapInPandas(
        batches,
        schema=f"{key} string, brightness double, contrast double, "
        "mean_r double, mean_g double, mean_b double",
    )


def image_phash_pairs(
    images: DataFrame,
    max_hamming: int = 6,
    key: str = "image_id",
    phash: str = "phash",
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash hamming distance —
    the banded pigeonhole join (operators/dedup.py:hamming_pairs), so the
    candidate volume is bucket-bounded, never all-pairs."""
    return hamming_pairs(
        images.select(key, phash), phash, key=key, max_hamming=max_hamming
    )


def image_dedup(
    images: DataFrame,
    max_hamming: int = 6,
    key: str = "image_id",
    phash: str = "phash",
) -> DataFrame:
    """Full image dedup: phash hamming pairs -> connected components ->
    (image_id, cluster_id, keep). Singletons keep themselves (absent from
    the pair graph => their own cluster)."""
    pairs = image_phash_pairs(images, max_hamming, key, phash)
    clusters = dedup_clusters(pairs)
    ids = images.select(F.col(key).alias("doc_id"))
    full = ids.join(clusters, "doc_id", "left").select(
        F.col("doc_id").alias(key),
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    return full.withColumn("keep", (F.col(key) == F.col("cluster_id")).cast("int"))
