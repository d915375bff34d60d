"""Training-data pipeline operators over document / embedding tables:
deduplication (exact, n-gram Jaccard, MinHash-LSH, SimHash), text metrics
(tokens, quality, language-ID), similarity search (brute-force cosine kNN +
LSH-bucketed ANN).

Not part of the MaskMyPy reference — these are the large-scale data-prep
operators the engine adds for its 100 TB target workload. Everything is
built from the same primitives as the spatial layer: declarative explode +
equi-join + aggregate (JVM-side), with the engine's hash family for
sketches so results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKENIZE = r"\s+"
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")


def tokens_col(text: str = "text"):
    return F.split(F.trim(F.col(text)), TOKENIZE)


def doc_tokens(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Token + char counts per document."""
    return df.select(
        key,
        F.size(tokens_col(text)).alias("n_tokens"),
        F.length(text).alias("n_chars"),
    )


def doc_quality(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Heuristic quality scores: alphabetic ratio, stopword ratio, mean
    token length — the standard cheap pre-filters of web-scale corpora."""
    toks = tokens_col(text)
    return df.select(
        key,
        F.round(
            F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / F.length(text), 6
        ).alias("alpha_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(toks),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(text, r"\s+", "")) / F.size(toks), 6
        ).alias("mean_token_len"),
    )


def dedup_exact(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash (md5); keeper = min key.
    Scale: one shuffle on the 128-bit digest, partial-aggregated map-side."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("content_hash"))
        .agg(
            F.min(key).cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(df: DataFrame, key: str = "doc_id", text: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (JVM transform+explode)."""
    idx = " || ' ' || ".join(f"_t[i + {j}]" for j in range(n))
    return (
        df.select(key, tokens_col(text).alias("_t"))
        .where(F.size("_t") >= n)
        .select(
            key,
            F.explode(
                F.expr(f"transform(sequence(0, size(_t) - {n}), i -> {idx})")
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-duplicate pairs via the shingle inverted
    index: docs sharing >=1 shingle are candidates; |A ∩ B| falls out of the
    index self-join, |A|,|B| from per-doc counts. One shuffle on shingle,
    one on the pair key. ``max_shingle_df`` drops ubiquitous shingles
    (stop-shingles) — the classic skew guard for web corpora; None keeps
    exactness."""
    sh = shingles(df, key, text, n).cache()
    sizes = sh.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").count().where(F.col("count") > max_shingle_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = sh.select(F.col(key).alias("d1"), "shingle")
    b = sh.select(F.col(key).alias("d2"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    na = sizes.select(F.col(key).alias("d1"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col(key).alias("d2"), F.col("_n").alias("_nb"))
    return (
        common.join(na, "d1")
        .join(nb, "d2")
        .withColumn(
            "jaccard",
            F.round(F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, num_hashes: int = 32, key: str = "doc_id", text: str = "text", n: int = 3
) -> DataFrame:
    """MinHash signature per doc: min over shingles of xxhash64(shingle, i)
    for i in 0..num_hashes-1. Partitioning-independent (pure function of
    the shingle set)."""
    sh = shingles(df, key, text, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(key).agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, then EXACT Jaccard
    verification of candidates only (no false positives; false-negative
    rate bounded by the band curve 1-(1-s^r)^b). The scale path when the
    full inverted-index join is too hot."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, key, text, n)
    band_cols = [
        F.xxhash64(F.lit(b), *[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(key, *band_cols)
    pairs = None
    for b in range(bands):
        l = banded.select(F.col(key).alias("d1"), F.col(f"band_{b}").alias("_bk"))
        r = banded.select(F.col(key).alias("d2"), F.col(f"band_{b}").alias("_bk"))
        p = l.join(r, "_bk").where(F.col("d1") < F.col("d2")).select("d1", "d2")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.distinct()
    sh = shingles(df, key, text, n)
    sizes = sh.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col(key).alias("d1"), "shingle")
    b2 = sh.select(F.col(key).alias("d2"), "shingle")
    common = (
        a.join(cand, "d1")
        .join(b2, ["shingle", "d2"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        common.join(sizes.select(F.col(key).alias("d1"), F.col("_n").alias("_na")), "d1")
        .join(sizes.select(F.col(key).alias("d2"), F.col("_n").alias("_nb")), "d2")
        .withColumn(
            "jaccard",
            F.round(F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def simhash64(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sign of the sum of token
    hash bits. Declarative: explode tokens, aggregate bit votes."""
    toks = (
        df.select(key, F.explode(tokens_col(text)).alias("_tok"))
        .withColumn("_h", F.xxhash64("_tok"))
    )
    votes = toks.groupBy(key).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(64)
        ]
    )
    expr = " + ".join(
        f"IF(_v{i} > 0, CAST({1 << i if i < 63 else -(1 << 63)} AS BIGINT), CAST(0 AS BIGINT))"
        for i in range(64)
    )
    return votes.select(key, F.expr(expr).alias("simhash"))


def cosine_nn(
    emb: DataFrame, key: str = "vec_id", vec: str = "embedding", k: int = 1
) -> DataFrame:
    """Brute-force exact cosine top-k join (the correctness baseline).
    O(n²·d) — fine for verification scales; ``cosine_nn_lsh`` is the
    scale path."""
    from pyspark.sql.window import Window

    e = emb.select(
        F.col(key).alias("_id"),
        F.expr(f"transform({vec}, v -> CAST(v AS DOUBLE))").alias("_v"),
    )
    a = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    dot = "aggregate(zip_with(_va, _vb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
    na = "sqrt(aggregate(zip_with(_va, _va, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
    nb = "sqrt(aggregate(zip_with(_vb, _vb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
    pairs = (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .withColumn("cos", F.round(F.expr(f"({dot}) / ({na} * {nb})"), 6))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select(F.col("id_a").alias(key), F.col("id_b").alias("nn_id"), "cos", F.col("_rn").alias("rank"))
    )


def cosine_nn_lsh(
    emb: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    planes: int = 12,
    tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: ``tables`` independent
    sign-sketch buckets; candidates = bucket collisions; exact cosine on
    candidates; per-vector argmax. Recall < 1 by design (the scale path —
    candidate volume is O(n·bucket) instead of O(n²))."""
    import numpy as np

    dim = len(emb.select(vec).head()[0])
    rs = np.random.RandomState(seed)
    out = None
    e = emb.select(
        F.col(key).alias("_id"),
        F.expr(f"transform({vec}, v -> CAST(v AS DOUBLE))").alias("_v"),
    )
    for t in range(tables):
        h = rs.standard_normal((planes, dim))
        bits = [
            F.when(
                F.expr(
                    "aggregate(zip_with(_v, array("
                    + ", ".join(f"CAST({h[p, d]!r} AS DOUBLE)" for d in range(dim))
                    + "), (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
                )
                > 0,
                1,
            )
            .otherwise(0)
            .alias(f"_b{p}")
            for p in range(planes)
        ]
        bucket = e.select("_id", "_v", *bits).withColumn(
            "_bucket",
            F.expr(" + ".join(f"_b{p} * {1 << p}" for p in range(planes))),
        ).select("_id", "_v", "_bucket")
        l = bucket.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_bucket")
        r = bucket.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_bucket")
        p = l.join(r, "_bucket").where(F.col("id_a") != F.col("id_b")).select(
            "id_a", "id_b", "_va", "_vb"
        )
        out = p if out is None else out.unionByName(p)
    cand = out.dropDuplicates(["id_a", "id_b"])
    dot = "aggregate(zip_with(_va, _vb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
    na = "sqrt(aggregate(zip_with(_va, _va, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
    nb = "sqrt(aggregate(zip_with(_vb, _vb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z))"
    scored = cand.withColumn("cos", F.round(F.expr(f"({dot}) / ({na} * {nb})"), 6))
    best = scored.groupBy("id_a").agg(
        F.max(F.struct("cos", (-F.col("id_b")).alias("_nid"), "id_b")).alias("_b")
    )
    return best.select(
        F.col("id_a").alias(key),
        F.col("_b.id_b").alias("nn_id"),
        F.col("_b.cos").alias("cos"),
    )
