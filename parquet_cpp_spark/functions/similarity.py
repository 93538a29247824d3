"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Three tiers:
- ``topk_inner_product_quantized``: embeddings quantized to int32
  (round(x * 1000)); scores are exact integer dot products, so results are
  bit-reproducible across engines (the DuckDB oracle computes the same
  integers) and across executors. This is the correctness-gated baseline —
  integer-quantized MIPS is also a real production retrieval mode (int8
  quantization).
- ``topk_cosine``: float cosine brute force with F.aggregate (JVM-side fold,
  no UDF). Rows-only check (float summation order is engine-specific).
- ``topk_cosine_lsh``: the scale path — random-hyperplane LSH buckets
  (deterministic seeded planes) prune candidates before exact rescoring, so
  the probe x corpus product never fully materializes; at 100 TB the
  bucket join replaces the cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

QUANT_SCALE = 1000


def _quantize(col):
    # floor(double(x)*scale + 0.5): float->double is exact and floor is
    # defined identically in Spark and DuckDB (F.round/round() disagree on
    # tie handling), so quantized vectors are bit-identical across engines
    return F.transform(col, lambda x: F.floor(
        x.cast("double") * QUANT_SCALE + F.lit(0.5)).cast("long"))


def topk_inner_product_quantized(emb: DataFrame, probe_ids: list[int],
                                 k: int = 10) -> DataFrame:
    """Exact integer MIPS: for each probe vec_id, the top-k corpus vectors by
    quantized inner product (ties broken by vec_id; probes never match
    themselves). Broadcast the probes: the corpus side streams."""
    q = emb.select("vec_id", _quantize(F.col("embedding")).alias("qe"))
    probes = (q.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("qe").alias("qp")))
    scored = (q.crossJoin(F.broadcast(probes))
              .filter(F.col("vec_id") != F.col("probe_id"))
              .select(
                  "probe_id", "vec_id",
                  F.aggregate(
                      F.zip_with("qe", "qp", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
                  .alias("score")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score", "rank"))


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def topk_cosine(emb: DataFrame, probe_ids: list[int], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k (float; JVM-side fold via F.aggregate)."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    probes = (e.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"), F.col("e").alias("p")))
    scored = (e.crossJoin(F.broadcast(probes))
              .filter(F.col("vec_id") != F.col("probe_id"))
              .select("probe_id", "vec_id",
                      _cosine(F.col("e"), F.col("p")).alias("score")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score", "rank"))


# near-dup quantization scale: coarser than retrieval (100 vs 1000) so every
# intermediate of the integer cosine test stays within exact int64/double
# range: dot <= ~1e7, dot^2*1e4 <= ~1e18 < 2^63
NEARDUP_SCALE = 100


def neardup_cosine_exact(emb: DataFrame, tau_sq_x10000: int = 900) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT integer arithmetic:
    pair (a, b) qualifies iff dot > 0 and
    ``10000 * dot^2 >= tau_sq_x10000 * |a|^2 * |b|^2`` over vectors
    quantized to ints — bit-reproducible across engines and executors.
    Brute-force O(n^2) baseline (the correctness oracle for the LSH scale
    path below)."""
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    q = emb.select(F.col("vec_id").alias("a_id"), qcol.alias("qa"))
    q2 = emb.select(F.col("vec_id").alias("b_id"), qcol.alias("qb"))
    pairs = q.crossJoin(q2).filter(F.col("a_id") < F.col("b_id"))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    na2 = F.aggregate(F.transform("qa", lambda a: a * a),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    nb2 = F.aggregate(F.transform("qb", lambda b: b * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = pairs.select("a_id", "b_id", dot.alias("dot"),
                          na2.alias("na2"), nb2.alias("nb2"))
    return (scored.filter((F.col("dot") > 0) &
                          (F.lit(10000) * F.col("dot") * F.col("dot") >=
                           F.lit(tau_sq_x10000) * F.col("na2") * F.col("nb2")))
            .select("a_id", "b_id"))


def neardup_cosine_lsh(emb: DataFrame, tau_sq_x10000: int = 900,
                       n_planes: int = 4, dim: int = 64) -> DataFrame:
    """Scale path: only pairs sharing an LSH bucket are scored (bucket join
    instead of cross join). Recall < 1 by construction (rows-only check)."""
    b = lsh_bucket(emb, n_planes, dim)
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    left = b.select(F.col("vec_id").alias("a_id"),
                    F.col("bucket").alias("ab"), qcol.alias("qa"))
    right = b.select(F.col("vec_id").alias("b_id"),
                     F.col("bucket").alias("bb"), qcol.alias("qb"))
    pairs = left.join(right, (F.col("ab") == F.col("bb")) &
                      (F.col("a_id") < F.col("b_id")))
    dot = F.aggregate(F.zip_with("qa", "qb", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    na2 = F.aggregate(F.transform("qa", lambda a: a * a),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    nb2 = F.aggregate(F.transform("qb", lambda b: b * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = pairs.select("a_id", "b_id", dot.alias("dot"),
                          na2.alias("na2"), nb2.alias("nb2"))
    return (scored.filter((F.col("dot") > 0) &
                          (F.lit(10000) * F.col("dot") * F.col("dot") >=
                           F.lit(tau_sq_x10000) * F.col("na2") * F.col("nb2")))
            .select("a_id", "b_id"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def quantized_planes(dim: int = 64, n_planes: int = 6,
                     seed: int = 7) -> np.ndarray:
    """Integer-quantized hyperplanes (floor(x*1000+0.5)): both the Spark
    plan and a SQL oracle can evaluate sign bits EXACTLY over them."""
    rng = np.random.default_rng(seed)
    return np.floor(rng.standard_normal((n_planes, dim)) * 1000 + 0.5) \
        .astype(np.int64)


def topk_inner_product_lsh(emb: DataFrame, probe_ids: list[int],
                           k: int = 10, n_planes: int = 6, dim: int = 64,
                           seed: int = 7) -> DataFrame:
    """LSH-pruned exact-integer MIPS: candidates share the probe's
    sign-bit bucket over integer-quantized hyperplanes; rescoring is the
    exact quantized inner product. Every stage is integer arithmetic, so a
    SQL oracle reproduces it bit-for-bit — the LSH scale path itself is
    correctness-gated, not just rows-counted."""
    planes = quantized_planes(dim, n_planes, seed)
    q = emb.select("vec_id", _quantize(F.col("embedding")).alias("qe"))
    bucket = None
    for i in range(n_planes):
        arr = F.array(*[F.lit(int(x)) for x in planes[i]])
        dot = F.aggregate(F.zip_with("qe", arr, lambda a, b: a * b),
                          F.lit(0).cast("long"), lambda acc, x: acc + x)
        bit = (dot > 0).cast("long") * F.lit(1 << i)
        bucket = bit if bucket is None else bucket + bit
    b = q.withColumn("bucket", bucket)
    probes = (b.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("qe").alias("qp"),
                      F.col("bucket").alias("pbucket")))
    cand = (b.join(F.broadcast(probes), F.col("bucket") == F.col("pbucket"))
            .filter(F.col("vec_id") != F.col("probe_id")))
    score = F.aggregate(F.zip_with("qe", "qp", lambda a, b_: a * b_),
                        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = cand.select("probe_id", "vec_id", score.alias("score"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score",
                    F.col("rank").cast("int").alias("rank")))


def lsh_bucket(emb: DataFrame, n_planes: int = 8, dim: int = 64,
               seed: int = 7, col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string over seeded planes.
    Deterministic (seeded numpy planes baked into the plan as literals)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(col, arr, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        bit = (dot > 0).cast("long") * F.lit(1 << i)
        bucket = bit if bucket is None else bucket + bit
    return emb.withColumn("bucket", bucket)


def ivf_train(emb: DataFrame, n_centroids: int = 16, seed: int = 11,
              iters: int = 5, sample_rows: int = 2048) -> np.ndarray:
    """IVF coarse quantizer training: k-means centroids from a deterministic
    bounded sample (seeded numpy Lloyd iterations, driver-side)."""
    sample = np.array(
        emb.select("embedding").limit(sample_rows).toPandas()
        ["embedding"].tolist(), dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_centroids):
            pts = sample[assign == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents


def ivf_assign(emb: DataFrame, n_centroids: int = 16, dim: int = 64,
               seed: int = 11, iters: int = 5,
               sample_rows: int = 2048,
               centroids: np.ndarray | None = None) -> DataFrame:
    """Every vector gets its nearest-centroid cell id. Centroids are trained
    driver-side on a bounded sample (``ivf_train``) unless passed in, then
    broadcast; assignment is one scan."""
    cents = centroids if centroids is not None else \
        ivf_train(emb, n_centroids, seed, iters, sample_rows)

    # nearest centroid via a vectorized pandas UDF (matmul argmin; literal
    # expression trees with n_centroids*dim constants blow up Catalyst
    # analysis time, so this is the UDF-worthy slow path by exception)
    from pyspark.sql import types as T

    c_mat = cents.copy()
    c_norm2 = (c_mat ** 2).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def nearest_cell(col: pd.Series) -> pd.Series:
        m = np.array(col.tolist(), dtype=np.float64)
        # argmin over |x-c|^2 == argmin over -2xC^T + |c|^2
        scores = -2.0 * (m @ c_mat.T) + c_norm2[None, :]
        return pd.Series(scores.argmin(axis=1).astype(np.int32))

    from ..shipping import ensure_shipped
    ensure_shipped(emb.sparkSession)
    return emb.withColumn("ivf_cell", nearest_cell(F.col("embedding")))


def topk_cosine_ivf(emb: DataFrame, probe_ids: list[int], k: int = 10,
                    n_centroids: int = 16, nprobe: int = 4,
                    dim: int = 64) -> DataFrame:
    """IVF scale path: score only vectors in the probe's ``nprobe``
    NEAREST cells (true centroid-distance ranking per probe, computed
    driver-side over the bounded probe set and broadcast). Recall < 1 by
    construction (rows-only check), but the candidate set shrinks
    ~n_centroids/nprobe-fold."""
    cents = ivf_train(emb, n_centroids)
    cells = ivf_assign(emb, centroids=cents)
    # rank cells per probe: a bounded collect (len(probe_ids) rows), then
    # argsort of centroid distances — the real IVF probe schedule
    probe_rows = (emb.filter(F.col("vec_id").isin(probe_ids))
                  .select("vec_id", "embedding").collect())
    pmat = np.array([list(r.embedding) for r in probe_rows],
                    dtype=np.float64)
    d2 = -2.0 * (pmat @ cents.T) + (cents ** 2).sum(axis=1)[None, :]
    nearest = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    pairs = [(int(r.vec_id), int(c))
             for r, cs in zip(probe_rows, nearest) for c in cs]
    cand_cells = emb.sparkSession.createDataFrame(
        pairs, "probe_id bigint, cell int")
    probes = (cells.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").cast("array<double>").alias("p")))
    cand_cells = cand_cells.join(probes, "probe_id")
    corpus = cells.select("vec_id", F.col("ivf_cell").alias("cell"),
                          F.col("embedding").cast("array<double>").alias("e"))
    cand = (corpus.join(F.broadcast(cand_cells), "cell")
            .filter(F.col("vec_id") != F.col("probe_id")))
    scored = cand.select("probe_id", "vec_id",
                         _cosine(F.col("e"), F.col("p")).alias("score"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score", "rank"))


def topk_cosine_lsh(emb: DataFrame, probe_ids: list[int], k: int = 10,
                    n_planes: int = 6, dim: int = 64) -> DataFrame:
    """Scale path: candidates share the probe's LSH bucket; exact cosine
    rescoring only within buckets (bucket join replaces the cross join)."""
    b = lsh_bucket(emb, n_planes, dim).select(
        "vec_id", "bucket", F.col("embedding").cast("array<double>").alias("e"))
    probes = (b.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("bucket").alias("pbucket"),
                      F.col("e").alias("p")))
    cand = (b.join(F.broadcast(probes),
                   F.col("bucket") == F.col("pbucket"))
            .filter(F.col("vec_id") != F.col("probe_id")))
    scored = cand.select("probe_id", "vec_id",
                         _cosine(F.col("e"), F.col("p")).alias("score"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score", "rank"))
