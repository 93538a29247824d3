"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Every operator is integer-quantized end-to-end (floor(x*scale + 0.5), a
real production retrieval mode — int8 quantization), so scores, buckets,
and cell assignments are EXACT integer arithmetic: bit-reproducible across
engines (each query has a DuckDB SQL oracle) and across executors.

Tiers:
- ``topk_inner_product_quantized`` / ``topk_cosine``: brute-force broadcast
  baselines (probes broadcast, corpus streams).
- ``topk_inner_product_lsh`` / ``topk_cosine_lsh`` / ``neardup_cosine_lsh``:
  sign-bit LSH over integer-quantized hyperplanes prunes candidates before
  exact rescoring — at 100 TB the bucket join replaces the cross join.
  Multi-probe (flip the weakest sign bits) lifts recall at the same shape.
- ``topk_cosine_ivf``: IVF coarse quantizer — k-means cells prune the
  corpus ~n_centroids/nprobe-fold; assignment and probe scheduling are
  exact integer arithmetic over quantized centroids.
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


def _int_dot(a, b):
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


# Exact-integer cosine score: sign(dot) * floor(1e6 * dot^2 / (|a|^2|b|^2)).
# sign(c)*c^2 is monotone in c on [-1, 1], so ranking by this integer equals
# ranking by cosine up to ppm quantization (ties then break by vec_id in
# both engines identically). With NEARDUP_SCALE=100 and |x| <= ~0.6, dot <=
# ~2.2e5 so 1e6*dot^2 <= ~5e16 stays inside int64 — every stage is exact,
# which is what lets a SQL oracle reproduce the result bit-for-bit (the
# ann_ip_lsh pattern from round 2 applied to the cosine family).
_COS_SCORE_EXPR = ("CASE WHEN dot >= 0 "
                   "THEN (1000000 * dot * dot) div (na2 * nb2) "
                   "ELSE -((1000000 * dot * dot) div (na2 * nb2)) END")

# |dot| <= sqrt(na2*nb2) (Cauchy-Schwarz holds for the quantized ints), so
# 1e6*dot^2 fits int64 whenever na2, nb2 <= 3e6 — i.e. components up to
# ~|x| ~= 2 at scale 100. Typical normalized embeddings are far inside;
# the guard turns silent int64 wraparound into a loud error.
_COS_N2_MAX = 3_000_000


def _rank_cosine(scored: DataFrame, k: int) -> DataFrame:
    checked_dot = F.when(
        (F.col("na2") > _COS_N2_MAX) | (F.col("nb2") > _COS_N2_MAX),
        F.raise_error(F.lit(
            "quantized norm too large for exact int64 cosine scoring "
            "(components must satisfy |x| <~ 2)"))
    ).otherwise(F.col("dot"))
    scored = (scored.filter((F.col("na2") > 0) & (F.col("nb2") > 0))
              .select("probe_id", "vec_id", checked_dot.alias("dot"),
                      "na2", "nb2")
              .select("probe_id", "vec_id",
                      F.expr(_COS_SCORE_EXPR).alias("score")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score",
                    F.col("rank").cast("int").alias("rank")))


def topk_cosine(emb: DataFrame, probe_ids: list[int], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k over integer-quantized vectors: exact
    integer scoring (see _COS_SCORE_EXPR), bit-reproducible by a SQL
    oracle. Norms are precomputed row-locally before the join."""
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    q = emb.select("vec_id", qcol.alias("qe")) \
        .withColumn("n2", _int_dot("qe", "qe"))
    probes = (q.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("qe").alias("qp"), F.col("n2").alias("nb2")))
    scored = (q.crossJoin(F.broadcast(probes))
              .filter(F.col("vec_id") != F.col("probe_id"))
              .select("probe_id", "vec_id",
                      _int_dot("qe", "qp").alias("dot"),
                      F.col("n2").alias("na2"), "nb2"))
    return _rank_cosine(scored, k)


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


def _int_bucket(qe: str, planes: np.ndarray):
    """Sign-bit LSH bucket over integer-quantized hyperplanes: every bit is
    the sign of an exact integer dot product, so a SQL oracle reproduces the
    bucket assignment bit-for-bit."""
    bucket = None
    for i in range(len(planes)):
        arr = F.array(*[F.lit(int(x)) for x in planes[i]])
        bit = (_int_dot(qe, arr) > 0).cast("long") * F.lit(1 << i)
        bucket = bit if bucket is None else bucket + bit
    return bucket


# Cosine-LSH buckets larger than this generate NO pairs (the
# neardup_jaccard cap pattern, functions/dedup.py): a hot bucket otherwise
# yields O(bucket^2) candidate pairs inside one join key — the quadratic
# blowup that kills the job at 100 TB. Skipped buckets are enumerable via
# neardup_cosine_dropped_buckets — truncation is auditable, never silent.
DEFAULT_COSINE_BUCKET_CAP = 64
# auto_n_planes targets this many vectors per bucket, so bucket count grows
# with the corpus (2^n_planes ~= n/target) instead of staying constant —
# constant buckets make the capped-out fraction (or, uncapped, the join
# cost) grow linearly with corpus size.
TARGET_BUCKET_SIZE = 32


def auto_n_planes(n_rows: int, target_bucket_size: int = TARGET_BUCKET_SIZE,
                  lo: int = 4, hi: int = 24) -> int:
    """Corpus-scaled hyperplane count: ceil(log2(n/target)), clamped.
    Deterministic in n_rows, so a SQL oracle built from the table's row
    count bakes in the identical plane set."""
    import math
    if n_rows <= target_bucket_size * (1 << lo):
        return lo
    return min(hi, math.ceil(math.log2(n_rows / target_bucket_size)))


def _resolve_n_planes(emb: DataFrame, n_planes: "int | None") -> int:
    if n_planes is not None:
        return n_planes
    # at scale this is a parquet metadata-only count, not a data scan
    return auto_n_planes(emb.count())


def neardup_cosine_lsh(emb: DataFrame, tau_sq_x10000: int = 900,
                       n_planes: "int | None" = None, dim: int = 64,
                       seed: int = 7,
                       bucket_cap: "int | None" = DEFAULT_COSINE_BUCKET_CAP
                       ) -> DataFrame:
    """Scale path: only pairs sharing an LSH bucket are scored (bucket join
    instead of cross join). Buckets use integer-quantized hyperplanes and
    the rescoring predicate is exact integer arithmetic, so the whole query
    has a SQL oracle despite being an approximate (recall < 1) operator.

    ``n_planes=None`` (default) scales the plane count with the corpus
    (:func:`auto_n_planes`): bucket count ~= n/TARGET_BUCKET_SIZE, so the
    join stays ~O(n * target) instead of O(n^2 / constant).

    RECALL CONTRACT: buckets holding more than ``bucket_cap`` vectors
    generate no pairs (per-key join fan-out bounded by cap^2). The skipped
    buckets are enumerable via :func:`neardup_cosine_dropped_buckets`
    (same cap rule) — run it alongside and re-bucket or exact-compare the
    hot clusters out of band. ``bucket_cap=None`` uncaps (test scales)."""
    n_planes = _resolve_n_planes(emb, n_planes)
    if bucket_cap is None:
        bucket_cap = 1 << 62  # uncapped: every >=2-vec bucket generates pairs
    planes = quantized_planes(dim, n_planes, seed)
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    b = emb.select("vec_id", qcol.alias("qe")) \
        .withColumn("bucket", _int_bucket("qe", planes))
    ok = (b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))
          .filter((F.col("n_vecs") >= 2) & (F.col("n_vecs") <= bucket_cap))
          .select("bucket"))
    left = b.join(ok, "bucket") \
        .select(F.col("vec_id").alias("a_id"),
                F.col("bucket").alias("ab"), F.col("qe").alias("qa"))
    right = b.select(F.col("vec_id").alias("b_id"),
                     F.col("bucket").alias("bb"), F.col("qe").alias("qb"))
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


def neardup_cosine_dropped_buckets(
        emb: DataFrame, n_planes: "int | None" = None, dim: int = 64,
        seed: int = 7,
        bucket_cap: "int | None" = DEFAULT_COSINE_BUCKET_CAP) -> DataFrame:
    """Audit companion to :func:`neardup_cosine_lsh`: every LSH bucket the
    cap rule SKIPPED, as (bucket, n_vecs) — the skew report an operator
    reads before deciding to add planes or exact-compare a hot cluster.
    Same plane/cap resolution as the main query, so the two enumerate a
    partition of the candidate space (scored buckets + dropped buckets)."""
    n_planes = _resolve_n_planes(emb, n_planes)
    if bucket_cap is None:
        bucket_cap = 1 << 62
    planes = quantized_planes(dim, n_planes, seed)
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    b = emb.select("vec_id", qcol.alias("qe")) \
        .withColumn("bucket", _int_bucket("qe", planes))
    return (b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))
            .filter(F.col("n_vecs") > bucket_cap)
            .select("bucket", "n_vecs"))


def quantized_planes(dim: int = 64, n_planes: int = 6,
                     seed: int = 7) -> np.ndarray:
    """Integer-quantized hyperplanes (floor(x*1000+0.5)): both the Spark
    plan and a SQL oracle can evaluate sign bits EXACTLY over them."""
    rng = np.random.default_rng(seed)
    return np.floor(rng.standard_normal((n_planes, dim)) * 1000 + 0.5) \
        .astype(np.int64)


def topk_inner_product_lsh(emb: DataFrame, probe_ids: list[int],
                           k: int = 10, n_planes: "int | None" = 6,
                           dim: int = 64,
                           seed: int = 7, nprobe: int = 1) -> DataFrame:
    """LSH-pruned exact-integer MIPS: candidates share the probe's
    sign-bit bucket over integer-quantized hyperplanes; rescoring is the
    exact quantized inner product. Every stage is integer arithmetic, so a
    SQL oracle reproduces it bit-for-bit — the LSH scale path itself is
    correctness-gated, not just rows-counted.

    ``nprobe`` > 1 enables multi-probe: each probe additionally searches
    the buckets reached by flipping its (nprobe-1) weakest sign bits (the
    planes with the smallest |dot|, ties to the lowest plane index) — the
    classic recall lift at the same plan shape (one broadcast bucket join);
    the probe side fans out nprobe-fold, the corpus side is unchanged.

    ``n_planes=None`` scales planes with the corpus (auto_n_planes) so the
    per-probe candidate set stays ~TARGET_BUCKET_SIZE as the corpus grows;
    the pinned default of 6 keeps the driver oracle's plane set static."""
    n_planes = _resolve_n_planes(emb, n_planes)
    planes = quantized_planes(dim, n_planes, seed)
    q = emb.select("vec_id", _quantize(F.col("embedding")).alias("qe"))
    b = q.withColumn("bucket", _int_bucket("qe", planes))
    probes = b.filter(F.col("vec_id").isin(probe_ids))
    if nprobe > 1:
        dcols = [_int_dot("qe", F.array(*[F.lit(int(x)) for x in planes[i]]))
                 .alias(f"d{i}") for i in range(n_planes)]
        probes = probes.select("vec_id", "qe", "bucket", *dcols)
        # rank planes by (|dot| asc, index asc); the struct carries the bit
        # value so the flip is a literal-free XOR inside the lambda
        order = F.array_sort(F.array(*[
            F.struct(F.abs(F.col(f"d{i}")).alias("a"),
                     F.lit(1 << i).cast("long").alias("b"))
            for i in range(n_planes)]))
        flips = F.slice(F.transform(order, lambda s: s["b"]),
                        1, nprobe - 1)
        buckets = F.concat(
            F.array(F.col("bucket")),
            F.transform(flips, lambda bit: F.col("bucket").bitwiseXOR(bit)))
        probes = probes.select(
            F.col("vec_id").alias("probe_id"), F.col("qe").alias("qp"),
            F.explode(buckets).alias("pbucket"))
    else:
        probes = probes.select(F.col("vec_id").alias("probe_id"),
                               F.col("qe").alias("qp"),
                               F.col("bucket").alias("pbucket"))
    cand = (b.join(F.broadcast(probes), F.col("bucket") == F.col("pbucket"))
            .filter(F.col("vec_id") != F.col("probe_id")))
    scored = cand.select("probe_id", "vec_id",
                         _int_dot("qe", "qp").alias("score"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"),
                                               F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "score",
                    F.col("rank").cast("int").alias("rank")))


def _ivf_lloyd(sample: np.ndarray, n_centroids: int, seed: int,
               iters: int) -> np.ndarray:
    """Seeded numpy Lloyd iterations over an already-deterministic sample
    (shared by the Spark path and the oracle-building parquet path, so both
    produce bit-identical centroids)."""
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


def ivf_train(emb: DataFrame, n_centroids: int = 16, seed: int = 11,
              iters: int = 5, sample_rows: int = 2048) -> np.ndarray:
    """IVF coarse quantizer training: k-means centroids from a
    DETERMINISTIC bounded sample — the ``sample_rows`` lowest vec_ids
    (TakeOrdered pushes the limit into the sort, so the sample never
    depends on partition scan order; re-running on a repartitioned input
    yields identical centroids)."""
    rows = (emb.select("vec_id", "embedding")
            .orderBy("vec_id").limit(sample_rows).collect())
    rows.sort(key=lambda r: r.vec_id)
    sample = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return _ivf_lloyd(sample, n_centroids, seed, iters)


def ivf_centroids_from_parquet(path: str, n_centroids: int = 16,
                               seed: int = 11, iters: int = 5,
                               sample_rows: int = 2048) -> np.ndarray:
    """Spark-free replica of ivf_train for oracle construction: reads the
    embeddings parquet directly, takes the same lowest-vec_id sample, and
    runs the same Lloyd loop — bit-identical centroids by construction."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    vec_ids = tbl.column("vec_id").to_numpy()
    order = np.argsort(vec_ids, kind="stable")[:sample_rows]
    embs = tbl.column("embedding").to_pylist()
    sample = np.array([embs[i] for i in order], dtype=np.float64)
    return _ivf_lloyd(sample, n_centroids, seed, iters)


def quantized_centroids(cents: np.ndarray) -> np.ndarray:
    """Centroids quantized to the cosine-family integer grid: cell
    assignment over (qe, qc) is exact integer arithmetic in both engines."""
    return np.floor(cents * NEARDUP_SCALE + 0.5).astype(np.int64)


def ivf_assign(emb: DataFrame, n_centroids: int = 16, dim: int = 64,
               seed: int = 11, iters: int = 5,
               sample_rows: int = 2048,
               centroids: np.ndarray | None = None) -> DataFrame:
    """Every vector gets its nearest-centroid cell id, computed in EXACT
    integer arithmetic over quantized vectors and centroids (ties to the
    lowest cell id) — a SQL oracle reproduces the assignment bit-for-bit.
    Centroids are trained driver-side on a bounded deterministic sample
    (``ivf_train``) unless passed in, then broadcast; assignment is one
    scan (vectorized pandas UDF: literal expression trees with
    n_centroids*dim constants blow up Catalyst analysis time, so this is
    the UDF-worthy slow path by exception)."""
    from pyspark.sql import types as T

    cents = centroids if centroids is not None else \
        ivf_train(emb, n_centroids, seed, iters, sample_rows)
    qc = quantized_centroids(cents)
    qc_norm2 = (qc * qc).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def nearest_cell(col: pd.Series) -> pd.Series:
        m = np.floor(np.array(col.tolist(), dtype=np.float64)
                     * NEARDUP_SCALE + 0.5).astype(np.int64)
        # argmin over |q-c|^2 == argmin over -2qC^T + |c|^2 (exact int64;
        # argmin returns the FIRST minimum -> lowest cell id on ties)
        scores = -2 * (m @ qc.T) + qc_norm2[None, :]
        return pd.Series(scores.argmin(axis=1).astype(np.int32))

    from ..shipping import ensure_shipped
    ensure_shipped(emb.sparkSession)
    return emb.withColumn("ivf_cell", nearest_cell(F.col("embedding")))


def topk_cosine_ivf(emb: DataFrame, probe_ids: list[int], k: int = 10,
                    n_centroids: int = 16, nprobe: int = 4,
                    dim: int = 64) -> DataFrame:
    """IVF scale path: score only vectors in the probe's ``nprobe``
    NEAREST cells (integer centroid-distance ranking per probe, computed
    driver-side over the bounded probe set and broadcast). Candidate
    pruning shrinks the scored set ~n_centroids/nprobe-fold; every stage
    (quantized assignment, probe-cell ranking, cosine-ppm rescoring) is
    exact integer arithmetic, so the query has a full SQL oracle even
    though recall < 1 by construction."""
    cents = ivf_train(emb, n_centroids)
    qc = quantized_centroids(cents)
    cells = ivf_assign(emb, centroids=cents)
    # rank cells per probe: a bounded collect (len(probe_ids) rows), then
    # stable argsort of integer centroid distances — the IVF probe schedule
    probe_rows = (emb.filter(F.col("vec_id").isin(probe_ids))
                  .select("vec_id", "embedding").collect())
    pmat = np.floor(np.array([list(r.embedding) for r in probe_rows],
                             dtype=np.float64)
                    * NEARDUP_SCALE + 0.5).astype(np.int64)
    d2 = -2 * (pmat @ qc.T) + (qc * qc).sum(axis=1)[None, :]
    nearest = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    pairs = [(int(r.vec_id), int(c))
             for r, cs in zip(probe_rows, nearest) for c in cs]
    cand_cells = emb.sparkSession.createDataFrame(
        pairs, "probe_id bigint, cell int")
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    qcells = cells.select("vec_id", F.col("ivf_cell").alias("cell"),
                          qcol.alias("qe")) \
        .withColumn("n2", _int_dot("qe", "qe"))
    probes = (qcells.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("qe").alias("qp"), F.col("n2").alias("nb2")))
    cand_cells = cand_cells.join(probes, "probe_id")
    cand = (qcells.join(F.broadcast(cand_cells), "cell")
            .filter(F.col("vec_id") != F.col("probe_id")))
    scored = cand.select("probe_id", "vec_id",
                         _int_dot("qe", "qp").alias("dot"),
                         F.col("n2").alias("na2"), "nb2")
    return _rank_cosine(scored, k)


def topk_cosine_lsh(emb: DataFrame, probe_ids: list[int], k: int = 10,
                    n_planes: "int | None" = 6, dim: int = 64,
                    seed: int = 7) -> DataFrame:
    """Scale path: candidates share the probe's LSH bucket (integer
    sign-bit planes); rescoring is the exact integer cosine-ppm score, so
    the bucket join + rescoring pipeline has a full SQL oracle.
    ``n_planes=None`` scales planes with the corpus (auto_n_planes)."""
    n_planes = _resolve_n_planes(emb, n_planes)
    planes = quantized_planes(dim, n_planes, seed)
    qcol = F.transform(F.col("embedding"), lambda x: F.floor(
        x.cast("double") * NEARDUP_SCALE + F.lit(0.5)).cast("long"))
    b = emb.select("vec_id", qcol.alias("qe")) \
        .withColumn("bucket", _int_bucket("qe", planes)) \
        .withColumn("n2", _int_dot("qe", "qe"))
    probes = (b.filter(F.col("vec_id").isin(probe_ids))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("bucket").alias("pbucket"),
                      F.col("qe").alias("qp"), F.col("n2").alias("nb2")))
    cand = (b.join(F.broadcast(probes),
                   F.col("bucket") == F.col("pbucket"))
            .filter(F.col("vec_id") != F.col("probe_id")))
    scored = cand.select("probe_id", "vec_id",
                         _int_dot("qe", "qp").alias("dot"),
                         F.col("n2").alias("na2"), "nb2")
    return _rank_cosine(scored, k)
