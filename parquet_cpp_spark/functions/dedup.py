"""Deduplication operators over the ``documents`` table.

- exact: hash-groupBy on content, keep the smallest doc_id (one shuffle on
  the text hash; at 100 TB group on md5(text), not text, so shuffle keys are
  fixed-width).
- MinHash-LSH: per-doc signatures = min over word tokens of
  md5(word || ':' || seed). Using md5 *strings* keeps every stage exactly
  reproducible in ANSI SQL (the DuckDB oracle runs the same expressions) —
  no engine-specific hash. Banding groups docs by (sig_i, sig_j) pairs; docs
  sharing a band bucket are near-dup candidates; the canonical doc per
  bucket is min(doc_id).
- SimHash: 16-bit signature from per-word md5 nibbles, majority vote per
  bit — a row-local fold over the word array (no UDF, no explode).

Scale notes: signature computation is ROW-LOCAL (zero shuffle — plan tests
pin no-Exchange); the only shuffles are on tiny fixed-width keys (md5
strings / band buckets), so the LSH join moves O(docs x bands) small rows
and the candidate-pair space never materializes the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SEEDS = (0, 1, 2, 3)


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Canonical (kept) doc per exact content group."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias(id_col))
            .select(id_col))


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       seeds=DEFAULT_SEEDS) -> DataFrame:
    """One row per doc with columns sig0..sigN: min-over-words of
    md5(word || ':' || seed) — a MinHash over the word set with N
    independent permutations approximated by salted md5.

    Computed ROW-LOCALLY (array_min over a transform of the word array):
    the per-doc min needs no explode + re-aggregate, so the signature stage
    contributes ZERO shuffle — at 100 TB this deletes a full exchange of
    O(words) rows from every MinHash-derived pipeline (the banding joins
    downstream shuffle only O(docs) signature rows)."""
    words = _words(text_col)

    def sig(seed: int):
        # one-arg lambda: a two-arg lambda would be read as (element, index)
        return F.array_min(F.transform(
            words, lambda w: F.md5(F.concat(w, F.lit(f":{seed}")))))

    return docs.select(id_col, *[sig(s).alias(f"sig{i}")
                                 for i, s in enumerate(seeds)])


def minhash_dedup(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", seeds=DEFAULT_SEEDS,
                  bands=((0, 1), (2, 3))) -> DataFrame:
    """LSH banding: docs sharing any band bucket collapse to the bucket's
    min(doc_id); a doc survives iff it is the canonical doc in all its
    bands. Returns surviving doc_ids."""
    sigs = minhash_signatures(docs, text_col, id_col, seeds)
    kept = None
    for i, j in bands:
        bucket = (sigs.groupBy(f"sig{i}", f"sig{j}")
                  .agg(F.min(id_col).alias("keep_id")))
        survived = (sigs.join(bucket, [f"sig{i}", f"sig{j}"])
                    .filter(F.col(id_col) == F.col("keep_id"))
                    .select(id_col))
        kept = survived if kept is None else kept.join(survived, id_col)
    return kept


# LSH band buckets larger than this are skipped for pair generation: a hot
# bucket (near-duplicate-heavy cluster, or an unlucky band) otherwise
# produces O(bucket^2) candidate pairs inside ONE join key — the quadratic
# blowup that kills the job at 100 TB. Skipped buckets are not silent:
# ``neardup_jaccard_dropped_buckets`` enumerates them (same cap rule), and
# the driver runs it as its own oracle-checked query.
DEFAULT_BUCKET_CAP = 32


def _band_buckets(sigs: DataFrame, i: int, j: int, id_col: str,
                  bucket_cap: int):
    """(kept-bucket keys, per-bucket doc count) for band (sig_i, sig_j).
    Buckets of 1 generate no pairs; buckets above the cap are dropped."""
    counts = sigs.groupBy(F.col(f"sig{i}").alias("bi"),
                          F.col(f"sig{j}").alias("bj")) \
        .agg(F.count(F.lit(1)).alias("n_docs"))
    return counts.filter((F.col("n_docs") >= 2) &
                         (F.col("n_docs") <= bucket_cap))


def neardup_jaccard(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", seeds=DEFAULT_SEEDS,
                    bands=((0, 1), (2, 3)),
                    min_jaccard_pct: int = 30,
                    bucket_cap: int = DEFAULT_BUCKET_CAP) -> DataFrame:
    """n-gram (word-set) Jaccard near-dup pairs, gated by MinHash-LSH
    candidates: only pairs sharing a band bucket of <= ``bucket_cap`` docs
    are compared (per-key join fan-out is bounded by cap^2 rows — the
    property that keeps the plan alive on skewed corpora), then the exact
    word-set Jaccard (integer percentage, floor) filters them.

    RECALL CONTRACT (changed in round 4, when ``bucket_cap`` gained its
    default of 32): pairs whose ONLY shared band bucket holds more than
    ``bucket_cap`` docs are NOT returned — and those hot buckets are
    precisely the near-duplicate-dense clusters. Callers must pair this
    query with :func:`neardup_jaccard_dropped_buckets` (same cap rule) and
    either re-shingle, add bands, or exact-compare the enumerated buckets
    out of band. Pass ``bucket_cap=None`` for the uncapped pre-round-4
    behavior (full recall, unbounded per-key fan-out — test scales only).
    Returns (a_id, b_id, jaccard_pct)."""
    if bucket_cap is None:
        bucket_cap = 1 << 62  # uncapped: every >=2-doc bucket generates pairs
    sigs = minhash_signatures(docs, text_col, id_col, seeds)
    words = docs.select(
        F.col(id_col),
        F.array_distinct(_words(text_col)).alias("wset"))
    cand = None
    for i, j in bands:
        ok = _band_buckets(sigs, i, j, id_col, bucket_cap).select("bi", "bj")
        a = sigs.select(F.col(id_col).alias("a_id"),
                        F.col(f"sig{i}").alias("bi"),
                        F.col(f"sig{j}").alias("bj"))
        b = sigs.select(F.col(id_col).alias("b_id"),
                        F.col(f"sig{i}").alias("bi"),
                        F.col(f"sig{j}").alias("bj"))
        p = (a.join(ok, ["bi", "bj"])
             .join(b, ["bi", "bj"])
             .filter(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id"))
        cand = p if cand is None else cand.union(p)
    cand = cand.distinct()
    wa = words.select(F.col(id_col).alias("a_id"), F.col("wset").alias("wa"))
    wb = words.select(F.col(id_col).alias("b_id"), F.col("wset").alias("wb"))
    joined = cand.join(wa, "a_id").join(wb, "b_id")
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size("wa") + F.size("wb") - inter
    jac = F.floor(F.lit(100) * inter / union).cast("int")
    return (joined.select("a_id", "b_id", jac.alias("jaccard_pct"))
            .filter(F.col("jaccard_pct") >= min_jaccard_pct))


def neardup_jaccard_dropped_buckets(docs: DataFrame, text_col: str = "text",
                                    id_col: str = "doc_id",
                                    seeds=DEFAULT_SEEDS,
                                    bands=((0, 1), (2, 3)),
                                    bucket_cap: int = DEFAULT_BUCKET_CAP) \
        -> DataFrame:
    """Audit companion to :func:`neardup_jaccard`: every LSH band bucket the
    cap rule SKIPPED, as (band, bi, bj, n_docs) — truncation is enumerable,
    not silent. At scale this is the skew report a pipeline operator reads
    before deciding to add bands or re-shingle."""
    if bucket_cap is None:
        bucket_cap = 1 << 62  # mirror neardup_jaccard: uncapped drops nothing
    sigs = minhash_signatures(docs, text_col, id_col, seeds)
    out = None
    for band_no, (i, j) in enumerate(bands):
        counts = sigs.groupBy(F.col(f"sig{i}").alias("bi"),
                              F.col(f"sig{j}").alias("bj")) \
            .agg(F.count(F.lit(1)).alias("n_docs"))
        dropped = counts.filter(F.col("n_docs") > bucket_cap) \
            .select(F.lit(band_no).alias("band"), "bi", "bj", "n_docs")
        out = dropped if out is None else out.union(dropped)
    return out


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash signature: bit b of the signature is the majority vote over
    words of bit b of md5(word). Bits come from the md5 hex nibbles —
    conv(substr(md5, pos, 4), 16, 10) gives 16 bits; the vote is
    sign(sum(2*bit - 1)).

    Computed ROW-LOCALLY: one transform hashes each word once, one
    aggregate folds the per-bit vote array, and the signature packs from
    the vote array — zero explode, zero shuffle (the previous explode +
    groupBy shuffled O(words) rows to rebuild what each row already
    holds)."""
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    hashes = F.transform(
        _words(text_col),
        lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long"))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0,
                                    F.lit(1)).otherwise(F.lit(-1))))
    sig = F.aggregate(
        F.zip_with(votes, masks,
                   lambda v, m: F.when(v > 0, m).otherwise(F.lit(0))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return docs.select(id_col, sig.alias("simhash"))


def decontaminate(docs: DataFrame, bench: DataFrame,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  strategy: str = "auto",
                  broadcast_limit: int = 2_000_000) -> DataFrame:
    """Benchmark decontamination: flag training documents that share ANY
    word shingle with a benchmark/eval corpus — the n-gram-collision
    decontamination standard for LLM training sets. Shingles are the
    shared 3-word md5 grammar (functions.text.shingle_hashes), so the
    check is exactly SQL-reproducible.

    Returns (doc_id, n_hits): every contaminated doc with its count of
    colliding shingle positions (the triage signal: 1 hit = likely
    coincidence on a common phrase, hundreds = verbatim inclusion).

    Scale design (100 TB corpus vs a benchmark of ~1e4-1e6 items): the
    benchmark's DISTINCT shingle set is normally small and BROADCAST; the
    corpus side streams through one explode + broadcast hash semi-join;
    the only corpus-wide shuffle is the final per-doc count aggregation
    (partial map-side combine applies). When the eval shingle set
    outgrows broadcast (``strategy='auto'`` counts it — one scan of the
    SMALL side, negligible next to the corpus — and switches past
    ``broadcast_limit``; or force ``strategy='shuffle'``), both sides
    hash-partition on the shingle instead: the corpus explode streams
    into a shuffled hash join with no executor-memory ceiling, identical
    results (pinned by pytest on both paths)."""
    from .text import shingle_hashes
    sh = shingle_hashes(text_col)
    doc_sh = docs.select(F.col(id_col), F.explode(sh).alias("sh"))
    bench_sh = bench.select(F.explode(sh).alias("sh")).distinct()
    if strategy == "auto":
        # size the eval shingle set with ONE pass of approx_count_distinct
        # (no persist: a cached DataFrame returned to the caller would pin
        # executor storage for the session's lifetime). The ±2% estimate
        # only picks the JOIN STRATEGY — both paths produce identical
        # results (pinned by pytest), so an approximate threshold is safe.
        est = bench.select(F.explode(sh).alias("sh")).agg(
            F.approx_count_distinct("sh").alias("n")).collect()[0].n
        strategy = "broadcast" if est <= broadcast_limit else "shuffle"
    if strategy == "broadcast":
        joined = doc_sh.join(F.broadcast(bench_sh), "sh")
    elif strategy == "shuffle":
        # bucket both sides on the shingle: shuffled hash join, eval side
        # build, corpus side stream — the big-eval-corpus path
        joined = doc_sh.join(bench_sh.hint("shuffle_hash"), "sh")
    else:
        raise ValueError(f"unknown strategy {strategy!r} "
                         "(auto | broadcast | shuffle)")
    return (joined.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits")))


def token_span_fingerprints(tokens_col: str = "tokens", k: int = 8,
                            w: int = 4):
    """Winnowed fingerprints of k-TOKEN spans as a column expression:
    hash every k-token shingle of the token stream (md5 over the
    space-joined decimal tokens — the engine's SQL-reproducible hash
    grammar), then keep each w-window's minimum and dedupe (classic
    winnowing: guarantees any shared span of length >= k+w-1 tokens
    yields at least one shared fingerprint, while sampling ~1/w of
    positions). Pure built-in array HOFs — JVM-side, zero shuffle,
    no UDFs. Docs shorter than k tokens produce an empty set."""
    sh = (f"transform(sequence(1, size({tokens_col}) - {k - 1}), "
          f"i -> md5(array_join(transform(slice({tokens_col}, i, {k}), "
          f"x -> cast(x as string)), ' ')))")
    # bind the shingle array ONCE via an outer lambda: referencing the
    # raw `sh` expression from inside the window lambda would recompute
    # the whole O(n) md5 transform per window position — O(n^2) md5s
    # (measured 35 s -> 1.5 s at sf0.1)
    wins = (f"transform(array({sh}), s -> array_distinct("
            f"transform(sequence(1, greatest(size(s) - {w - 1}, 1)), "
            f"j -> array_min(slice(s, j, {w})))))[0]")
    return F.when(F.size(F.col(tokens_col)) >= k,
                  F.expr(wins)).otherwise(F.expr("array()"))


def duplicated_token_spans(docs: DataFrame, tokens_col: str = "tokens",
                           id_col: str = "doc_id", k: int = 8,
                           w: int = 4) -> DataFrame:
    """ExactSubstr-style duplicated-span detection over TOKEN streams
    (the Lee et al. 'Deduplicating Training Data' public recipe, made
    shuffle-bounded by winnowing): fingerprints of k-token spans shared
    VERBATIM by >= 2 documents, with how many docs share each and the
    id range. Scale shape: fingerprinting is row-local (array HOFs, no
    UDFs, sampling ~1/w of span positions), then ONE shuffle on the
    fingerprint for the group-by; the output is a bounded summary per
    duplicated span (no pair fan-out, so no bucket cap is needed —
    downstream span removal joins this back by fingerprint)."""
    fps = token_span_fingerprints(tokens_col, k=k, w=w)
    # (doc, fp) pairs are unique by construction (the fingerprint set is
    # array_distinct per doc), so a plain COUNT equals COUNT(DISTINCT
    # doc) — and costs ONE shuffle instead of the distinct-aggregate's
    # two (pinned by the plan test)
    return (docs.select(F.col(id_col), F.explode(fps).alias("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(id_col).alias("first_doc"),
                 F.max(id_col).alias("last_doc"))
            .filter(F.col("n_docs") >= 2))
