"""Text analysis operators over the ``documents`` table — all pure
DataFrame expressions (JVM-side, codegen'd; no UDFs), each deterministic so
a DuckDB oracle can replicate the formula exactly.

- token counting: whitespace tokens + a BPE-ish subword estimate
  (ceil(chars/4) per word capped by length — a standard proxy).
- quality scoring: length/word-length/stopword-ratio features.
- language-ID: stopword-marker n-gram heuristic (the testdata's text is
  synthetic, so this is a feature extractor with a deterministic formula,
  not a trained classifier).
- fingerprinting: md5 content fingerprint + first-k-words prefix hash
  (rolling-hash analog over the word stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to")
LANG_MARKERS = {"en": " the ", "de": " der ", "fr": " le ", "es": " el ",
                "zh": " de "}


def _words(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword count estimate: each word
    contributes ceil(len/4) subwords (min 1)."""
    words = _words(text_col)
    subwords = F.aggregate(
        F.transform(words, lambda w: F.greatest(
            F.ceil(F.length(w) / F.lit(4.0)).cast("int"), F.lit(1))),
        F.lit(0), lambda acc, x: acc + x)
    return docs.select(
        id_col,
        F.size(words).cast("int").alias("n_words"),
        subwords.cast("int").alias("n_subwords"))


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality features; the score is an integer in 0..100
    (scaled rationals, so the oracle matches exactly — no float rounding)."""
    words = _words(text_col)
    n_words = F.size(words)
    n_chars = F.length(text_col)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    max_word = F.array_max(F.transform(words, lambda w: F.length(w)))
    # floor() (not cast) so the DuckDB oracle matches exactly: Spark's
    # double->int cast truncates while DuckDB's rounds
    stop_ratio_pct = F.floor(F.lit(100) * stop_hits / n_words).cast("int")
    return docs.select(
        id_col,
        n_chars.cast("int").alias("n_chars"),
        n_words.cast("int").alias("n_words"),
        max_word.cast("int").alias("max_word_len"),
        stop_hits.cast("int").alias("stopword_hits"),
        stop_ratio_pct.alias("stopword_pct"))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-based language guess: first language whose marker n-gram
    appears in the padded text; 'und' otherwise."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    pred = F.lit("und")
    for lang, marker in reversed(LANG_MARKERS.items()):
        pred = F.when(padded.contains(marker), F.lit(lang)).otherwise(pred)
    return docs.select(id_col, pred.alias("lang_pred"))


def shingle_hashes(text_col: str = "text"):
    """md5 per 3-word shingle ('|'-joined window), as a column expression —
    the shared shingle grammar for fingerprints and decontamination.
    Built with shifted-slice zips: pure JVM expressions, no UDF."""
    words = _words(text_col)
    # clamp: docs of <3 words have no 3-shingles (slice len must be >= 0)
    n = F.greatest(F.size(words) - 2, F.lit(0))
    s1 = F.slice(words, 1, n)
    s2 = F.slice(words, 2, n)
    s3 = F.slice(words, 3, n)
    pairs = F.zip_with(s1, s2, lambda a, b: F.concat(a, F.lit("|"), b))
    return F.zip_with(pairs, s3,
                      lambda p, c: F.md5(F.concat(p, F.lit("|"), c)))


def shingle_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 4) -> DataFrame:
    """Rolling-hash (winnowing-style) document fingerprints: hash every
    3-word shingle, keep the minimum (classic winnowing selects window
    minima; the global minimum plus the k smallest form a robust
    fingerprint set stable under local edits)."""
    shingles = shingle_hashes(text_col)
    # fp_set is joined to a scalar so the result is canonicalizable by the
    # sort-based correctness harness (arrays are unsortable in pandas)
    return docs.select(
        id_col,
        F.array_min(shingles).alias("fp_min"),
        F.array_join(F.slice(F.sort_array(shingles), 1, k), ",")
        .alias("fp_set"))


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", prefix_words: int = 8) -> DataFrame:
    """Content fingerprints: full-text md5 + md5 of the first k words
    (prefix fingerprint, robust to tail edits)."""
    words = _words(text_col)
    prefix = F.array_join(F.slice(words, 1, prefix_words), " ")
    return docs.select(
        id_col,
        F.md5(F.col(text_col)).alias("fp_full"),
        F.md5(prefix).alias("fp_prefix"))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style intra-document repetition gates (Rae et al. 2021's
    public repetition filters, §A1.1): duplicate-word fraction,
    duplicate-3-gram fraction, and the top single word's share of the
    doc — the standard signals for cutting boilerplate / degenerate
    pages from training data. All pure row-local array HOFs (zero
    shuffle), reported as INTEGER parts-per-million (truncating
    division) so DuckDB reproduces every value exactly."""
    # Every signal computes inside ONE bound lambda chain: higher-order
    # lambdas are excluded from Spark's subexpression elimination, so a
    # lambda body referencing the raw split()/3-gram expressions would
    # recompute them per element and per output column (the same O(n^2)
    # trap the winnow fingerprints hit; measured 6.0 s -> 0.35 s at
    # sf0.1). `ws` binds the word array once, `g3` the 3-gram array once;
    # the struct projects once and the ppm math reads struct fields.
    # Guard preserved: Spark's sequence(1, stop) DESCENDS when stop < 1
    # (invalid slice start 0), so sub-3-word docs take the empty branch.
    g3_body = ("IF(size(ws) >= 3, "
               "transform(sequence(1, size(ws) - 2), "
               "i -> array_join(slice(ws, i, 3), ' ')), "
               "array())")
    stats = (f"transform(array(split({text_col}, ' ')), ws -> "
             f"transform(array({g3_body}), g3 -> named_struct("
             "'n_words', cast(size(ws) as bigint), "
             "'dup_w', cast(size(ws) - size(array_distinct(ws)) as bigint), "
             "'g_n', cast(size(g3) as bigint), "
             "'g_dup', cast(size(g3) - size(array_distinct(g3)) as bigint), "
             f"'top', {_top_run_count_sql('sort_array(ws)')}"
             "))[0])[0]")

    def _ppm(num_sql: str, den_sql: str) -> F.Column:
        return F.expr(f"CASE WHEN {den_sql} > 0 THEN "
                      f"(CAST(1000000 AS BIGINT) * ({num_sql})) "
                      f"div ({den_sql}) ELSE 0 END")

    return docs.select(id_col, F.expr(stats).alias("__r")).select(
        id_col,
        F.col("__r.n_words").alias("n_words"),
        _ppm("__r.dup_w", "__r.n_words").alias("dup_word_ppm"),
        _ppm("__r.g_dup", "__r.g_n").alias("dup_3gram_ppm"),
        _ppm("__r.top", "__r.n_words").alias("top_word_ppm"))


def _top_run_count_sql(sorted_arr_sql: str) -> str:
    """Max multiplicity of any element == longest equal-adjacent run in the
    sorted array, via one aggregate() fold — O(n log n) per row. The
    previous form (count each distinct word's occurrences with a nested
    filter) was O(distinct * words) per row and dominated the whole
    repetition_stats pass (measured 6.0 s -> 0.9 s at sf0.1). Value is
    identical (the oracle pins it): an empty array folds to 0, matching
    the old coalesce(array_max(...), 0)."""
    return (f"aggregate({sorted_arr_sql}, "
            "named_struct('prev', cast(null as string), "
            "'run', cast(0 as bigint), 'best', cast(0 as bigint)), "
            "(a, x) -> named_struct("
            "'prev', x, "
            "'run', IF(x <=> a.prev, a.run + 1, cast(1 as bigint)), "
            "'best', greatest(a.best, "
            "IF(x <=> a.prev, a.run + 1, cast(1 as bigint)))), "
            "a -> a.best)")


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """PII pre-scrub scan (the C4/RefinedWeb-style curation stage):
    per-doc counts of email-shaped, IPv4-shaped, and long-digit-run
    matches, plus the total — the signal a scrub/drop policy consumes.
    Patterns are deliberately simple and dialect-portable (Java regex
    here, RE2 in DuckDB oracles); row-local ``regexp_count``, zero
    shuffle. Counting, not redaction: what to do with a hit (mask, drop
    doc, hash) is an explicit downstream policy."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    digits = r"\b\d{9,}\b"
    n_email = F.regexp_count(F.col(text_col), F.lit(email))
    n_ip = F.regexp_count(F.col(text_col), F.lit(ipv4))
    n_dig = F.regexp_count(F.col(text_col), F.lit(digits))
    return docs.select(
        id_col,
        n_email.cast("long").alias("n_email"),
        n_ip.cast("long").alias("n_ipv4"),
        n_dig.cast("long").alias("n_digit_runs"),
        (n_email + n_ip + n_dig).cast("long").alias("n_pii"))
