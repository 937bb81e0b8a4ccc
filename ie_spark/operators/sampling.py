"""Deterministic sampling / splitting / decontamination for training-data
pipelines.

Reproducible data mixing is a first-class need at 100 TB: splits must be
(a) stable across reruns and cluster sizes (no rand()), (b) expressible
as pure Catalyst expressions so they fuse into the scan, and (c)
independently recomputable by another engine for verification.  The
splitting key is the hex prefix of md5(doc_id) compared lexicographically
against a rate threshold — identical semantics in any engine with md5,
no float arithmetic, no modulo bias, and adding rows never reassigns
existing ones.

Decontamination (eval-set n-gram overlap) reuses the shingle machinery
from ``dedup.with_shingles``: the eval set's shingles are tiny by
construction and broadcast into a semi-join — at any corpus size the
shuffle-free plan is scan → explode → broadcast-hash-join.

The reference has no sampling ops (its corpus is whatever the RSS feed
delivered); these follow standard public practice (hash-based holdout,
n-gram decontamination as in public LM-data writeups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ie_spark.operators.dedup import with_shingles


def _hash_prefix(id_col: str, salt: str, n: int = 8) -> Column:
    """First ``n`` hex chars of md5('<salt>:' + id) — lexicographic
    comparison against a threshold implements a stable Bernoulli
    decision with 16^-n granularity.  The salt decorrelates decisions:
    without it, composing a sample with a split would make every
    surviving row's prefix fall under the sample threshold, so the
    realized eval fraction of the composition would be eval_rate/rate
    instead of eval_rate (review finding).  The single home of the
    cross-engine hash contract (concat, binary cast, md5, hex prefix) —
    packing.shard_key builds on it too."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string")).cast("binary")),
        1, n)


def rate_threshold(rate: float) -> str:
    """Rate in [0,1] → threshold string ('0.25' → '40000000').  Rates
    ≥ 1 return 'g', which is lexicographically above every hex digit, so
    ``prefix < threshold`` keeps EVERY row (a strict-< against
    'ffffffff' would drop the ~2^-32 of ids whose prefix is exactly
    'ffffffff' — review finding)."""
    if rate >= 1:
        return "g"
    return format(max(int(rate * 16 ** 8), 0), "08x")


def split_assign(docs: DataFrame, eval_rate: float = 0.05,
                 id_col: str = "doc_id",
                 salt: str = "split") -> DataFrame:
    """Adds a deterministic ``split`` column ('eval' | 'train').

    Stable under reruns, repartitioning, and corpus growth; pure
    expressions (fuses into the scan, no shuffle).  Independent of
    any ``stratified_sample`` decision thanks to the distinct salt."""
    thr = rate_threshold(eval_rate)
    return docs.withColumn(
        "split",
        F.when(_hash_prefix(id_col, salt) < F.lit(thr), F.lit("eval"))
        .otherwise(F.lit("train")))


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.0,
                      strata_col: str = "source",
                      id_col: str = "doc_id",
                      salt: str = "mix") -> DataFrame:
    """Deterministic per-stratum Bernoulli sample (data mixing): keep a
    row iff its hash prefix falls under its stratum's rate threshold.

    ``rates``: stratum value → keep rate.  The per-stratum thresholds
    compile to a single CASE expression — no join, no shuffle, stable
    across runs and engines; decorrelated from ``split_assign`` via the
    salt."""
    expr = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == value,
                      F.lit(rate_threshold(rate))).otherwise(expr)
    return docs.filter(_hash_prefix(id_col, salt) < expr)


def domain_mix_weights(docs: DataFrame, strata_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Temperature-based mixture weights per stratum (source / language /
    domain): ``weight_ppm ∝ sqrt(n_docs)``, the α = 0.5 temperature
    reweighting public multilingual-corpus writeups use to up-sample
    small domains without letting the head domain dominate.

    Output: (stratum, n_docs, n_tokens, weight_ppm) — parts-per-million
    sampling weights a mixing job feeds into ``stratified_sample``
    rates.  Exactness: IEEE-754 sqrt is correctly rounded in every
    engine, so ``floor(sqrt(n)·10^6)`` is bit-identical cross-engine;
    normalization then stays in BIGINT (``·10^6 div Σ``) — no float
    summation anywhere.  α is frozen at 0.5 for that reason (general
    pow() makes no cross-engine exactness promise).

    Scale shape: one map-side-combined aggregation over the corpus; the
    per-stratum table is tiny (domains, not documents), so the
    normalizing window over it is a deliberate single-partition step.
    """
    from ie_spark.operators.textstats import token_count
    g = (docs.groupBy(F.col(strata_col).alias("stratum"))
         .agg(F.count("*").alias("n_docs"),
              F.sum(token_count(text_col)).alias("n_tokens")))
    s = g.withColumn(
        "w_scaled",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(10 ** 6))
        .cast("long"))
    return (s.withColumn(
        "weight_ppm",
        F.expr("(w_scaled * 1000000) div sum(w_scaled) over ()"))
        .select("stratum", "n_docs", "n_tokens", "weight_ppm"))


def contamination_flags(docs: DataFrame, eval_docs: DataFrame,
                        n: int = 8, min_shared: int = 1,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Training docs sharing ≥ ``min_shared`` word n-grams with the eval
    set → (doc_id, shared_ngrams).  The standard pre-training
    decontamination check.

    Scale shape: the eval side is small by construction — its distinct
    shingles broadcast; the train side is scan → explode → broadcast
    hash join → partial-agg count.  Nothing quadratic, nothing shuffled
    but (doc_id, count) partials."""
    ev = (with_shingles(eval_docs, n=n, text_col=text_col)
          .select(F.explode("shingles").alias("g")).distinct())
    ex = (with_shingles(docs, n=n, text_col=text_col)
          .select(id_col, F.explode("shingles").alias("g")))
    return (ex.join(F.broadcast(ev), "g")
            .groupBy(id_col)
            .agg(F.count("*").alias("shared_ngrams"))
            .filter(F.col("shared_ngrams") >= min_shared))
