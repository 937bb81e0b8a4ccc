"""End-to-end training-data document pipeline: the standard corpus
cleaning ladder composed from this repo's operators, in the order the
implementation applies them —

  1. exact dedup            (operators.dedup.exact_dedup_ids)
  2. near-dup dedup         (operators.dedup.minhash_lsh_dedup)
  3. quality + repetition filters
                            (textstats.quality_score / dup_*_frac columns)
  4. deterministic split    (sampling.split_assign)
  5. eval decontamination   (sampling.contamination_flags, train side)
  6. PII scrubbing          (textstats.pii_scrub, both outputs)

Decontamination must follow the split (it needs the eval set) and PII
scrubbing runs last so counts reflect what ships.  Construction is NOT
free: the minhash stage checkpoints its signatures (two eager jobs) at
call time; ``scored`` is also checkpointed, so the train/eval outputs
and the quality/repetition drop branches share the dedup + scoring
prefix (the exact/near drop attributions still re-run their cheap
anti-joins; everything downstream of the returned frames stays lazy).  Shuffle inventory at scale: one
hash-window per dedup key, the banded minhash self-join, and a broadcast
semi-join for decontamination — the quality/repetition metrics are plain
columns (no join), nothing is quadratic, and nothing is collected to the
driver but stat counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ie_spark.operators.dedup import exact_dedup_ids, minhash_lsh_dedup
from ie_spark.operators.sampling import contamination_flags, split_assign
from ie_spark.operators.textstats import (
    dup_2gram_frac,
    pii_scrub,
    quality_score,
)


def clean_documents(docs: DataFrame,
                    min_quality: float = 0.15,
                    max_dup_2gram: float = 0.9,
                    near_dup_threshold: float = 0.8,
                    eval_rate: float = 0.05,
                    decontaminate: bool = True,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> dict[str, DataFrame]:
    """→ {'train': df, 'eval': df, 'dropped': df}.

    ``dropped`` carries a per-stage ``drop_reason`` ('exact_dup' |
    'near_dup' | 'quality' | 'repetition' | 'contaminated') and the
    three outputs partition the input: every input id appears in
    exactly one of train / eval / dropped.
    """
    base = docs.select(id_col, text_col)

    exact = exact_dedup_ids(base, id_col=id_col, text_col=text_col)
    d1 = base.join(exact, id_col, "left_semi")
    near = minhash_lsh_dedup(d1, threshold=near_dup_threshold,
                             id_col=id_col, text_col=text_col)
    d2 = d1.join(near.select(id_col), id_col, "left_semi")

    # checkpointed: kept/split AND two drop-attribution branches read it
    scored = (d2.withColumn("_q", quality_score(text_col))
              .withColumn("_rep", dup_2gram_frac(text_col))
              .localCheckpoint())
    kept = (scored.filter((F.col("_q") >= min_quality)
                          & (F.col("_rep") <= max_dup_2gram))
            .select(id_col, text_col))

    split = split_assign(kept, eval_rate=eval_rate, id_col=id_col)
    ev = split.filter(F.col("split") == "eval").select(id_col, text_col)
    tr = split.filter(F.col("split") == "train").select(id_col, text_col)
    dirty = None
    if decontaminate:
        dirty = contamination_flags(tr, ev, id_col=id_col,
                                    text_col=text_col).select(id_col)
        tr = tr.join(dirty, id_col, "left_anti")

    train = pii_scrub(tr, id_col=id_col, text_col=text_col) \
        .select(id_col, F.col("scrubbed").alias(text_col),
                "n_emails", "n_ipv4", "n_phones")
    evald = pii_scrub(ev, id_col=id_col, text_col=text_col) \
        .select(id_col, F.col("scrubbed").alias(text_col),
                "n_emails", "n_ipv4", "n_phones")

    # per-stage drop attribution; the union covers every non-surviving
    # id exactly once (stages are nested subsets), INCLUDING docs
    # removed by decontamination — they must not silently vanish
    def _ids(df, reason):
        return df.select(id_col).withColumn("drop_reason", F.lit(reason))

    dropped = (
        _ids(base.join(d1, id_col, "left_anti"), "exact_dup")
        .unionByName(_ids(d1.join(d2, id_col, "left_anti"), "near_dup"))
        .unionByName(_ids(scored.filter(F.col("_q") < min_quality),
                          "quality"))
        .unionByName(_ids(scored.filter(
            (F.col("_q") >= min_quality)
            & (F.col("_rep") > max_dup_2gram)), "repetition")))
    if dirty is not None:
        dropped = dropped.unionByName(_ids(dirty, "contaminated"))
    return {"train": train, "eval": evald, "dropped": dropped}
