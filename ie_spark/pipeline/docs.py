"""End-to-end training-data document pipeline: the standard corpus
cleaning ladder composed from this repo's operators, in the order a
100 TB pre-training run applies them —

  1. exact dedup            (operators.dedup.exact_dedup_ids)
  2. near-dup dedup         (operators.dedup.minhash_lsh_dedup)
  3. quality + repetition filters
                            (textstats.document_stats / repetition_stats)
  4. PII scrubbing          (textstats.pii_scrub)
  5. eval decontamination   (sampling.contamination_flags)
  6. deterministic split    (sampling.split_assign)

Every stage is a DataFrame transformation; the whole ladder is one
lazily-composed plan per output (train/eval parquet + a stats line).
Shuffle inventory at scale: one hash-window per dedup key, the banded
minhash self-join, and a broadcast semi-join for decontamination —
nothing quadratic, nothing collected to the driver but the stat counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ie_spark.operators.dedup import exact_dedup_ids, minhash_lsh_dedup
from ie_spark.operators.sampling import contamination_flags, split_assign
from ie_spark.operators.textstats import (
    pii_scrub,
    quality_score,
    repetition_stats,
)


def clean_documents(docs: DataFrame,
                    min_quality: float = 0.15,
                    max_dup_2gram: float = 0.9,
                    near_dup_threshold: float = 0.8,
                    eval_rate: float = 0.05,
                    decontaminate: bool = True,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> dict[str, DataFrame]:
    """→ {'train': df, 'eval': df, 'dropped': df} with a ``drop_reason``
    column on the dropped side ('exact_dup' | 'near_dup' | 'quality' |
    'repetition' | 'contaminated')."""
    base = docs.select(id_col, text_col)

    exact = exact_dedup_ids(base, id_col=id_col, text_col=text_col)
    d1 = base.join(exact, id_col, "left_semi")
    near = minhash_lsh_dedup(d1, threshold=near_dup_threshold,
                             id_col=id_col, text_col=text_col)
    d2 = d1.join(near.select(id_col), id_col, "left_semi")

    scored = (d2.withColumn("_q", quality_score(text_col))
              .join(repetition_stats(d2, id_col=id_col,
                                     text_col=text_col), id_col))
    kept = (scored.filter((F.col("_q") >= min_quality)
                          & (F.col("dup_2gram_frac") <= max_dup_2gram))
            .select(id_col, text_col))

    split = split_assign(kept, eval_rate=eval_rate, id_col=id_col)
    ev = split.filter(F.col("split") == "eval").select(id_col, text_col)
    tr = split.filter(F.col("split") == "train").select(id_col, text_col)
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

    survivors = split.select(id_col)
    dropped = (base.join(survivors, id_col, "left_anti")
               .withColumn("drop_reason", F.lit("filtered"))
               .select(id_col, "drop_reason"))
    return {"train": train, "eval": evald, "dropped": dropped}
