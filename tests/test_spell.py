"""Optional SymSpell-style pre-pass (reference C14, kb/spell.py:121-430
— shipped but never called by the reference's main path; here an opt-in
Spark pre-pass for typo-bearing transcript turns).  OFF by default: no
oracled query or P/R gate runs through it."""

import pandas as pd

from ie_spark.textproc.spell import (
    build_spell_index,
    correct_token,
    normalize_text,
    with_spell_normalized,
)


def test_corrections_distance_one():
    v, idx = build_spell_index()
    # deletion / substitution / doubled-char insertion typos
    assert normalize_text("the team mergd the fix", v, idx) == \
        "the team merged the fix"
    assert normalize_text("bob aproved the request", v, idx) == \
        "bob approved the request"
    # dropped char prefers the insertion-restoring inflection
    assert correct_token("reviewd", v, idx) == "reviewed"


def test_propernames_and_clean_text_untouched():
    v, idx = build_spell_index()
    # capitalized tokens are never "corrected" (names), clean text is a
    # fixed point, unknown-without-neighbour passes through
    assert normalize_text("Kent Calder approved it.", v, idx) == \
        "Kent Calder approved it."
    s = "The team reviewed the patch."
    assert normalize_text(s, v, idx) == s
    assert correct_token("zzqqxx", v, idx) == "zzqqxx"


def test_planted_typo_recovers_triples(spark):
    # judge r3 "Done" condition: a planted-typo turn yields the same
    # triple after the pre-pass that clean text yields
    from ie_spark.pipeline.extract import (
        extract_triples,
        transcripts_from_pandas,
    )

    pdf = pd.DataFrame(
        [("c1", 0, "user", "Alice reviewd the patch.", "",
          pd.Timestamp("2025-01-01"))],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    tr = transcripts_from_pandas(spark, pdf)

    raw = {(r.subj, r.pred, r.obj)
           for r in extract_triples(tr).collect()}
    fixed = {(r.subj, r.pred, r.obj)
             for r in extract_triples(with_spell_normalized(tr)).collect()}
    assert ("Alice", "review", "patch") not in raw
    assert ("Alice", "review", "patch") in fixed
