"""Optional SymSpell-style spell normalization pre-pass (reference C14,
``kb/spell.py:121-430``).

The reference ships a SymSpell corrector that its main extraction path
never calls (sanctioned descope in rounds 1-3); a transcript pipeline
wants it as an *opt-in* pre-pass — chat turns carry typos newswire does
not.  This is the delete-index variant of the reference's design:

  index build   every dictionary word registers its distance-1
                deletions (SymSpell precompute, ``kb/spell.py`` SymSpell
                ``create_dictionary_entry``); the dictionary is this
                repo's own frozen lexicon (public word lists)
  lookup        a token matches via (token ∈ dict) / (token-deletes ∈
                dict) / (token ∈ delete-index) / (token-deletes ∈
                delete-index) — covering insertion, deletion,
                substitution and transposition at edit distance 1
  verify+rank   candidates filtered by true Damerau-Levenshtein ≤ 1 and
                ranked (distance, word) for determinism

Spark-side the corrector runs as ONE Arrow-batched pandas UDF with the
index shipped via ``SparkContext.broadcast`` — a few-hundred-KB
read-only dict against 10^12 turns is the canonical broadcast dimension.
OFF by default everywhere: no oracled query, golden test, or P/R gate
runs through it (the reference keeps it out of its main path too).
"""

from __future__ import annotations

from functools import lru_cache

from ie_spark.textproc.lexicon import (
    ADVERBS,
    AUXILIARIES,
    COMMON_ADJECTIVES,
    COMMON_NOUNS,
    COMMON_VERBS,
    CONJUNCTIONS,
    DETERMINERS,
    IRREGULAR_VERBS,
    MODALS,
    PREPOSITIONS,
    PRONOUNS,
)


def _vocabulary() -> frozenset:
    vocab = set()
    for ws in (COMMON_NOUNS, COMMON_VERBS, COMMON_ADJECTIVES, ADVERBS,
               AUXILIARIES, CONJUNCTIONS, DETERMINERS, MODALS,
               PREPOSITIONS):
        vocab.update(ws)
    vocab.update(IRREGULAR_VERBS.keys())
    vocab.update(PRONOUNS.keys())
    # inflections: corrected tokens must cover surface forms, not just
    # lemmas ('reviewd' → 'reviewed', not 'review')
    for v in list(COMMON_VERBS) + list(COMMON_NOUNS):
        vocab.add(v + "s")
        if v.endswith("e"):
            vocab.add(v + "d")
            vocab.add(v[:-1] + "ing")
        else:
            vocab.add(v + "ed")
            vocab.add(v + "ing")
    return frozenset(w for w in vocab if w.isalpha())


def _deletes1(w: str) -> set:
    return {w[:i] + w[i + 1:] for i in range(len(w))}


@lru_cache(maxsize=1)
def build_spell_index() -> tuple:
    """→ (vocab frozenset, delete-index dict[str, tuple[str, ...]]).
    Cached: built once per process, ~100 k entries."""
    vocab = _vocabulary()
    index: dict[str, list[str]] = {}
    for w in vocab:
        if len(w) < 4:
            continue  # short words: too many false neighbours
        for d in _deletes1(w):
            index.setdefault(d, []).append(w)
    return vocab, {k: tuple(sorted(v)) for k, v in index.items()}


def _dl1(a: str, b: str) -> bool:
    """True iff Damerau-Levenshtein distance ≤ 1 (reference
    dameraulevenshtein, kb/spell.py:121-170, specialised to the ≤1
    decision)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if la == lb:
        # substitution or adjacent transposition
        diffs = [i for i in range(la) if a[i] != b[i]]
        if len(diffs) == 1:
            return True
        return (len(diffs) == 2 and diffs[1] == diffs[0] + 1
                and a[diffs[0]] == b[diffs[1]] and a[diffs[1]] == b[diffs[0]])
    # one insertion in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def correct_token(tok: str, vocab: frozenset, index: dict) -> str:
    """One token → corrected token (case-preserving); unknown words with
    no distance-1 dictionary neighbour pass through unchanged —
    propernames must never be 'corrected'."""
    if tok[:1].isupper():
        return tok  # propername protection: never "correct" a name
    lw = tok
    if len(lw) < 4 or not lw.isalpha() or lw in vocab:
        return tok
    cands: set[str] = set()
    dels = _deletes1(lw)
    cands.update(d for d in dels if d in vocab)          # extra char
    cands.update(index.get(lw, ()))                       # missing char
    for d in dels:                                        # sub/transpose
        cands.update(index.get(d, ()))
    cands = {c for c in cands if _dl1(lw, c)}
    if not cands:
        return tok

    def is_subseq(s, t):
        it = iter(t)
        return all(ch in it for ch in s)

    # typo model: a dropped character ('reviewd') is likelier than a
    # substitution, so candidates containing the token as a subsequence
    # rank first ('reviewed' over 'reviews'); then shortest edit, then
    # lexicographic for determinism
    return min(cands, key=lambda c: (not is_subseq(lw, c),
                                     abs(len(c) - len(lw)), c))


def normalize_text(text: str, vocab: frozenset, index: dict) -> str:
    if not text:
        return text
    out = []
    for t in text.split():
        core = t.rstrip(".,!?;:")
        tail = t[len(core):]
        out.append(correct_token(core, vocab, index) + tail)
    return " ".join(out)


def with_spell_normalized(transcripts, text_col: str = "text"):
    """Transcript frame → same frame with ``text_col`` spell-normalized.

    One Arrow-batched pandas UDF; the delete index rides a Spark
    broadcast variable (built once on the driver, shipped once per
    executor — never per task/row)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast(build_spell_index())

    def fix(col):
        vocab, index = bc.value
        return col.map(lambda t: normalize_text(t, vocab, index))

    fix_udf = pandas_udf(fix, "string", PandasUDFType.SCALAR)
    return transcripts.withColumn(text_col, fix_udf(F.col(text_col)))
