"""Text-analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting.  Everything is a Catalyst expression
(regexp / split / md5 / aggregate) so the operators run inside whole-stage
codegen and are expressible 1:1 in ANSI SQL for the DuckDB oracle.

Whitespace-class note: Java regex \\s contains \\x0b (vertical tab), RE2's
does not.  Every expression operator here whose oracle is frozen at
'\\s+' (or '[^\\w\\s]') splits on the explicit RE2-equivalent classes
RE2_WS / RE2_NONWORD, so both engines tokenize identically on EVERY
input, \\x0b included.  The one remaining divergent tokenizer is the
Python ``.split()`` inside the dedup Arrow pass (see the note at the
split site in dedup.py), which splits on a superset of RE2 \\s — \\x0b,
\\x1c-\\x1f, \\x85, \\xa0 and all Unicode spaces — benign for every
input this corpus generator can produce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# frozen English stopword list (deterministic lang/quality heuristics)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this",
]


# RE2's \s is exactly [ \t\n\f\r]; Java's \s additionally contains \x0b
# (vertical tab).  Operators whose DuckDB oracle is frozen at '\s+' use
# this explicit RE2-equivalent class on the Spark side so both engines
# tokenize identically on EVERY input, not just \x0b-free text (advice
# r05; WS_CLASS — defined with the markup patterns below — serves the
# operators whose oracles spell the class out verbatim, and the two
# constants intentionally differ on \x0b).
RE2_WS = r"[ \t\n\f\r]"
# RE2's [^\w\s] — not-word-and-not-whitespace with RE2's \s (no \x0b)
RE2_NONWORD = r"[^\w \t\n\f\r]"


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, RE2_WS + "+"))).alias("n_tokens")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token count: split on whitespace AND word/punct
    boundaries (a cheap deterministic BPE proxy for budget estimation)."""
    t = F.trim(F.col(text_col))
    pieces = F.split(t, RE2_WS + r"+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)")
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(pieces))


def stopword_ratio(text_col: str = "text") -> Column:
    words = F.split(F.trim(F.lower(F.col(text_col))), RE2_WS + "+")
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return (n_sw / F.greatest(F.size(words), F.lit(1)))


def punct_ratio(text_col: str = "text") -> Column:
    t = F.col(text_col)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, RE2_NONWORD, ""))
    return n_punct / F.greatest(F.length(t), F.lit(1))


def mean_word_len(text_col: str = "text") -> Column:
    words = F.split(F.trim(F.col(text_col)), RE2_WS + "+")
    total = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    return total / F.greatest(F.size(words), F.lit(1))


def quality_score(text_col: str = "text") -> Column:
    """Deterministic [0,1] quality score: rewards reasonable length, word
    length and stopword presence; penalizes punctuation soup.  The exact
    formula is arbitrary but frozen — it exists to rank/filter corpus rows."""
    n = token_count(text_col)
    len_term = F.least(n / F.lit(50.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(text_col) * 4.0, F.lit(1.0))
    wl = mean_word_len(text_col)
    wl_term = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * 3.0, F.lit(1.0))
    return F.round(
        0.3 * len_term + 0.3 * sw_term + 0.2 * wl_term + 0.2 * punct_term, 6)


def lang_id(text_col: str = "text") -> Column:
    """Deterministic language heuristic: 'en' when the English-stopword hit
    rate clears a threshold, 'other' otherwise, 'unk' for blank text.
    (Real corpora would use per-language frozen n-gram tables — same shape,
    more arrays; the operator contract is the point here.)"""
    t = F.trim(F.col(text_col))
    return (F.when(F.length(t) == 0, F.lit("unk"))
            .when(stopword_ratio(text_col) >= 0.08, F.lit("en"))
            .otherwise(F.lit("other")))


# Frozen per-language marker-word tables (top function words — the public
# fastText/langdetect practice at expression scale: real 100 TB corpora
# swap these 15-word lists for larger frozen n-gram tables, same shape).
# Keys are ISO 639-1; keep lists pre-lowered and punctuation-free.
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine",
           "mit", "für", "auf", "ich", "wir", "haben", "sind"],
    "en": ["the", "an", "and", "of", "to", "in", "is", "it", "that",
           "for", "on", "with", "was", "this", "from"],
    "es": ["el", "los", "las", "que", "y", "en", "un", "una", "es",
           "por", "con", "para", "no", "se", "como"],
    "fr": ["le", "les", "et", "est", "une", "des", "du", "dans", "qui",
           "pour", "pas", "vous", "je", "avec", "sur"],
    "it": ["il", "che", "di", "e", "alla", "della", "per", "nel", "non",
           "sono", "del", "si", "questo", "anche", "più"],
    "pt": ["o", "os", "as", "em", "um", "uma", "é", "não", "com",
           "são", "foi", "pelo", "mais", "ele", "também"],
}
# "la" (es/fr/it), "de" (es/fr/pt), "a" (en/pt), "que" (es/fr/pt) are
# deliberately ABSENT from every list: a marker shared across languages
# adds no discrimination and makes the argmax tie-break do the
# classifying, which is fragile.


def _marker_ratio(words: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in markers])
    return (F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
            / F.greatest(F.size(words), F.lit(1)))


def lang_scores(text_col: str = "text") -> dict:
    """Per-language marker-hit ratio columns (whitespace tokens, lowered).
    Pure Catalyst expressions — one pass over the word array per language,
    no shuffle, SQL-expressible 1:1 for the oracle."""
    words = F.split(F.trim(F.lower(F.col(text_col))), RE2_WS + "+")
    return {lang: _marker_ratio(words, mk)
            for lang, mk in sorted(LANG_MARKERS.items())}


def lang_id_multi(text_col: str = "text", threshold: float = 0.12) -> Column:
    """Multilingual language guess: argmax of the per-language marker
    ratios; 'other' when no language clears ``threshold``, 'unk' for blank
    text.  Ties break to the alphabetically-first language code — the
    ratios are exact rationals (int hit count / int word count) computed
    identically by any IEEE engine, so the argmax and tie-break reproduce
    bit-for-bit in the DuckDB oracle."""
    t = F.trim(F.col(text_col))
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    out = (F.when(F.length(t) == 0, F.lit("unk"))
           .when(best < threshold, F.lit("other")))
    for lang in sorted(scores):
        out = out.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("other"))


def fingerprint_md5(text_col: str = "text") -> Column:
    """Whole-document fingerprint: md5 of whitespace-normalized lowercase
    text (the reference's content-hash dedup key semantics,
    marbles/aws/__init__.py:115-136)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))),
                            RE2_WS + "+", " ")
    return F.md5(norm)


def winnow_fingerprint(text_col: str = "text", n: int = 3) -> Column:
    """Rolling-hash document fingerprint: the minimum md5 over word n-gram
    shingles (a 1-fingerprint winnowing sketch — equal for documents sharing
    their minimal shingle, robust to local edits elsewhere).

    Shingles are built with zip_with over shifted slices: collection
    arguments of a higher-order function evaluate ONCE per row, whereas
    referencing the split() expression inside the lambda re-evaluates it
    per element (measured ~10× slower)."""
    from ie_spark.operators.dedup import gram_array
    words = F.split(F.trim(F.lower(F.col(text_col))), RE2_WS + "+")
    k = F.size(words) - (n - 1)
    grams = gram_array(words, n)
    return F.when(k > 0, F.array_min(F.transform(grams, F.md5))).otherwise(
        F.md5(F.trim(F.lower(F.col(text_col)))))


def document_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """One row per doc with the full stat set (the headline text-analysis
    operator)."""
    return docs.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(mean_word_len(text_col), 6).alias("mean_word_len"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_guess"),
        fingerprint_md5(text_col).alias("fingerprint"),
    )


def dup_word_frac(text_col: str = "text") -> Column:
    """Duplicate-word fraction (Gopher-style) as a plain Column — usable
    via withColumn with zero shuffle."""
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(F.length(t) == 0,
                   F.array().cast("array<string>")) \
        .otherwise(F.split(t, RE2_WS + "+"))
    return F.when(F.size(words) > 0,
                  F.round(1.0 - F.size(F.array_distinct(words))
                          / F.size(words), 6)).otherwise(F.lit(0.0)) \
        .alias("dup_word_frac")


def dup_2gram_frac(text_col: str = "text") -> Column:
    """Duplicate-2-gram fraction (Gopher-style) as a plain Column."""
    from ie_spark.operators.dedup import gram_array
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(F.length(t) == 0,
                   F.array().cast("array<string>")) \
        .otherwise(F.split(t, RE2_WS + "+"))
    k = F.greatest(F.size(words) - 1, F.lit(0))
    grams = gram_array(words, 2)   # the k > 0 guard below gates it
    return F.when(k > 0,
                  F.round(1.0 - F.size(F.array_distinct(grams))
                          / k.cast("double"), 6)).otherwise(F.lit(0.0)) \
        .alias("dup_2gram_frac")


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition metrics (the public Gopher-style
    quality rules): duplicate-word fraction and duplicate-2-gram
    fraction.  Pure expressions — array_distinct over the token and
    bigram arrays, no shuffle, whole-stage codegen."""
    return docs.select(id_col, dup_word_frac(text_col),
                       dup_2gram_frac(text_col))


# deliberately lookaround-free so Java regex (Spark) and RE2 (DuckDB)
# agree byte-for-byte
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # structured phone shapes only — a bare run of short digit groups
    # ('scores were 10 20 30 40 50') must NOT redact (review): intl
    # +-prefix, (area) form, ddd-ddd-dddd, d{2,4} dddd dddd, or a
    # standalone 10-11 digit run.  \b is a zero-width ASCII word
    # boundary in BOTH Java regex and RE2 (not lookaround).
    "phone": (r"\+[0-9][0-9()\- ]{7,}[0-9]"
              r"|\([0-9]{3}\)[ \-]?[0-9]{3}[\- ][0-9]{4}"
              r"|\b[0-9]{3}[\- ][0-9]{3}[\- ][0-9]{4}\b"
              r"|\b[0-9]{2,4} [0-9]{4} [0-9]{4}\b"
              r"|\b[0-9]{10,11}\b"),
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redacts emails/phones/IPv4s and counts each kind — the standard
    pre-training PII pass, as chained regexp_replace expressions (order:
    email → ipv4 → phone, so an IP is never half-eaten by the phone
    rule).  Patterns avoid lookaround so any RE2-class engine can
    re-execute them identically for verification."""
    email_n = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(PII_PATTERNS["email"]), F.lit(0)))
    scrub1 = F.regexp_replace(F.col(text_col), PII_PATTERNS["email"],
                              "<EMAIL>")
    ipv4_n = F.size(F.regexp_extract_all(
        scrub1, F.lit(PII_PATTERNS["ipv4"]), F.lit(0)))
    scrub2 = F.regexp_replace(scrub1, PII_PATTERNS["ipv4"], "<IP>")
    phone_n = F.size(F.regexp_extract_all(
        scrub2, F.lit(PII_PATTERNS["phone"]), F.lit(0)))
    scrub3 = F.regexp_replace(scrub2, PII_PATTERNS["phone"], "<PHONE>")
    return docs.select(id_col,
                       scrub3.alias("scrubbed"),
                       email_n.alias("n_emails"),
                       ipv4_n.alias("n_ipv4"),
                       phone_n.alias("n_phones"))


# explicit whitespace class instead of \s: Java regex includes \x0b in
# \s, RE2 does not — spelling the class out keeps the two engines
# byte-identical on every input
WS_CLASS = r"[ \t\n\x0b\f\r]"

# markup-stripping patterns — RE2-compatible (no backreferences, no
# lookaround) so DuckDB re-executes them byte-for-byte with the 'g'
# flag; Spark's regexp_replace is global by default
MARKUP_PATTERNS = {
    # (?is): case-insensitive (real pages use <SCRIPT>/<Style>) and
    # .*? crosses line breaks; non-greedy keeps blocks separate
    "script": r"(?is)<script[^>]*>.*?</script>",
    "style": r"(?is)<style[^>]*>.*?</style>",
    "comment": r"(?s)<!--.*?-->",
    "tag": r"<[^>]+>",
    "url": r"(?i)https?://[^ \t\n\x0b\f\r]+",
}

# entity unescapes run AFTER tag stripping, with &amp; LAST so
# '&amp;lt;' renders the literal '&lt;' (standard single-pass order)
ENTITY_UNESCAPES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)


def markup_strip(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Strip HTML-ish markup from web-scraped text (the standard
    pre-training extraction stage): script/style/comment blocks drop
    with their content, remaining tags become spaces, URLs redact to
    ``<URL>``, common entities unescape, and whitespace runs collapse.
    Pure chained ``regexp_replace``/``replace`` expressions — no
    shuffle, whole-stage codegen, and every pattern re-executes
    identically on an RE2-class engine for verification.  Returns
    ``(id, clean_text, n_tags, n_urls)`` with counts taken before
    their respective removals."""
    stripped = F.regexp_replace(F.col(text_col),
                                MARKUP_PATTERNS["script"], " ")
    stripped = F.regexp_replace(stripped, MARKUP_PATTERNS["style"], " ")
    stripped = F.regexp_replace(stripped, MARKUP_PATTERNS["comment"], " ")
    n_tags = F.size(F.regexp_extract_all(
        stripped, F.lit(MARKUP_PATTERNS["tag"]), F.lit(0)))
    stripped = F.regexp_replace(stripped, MARKUP_PATTERNS["tag"], " ")
    n_urls = F.size(F.regexp_extract_all(
        stripped, F.lit(MARKUP_PATTERNS["url"]), F.lit(0)))
    stripped = F.regexp_replace(stripped, MARKUP_PATTERNS["url"], "<URL>")
    for ent, plain in ENTITY_UNESCAPES:
        stripped = F.replace(stripped, F.lit(ent), F.lit(plain))
    clean = F.trim(F.regexp_replace(stripped, WS_CLASS + "+", " "))
    return docs.select(id_col, clean.alias("clean_text"),
                       n_tags.alias("n_tags"), n_urls.alias("n_urls"))


# host = everything after the scheme up to a path, port, space, or
# quote/bracket; shared verbatim with the DuckDB oracle (RE2-compatible:
# no lookaround, explicit whitespace class)
URL_HOST_PATTERN = "(?i)https?://([^/ \\t\\n\\x0b\\f\\r:<>\"']+)"
# sentence punctuation glued to a bare host ("see https://a.io.")
_HOST_TRAIL_PATTERN = "[.,;)!?]+$"


def url_domain_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-domain URL profile — (domain, n_urls, n_docs) — the table
    behind domain-level quality filtering and blocklists in a
    web-corpus pipeline (the C4/RefinedWeb-style curation step).

    Hosts come from one vectorized ``regexp_extract_all`` (no UDF),
    normalized lowercase, trailing sentence punctuation stripped, then a
    leading ``www.`` dropped; subdomains are NOT collapsed to the
    registrable domain (that needs the public-suffix list — a broadcast
    join away, out of scope here).  Shuffle: the explode stays map-side;
    one hash aggregation keyed by domain carries (domain, partial count,
    doc id) — n_docs is a distinct count, so the shuffle payload is one
    row per (domain, doc) pair, bounded by the explode output, never by
    corpus bytes."""
    hosts = (docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(URL_HOST_PATTERN), F.lit(1)))
        .alias("host")))
    domain = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("host")), _HOST_TRAIL_PATTERN, ""),
        "^www\\.", "")
    return (hosts.select(F.col(id_col), domain.alias("domain"))
            .where(F.col("domain") != "")
            .groupBy("domain")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


def vocab_document_frequency(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             min_df: int = 2) -> DataFrame:
    """Corpus vocabulary with document frequencies — the profiling
    table behind stopword discovery, max_df hot-term caps, and mixture
    weighting in a training-data pipeline.  ``array_distinct`` dedupes
    a word WITHIN each document map-side before the explode, so the
    shuffle carries one (word, partial-count) pair per distinct
    word-per-doc and the aggregation is a plain partial-combined
    ``count(*)``; ``min_df`` prunes the hapax tail (at web scale the
    overwhelming majority of the vocabulary) before it is ever
    collected or joined."""
    words = (docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.split(F.lower(F.trim(F.col(text_col))), WS_CLASS + "+")))
        .alias("word"))
        .where(F.col("word") != ""))
    return (words.groupBy("word")
            .agg(F.count("*").cast("long").alias("df"))
            .where(F.col("df") >= min_df))
