"""Planted multi-line document rows for the line-dedup operator.

The synthetic documents corpus is single-line word bags, so without
planted rows the cross-document boilerplate branch of ``line_dedup``
would only ever fire on whole-document exact duplicates.  One
deterministic list, consumed by BOTH the Spark query and the DuckDB
oracle (rendered to SQL VALUES from this same list — never
hand-copied), covering: shared header+footer boilerplate, a
boilerplate-only document, a unique document, a whitespace-only
document, and within-document repetition (which must NOT be removed —
distinct-doc count is 1).
"""

from __future__ import annotations

# (doc_id, text)
LINE_SAMPLES: list[tuple[str, str]] = [
    ("ln_art_1", "SUBSCRIBE TO OUR NEWSLETTER\n"
                 "Alpha body paragraph about storage engines\n"
                 "Copyright 2024 Example Corp"),
    ("ln_art_2", "SUBSCRIBE TO OUR NEWSLETTER\n"
                 "Beta body paragraph about query planners\n"
                 "Copyright 2024 Example Corp"),
    ("ln_art_3", "  SUBSCRIBE TO OUR NEWSLETTER  \n"
                 "Gamma body paragraph about shuffle services\n"
                 "Copyright 2024 Example Corp"),
    ("ln_boiler_only", "Copyright 2024 Example Corp"),
    ("ln_unique", "Delta document with no shared lines at all"),
    ("ln_blank", "  \n\n   "),
    ("ln_internal_rep", "Echo repeated internal line\n"
                        "Echo repeated internal line\n"
                        "Echo unique closing line"),
]
