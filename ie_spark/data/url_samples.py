"""Planted URL-bearing document rows for the domain-profile operator.

The synthetic documents corpus is plain word bags with no URLs (verified
at every SF), so without planted rows ``url_domain_stats`` would return
zero rows and its oracle would be vacuous.  One deterministic list
consumed by BOTH the Spark query and the DuckDB oracle (rendered to SQL
VALUES from this same list — never hand-copied).

Cases covered: www-prefix and mixed-case hosts fold together; ports and
paths are excluded from the host; the same domain twice in one document
(n_urls 2, n_docs 1) vs across documents; http vs https; trailing
sentence punctuation stripped; a URL-free row contributes nothing.
"""

from __future__ import annotations

# (doc_id, text)
URL_SAMPLES: list[tuple[str, str]] = [
    ("u_mixed", "docs at https://WWW.Example.COM/guide and the api at "
                "http://api.example.com:8080/v1 plus https://example.com."),
    ("u_dup", "see https://data.example.org/a and then "
              "https://data.example.org/b for the rest"),
    ("u_other", "a mirror lives at http://mirror.test-site.net/files"),
    ("u_same_dom", "https://example.com/x is the canonical entry point"),
    ("u_trail", "read it all (https://papers.acme.io/p1), then decide."),
    ("u_none", "no links in this row at all just plain words"),
]
