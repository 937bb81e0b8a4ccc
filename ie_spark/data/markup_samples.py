"""Planted HTML-ish document rows for the markup-strip operator.

The synthetic documents corpus is plain word bags with no markup, so
without planted rows every branch of ``markup_strip`` (script/style
blocks, comments, tags, URLs, entities) would be vacuous.  One
deterministic list consumed by BOTH the Spark query and the DuckDB
oracle (rendered to SQL VALUES from this same list — never
hand-copied).
"""

from __future__ import annotations

# (doc_id, text)
MARKUP_SAMPLES: list[tuple[str, str]] = [
    ("mk_page", "<html><head><title>Spark notes</title>"
                "<style>body { color: red; }</style></head>"
                "<body><h1>Shuffle services</h1>"
                "<p>Partial aggregation saves a <b>full</b> pass.</p>"
                "</body></html>"),
    ("mk_script", "before<script type=\"text/javascript\">var x = "
                  "'<p>not a tag</p>';</script>after"),
    ("mk_comment", "keep <!-- drop this\nand this --> also keep"),
    ("mk_url", "see https://example.com/a?b=1 and http://mirror.net "
               "for details"),
    ("mk_entities", "a &amp;lt; b &lt;tag&gt; &quot;quoted&quot; "
                    "it&#39;s one&nbsp;space"),
    ("mk_plain", "no markup here at all"),
    ("mk_empty", ""),
    ("mk_multi", "<div><a href=\"https://x.y/z\">link text</a></div> "
                 "tail https://tail.example"),
    ("mk_upper", "<SCRIPT>var x = 1;</SCRIPT> hello "
                 "<Style>p { margin: 0 }</Style> HTTP://EX.COM/path"),
    ("mk_vtab", "vertical\x0btab and\ttab"),
]
