"""Regenerate ie_spark/kb/verbnet_data.py from a VerbNet 3.x XML checkout.

Usage: python scripts/gen_verbnet_table.py /path/to/vnxml

The table is the public VerbNet member→class index (the dataset the
reference parses at runtime, kb/verbnet.py:12-40), frozen so executors
never touch XML."""

from __future__ import annotations

import os
import re
import sys


def build(vnxml_dir: str) -> dict[str, set[str]]:
    mapping: dict[str, set[str]] = {}
    for f in sorted(os.listdir(vnxml_dir)):
        if not f.endswith(".xml"):
            continue
        cid = f[:-4]
        txt = open(os.path.join(vnxml_dir, f), encoding="utf-8",
                   errors="replace").read()
        for m in re.finditer(r'<MEMBER[^>]*\bname="([^"]+)"', txt):
            v = m.group(1).strip().lower()
            if re.fullmatch(r"[a-z][a-z_-]*", v):
                mapping.setdefault(v, set()).add(cid)
    return mapping


def main() -> None:
    vnxml = sys.argv[1]
    mapping = build(vnxml)
    packed = ";".join(f"{v}={'|'.join(sorted(cs))}"
                      for v, cs in sorted(mapping.items()))
    n_cls = len({c for cs in mapping.values() for c in cs})
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ie_spark", "kb", "verbnet_data.py")
    lines = [f'    "{packed[i:i + 73]}"' for i in range(0, len(packed), 73)]
    with open(out, "w") as fh:
        fh.write(_HEADER % (len(mapping), n_cls))
        fh.write("\n".join(lines))
        fh.write(_TAIL)
    print(f"wrote {out}: {len(mapping)} verbs, {n_cls} classes")


_HEADER = '''"""Frozen VerbNet verb→class lookup (reference C10 parity).

The reference classes verbs against VerbNet-GL XML at runtime
(``kb/verbnet.py:12-40``: member name → VerbClass ID index).  Loading and
parsing 284 XML files per executor is neither deterministic nor
Spark-friendly, so the SAME public dataset (VerbNet 3.x member lists,
https://verbs.colorado.edu/verbnet — the dataset the reference bundles) is
frozen here as a packed string: ``verb=class|class;…``.  Class IDs are the
standard public Levin-style identifiers ('give-13.1', 'say-37.7').

%d verbs → %d classes.  Data, not code: regenerate with
``scripts/gen_verbnet_table.py`` against any VerbNet 3.x checkout.
"""

_PACKED = (
'''

_TAIL = '''
)


def verb_class_map() -> dict[str, list[str]]:
    """→ {lemma: [class_id, …]} (sorted class ids)."""
    out: dict[str, list[str]] = {}
    for entry in _PACKED.split(";"):
        verb, _, classes = entry.partition("=")
        out[verb] = classes.split("|")
    return out
'''

if __name__ == "__main__":
    main()
