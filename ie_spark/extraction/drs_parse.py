"""Set- and NLTK-notation DRS parsers (reference B28,
``ie/parse.py:337-387`` ``parse_drs``; notation spec in its docstring and
``drt/drs.py`` ``show(SHOW_SET)``).

Grammars accepted (whitespace-insensitive, case-insensitive operators):

  set    ``<{x,y},{man(x), not <{},{happy(x)}>}>``
         operators: ``!``/``not``/``neg``; infix ``imp``/``->``/``=>``/
         ``then``; infix ``v``/``or``; ``b``/``box``/``necessary``;
         ``d``/``diamond``/``maybe``; proposition ``p: <...>``
  nltk   ``([x,y],[man(x), -([],[happy(x)])])`` (nltk.org/howto/drt)
         with ``-`` negation and ``->``/``|`` infix operators
  linear ``[x,y| man(x),¬[| happy(x)]]`` — this repo's native export
         notation (reference SHOW_LINEAR)

The parse result is a plain tree: ``(refs, conds)`` where each cond is a
string relation ``rel(args)`` or a tuple ``('neg'|'diamond'|'box', sub)``,
``('imp'|'or', a, b)``, ``('prop', ref, sub)``.  ``show_linear`` renders
back to the linear notation consumed by ``drs_to_fol``/``drs_to_mfol``,
so any notation round-trips into the FOL exports.
"""

from __future__ import annotations

from ie_spark.extraction.drs import BOX, DIAMOND, IMP, NEG, OR

_NEG_WORDS = frozenset(("!", "not", "neg", "-", "¬"))
_BOX_WORDS = frozenset(("b", "box", "necessary", "◻"))
_DIAMOND_WORDS = frozenset(("d", "diamond", "maybe", "◇"))
_IMP_WORDS = frozenset(("imp", "->", "=>", "then", "⇒"))
_OR_WORDS = frozenset(("v", "or", "|", "∨"))


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def skip(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self) -> str:
        self.skip()
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, ch: str):
        self.skip()
        if not self.s.startswith(ch, self.i):
            raise SyntaxError(
                f"expected {ch!r} at {self.i}: …{self.s[self.i:self.i+20]!r}")
        self.i += len(ch)

    def word(self) -> str:
        self.skip()
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum()
                                   or self.s[j] in "_-.%$"):
            j += 1
        w, self.i = self.s[self.i:j], j
        return w


def _parse_box(p: _P):
    """One DRS in any of the three notations → (refs, conds)."""
    c = p.peek()
    if c == "<":                     # set: <{refs},{conds}>
        p.eat("<")
        refs = _parse_ref_list(p, "{", "}")
        p.eat(",")
        conds = _parse_cond_list(p, "{", "}")
        p.eat(">")
        return refs, conds
    if c == "(":                     # nltk: ([refs],[conds])
        p.eat("(")
        refs = _parse_ref_list(p, "[", "]")
        p.eat(",")
        conds = _parse_cond_list(p, "[", "]")
        p.eat(")")
        return refs, conds
    if c == "[":                     # linear: [refs| conds]
        p.eat("[")
        refs = []
        save = p.i
        while True:
            w = p.word()
            if w and p.peek() in ",|":
                refs.append(w)
                if p.peek() == ",":
                    p.eat(",")
                    continue
            else:
                p.i, refs = save, []
            break
        p.eat("|")
        conds = _parse_conds_until(p, "]")
        p.eat("]")
        return refs, conds
    raise SyntaxError(f"expected a DRS at {p.i}")


def _parse_ref_list(p: _P, o: str, c: str):
    p.eat(o)
    refs = []
    while p.peek() != c:
        w = p.word()
        if not w:   # non-word, non-closer char would loop forever
            raise SyntaxError(f"bad referent at {p.i}: {p.peek()!r}")
        refs.append(w)
        if p.peek() == ",":
            p.eat(",")
    p.eat(c)
    return refs


def _parse_cond_list(p: _P, o: str, c: str):
    p.eat(o)
    conds = _parse_conds_until(p, c)
    p.eat(c)
    return conds


def _parse_conds_until(p: _P, close: str):
    conds = []
    while p.peek() != close:
        conds.append(_parse_cond(p))
        if p.peek() == ",":
            p.eat(",")
    return conds


def _box_follows(p: _P) -> bool:
    """A DRS follows iff '<', '[', or '(' + '[' (nltk) — a bare '(' is a
    relation's argument list ('B(x)' vs box alias 'b <...>')."""
    ch = p.peek()
    if ch in "<[":
        return True
    if ch == "(":
        j = p.i + 1
        while j < len(p.s) and p.s[j].isspace():
            j += 1
        return j < len(p.s) and p.s[j] == "["
    return False


def _parse_cond(p: _P):
    ch = p.peek()
    if ch in "¬◇◻-!":
        op = p.s[p.i]
        p.i += 1
        sub = _parse_box(p)
        kind = ("neg" if op in "¬-!" else
                "diamond" if op == "◇" else "box")
        return _maybe_infix(p, (kind, sub))
    if ch in "<([":
        return _maybe_infix(p, ("sub", _parse_box(p)))
    w = p.word()
    lw = w.lower()
    if lw in _NEG_WORDS and _box_follows(p):
        return _maybe_infix(p, ("neg", _parse_box(p)))
    if lw in _BOX_WORDS and _box_follows(p):
        return _maybe_infix(p, ("box", _parse_box(p)))
    if lw in _DIAMOND_WORDS and _box_follows(p):
        return _maybe_infix(p, ("diamond", _parse_box(p)))
    if p.peek() == ":":              # proposition: p: <...>
        p.eat(":")
        return ("prop", w, _parse_box(p))
    if p.peek() == "(":              # relation R(x1,...,xn)
        p.eat("(")
        args = []
        while p.peek() != ")":
            a = p.word()
            if not a:
                raise SyntaxError(f"bad argument at {p.i}: {p.peek()!r}")
            args.append(a)
            if p.peek() == ",":
                p.eat(",")
        p.eat(")")
        return _maybe_infix(p, f"{w}({','.join(args)})")
    raise SyntaxError(f"cannot parse condition at {p.i}: {w!r}")


def _one_infix(p: _P, left):
    save = p.i
    p.skip()
    for words, kind in ((_IMP_WORDS, "imp"), (_OR_WORDS, "or")):
        for tok in sorted(words, key=len, reverse=True):
            if p.s[p.i:p.i + len(tok)].lower() == tok:
                nxt = p.i + len(tok)
                # word operators need a boundary; glyphs do not
                if tok.isalpha() and nxt < len(p.s) \
                        and (p.s[nxt].isalnum() or p.s[nxt] == "_"):
                    continue
                p.i = nxt
                ch = p.peek()
                right = (("sub", _parse_box(p)) if ch in "<(["
                         else _parse_cond(p))
                return (kind, _as_box(left), _as_box(right))
    p.i = save
    return None


def _maybe_infix(p: _P, left):
    """Left-associative infix imp/or chain after any condition
    ('A(c) v <…> then <…>' per the reference grammar spec)."""
    while (nxt := _one_infix(p, left)) is not None:
        left = nxt
    return left


def _as_box(cond):
    """An infix operand must be a DRS; unwrap 'sub' markers, wrap a bare
    condition into an empty-universe box (reference Or/Imp operands are
    always DRSs)."""
    if isinstance(cond, tuple) and cond[0] == "sub":
        return cond[1]
    return ([], [cond])


def parse_drs(s: str):
    """Any supported notation → (refs, conds) tree (reference
    ``parse_drs``, ie/parse.py:337)."""
    p = _P(s)
    refs, conds = _parse_box(p)
    p.skip()
    if p.i != len(p.s):
        raise SyntaxError(f"trailing input at {p.i}: {p.s[p.i:p.i+20]!r}")
    return refs, conds


def _cond(c, show) -> str:
    """One 7-branch operator dispatch shared by every renderer (review
    r4 pass-2 finding #4) — ``show`` is the box renderer to recurse."""
    if isinstance(c, str):
        return c
    kind = c[0]
    if kind == "neg":
        return NEG + show(c[1])
    if kind == "diamond":
        return DIAMOND + show(c[1])
    if kind == "box":
        return BOX + show(c[1])
    if kind == "imp":
        return f"{show(c[1])} {IMP} {show(c[2])}"
    if kind == "or":
        return f"{show(c[1])} {OR} {show(c[2])}"
    if kind == "prop":
        return f"{c[1]}: {show(c[2])}"
    if kind == "sub":
        return show(c[1])
    raise ValueError(kind)


def show_linear(tree) -> str:
    """(refs, conds) → this repo's linear notation (SHOW_LINEAR)."""
    refs, conds = tree
    return (f"[{','.join(refs)}| "
            f"{','.join(_cond(c, show_linear) for c in conds)}]")


def show_set(tree) -> str:
    """(refs, conds) → reference SHOW_SET notation ``<{…},{…}>``."""
    refs, conds = tree
    return (f"<{{{','.join(refs)}}},"
            f"{{{','.join(_cond(c, show_set) for c in conds)}}}>")


# ---------------------------------------------------------------------------
# DRS merge with α-renaming (reference ``merge``/``Merge.resolve_merges``,
# drt/drs.py — goldens in drt/test/drs_test.py test06-test09)
# ---------------------------------------------------------------------------

def _names_in(tree, out: set) -> None:
    refs, conds = tree
    out.update(refs)
    for c in conds:
        if isinstance(c, str):
            args = c[c.find("(") + 1:c.rfind(")")]
            out.update(a.strip() for a in args.split(",") if a.strip())
        elif c[0] in ("neg", "diamond", "box", "sub"):
            _names_in(c[1], out)
        elif c[0] in ("imp", "or"):
            _names_in(c[1], out)
            _names_in(c[2], out)
        elif c[0] == "prop":
            out.add(c[1])
            _names_in(c[2], out)


def _rename_box(tree, mapping: dict):
    refs, conds = tree
    # a sub-box that REBINDS a name shadows the outer binding — stop
    # renaming that name inside (reference α-conversion scoping)
    inner = {k: v for k, v in mapping.items() if k not in refs}
    return (refs, [_rename_cond(c, inner) for c in conds])


def _rename_cond(c, mapping: dict):
    if not mapping:
        return c
    if isinstance(c, str):
        i = c.find("(")
        if i < 0:
            return c
        rel, args = c[:i], c[i + 1:c.rfind(")")]
        new = [mapping.get(a.strip(), a.strip()) for a in args.split(",")]
        return f"{rel}({','.join(new)})"
    kind = c[0]
    if kind in ("neg", "diamond", "box", "sub"):
        return (kind, _rename_box(c[1], mapping))
    if kind in ("imp", "or"):
        return (kind, _rename_box(c[1], mapping),
                _rename_box(c[2], mapping))
    if kind == "prop":
        return (kind, mapping.get(c[1], c[1]), _rename_box(c[2], mapping))
    raise ValueError(kind)


def merge(d1, d2):
    """β-merge two (refs, conds) trees: α-rename d2's BOUND referents
    that collide with d1's universe (x → x1, first free name), union the
    universes, concatenate the conditions (reference ``merge``,
    drt/drs.py; 'A man is happy and a man is not happy' →
    ``[x,x1| man(x),happy(x),man(x1),¬[| happy(x1)]]``,
    drs_test.py:169-190).  Free referents in d2 are NOT renamed — they
    bind into d1's universe ('a record date', drs_test.py:202-211)."""
    refs1, conds1 = d1
    refs2, conds2 = d2
    used: set = set()
    _names_in(d1, used)
    _names_in(d2, used)
    mapping: dict = {}
    new_refs2 = []
    for r in refs2:
        if r in refs1:
            i = 1
            while f"{r}{i}" in used:
                i += 1
            nr = f"{r}{i}"
            used.add(nr)
            mapping[r] = nr
            new_refs2.append(nr)
        else:
            new_refs2.append(r)
    conds2r = [_rename_cond(c, mapping) for c in conds2]
    return (list(refs1) + new_refs2, list(conds1) + conds2r)
