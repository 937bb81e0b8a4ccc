"""Projective DRS (PDRS) algebra: labeled referents/conditions, MAP
accessibility, set-notation parsing, merges, and FOL export.

Closes SURVEY §1.1's last DRT-algebra row.  The reference's PDRS module
(``drt/pdrs.py``, a pdrt-sandbox port) is test-tooling only — no
production path emits PDRS, several of its own test assertions are
FIXME'd out, and its ``pmerge`` would crash on attribute typos — so this
is a from-scratch implementation of the Projective DRT model (Venhuizen
et al., pdrt-sandbox) gated on the reference tests' WELL-DEFINED goldens
(``drt/test/pdrs_test.py``): the show(SET/LINEAR/BOX) strings, the FOL
exports, the amerge expectation, the purify universe expectation, and
the structural queries.  Deliberate divergence, documented: the
reference builds an UNDIRECTED projection graph (its accessibility
collapses to connected components, hence its FIXMEs); here accessibility
is DIRECTED — a context reaches its enclosing contexts, an implication's
consequent reaches its antecedent, and MAP(p1, p2) makes p2 reachable
from p1 (strict subordination for negative p2, per the notation).
"""

from __future__ import annotations

import re

SHOW_BOX = 0
SHOW_LINEAR = 1
SHOW_SET = 2

_TOP = "⊤"       # ⊤
_EXISTS = "∃"    # ∃
_FORALL = "∀"    # ∀
_AND = "∧"       # ∧
_NOT = "¬"       # ¬
_IMP = "→"       # →
_OR = "∨"        # ∨


class PDRSRef:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __eq__(self, other):
        return isinstance(other, PDRSRef) and self.name == other.name

    def __hash__(self):
        return hash(("PDRSRef", self.name))

    def __repr__(self):
        return f"PDRSRef({self.name})"


class PRef:
    """A projected referent: (label, ref)."""
    __slots__ = ("plabel", "ref")

    def __init__(self, plabel: int, ref: PDRSRef):
        self.plabel = plabel
        self.ref = ref

    def __eq__(self, other):
        return isinstance(other, PRef) and self.plabel == other.plabel \
            and self.ref == other.ref

    def __hash__(self):
        return hash(("PRef", self.plabel, self.ref))

    def __repr__(self):
        return f"PRef({self.plabel},{self.ref.name})"


class MAP:
    """Accessibility assertion: v2 is accessible from v1 (strict
    subordination when v2 is negative)."""
    __slots__ = ("v1", "v2")

    def __init__(self, v1: int, v2: int):
        self.v1 = v1
        self.v2 = v2

    def to_tuple(self):
        return (self.v1, self.v2)

    def __eq__(self, other):
        if isinstance(other, tuple):
            return self.to_tuple() == other
        return isinstance(other, MAP) and self.to_tuple() == other.to_tuple()

    def __hash__(self):
        return hash(("MAP",) + self.to_tuple())

    def show(self, notation=SHOW_SET):
        return f"({self.v1},{self.v2})"


class PRel:
    __slots__ = ("pred", "refs")

    def __init__(self, pred: str, refs: list):
        self.pred = pred
        self.refs = list(refs)

    def __eq__(self, other):
        return isinstance(other, PRel) and self.pred == other.pred \
            and self.refs == other.refs

    def __hash__(self):
        return hash(("PRel", self.pred, tuple(r.name for r in self.refs)))

    def show(self, notation=SHOW_SET):
        return f"{self.pred}({','.join(r.name for r in self.refs)})"


class PNeg:
    __slots__ = ("drs",)

    def __init__(self, drs: "PDRS"):
        self.drs = drs

    def __eq__(self, other):
        return isinstance(other, PNeg) and self.drs == other.drs

    def __hash__(self):
        return hash(("PNeg", self.drs))

    def show(self, notation=SHOW_SET):
        return f"{_NOT}{self.drs.show(notation)}"


class _Binary:
    __slots__ = ("antecedent", "consequent")
    _op = "?"

    def __init__(self, a: "PDRS", b: "PDRS"):
        self.antecedent = a
        self.consequent = b

    def __eq__(self, other):
        return type(self) is type(other) \
            and self.antecedent == other.antecedent \
            and self.consequent == other.consequent

    def __hash__(self):
        return hash((type(self).__name__, self.antecedent, self.consequent))

    def show(self, notation=SHOW_SET):
        return (f"{self.antecedent.show(notation)} {self._op} "
                f"{self.consequent.show(notation)}")


class PImp(_Binary):
    _op = "->"


class POr(_Binary):
    _op = "v"


class PDiamond(_Binary):
    _op = "d"


class PBox(_Binary):
    _op = "b"


class PProp:
    __slots__ = ("ref", "drs")

    def __init__(self, ref: PDRSRef, drs: "PDRS"):
        self.ref = ref
        self.drs = drs

    def __eq__(self, other):
        return isinstance(other, PProp) and self.ref == other.ref \
            and self.drs == other.drs

    def __hash__(self):
        return hash(("PProp", self.ref, self.drs))

    def show(self, notation=SHOW_SET):
        return f"{self.ref.name}: {self.drs.show(notation)}"


class PCond:
    """A projected condition: (label, condition)."""
    __slots__ = ("plabel", "cond")

    def __init__(self, plabel: int, cond):
        self.plabel = plabel
        self.cond = cond

    def __eq__(self, other):
        return isinstance(other, PCond) and self.plabel == other.plabel \
            and self.cond == other.cond

    def __hash__(self):
        return hash(("PCond", self.plabel, self.cond))

    def show(self, notation=SHOW_SET):
        return f"({self.plabel},{self.cond.show(notation)})"


def _subdrss(cond):
    c = cond.cond if isinstance(cond, PCond) else cond
    if isinstance(c, PNeg):
        return [c.drs]
    if isinstance(c, _Binary):
        return [c.antecedent, c.consequent]
    if isinstance(c, PProp):
        return [c.drs]
    return []


class PDRS:
    """A projective DRS: (label, MAPs, projected universe, projected
    conditions)."""

    def __init__(self, label: int, mapper: list, refs: list, conds: list):
        self.label = label
        self.mapper = [m if isinstance(m, MAP) else MAP(*m) for m in mapper]
        self.refs = list(refs)
        self.conds = list(conds)

    # -- equality (structural) -------------------------------------------

    def __eq__(self, other):
        return isinstance(other, PDRS) and self.label == other.label \
            and self.mapper == other.mapper and self.refs == other.refs \
            and self.conds == other.conds

    def __hash__(self):
        return hash(("PDRS", self.label, tuple(self.mapper),
                     tuple(self.refs), tuple(self.conds)))

    def __repr__(self):
        return self.show(SHOW_SET)

    # -- show ------------------------------------------------------------

    def _show_ref(self, r: PRef) -> str:
        # a ref projected at the box's own label renders bare (the
        # reference golden '<1,{x},…>'); a DIFFERENT projection label is
        # load-bearing and must render labeled or show→parse round-trips
        # would silently move the referent into the main context
        if r.plabel == self.label:
            return r.ref.name
        return f"({r.plabel},{r.ref.name})"

    def show(self, notation=SHOW_SET) -> str:
        if notation == SHOW_SET:
            return "<%i,{%s},{%s},{%s}>" % (
                self.label,
                ",".join(self._show_ref(r) for r in self.refs),
                ",".join(c.show(notation) for c in self.conds),
                ",".join(m.show(notation) for m in self.mapper))
        if notation == SHOW_LINEAR:
            return "%i:[%s|%s|%s]" % (
                self.label,
                ",".join(self._show_ref(r) for r in self.refs),
                ",".join(c.show(notation) for c in self.conds),
                ",".join(m.show(notation) for m in self.mapper))
        # SHOW_BOX: three stacked sections (universe / conditions / maps)
        ul = "  ".join(r.ref.name for r in self.refs)
        cl = "\n".join(c.show(SHOW_LINEAR) for c in self.conds)
        ml = " ".join(m.show(notation) for m in self.mapper)
        hl = str(self.label)
        sections = [ul.split("\n"), cl.split("\n") + [""],
                    ml.split("\n") + [""]]
        width = 4 + max(len(line) for sec in sections for line in sec
                        for line in [line]) if any(
            line for sec in sections for line in sec) else 7
        width = max(width, 4 + len(hl) + 2, 7)
        inner = width - 2
        fill = "-" * inner
        mid = (inner - len(hl)) // 2
        title = ("┌" + fill[:mid] + hl
                 + fill[mid + len(hl):] + "┐")
        out = [title]
        for i, sec in enumerate(sections):
            for line in sec:
                out.append("|" + line.ljust(inner) + "|")
            if i < 2:
                out.append("├" + fill + "┤")
        out.append("└" + fill + "┘")
        return "\n".join(out) + "\n"

    # -- structure -------------------------------------------------------

    @property
    def universe(self) -> list:
        return list(self.refs)

    @property
    def conditions(self) -> list:
        return list(self.conds)

    def subdrss(self):
        """All directly and indirectly embedded PDRSs (not self)."""
        out = []
        for c in self.conds:
            for d in _subdrss(c):
                out.append(d)
                out.extend(d.subdrss())
        return out

    def has_subdrs(self, d: "PDRS") -> bool:
        return d is self or self == d or any(
            s is d or s == d for s in self.subdrss())

    def get_universes(self) -> list:
        out = [r.ref for r in self.refs]
        for d in self.subdrss():
            out.extend(r.ref for r in d.refs)
        return out

    def all_prefs(self) -> list:
        out = list(self.refs)
        for d in self.subdrss():
            out.extend(d.refs)
        return out

    def get_variables(self) -> list:
        """All referents (bound or free), first-occurrence order."""
        out = []

        def add(r):
            if r not in out:
                out.append(r)

        def walk_cond(c):
            c = c.cond if isinstance(c, PCond) else c
            if isinstance(c, PRel):
                for r in c.refs:
                    add(r)
            elif isinstance(c, PNeg):
                walk(c.drs)
            elif isinstance(c, _Binary):
                walk(c.antecedent)
                walk(c.consequent)
            elif isinstance(c, PProp):
                add(c.ref)
                walk(c.drs)

        def walk(d):
            for r in d.refs:
                add(r.ref)
            for c in d.conds:
                walk_cond(c)

        # free-first ordering is NOT guaranteed; callers compare as sets
        walk(self)
        return out

    def get_labels(self) -> list:
        out = [self.label]
        for d in self.subdrss():
            out.append(d.label)
        return out

    # -- accessibility (directed) ---------------------------------------

    def _edges(self) -> set:
        """label → label edges: p→q means q's universe is accessible
        from p."""
        es = set()

        def walk(d, outer):
            if outer is not None:
                es.add((d.label, outer))
            for m in d.mapper:
                es.add((m.v1, abs(m.v2)))
            for c in d.conds:
                c2 = c.cond if isinstance(c, PCond) else c
                if isinstance(c2, PNeg):
                    walk(c2.drs, d.label)
                elif isinstance(c2, _Binary):
                    walk(c2.antecedent, d.label)
                    # the consequent context reaches the antecedent
                    walk(c2.consequent, c2.antecedent.label)
                elif isinstance(c2, PProp):
                    walk(c2.drs, d.label)

        walk(self, None)
        return es

    def accessible_contexts(self, p: int) -> set:
        """All labels reachable from context p (including p)."""
        es = self._edges()
        seen = {p}
        frontier = [p]
        while frontier:
            cur = frontier.pop()
            for a, b in es:
                if a == cur and b not in seen:
                    seen.add(b)
                    frontier.append(b)
        return seen

    def has_accessible_context(self, p1: int, p2: int) -> bool:
        return p2 in self.accessible_contexts(p1)

    def accessible_universe(self, p: int) -> list:
        """Referents interpretable at context p: every PRef whose label
        is accessible from p."""
        acc = self.accessible_contexts(p)
        return [r.ref for r in self.all_prefs() if r.plabel in acc]

    def has_bound(self, pref: PRef, local_label: int) -> bool:
        """A projected referent used at ``local_label`` is bound iff some
        context pv accessible from BOTH the use site and the referent's
        own label introduces PRef(pv, ref)."""
        acc = (self.accessible_contexts(local_label)
               & self.accessible_contexts(pref.plabel))
        return any(r.plabel in acc and r.ref == pref.ref
                   for r in self.all_prefs())

    # -- free referents / purity ----------------------------------------

    def _context_of_conds(self):
        """Yield (plabel, PRel) for every relation condition anywhere."""
        def walk(d):
            for c in d.conds:
                c2 = c.cond if isinstance(c, PCond) else c
                lbl = c.plabel if isinstance(c, PCond) else d.label
                if isinstance(c2, PRel):
                    yield lbl, c2
                elif isinstance(c2, PNeg):
                    yield from walk(c2.drs)
                elif isinstance(c2, _Binary):
                    yield from walk(c2.antecedent)
                    yield from walk(c2.consequent)
                elif isinstance(c2, PProp):
                    yield from walk(c2.drs)
        yield from walk(self)

    def get_freerefs(self) -> list:
        """Referents used in a relation at some context with no
        accessible introduction (first-occurrence order)."""
        out = []
        for lbl, rel in self._context_of_conds():
            acc = self.accessible_contexts(lbl)
            for r in rel.refs:
                if not any(pr.plabel in acc and pr.ref == r
                           for pr in self.all_prefs()):
                    if r not in out:
                        out.append(r)
        return out

    @property
    def ispure(self) -> bool:
        """No referent is introduced twice."""
        seen = set()
        for pr in self.all_prefs():
            if pr.ref in seen:
                return False
            seen.add(pr.ref)
        return True

    @property
    def isproper(self) -> bool:
        return not self.get_freerefs()

    @property
    def isresolved(self) -> bool:
        return True  # unresolved lambda-merges never occur in this model

    @property
    def ismerge(self) -> bool:
        return False

    @property
    def isfol(self) -> bool:
        return self.isproper

    def _dedupe_prefs(self) -> "PDRS":
        """Drop repeated introductions of the SAME (plabel, ref): two
        identical PRefs denote one referent, and a duplicate would make
        the rename map below ambiguous."""
        seen: set = set()

        def walk(d):
            refs = []
            for r in d.refs:
                key = (r.plabel, r.ref.name)
                if key not in seen:
                    seen.add(key)
                    refs.append(r)

            def wc(c):
                c2 = c.cond if isinstance(c, PCond) else c
                if isinstance(c2, PNeg):
                    c2 = PNeg(walk(c2.drs))
                elif isinstance(c2, _Binary):
                    c2 = type(c2)(walk(c2.antecedent),
                                  walk(c2.consequent))
                elif isinstance(c2, PProp):
                    c2 = PProp(c2.ref, walk(c2.drs))
                return PCond(c.plabel, c2) if isinstance(c, PCond) else c2

            return PDRS(d.label, d.mapper, refs,
                        [wc(c) for c in d.conds])

        out = walk(self)
        return self if out == self else out

    def purify(self) -> "PDRS":
        """Rename re-introduced or capture-prone bound referents so every
        universe introduction is unique and never shadows a free use
        (reference golden: universes {x,y,z} with z also free elsewhere
        purify to {x,y,z1}).  Identical duplicate introductions (same
        label AND name) first collapse to one — they denote the same
        referent."""
        base = self._dedupe_prefs()
        taken = {r.name for r in base.get_variables()}
        free = {r.name for r in base.get_freerefs()}
        seen: set = set()
        renames: dict = {}  # (plabel, name) -> new name
        for pr in base.all_prefs():
            nm = pr.ref.name
            if nm in seen or nm in free:
                i = 1
                while f"{nm}{i}" in taken:
                    i += 1
                new = f"{nm}{i}"
                taken.add(new)
                renames[(pr.plabel, nm)] = new
            else:
                seen.add(nm)
        if not renames:
            return base
        return base._rename_bound(renames)

    def _rename_bound(self, renames: dict) -> "PDRS":
        """Apply (plabel, name) → new-name to introductions and to uses
        whose context can access the renamed introduction."""
        def map_ref(r, lbl):
            acc = self.accessible_contexts(lbl)
            for (plabel, nm), new in renames.items():
                if r.name == nm and plabel in acc:
                    return PDRSRef(new)
            return r

        def walk_cond(c, outer):
            lbl = c.plabel if isinstance(c, PCond) else outer
            c2 = c.cond if isinstance(c, PCond) else c
            if isinstance(c2, PRel):
                new = PRel(c2.pred, [map_ref(r, lbl) for r in c2.refs])
            elif isinstance(c2, PNeg):
                new = PNeg(walk(c2.drs))
            elif isinstance(c2, _Binary):
                new = type(c2)(walk(c2.antecedent), walk(c2.consequent))
            elif isinstance(c2, PProp):
                new = PProp(map_ref(c2.ref, lbl), walk(c2.drs))
            else:
                new = c2
            return PCond(lbl, new) if isinstance(c, PCond) else new

        def walk(d):
            refs = [PRef(r.plabel,
                         PDRSRef(renames.get((r.plabel, r.ref.name),
                                             r.ref.name)))
                    for r in d.refs]
            return PDRS(d.label, d.mapper, refs,
                        [walk_cond(c, d.label) for c in d.conds])

        return walk(self)

    # -- FOL export ------------------------------------------------------

    def to_fol(self, world: str = "w"):
        """→ (fol_string, world).  Referents introduced anywhere reachable
        from the top context quantify existentially; implication becomes
        ∀(→); every relation gains the world as first argument."""
        return _FolStr(self._fol(world)), world

    def _fol_cond(self, c, world: str) -> str:
        c2 = c.cond if isinstance(c, PCond) else c
        if isinstance(c2, PRel):
            return (f"{c2.pred}({world},"
                    f"{','.join(r.name for r in c2.refs)})")
        if isinstance(c2, PNeg):
            return f"{_NOT}{c2.drs._fol(world)}"
        if isinstance(c2, PImp):
            ante = c2.antecedent
            avars = "".join(f"{_FORALL}{r.ref.name}" for r in ante.refs)
            inner_parts = [ante._fol_cond(cc, world) for cc in ante.conds]
            inner = f" {_AND} ".join(inner_parts) if inner_parts else _TOP
            return (f"{avars}({inner} {_IMP} "
                    f"{c2.consequent._fol(world)})")
        if isinstance(c2, POr):
            return (f"({c2.antecedent._fol(world)} {_OR} "
                    f"{c2.consequent._fol(world)})")
        if isinstance(c2, PProp):
            return f"{c2.ref.name}: {c2.drs._fol(world)}"
        # modal conditions: standard accessibility-relation translation
        # (matches this repo's DRS modal-FOL convention): ◻ → every
        # accessible world, ◇ → some accessible world; antecedent and
        # consequent both evaluate at the new world
        if isinstance(c2, PBox):
            w2 = world + "1"
            return (f"{_FORALL}{w2}(Acc({world},{w2}) {_IMP} "
                    f"({c2.antecedent._fol(w2)} {_AND} "
                    f"{c2.consequent._fol(w2)}))")
        if isinstance(c2, PDiamond):
            w2 = world + "1"
            return (f"{_EXISTS}{w2}(Acc({world},{w2}) {_AND} "
                    f"{c2.antecedent._fol(w2)} {_AND} "
                    f"{c2.consequent._fol(w2)})")
        raise TypeError(f"unknown PDRS condition {type(c2).__name__}")

    def _fol(self, world: str) -> str:
        refs = [r.ref.name for r in self.refs]
        parts = [self._fol_cond(c, world) for c in self.conds]
        if not parts and not refs:
            return _TOP
        body = f" {_AND} ".join(parts) if parts else _TOP
        for r in reversed(refs):
            body = f"{_EXISTS}{r}({body})"
        return body


class _FolStr(str):
    """FOL result with the reference's .show(notation) surface."""

    def show(self, notation=SHOW_SET):
        return str(self)


# ---------------------------------------------------------------------------
# Merges
# ---------------------------------------------------------------------------


def _fresh_label(used: set) -> int:
    i = 1
    while i in used:
        i += 1
    used.add(i)
    return i


def _relabel(d: PDRS, old: int, new: int) -> PDRS:
    def mr(m):
        return MAP(new if m.v1 == old else m.v1,
                   (new if abs(m.v2) == old else abs(m.v2))
                   * (-1 if m.v2 < 0 else 1))

    def wc(c):
        c2 = c.cond if isinstance(c, PCond) else c
        if isinstance(c2, PNeg):
            c2 = PNeg(walk(c2.drs))
        elif isinstance(c2, _Binary):
            c2 = type(c2)(walk(c2.antecedent), walk(c2.consequent))
        elif isinstance(c2, PProp):
            c2 = PProp(c2.ref, walk(c2.drs))
        if not isinstance(c, PCond):
            return c2
        return PCond(new if c.plabel == old else c.plabel, c2)

    def walk(d2):
        return PDRS(new if d2.label == old else d2.label,
                    [mr(m) for m in d2.mapper],
                    [PRef(new if r.plabel == old else r.plabel, r.ref)
                     for r in d2.refs],
                    [wc(c) for c in d2.conds])

    return walk(d)


def amerge(d1: PDRS, d2: PDRS) -> PDRS:
    """Assertive merge: d1's content joins d2's context directly.  Free
    referents of d2 bind against d1's universe (no renaming — that is
    what makes the merge assertive); d2's BOUND referents that collide
    with d1's variables are fresh discourse entities and alpha-rename
    away first ('A man … A woman …' stay two referents)."""
    p1, p2 = d1.purify(), d2.purify()
    p1_names = {r.name for r in p1.get_variables()}
    taken = p1_names | {r.name for r in p2.get_variables()}
    renames: dict = {}
    for pr in p2.all_prefs():
        key = (pr.plabel, pr.ref.name)
        if pr.ref.name in p1_names and key not in renames:
            i = 1
            while f"{pr.ref.name}{i}" in taken:
                i += 1
            renames[key] = f"{pr.ref.name}{i}"
            taken.add(renames[key])
    if renames:
        p2 = p2._rename_bound(renames)
    p1 = _relabel(p1, p1.label, p2.label)
    return PDRS(p2.label, p1.mapper + p2.mapper, p1.refs + p2.refs,
                p1.conds + p2.conds).purify()


def pmerge(d1: PDRS, d2: PDRS) -> PDRS:
    """Projective merge: d1's content is PRESUPPOSED — it moves to a
    fresh context made accessible from d2's main context via a MAP
    (reference expectation in pdrs_test.py test3: man ⊕ happy →
    <1,{(1,2)},{(2,x)},{(2,man(x)),(1,happy(x))}> for 'The man is
    happy')."""
    p1, p2 = d1.purify(), d2.purify()
    used = set(p1.get_labels()) | set(p2.get_labels())
    proj = _fresh_label(used)
    p1 = _relabel(p1, p1.label, proj)
    return PDRS(p2.label,
                p1.mapper + p2.mapper + [MAP(p2.label, proj)],
                p1.refs + p2.refs, p1.conds + p2.conds)


# ---------------------------------------------------------------------------
# Set-notation parser
# ---------------------------------------------------------------------------

_WS = re.compile(r"\s+")
_NUM_RE = re.compile(r"-?\d+")
_NAME_RE = re.compile(r"[.a-zA-Z_][_\w.$-]*")


class _Scanner:
    def __init__(self, s: str):
        self.s = _WS.sub("", s)
        self.i = 0

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, ch: str):
        if not self.s.startswith(ch, self.i):
            raise ValueError(
                f"expected {ch!r} at {self.i} in {self.s[self.i:self.i+20]!r}")
        self.i += len(ch)

    def number(self) -> int:
        m = _NUM_RE.match(self.s, self.i)
        if not m:
            raise ValueError(f"expected number at {self.i}")
        self.i = m.end()
        return int(m.group(0))

    def name(self) -> str:
        m = _NAME_RE.match(self.s, self.i)
        if not m:
            raise ValueError(f"expected name at {self.i}")
        self.i = m.end()
        return m.group(0)


def parse_pdrs(s: str) -> PDRS:
    """Parse the reference's PDRS set notation:
    ``<label,{(l,ref),…},{(l,cond),…},{(m1,m2),…}>`` where a condition is
    a relation, a negation (``not``/``neg``/``!``), a binary operator
    (``->``/``imp``/``then``/``or``/``v``/``b``/``box``/``d``/…) over two
    PDRSs, or a proposition ``ref: <…>`` (reference grammar
    ``parse.py:43-131``)."""
    sc = _Scanner(s)
    d = _pdrs(sc)
    if sc.i != len(sc.s):
        raise ValueError(f"trailing input at {sc.i}")
    return d


def _pdrs(sc: _Scanner) -> PDRS:
    sc.eat("<")
    label = sc.number()
    sc.eat(",")
    refs = _braced(sc, lambda s: _pref(s, label))
    sc.eat(",")
    conds = _braced(sc, _pcond)
    sc.eat(",")
    maps = _braced(sc, _map)
    sc.eat(">")
    return PDRS(label, maps, refs, conds)


def _braced(sc: _Scanner, item) -> list:
    sc.eat("{")
    out = []
    while sc.peek() != "}":
        out.append(item(sc))
        if sc.peek() == ",":
            sc.eat(",")
    sc.eat("}")
    return out


def _pref(sc: _Scanner, default_label: int) -> PRef:
    # the reference grammar writes '(label,ref)'; show(SET) renders the
    # universe as bare names — accept both (bare → the PDRS's own label)
    # so show output round-trips
    if sc.peek() != "(":
        return PRef(default_label, PDRSRef(sc.name()))
    sc.eat("(")
    lbl = sc.number()
    sc.eat(",")
    ref = sc.name()
    sc.eat(")")
    return PRef(lbl, PDRSRef(ref))


def _map(sc: _Scanner) -> MAP:
    sc.eat("(")
    a = sc.number()
    sc.eat(",")
    b = sc.number()
    sc.eat(")")
    return MAP(a, b)


_NEG_WORDS = ("not", "neg")
_BIN_OPS = (("->", PImp), ("=>", PImp), ("imp", PImp), ("then", PImp),
            ("box", PBox), ("b", PBox), ("necessary", PBox),
            ("diamond", PDiamond), ("d", PDiamond), ("maybe", PDiamond),
            ("or", POr), ("v", POr))


def _pcond(sc: _Scanner) -> PCond:
    sc.eat("(")
    lbl = sc.number()
    sc.eat(",")
    cond = _cond_expr(sc)
    sc.eat(")")
    return PCond(lbl, cond)


def _cond_expr(sc: _Scanner):
    if sc.peek() == "!":
        sc.eat("!")
        return PNeg(_pdrs(sc))
    if sc.peek() == "<":
        left = _pdrs(sc)
        for tok, cls in _BIN_OPS:
            if sc.s.startswith(tok, sc.i):
                sc.i += len(tok)
                return cls(left, _pdrs(sc))
        raise ValueError(f"expected binary operator at {sc.i}")
    nm = sc.name()
    if nm in _NEG_WORDS and sc.peek() == "<":
        return PNeg(_pdrs(sc))
    if sc.peek() == ":":
        sc.eat(":")
        return PProp(PDRSRef(nm), _pdrs(sc))
    sc.eat("(")
    refs = [PDRSRef(sc.name())]
    while sc.peek() == ",":
        sc.eat(",")
        refs.append(PDRSRef(sc.name()))
    sc.eat(")")
    return PRel(nm, refs)
