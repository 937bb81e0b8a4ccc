"""CCGbank AUTO-derivation ingestion: bracket parser, category algebra,
combinator-rule classification, and execution-queue builder.

This is the entry point for users holding real CCGbank / EasySRL AUTO
derivations (LDC2005T13): it parses the bracketed derivation and builds
the bottom-up execution sequence — PushOp per leaf lexeme, ExecOp per
tree node — with the same observable contract as the reference engine's
derivation consumption path (re-expressed from scratch, not ported):

  - AUTO parsing:     reference ``ccg/__init__.py:49-86``
    (``parse_ccg_derivation2``)
  - rule identification: reference ``ccg/__init__.py:1427-1666``
    (``get_rule`` — FA/BA/FC/FX/BC/BX/FS/BS/GFC/GBC, type-raise,
    punctuation passes, conj rules, unary type-changes)
  - exec queue + heads: reference ``semantics/ccg.py:1646-1709``
    (``Ccg2Drs.build_execution_sequence``)
  - lexeme stems:     reference ``semantics/lexeme.py:241-278``

The golden gate is ``tests/test_reference_goldens.py``: the eight
derivations of the reference's ``test/exec_test.py`` must produce
byte-identical op-sequence reprs and head assignments.

The category algebra here is intentionally string-backed and memoized:
derivation ingestion is a driver-side / Arrow-batch operation over
strings, and the working set of distinct categories in a corpus is tiny
(CCGbank has ~1300), so every Cat is interned by signature.
"""

from __future__ import annotations

import re
from functools import lru_cache

# ---------------------------------------------------------------------------
# Category algebra
# ---------------------------------------------------------------------------

_FEATURE = re.compile(r"\[([a-z]+|X)\]")
_SIMPLIFY = re.compile(r"(?<=NP)\[(nb|conj)\]|(?<=S)\[([a-z]+|X)\]")
_N_TO_NP = re.compile(r"N(?=\\|/|\)|$)")
_PUNCT_SIGS = (",", ".", ":", ";", "LRB", "RRB", "LQU", "RQU")
_BRACKET_SIGS = ("LRB", "RRB", "LQU", "RQU")
_NP_NP_RE = re.compile(r"^NP(?:\[[a-z]+\])?/NP$")
_NOUN_RE = re.compile(r"^N(?:\[[a-z]+\])?$")


def _parens_match(s: str) -> bool:
    """True when s's first '(' matches its last ')' — i.e. stripping the
    outer pair is safe.  Without this check a partially-parenthesized
    signature like '(S\\NP)/(S\\NP)/NP' would strip parens from two
    DIFFERENT groups and silently corrupt the category."""
    depth = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i == len(s) - 1
    return False


def _split_sig(sig: str):
    """Split a signature at its top-level slash → (result, slash, arg).
    Atoms → (sig, '', '').  The result side drops one layer of outer
    parens; the argument side additionally drops a trailing [conj]
    (matching the reference's split, which treats ``X\\Y[conj]`` as a
    functor over Y)."""
    depth = 0
    for i in range(len(sig) - 1, -1, -1):
        c = sig[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
        elif depth == 0 and c in "/\\":
            res, arg = sig[:i], sig[i + 1:]
            if res.startswith("(") and res.endswith(")") \
                    and _parens_match(res):
                res = res[1:-1]
            if arg.startswith("("):
                if arg.endswith(")"):
                    arg = arg[1:-1]
                elif arg.endswith(")[conj]"):
                    arg = arg[1:-7]
            elif arg.endswith("[conj]"):
                arg = arg[:-6]
            return res, c, arg
    return sig, "", ""


class Cat:
    """Interned CCG category.  Use :func:`cat` — never construct directly."""

    __slots__ = ("sig", "_res", "_slash", "_arg")

    def __init__(self, sig: str):
        self.sig = sig
        self._res, self._slash, self._arg = _split_sig(sig)

    def __repr__(self):
        return self.sig or "<empty>"

    # identity — cat() interns by signature, so `is` works, but ==
    # compares signatures to stay safe across pickling
    def __eq__(self, other):
        return isinstance(other, Cat) and self.sig == other.sig

    def __hash__(self):
        return hash(self.sig)

    @property
    def isempty(self) -> bool:
        return self.sig == ""

    @property
    def isfunctor(self) -> bool:
        return self._slash != ""

    @property
    def isatom(self) -> bool:
        return not self.isfunctor and not self.isempty

    @property
    def ispunct(self) -> bool:
        return self.sig in _PUNCT_SIGS

    @property
    def isconj(self) -> bool:
        return "conj" in self.sig

    @property
    def isarg_right(self) -> bool:
        return self._slash == "/"

    @property
    def isarg_left(self) -> bool:
        return self._slash == "\\"

    @property
    def slash(self) -> str:
        return self._slash

    @property
    def ismodifier(self) -> bool:
        return self.isfunctor and self._res == self._arg

    def result(self) -> "Cat":
        return cat(self._res) if self.isfunctor else CAT_EMPTY

    def argument(self) -> "Cat":
        return cat(self._arg) if self.isfunctor else CAT_EMPTY

    def remove_features(self) -> "Cat":
        return cat(_FEATURE.sub("", self.sig))

    def remove_conj(self) -> "Cat":
        return cat(self.sig.replace("[conj]", ""))

    def simplify(self) -> "Cat":
        """Drop NP[nb]/NP[conj]/S[...] features, then N → NP."""
        return cat(_N_TO_NP.sub("NP", _SIMPLIFY.sub("", self.sig)))

    # -- unification ------------------------------------------------------

    def _atoms(self, out: list) -> list:
        if self.isfunctor:
            self.argument()._atoms(out)
            self.result()._atoms(out)
        else:
            out.append(self)
        return out

    def _slashes(self, out: list) -> list:
        if self.isfunctor:
            self.argument()._slashes(out)
            out.append(self._slash)
            self.result()._slashes(out)
        return out

    def scope_atoms(self) -> list:
        """Atom lists per application scope: [arg-atoms, result.arg-atoms,
        ..., [final atom]]."""
        if self.isempty:
            return []
        if self.isatom:
            return [[self]]
        c, out = self, []
        while c.isfunctor:
            out.append(c.argument()._atoms([]))
            c = c.result()
        out.append([c])
        return out

    def can_unify_atom(self, other: "Cat") -> bool:
        if not self.isatom or not other.isatom:
            return False
        if self.sig == other.sig:
            return True
        np_ish = ("PP", "NP", "N")
        if self.remove_features().sig in np_ish \
                and other.remove_features().sig in np_ish:
            return True
        s1, s2 = self.remove_conj(), other.remove_conj()
        if s1.sig == s2.sig or (s1.sig[:1] == "N" and s2.sig[:1] == "N"):
            return True
        if s1.sig[:1] == "S" and s2.sig[:1] == "S":
            # bare S unifies with any S[f]; S[to]~S[b]; S[dcl]~S[em]; S[X]
            # wildcard.  (The to/b legs compare the conj-stripped left
            # against the RAW right, faithfully to the reference.)
            return (len(s1.sig) == 1 or len(s2.sig) == 1
                    or (s1.sig == "S[to]" and other.sig == "S[b]")
                    or (s1.sig == "S[b]" and other.sig == "S[to]")
                    or (s1.sig == "S[dcl]" and s2.sig == "S[em]")
                    or (s1.sig == "S[em]" and s2.sig == "S[dcl]")
                    or s1.sig == "S[X]" or s2.sig == "S[X]")
        return False

    def can_unify(self, other: "Cat") -> bool:
        if self.isfunctor and other.isfunctor:
            fa, ga = self.scope_atoms(), other.scope_atoms()
            if len(fa) != len(ga):
                return False
            for f, g in zip(fa, ga):
                if len(f) != len(g):
                    return False
                if not all(a.can_unify_atom(b) for a, b in zip(f, g)):
                    return False
            return self._slashes([]) == other._slashes([])
        return self.can_unify_atom(other)


@lru_cache(maxsize=None)
def cat(sig: str) -> Cat:
    return Cat(sig)


CAT_EMPTY = cat("")
CAT_CONJ = cat("conj")
CAT_CONJ_CONJ = cat(r"conj\conj")
CAT_CONJCONJ = cat("conj/conj")
CAT_NUM = cat("N[num]")
_CONJ_CATS = (CAT_CONJ, CAT_CONJCONJ, CAT_CONJ_CONJ)


def combine(left: Cat, slash: str, right: Cat) -> Cat:
    """X, /, Y → X/Y with parens around functor components."""
    if right.isempty:
        return left
    ls = f"({left.sig})" if left.isfunctor else left.sig
    rs = f"({right.sig})" if right.isfunctor else right.sig
    return cat(ls + slash + rs)


# ---------------------------------------------------------------------------
# Rule classification
# ---------------------------------------------------------------------------

def classify_rule(left: Cat, right: Cat, result: Cat) -> str | None:
    """Name the combinator taking (left, right) → result, or None.

    The branch ORDER is part of the contract (several inputs satisfy
    more than one combinator's signature; CCGbank's convention picks the
    first) — it mirrors the reference's decision tree including its
    deliberate fall-throughs (a type-raise guard that matches neither
    raise direction falls off the chain and returns None)."""
    # punctuation passes
    if left.ispunct:
        if right.ispunct or right is CAT_EMPTY:
            return "LP"
        if right in _CONJ_CATS:
            return "RP"
        if right.can_unify(result):
            return "RP"
        return "R_UNARY_TC"
    if right.ispunct:
        if left in _CONJ_CATS:
            return "LP"
        if left.can_unify(result) or left.ispunct:
            return "LP"
        if left.isatom and result.isatom:
            return "ATOM_TC"
        if result.result().sig == result.argument().result().sig \
                and left.can_unify(result.argument().argument()):
            if result.isarg_right and result.argument().isarg_left:
                return "TR"
            if result.isarg_left and result.argument().isarg_right:
                return "TR"
            return None  # type-raise guard matched, direction didn't
        return "L_UNARY_TC"

    if left.isconj and right is not CAT_EMPTY and not right.ispunct:
        if left is CAT_CONJ:
            if right is CAT_CONJ_CONJ:
                return "BA"
            if right.can_unify(result):
                return "RP"
            if result.ismodifier and result.argument().can_unify(right):
                return "R_UNARY_TC"
            if right.isatom and result.isatom:
                return "ATOM_TC"
            if result.isconj:
                return "CONJ_TC"  # LDC2005T13 §3.7.2
            return None
        if left is CAT_CONJCONJ and right is CAT_CONJ:
            return "FA"
        if left.can_unify(right):
            return "LCONJ"
        return None
    if right.isconj and not left.ispunct:
        if right is CAT_CONJ:
            return "LCONJ"
        if left.can_unify(right):
            return "RCONJ"
        return None
    if left is CAT_EMPTY:
        return "RP"
    if _NP_NP_RE.match(left.sig) and right is CAT_NUM:
        return "RNUM"
    if right is CAT_EMPTY:
        if result.result().sig == result.argument().result().sig \
                and left.can_unify(result.argument().argument()):
            if result.isarg_right and result.argument().isarg_left:
                return "TR"
            if result.isarg_left and result.argument().isarg_right:
                return "TR"
            return None
        if left.can_unify(result):
            return "LP"
        if left.isatom and result.isatom:
            return "ATOM_TC"
        return "L_UNARY_TC"

    # X/Y Y → X
    if left.isarg_right and left.argument().can_unify(right) \
            and left.result().can_unify(result):
        return "FA"
    # X/Y Y|Z → X|Z
    if left.isarg_right and right.isfunctor \
            and left.argument().can_unify(right.result()) \
            and combine(left.result(), right.slash,
                        right.argument()).can_unify(result):
        return "FC" if right.isarg_right else "FX"
    # Y X\Y → X
    if right.isarg_left and right.argument().can_unify(left) \
            and right.result().can_unify(result):
        return "BA"
    # Y|Z X\Y → X|Z
    if right.isarg_left and left.isfunctor \
            and right.argument().can_unify(left.result()) \
            and combine(right.result(), left.slash,
                        left.argument()).can_unify(result):
        return "BC" if left.isarg_left else "BX"
    # (X/Y)|Z Y|Z → X|Z
    if left.isfunctor and right.isfunctor \
            and left.argument().can_unify(right.argument()) \
            and left.result().isarg_right and left.slash == right.slash \
            and left.result().argument().can_unify(right.result()) \
            and combine(left.result().result(), left.slash,
                        right.argument()).can_unify(result):
        return "FS" if right.isarg_right else "FXS"
    # Y|Z (X\Y)|Z → X|Z
    if left.isfunctor and right.isfunctor \
            and right.argument().can_unify(left.argument()) \
            and right.result().isarg_left and left.slash == right.slash \
            and right.result().argument().can_unify(left.result()) \
            and combine(right.result().result(), left.slash,
                        left.argument()).can_unify(result):
        return "BS" if right.isarg_left else "BXS"
    # X/Y (Y|Z)|$ → (X|Z)|$
    if left.isarg_right and right.isfunctor and right.result().isfunctor \
            and right.result().slash == result.result().slash \
            and left.argument().can_unify(right.result().result()) \
            and combine(combine(left.result(), right.result().slash,
                                right.result().argument()),
                        right.slash, right.argument()).can_unify(result):
        return "GFC" if right.result().isarg_right else "GFX"
    # (Y|Z)|$ X\Y → (X|Z)|$
    if right.isarg_left and left.isfunctor and left.result().isfunctor \
            and left.result().slash == result.result().slash \
            and right.argument().can_unify(left.result().result()) \
            and combine(combine(right.result(), left.result().slash,
                                left.result().argument()),
                        left.slash, left.argument()).can_unify(result):
        return "GBC" if left.result().isarg_left else "GBX"
    return None


# ---------------------------------------------------------------------------
# AUTO bracket parsing
# ---------------------------------------------------------------------------

class TNode:
    __slots__ = ("cat_sig", "head", "count", "children")

    def __init__(self, cat_sig, head, count):
        self.cat_sig = cat_sig
        self.head = head
        self.count = count
        self.children = []


class LNode:
    __slots__ = ("cat_sig", "word", "pos", "orig_pos", "predarg")

    def __init__(self, cat_sig, word, pos, orig_pos, predarg):
        self.cat_sig = cat_sig
        self.word = word
        self.pos = pos
        self.orig_pos = orig_pos
        self.predarg = predarg


_AUTO_TOKEN = re.compile(r"\(<([^>]*)>|\)")


def parse_auto(text: str):
    """Parse one AUTO derivation string → tree of TNode/LNode.

    Node grammar (LDC2005T13): ``(<T cat head count> child... )`` and
    ``(<L cat mod_POS orig_POS word predarg>)``."""
    root: list = []
    stack: list = [root]
    for m in _AUTO_TOKEN.finditer(text):
        if m.group(0) == ")":
            if len(stack) < 2:
                raise ValueError("unbalanced AUTO derivation")
            done = stack.pop()
            parent = stack[-1]
            (parent if isinstance(parent, list)
             else parent.children).append(done)
        else:
            fields = m.group(1).split()
            if fields[0] == "T":
                if len(fields) != 4:
                    raise ValueError(f"bad T node: {m.group(1)!r}")
                stack.append(TNode(fields[1], int(fields[2]),
                                   int(fields[3])))
            elif fields[0] == "L":
                if len(fields) != 6:
                    raise ValueError(f"bad L node: {m.group(1)!r}")
                stack.append(LNode(fields[1], fields[4], fields[2],
                                   fields[3], fields[5]))
            else:
                raise ValueError(f"unknown AUTO node: {m.group(1)!r}")
    if len(stack) != 1 or len(root) != 1:
        raise ValueError(f"expected exactly one root derivation")
    return root[0]


# ---------------------------------------------------------------------------
# Lexeme stems
# ---------------------------------------------------------------------------

_PUNCT_CHARS = "?.,:;"
_VERB_POS = ("VB", "VBD", "VBN", "VBP", "VBZ", "VBG")


def lexeme_stem(word: str, pos: str, category: Cat) -> str:
    """Stem shown in a PushOp: punctuation and ALL-CAPS nouns pass
    through (trailing punctuation stripped), proper nouns title-case,
    verbs/gerunds lemmatize, everything else lowers."""
    from ie_spark.textproc.lexicon import lemmatize_verb
    if word in _PUNCT_CHARS:
        return word
    wd = word[:-2] if len(word) > 2 and word.endswith("'s") else word
    if (pos in ("NN", "NNS") or _NOUN_RE.match(category.sig)) \
            and wd.upper() == wd:
        return word.rstrip(_PUNCT_CHARS)
    if pos in ("NNP", "NNPS"):
        if wd.upper() == wd:
            return word.rstrip(_PUNCT_CHARS)
        return word.title().rstrip(_PUNCT_CHARS)
    stem = word.lower().rstrip(_PUNCT_CHARS)
    if pos in _VERB_POS:
        return lemmatize_verb(stem)
    return stem


# ---------------------------------------------------------------------------
# Execution queue
# ---------------------------------------------------------------------------

class PushOp:
    __slots__ = ("stem", "category", "pos", "word", "idx")

    def __init__(self, stem, category, pos, word, idx):
        self.stem = stem
        self.category = category
        self.pos = pos
        self.word = word
        self.idx = idx

    def __repr__(self):
        return f"<PushOp>:({self.stem}, {self.category.sig}, {self.pos})"


class ExecOp:
    __slots__ = ("nops", "rule", "category")

    def __init__(self, nops, rule, category):
        self.nops = nops
        self.rule = rule
        self.category = category

    def __repr__(self):
        return f"<ExecOp>:({self.nops}, {self.rule} {self.category.sig})"


class ExecQueue:
    """Result of :func:`build_exec_sequence` — the bottom-up op list, the
    lexeme list in sentence order, and word-level head indices."""

    def __init__(self):
        self.ops: list = []
        self.lexemes: list[PushOp] = []
        self.heads: list[int] = []

    @property
    def words(self) -> list[str]:
        return [lx.word for lx in self.lexemes]


def build_exec_sequence(tree) -> ExecQueue:
    """Walk the derivation bottom-up: leaves push lexemes, internal nodes
    execute a classified combinator; binary nodes resolve the dependent
    child's head to the head child's lexeme index."""
    q = ExecQueue()

    def walk(node) -> int:
        if isinstance(node, LNode):
            c = cat(node.cat_sig)
            pos = node.pos
            word = node.word
            # modals act as verb modifiers (no own event): strip features
            if pos == "MD":
                simpler = c.remove_features().simplify()
                if simpler.ismodifier:
                    c = simpler
            elif word == "'s" and pos != "POS" and not c.ismodifier \
                    and _returns_vp(c):
                word = "is"
            elif word == "'nt":
                word = "not"
            idx = len(q.lexemes)
            op = PushOp(lexeme_stem(word, pos, c), c, pos, node.word, idx)
            q.lexemes.append(op)
            q.heads.append(idx)  # self-headed until an ExecOp resolves it
            q.ops.append(op)
            return idx

        result = cat(node.cat_sig)
        idxs = []
        op_end = []
        for child in node.children:
            idxs.append(walk(child))
            op_end.append(len(q.ops) - 1)
        if node.count != len(idxs):
            raise ValueError("T-node count does not match children")

        def rule_cat(op):
            c = op.category
            return CAT_EMPTY if c.sig in _BRACKET_SIGS else c

        if node.count == 2:
            if node.head not in (0, 1):
                raise ValueError(
                    f"binary T-node head must be 0 or 1, got {node.head}")
            l, r = rule_cat(q.ops[op_end[0]]), rule_cat(q.ops[-1])
            rule = classify_rule(l, r, result)
            if rule is None:
                rule = classify_rule(l.simplify(), r.simplify(), result)
            if rule is None:
                raise ValueError(
                    f"no rule for {l!r} {r!r} -> {result!r}")
            head = node.head
            q.heads[idxs[1 - head]] = idxs[head]
            q.ops.append(ExecOp(2, rule, result))
            return idxs[head]
        if node.count != 1:
            raise ValueError(f"T-node with {node.count} children")
        if node.head >= len(idxs):
            raise ValueError(
                f"T-node head {node.head} out of range for "
                f"{len(idxs)} child(ren)")
        l = rule_cat(q.ops[-1])
        rule = classify_rule(l, CAT_EMPTY, result)
        if rule is None:
            rule = classify_rule(l.simplify(), CAT_EMPTY, result)
        if rule is None:
            raise ValueError(f"no unary rule for {l!r} -> {result!r}")
        q.ops.append(ExecOp(1, rule, result))
        return idxs[node.head]

    walk(tree)
    # head chains resolve transitively except the root, which self-heads
    return q


def _returns_vp(c: Cat) -> bool:
    """Category ultimately returns S\\NP (the reference's CAT_VP
    test_return)."""
    vp = cat(r"S\NP")
    while c.isfunctor:
        if c.remove_features().sig == vp.sig:
            return True
        c = c.result()
    return False


def derivation_to_ops(text: str) -> ExecQueue:
    """Parse one AUTO derivation and build its execution queue."""
    return build_exec_sequence(parse_auto(text))


def to_auto(node, pretty: bool = True, _depth: int = 0) -> str:
    """Regenerate the CCGbank AUTO string for a parsed derivation tree —
    the reference's ``get_predarg_ccgbank(pretty=True)`` round-trip
    (asserted byte-equal to the input in its exec_test).  Pretty form:
    2-space indent per level, T-node closer at its opener's indent."""
    pad = "  " * _depth if pretty else ""
    if isinstance(node, LNode):
        return (f"{pad}(<L {node.cat_sig} {node.pos} {node.orig_pos} "
                f"{node.word} {node.predarg}>)")
    head = f"{pad}(<T {node.cat_sig} {node.head} {node.count}>"
    kids = [to_auto(c, pretty, _depth + 1) for c in node.children]
    if pretty:
        return "\n".join([head] + kids + [pad + ")"])
    return " ".join([head] + kids + [")"])


# ---------------------------------------------------------------------------
# Distributed entry point
# ---------------------------------------------------------------------------

DERIVATION_OUT_SCHEMA = ("id string, words array<string>, "
                         "stems array<string>, heads array<int>, "
                         "ops array<string>, error string")


def parse_derivations(df, id_col: str = "id",
                      derivation_col: str = "derivation"):
    """Batch-parse a DataFrame of AUTO derivation strings → one row per
    derivation with its word list, stems, word-level heads, and the
    byte-exact op-sequence reprs.

    The reference's batch path is ``scripts/make_easysrl_drs.py:46-121``
    (file-at-a-time loop); here each Arrow batch parses independently, so
    the operator scales with input partitioning and shuffles nothing.
    A malformed derivation dead-letters its row (null ops + ``error``)
    instead of failing the task — same row-isolation convention as the
    extraction pipeline."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for rid, txt in zip(pdf[id_col], pdf[derivation_col]):
                try:
                    q = derivation_to_ops(txt or "")
                    rows.append((rid, q.words,
                                 [lx.stem for lx in q.lexemes],
                                 q.heads, [repr(op) for op in q.ops],
                                 None))
                except Exception as e:  # noqa: BLE001 - dead-letter row
                    rows.append((rid, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["id", "words", "stems",
                                              "heads", "ops", "error"])

    src = df.select(df[id_col].cast("string").alias(id_col),
                    df[derivation_col].alias(derivation_col))
    return src.mapInPandas(gen, schema=DERIVATION_OUT_SCHEMA)
