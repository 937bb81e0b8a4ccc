"""Set/NLTK-notation DRS parsers (reference B28, ie/parse.py:337-387) —
round-trip across all three notations and into the FOL exports.  Input
strings are the reference's own parse_drs test arguments
(drt/test/drs_test.py, compose_test.py dexpr usages)."""

import pytest

from ie_spark.extraction.drs import drs_to_fol, drs_to_mfol
from ie_spark.extraction.drs_parse import parse_drs, show_linear, show_set

REFERENCE_INPUTS = [
    # drs_test.py test01/test02/test03/test04 parse_drs arguments
    ("<{x},{man(x),happy(x)}>", "[x| man(x),happy(x)]"),
    ("<{x},{man(x), not <{},{happy(x)}>}>",
     "[x| man(x),¬[| happy(x)]]"),
    ("<{},{<{x,y},{farmer(x),donkey(y),owns(x,y)}> -> <{},{feeds(x,y)}>}>",
     "[| [x,y| farmer(x),donkey(y),owns(x,y)] ⇒ [| feeds(x,y)]]"),
    ("<{x,y,p},{man(x),woman(y),believes(x,p),p: <{},{loves(x,y)}>}>",
     "[x,y,p| man(x),woman(y),believes(x,p),p: [| loves(x,y)]]"),
    # nltk grammar (parse.py docstring / nltk drt howto)
    ("([x, y], [man(x), woman(y), loves(x,y)])",
     "[x,y| man(x),woman(y),loves(x,y)]"),
    ("([x],[man(x), -([],[happy(x)])])",
     "[x| man(x),¬[| happy(x)]]"),
]


@pytest.mark.parametrize("src,linear", REFERENCE_INPUTS,
                         ids=[s[:30] for s, _ in REFERENCE_INPUTS])
def test_reference_notations_parse_to_linear(src, linear):
    assert show_linear(parse_drs(src)) == linear


@pytest.mark.parametrize("src,linear", REFERENCE_INPUTS,
                         ids=[s[:30] for s, _ in REFERENCE_INPUTS])
def test_three_way_round_trip(src, linear):
    t = parse_drs(src)
    # linear → parse → linear and set → parse → linear are fixed points
    assert show_linear(parse_drs(show_linear(t))) == linear
    assert show_linear(parse_drs(show_set(t))) == linear
    # both FOL exports accept the parsed form
    assert isinstance(drs_to_fol(linear), str)
    assert isinstance(drs_to_mfol(linear), str)


def test_operator_word_aliases():
    # parse.py docstring: '!/not/neg', 'imp/->/=>/then', 'v/or',
    # 'b/box/necessary', 'd/diamond/maybe'
    base = "[x| man(x),¬[| happy(x)]]"
    for neg in ("!", "not", "neg"):
        assert show_linear(parse_drs(
            f"<{{x}},{{man(x), {neg} <{{}},{{happy(x)}}>}}>")) == base
    for imp in ("imp", "->", "=>", "then"):
        got = show_linear(parse_drs(
            f"<{{}},{{<{{x}},{{a(x)}}> {imp} <{{}},{{b(x)}}>}}>"))
        assert got == "[| [x| a(x)] ⇒ [| b(x)]]"
    assert "◇" in show_linear(parse_drs(
        "<{x},{maybe <{},{runs(x)}>}>"))
    assert "◻" in show_linear(parse_drs(
        "<{x},{necessary <{},{dies(x)}>}>"))


def test_single_letter_alias_vs_relation_name():
    # 'B(x)' is a relation, 'b <...>' is the Box alias — the parser must
    # not read a capital-B relation as a modal operator
    t = parse_drs("<{x},{B(x), b <{},{c(x)}>}>")
    assert show_linear(t) == "[x| B(x),◻[| c(x)]]"


def test_prop_condition_to_mfol():
    lin = show_linear(parse_drs(
        "<{x,y,p},{man(x),woman(y),believes(x,p),p: <{},{loves(x,y)}>}>"))
    # reference drs_test.py test04 golden FOL
    assert drs_to_mfol(lin) == (
        "∃x∃y∃p(man(w,x) ∧ (woman(w,y) ∧ (believes(w,x,p) ∧ "
        "(Acc(w,p) ∧ loves(w,x,y)))))")


def test_syntax_errors_raise():
    for bad in ("<{x},{man(x)}", "<{x}>", "([x],[man(x)]", "nonsense"):
        with pytest.raises(SyntaxError):
            parse_drs(bad)


def test_bare_sub_box_round_trips():
    # review r4 pass-2: a bare sub-box condition is valid linear input
    # (drs_to_fol renders it as an Or-tree leaf) and must round-trip
    for s in ("[| [x| a(x)]]", "<{},{<{x},{a(x)}>}>"):
        assert show_linear(parse_drs(s)) == "[| [x| a(x)]]"


def test_malformed_chars_raise_fast():
    # review r4 pass-2: non-word chars inside ref/argument lists used to
    # spin the parser forever; they must raise like other bad input
    for bad in ("<{x;y},{a(x)}>", "<{x},{a(x;y)}>", "<{x},{a(x,)}>"
                .replace(",)", ";)"),):
        with pytest.raises(SyntaxError):
            parse_drs(bad)


def test_merge_alpha_renaming_goldens():
    # drt/test/drs_test.py test06_MergeHappyNotHappyMan: colliding bound
    # x in the second DRS α-renames to x1, including inside the Neg box
    from ie_spark.extraction.drs_parse import merge, parse_drs, \
        show_linear, show_set
    h = parse_drs('<{x},{man(x),happy(x)}>')
    nh = parse_drs('<{x},{man(x),not<{},{happy(x)}>}>')
    m = merge(h, nh)
    assert show_set(m) == \
        '<{x,x1},{man(x),happy(x),man(x1),¬<{},{happy(x1)}>}>'
    assert show_linear(m) == \
        '[x,x1| man(x),happy(x),man(x1),¬[| happy(x1)]]'


def test_merge_free_refs_bind_into_first():
    # test07: a FREE x in the second DRS is not renamed — it binds to
    # the first DRS's universe; test08: chained merges build 'a record
    # date' with nn(y,x) keeping the free x
    from ie_spark.extraction.drs_parse import merge, parse_drs, show_set
    d1 = parse_drs('<{x},{man(x),not<{},{happy(x)}>}>')
    d2 = parse_drs('<{},{sad(x)}>')
    assert show_set(merge(d1, d2)) == \
        '<{x},{man(x),¬<{},{happy(x)}>,sad(x)}>'
    a = parse_drs('<{x},{}>')
    record = parse_drs('<{y},{record(y),nn(y,x)}>')
    date = parse_drs('<{},{date(x)}>')
    assert show_set(merge(a, merge(record, date))) == \
        '<{x,y},{record(y),nn(y,x),date(x)}>'


def test_merge_nltk_notation():
    # test09_NLTK0: merging two NLTK-notation DRSs equals the combined
    # parse tree
    from ie_spark.extraction.drs_parse import merge, parse_drs
    n1 = parse_drs('([x], [man(x), walk(x)])')
    n2 = parse_drs('([y], [woman(y), stop(y)])')
    x = parse_drs('([x, y], [man(x), walk(x), woman(y), stop(y)])')
    assert merge(n1, n2) == x


def test_merge_shadowed_rebinding_not_renamed():
    # a sub-box that REBINDS the colliding name shadows the outer
    # binding: the inner occurrences stay untouched
    from ie_spark.extraction.drs_parse import merge, parse_drs, show_set
    d1 = parse_drs('<{x},{man(x)}>')
    d2 = parse_drs('<{x},{walk(x),not<{x},{run(x)}>}>')
    out = show_set(merge(d1, d2))
    assert out == '<{x,x1},{man(x),walk(x1),¬<{x},{run(x)}>}>'


def test_merge_roundtrip_fuzz():
    # invariant: rendering a merge and re-parsing it yields the same
    # tree, for random DRS pairs with overlapping universes
    import random

    from ie_spark.extraction.drs_parse import merge, parse_drs, \
        show_linear, show_set
    rng = random.Random(13)
    names = ["x", "y", "z", "e"]
    rels = ["man", "walk", "see", "happy", "own"]

    def rand_box(depth=0):
        refs = sorted(set(rng.sample(names, rng.randint(0, 2))))
        conds = []
        for _ in range(rng.randint(1, 3)):
            if depth < 2 and rng.random() < 0.3:
                op = rng.choice(["neg", "diamond", "box"])
                conds.append((op, rand_box(depth + 1)))
            else:
                args = rng.sample(names, rng.randint(1, 2))
                conds.append(f"{rng.choice(rels)}({','.join(args)})")
        return (refs, conds)

    for _ in range(300):
        a, b = rand_box(), rand_box()
        m = merge(a, b)
        assert parse_drs(show_set(m)) == (list(m[0]), list(m[1])) \
            or parse_drs(show_set(m)) == m
        assert parse_drs(show_linear(m)) == parse_drs(show_set(m))
        # merged universe binds each original bound ref exactly once
        assert len(m[0]) == len(a[0]) + len(b[0])
        assert len(set(m[0])) == len(m[0])
