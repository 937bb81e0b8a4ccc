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
