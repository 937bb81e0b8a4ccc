"""PDRS algebra gate — reference drt/test/pdrs_test.py's WELL-DEFINED
goldens, byte-exact where the reference asserts strings.

Scope note (documented divergence): the reference's PDRS module is
test-tooling whose own suite contains FIXME'd-out assertions, an input
typo ('yd'), and a pmerge that would crash on attribute typos — so this
gate keeps the reference's *asserted, runnable* expectations (show
strings, FOL exports, amerge equality, purify universes, structural
queries) and adds directed MAP-accessibility tests from the PDT model
definition in place of the reference's undirected projection graph.
"""

from ie_spark.extraction.pdrs import (
    MAP,
    PCond,
    PDRS,
    PDRSRef,
    PRef,
    PRel,
    SHOW_BOX,
    SHOW_LINEAR,
    SHOW_SET,
    amerge,
    parse_pdrs,
    pmerge,
)


def _man_happy():
    man = PDRS(1, [], [PRef(1, PDRSRef("x"))],
               [PCond(1, PRel("man", [PDRSRef("x")]))])
    happy = PDRS(1, [], [],
                 [PCond(1, PRel("happy", [PDRSRef("x")]))])
    return man, happy


def test_pdrs_empty_show_and_fol():
    """Reference pdrs_test.py test0_Empty — byte-exact."""
    d = PDRS(1, [], [], [])
    assert d.show(SHOW_SET) == "<1,{},{},{}>"
    assert d.show(SHOW_BOX) == (
        "┌--1--┐\n|     |\n├-----┤\n|     |\n"
        "|     |\n├-----┤\n|     |\n|     |\n└-----┘\n")
    assert d.show(SHOW_LINEAR) == "1:[||]"
    f, _ = d.to_fol()
    assert f.show(SHOW_SET) == "⊤"


def test_pdrs_happy_man_show_predicates_fol():
    """Reference pdrs_test.py test1_HappyMan — byte-exact."""
    d = PDRS(1, [], [PRef(1, PDRSRef("x"))],
             [PCond(1, PRel("man", [PDRSRef("x")])),
              PCond(1, PRel("happy", [PDRSRef("x")]))])
    assert d.show(SHOW_SET) == "<1,{x},{(1,man(x)),(1,happy(x))},{}>"
    assert d.show(SHOW_LINEAR) == "1:[x|(1,man(x)),(1,happy(x))|]"
    assert d.isresolved and not d.ismerge
    assert d.isproper and d.ispure and d.isfol
    f, _ = d.to_fol()
    assert f.show(SHOW_SET) == \
        "∃x(man(w,x) ∧ happy(w,x))"


def test_pdrs_amerge_matches_reference_expectation():
    """Reference test3_MergeHappyMan: assertive merge binds happy's free
    x against man's universe with NO renaming."""
    man, happy = _man_happy()
    d = amerge(man, happy)
    x = PDRS(1, [], [PRef(1, PDRSRef("x"))],
             [PCond(1, PRel("man", [PDRSRef("x")])),
              PCond(1, PRel("happy", [PDRSRef("x")]))])
    assert d == x


def test_pdrs_pmerge_projects_presupposition():
    """Reference test3's constructed pmerge expectation ('The man is
    happy'): man's content moves to a fresh context 2, MAP (1,2) makes it
    accessible from the main context, happy stays at 1."""
    man, happy = _man_happy()
    d = pmerge(man, happy)
    x = PDRS(1, [(1, 2)], [PRef(2, PDRSRef("x"))],
             [PCond(2, PRel("man", [PDRSRef("x")])),
              PCond(1, PRel("happy", [PDRSRef("x")]))])
    assert d == x
    # the presupposed x IS accessible from the main context
    assert d.has_bound(PRef(1, PDRSRef("x")), 1)


NLTK = ("<1,{(1,x)},{(1,A(c)),(2,<2,{(2,y)},{(2,B(x,y,z,a))},{}> -> "
        "<3,{(3,z)},{(3,C(x,yd,z,a))},{}>)},{}>")


def test_pdrs_parse_structure_and_subdrs():
    """Reference test2_NLTKRegressions structural assertions."""
    d = parse_pdrs(NLTK)
    assert len(d.conditions) == 2
    ant = d.conditions[1].cond.antecedent
    cons = d.conditions[1].cond.consequent
    assert d.has_subdrs(ant) and d.has_subdrs(cons)
    assert not ant.has_subdrs(cons)


def test_pdrs_binding_and_universes():
    d = parse_pdrs(NLTK)
    # bound: x globally; y in antecedent AND consequent (antecedent is
    # accessible from the consequent); z only in the consequent
    assert d.has_bound(PRef(1, PDRSRef("x")), 1)
    assert d.has_bound(PRef(2, PDRSRef("y")), 2)
    assert d.has_bound(PRef(3, PDRSRef("y")), 3)
    assert d.has_bound(PRef(3, PDRSRef("z")), 3)
    # unbound: a, c anywhere; z at the top and in the antecedent
    assert not d.has_bound(PRef(1, PDRSRef("a")), 1)
    assert not d.has_bound(PRef(1, PDRSRef("c")), 1)
    assert not d.has_bound(PRef(1, PDRSRef("z")), 1)
    assert not d.has_bound(PRef(2, PDRSRef("z")), 2)
    # universes (reference-asserted)
    ant = d.conditions[1].cond.antecedent
    cons = d.conditions[1].cond.consequent
    assert [r.ref.name for r in d.universe] == ["x"]
    assert [r.ref.name for r in ant.universe] == ["y"]
    assert [r.ref.name for r in cons.universe] == ["z"]
    assert sorted(r.name for r in d.get_universes()) == ["x", "y", "z"]
    assert {r.name for r in d.get_variables()} == \
        {"a", "c", "x", "y", "yd", "z"}


def test_pdrs_purify_renames_capture_prone_universe():
    """Reference-asserted: purified universes are {x, y, z1} — the
    consequent's bound z renames because z is also free upstream."""
    d = parse_pdrs(NLTK)
    dp = d.purify()
    assert sorted(r.name for r in dp.get_universes()) == ["x", "y", "z1"]
    # free refs are untouched by purification
    assert {r.name for r in dp.get_freerefs()} == \
        {r.name for r in d.get_freerefs()}


def test_pdrs_map_accessibility_directed():
    """MAP(p1, p2) makes p2's universe visible from p1 — and only in
    that direction; implication consequents see their antecedents."""
    d = parse_pdrs(NLTK)
    assert sorted(d.accessible_contexts(3)) == [1, 2, 3]
    assert sorted(d.accessible_contexts(2)) == [1, 2]
    assert sorted(r.name for r in d.accessible_universe(3)) == \
        ["x", "y", "z"]
    assert sorted(r.name for r in d.accessible_universe(2)) == ["x", "y"]
    # an explicit MAP opens a context that is otherwise invisible
    m = PDRS(1, [MAP(1, 2)], [PRef(2, PDRSRef("x"))],
             [PCond(1, PRel("happy", [PDRSRef("x")]))])
    assert m.has_bound(PRef(1, PDRSRef("x")), 1)
    no_map = PDRS(1, [], [PRef(2, PDRSRef("x"))],
                  [PCond(1, PRel("happy", [PDRSRef("x")]))])
    assert not no_map.has_bound(PRef(1, PDRSRef("x")), 1)
    # strict subordination notation (negative target) still opens access
    strict = PDRS(1, [MAP(2, -1)], [PRef(2, PDRSRef("x"))],
                  [PCond(2, PRel("man", [PDRSRef("x")])),
                   PCond(1, PRel("happy", [PDRSRef("x")]))])
    assert strict.has_accessible_context(2, 1)


def test_pdrs_parse_round_trip():
    """show(SET) of a parse re-parses to an equal structure."""
    d = parse_pdrs(NLTK)
    assert parse_pdrs(d.conditions[1].cond.antecedent.show(SHOW_SET)) \
        == d.conditions[1].cond.antecedent
    # negation / proposition / or forms parse too
    n = parse_pdrs("<1,{(1,x)},{(1,not<2,{},{(2,sad(x))},{}>),"
                   "(1,p:<3,{},{(3,rain(e))},{}>)},{}>")
    assert len(n.conditions) == 2
    o = parse_pdrs("<1,{},{(1,<2,{},{(2,a(x))},{}> or "
                   "<3,{},{(3,b(x))},{}>)},{}>")
    assert len(o.conditions) == 1


def test_pdrs_amerge_keeps_distinct_bound_referents():
    """Review finding: two boxes each introducing bound x must merge to
    TWO referents (alpha-renaming d2's colliding bound x), and the
    result must be pure."""
    man = PDRS(1, [], [PRef(1, PDRSRef("x"))],
               [PCond(1, PRel("man", [PDRSRef("x")]))])
    woman = PDRS(1, [], [PRef(1, PDRSRef("x"))],
                 [PCond(1, PRel("woman", [PDRSRef("x")]))])
    d = amerge(man, woman)
    assert d.ispure
    assert len(d.universe) == 2
    assert len({r.ref.name for r in d.universe}) == 2


def test_pdrs_merges_accept_raw_conditions():
    """Review finding: merges must accept conditions that are not
    PCond-wrapped, like every other method."""
    man = PDRS(1, [], [PRef(1, PDRSRef("x"))], [PRel("man", [PDRSRef("x")])])
    happy = PDRS(1, [], [], [PRel("happy", [PDRSRef("x")])])
    assert pmerge(man, happy).has_accessible_context(1, 2)
    assert len(amerge(man, happy).conditions) == 2


def test_pdrs_fol_empty_antecedent_and_modals():
    """Review finding: an implication with a relation-free antecedent
    exports ⊤ on the left (not malformed FOL), and modal conditions
    export via the accessibility relation instead of vanishing."""
    d = parse_pdrs("<1,{},{(1,<2,{(2,y)},{},{}> -> "
                   "<3,{},{(3,C(y))},{}>)},{}>")
    f, _ = d.to_fol()
    assert f.show(SHOW_SET) == "∀y(⊤ → C(w,y))"
    m = parse_pdrs("<1,{},{(1,<2,{},{(2,p(x))},{}> b "
                   "<3,{},{(3,q(x))},{}>)},{}>")
    f, _ = m.to_fol()
    assert "Acc(w,w1)" in f.show(SHOW_SET)
    assert "p(w1,x)" in f.show(SHOW_SET) and "q(w1,x)" in f.show(SHOW_SET)


def test_pdrs_show_keeps_projection_labels():
    """Review finding: a referent projected at a DIFFERENT label than its
    box renders labeled, so show → parse round-trips the projection."""
    man, happy = _man_happy()
    pm = pmerge(man, happy)
    assert pm.show(SHOW_SET) == \
        "<1,{(2,x)},{(2,man(x)),(1,happy(x))},{(1,2)}>"
    assert parse_pdrs(pm.show(SHOW_SET)) == pm
