"""C15 ConceptNet client — offline parity tests with a fake transport.

The reference class (``kb/conceptnet.py:17-69``) hard-codes live HTTP,
so its behavior is pinned here against a reply shaped exactly like the
ConceptNet 5 API: rel-label indexing preserves reply order, edge field
projection is field-for-field, ``edges()`` on an unknown relation
returns ``None``.  No test touches the network.
"""

import pytest

from ie_spark.kb.conceptnet import (
    Conceptnet, concept_path, conceptnet_edges, process_edges, RELATIONS,
)


def _edge(rel, start, end, weight=1.0, surface=None):
    return {
        "start": {"label": start, "@id": f"/c/en/{start}"},
        "end": {"label": end, "@id": f"/c/en/{end}"},
        "weight": weight,
        "dataset": "/d/conceptnet/4/en",
        "sources": [{"contributor": "/s/contributor/omcs/test"}],
        "rel": {"label": rel, "@id": f"/r/{rel}"},
        "@id": f"/a/[/r/{rel}/,/c/en/{start}/,/c/en/{end}/]",
        "surfaceText": surface,
    }


REPLY = {
    "@id": "/c/en/coffee",
    "edges": [
        _edge("RelatedTo", "coffee", "caffeine", 2.5),
        _edge("UsedFor", "coffee", "waking_up", 1.0,
              "[[coffee]] is used for [[waking up]]"),
        _edge("RelatedTo", "coffee", "bean", 1.5),
        _edge("AtLocation", "coffee", "cafe", 1.0),
    ],
}


FETCH_CALLS = []


def fake_fetch(term):
    FETCH_CALLS.append(term)
    if term == "coffee":
        return REPLY
    return {"@id": f"/c/en/{term}", "edges": []}


def test_reference_relations_list_is_pinned():
    assert "RelatedTo" in RELATIONS and "FormOf" in RELATIONS
    assert len(RELATIONS) == 11


def test_term_normalization_and_rel_indexing():
    cn = Conceptnet("  Coffee ", fetch=fake_fetch)
    assert cn.term == "coffee"
    # insertion-ordered rel grouping, as the reference's OrderedDict
    assert list(cn.relations) == ["RelatedTo", "UsedFor", "AtLocation"]
    related = cn.edges("RelatedTo")
    assert [e["end"]["label"] for e in related] == ["caffeine", "bean"]
    assert related[0]["weight"] == 2.5
    assert related[0]["id"].startswith("/a/[/r/RelatedTo/")
    # unknown relation -> None, not an exception (reference:64-69)
    assert cn.edges("HasA") is None


def test_concept_path_multiword_and_control_chars():
    # ConceptNet URIs underscore multi-word concepts; control chars and
    # reserved characters are percent-encoded, never passed raw
    assert concept_path("ice cream") == "ice_cream"
    assert concept_path("ice\tcream\n") == "ice_cream"
    assert concept_path("a/b") == "a%2Fb"


def test_malformed_edge_skipped_not_fatal():
    reply = {"edges": [_edge("HasA", "coffee", "aroma"),
                       {"rel": {"label": "Broken"}}]}
    idx = process_edges(reply)
    assert list(idx) == ["HasA"]


def test_batch_edges_fetch_once_per_distinct_term(spark):
    terms = spark.createDataFrame(
        [("Coffee",), ("coffee",), (" COFFEE ",), ("coffee\t",),
         ("\ncoffee",), ("tea",), (None,)],
        "term string")
    FETCH_CALLS.clear()
    df = conceptnet_edges(spark, terms, fetch=fake_fetch)
    rows = df.collect()
    # 4 edges for coffee, 0 for tea; the three coffee spellings collapse
    assert len(rows) == 4
    assert sorted(set(FETCH_CALLS)) == ["coffee", "tea"]
    assert FETCH_CALLS.count("coffee") == 1
    by_rel = {r["rel"] for r in rows}
    assert by_rel == {"RelatedTo", "UsedFor", "AtLocation"}
    surface = {r["rel"]: r["surface_text"] for r in rows}
    assert surface["UsedFor"] == "[[coffee]] is used for [[waking up]]"
    assert df.columns == ["term", "rel", "start_label", "end_label",
                          "weight", "dataset", "edge_id", "surface_text"]


def test_batch_guard_raises_on_unbounded_vocabulary(spark):
    terms = spark.range(12).selectExpr("cast(id as string) as term")
    with pytest.raises(ValueError, match="vocabulary-bounded"):
        conceptnet_edges(spark, terms, fetch=fake_fetch, max_terms=10)
