"""Preprocessing parity with the reference's utils/text.py semantics."""

from ie_spark.textproc.preprocess import preprocess_sentence, split_sentences


def test_clitic_split_possessive():
    assert preprocess_sentence("Bob's report.") == "Bob 's report ."


def test_nt_split_and_rejoin():
    assert "did n't" in preprocess_sentence("He didn't go.")
    # wa/ca/sha are not vocabulary words — reference rejoins them
    assert "won't" in preprocess_sentence("He won't go.")
    assert "can't" in preprocess_sentence("He can't go.")


def test_punct_spacing():
    out = preprocess_sentence("Anna, a doctor, left.")
    assert " , " in out
    assert out.endswith(" .")


def test_unicode_quotes():
    assert "'" in preprocess_sentence("Bob’s car")
    assert '"' in preprocess_sentence("“quoted”")


def test_currency_spacing():
    assert "$ 5" in preprocess_sentence("$5")


def test_split_sentences_basic():
    out = split_sentences("The boy ran. The girl smiled.")
    assert out == ["The boy ran.", "The girl smiled."]


def test_split_sentences_abbrev():
    out = split_sentences("Dr. Smith arrived. He sat down.")
    assert out == ["Dr. Smith arrived.", "He sat down."]


def test_split_sentences_empty():
    assert split_sentences("") == []
    assert split_sentences(None) == []


def test_lexicon_word_lists_have_no_duplicates():
    """Frozensets hide duplicate entries; parse the source blocks so a
    word added twice (r05 advice: 'reboot'/'restart'/'modern') is caught
    at review time instead of silently drifting."""
    import re
    from collections import Counter
    import ie_spark.textproc.lexicon as lex
    src = open(lex.__file__, encoding="utf-8").read()
    for name, block in re.findall(
            r'(\w+) = frozenset\("""\n(.*?)"""', src, re.S):
        words = block.split()
        dups = [w for w, c in Counter(words).items() if c > 1]
        assert not dups, f"{name} has duplicate entries: {dups}"
