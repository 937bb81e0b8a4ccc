"""Frozen lexical tables for the deterministic extractor.

The reference (marbles-ai/ie) relies on NLTK WordNet lemmatization and large
runtime model files; those are nondeterministic to load and unavailable here.
Following SURVEY.md §7.3 we freeze every lookup table so that extraction is
byte-deterministic across executors and runs.

Semantics mirrored from the reference (cited, not copied):
  - pronoun table: src/python/marbles/ie/semantics/lexeme.py:29-76 (_PRON)
  - possessive handling (_POSS): semantics/ccg.py:991-1035
  - date/number recognition: semantics/lexeme.py:185-186, 372-425
  - copular 'be' event: semantics/lexeme.py:689-708
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Closed classes
# ---------------------------------------------------------------------------

DETERMINERS = frozenset(
    "the a an this that these those some any no every each all both either "
    "neither another such".split()
)

# Pronouns → (canonical predicate, is_possessive).  Canonical predicates follow
# the reference's _PRON table (e.g. 'me' → i(x), 'him' → he(x)).
PRONOUNS = {
    "i": ("i", False), "me": ("i", False), "myself": ("i", False),
    "my": ("i", True), "mine": ("i", True),
    "you": ("you", False), "yourself": ("you", False),
    "your": ("you", True), "yours": ("you", True), "yourselves": ("you", False),
    "he": ("he", False), "him": ("he", False), "himself": ("he", False),
    "his": ("he", True),
    "she": ("she", False), "her": ("she", True), "hers": ("she", True),
    "herself": ("she", False),
    "we": ("we", False), "us": ("we", False), "ourselves": ("we", False),
    "our": ("we", True), "ours": ("we", True),
    "they": ("they", False), "them": ("they", False),
    "themselves": ("they", False), "their": ("they", True),
    "theirs": ("they", True),
    "it": ("it", False), "its": ("it", True), "itself": ("it", False),
}

# Pronouns that can only be possessive determiners (start an NP).
POSS_PRONOUNS = frozenset(k for k, (_, p) in PRONOUNS.items() if p)

RELATIVE_PRONOUNS = frozenset(
    "that which who whom whose when what "
    "whatever whichever whoever whomever".split()
)

PREPOSITIONS = frozenset(
    "of in on at by for with without about against between among into onto "
    "over under after before during through from to toward towards upon "
    "across behind beside near within along despite except regarding per "
    "via since until around off above below beneath".split()
)

CONJUNCTIONS = frozenset("and or but nor".split())

# Discourse markers / interjections — transcript boilerplate that must
# never surface as mentions or subjects ("Thanks, Alice reviewed it").
# 'please' is intentionally absent: it tags ADV so imperatives survive
# ("Please review the patch" → VP[b] with empty subject).
INTERJECTIONS = frozenset(
    # plus existential/locative 'there' — it carries no referent in the
    # flattened-triple scheme ("There is a bug" → ('', be, bug))
    "hi hello hey thanks okay ok yeah yes sorry sure oops hmm wow there".split()
)

# Pure subordinating conjunctions (never nouns/preps in this grammar);
# temporal subordinators (after/before/since/until/when) keep their
# IN/REL tags and are handled structurally (clause-after-PP rule).
SUBORDINATORS = frozenset("because although unless whereas".split())

# be/have/do forms + modals; (form → (lemma, finite)).
AUXILIARIES = {
    "am": ("be", True), "is": ("be", True), "are": ("be", True),
    "was": ("be", True), "were": ("be", True), "be": ("be", False),
    "been": ("be", False), "being": ("be", False),
    "has": ("have", True), "have": ("have", True), "had": ("have", True),
    "having": ("have", False),
    "do": ("do", True), "does": ("do", True), "did": ("do", True),
    "doing": ("do", False), "done": ("do", False),
}

MODALS = frozenset(
    "can could may might must shall should will would ought".split()
)

NEGATIONS = frozenset(["not", "n't", "never", "cannot"])

MONTHS = frozenset(
    "january february march april may june july august september october "
    "november december".split()
)
WEEKDAYS = frozenset(
    "monday tuesday wednesday thursday friday saturday sunday".split()
)

NUMBER_WORDS = frozenset(
    "zero one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty "
    "thirty forty fifty sixty seventy eighty ninety hundred thousand "
    "million billion trillion first second third fourth fifth".split()
)

# ---------------------------------------------------------------------------
# Open-class dictionaries (frozen).  These are NOT the synthetic-corpus
# vocabulary — they are a generic conversational-English word list used only
# to disambiguate POS (noun vs verb vs adjective) and sentence-initial
# capitalization.  Membership here never changes emitted strings, only tags.
# ---------------------------------------------------------------------------

COMMON_NOUNS = frozenset("""
boy girl man woman person people child team engineer doctor teacher student
manager analyst scientist lawyer nurse writer artist agent user customer
report patch request pipeline system model dataset query table database
server cluster job task ticket bug issue feature branch commit release
deployment service network machine computer laptop phone message email
document file folder plan design schedule meeting review budget contract
proposal paper book article story letter note summary answer question
result outcome decision problem solution idea goal project product company
office city country house school hospital market store price cost value
money time day week month year morning evening night code script function
class module package library tool test error warning log metric dashboard
graph node edge entity mention triple sentence word text corpus language
parser tax car truck train plane road bridge river mountain dog cat bird
tree flower food water coffee tea bread fruit key lock door window wall
room floor roof garden park street event change update upgrade version
backup index schema partition shard queue stream batch record row column
field cell vector embedding cache memory disk thread process
""".split())

COMMON_VERBS = frozenset("""
be have do say get make go know take see come think look want give use
find tell ask work seem feel try leave call need become mean keep let
begin help talk turn start show hear play run move like live believe hold
bring happen write provide sit stand lose pay meet include continue set
learn change lead understand watch follow stop create speak read allow add
spend grow open walk win offer remember love consider appear buy wait
serve die send expect build stay fall cut reach kill remain suggest raise
pass sell require report decide pull review approve reject merge deploy
test debug fix implement design analyze process extract parse compute
schedule cancel update delete insert query fetch load store save restore
scan filter sort join aggregate partition shuffle broadcast cache commit
push verify validate monitor measure optimize refactor document describe
explain summarize translate answer check complete finish launch ship
protest want investigate examine discover
""".split())

COMMON_ADJECTIVES = frozenset("""
good new first last long great little own other old right big high small
large next early young important few public bad same able ready busy free
full special easy hard strong weak clear dark light slow fast quick clean
dirty cheap rich poor safe open late happy sad angry tired wrong nice warm
cold hot cool final initial recent current previous broken stable flaky
green red blue yellow correct accurate efficient scalable robust secure
pending complete incomplete urgent critical minor major
""".split())

# ---------------------------------------------------------------------------
# Verb lemmatization: irregular table + deterministic suffix rules.
# (Replaces NLTK WordNetLemmatizer; SURVEY.md §2.D "string scalar functions".)
# ---------------------------------------------------------------------------

IRREGULAR_VERBS = {
    # form → lemma
    "was": "be", "were": "be", "is": "be", "am": "be", "are": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "did": "do", "does": "do", "done": "do", "doing": "do",
    "went": "go", "gone": "go", "goes": "go",
    "said": "say", "says": "say",
    "got": "get", "gotten": "get",
    "made": "make", "took": "take", "taken": "take",
    "saw": "see", "seen": "see", "came": "come",
    "knew": "know", "known": "know",
    "thought": "think", "found": "find", "told": "tell",
    "gave": "give", "given": "give",
    "felt": "feel", "left": "leave", "kept": "keep",
    "began": "begin", "begun": "begin",
    "held": "hold", "brought": "bring", "wrote": "write",
    "written": "write", "sat": "sit", "stood": "stand",
    "lost": "lose", "paid": "pay", "met": "meet",
    "set": "set", "led": "lead", "read": "read",
    "spoke": "speak", "spoken": "speak",
    "spent": "spend", "grew": "grow", "grown": "grow",
    "won": "win", "bought": "buy", "sold": "sell",
    "sent": "send", "built": "build", "fell": "fall", "fallen": "fall",
    "cut": "cut", "reached": "reach", "ran": "run", "run": "run",
    "heard": "hear", "let": "let", "put": "put",
    "meant": "mean", "became": "become", "chose": "choose",
    "chosen": "choose", "drew": "draw", "drawn": "draw",
    "drove": "drive", "driven": "drive", "ate": "eat", "eaten": "eat",
    "flew": "fly", "flown": "fly", "forgot": "forget",
    "forgotten": "forget", "froze": "freeze", "frozen": "freeze",
    "hid": "hide", "hidden": "hide", "hit": "hit", "hurt": "hurt",
    "laid": "lay", "lay": "lie", "lain": "lie", "rose": "rise",
    "risen": "rise", "shook": "shake", "shaken": "shake",
    "showed": "show", "shown": "show", "shut": "shut",
    "sang": "sing", "sung": "sing", "slept": "sleep",
    "swam": "swim", "swum": "swim", "taught": "teach",
    "threw": "throw", "thrown": "throw", "understood": "understand",
    "woke": "wake", "woken": "wake", "wore": "wear", "worn": "wear",
}

_CONSONANTS = set("bcdfghjklmnpqrstvwxz")

# Verbs whose lemma genuinely ends in 'e' — used to undo e-drop in -ed/-ing.
_E_FINAL_VERBS = frozenset("""
believe use make take give live love move come create change manage merge
serve provide include continue require describe complete decide receive
notice improve remove save leave schedule update delete validate operate
generate evaluate estimate integrate migrate calculate compute execute
analyze optimize summarize translate deploy note release file name phrase
parse cache store share compare prepare declare square race trace place
slice type pipe promote invite write ride close cause pause raise praise
lose choose refuse solve resolve involve observe reserve deserve measure
ensure configure capture feature structure restructure fine define refine
combine examine determine imagine machine outline pine line tune dine
debate rotate locate relocate allocate educate isolate navigate
investigate approve prove improve
""".split())


from functools import lru_cache


@lru_cache(maxsize=131072)
def lemmatize_verb(form: str) -> str:
    """Deterministic verb lemma. form must be lowercase."""
    if form in IRREGULAR_VERBS:
        return IRREGULAR_VERBS[form]
    if form in COMMON_VERBS:
        return form
    # -ies → -y  (carries → carry)
    if form.endswith("ies") and len(form) > 4:
        return form[:-3] + "y"
    # -es after sibilant (passes → pass, watches → watch, fixes → fix)
    if form.endswith("es") and len(form) > 3:
        stem = form[:-2]
        if stem.endswith(("s", "x", "z", "ch", "sh")):
            return stem
        if stem in _E_FINAL_VERBS or stem + "e" in _E_FINAL_VERBS:
            pass  # fall through to -s rule below
    # -s  (wants → want)
    if form.endswith("s") and not form.endswith("ss") and len(form) > 2:
        return form[:-1]
    # -ied → -y
    if form.endswith("ied") and len(form) > 4:
        return form[:-3] + "y"
    # -ed
    if form.endswith("ed") and len(form) > 3:
        stem = form[:-2]
        if stem + "e" in _E_FINAL_VERBS:
            return stem + "e"
        # doubled final consonant (planned → plan)
        if (len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] in _CONSONANTS
                and (stem[:-1] in COMMON_VERBS or stem[:-1] in _E_FINAL_VERBS)):
            return stem[:-1]
        if stem.endswith("e"):
            return stem
        return stem
    # -ing
    if form.endswith("ing") and len(form) > 4:
        stem = form[:-3]
        if stem + "e" in _E_FINAL_VERBS:
            return stem + "e"
        if (len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] in _CONSONANTS
                and (stem[:-1] in COMMON_VERBS or stem[:-1] in _E_FINAL_VERBS)):
            return stem[:-1]
        return stem
    return form


_IRREGULAR_NOUNS = {
    "people": "person", "children": "child", "men": "man", "women": "woman",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
    "data": "data", "media": "media", "indices": "index", "schemas": "schema",
    "analyses": "analysis", "queries": "query",
}


@lru_cache(maxsize=131072)
def lemmatize_noun(form: str) -> str:
    """Deterministic noun singularization. form must be lowercase."""
    if form in _IRREGULAR_NOUNS:
        return _IRREGULAR_NOUNS[form]
    if form in COMMON_NOUNS:
        return form
    # e-final plurals whose singular is known: releases → release
    if form.endswith("s") and form[:-1] in COMMON_NOUNS:
        return form[:-1]
    if form.endswith("ies") and len(form) > 4:
        return form[:-3] + "y"
    if form.endswith(("ses", "xes", "zes", "ches", "shes")) and len(form) > 4:
        return form[:-2]
    if form.endswith("s") and not form.endswith(("ss", "us", "is")) and len(form) > 2:
        return form[:-1]
    return form
