"""Deterministic per-sentence mention + (subj, pred, obj) triple extraction.

This is the Spark-first re-expression of the reference's DRS composition
pipeline (marbles-ai/ie): instead of a CCG chart + λ-composition
(``src/python/marbles/ie/semantics/ccg.py:1199-1269``), a shallow
deterministic clause analyzer emits the same *flattened* facts the
reference's DRS conditions encode:

  verb event  →  ``_EVENT(e), _ARG0(e, subj), _ARG1(e, obj)``
                 (reference ``semantics/lexeme.py:617-743``)
  copular     →  ``be(e), _ARG0(e, x), _ARG1(e, attr)`` (``lexeme.py:689-708``)
  passive     →  swapped roles (``lexeme.py:662-679``)
  possessive  →  ``_POSS(owner, owned)`` (``semantics/ccg.py:991-1035``)
  appositive  →  ``_AKA(x, y)`` (``semantics/ccg.py:1073-1183``)
  proper-noun merge → ``New-York`` style stems (``semantics/ccg.py:1367-1508``)
  referent ids →  first-occurrence numbering, X for entities / E for events
                 (``semantics/ccg.py:1535-1601`` final_rename)

A DRS ``[X1,E2,X4| boy(X1),want(E2),_EVENT(E2),_ARG0(E2,X1),_ARG1(E2,X4),
girl(X4)]`` flattens to the row ``(boy, want, girl, X1, E2, X4, pos)``.

Pure Python over one sentence at a time; executed in Arrow-batched pandas
UDFs (ie_spark.extraction.pandas_api / ie_spark.pipeline.extract) — the
per-sentence loop is the payload of the batch, never per-row Python at the
Spark API level.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ie_spark.textproc.lexicon import (
    ADVERBS,
    AUXILIARIES,
    COMMON_ADJECTIVES,
    COMMON_NOUNS,
    COMMON_VERBS,
    CONJUNCTIONS,
    DETERMINERS,
    INTERJECTIONS,
    IRREGULAR_VERBS,
    MODALS,
    MONTHS,
    NEGATIONS,
    NUMBER_WORDS,
    POSS_PRONOUNS,
    PREPOSITIONS,
    PRONOUNS,
    RELATIVE_PRONOUNS,
    SUBORDINATORS,
    WEEKDAYS,
    lemmatize_noun,
    lemmatize_verb,
)
from ie_spark.textproc.preprocess import preprocess_sentence, split_sentences

# ---------------------------------------------------------------------------
# Data classes
# ---------------------------------------------------------------------------


@dataclass
class Mention:
    start: int              # first token index
    end: int                # last token index (inclusive)
    surface: str
    stem: str
    kind: str               # entity|propername|pronoun|date|number|event
    ref: str = ""


@dataclass
class Event:
    verb_idx: int
    lemma: str
    polarity: str = "pos"   # pos|neg
    modal: str = ""
    passive: bool = False
    subjects: list = field(default_factory=list)   # [Mention]
    objects: list = field(default_factory=list)    # [Mention | Event]
    ref: str = ""
    # passive whose agent was recovered from a by-phrase; agentless
    # passives get their surface subject demoted to ARG1 in a post-pass
    agent_resolved: bool = False
    # id(obj) → (role, prep): reference _ARG1/_ARG2 role labels
    # (semantics/lexeme.py:617-743) + the oblique preposition
    obj_meta: dict = field(default_factory=dict)
    # post-verbal particles/adverbs ('step up' → up/direction conditions
    # in the DRS export, reference compose_test.py:173)
    advs: list = field(default_factory=list)

    def set_role(self, obj, role: str, prep: str = "") -> None:
        self.obj_meta[id(obj)] = (role, prep)

    def role_of(self, obj) -> tuple[str, str]:
        return self.obj_meta.get(id(obj), ("ARG1", ""))


@dataclass
class Triple:
    subj: str
    pred: str
    obj: str
    subj_ref: str
    event_ref: str
    obj_ref: str
    polarity: str = "pos"
    modal: str = ""         # reference _MODAL conditions (lexeme.py:683-687)
    role: str = ""          # object slot: ARG1 theme | ARG2 recipient/oblique
    prep: str = ""          # oblique preposition ('against', 'to', …)


# ---------------------------------------------------------------------------
# Tokenizer + tagger
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(r"^\d[\d,]*(?:\.\d+)?%?$")
_YEAR_RE = re.compile(r"^(?:1[6-9]|20)\d\d$")
_DAY_RE = re.compile(r"^\d{1,2}(?:st|nd|rd|th)?$")
_PUNCT_RE = re.compile(r"^[^\w$€£¥%']+$")

# tags
DT, PRON, POSSPRON, NN, NNP, ADJ, ADV = "DT PRON POSSPRON NN NNP ADJ ADV".split()
V, AUX, MD, TO, IN, CC, NOT = "V AUX MD TO IN CC NOT".split()
NUM, DATE, POS, PUNCT, REL, SUB, INTJ = \
    "NUM DATE POS PUNCT REL SUB INTJ".split()


def tokenize(sentence: str) -> list[str]:
    """Whitespace tokenize after reference-style preprocessing."""
    return preprocess_sentence(sentence).split()


def _is_capitalized(w: str) -> bool:
    # all-caps alpha words are acronyms / display-caps propernames
    # (reference merges 'AIDS DIRECTORY' → AIDS-DIRECTORY,
    # test/compose_test.py:368-441)
    return w[:1].isupper() and (len(w) == 1 or not w.isupper()
                                or len(w) <= 4 or w.isalpha())


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=131072)
def _morph_verb(lower: str) -> bool:
    if lower in IRREGULAR_VERBS or lower in COMMON_VERBS:
        return True
    for suf, strip in (("ies", 3), ("ed", 2), ("ing", 3), ("es", 2), ("s", 1)):
        if lower.endswith(suf) and len(lower) > len(suf) + 1:
            stem = lower[: len(lower) - strip]
            if stem in COMMON_VERBS or stem + "e" in COMMON_VERBS:
                return True
            if suf == "ies" and stem + "y" in COMMON_VERBS:
                return True
            # doubled consonant: planned → plan
            if len(stem) > 2 and stem[-1] == stem[-2] and stem[:-1] in COMMON_VERBS:
                return True
    return False


@lru_cache(maxsize=131072)
def _morph_noun(lower: str) -> bool:
    return lower in COMMON_NOUNS or lemmatize_noun(lower) in COMMON_NOUNS


# single closed-class lookup table (precedence mirrors the original
# if/elif chain: NOT > DT > POSSPRON > PRON > MD > AUX > TO > CC >
# DATE words > NUM words > REL > IN)
def _build_closed() -> dict:
    closed: dict[str, str] = {}
    for words, t in [(PREPOSITIONS, IN), (SUBORDINATORS, SUB),
                     (INTERJECTIONS, INTJ), (ADVERBS, ADV),
                     (("please", "yesterday", "today", "tomorrow",
                       "tonight", "overnight",
                       "however", "meanwhile", "moreover", "furthermore",
                       "nevertheless", "nonetheless", "anyway"), ADV),
                     (RELATIVE_PRONOUNS, REL),
                     (NUMBER_WORDS, NUM), (MONTHS, DATE), (WEEKDAYS, DATE),
                     (CONJUNCTIONS, CC), (("to",), TO),
                     (AUXILIARIES, AUX), (MODALS, MD),
                     (PRONOUNS, PRON), (POSS_PRONOUNS, POSSPRON),
                     (DETERMINERS, DT), (NEGATIONS, NOT), (("n't",), NOT)]:
        for w in words:
            closed[w] = t
    return closed


_CLOSED = _build_closed()

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=131072)
def _base_tag(w: str, initial: bool) -> str:
    """Context-free tag for one token (memoized — corpora repeat words)."""
    lw = w.lower()
    if w in ("$", "€", "£", "¥", "¢"):
        # currency symbols head measure NPs ('$ 19.3 million',
        # reference number handling: test/number_test.py:24-66)
        return NUM
    if w == "&":
        return CC
    if _PUNCT_RE.match(w):
        return PUNCT
    if lw == "'s" or lw == "'":
        return POS
    t = _CLOSED.get(lw)
    if t is not None:
        return t
    if lw.endswith(".") and (lw[:-1] in MONTHS or lw[:-1] in WEEKDAYS):
        return DATE  # 'Jan.' / 'Dec.' (reference test/number_test.py:92)
    if _YEAR_RE.match(w):
        return DATE
    if _NUM_RE.match(w):
        return NUM
    if "-" in w[1:-1] and not w[:1].isupper() \
            and any(c.isalpha() for c in w):
        # lowercase hyphenated compounds are attributive modifiers
        # ('hot-tempered', 'money-market', 'roof-crush')
        return ADJ
    if _is_capitalized(w) and not initial:
        return NNP
    if _is_capitalized(w) and initial:
        # sentence-initial: prefer known common classes, else proper
        if lw in COMMON_ADJECTIVES:
            return ADJ
        if _morph_noun(lw) and not _morph_verb(lw):
            return NN
        if _morph_verb(lw) and not _morph_noun(lw):
            return V
        if _morph_noun(lw):
            return NN
        return NNP
    if lw in COMMON_ADJECTIVES:
        return ADJ
    if lw.endswith("ly") and len(lw) > 3 and not _morph_verb(lw) \
            and not _morph_noun(lw):
        # but not -ly verbs (apply, reply, rely, comply) and not -ly
        # NOUNS (family, assembly) — -ly adjectives (quarterly, friendly)
        # are caught by the COMMON_ADJECTIVES check above
        return ADV
    mv, mn = _morph_verb(lw), _morph_noun(lw)
    if mv and not mn:
        return V
    if mn and not mv:
        return NN
    if mv and mn:
        return NN  # ambiguous — context pass in tag() repairs
    if lw.endswith(("tion", "ment", "ness", "ity", "ance", "ence", "ship", "ism")):
        return NN
    if lw.endswith(("ous", "ive", "able", "ible", "ical", "ful", "less")):
        return ADJ
    if lw.endswith(("ed", "ing", "ize", "ise", "ify")):
        return V
    return NN


@lru_cache(maxsize=131072)
def _is_ambiguous(lw: str) -> bool:
    return _morph_verb(lw) and _morph_noun(lw)


def tag(tokens: list[str]) -> list[str]:
    """Rule-based deterministic POS tagging (closed classes + morphology)."""
    tags: list[str] = []
    for i, w in enumerate(tokens):
        tags.append(_base_tag(w, i == 0))
        # context repair for noun/verb ambiguity (e.g. 'reviews', 'reports');
        # the noun-before case ('interest rates' vs 'team plans the release')
        # needs lookahead — resolved in the post-pass below
        if tags[-1] in (NN, V) and _is_ambiguous(w.lower()):
            prev = tags[-2] if len(tags) > 1 else None
            if prev in (DT, ADJ, POSSPRON, POS, NUM, NNP, IN):
                tags[-1] = NN
            elif prev in (PRON, TO, MD, AUX, NOT, ADV):
                tags[-1] = V
            elif prev is None:
                tags[-1] = NN
        # 'that' right after a noun head is a relativizer, not a determiner
        # ("the patch that Alice reviewed"); closed-class precedence gives
        # it DT, repair from context (reference: CCG assigns (NP\NP)/(S/NP))
        if (w.lower() == "that" and tags[-1] == DT
                and len(tags) > 1 and tags[-2] in (NN, NNP)):
            tags[-1] = REL
        # a bare verb right after a determiner/possessive heads an NP
        # ("the build", "her deploy") — verbs can't follow DT directly.
        # Exception: a FINITE verb form after a demonstrative is a
        # demonstrative-subject clause ("This failed", "Those worked") —
        # only the bare form nominalizes ("this build")
        if tags[-1] == V and len(tags) > 1 and tags[-2] in (DT, POSSPRON, POS):
            lw2 = tokens[len(tags) - 1].lower()
            demo = (tags[-2] == DT
                    and tokens[len(tags) - 2].lower() in ("this", "these",
                                                          "those"))
            finite = (lw2.endswith(("ed", "s")) or lw2 in IRREGULAR_VERBS)
            if not (demo and finite):
                tags[-1] = NN
        # a non-gerund verb form directly after a preposition is a noun
        # ('closed for REPAIRS', 'on DEMAND', 'under REVIEW') — a finite
        # verb can never directly follow IN; only -ing gerunds can,
        # plus elliptical past participles under as/than/until ('works
        # as DESIGNED', 'better than EXPECTED'), which stay verbs
        if (tags[-1] == V and len(tags) > 1 and tags[-2] == IN
                and not w.lower().endswith("ing")
                and not (w.lower().endswith(("ed", "en"))
                         and tokens[len(tags) - 2].lower()
                         in ("as", "than", "until", "once"))):
            tags[-1] = NN
        # same nominalization one adjective deeper ('a LONG DRIVE to the
        # office', 'a quick swim') — review r4 pass-3 finding #4
        if (tags[-1] == V and len(tags) > 2 and tags[-2] == ADJ
                and tags[-3] in (DT, POSSPRON)
                and not tokens[len(tags) - 1].lower().endswith(("ed", "s"))):
            tags[-1] = NN
        # interjection words after an auxiliary are predicative adjectives
        # ("I am sorry", "I am really sure" — reference S[adj]\NP,
        # compose_test.py:1209-1246)
        if tags[-1] == INTJ and len(tags) > 1 and tags[-2] in (AUX, ADV, NOT):
            tags[-1] = ADJ
        # adjective/verb homographs after a modal, infinitive marker,
        # negation or subject pronoun are verbs ('will OPEN a factory',
        # 'to CLEAN the table', 'Could you CLEAN the table') — an
        # adjective can't follow MD/TO directly.  After AUX the adjective
        # reading stays ('the door is open'); after a be-form + NOT it
        # ALSO stays ('the door is not open' is copular, only do-support
        # or modal negation precedes a verb); after a pronoun it stays
        # when the pronoun is an object ('Keep it clean') — only a
        # clause-initial subject pronoun precedes a bare verb.
        if (tags[-1] == ADJ and len(tags) > 1
                and tags[-2] in (MD, TO, NOT, PRON)
                and _morph_verb(w.lower())):
            prev3 = tags[-3] if len(tags) > 2 else None
            tok3 = tokens[len(tags) - 3].lower() if len(tags) > 2 else ""
            be_form = tok3 in ("am", "is", "are", "was", "were",
                               "be", "been", "being")
            if tags[-2] == NOT and prev3 == AUX and be_form:
                pass  # 'is not open' — predicative adjective
            elif tags[-2] == PRON and prev3 not in (MD, CC, SUB,
                                                    REL, None):
                pass  # object pronoun ('keep it clean')
            else:
                tags[-1] = V
    n = len(tokens)
    # noun/verb ambiguity after a noun: a following NP start or infinitive
    # means a verb ('the team plans THE release', 'the manager plans TO
    # leave'); IN/PUNCT/end — and a bare following noun ('interest rates
    # policy' must stay a compound) — mean a noun tail.  RIGHT-to-left so
    # the lookahead tag is itself already resolved
    for i in range(n - 1, 0, -1):
        if tags[i] in (NN, V) and tags[i - 1] == NN \
                and _is_ambiguous(tokens[i].lower()):
            nxt = tags[i + 1] if i + 1 < n else None
            tags[i] = V if nxt in (DT, POSSPRON, NNP, PRON, NUM, ADJ,
                                   TO) else NN
        # gerund compound subject: V-ing after a noun, heading into an
        # auxiliary/modal ('ad spending have become …') is nominal
        if (tags[i] == V and tokens[i].lower().endswith("ing")
                and tags[i - 1] == NN
                and (i + 1 == n or tags[i + 1] in (AUX, MD))):
            tags[i] = NN
    # s-form verb directly before an auxiliary is a plural subject head
    # noun ('Kent cigarette filters HAS caused …', reference
    # gold_constituent_test.py wsj_0003.1) — a finite verb can never be
    # followed by AUX/MD.  Only plural-looking forms after a COMMON noun:
    # after a propername the s-form is a zero-relativizer relative verb
    # ('The tool Bob USES is down' — review r4 finding #2), and reduced
    # relatives keep their participle ('the patch Alice reviewed was …')
    for i in range(1, n - 1):
        if (tags[i] == V and tags[i + 1] in (AUX, MD)
                and tags[i - 1] in (NN, ADJ, NUM)
                and tokens[i].lower().endswith("s")
                and not tokens[i].lower().endswith("ss")):
            tags[i] = NN
        # gerund attributive: V-ing between an NP opener and its head noun
        # is a noun modifier, not a verb ('the Dutch publishing group',
        # reference gold_constituent_test.py wsj_0001.2)
        if (tags[i] == V and tokens[i].lower().endswith("ing")
                and tags[i + 1] == NN
                and tags[i - 1] in (DT, POSSPRON, ADJ, NNP)):
            tags[i] = ADJ
            # a capitalized word squeezed between the determiner and an
            # attributive is a demonym modifier, not a name ('the DUTCH
            # publishing group', 'the BRITISH banking giant')
            if tags[i - 1] == NNP and i >= 2 and tags[i - 2] == DT:
                tags[i - 1] = ADJ
    # comparative quantifier: 'more/less/fewer than NUM' is one number
    # modifier run, not noun+preposition ('more than 30 years' — one NP
    # in the reference, gold_constituent_test.py wsj_0003.1)
    for i in range(n - 2):
        if (tokens[i].lower() in ("more", "less", "fewer")
                and tokens[i + 1].lower() == "than"
                and tags[i + 2] in (NUM, DATE)):
            tags[i] = NUM
            tags[i + 1] = NUM
    # sentence-initial capitalized participle before a lowercase noun is
    # an attributive modifier, not a name ('ANNUALIZED interest rates' —
    # reference NP 'Annualized interest rates', number_test.py:123)
    if (n > 2 and tags[0] == NNP and tokens[0].lower().endswith("ed")
            and tags[1] == NN and tokens[1].islower()
            and tags[2] == NN and tokens[2].islower()):
        # two lowercase nouns required: 'United flights' keeps its
        # propername ('Annualized interest rates' retags — review)
        tags[0] = ADJ
    # reduplicated comparative degree run: 'more and more corners',
    # 'less and less money' — one NP whose head is the noun (reference
    # dependency More→corners, exec_test.py:216-227); retag the run as
    # adjectival modifiers so the coordination never splits the NP
    for i in range(n - 3):
        w = tokens[i].lower()
        if (w in ("more", "less", "fewer")
                and tokens[i + 1].lower() == "and"
                and tokens[i + 2].lower() == w
                and tags[i + 3] in (NN, NNP)):
            tags[i] = tags[i + 1] = tags[i + 2] = ADJ
    # sentence-initial capitalized word directly before a comma is a name
    # ('Reliable, Diane's beagle, chews …' — reference appos_test.py:47)
    if (n > 1 and tokens[1] == "," and tags[0] in (ADJ, NN, V)
            and tokens[0][:1].isupper()):
        tags[0] = NNP
    return tags


# ---------------------------------------------------------------------------
# Shallow clause parser
# ---------------------------------------------------------------------------

_NP_START = (DT, POSSPRON, ADJ, NN, NNP, PRON, NUM, DATE)

# adverb-tagged verb particles that can precede a direct object
# ('knocked OUT power', 'gave UP the lead', 'step UP production') —
# restricted set so ordinary adverbs never trigger the object parse
_VERB_PARTICLES = frozenset(
    "out up down away back over aside around".split())

# temporal NP heads: bare NPs with these heads after a particle are
# adverbial ('picked up LAST QUARTER'), and a passive 'by' phrase headed
# by one is a deadline, not the agent ('paid by MIDNIGHT / the DEADLINE')
_TEMPORAL_NP_HEADS = frozenset(
    "year quarter month week day time times minute hour night morning "
    "evening afternoon decade century season summer winter spring fall "
    "midnight noon deadline end".split())

# copular-class verbs taking adjective complements (_ATTRIBUTE conditions,
# reference semantics/lexeme.py:689-708, 792-805)
_COPULAR_ATTR_VERBS = frozenset(
    "be smell look seem feel sound taste appear become remain stay".split())

# verbs taking zero-complementizer clausal objects ('said the build failed')
_COMPLEMENT_VERBS = frozenset(
    "say tell note mention announce claim argue admit state declare "
    "suggest believe think know expect hope insist reply respond confirm "
    "deny report add".split())

# double-object verbs (recipient _ARG2 + theme _ARG1, lexeme.py:617-743)
# determiners that head temporal/quantified adjunct NPs after an object
# ('reports profits EVERY quarter') — excluded from the generic
# double-object parse
_ADJUNCT_DTS = frozenset(
    "every each all some any no both neither either another such "
    "this that these those".split())

_DITRANSITIVE_VERBS = frozenset(
    "give send offer show teach tell hand grant award lend owe".split())

# object-control verbs: 'want/ask X to VP' subjects the infinitive with
# the OBJECT (reference ((S\NP)/(S[to]\NP))/NP categories, ccg/model.py);
# subject-control 'promise' and purpose clauses are excluded — their
# infinitive keeps the matrix subject
_OBJECT_CONTROL_VERBS = frozenset(
    "want ask tell expect urge persuade allow permit force cause "
    "encourage invite order remind require advise enable need".split())

# prepositions that can introduce a full subordinate clause ('after the
# build finished'); all others attach to nouns only, so a following verb
# group must be a reduced relative (reference IN→(S/S)/S[dcl] categories
# vs (NP\NP)/NP, ccg/model.py)
_CLAUSE_PREPS = frozenset(
    "after before until since once while because although though if "
    "unless when whenever as".split())

# noun-attaching prepositions beyond of/for (reference preposition
# specials, semantics/lexeme.py:92-103 _PREPS): a PP headed by one of
# these after an object NP modifies the noun, not the verb.  The
# reference also lists 'on'; here temporal on-dates stay verb adjuncts
# (the corpus golden treats 'reports profits on March 5' as event time)
_NOUN_ATTACH_PREPS = frozenset(
    "of for between with among about regarding without despite "
    "except".split())

# these attach to the preceding noun only when it is an EVENT NOMINAL
# ('the growth since the merger', 'the battle over the budget') —
# on a plain verb they remain verb adjuncts
_EVENT_NOMINAL_PREPS = frozenset(("since", "over"))

_EVENT_NOMINAL_SUFFIXES = ("tion", "sion", "ment", "ance", "ence", "ure",
                           "val", "wth")
_EVENT_NOMINALS = frozenset(
    "merger dispute deal sale launch release crash surge drop rise fall "
    "gain loss vote strike deadline battle fight war debate talk "
    "slowdown recovery rally decline".split())


def _is_event_nominal(stem: str) -> bool:
    return (stem in _EVENT_NOMINALS
            or stem.endswith(_EVENT_NOMINAL_SUFFIXES))


class _SentenceParser:
    def __init__(self, tokens: list[str], tags: list[str]):
        self.toks = tokens
        self.tags = tags
        self.n = len(tokens)
        self.mentions: list[Mention] = []
        self.events: list[Event] = []
        self.poss: list[tuple[Mention, Mention]] = []
        self.aka: list[tuple[Mention, Mention]] = []
        # noun-attached PP facts: (head, prep, dep) — the reference's
        # from(X1,X2)/of(X2,X3) noun-modifier conditions
        # (test/compose_test.py:432, test/number_test.py:58-64)
        self.nmod: list[tuple[Mention, str, Mention]] = []
        self.alias_of_last_group: Mention | None = None
        # fronted-quotative event awaiting its quoted-clause ARG1
        self._fronted_quote_ev: Event | None = None
        # sentence-initial adjunct PPs awaiting the matrix event —
        # 'Without the expenses, the company would …' emits the
        # reference's without(E,X) condition (test/number_test.py:58)
        self._fronted_pps: list[tuple[str, list[Mention]]] = []
        # (vntype, start, end, adjunct) phrase nodes — the reference's
        # constituent output (core/sentence.py:218-321, refined in
        # ccg.py:783-989; adjunct marking per _mark_if_adjunct, ccg.py:633)
        self.constituents: list[tuple[str, int, int, bool]] = []

    # -- NP parsing ---------------------------------------------------------

    def _parse_simple_np(self, i: int, max_head_run: int | None = None,
                         absorb_av: bool = False):
        """Parse one noun phrase at i → (Mention|None, next_i).

        ``absorb_av``: inside prepositional phrases a verb-tagged
        noun/verb-ambiguous token extends the noun run ('in interest
        rates' — a PP object cannot be a finite verb; subordinate clauses
        after a PP carry unambiguous verb forms)."""
        toks, tags, n = self.toks, self.tags, self.n
        start = i
        if i < n and tags[i] == PRON:
            lw = toks[i].lower()
            canon = PRONOUNS[lw][0]
            m = Mention(i, i, toks[i], canon, "pronoun")
            self.mentions.append(m)
            self.constituents.append(("NP", i, i, False))
            return m, i + 1
        owner = None
        if i < n and tags[i] == POSSPRON:
            canon = PRONOUNS[toks[i].lower()][0]
            owner = Mention(i, i, toks[i], canon, "pronoun")
            self.mentions.append(owner)
            i += 1
        elif i < n and tags[i] == DT:
            lw = toks[i].lower()
            if (lw in ("this", "these", "those")
                    and (i + 1 >= n
                         or tags[i + 1] in (V, MD, AUX, NOT, PUNCT))):
                # demonstrative pronoun subject: "This failed." — a bare
                # demonstrative with no NP head is itself the referent
                # (resolved by kind-aware coref to a non-person mention)
                m = Mention(i, i, toks[i], lw, "pronoun")
                self.mentions.append(m)
                self.constituents.append(("NP", i, i, False))
                return m, i + 1
            i += 1
        # adjectives / numbers before head
        adjs = []
        num_idxs: list[int] = []
        while i < n and tags[i] in (ADJ, NUM, ADV):
            if tags[i] == NUM:
                num_idxs.append(i)
                self.mentions.append(
                    Mention(i, i, toks[i], toks[i].lower(), "number"))
            else:
                adjs.append(i)
            i += 1
        # head nouns; a common-noun run directly before a propername is a
        # title/role modifier ('rival Time magazine', 'President Bob') —
        # unless a verb group follows the name (zero-relativizer reduced
        # relative: 'the patch Alice submitted').
        if i < n and tags[i] == NN and max_head_run is None:
            k = i
            while k < n and tags[k] == NN:
                k += 1
            if k < n and tags[k] == NNP:
                kk = k
                while kk + 1 < n and tags[kk + 1] == NNP:
                    kk += 1
                if not self._looks_like_vg(kk + 1):
                    i = k
        if i < n and tags[i] == NNP:
            j = i
            while j + 1 < n:
                if self.tags[j + 1] == NNP:
                    j += 1
                elif (toks[j + 1] == "&" and j + 2 < n
                        and self.tags[j + 2] == NNP):
                    j += 2  # 'U.S. News & World Report' stays one name
                else:
                    break
            # title merge: a trailing unambiguous common noun joins the
            # name ('Time magazine' → Time-magazine; reference
            # resolve_proper_names, semantics/ccg.py:1367-1508).  A
            # verb-lookalike NN still joins when an auxiliary follows —
            # the tagger proved it nominal ('Kent cigarette FILTERS has')
            while (j + 1 < n and self.tags[j + 1] == NN
                    and (not _morph_verb(toks[j + 1].lower())
                         or (j + 2 < n and self.tags[j + 2] in (AUX, MD)))):
                j += 1
            surface = " ".join(toks[i:j + 1])
            # reference proper-noun merge: 'New York' → 'New-York'
            stem = "-".join(w.rstrip(".") for w in toks[i:j + 1])
            m = Mention(start, j, surface, stem, "propername")
            self.mentions.append(m)
            i = j + 1
        elif i < n and tags[i] in (NN, DATE):
            j = i
            while j + 1 < n and (
                    self.tags[j + 1] == NN
                    or (absorb_av and self.tags[j + 1] == V
                        and _is_ambiguous(toks[j + 1].lower())
                        # a following NP start means it IS a finite verb
                        # (subordinate clause: 'after the board reviews
                        # the merger') — only absorb clause-final tails
                        and (j + 2 >= n
                             or self.tags[j + 2] not in _NP_START))):
                if max_head_run is not None and j + 1 - i >= max_head_run:
                    break
                j += 1
            head = toks[j].lower()
            if tags[i] == DATE:
                # absorb day/year numbers AND further date words into
                # the span ('March 5', 'Nov. 29', 'Wednesday October 4'
                # — reference NP(#Nov. 29) and NP 'Wednesday October 4',
                # number_test.py:127); the stem stays the first date word
                while j + 1 < n and self.tags[j + 1] in (NUM, DATE):
                    j += 1
                m = Mention(start, j, " ".join(toks[i:j + 1]), head, "date")
            else:
                m = Mention(start, j, " ".join(toks[start:j + 1]),
                            lemmatize_noun(head), "entity")
            self.mentions.append(m)
            i = j + 1
        elif num_idxs:
            # headless measure NP: the number run IS the head
            # ('fell 0.1%', 'of $ 19.3 million' — reference _NUM
            # conditions, semantics/lexeme.py:372-425)
            a, b = num_idxs[0], num_idxs[-1]
            del self.mentions[-len(num_idxs):]
            surface = " ".join(toks[a:b + 1])
            m = Mention(start, b, surface, surface.lower(), "number")
            self.mentions.append(m)
            # no NP constituent: bare measure runs are not phrase nodes in
            # the reference constituent inventory (core/sentence.py:218-321)
            return m, i
        else:
            return None, i
        # attributive modifier run → ADJP adjunct (reference phrase
        # inventory, ccg.py:783-989; adjunct per _mark_if_adjunct :633)
        if adjs:
            self.constituents.append(("ADJP", adjs[0], adjs[-1], True))
        # date tail: 'Nov. 29' / 'March 5 2024' — one date mention + its
        # own NP node (reference NP(#Nov. 29), gold_constituent_test.py)
        while i < n and tags[i] in (DATE,):
            a = i
            while i + 1 < n and tags[i + 1] == NUM:
                i += 1
            self.mentions.append(Mention(
                a, i, " ".join(toks[a:i + 1]), toks[a].lower(), "date"))
            self.constituents.append(("NP", a, i, False))
            i += 1
        # possessive recursion: X 's Y
        if owner is not None and m is not None:
            self.poss.append((owner, m))
        if i < n and tags[i] == POS and m is not None:
            i += 1
            inner, i = self._parse_simple_np(i)
            if inner is not None:
                self.poss.append((m, inner))
                self.constituents.append(("NP", start, inner.end, False))
                return inner, i
        if m is not None:
            self.constituents.append(("NP", start, m.end, False))
        return m, i

    def _looks_like_vg(self, i: int) -> bool:
        """Lookahead: does a verb group (incl. copular) start at i?"""
        tags, n = self.tags, self.n
        j = i
        if j < n and tags[j] == MD:
            j += 1
        saw_aux = False
        while j < n and tags[j] in (AUX, NOT, ADV):
            saw_aux = saw_aux or tags[j] == AUX
            j += 1
        return j < n and (tags[j] == V or saw_aux)

    def _starts_indef(self, m: Mention) -> bool:
        return self.toks[m.start].lower() in ("a", "an")

    def _mark(self):
        """Snapshot of every fact list a speculative parse can extend."""
        return (len(self.mentions), len(self.poss), len(self.constituents),
                len(self.nmod), len(self.aka))

    def _rewind(self, mark) -> None:
        """Roll back to a ``_mark()`` snapshot — ALL lists, so speculative
        parses can never leak ghost facts (nmod/aka included)."""
        m, p, c, nm, ak = mark
        del self.mentions[m:]
        del self.poss[p:]
        del self.constituents[c:]
        del self.nmod[nm:]
        del self.aka[ak:]

    def _absorb_pp_chain(self, i: int, anchor: Mention,
                         absorb_av: bool = False,
                         rewind_on_vg: bool = False):
        """Consume ``(IN NP)*`` noun-modifier hops attached to ``anchor``,
        emitting noun-PP facts.  With ``rewind_on_vg`` a hop whose NP is
        followed by a verb group rolls back (inside an appositive alias
        that verb belongs to the matrix clause); subject chains keep such
        hops — the verb after the chain IS the main verb ('Yields on
        funds CONTINUED').  → (last_np_or_anchor, next_i)."""
        target = anchor
        while (i + 1 < self.n and self.tags[i] == IN
               and self.tags[i + 1] in _NP_START):
            mark = self._mark()
            prep_idx, prep = i, self.toks[i].lower()
            pg, ip = self._parse_np_group(i + 1, absorb_av=absorb_av)
            if not pg or (rewind_on_vg and self._looks_like_vg(ip)):
                self._rewind(mark)
                break
            # distribute the preposition over coordinated NP members
            # ('cups of flour and a pinch' → of(cup, flour) AND
            # of(cup, pinch); the chain then continues from the last
            # member so 'of salt' attaches to 'pinch')
            for member in pg:
                self.nmod.append((target, prep, member))
            self.constituents.append(("PP", prep_idx, pg[-1].end, True))
            if pg[-1].kind in ("entity", "propername"):
                target = pg[-1]
            i = ip
        return target, i

    def _attach_gap(self, sub: "Event", head: Mention) -> None:
        """Attach a relative head as the gap ARG1 of the DEEPEST verb in a
        control chain lacking its own direct object ('the patch that Alice
        wants to review').  A clause that is already complete — it has a
        plain (non-oblique) nominal object — takes no gap: it is a
        noun-COMPLEMENT clause ('signs that managers expect declines',
        reference N/S[em] category, test/compose_test.py:218-243)."""
        tgt = sub
        while True:
            if any(isinstance(o, Mention)
                   and tgt.role_of(o) == ("ARG1", "")
                   for o in tgt.objects):
                return  # complete clause — noun complement, no gap
            evs = [o for o in tgt.objects if isinstance(o, Event)]
            if not evs:
                break
            tgt = evs[-1]
        tgt.objects.append(head)
        tgt.set_role(head, "ARG1")

    def _parse_np_group(self, i: int, revert_if_verb_follows: bool = False,
                        absorb_av: bool = False,
                        allow_appos: bool = True):
        """NP (CC NP)* → ([Mention], next_i). Distributes coordination.

        With ``revert_if_verb_follows`` (object position), a conjunct that is
        immediately followed by a verb group is clause coordination
        ("… the patch and Bob approved …") — the conjunct is released so it
        can become the next clause's subject.

        Appositives are recognized here (reference _AKA fixups,
        semantics/ccg.py:1073-1183): a comma conjunct (no 'and'/'or')
        closed by ', <verb>' ("Robbie, a player, charged"), by a relative
        pronoun ("cheered Robbie, a player who charged"), or — for an
        indefinite alias of a propername anchor — at end of sentence.
        Fronted appositives ("A tennis player, Robbie charged …") invert:
        the propername becomes the referent, the fronted NP the alias.
        The alias is published as ``alias_of_last_group`` so relative
        clauses attach to it instead of the anchor.
        """
        group: list[Mention] = []
        # tracked locally: nested speculative parses (alias PP chains)
        # call _parse_np_group recursively and would clobber the instance
        # attribute; it is published ONCE on return
        alias_local: Mention | None = None
        self.alias_of_last_group = None
        m, i = self._parse_simple_np(i, absorb_av=absorb_av)
        if m is None:
            return group, i
        group.append(m)
        while i + 1 < self.n:
            j = None
            via_comma = False
            if (self.tags[i] == CC and self.toks[i].lower() in ("and", "or")
                    and self.tags[i + 1] in _NP_START):
                j = i + 1
            elif self.toks[i] == ",":
                # comma-separated list conjunct: "Alice, Bob and Carol" /
                # "the patch, the query and the report" (incl. Oxford
                # comma).  ', who …' stays a relative — excluded here.
                k = i + 1
                if (k < self.n and self.tags[k] == CC
                        and self.toks[k].lower() in ("and", "or")):
                    k += 1
                else:
                    via_comma = True
                if k < self.n and self.tags[k] in (NNP, PRON, NN, DT,
                                                   POSSPRON):
                    j = k
            if j is None:
                break
            mark = self._mark()
            m2, i2 = self._parse_simple_np(j, absorb_av=absorb_av)
            if m2 is None:
                break
            rel_target = m2
            if via_comma:
                # a PP chain on the conjunct belongs to it ('vice chairman
                # OF W.R. GRACE & CO.,', 'a specialist IN EAST ASIAN
                # ECONOMIES') — absorb before the appositive close checks;
                # a following relative attaches to the chain's LAST NP
                rel_target, i2 = self._absorb_pp_chain(
                    i2, m2, absorb_av=absorb_av, rewind_on_vg=True)
            if via_comma:
                # appositive closings (see docstring); ``allow_appos``
                # off inside fronted-PP adjuncts — 'In an upbeat
                # assessment, Christine Lagarde said …' is PP + subject,
                # never an appositive pair
                close_vg = allow_appos and (
                    i2 < self.n and self.toks[i2] == ","
                    and (self._looks_like_vg(i2 + 1)
                         or (i2 + 1 < self.n
                             and self.tags[i2 + 1] == REL)))
                close_rel = allow_appos and (
                    i2 < self.n and self.tags[i2] == REL
                    and m.kind == "propername")
                at_end = i2 >= self.n or (self.tags[i2] == PUNCT
                                          and i2 == self.n - 1)
                # sentence-final alias of a propername anchor: indefinite
                # ('Robbie, a player.') or a DESCRIPTIVE definite
                # ('Elsevier N.V., the Dutch publishing group.' —
                # reference wsj_0001.2).  Definite aliases require a
                # common-noun head and ≥2 content tokens: a bare
                # the-NP after a name is usually an afterthought object
                # or asyndetic list ('We visited London, the Alps.'),
                # not an alias (review r4 pass-3 finding #3)
                close_end = (allow_appos and at_end
                             and m.kind == "propername"
                             and (self._starts_indef(m2)
                                  or (self.toks[m2.start].lower() == "the"
                                      and m2.kind == "entity"
                                      and m2.end - m2.start >= 2)))
                if close_vg or close_rel or close_end:
                    self.aka.append((m, m2))
                    # a relative after the alias attaches to the LAST NP
                    # of the alias's PP chain ('chairman of W.R. Grace &
                    # Co., which holds …' → the company holds)
                    alias_local = rel_target
                    i = i2 + 1 if close_vg else i2
                    continue
                if (allow_appos and m2.kind == "propername"
                        and self._starts_indef(m)
                        and self._looks_like_vg(i2)):
                    # fronted appositive: alias first, referent second
                    self.aka.append((m2, m))
                    group[-1] = m2
                    i = i2
                    break
                if self._looks_like_vg(i2):
                    # comma conjunct directly before a verb group is the
                    # NEXT clause's subject, not a list member
                    # ("Without the expenses, the company would …")
                    self._rewind(mark)
                    break
            if revert_if_verb_follows and i2 < self.n \
                    and self.tags[i2] in (V, MD, AUX, NOT):
                self._rewind(mark)
                break
            group.append(m2)
            i = i2
        self.alias_of_last_group = alias_local
        return group, i

    # -- verb group ---------------------------------------------------------

    def _parse_vg(self, i: int):
        """[MD] [AUX]* [NOT] [ADV]* V → (lemma, polarity, passive, modal, vidx, next_i)
        or None."""
        toks, tags, n = self.toks, self.tags, self.n
        polarity, modal, had_aux, aux_lemmas = "pos", "", False, []
        advs: list[int] = []
        j = i
        if j < n and tags[j] == MD:
            modal = toks[j].lower()
            j += 1
        while j < n and (tags[j] in (AUX, NOT, ADV)):
            if tags[j] == NOT:
                polarity = "neg"
            elif tags[j] == AUX:
                had_aux = True
                aux_lemmas.append(AUXILIARIES[toks[j].lower()][0])
            else:
                advs.append(j)
            j += 1

        def _advp():
            # adverbial modifier run → ADVP adjunct (ccg.py:783-989)
            if advs:
                self.constituents.append(("ADVP", advs[0], advs[-1], True))

        if j < n and tags[j] == V:
            lw = toks[j].lower()
            lemma = lemmatize_verb(lw)
            passive = (had_aux and aux_lemmas and aux_lemmas[-1] == "be"
                       and (lw.endswith("ed") or lw in IRREGULAR_VERBS))
            if (passive and lw.endswith("ed") and j + 1 < n
                    and tags[j + 1] == IN
                    and toks[j + 1].lower() != "by"):
                # adjectival participle, not a passive: 'am disappointed
                # with the review', 'is located in Los Angeles' — copular
                # 'be' + ATTR complement (reference (S[adj]\NP)/PP
                # categories); a true passive takes a 'by' agent
                vidx = j - 1
                while vidx > i and tags[vidx] != AUX:
                    vidx -= 1
                _advp()
                return "be", polarity, False, modal, vidx, j
            _advp()
            return lemma, polarity, passive, modal, j, j + 1
        # adjectival participle that is really a passive: 'was broken by X'
        if (had_aux and aux_lemmas and aux_lemmas[-1] == "be"
                and j < n and tags[j] == ADJ and toks[j].lower().endswith("ed")
                and j + 1 < n and toks[j + 1].lower() == "by"):
            _advp()
            return (lemmatize_verb(toks[j].lower()), polarity, True,
                    modal, j, j + 1)
        # copular / auxiliary-as-main-verb: "Anna is a doctor"
        if had_aux and (j >= n or tags[j] not in (V,)):
            vidx = j - 1
            while vidx > i and tags[vidx] != AUX:
                vidx -= 1
            _advp()
            return aux_lemmas[-1], polarity, False, modal, vidx, j
        return None

    # -- clause assembly ----------------------------------------------------

    _WH_WORDS = ("who", "whom", "what", "which")

    def _parse_wh_start(self):
        """Sentence-initial wh-question (reference: S[wq] category queries,
        ccg/__init__.py:1301-1409).  Returns (subj_group, start_i).

        Subject question  ('Who approved the patch?'): the wh word IS the
        subject — hand it to the normal clause loop.
        Object question   ('What did Alice approve?'): do-support aux then
        the true subject NP then the base verb; the wh word is the fronted
        ARG1."""
        wh = Mention(0, 0, self.toks[0], self.toks[0].lower(), "wh")
        self.mentions.append(wh)
        is_do_q = (self.n > 1 and self.tags[1] == AUX
                   and AUXILIARIES[self.toks[1].lower()][0] == "do")
        if not is_do_q:
            return [wh], 1                       # subject question / copular
        polarity, j = "pos", 2
        while j < self.n and self.tags[j] in (NOT, ADV):
            if self.tags[j] == NOT:
                polarity = "neg"
            j += 1
        n_mentions, n_consts = len(self.mentions), len(self.constituents)
        group, j2 = self._parse_np_group(j)
        # negation can follow the subject in do-support questions:
        # "What did Bob not review?"
        while j2 < self.n and self.tags[j2] in (NOT, ADV):
            if self.tags[j2] == NOT:
                polarity = "neg"
            j2 += 1
        if group and j2 < self.n and (self.tags[j2] == V
                                      or _morph_verb(self.toks[j2].lower())):
            ev = Event(j2, lemmatize_verb(self.toks[j2].lower()), polarity,
                       subjects=list(group))
            ev.objects.append(wh)
            ev.set_role(wh, "ARG1")
            self.events.append(ev)
            self.constituents.append(("VP", j2, j2, False))
            i = self._parse_arguments(ev, j2 + 1)
            return group, i
        del self.mentions[n_mentions:]           # revert; treat as subject q
        del self.constituents[n_consts:]
        return [wh], 1

    def parse(self):
        i = 0
        subj_group: list[Mention] = []
        # subject–aux inversion leaves a stranded modal ("Can you deploy
        # the service?"); carry it onto the clause's event
        pending_modal = ""
        # a conjunction directly before a verb group coordinates VPs:
        # the new event shares the PREVIOUS event's subjects ("… who
        # charged the umpire and tried to crack …" keeps the relative
        # head, not the matrix subject)
        cc_before_vg = False
        # True once a main-clause verb has consumed subj_group; embedded
        # relative-clause events don't count ('The bids THAT ARRIVED
        # LATE, he added, were …' must still see a pending matrix
        # subject — review)
        matrix_started = False
        if self.n and self.tags[0] == REL \
                and self.toks[0].lower() in self._WH_WORDS:
            subj_group, i = self._parse_wh_start()
        elif (self.n >= 2 and self.toks[0].lower() == "that"
              and self.tags[1] == REL):
            # free relative 'That which is perceived …' — the
            # demonstrative+relativizer is ONE pronoun-like subject
            # (reference WDT span 'That which', conj_test.py:158-191)
            m = Mention(0, 1, " ".join(self.toks[0:2]), "that", "pronoun")
            self.mentions.append(m)
            self.constituents.append(("NP", 0, 1, False))
            subj_group = [m]
            i = 2
        while i < self.n:
            t = self.tags[i]
            if t in _NP_START:
                group, i2 = self._parse_np_group(i)
                cc_before_vg = False
                if group:
                    # quotative parenthetical BEFORE the matrix verb:
                    # 'The bids, he added, were contrary …'
                    # (gold_constituent_test.py Wsj0051_13) — the comma-
                    # framed pronoun+speech-verb aside must not steal the
                    # pending matrix subject; the matrix event (parsed
                    # next) becomes the speech verb's ARG1
                    if (subj_group and not matrix_started
                            and self._fronted_quote_ev is None
                            and len(group) == 1
                            and group[0].kind == "pronoun"
                            and i > 0 and self.toks[i - 1] == ","
                            and i2 < self.n
                            and self.tags[i2] in (V, AUX, MD, NOT, ADV)):
                        mark_q = self._mark()
                        vgq = self._parse_vg(i2)
                        if not (vgq is not None
                                and vgq[0] in _COMPLEMENT_VERBS
                                and vgq[5] < self.n
                                and self.toks[vgq[5]] == ","):
                            self._rewind(mark_q)
                            vgq = None
                        if vgq is not None:
                            (lemma, polarity, passive,
                             modal, vidx, iq) = vgq
                            ev = Event(vidx, lemma, polarity, modal,
                                       passive, subjects=list(group))
                            self.events.append(ev)
                            self.constituents.append(
                                ("VP", vidx, vidx, False))
                            self._fronted_quote_ev = ev
                            i = iq
                            continue
                    subj_group = group
                    i = i2
                    rel_head = self.alias_of_last_group or group[-1]
                    # pre-verb PP chain on the subject: 'Yields on funds
                    # continued …' — keep the chain's first NP as subject
                    # and emit noun-PP facts (reference emits from(X1,X2),
                    # for(X2,X3) conditions, test/compose_test.py:432)
                    if not self.events:
                        rel_head, i = self._absorb_pp_chain(
                            i, rel_head, absorb_av=True)
                    # subject relative clause: "the engineer who reviewed
                    # the patch approved …" — embedded event shares the
                    # head NP as subject (reference REL handling feeds the
                    # same referent, lexeme.py _RELPRON); after an
                    # appositive the alias is the head ("cheered Robbie,
                    # a player who charged …").  A non-restrictive comma
                    # before the relativizer attaches to the NEAREST
                    # parsed NP ("chairman of W.R. Grace & Co., which
                    # holds …" → the company holds)
                    if (i + 1 < self.n and self.toks[i] == ","
                            and self.tags[i + 1] == REL):
                        i += 1
                    if i < self.n and self.tags[i] == REL:
                        vg = self._parse_vg(i + 1)
                        if vg is not None:
                            lemma, polarity, passive, modal, vidx, i = vg
                            sub = Event(vidx, lemma, polarity, modal, passive,
                                        subjects=[rel_head])
                            self.events.append(sub)
                            self.constituents.append(("VP", vidx, vidx, False))
                            i = self._parse_arguments(sub, i)
                        elif (i + 1 < self.n
                              and self.tags[i + 1] in _NP_START):
                            # object relative: "the patch that Alice
                            # reviewed failed" — embedded subject NP then
                            # verb; the head NP is the fronted ARG1
                            # (reference combinators,
                            # ccg/__init__.py:1301-1409)
                            mark = self._mark()
                            emb, j = self._parse_np_group(i + 1)
                            vg2 = self._parse_vg(j) if emb else None
                            if vg2 is not None:
                                (lemma, polarity, passive,
                                 modal, vidx, j2) = vg2
                                sub = Event(vidx, lemma, polarity, modal,
                                            passive, subjects=list(emb))
                                self.events.append(sub)
                                self.constituents.append(("VP", vidx, vidx, False))
                                i = self._parse_arguments(sub, j2,
                                                          in_relative=True)
                                self._attach_gap(sub, rel_head)
                            else:
                                self._rewind(mark)
                    continue
                i = i2 if i2 > i else i + 1
                continue
            if (t == IN and not self.events and not subj_group
                    and i + 1 < self.n and self.tags[i + 1] in _NP_START):
                # sentence-initial adjunct PP ("On the other hand, …",
                # "Without the expenses, the company …"): consume it so
                # its NP never becomes the clause subject.  A verb group
                # right after the NP is the old subordinate-clause path —
                # leave it to the generic flow below.
                mark = self._mark()
                pg, ip = self._parse_np_group(i + 1, allow_appos=False)
                if pg and not self._looks_like_vg(ip):
                    self.constituents.append(("PP", i, pg[-1].end, True))
                    # remember it: once the matrix event exists the PP
                    # attaches as its adjunct (reference Rel('without',
                    # [E, expenses]), test/number_test.py:58) — but only
                    # a TRULY sentence-initial PP; at i>0 the PP trails
                    # something else ('Upset by the bad call, …') and
                    # belongs to that phrase, not the matrix verb
                    if i == 0:
                        self._fronted_pps.append((self.toks[i].lower(), pg))
                    i = ip
                    continue
                self._rewind(mark)
            vg = self._parse_vg(i) if t in (V, AUX, MD, NOT, ADV) else None
            if vg is not None:
                vg_start = i
                lemma, polarity, passive, modal, vidx, i = vg
                # fronted quotative: 'Said Calder: "The build failed."' —
                # a sentence-initial complement verb + propername + a
                # colon/quote frame inverts: the name is the SUBJECT and
                # the quoted clause's event (parsed next) becomes ARG1
                # (reference quoted-span handling, semantics/ccg.py
                # constituent refinement)
                if (lemma in _COMPLEMENT_VERBS and not self.events
                        and vg_start == 0 and i < self.n
                        and self.tags[i] == NNP):
                    mark = self._mark()
                    qgroup, iq = self._parse_np_group(i)
                    if (qgroup and iq < self.n
                            and self.toks[iq] in (":", '"')):
                        ev = Event(vidx, lemma, polarity, modal, passive,
                                   subjects=list(qgroup))
                        self.events.append(ev)
                        self.constituents.append(
                            ("VP", vg_start, vidx, False))
                        self._fronted_quote_ev = ev
                        i = iq
                        continue
                    # plain imperative ('Tell Bob the truth.') — undo the
                    # speculative NP and fall through
                    self._rewind(mark)
                # quotative inversion: '…, says Kent Calder, a specialist
                # in …' — the propername AFTER a clause-final complement
                # verb is its subject, and the main clause's event is its
                # ARG1 (reference (S[dcl]\S[dcl])\NP quotative category,
                # test/compose_test.py:800-933).  A closing quote may sit
                # between the comma and the verb ('"…," said Kent Calder')
                prev_q = vg_start - 1
                while prev_q >= 0 and self.toks[prev_q] == '"':
                    prev_q -= 1
                if (lemma in _COMPLEMENT_VERBS and self.events
                        and prev_q >= 0 and self.toks[prev_q] == ","
                        and i < self.n and self.tags[i] == NNP):
                    quoted = self.events[-1]
                    qgroup, iq = self._parse_np_group(i)
                    if qgroup:
                        ev = Event(vidx, lemma, polarity, modal, passive,
                                   subjects=list(qgroup))
                        ev.objects.append(quoted)
                        ev.set_role(quoted, "ARG1")
                        self.events.append(ev)
                        self.constituents.append(
                            ("VP", vg_start, vidx, False))
                        # subj_group stays the MATRIX subject — a
                        # mid-sentence parenthetical ('…, says Bob, will
                        # be reverted') must not steal the continuation
                        cc_before_vg = False
                        i = iq
                        continue
                base_subjects = list(subj_group)
                if cc_before_vg and self.events and self.events[-1].subjects:
                    base_subjects = list(self.events[-1].subjects)
                cc_before_vg = False
                matrix_started = True
                co = [(vg_start, lemma, polarity, passive, modal, vidx)]
                # immediate verb coordination: 'makes and distributes NP'
                # is ONE merged event in the reference ('makes
                # distributes', test/conj_test.py:102-156) — flattened
                # here as sibling events sharing subjects and objects
                while (i + 1 < self.n and self.tags[i] == CC
                       and self.toks[i].lower() in ("and", "or")):
                    k = i + 1
                    if (self.tags[k] == NN and _is_ambiguous(
                            self.toks[k].lower())):
                        self.tags[k] = V  # 'rates and reviews …'
                    vg2 = self._parse_vg(k) if self.tags[k] in (
                        V, AUX, MD, NOT, ADV) else None
                    if vg2 is None:
                        break
                    l2, pol2, pas2, mod2, vx2, i = vg2
                    # a bare participial conjunct under a shared aux
                    # inherits the head's voice: 'is perceived or known
                    # or inferred' is ONE passive group in the reference
                    # (conj_test.py:158-191 'is perceived known
                    # inferred') — but only when it takes no object NP:
                    # 'was fouled and CHARGED THE UMPIRE' is an active
                    # second conjunct (review: passive inheritance must
                    # not invert its roles)
                    if (passive and not pas2
                            and self.toks[vx2].lower().endswith(
                                ("ed", "en", "wn"))
                            and (i >= self.n
                                 or self.tags[i] not in _NP_START)):
                        pas2 = True
                    co.append((k, l2, pol2, pas2, mod2, vx2))
                events = []
                for (vs, lm, pol, pas, mod, vx) in co:
                    e = Event(vx, lm, pol, mod or pending_modal, pas,
                              subjects=list(base_subjects))
                    self.events.append(e)
                    self.constituents.append(("VP", vs, max(vx, vs), False))
                    events.append(e)
                pending_modal = ""
                # arguments attach to the verb nearest them (the last);
                # siblings share the parsed objects
                last = events[-1]
                self.constituents[-1] = (
                    "VP", co[-1][0], max(co[-1][5], i - 1), False)
                i = self._parse_arguments(last, i)
                for e in events[:-1]:
                    # only same-voice siblings share: 'was fouled and
                    # charged the umpire' must not hand the active
                    # conjunct's object to the passive head
                    if e.passive != last.passive:
                        continue
                    e.objects = list(last.objects)
                    for o in last.objects:
                        e.set_role(o, *last.role_of(o))
                continue
            if t == MD and i + 1 < self.n and self.tags[i + 1] in _NP_START:
                # inverted modal question: the subject NP follows the modal
                pending_modal = self.toks[i].lower()
            elif t == CC:
                pending_modal = ""
                cc_before_vg = True
            elif t == PUNCT and self.toks[i] == "(":
                # clauseless parenthetical — '(living or nonliving)':
                # only modifier-class tokens inside, so no event may be
                # minted from it (the reference renders it an RT_EMPTY
                # phrase on the preceding NP, conj_test.py:158-191); a
                # parenthesized full clause still parses normally
                j = i + 1
                while j < self.n and self.toks[j] != ")":
                    j += 1
                inner = self.tags[i + 1:j]
                # verbs qualify only as -ing participles ('living or
                # nonliving'); a finite '( rebounded )' still parses
                # (review: the skip must not swallow real events)
                if inner and all(
                        tg in (ADJ, ADV, CC, NUM)
                        or (tg == V and self.toks[i + 1 + k].lower()
                            .endswith("ing"))
                        for k, tg in enumerate(inner)):
                    i = j + 1
                    continue
                pending_modal = ""
                cc_before_vg = False
            elif t in (PUNCT, SUB):
                # clause boundary: a stranded modal must not leak onto an
                # unrelated later clause ("Could the, Alice reviewed …")
                pending_modal = ""
                if t == SUB or self.toks[i] not in (",",):
                    cc_before_vg = False
            i += 1
        # fronted quotative: attach the quoted clause's first event as
        # the speech verb's ARG1 ('Said Calder: "The build failed."')
        fq = self._fronted_quote_ev
        if fq is not None:
            idx = self.events.index(fq)
            if idx + 1 < len(self.events):
                quoted = self.events[idx + 1]
                fq.objects.append(quoted)
                fq.set_role(quoted, "ARG1")
        # fronted adjunct PPs modify the matrix event: the first event
        # that is not embedded as another event's argument
        if self._fronted_pps and self.events:
            embedded = {id(o) for e in self.events for o in e.objects
                        if isinstance(o, Event)}
            # prefer an event with a resolved subject — auxiliary stubs
            # from subjunctive inversion ('had it existed then, …') have
            # none and would anchor the adjunct to a ghost clause; an
            # event whose subject directly follows such a stub ('had IT
            # existed') is the inverted conditional itself, also skipped
            aux_stub_vidx = {e.verb_idx for e in self.events
                             if not e.subjects}
            def _inverted(e):
                return (e.subjects and isinstance(e.subjects[0], Mention)
                        and e.subjects[0].start - 1 in aux_stub_vidx)
            tgt = next((e for e in self.events
                        if id(e) not in embedded and e.subjects
                        and not _inverted(e)),
                       next((e for e in self.events
                             if id(e) not in embedded), self.events[0]))
            for prep, group in self._fronted_pps:
                for m in group:
                    tgt.objects.append(m)
                    tgt.set_role(m, "ADV", prep)

    def _parse_arguments(self, ev: Event, i: int,
                         in_relative: bool = False) -> int:
        """Objects / complements after a verb group.

        ``in_relative``: inside an object-relative's embedded clause the
        zero-complementizer path must not fire — the token after the
        clause is the MATRIX verb, not an embedded complement ('Signs
        that managers expect declines EMERGED')."""
        toks, tags, n = self.toks, self.tags, self.n
        had_attr = False
        # copular/perception adjective complement: "The report is ready",
        # "Your apple pie smells very tempting", "I am really disappointed
        # with the review" (be + participle + non-'by' preposition is
        # adjectival, reference (S[adj]\NP)/PP categories)
        if ev.lemma in _COPULAR_ATTR_VERBS and i < n:
            k = i
            while k < n and tags[k] == ADV:
                k += 1
            is_adj = (k < n and tags[k] == ADJ
                      and (k + 1 >= n or tags[k + 1] not in (NN, NNP)))
            is_part = (ev.lemma == "be" and k < n and tags[k] == V
                       and toks[k].lower().endswith("ed")
                       and (k + 1 >= n or tags[k + 1] in (IN, PUNCT, CC,
                                                          SUB, TO)))
            if is_adj or is_part:
                # reference: adjective complements are _ATTRIBUTE
                # conditions (semantics/lexeme.py:792-805), not entities
                attr = Mention(k, k, toks[k], toks[k].lower(), "attribute")
                self.mentions.append(attr)
                ev.objects.append(attr)
                ev.set_role(attr, "ATTR")
                # predicative adjective: ADJP complement, NOT an adjunct
                self.constituents.append(("ADJP", k, k, False))
                i = k + 1
                had_attr = True
                # coordinated attributes: 'was early yesterday AND LATE
                # today' (reference test9_VPcordination) — (ADV)* CC
                # (ADV)* ADJ repeats the complement
                while i < n:
                    j = i
                    while j < n and tags[j] == ADV:
                        j += 1
                    if not (j < n and tags[j] == CC
                            and toks[j].lower() in ("and", "or")):
                        break
                    j += 1
                    while j < n and tags[j] == ADV:
                        j += 1
                    if not (j < n and tags[j] == ADJ
                            and (j + 1 >= n or tags[j + 1]
                                 not in (NN, NNP))):
                        break
                    attr2 = Mention(j, j, toks[j], toks[j].lower(),
                                    "attribute")
                    self.mentions.append(attr2)
                    ev.objects.append(attr2)
                    ev.set_role(attr2, "ATTR")
                    self.constituents.append(("ADJP", j, j, False))
                    i = j + 1
        # existential complement: 'said THERE WERE risks to the outlook'
        # — expletive 'there' + copula introduces a subject-less
        # existential clause (reference NP[thr] expletive category,
        # ccg/model.py); the copula's NP is its ARG1, never the matrix
        # subject's attribute
        if (i < n and toks[i].lower() == "there"
                and self._looks_like_vg(i + 1)):
            mark_t = self._mark()   # _parse_vg may emit ADVP adjuncts
            vg_t = self._parse_vg(i + 1)
            if vg_t is not None and vg_t[0] == "be":
                lemma, polarity, passive, modal, vidx, j = vg_t
                sub = Event(vidx, lemma, polarity, modal, passive,
                            subjects=[])
                self.events.append(sub)
                self.constituents.append(("VP", vidx, vidx, False))
                if ev.lemma in _COMPLEMENT_VERBS:
                    ev.objects.append(sub)
                    ev.set_role(sub, "ARG1")
                return self._parse_arguments(sub, j)
            self._rewind(mark_t)  # non-copular: leave to the normal flow
        # infinitive control: "wants to believe X" (AUX-tagged heads
        # 'to have'/'to be' included — conj_test.py:158 'inferred to
        # have its own distinct existence')
        if i < n and tags[i] == TO and i + 1 < n and tags[i + 1] in (V,
                                                                     AUX):
            sub = Event(i + 1, lemmatize_verb(toks[i + 1].lower()),
                        ev.polarity, subjects=list(ev.subjects))
            self.events.append(sub)
            ev.objects.append(sub)
            ev.set_role(sub, "ARG1")  # event-as-argument (lexeme.py:744-770)
            # reference renders this S_INF(#to believe …)
            self.constituents.append(("S_INF", i, i + 1, False))
            return self._parse_arguments(sub, i + 2)
        # complement clause: "said that the pipeline failed" — the
        # proposition is the ARG1 event (reference S[em] verb complements,
        # lexeme.py:744-770).  Only the DT-tagged 'that' (right after a
        # verb) is a complementizer; after a noun it retags REL and is
        # handled as a relative below.
        if (i < n and toks[i].lower() == "that" and tags[i] == DT
                and i + 1 < n and tags[i + 1] in _NP_START):
            mark = self._mark()
            emb, j = self._parse_np_group(i + 1)
            vg = self._parse_vg(j) if emb else None
            if vg is not None:
                lemma, polarity, passive, modal, vidx, j2 = vg
                sub = Event(vidx, lemma, polarity, modal, passive,
                            subjects=list(emb))
                self.events.append(sub)
                ev.objects.append(sub)
                ev.set_role(sub, "ARG1")
                self.constituents.append(("VP", vidx, vidx, False))
                return self._parse_arguments(sub, j2)
            # demonstrative after all ("merged that patch") — revert and
            # fall through to the direct-object parse
            self._rewind(mark)
        # direct object NP group
        if not had_attr and i < n and tags[i] in _NP_START:
            # ditransitive bare-plural recipients: 'give advertisers
            # discounts' — split the NN run so the recipient is its own
            # NP (reference _ARG1/_ARG2 scheme, test/possessive_test.py:99)
            if (ev.lemma in _DITRANSITIVE_VERBS and tags[i] == NN
                    and i + 1 < n and tags[i + 1] == NN
                    and toks[i].lower().endswith("s")
                    and toks[i + 1].lower().endswith("s")):
                rec, i = self._parse_simple_np(i, max_head_run=1)
                group = [rec] if rec is not None else []
            else:
                group, i = self._parse_np_group(
                    i, revert_if_verb_follows=True)
            ev.objects.extend(group)
            for m in group:
                ev.set_role(m, "ARG1")
            # relative clause on the object head: "merged the patch that
            # failed" (subject rel) / "merged the patch that Alice
            # reviewed" (object rel — head is the fronted ARG1); after an
            # object appositive the alias is the head
            if group and i < n and tags[i] == REL:
                head = self.alias_of_last_group or group[-1]
                vg = self._parse_vg(i + 1)
                if vg is not None:
                    lemma, polarity, passive, modal, vidx, i = vg
                    sub = Event(vidx, lemma, polarity, modal, passive,
                                subjects=[head])
                    self.events.append(sub)
                    self.constituents.append(("VP", vidx, vidx, False))
                    i = self._parse_arguments(sub, i)
                elif i + 1 < n and tags[i + 1] in _NP_START:
                    mark = self._mark()
                    emb, j = self._parse_np_group(i + 1)
                    vg2 = self._parse_vg(j) if emb else None
                    if vg2 is not None:
                        (lemma, polarity, passive, modal, vidx, j2) = vg2
                        sub = Event(vidx, lemma, polarity, modal, passive,
                                    subjects=list(emb))
                        self.events.append(sub)
                        self.constituents.append(("VP", vidx, vidx, False))
                        i = self._parse_arguments(sub, j2,
                                                  in_relative=True)
                        self._attach_gap(sub, head)
                    else:
                        self._rewind(mark)
            # ditransitive: 'gave Bob the report' — a determiner-led NP
            # right after the recipient is the true direct object; the
            # first NP is the recipient _ARG2, the second the theme _ARG1
            # (reference role scheme, lexeme.py:617-743)
            second_np = False
            if i < n:
                if ev.lemma in _DITRANSITIVE_VERBS \
                        and tags[i] in (DT, POSSPRON, NN):
                    second_np = True
                elif (tags[i] in (DT, POSSPRON)
                      and toks[i].lower() not in _ADJUNCT_DTS):
                    # generic double-object: 'asked him a question';
                    # quantified/demonstrative NPs after an object are
                    # adjuncts ('reports profits every quarter')
                    second_np = True
            if second_np:
                group2, i2 = self._parse_np_group(
                    i, revert_if_verb_follows=True)
                if group2:
                    for m in group:
                        ev.set_role(m, "ARG2")
                    for m in group2:
                        ev.set_role(m, "ARG1")
                    ev.objects.extend(group2)
                    i = i2
            # zero-complementizer embedded clause: 'said (that) the
            # pipeline failed', inverted 'had it existed' — the "object"
            # is really the embedded subject.  Only for complement-taking
            # verbs or subject-less (inverted/imperative-rescued) events,
            # so relative-clause sub-events never trigger it.
            if (group and i < n
                    and (ev.lemma in _COMPLEMENT_VERBS or not ev.subjects)
                    and tags[i] in (V, AUX, MD, NOT)):
                vg3 = self._parse_vg(i)
                if vg3 is not None and in_relative:
                    # inside an object relative, embedding may only
                    # consume this verb group if ANOTHER verb remains for
                    # the matrix clause ('the patch that Bob claimed
                    # Alice wrote FAILED' embeds; 'signs that managers
                    # expect declines EMERGED' must leave 'emerged')
                    j3 = vg3[5]
                    if not any(tags[k] in (V, AUX, MD)
                               for k in range(j3, n)):
                        vg3 = None
                if vg3 is not None:
                    lemma, polarity, passive, modal, vidx, j3 = vg3
                    drop = set(id(m) for m in group)
                    ev.objects = [o for o in ev.objects
                                  if id(o) not in drop]
                    sub = Event(vidx, lemma, polarity, modal, passive,
                                subjects=list(group))
                    self.events.append(sub)
                    self.constituents.append(("VP", vidx, vidx, False))
                    if ev.lemma in _COMPLEMENT_VERBS:
                        ev.objects.append(sub)
                        ev.set_role(sub, "ARG1")
                    return self._parse_arguments(sub, j3)
            # zero-relativizer object relative: 'the $ 5.9 million it
            # posted', 'the patch Alice submitted' — NP + PRON/NNP + verb
            # group; the object head is the embedded clause's ARG1
            if group and i < n and tags[i] in (PRON, NNP):
                mark = self._mark()
                cand, i3 = self._parse_simple_np(i)
                vg4 = None
                if cand is not None and i3 < n \
                        and tags[i3] in (V, AUX, MD, NOT):
                    vg4 = self._parse_vg(i3)
                if vg4 is not None:
                    lemma, polarity, passive, modal, vidx, j4 = vg4
                    sub = Event(vidx, lemma, polarity, modal, passive,
                                subjects=[cand])
                    sub.objects.append(group[-1])
                    sub.set_role(group[-1], "ARG1")
                    self.events.append(sub)
                    self.constituents.append(("VP", vidx, vidx, False))
                    i = self._parse_arguments(sub, j4)
                else:
                    self._rewind(mark)
            # object control: 'wants BRITAIN to stay in the EU' — the
            # direct object subjects the infinitive, but ONLY for
            # object-control verbs (review r4 finding #5: 'promised Bob
            # to pay' is subject control, 'bought a server to run tests'
            # is a purpose clause — both keep the matrix subject via the
            # generic flow)
            if group and ev.lemma in _OBJECT_CONTROL_VERBS \
                    and i < n and tags[i] == TO and i + 1 < n \
                    and tags[i + 1] in (V, AUX):
                sub = Event(i + 1, lemmatize_verb(toks[i + 1].lower()),
                            ev.polarity, subjects=list(group))
                self.events.append(sub)
                self.constituents.append(("S_INF", i, i + 1, False))
                return self._parse_arguments(sub, i + 2)
        # prepositional phrases
        np_anchor = next(
            (m for m in reversed(ev.objects)
             if isinstance(m, Mention)
             and m.kind in ("entity", "propername")), None)
        while i < n and tags[i] in (IN, TO, ADV, DATE):
            if tags[i] == DATE:
                # bare temporal NP after the predicate: 'is payable
                # Jan. 2 to stock …' (reference test/number_test.py:90
                # keeps 'Jan. 2' a nominal and the PP chain alive)
                dgroup, i2 = self._parse_np_group(i)
                if not dgroup:
                    break
                for m in dgroup:
                    ev.objects.append(m)
                    ev.set_role(m, "ADV")
                i = i2
                continue
            if tags[i] == ADV:
                part = toks[i].lower()
                ev.advs.append(part)  # 'step up' particles
                i += 1
                # verb-particle direct object: 'knocked OUT power' — the
                # particle is adverb-tagged, so without this the object
                # NP would be orphaned when the PP loop exits
                if (part in _VERB_PARTICLES and not ev.objects
                        and i < n and tags[i] in _NP_START):
                    mark = self._mark()
                    group, i2 = self._parse_np_group(i)
                    # bare temporal/measure NPs after a particle are
                    # adverbial ('picked up LAST QUARTER', 'gave up
                    # THREE TIMES') — attached with role ADV like the
                    # DATE branch, not as direct objects.  Head-noun
                    # check plus last/next only: 'this word' and
                    # 'every file' are genuine objects
                    temporal = (group and (
                        group[-1].kind in ("date", "number")
                        or group[-1].stem in _TEMPORAL_NP_HEADS
                        or toks[group[0].start].lower() in (
                            "last", "next")))
                    if group and temporal:
                        for m in group:
                            ev.objects.append(m)
                            ev.set_role(m, "ADV")
                        i = i2
                    elif group:
                        for m in group:
                            ev.objects.append(m)
                            # prep stays '' so the clause counts as
                            # complete for the relative-gap check (the
                            # particle itself is recorded in ev.advs)
                            ev.set_role(m, "ARG1")
                        i = i2
                        if group[-1].kind in ("entity", "propername"):
                            np_anchor = group[-1]
                    else:
                        self._rewind(mark)
                continue
            prep_idx, prep = i, toks[i].lower()
            if i + 1 < n and tags[i + 1] in _NP_START:
                group, i2 = self._parse_np_group(i + 1, absorb_av=True)
                if not group:
                    i = i + 1
                    continue
                # temporal/causal subordinate clause, not a PP: a FINITE
                # verb group right after the NP makes it the embedded
                # subject ("deleted the patch after the build finished") —
                # but ONLY under a preposition that can introduce a clause.
                # Under a pure noun-attaching prep ('of workers EXPOSED to
                # it', reference gold_constituent_test.py wsj_0003.1) the
                # verb is a reduced relative: the NP stays the PP's
                # complement AND subjects the embedded event, same as the
                # gerund case ("to vehicles weighing 10,000 pounds").
                vg_sub = self._parse_vg(i2) if i2 < n else None
                gerund_rel = (vg_sub is not None
                              and (self.toks[vg_sub[4]].lower()
                                   .endswith("ing")
                                   or prep not in _CLAUSE_PREPS))
                if vg_sub is not None and not gerund_rel:
                    (lemma, polarity, passive, modal, vidx, j2) = vg_sub
                    sub = Event(vidx, lemma, polarity, modal, passive,
                                subjects=list(group))
                    self.events.append(sub)
                    self.constituents.append(("VP", vidx, vidx, False))
                    i = self._parse_arguments(sub, j2)
                    continue
                adjunct_pp = True   # default: modifier PP ('on March 5')
                if (prep == "by" and ev.passive
                        and group[-1].kind in ("entity", "propername",
                                               "pronoun")
                        and group[-1].stem not in _TEMPORAL_NP_HEADS):
                    # logical subject of a passive
                    adjunct_pp = False
                    ev.agent_resolved = True
                    ev.subjects, deep_obj = group, ev.subjects
                    if not ev.objects:
                        ev.objects = deep_obj
                        for m in deep_obj:
                            ev.set_role(m, "ARG1")
                elif prep == "by" and ev.passive:
                    # 'paid BY FRIDAY / BY MIDNIGHT / BY THE DEADLINE'
                    # — a date/number/temporal-noun head after passive
                    # 'by' is a deadline adjunct, never the agent
                    pass
                elif not ev.objects and prep not in ("of",):
                    # sole PP complement: 'protested against the tax' —
                    # oblique _ARG2 with the preposition preserved
                    adjunct_pp = False
                    ev.objects.extend(group)
                    for m in group:
                        ev.set_role(m, "ARG2", prep)
                    if group[-1].kind in ("entity", "propername"):
                        np_anchor = group[-1]
                elif (prep == "to" and ev.objects
                      and all(m.kind in ("entity", "propername", "pronoun")
                              for m in group)):
                    # dative: 'sent the report to Bob' — recipient _ARG2
                    # (reference dative shift, lexeme.py:617-743)
                    adjunct_pp = False
                    ev.objects.extend(group)
                    for m in group:
                        ev.set_role(m, "ARG2", prep)
                    if group[-1].kind in ("entity", "propername"):
                        np_anchor = group[-1]
                if adjunct_pp and np_anchor is None and prep == "of":
                    # of-PP complement of a predicative adjective:
                    # 'becoming free of tobacco smoke' → of(free,smoke)
                    # (reference deps of→free, smoke→of,
                    # exec_test.py:224-227)
                    attr_anchor = next(
                        (m for m in reversed(ev.objects)
                         if isinstance(m, Mention)
                         and m.kind == "attribute"), None)
                    if attr_anchor is not None:
                        # distributes over coordinated members like the
                        # sibling attachment sites ('free of smoke and
                        # dust' → of(free,smoke), of(free,dust))
                        for member in group:
                            self.nmod.append((attr_anchor, prep, member))
                if adjunct_pp and np_anchor is not None and (
                        prep in _NOUN_ATTACH_PREPS
                        or (prep in _EVENT_NOMINAL_PREPS
                            and _is_event_nominal(np_anchor.stem))):
                    # noun-attached PP: 'a profit of $ 19.3 million for
                    # the first half of 1989' → of(profit, $19.3M),
                    # for(profit, half), of(half, 1989) — number/date
                    # heads never anchor further attachment (reference
                    # N/PP categories, test/number_test.py:58-64).
                    # between/among/about/… attach to nouns per the
                    # reference's preposition specials
                    # (semantics/lexeme.py:92-103); since/over attach
                    # only to event nominals ('the growth since the
                    # merger') — on a plain verb they stay adjuncts.
                    # The preposition distributes over coordinated NP
                    # members ('of flour and a pinch' → of(cup,flour),
                    # of(cup,pinch)); the chain continues from the last
                    # member ('of salt' then attaches to 'pinch')
                    for member in group:
                        self.nmod.append((np_anchor, prep, member))
                    if group[-1].kind in ("entity", "propername"):
                        np_anchor = group[-1]
                # PP phrase node; complements are arguments, the rest are
                # adjuncts (reference _mark_if_adjunct, ccg.py:633)
                self.constituents.append(
                    ("PP", prep_idx, group[-1].end, adjunct_pp))
                i = i2
                if gerund_rel:
                    (lemma, polarity, passive, modal, vidx, j2) = vg_sub
                    sub = Event(vidx, lemma, polarity, modal, passive,
                                subjects=[group[-1]])
                    self.events.append(sub)
                    self.constituents.append(("VP", vidx, vidx, False))
                    i = self._parse_arguments(sub, j2)
                    continue
                # reduced object relative inside the PP: 'rather than the
                # $ 5.9 million it posted'
                if i < n and tags[i] in (PRON, NNP):
                    mark = self._mark()
                    cand, i3 = self._parse_simple_np(i)
                    vg4 = None
                    if cand is not None and i3 < n \
                            and tags[i3] in (V, AUX, MD, NOT):
                        vg4 = self._parse_vg(i3)
                    if vg4 is not None:
                        lemma, polarity, passive, modal, vidx, j4 = vg4
                        sub = Event(vidx, lemma, polarity, modal, passive,
                                    subjects=[cand])
                        sub.objects.append(group[-1])
                        sub.set_role(group[-1], "ARG1")
                        self.events.append(sub)
                        self.constituents.append(("VP", vidx, vidx, False))
                        i = self._parse_arguments(sub, j4)
                    else:
                        self._rewind(mark)
            else:
                i += 1
        return i


# ---------------------------------------------------------------------------
# Referent numbering (reference final_rename semantics: first-occurrence
# order, unified counter, X for entities / E for events)
# ---------------------------------------------------------------------------


def _assign_refs(parser: _SentenceParser) -> None:
    items: list[tuple[int, object]] = []
    seen_mentions = set()
    for m in parser.mentions:
        if id(m) not in seen_mentions:
            seen_mentions.add(id(m))
            items.append((m.start, m))
    for e in parser.events:
        items.append((e.verb_idx, e))
    items.sort(key=lambda p: (p[0], 0 if isinstance(p[1], Mention) else 1))
    counter = 0
    for _, obj in items:
        counter += 1
        if isinstance(obj, Mention):
            obj.ref = f"X{counter}"
        else:
            obj.ref = f"E{counter}"


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def parse_sentence(sentence: str) -> "_SentenceParser | None":
    """One sentence → fully-parsed state (mentions/events/constituents)."""
    toks = tokenize(sentence)
    if not toks:
        return None
    tags = tag(toks)
    p = _SentenceParser(toks, tags)
    p.parse()
    # imperative rescue: agent/user turns are often "Review the patch."
    # — sentence-initial verb with no subject.  The noun-biased initial
    # tag yields zero events; re-parse with the first token forced to V
    # (reference: VP[b] imperatives get an unresolved _ARG0).
    # leading politeness/discourse particles don't block the rescue
    # ('Please FORWARD the contract …' — 'forward' is closed-ADV but
    # verb-listed): try every position in the leading particle run plus
    # the first content token; the NP-start lookahead (next tag) keeps a
    # verb-listed particle like 'please' from stealing the slot
    if not p.events:
        _cands = []
        _j = 0
        while _j < len(toks) - 1:
            _cands.append(_j)
            if tags[_j] not in (ADV, INTJ, PUNCT):
                break
            _j += 1
        for _c in _cands:
            if (_morph_verb(toks[_c].lower())
                    and tags[_c] in (NN, V, ADV)
                    and tags[_c + 1] in (DT, POSSPRON, NNP, PRON, TO, IN)):
                tags2 = list(tags)
                tags2[_c] = V
                p2 = _SentenceParser(toks, tags2)
                p2.parse()
                if p2.events:
                    p = p2
                    break
    # no-verb rescue: a clause whose only verb candidate was noun-tagged
    # ("… AIDS Research rates and reviews educational materials" — 'rates'
    # after an NNP defaults to NN).  Adjacent ambiguous tokens are a
    # garden path ('The budget reviews cover expenses': reviews=V gives
    # N-V-N, cover=V gives N-N-V) — the reference disambiguates via CCG
    # category templates (ccg/model.py); here every candidate in the
    # consecutive ambiguous run is tried and the reading that yields a
    # complete, number-agreeing clause wins (verdict r3 #3).  Ties prefer
    # the LATER candidate (the longer compound subject), matching the
    # natural reading of 'company reviews cover costs'.
    if not p.events:
        for idx in range(1, len(toks)):
            if (tags[idx] == NN and toks[idx].islower()
                    and _morph_verb(toks[idx].lower())):
                run = [idx]
                k = idx + 1
                while (k < len(toks) and tags[k] == NN
                       and toks[k].islower()
                       and _morph_verb(toks[k].lower())):
                    run.append(k)
                    k += 1
                best, best_score = None, None
                for v in run:
                    tags2 = list(tags)
                    tags2[v] = V
                    p2 = _SentenceParser(toks, tags2)
                    p2.parse()
                    if not any(e.subjects or e.objects
                               for e in p2.events):
                        continue
                    complete = any(e.subjects and e.objects
                                   for e in p2.events)
                    # number agreement: s-form verb ↔ non-s subject
                    # head; base form ↔ s-form (plural) subject head
                    vw = toks[v].lower()
                    sw = toks[v - 1].lower()
                    s_verb = vw.endswith("s")
                    s_subj = sw.endswith("s") and not sw.endswith("ss")
                    agree = s_verb != s_subj
                    score = (complete, agree, v)
                    if best_score is None or score > best_score:
                        best, best_score = p2, score
                if best is not None:
                    p = best
                    break
    # agentless passive: "The report was sent to Bob." — the surface
    # subject is the PATIENT; demote it to ARG1 and leave _ARG0 unresolved
    # (reference passive role swap, lexeme.py:662-679)
    for ev in p.events:
        if ev.passive and not ev.agent_resolved and ev.subjects:
            deep = ev.subjects
            ev.subjects = []
            ev.objects = deep + ev.objects
            for m in deep:
                ev.set_role(m, "ARG1")
    # negative-quantifier polarity: 'found NO evidence', 'NEITHER
    # engineer noticed' — a no/neither determiner on a core argument
    # negates the clause (¬∃x; the reference renders DT 'no' through
    # negation in its DRS, drt/drs.py Neg).  Mention.start includes the
    # determiner token, so the surface check is positional.
    for ev in p.events:
        if ev.polarity == "neg":
            continue
        for m in ev.subjects + ev.objects:
            if (isinstance(m, Mention)
                    and p.toks[m.start].lower() in ("no", "neither")
                    # 'found no evidence' and sole-complement obliques
                    # ('spoke TO no one') negate the clause; a 'with'
                    # accompaniment PP ('finished WITH no errors') is
                    # inner negation of the adjunct only — documented
                    # miss: argumental 'agree with no proposal'
                    and ev.role_of(m)[1] != "with"):
                ev.polarity = "neg"
                break
    _assign_refs(p)
    return p


def extract_constituents(sentence: str):
    """One sentence → [(vntype, start, end, adjunct, surface)] phrase
    inventory: NP/VP/S_INF/ADJP/ADVP/PP with adjunct marking (reference
    constituent output core/sentence.py:218-321, refined ccg.py:783-989,
    adjuncts per _mark_if_adjunct ccg.py:633)."""
    p = parse_sentence(sentence)
    if p is None:
        return []
    return [(t, s, e, adj, " ".join(p.toks[s:e + 1]))
            for (t, s, e, adj) in p.constituents]


def verbnet_view(sentence: str):
    """One sentence → the reference's flat *VerbNet sentence* phrase view
    (``get_verbnet_sentence()``, semantics/ccg.py — the inventory its
    golden-constituent suite asserts, test/gold_constituent_test.py):
    ``[(vntype, surface)]`` in span order.

    Derived from the full constituent inventory by the reference's own
    view conventions:
      - PP nodes carry only their preposition token (``PP(#of)``)
      - attributive ADJP/ADVP adjuncts nested in a larger phrase drop
      - an appositive starting with an age phrase (``, 61 years old``)
        becomes one ADJP over the whole appositive region
      - a quotative parenthetical (``, he added,``) becomes one ADVP
      - a bare-participle VP modifying a PP object becomes an ADVP over
        the participial phrase (``exposed to it … ago``); pronoun NPs and
        their PPs inside it drop
      - a predicative ADJP extends over its PP complement
        (``contrary to common sense``)
    """
    p = parse_sentence(sentence)
    if p is None:
        return []
    return [(t, " ".join(p.toks[s:e + 1]))
            for (t, s, e, _ef) in _verbnet_rows(p)]


def _verbnet_rows(p) -> list:
    """Parsed sentence state → the VerbNet-view rows WITH spans:
    ``[(vntype, start, display_end, full_end)]`` — display span is what
    the reference's view prints (PP = preposition token only), full span
    is the underlying phrase extent (used by the constituent tree)."""
    toks, tags, n = p.toks, p.tags, len(p.toks)
    rows = [list(r) for r in p.constituents]   # [vntype, start, end, adj]
    pp_ends = {r[2] for r in rows if r[0] == "PP"}

    # quotative parenthetical: , PRON V , → one ADVP, nested rows drop
    paren_spans = []
    for i in range(n - 3):
        if (toks[i] == "," and tags[i + 1] == PRON and tags[i + 2] == V
                and toks[i + 3] == ","):
            paren_spans.append((i + 1, i + 2))
    # age appositive: , NUM … ADJ … , → one ADJP over the region
    age_spans = []
    for i in range(n - 1):
        if toks[i] == "," and tags[i + 1] == NUM:
            j = i + 1
            while j < n and toks[j] != ",":
                j += 1
            if any(tags[k] == ADJ for k in range(i + 1, j)):
                age_spans.append((i + 1, j - 1))

    out = []
    for vntype, s, e, adj in rows:
        if any(a <= s and e <= b for a, b in paren_spans):
            continue
        if vntype == "VP":
            vidx = next((k for k in range(s, e + 1) if tags[k] == V), None)
            has_aux = any(tags[k] in (AUX, MD) for k in range(s, e + 1))
            if (vidx is not None and not has_aux
                    and toks[vidx].lower().endswith("ed")
                    and s > 0 and s - 1 in pp_ends):
                # reduced participial on a PP object → ADVP through its
                # complements (up to the matrix aux / clause punctuation)
                k = e + 1
                while k < n and tags[k] not in (AUX, MD, PUNCT):
                    k += 1
                if any(tags[m2] in (V, AUX, MD) for m2 in range(k, n)):
                    out.append(["ADVP", s, k - 1, False])
                    continue
        out.append([vntype, s, e, adj])
    for a, b in paren_spans:
        out.append(["ADVP", a, b, False])
    for a, b in age_spans:
        out.append(["ADJP", a, b, False])

    advp_spans = [(s, e) for t, s, e, _ in out if t == "ADVP"]
    final = []
    for vntype, s, e, adj in out:
        # attributive adjuncts nested inside a larger phrase drop
        if adj and vntype in ("ADJP", "ADVP") and any(
                (s2 <= s and e <= e2 and (s2, e2) != (s, e))
                for _, s2, e2, _ in out):
            continue
        # pronoun NPs and their PPs inside a participial ADVP drop
        if any(a <= s and e <= b and (s, e) != (a, b)
               for a, b in advp_spans):
            if vntype == "NP" and s == e and tags[s] == PRON:
                continue
            if vntype == "PP" and tags[e] == PRON:
                continue
        # predicative ADJP extends over its PP complement chain
        if vntype == "ADJP" and not adj:
            last = e
            for t2, s2, e2, _ in out:
                if t2 == "PP" and s2 == last + 1:
                    last = e2
            e = last
        e_full = e
        if vntype == "PP":
            e = s  # the view keeps only the preposition token
        final.append((s, -e_full, vntype, e, e_full))
    final.sort()
    seen, result = set(), []
    for s, _negEF, vntype, e, e_full in final:
        key = (vntype, s, e_full)
        if key not in seen:
            seen.add(key)
            result.append((vntype, s, e, e_full))
    return result


def verbnet_tree(sentence: str):
    """One sentence → the reference's nested constituent tree over the
    VerbNet-view rows (``get_constituent_tree()``, core/sentence.py —
    the ``(root, [(child, […]), …])`` reprs its golden-constituent suite
    asserts, test/gold_constituent_test.py).  Node ids are indices into
    ``verbnet_view(sentence)``.

    Attachment mirrors the reference derivations via this parser's own
    relations: noun-PP chains nest PP under the anchor NP and the hop NP
    under the PP; appositive aliases nest under their referent;
    age-appositive ADJPs under the preceding NP with the region's phrases
    inside; reduced-participial ADVPs under the modified NP (the chain
    head when pre-matrix); events parent their subject/object phrases;
    a trailing attribution clause (', researchers reported') roots the
    tree with the main clause's VP as its child."""
    p = parse_sentence(sentence)
    if p is None:
        return None
    rows = _verbnet_rows(p)
    if not rows:
        return None
    toks = p.toks

    def smallest(pred):
        best = None
        for idx, (t, s, _e, ef) in enumerate(rows):
            if pred(idx, t, s, ef) and (
                    best is None
                    or ef - s < rows[best][3] - rows[best][1]):
                best = idx
        return best

    def node_np(m):
        return smallest(lambda i, t, s, ef:
                        t == "NP" and s <= m.start and m.end <= ef)

    def node_event(ev):
        return smallest(lambda i, t, s, ef:
                        t in ("VP", "ADVP", "S_INF")
                        and s <= ev.verb_idx <= ef)

    parent: dict[int, int] = {}

    def set_parent(c, par):
        if c is not None and par is not None and c != par \
                and c not in parent:
            # reject cycles (a node can never parent its own ancestor)
            a = par
            while a is not None:
                if a == c:
                    return
                a = parent.get(a)
            parent[c] = par

    # 1. noun-PP chains: PP under the anchor NP, hop NP under the PP.
    #    Non-of/for hops whose anchor is itself an of/for dependent lift
    #    one level (the reference derivation stacks both NP\NP modifiers
    #    on the same NP: 'a high percentage (of cancer deaths)(among …)')
    offor_head = {id(dep): head for head, pr, dep in p.nmod
                  if pr in ("of", "for")}
    for head, prep, dep in p.nmod:
        if prep not in ("of", "for") and id(head) in offor_head:
            head = offor_head[id(head)]
        h, d = node_np(head), node_np(dep)
        pp = next((i for i, (t, s, _e, ef) in enumerate(rows)
                   if t == "PP" and s < dep.start and ef == dep.end), None)
        if pp is not None:
            # the hop's own NP starts right after the preposition (the
            # chain-end mention may sit deeper, e.g. past an appositive)
            d2 = smallest(lambda i, t2, s2, ef2:
                          t2 == "NP" and s2 == rows[pp][1] + 1)
            if d2 is not None:
                d = d2
        set_parent(pp, h)
        set_parent(d, pp)
    # 2. age-appositive ADJP: under the NP before its comma; the region's
    #    still-unparented phrases under the ADJP
    matrix_starts = [s for (t, s, _e, _ef) in rows if t == "VP"]
    first_vp_start = min(matrix_starts, default=len(toks))
    for idx, (t, s, _e, ef) in enumerate(rows):
        if t == "ADJP" and s >= 2 and toks[s - 1] == ",":
            anchor = smallest(lambda i, t2, s2, ef2:
                              t2 == "NP" and ef2 == s - 2)
            set_parent(idx, anchor)
            for j, (t2, s2, _e2, ef2) in enumerate(rows):
                if j != idx and s <= s2 and ef2 <= ef:
                    set_parent(j, idx)
        if t == "ADVP" and s >= 1 and toks[s - 1] != ",":
            # reduced participial: attach to the modified NP — the chain
            # HEAD when the phrase precedes the matrix verb (reference
            # NP\NP application over the whole chained NP)
            prev = smallest(lambda i, t2, s2, ef2:
                            t2 == "NP" and ef2 == s - 1)
            if prev is not None and s < first_vp_start:
                walked = True
                while walked:
                    walked = False
                    for head, _pr, dep in p.nmod:
                        if node_np(dep) == prev:
                            prev = node_np(head)
                            walked = True
                            break
            set_parent(idx, prev)
    # 3. appositive aliases under their referent
    for name, alias in p.aka:
        set_parent(node_np(alias), node_np(name))
    # 4. events parent their arguments; control events nest
    for ev in p.events:
        v = node_event(ev)
        for m in ev.subjects:
            set_parent(node_np(m), v)
        for o in ev.objects:
            if isinstance(o, Event):
                set_parent(node_event(o), v)
            elif o.kind != "attribute":
                set_parent(node_np(o), v)
    # 4b. remaining phrases inside a participial ADVP belong to it
    #     ('more than 30 years' inside 'exposed to it … ago'); runs
    #     AFTER event/nmod links so deeper attachments win
    for idx, (t, s, _e, ef) in enumerate(rows):
        if t == "ADVP":
            for j, (t2, s2, _e2, ef2) in enumerate(rows):
                if j != idx and s <= s2 and ef2 <= ef:
                    set_parent(j, idx)
    # 5. verb-adjunct PPs (not in a noun chain) under the nearest
    #    preceding VP; their NP under the PP
    for idx, (t, s, _e, ef) in enumerate(rows):
        if t == "PP" and idx not in parent:
            vp = None
            for j, (t2, s2, _e2, _ef2) in enumerate(rows):
                if t2 == "VP" and s2 < s and (
                        vp is None or s2 > rows[vp][1]):
                    vp = j
            set_parent(idx, vp)
            for j, (t2, s2, _e2, ef2) in enumerate(rows):
                if t2 == "NP" and s < s2 and ef2 <= ef:
                    set_parent(j, idx)
    def top(i):
        while i in parent:
            i = parent[i]
        return i

    # 6. root selection: a trailing attribution clause roots the tree
    matrix = [node_event(ev) for ev in p.events]
    matrix = [v for i, v in enumerate(matrix)
              if v is not None and rows[v][0] == "VP"
              and not any(p.events[i] in e2.objects for e2 in p.events)]
    matrix = sorted(set(matrix))
    root = matrix[0] if matrix else top(0)
    last_ev = next((ev for ev in reversed(p.events)
                    if node_event(ev) == matrix[-1]), None) if matrix \
        else None
    if (len(matrix) > 1 and last_ev is not None
            and last_ev.lemma in _COMPLEMENT_VERBS
            and last_ev.subjects
            and last_ev.subjects[0].start >= 1
            and toks[last_ev.subjects[0].start - 1] == ","):
        root = matrix[-1]
    # 7. attach every remaining component's TOP under the root — always
    #    acyclic (a component top has no parent, and it is never the
    #    root's own top), unlike a per-node fallback which could close a
    #    cycle when the chosen root already sat inside a parented chain
    #    (review r4 pass-3 finding #1: verbless 'A form of asbestos.'
    #    fragments hung forever)
    root = top(root)
    for idx in range(len(rows)):
        t = top(idx)
        if t != root:
            parent[t] = root

    kids: dict[int, list[int]] = {}
    for c, par in parent.items():
        kids.setdefault(par, []).append(c)

    def build(i):
        return (i, [build(c) for c in sorted(kids.get(i, ()))])

    return build(root)


def dependency_heads(sentence: str) -> list[int]:
    """One sentence → per-token head indices (see dependency_rows)."""
    return dependency_rows(sentence)[1]


def dependency_rows(sentence: str) -> tuple[list[str], list[int]]:
    """One sentence → (tokens, per-token head indices), the reference's lexeme
    ``.head`` attribute (``get_dependency_tree``, core/sentence.py:439;
    head conventions asserted token-by-token in test/exec_test.py:112-121
    and :216-236).  The root token heads to itself, every other token to
    exactly one head:

      - NP-internal tokens → the phrase head (entity/attribute head = last
        token; date head = first, 'NP(#Nov. 29)');
      - a reduplicated degree run heads to its first token, which heads
        to the noun ('more → More → corners', exec_test.py:216-217);
      - subject heads → the verb group's FIRST token ('corners → are'),
        verb-group internals → its first token ('becoming → are');
      - complement heads → the verb group's LAST token ('free →
        becoming', 'chairman → is'); an oblique's noun → its preposition
        → the verb-group tail ('by → reported');
      - noun-PP chains: prep → anchor head, hop noun → prep
        ('of → chairman', 'N.V. → of');
      - possessives: owner → owned head; appositive aliases → referent
        head ('group → N.V.', exec_test.py:122).
    """
    p = parse_sentence(sentence)
    if p is None:
        return [], []
    toks, tags, n = p.toks, p.tags, p.n
    heads = [-1] * n
    vps = sorted((s, e) for (t, s, e, _a) in p.constituents if t == "VP")

    def vp_span(ev):
        for (s, e) in vps:
            if s <= ev.verb_idx <= e:
                return (s, e)
        return (ev.verb_idx, ev.verb_idx)

    def mhead(m):
        if m.kind == "date":
            return next((i for i in range(m.start, m.end + 1)
                         if tags[i] == DATE), m.start)
        return m.end

    def prep_before(m, lo):
        for j in range(m.start - 1, max(lo - 1, -1), -1):
            if tags[j] in (IN, TO):
                return j
            if tags[j] not in (DT, ADJ, POSSPRON, NUM, ADV):
                break
        return None

    # 1. phrase internals
    for m in p.mentions:
        h = mhead(m)
        for i in range(m.start, min(m.end, n - 1) + 1):
            if i != h and heads[i] == -1:
                heads[i] = h
    # 2. degree-run fine structure ('More and more corners')
    for i in range(n - 3):
        w = toks[i].lower()
        if (w in ("more", "less", "fewer") and tags[i] == ADJ
                and toks[i + 1].lower() == "and"
                and toks[i + 2].lower() == w
                and tags[i + 3] in (NN, NNP)):
            heads[i + 1] = heads[i + 2] = i
    # 3. verb-group internals → first token of the span
    for (s, e) in vps:
        for i in range(s + 1, min(e, n - 1) + 1):
            if heads[i] == -1:
                heads[i] = s
    # 4. events: subjects → VG start; complements → VG end.  A RELATIVE
    #    clause's verb never claims its subject (the noun belongs to its
    #    matrix role; the relative verb attaches to the noun in step 6):
    #    relatives are recognized by the relativizer next to the verb
    #    group or right after the subject head
    def _rel_kind(ev):
        """'subj' for 'who REVIEWED …' (the noun is shared with the
        matrix — the relative verb must not claim it), 'obj' for 'the
        patch that ALICE reviewed' (the embedded subject claims
        normally; the preceding gap noun belongs to the matrix), None
        otherwise.  A REL after a SHARED subject must not flag the
        matrix verb."""
        s, _e = vp_span(ev)
        if s > 0 and tags[s - 1] == REL:
            return "subj"
        sub = next((m for m in ev.subjects if isinstance(m, Mention)),
                   None)
        if (sub is not None and sub.start > 0
                and tags[sub.start - 1] == REL and sub.end < s):
            return "obj"
        return None

    for ev in p.events:
        s, e = vp_span(ev)
        rk = _rel_kind(ev)
        if rk != "subj":
            for m in ev.subjects:
                if isinstance(m, Mention) and heads[mhead(m)] == -1:
                    heads[mhead(m)] = s
        for o in ev.objects:
            if isinstance(o, Event):
                cs, _ce = vp_span(o)
                if heads[cs] == -1:
                    heads[cs] = e
                continue
            h = mhead(o)
            if heads[h] != -1:
                continue
            if rk is not None and h < s:
                continue   # relative gap noun — its head is its matrix role
            _role, prep = ev.role_of(o)
            pj = prep_before(o, e + 1) if prep else None
            if pj is not None:
                heads[h] = pj
                if heads[pj] == -1:
                    heads[pj] = e
            else:
                heads[h] = e
    # 5. noun-PP chains and possessives/aliases
    for head_m, _prep, dep in p.nmod:
        ha, hd = mhead(head_m), mhead(dep)
        pj = prep_before(dep, head_m.end + 1)
        if pj is not None:
            if heads[pj] == -1:
                heads[pj] = ha
            if heads[hd] == -1:
                heads[hd] = pj
        elif heads[hd] == -1:
            heads[hd] = ha
    for owner, owned in p.poss:
        if heads[mhead(owner)] == -1:
            heads[mhead(owner)] = mhead(owned)
        if owner.end + 1 < n and tags[owner.end + 1] == POS \
                and heads[owner.end + 1] == -1:
            heads[owner.end + 1] = mhead(owner)
    for name, alias in p.aka:
        if heads[mhead(alias)] == -1:
            heads[mhead(alias)] = mhead(name)
    # 6. root: the matrix clause's verb-group start (reference root
    #    convention head == index); other unembedded clause verbs chain
    #    to their pre-verbal subject head, everything left → root
    embedded = {id(o) for ev in p.events for o in ev.objects
                if isinstance(o, Event)}
    matrix = next((ev for ev in p.events
                   if id(ev) not in embedded and ev.subjects
                   and _rel_kind(ev) is None), None)
    if matrix is None and p.events:
        matrix = p.events[0]
    if matrix is not None:
        root = vp_span(matrix)[0]
    elif p.mentions:
        root = mhead(p.mentions[0])
    else:
        root = 0
    heads[root] = root
    for ev in p.events:
        s, _e = vp_span(ev)
        if heads[s] != -1:
            continue
        rk = _rel_kind(ev)
        if rk is not None:
            # relative verb attaches to the noun it modifies: the gap
            # noun for object relatives, the shared subject for subject
            # relatives; the noun's own head is its matrix role (review:
            # the old pre-verbal-subject chain made a subject↔verb
            # 2-cycle on every coordinated clause)
            gap = next((mhead(o) for o in ev.objects
                        if isinstance(o, Mention) and mhead(o) < s), None)
            if rk == "obj" and gap is not None:
                heads[s] = gap
            else:
                sub = next((m for m in ev.subjects
                            if isinstance(m, Mention) and m.start < s),
                           None)
                heads[s] = mhead(sub) if sub is not None else root
        else:
            heads[s] = root
    for i in range(n):
        if heads[i] == -1:
            heads[i] = root
    # safety: break any accidental cycle by re-rooting its entry point
    for i in range(n):
        seen = set()
        j = i
        while j != root and j not in seen:
            seen.add(j)
            j = heads[j]
        if j != root:
            heads[j] = root
    return toks, heads


def extract_sentence(sentence: str):
    """One sentence → (mentions, triples)."""
    p = parse_sentence(sentence)
    if p is None:
        return [], []
    triples: list[Triple] = []
    for ev in p.events:
        subjects = ev.subjects or [None]
        objects = ev.objects or [None]
        for s in subjects:
            for o in objects:
                if s is None and o is None:
                    continue
                if isinstance(o, Event):
                    obj_stem, obj_ref = o.lemma, o.ref
                elif o is not None:
                    obj_stem, obj_ref = o.stem, o.ref
                else:
                    obj_stem, obj_ref = "", ""
                role, prep = ev.role_of(o) if o is not None else ("", "")
                triples.append(Triple(
                    subj=s.stem if s else "",
                    pred=ev.lemma,
                    obj=obj_stem,
                    subj_ref=s.ref if s else "",
                    event_ref=ev.ref,
                    obj_ref=obj_ref,
                    polarity=ev.polarity,
                    modal=ev.modal,
                    role=role,
                    prep=prep,
                ))
    for owner, owned in p.poss:
        triples.append(Triple(owner.stem, "_POSS", owned.stem,
                              owner.ref, "", owned.ref, "pos"))
    for head, prep, dep in p.nmod:
        # noun-attached PP fact: pred is the preposition itself
        # (reference from(X1,X2)/of(X2,X3) conditions)
        triples.append(Triple(head.stem, prep, dep.stem,
                              head.ref, "", dep.ref, "pos", role="NMOD"))
    for name, alias in p.aka:
        triples.append(Triple(name.stem, "_AKA", alias.stem,
                              name.ref, "", alias.ref, "pos"))
    return p.mentions, triples


def extract_turn(text: str):
    """One turn (possibly multiple sentences) →
    (list[(sent_idx, Mention)], list[(sent_idx, Triple)])."""
    all_m, all_t = [], []
    for si, sent in enumerate(split_sentences(text or "")):
        ms, ts = extract_sentence(sent)
        all_m.extend((si, m) for m in ms)
        all_t.extend((si, t) for t in ts)
    return all_m, all_t
