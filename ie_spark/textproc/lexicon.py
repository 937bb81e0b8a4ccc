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
    "via since until around off above below beneath as than amid alongside".split()
)

CONJUNCTIONS = frozenset("and or but nor".split())

# Closed adverb list (degree/temporal particles that would otherwise fall
# through to the noun default and corrupt NP parsing: "very tempting",
# "still a puppy").  Reference: these carry empty DRS / event-modifier
# conditions only (semantics/lexeme.py:792-805).
ADVERBS = frozenset(
    "very really quite too so just now then here soon already often always "
    "sometimes usually rarely almost nearly also maybe perhaps instead "
    "rather generally together twice once again ago yet even still "
    "up down out away back forward".split()
)

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
SUBORDINATORS = frozenset(
    "because although unless whereas if though "
    "whenever wherever".split())

# be/have/do forms + modals; (form → (lemma, finite)).
AUXILIARIES = {
    "am": ("be", True), "is": ("be", True), "are": ("be", True),
    "was": ("be", True), "were": ("be", True), "be": ("be", False),
    "been": ("be", False), "being": ("be", False),
    "has": ("have", True), "have": ("have", True), "had": ("have", True),
    "having": ("have", False),
    "do": ("do", True), "does": ("do", True), "did": ("do", True),
    # 'done' is never an auxiliary — it is the past participle main
    # verb ('was done by X' is a passive), and listing it here blocked
    # irregular-participle passive detection
    "doing": ("do", False),
}

MODALS = frozenset(
    "can could may might must shall should will would ought".split()
)

NEGATIONS = frozenset(["not", "n't", "never", "cannot"])

MONTHS = frozenset(
    # full names + common abbreviations ('may' stays a modal; the tagger
    # strips a trailing '.' before this lookup: 'Jan.' → 'jan')
    "january february march april may june july august september october "
    "november december jan feb mar apr jun jul aug sep sept oct nov dec".split()
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
cover cost
manager analyst scientist lawyer nurse writer artist agent user customer
report patch request pipeline system model dataset query table database
server cluster job task ticket bug issue feature branch commit release
deployment service network machine computer laptop phone message email
document file folder plan design schedule meeting review budget contract
proposal paper book article story letter note summary answer question
result outcome decision problem solution idea goal project product company
office city country house school hospital market store price value
money time day week month year morning evening night code script function
class module package library tool test error warning log metric dashboard
graph node edge entity mention triple sentence word text corpus language
parser tax car truck train plane road bridge river mountain dog cat bird
tree flower food water coffee tea bread fruit key lock door window wall
room floor roof garden park street event change update upgrade version
backup index schema partition shard queue stream batch record row column
field cell vector embedding cache memory disk thread process
factory material umpire skull racket beagle hole puppy movie game sport
dividend stock maturity investment fund rate advertiser discount spending
fixture competition magazine basis decline profit half loss pound vehicle
interest research foundation directory statement conference trouble
president risk outlook economy hand minimum world existence tennis player
crowd call carpet carpeting expense inventory yield sign portfolio
apple pie corner bus wheel weekly newspaper building department step
inch mile meter gallon ton share percent percentage group form kind sort
increase decrease drop gain growth fall rise start end beginning middle
side top bottom front rear level stage phase point line part
piece section unit item element member leader director officer executive
employee worker staff board committee council government state nation
region area zone district court judge police army war peace law rule
policy standard practice method way manner approach strategy effort
attempt chance opportunity option choice term condition situation case
instance example sample evidence proof fact detail aspect factor reason
cause effect impact influence benefit advantage threat danger
safety security health care treatment medicine drug disease virus
blood heart brain mind body face eye ear nose mouth arm leg foot
head hair skin bone muscle voice sound noise music song picture image
photo video film show play act scene audience fan match
race score win club league season weather rain snow wind
storm cloud sun moon star sky sea ocean lake beach island forest
farm crop seed plant leaf root stone rock sand soil ground earth
fire smoke ash metal iron steel gold silver copper oil gas fuel energy
power electricity light heat cold ice steam air breath
rival pace incentive advertising integration specialist chairman
vice sector
family airline museum jury defendant fraud vegetable shelter
species frog rainforest forecast picnic thunderstorm medication
patient debate neighbor airport keyboard screen browser website
marketing volunteer flour salt essay deposit cartel opposition production
investor researcher
login password account profile setting notification reminder calendar
invoice receipt payment subscription trial demo kitchen bedroom bathroom
restaurant hotel shop mall station bicycle motorcycle boat
engine wing tire brake seat passenger driver pilot captain
crew luggage suitcase wallet purse pocket jacket coat shirt shoe hat
glove scarf umbrella bottle cup glass plate bowl spoon fork knife pan
pot oven stove fridge shelf drawer desk chair couch sofa bed pillow
blanket towel mirror clock lamp candle
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
cover cost eat drink sleep wear drive fly swim sing dance cook clean
test debug fix implement design analyze process extract parse compute
schedule cancel update delete insert query fetch load store save restore
scan filter sort join aggregate partition shuffle broadcast cache commit
push verify validate monitor measure optimize refactor document describe
explain summarize translate answer check complete finish launch ship
protest investigate examine discover
step wheeze chew apply smell post weigh participate lease cheer rate
lengthen shorten widen narrow deepen strengthen weaken welcome underscore
incur exist stab infer perceive distribute announce claim argue admit
note charge crack jump lean crawl climb shout laugh cry smile
march drift float sink boil freeze melt burn pour spill drip leak slide
glide bounce roll spin twist bend stretch squeeze press pump lift drop
toss catch throw chase flee escape hide seek search browse scroll click
type print copy paste attach detach compress encrypt decrypt sign
authorize authenticate register subscribe enroll graduate retire resign
hire fire promote transfer relocate travel visit tour explore wander
settle occupy rescue arrest convict sentence sue appeal testify
witness declare deny confirm refuse accept agree disagree debate
discuss mention state remark reply respond request demand insist promise
threaten warn advise recommend propose plan prepare arrange organize
manage operate maintain repair replace install remove
connect disconnect assemble construct demolish destroy damage
ruin harm hurt injure heal cure treat diagnose inspect observe
notice recognize identify locate track trace pursue avoid
prevent protect defend attack invade conquer defeat surrender retreat
advance proceed progress improve worsen recover collapse crash fail
succeed achieve accomplish attain obtain acquire gain earn deserve owe
lend borrow rent purchase trade exchange invest donate contribute
fund finance budget audit account calculate estimate predict forecast
project anticipate assume presume suppose suspect doubt wonder question
inquire acknowledge apologize thank congratulate celebrate
mourn grieve comfort console encourage discourage inspire motivate
persuade convince influence affect impact concern worry bother annoy
irritate frustrate disappoint satisfy please delight amuse entertain
bore tire exhaust refresh relax rest wake rise descend
enter exit depart arrive return linger dwell reside
focus concentrate emphasize highlight stress underline mark label
categorize classify rank grade evaluate assess judge criticize praise
blame accuse excuse forgive punish reward compensate reimburse refund
vote elect appoint nominate represent govern regulate legislate enforce
comply violate breach honor respect admire envy pity fear dread hope
wish desire crave prefer choose select pick gather collect
accumulate amass hoard allocate assign delegate entrust
incorporate integrate combine split divide separate isolate
exclude omit skip ignore neglect abandon desert quit cease halt pause
resume renew revive restart reboot shutdown upload download stream
publish edit revise draft compose dictate transcribe record
film photograph paint draw sketch carve sculpt weave knit sew stitch
introduce reduce produce induce deduce conclude spur
trust display teach flood delay deliver handle host notify ping
retry sync archive export render lint benchmark forward email submit
resubmit attend remind postpone
throttle order pack unpack wash dry
fold hang sweep mop rinse scrub bake fry
grill roast stir chop slice peel sip swallow
""".split())

COMMON_ADJECTIVES = frozenset("""
good new first last long great little own other old right big high small
large next early young important few public bad same able ready busy free
full special easy hard strong weak clear dark light slow fast quick clean
dirty cheap rich poor safe open late happy sad angry tired wrong nice warm
cold hot cool final initial recent current previous broken stable flaky
green red blue yellow correct accurate efficient scalable robust secure
pending complete incomplete urgent critical minor major
average reliable certain educational annual fierce permanent tempting
heavy quarterly daily monthly yearly hourly nightly likely friendly
elderly costly timely deadly lively silly lonely lovely holy ugly
guilty fresh quiet loud empty solid gentle rough smooth sharp blunt
narrow wide deep shallow thick thin crowded remote rural urban modern
sorry payable upset distinct medical legal financial economic political
social cultural natural physical mental emotional spiritual global local
national international regional foreign domestic private personal
professional technical scientific digital electronic mechanical manual
automatic common rare frequent occasional constant steady gradual sudden
contrary nonexecutive extra
immediate instant brief lengthy extended temporary eternal ancient
contemporary traditional conventional typical unusual strange odd weird
normal abnormal regular irregular standard premium basic advanced simple
complex complicated plain fancy elegant gorgeous beautiful pretty
handsome attractive pleasant unpleasant comfortable awkward convenient
aware conscious familiar similar different identical equal unequal fair
unfair honest dishonest loyal faithful sincere genuine false true real
fake artificial synthetic organic stale rotten ripe raw cooked
sweet sour bitter salty spicy mild severe harsh tender
soft firm liquid hollow dense
steep flat level straight curved round square broad vast tiny
huge enormous massive giant miniature mutual further
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
    "caught": "catch", "stolen": "steal",
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
double triple wipe
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
investigate approve prove charge lease perceive achieve arrange
announce pronounce balance bounce chase embrace erase increase decrease
please tease cease revise advise devise surprise exercise
promise purchase pace face replace retrace devote vote quote dive strive
thrive wave crave behave shave ache bathe breathe soothe smile compile
style cycle recycle settle battle bottle handle assemble tremble struggle
juggle snuggle circle sparkle twinkle wrestle whistle hustle bustle
shuffle ruffle stumble tumble rumble mumble grumble fumble crumble
""".split())


def _restore_e(stem: str, common: frozenset) -> str | None:
    """Heuristic final-'e' restoration after -ed/-ing/-es stripping.

    English stems ending in v/c/u/z (and g after r/l/u, s after a vowel)
    almost always come from an e-final lemma (leased → lease, charged →
    charge, amazed → amaze, argued → argue).  Dictionary hits take
    precedence in the callers; this is the open-vocabulary fallback."""
    if not stem:
        return None
    last = stem[-1]
    if last in "vcuz":
        return stem + "e"
    if last == "g" and len(stem) > 1 and stem[-2] in "rlu":
        return stem + "e"
    if last == "s" and len(stem) > 1 and stem[-2] in "aeiou":
        return stem + "e"
    # latinate -ate verbs (mediated → mediate, related → relate);
    # the real bare '-at' stems are the '-eat/-oat' families (treated →
    # treat, bloated → bloat) plus a tiny closed set (combat, format) —
    # everything else of length ≥5 restores the 'e' (review r4 pass-2
    # finding #1: a vowel-count gate broke relate/truncate/negate/…)
    if (stem.endswith("at") and not stem.endswith(("eat", "oat"))
            and len(stem) >= 5 and stem not in ("combat", "format")):
        return stem + "e"
    return None


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
            if stem in COMMON_VERBS:
                return stem
            if stem + "e" in _E_FINAL_VERBS or stem + "e" in COMMON_VERBS:
                return stem + "e"
            return _restore_e(stem, COMMON_VERBS) or stem
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
        if stem in COMMON_VERBS:
            return stem
        if stem + "e" in _E_FINAL_VERBS or stem + "e" in COMMON_VERBS:
            return stem + "e"
        # doubled final consonant (planned → plan, incurred → incur);
        # never ll/ss (called, passed keep theirs)
        if (len(stem) > 2 and stem[-1] == stem[-2]
                and stem[-1] in _CONSONANTS and stem[-1] not in "ls"):
            return stem[:-1]
        if stem.endswith("e"):
            return stem
        return _restore_e(stem, COMMON_VERBS) or stem
    # -ing
    if form.endswith("ing") and len(form) > 4:
        stem = form[:-3]
        if stem in COMMON_VERBS:
            return stem
        if stem + "e" in _E_FINAL_VERBS or stem + "e" in COMMON_VERBS:
            return stem + "e"
        if (len(stem) > 2 and stem[-1] == stem[-2]
                and stem[-1] in _CONSONANTS and stem[-1] not in "ls"):
            return stem[:-1]
        return _restore_e(stem, COMMON_VERBS) or stem
    return form


_IRREGULAR_NOUNS = {
    "people": "person", "children": "child", "men": "man", "women": "woman",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
    "data": "data", "media": "media", "indices": "index", "schemas": "schema",
    "analyses": "analysis", "queries": "query",
    # -ies plurals whose singular ends -ie, and invariant s-final nouns
    "movies": "movie", "cookies": "cookie", "zombies": "zombie",
    "calories": "calorie", "news": "news", "series": "series",
    "species": "species", "headquarters": "headquarters",
    "electronics": "electronics", "economics": "economics",
    "physics": "physics", "politics": "politics", "mathematics": "mathematics",
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
    if form.endswith(("sses", "xes", "zes", "ches", "shes")) and len(form) > 4:
        return form[:-2]
    # -ses after a vowel is usually an e-final singular (expenses →
    # expense, houses → house); -ses after a consonant is -sis plurals'
    # territory, leave the -s rule to it (courses → course via vowel rule)
    if form.endswith("ses") and len(form) > 4 and form[-4] in "aeiou":
        return form[:-1]
    if form.endswith("s") and not form.endswith(("ss", "us", "is")) and len(form) > 2:
        return form[:-1]
    return form
