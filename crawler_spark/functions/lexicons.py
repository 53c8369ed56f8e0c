"""Vendored lexicons.

The reference depends on two npm packages whose word lists drive its text
analytics:

- ``stopword`` (English list) used by ``removeStopwords``
  (reference ``src/lib/text.ts:4,106``);
- the AFINN valence lexicon used by ``natural``'s ``SentimentAnalyzer``
  (reference ``src/lib/text.ts:220``).

Both lists are public. We vendor compact, deterministic versions here: the
engine and the pure-Python golden oracle share these exact lists, so
distributed-vs-serial parity is exact; fixture corpora are generated from
vocabulary covered by these lists so goldens exercise every branch.

This sandbox has no network access, so the FULL public AFINN-165 file
(~3,382 entries, what ``natural``'s SentimentAnalyzer ships) cannot be
vendored verbatim. The next-best public source IS available offline: the
Apache Spark distribution ships ``data/streaming/AFINN-111.txt`` (2,477
entries, the published predecessor of AFINN-165 — every valence a true
published value). We vendor that file verbatim next to this module and
load it as the base lexicon, overlaying a small hand-kept supplement of
AFINN-165-era words the fixtures rely on (244/245 of the supplement's
overlap with AFINN-111 agrees exactly; the published file wins on the one
conflict). For full parity with ``natural``, drop the published
``AFINN-en-165.txt`` next to this module and :func:`load_afinn` replaces
everything — every consumer (sentiment kernel, stemmed map, goldens,
fixture vocab, the DuckDB oracle) keys off this one dict, so the swap is
a single file drop.
"""

from __future__ import annotations

import os


def load_afinn(path: str) -> dict[str, int]:
    """Parse the standard AFINN TSV format (``word<TAB>score``).

    Drop the published file as ``AFINN-en-165.txt`` NEXT TO THIS MODULE
    to activate it: the file ships inside the package, so driver and
    every executor resolve the identical lexicon (an env-var/absolute
    path would be evaluated independently per process and could split
    the lexicon between driver goldens and executor UDFs). Multi-word
    AFINN entries (e.g. "can't stand") are kept verbatim — the tokenizer
    never produces them, matching ``natural``'s unigram behavior."""
    out: dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            word, _, score = line.rstrip("\n").rpartition("\t")
            if word and score.lstrip("-").isdigit():
                out[word] = int(score)
    return out


_AFINN_FILE = os.path.join(os.path.dirname(__file__), "AFINN-en-165.txt")

# English stopwords (vendored, ~the `stopword` npm package's `eng` list).
STOPWORDS: frozenset[str] = frozenset(
    """a about above after again against all am an and any are aren't as at
    be because been before being below between both but by can't cannot
    could couldn't did didn't do does doesn't doing don't down during each
    few for from further had hadn't has hasn't have haven't having he he'd
    he'll he's her here here's hers herself him himself his how how's i i'd
    i'll i'm i've if in into is isn't it it's its itself let's me more most
    mustn't my myself no nor not of off on once only or other ought our
    ours ourselves out over own same shan't she she'd she'll she's should
    shouldn't so some such than that that's the their theirs them
    themselves then there there's these they they'd they'll they're they've
    this those through to too under until up very was wasn't we we'd we'll
    we're we've were weren't what what's when when's where where's which
    while who who's whom why why's with won't would wouldn't you you'd
    you'll you're you've your yours yourself yourselves""".split()
)

# AFINN valence supplement (hand-kept AFINN-165-era words the fixture
# vocabulary uses; word -> integer score in [-5, 5]). Overridden below by
# the vendored published AFINN-111 file wherever the two overlap.
AFINN: dict[str, int] = {
    "abandon": -2, "abuse": -3, "accept": 1, "accident": -2, "admire": 3,
    "adore": 3, "advantage": 2, "adventure": 2, "afraid": -2, "aggressive": -2,
    "agree": 1, "alarm": -2, "alive": 1, "amazing": 4, "anger": -3,
    "angry": -3, "annoy": -2, "anxious": -2, "appreciate": 2, "approve": 2,
    "argue": -2, "arrest": -2, "attack": -1, "attract": 1, "awful": -3,
    "awesome": 4, "bad": -3, "ban": -2, "beautiful": 3, "benefit": 2,
    "best": 3, "betray": -3, "better": 2, "bless": 2, "block": -1,
    "bomb": -1, "bore": -2, "boring": -3, "brave": 2, "breathtaking": 5,
    "bright": 1, "brilliant": 4, "broken": -1, "calm": 2, "cancel": -1,
    "care": 2, "celebrate": 3, "chaos": -2, "charm": 3, "cheat": -3,
    "cheer": 2, "clean": 2, "clever": 2, "collapse": -2, "comfort": 2,
    "complain": -2, "confident": 2, "confuse": -2, "congratulate": 2,
    "cool": 1, "crash": -2, "crazy": -2, "crisis": -3, "cruel": -3,
    "cry": -1, "curse": -1, "cut": -1, "damage": -3, "danger": -2,
    "dark": -1, "dead": -3, "defeat": -2, "delay": -1, "delight": 3,
    "deny": -2, "depress": -2, "desperate": -3, "destroy": -3, "die": -3,
    "dirty": -2, "disappoint": -2, "disaster": -2, "dislike": -2,
    "doom": -2, "doubt": -1, "dream": 1, "drop": -1, "dull": -2,
    "eager": 2, "easy": 1, "elegant": 2, "embarrass": -2, "empower": 2,
    "encourage": 2, "enemy": -2, "energetic": 2, "engage": 1, "enjoy": 2,
    "error": -2, "evil": -3, "excellent": 3, "excite": 3, "fail": -2,
    "failure": -2, "fake": -3, "famous": 2, "fantastic": 4, "fear": -2,
    "fight": -1, "fine": 2, "fire": -2, "flawless": 5, "fool": -2,
    "forbid": -2, "forgive": 1, "fraud": -4, "free": 1, "fresh": 1,
    "friendly": 2, "frustrate": -2, "fun": 4, "funny": 4, "generous": 2,
    "gentle": 3, "gift": 2, "glad": 3, "gloom": -2, "glorious": 2,
    "good": 3, "grace": 1, "grand": 3, "grateful": 3, "great": 3,
    "greed": -3, "grief": -2, "grim": -2, "gross": -2, "grow": 1,
    "guilt": -3, "happy": 3, "harm": -2, "hate": -3, "heal": 2,
    "healthy": 2, "heaven": 2, "hell": -4, "help": 2, "hero": 2,
    "honest": 2, "hope": 2, "horrible": -3, "hug": 2, "huge": 1,
    "hurt": -2, "ignore": -1, "ill": -2, "improve": 2, "innovate": 1,
    "inspire": 2, "insult": -2, "interest": 1, "jealous": -2, "joke": 2,
    "joy": 3, "justice": 2, "kill": -3, "kind": 2, "laugh": 1,
    "lazy": -1, "lie": -2, "like": 2, "limit": -1, "lonely": -2,
    "lose": -3, "loss": -3, "love": 3, "loyal": 3, "luck": 3,
    "mad": -3, "magic": 1, "marvel": 3, "mess": -2, "mistake": -2,
    "motivate": 1, "murder": -2, "nice": 3, "noble": 2, "pain": -2,
    "panic": -3, "peace": 2, "perfect": 3, "pleasant": 3, "please": 1,
    "poor": -2, "popular": 3, "positive": 2, "praise": 3, "pretty": 1,
    "problem": -2, "progress": 2, "protect": 1, "proud": 2, "punish": -2,
    "quality": 2, "quit": -1, "rage": -2, "reject": -1, "relax": 2,
    "relief": 1, "rescue": 2, "rich": 2, "risk": -2, "robust": 2,
    "ruin": -2, "sad": -2, "safe": 1, "scare": -2, "secure": 2,
    "shame": -2, "share": 1, "shine": 2, "shock": -2, "sick": -2,
    "simple": 1, "sincere": 2, "slow": -2, "smart": 1, "smile": 2,
    "solid": 2, "solution": 1, "sorrow": -2, "sorry": -1, "splendid": 3,
    "steal": -2, "strange": -1, "stress": -1, "strong": 2, "stupid": -2,
    "succeed": 3, "success": 2, "suffer": -2, "super": 3, "superb": 5,
    "support": 2, "sweet": 2, "terrible": -3, "terror": -3, "thank": 2,
    "threat": -2, "thrill": 3, "tired": -2, "tough": -1, "tragic": -2,
    "triumph": 4, "trouble": -2, "trust": 1, "ugly": -3, "unhappy": -2,
    "upset": -2, "useful": 2, "useless": -2, "victory": 3, "violent": -3,
    "vital": 1, "warm": 1, "waste": -1, "weak": -2, "wealth": 3,
    "welcome": 2, "win": 4, "wise": 2, "wonderful": 4, "worry": -3,
    "worst": -3, "worth": 2, "wrong": -2, "young": 1,
}

# Base lexicon: AFINN-111 vendored verbatim from the Apache Spark
# distribution (data/streaming/AFINN-111.txt; originally published by
# F. Å. Nielsen, DTU, 2011). Published valences win over the supplement.
_AFINN111_FILE = os.path.join(os.path.dirname(__file__), "AFINN-111.txt")
if os.path.exists(_AFINN111_FILE):
    AFINN.update(load_afinn(_AFINN111_FILE))

if os.path.exists(_AFINN_FILE):
    AFINN.clear()
    AFINN.update(load_afinn(_AFINN_FILE))


def load_wordlist(path: str) -> frozenset[str]:
    """One lowercase entry per line, ``#`` comments and blanks ignored —
    the format of the public blocklists pipelines actually use (the
    C4 paper filters on the "List of Dirty, Naughty, Obscene..." list,
    published in exactly this shape; UT1 category lists likewise; both
    contain multiword entries, which ``blocklist_flags`` matches as
    consecutive-token phrases). Same packaging contract as
    :func:`load_afinn`: drop the file NEXT TO THIS MODULE so driver
    and executors resolve identical data."""
    out = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            w = line.strip().lower()
            if w and not w.startswith("#"):
                out.add(w)
    return frozenset(out)


_BLOCKLIST_FILE = os.path.join(os.path.dirname(__file__), "blocklist-en.txt")

# Keyword blocklist seed (spam-signal terms only — the real public
# lists are not vendorable here; drop one in as ``blocklist-en.txt``
# to replace this, loader above). C4 (Raffel et al. 2020 §2.2) drops
# any page containing any listed word. Entries with spaces are PHRASES
# matched as consecutive whole tokens (``operators.quality.
# blocklist_flags``); single-word entries must be unambiguous on their
# own — generic words like "weight", "loss", "cure", "prince" would
# make the default max_hits=0 filter drop ordinary prose, so multiword
# spam signals stay phrases instead of being exploded into unigrams.
BLOCKLIST: frozenset[str] = frozenset(
    [
        "casino", "jackpot", "viagra", "cialis", "xxx", "porn",
        "escort", "payday", "counterfeit", "warez", "keygen",
        "weight loss pills", "miracle cure", "forex signals",
        "bitcoin doubler", "prince inheritance", "penis enlargement",
        "lottery winnings", "replica watches",
    ]
)
if os.path.exists(_BLOCKLIST_FILE):
    BLOCKLIST = load_wordlist(_BLOCKLIST_FILE)
