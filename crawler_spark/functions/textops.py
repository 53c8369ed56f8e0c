"""Text kernels with reference parity (reference ``src/lib/text.ts``).

Pure-Python kernels shared by the Spark pandas UDFs AND the golden-test
oracle — byte-identical behavior between the serial oracle and the
distributed engine by construction.

Parity notes (each cites the reference):

- ``clean_text`` (``text.ts:20-22``): apply the ``\\s+``→' ' collapse
  FIRST, then the newline regex (a no-op since ``\\s+`` already ate the
  newlines), then trim. Order replicated anyway.
- ``remove_punctuation`` (``text.ts:9, 89-91``): exactly the class
  ``!"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~``.
- ``tokenize`` (``text.ts:102-107``): ``natural.WordTokenizer`` splits on
  runs of non-``[A-Za-z0-9_]``, drops empties; tokens lowercased, then
  stopwords removed (vendored list — ``lexicons.STOPWORDS``).
- ``porter_stem``: the classic Porter (1980) algorithm, used by the
  sentiment analyzer exactly as ``natural``'s ``PorterStemmer`` is
  (``text.ts:220``).
- ``sentiment_score`` (``text.ts:219-227``): Σ lexicon[stem(token)] /
  len(tokens) — ALL tokens count in the denominator, unknown tokens
  contribute 0.
- ``trigrams`` (``text.ts:266-274``): ``NGrams.trigrams(words, '', '')``
  pads with one leading and one trailing '' and emits every consecutive
  window of 3, then empty strings are filtered per-gram and joined with a
  space — so a 1-token text yields ['w'] padded windows → ['w', 'w'] after
  join?  No: windows of ['','w',''] are ('', 'w'), ('w', '') → after
  filter+join both become 'w' — duplicates preserved. Replicated exactly.
"""

from __future__ import annotations

import re

from crawler_spark.functions.lexicons import AFINN, STOPWORDS

_SPACES = re.compile(r"\s+")
_NEWLINES = re.compile(r"(\r\n|\n|\r)", re.M)
# THE ASCII punctuation class (reference text.ts:9) — public so the
# relational twins (text_tier.sentiment_portable) and their SQL oracles
# reuse the identical pattern instead of drifting copies; the class uses
# only syntax shared by Python re, Java regex and RE2
PUNCT_CLASS = r"[!\"#$%&'()*+,\-./:;<=>?@\[\]^_`{|}~]"
_PUNCT = re.compile(PUNCT_CLASS)
_WORD_SPLIT = re.compile(r"[^A-Za-z0-9_]+")


def clean_text(text: str) -> str:
    """Collapse whitespace and trim (reference ``text.ts:20-22``)."""
    return _NEWLINES.sub(" ", _SPACES.sub(" ", text)).strip()


def remove_punctuation(text: str | None) -> str:
    """Strip ASCII punctuation (reference ``text.ts:89-91``)."""
    return _PUNCT.sub("", text or "")


def tokenize(text: str | None) -> list[str]:
    """Tokenize + lowercase + stopword-remove (reference ``text.ts:102-107``)."""
    no_punct = remove_punctuation(text)
    tokens = [t.lower() for t in _WORD_SPLIT.split(no_punct) if t]
    return [t for t in tokens if t not in STOPWORDS]


# --------------------------------------------------------------------------
# Porter stemmer (Porter, 1980 — public algorithm; same one behind
# ``natural.PorterStemmer``). Self-contained so oracle == engine.
# --------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Classic Porter stemmer; lowercase input expected."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


# Stemmed AFINN: natural's SentimentAnalyzer stems both the vocabulary and
# the incoming tokens when constructed with a stemmer (text.ts:220).
_AFINN_STEMMED: dict[str, int] = {}
for _w, _s in AFINN.items():
    _AFINN_STEMMED.setdefault(porter_stem(_w), _s)


def sentiment_score(tokens: list[str]) -> float:
    """AFINN mean over ALL tokens (reference ``text.ts:219-227``)."""
    if not tokens:
        return 0.0
    total = sum(_AFINN_STEMMED.get(porter_stem(t), 0) for t in tokens)
    return total / len(tokens)


def trigrams(words: list[str]) -> list[str]:
    """``NGrams.trigrams(words, '', '')`` parity (reference ``text.ts:269-271``).

    ``natural``'s ngrams pads n-1 (= 2) start symbols and 2 end symbols,
    takes every consecutive window of 3, then the reference filters empty
    components per-window and joins with ' ' (``text.ts:270``). A 1-word
    list therefore yields ``[w, w, w]``; a 2-word list yields
    ``[w1, 'w1 w2', 'w1 w2', w2]`` — duplicates preserved (they feed the
    frequency counts).
    """
    if not words:
        return []
    padded = ["", ""] + list(words) + ["", ""]
    out: list[str] = []
    for i in range(len(padded) - 2):
        gram = [t for t in padded[i : i + 3] if t]
        if gram:
            out.append(" ".join(gram))
    return out


def term_frequencies(token_lists: list[list[str]]) -> dict[str, float]:
    """Max-normalized flat-token TF (reference ``text.ts:237-258``)."""
    freqs: dict[str, float] = {}
    for tokens in token_lists:
        for tok in tokens:
            freqs[tok] = freqs.get(tok, 0) + 1
    if not freqs:
        return {}
    mx = max(freqs.values())
    return {k: v / mx for k, v in freqs.items()}


def ngram_frequencies(token_lists: list[list[str]]) -> dict[str, float]:
    """Max-normalized trigram TF (reference ``text.ts:266-292``)."""
    grams: list[str] = []
    for tokens in token_lists:
        grams.extend(trigrams(tokens))
    freqs: dict[str, float] = {}
    for g in grams:
        freqs[g] = freqs.get(g, 0) + 1
    if not freqs:
        return {}
    mx = max(freqs.values())
    return {k: v / mx for k, v in freqs.items()}


def weighted_frequencies(texts: list[str]) -> dict[str, float]:
    """Corpus token → max-normalized frequency (reference ``text.ts:116-138``)."""
    freqs: dict[str, float] = {}
    for text in texts:
        for tok in tokenize(text):
            freqs[tok] = freqs.get(tok, 0) + 1
    if not freqs:
        return {}
    mx = max(freqs.values())
    return {k: v / mx for k, v in freqs.items()}


def add_weights(texts: list[str]) -> list[float]:
    """Per-block relevance weight (reference ``text.ts:149-165``)."""
    freqs = weighted_frequencies(texts)
    out = []
    for text in texts:
        tokens = tokenize(text)
        s = sum(freqs[t] for t in tokens)
        out.append(s / len(tokens) if tokens else 0.0)
    return out


SUMMARY_SENTINEL = "\U0001F937\u200D\u2640\uFE0F"  # the shrug emoji (text.ts:187)


def calc_summary(texts: list[str]) -> str:
    """Page summary (reference ``text.ts:185-208``).

    - no blocks → sentinel; one block → that block (or sentinel if falsy);
    - else: weight blocks, stable-sort descending (JS ``Array.sort`` is
      stable), keep > mean-weight, top 2 joined with newline; empty
      fallback → first block or sentinel.
    """
    if len(texts) == 0:
        return SUMMARY_SENTINEL
    if len(texts) == 1:
        return texts[0] or SUMMARY_SENTINEL
    weights = add_weights(texts)
    threshold = sum(weights) / len(weights)
    order = sorted(range(len(texts)), key=lambda i: -weights[i])  # stable
    candidates = [texts[i].strip() for i in order if weights[i] > threshold]
    summary = "\n".join(candidates[:2])
    return summary if summary else (texts[0] or SUMMARY_SENTINEL)


def extract_tags(terms: dict[str, float], limit: int = 3) -> list[str]:
    """Top terms above 2× mean score (reference ``text.ts:300-314``).

    Stable sort descending by score (JS ``Array.sort`` is stable), dedupe
    preserving first occurrence, take ``limit``.
    """
    pairs = list(terms.items())
    if not pairs:
        return []
    avg2 = sum(v for _, v in pairs) / len(pairs) * 2
    candidates = [k for k, v in sorted(
        [p for p in pairs if p[1] > avg2],
        key=lambda p: -p[1],
    )]
    # (the reference dedupes its candidate array here, text.ts:310 —
    # our candidates are keys of one dict, unique by construction)
    return candidates[:limit]
