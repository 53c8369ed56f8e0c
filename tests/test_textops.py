"""Parity tests for the text kernels (reference src/lib/text.ts)."""

from crawler_spark.functions.textops import (
    clean_text,
    extract_tags,
    ngram_frequencies,
    porter_stem,
    remove_punctuation,
    sentiment_score,
    term_frequencies,
    tokenize,
    trigrams,
)


def test_clean_text_collapses_whitespace():
    assert clean_text("a  b\t c\r\nd") == "a b c d"
    assert clean_text("  leading and trailing  ") == "leading and trailing"
    assert clean_text("\n\n\n") == ""


def test_remove_punctuation():
    assert remove_punctuation("a!b\"c#d'e.f") == "abcdef"
    assert remove_punctuation(None) == ""


def test_tokenize_lowercase_stopwords():
    # "the"/"is"/"a" are stopwords; punctuation removed first
    assert tokenize("The Cat, is A Fast-Runner!") == ["cat", "fastrunner"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_tokenize_splits_non_word():
    # '_' is in the reference punctuation class (text.ts:9) and is stripped
    # by removePunctuation BEFORE tokenization → engine_core → enginecore
    assert tokenize("spark4 engine_core data") == ["spark4", "enginecore", "data"]


def test_porter_stem_classic_cases():
    # canonical examples from Porter (1980)
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("cats") == "cat"
    assert porter_stem("agreed") == "agre"
    assert porter_stem("plastered") == "plaster"
    assert porter_stem("motoring") == "motor"
    assert porter_stem("happy") == "happi"
    assert porter_stem("relational") == "relat"
    assert porter_stem("conditional") == "condit"
    assert porter_stem("triplicate") == "triplic"
    assert porter_stem("formative") == "form"
    assert porter_stem("adjustable") == "adjust"
    assert porter_stem("probate") == "probat"
    assert porter_stem("controll") == "control"


def test_sentiment_mean_over_all_tokens():
    # love=+3; unknown tokens count in denominator (text.ts:219-227)
    assert sentiment_score(["love"]) == 3.0
    assert sentiment_score(["love", "zzzunknown"]) == 1.5
    assert sentiment_score([]) == 0.0
    # stemming: "loved" stems to "love"
    assert sentiment_score(["loved"]) == 3.0


def test_trigrams_padding_parity():
    # natural NGrams.trigrams(words,'','') pads 2 each side; reference joins
    # non-empty components (text.ts:269-271)
    assert trigrams(["w"]) == ["w", "w", "w"]
    assert trigrams(["a", "b"]) == ["a", "a b", "a b", "b"]
    assert trigrams(["a", "b", "c"]) == ["a", "a b", "a b c", "b c", "c"]
    assert trigrams([]) == []


def test_term_frequencies_max_normalized():
    tf = term_frequencies([["x", "x", "y"], ["x", "z"]])
    assert tf == {"x": 1.0, "y": 1 / 3, "z": 1 / 3}
    assert term_frequencies([]) == {}


def test_ngram_frequencies():
    nf = ngram_frequencies([["a", "b"]])
    # trigrams: a, 'a b', 'a b', b → max freq 2
    assert nf == {"a": 0.5, "a b": 1.0, "b": 0.5}


def test_extract_tags_threshold_and_topk():
    # avg*2 threshold (text.ts:300-304); stable desc sort; top-3
    terms = {"big": 1.0, "mid": 0.9, "low1": 0.01, "low2": 0.01, "low3": 0.01}
    # avg = 0.386, threshold 0.772 → big, mid qualify
    assert extract_tags(terms) == ["big", "mid"]
    assert extract_tags({}) == []
    # limit respected
    terms2 = {f"t{i}": 1.0 for i in range(5)} | {f"z{i}": 0.0 for i in range(20)}
    assert len(extract_tags(terms2)) == 3


def test_load_afinn_tsv(tmp_path):
    from crawler_spark.functions.lexicons import load_afinn

    p = tmp_path / "afinn.txt"
    p.write_text("good\t3\nbad\t-3\ncan't stand\t-3\nbroken-line\nx\t2\n")
    got = load_afinn(str(p))
    assert got == {"good": 3, "bad": -3, "can't stand": -3, "x": 2}
