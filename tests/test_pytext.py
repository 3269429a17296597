"""Pure-Python text kernels: tokenizer/sentence properties + similarity."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bern_spark.functions.pytext import (
    char_shingles,
    conll_tokens,
    jaro_winkler,
    levenshtein_sim,
    sentence_spans,
    token_jaccard,
    tokenize_with_offsets,
)


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_slice_property(text):
    # every token's span slices back to the token (the ops.py:94 lossless
    # assert, adapted to offset form)
    for tok, s, e in tokenize_with_offsets(text):
        assert text[s:e] == tok


@given(st.text(alphabet="aB .?!x-\"'", max_size=120))
@settings(max_examples=200, deadline=None)
def test_sentence_spans_tile_text(text):
    spans = sentence_spans(text)
    assert spans[0][0] == 0
    assert spans[-1][1] == len(text)
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c  # contiguous, lossless


def test_sentence_split_rules():
    # '.' splits only before ' ' + upper/quote/dash (ops.py:111-117)
    assert len(sentence_spans("Hello there. Next one.")) == 2
    assert len(sentence_spans("approx. value is 3")) == 1
    assert len(sentence_spans("Stop! Go? Now.")) == 3


def test_levenshtein_known():
    assert levenshtein_sim("kitten", "sitting") == 1 - 3 / 7
    assert levenshtein_sim("abc", "abc") == 1.0
    assert levenshtein_sim("", "abc") == 0.0


def test_jaro_winkler_known():
    assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_token_jaccard():
    assert token_jaccard("alpha beta", "beta alpha") == 1.0
    assert token_jaccard("alpha beta", "alpha gamma") == 1 / 3


def test_char_shingles():
    assert char_shingles("ab", k=3) == {"ab"}
    assert "abc" in char_shingles("abcd", k=3)
    # whitespace-collapsed and lowercased
    assert char_shingles("A  B", k=3) == {"a b"}
