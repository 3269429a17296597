"""Property tests (hypothesis) for the round-2 pure kernels: WordPiece,
force-chunking, Bloom filter, hashed embeddings. All off-Spark."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------

_PIECES = ["ab", "cd", "ef", "##ab", "##cd", "##ef", "a", "b", "##a", "##b"]
_VOCAB = frozenset(_PIECES)


@given(st.text(alphabet="abcdef", min_size=1, max_size=24))
@settings(max_examples=200, deadline=None)
def test_wordpiece_reconstructs_or_unk(token):
    from bern_spark.functions.pytext import wordpiece_tokenize

    pieces = wordpiece_tokenize(token, _VOCAB)
    if pieces == ["[UNK]"]:
        return
    # non-UNK output must reconstruct the token exactly: first piece raw,
    # rest '##'-prefixed continuations
    assert pieces[0][:2] != "##"
    assert all(p.startswith("##") for p in pieces[1:])
    assert pieces[0] + "".join(p[2:] for p in pieces[1:]) == token
    assert all(p in _VOCAB for p in pieces)


@given(st.text(alphabet="abcdef ", max_size=60))
@settings(max_examples=100, deadline=None)
def test_wordpiece_tokens_count(text):
    from bern_spark.functions.pytext import wordpiece_tokens

    out = wordpiece_tokens(text, _VOCAB)
    # one or more pieces per whitespace token, never zero for a token
    assert (len(out) == 0) == (len(text.split()) == 0)


# ---------------------------------------------------------------------------
# force-chunking
# ---------------------------------------------------------------------------

_RAW_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z]")
_CONLL_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z\s]")


@given(st.text(alphabet="abc XY.", max_size=400))
@settings(max_examples=150, deadline=None)
def test_sentence_spans_default_tiles(text):
    from bern_spark.functions.pytext import sentence_spans

    spans = sentence_spans(text)
    assert "".join(text[s:e] for s, e in spans) == text


@given(st.integers(min_value=0, max_value=700))
@settings(max_examples=60, deadline=None)
def test_force_chunk_invariants(n_words):
    from bern_spark.functions.pytext import sentence_spans

    text = " ".join(f"w{i}" for i in range(n_words))
    spans = sentence_spans(text, force_chunk=True)
    chunks = [text[s:e] for s, e in spans]
    # spans are ordered, non-overlapping, within bounds (empty text yields
    # the single empty span (0,0), the tiling default)
    assert all(0 <= s <= e <= len(text) for s, e in spans)
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))
    # every chunk except a short tail is exactly 200 raw tokens when the
    # sentence needed chunking at all
    if len(_CONLL_RE.findall(text)) > 100:
        assert all(
            len(_RAW_RE.findall(c)) == 200 for c in chunks[:-1]
        )
    # no chunk is whitespace-only, and the concatenation is a prefix of
    # the text possibly missing only trailing whitespace
    assert all(c.strip() for c in chunks) or text.strip() == ""
    joined = "".join(chunks)
    assert text.startswith(joined)
    assert text[len(joined):].strip() == ""


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(items):
    from bern_spark.functions.bloom import BloomFilter

    bf = BloomFilter.sized_for(len(items), fp_rate=0.01)
    for s in items:
        bf.add(s)
    assert all(s in bf for s in items)


# ---------------------------------------------------------------------------
# hashed embedding
# ---------------------------------------------------------------------------


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_hashed_embedding_unit_or_zero(s):
    import numpy as np

    from bern_spark.operators.scoring import EMB_DIM, _hashed_embedding

    v = np.array(_hashed_embedding(s))
    assert v.shape == (EMB_DIM,)
    n = float(np.linalg.norm(v))
    assert abs(n - 1.0) < 1e-9 or n == 0.0
