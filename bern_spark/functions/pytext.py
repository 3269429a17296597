"""Pure-Python text kernels executed inside Arrow-batched pandas UDFs.

These are this engine's re-implementations of the reference's per-document
sequence operators (SURVEY §2.5): CoNLL tokenization with char offsets
(ops.py:5, ops.py:91-95, ops.py:37-63), sentence splitting (ops.py:98-166),
and the string-similarity scorers used for pairwise mention scoring. They
run only inside ``mapInPandas``/``pandas_udf`` bodies — never as row-at-a-
time Spark UDFs — and are importable directly for unit tests.

Span convention: **exclusive end** (Python-slice style) everywhere. The
reference mixes inclusive (ops.py:55-57, utils.py:295) and exclusive
(normalize.py:206,214) conventions; we fix exclusive-end at this boundary
once (SURVEY §1.2).
"""

from __future__ import annotations

import re

# Same token classes as the reference tokenizer (ops.py:5): maximal
# alphanumeric runs; every other char is its own token; spaces dropped.
_TOKEN_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z\s]")

_SENT_END_ALWAYS = "?!"
_SENT_DOT_FOLLOW = set('ABCDEFGHIJKLMNOPQRSTUVWXYZ-"' + "'")


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """CoNLL-style tokenization with char offsets, exclusive end.

    Matches the reference's token stream (CoNLL_tokenizer ops.py:91-95:
    split on alnum-run boundaries, drop spaces) but assigns offsets in one
    regex pass instead of the running find() cursor of input_form
    (ops.py:37-63) — same result, O(n), and lossless by construction
    (mirror of the assert at ops.py:94).
    """
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def conll_tokens(text: str) -> list[str]:
    return [m.group(0) for m in _TOKEN_RE.finditer(text)]


# Raw-token classes for W1 force-chunking (reference ops.py:5): alnum
# runs OR any single other char INCLUDING whitespace — raw tokens tile
# the string exactly, so chunk boundaries are exact char offsets.
_RAW_TOKEN_RE = re.compile(r"[0-9a-zA-Z]+|[^0-9a-zA-Z]")


def _force_chunk_spans(text: str, s: int, e: int) -> list[tuple[int, int]]:
    """W1 force-chunking of one over-long sentence span (reference
    sentence_split ops.py:119-143): while the remainder exceeds 100 CoNLL
    tokens, cut a chunk of 200 raw tokens; a whitespace-only final
    remainder is dropped (reference: ``if sent.strip() == '': break``),
    so chunked spans may not cover trailing whitespace — same observable
    sentences as the reference."""
    out: list[tuple[int, int]] = []
    while True:
        raws = list(_RAW_TOKEN_RE.finditer(text, s, e))
        if len(raws) <= 200:
            if text[s:e].strip():
                out.append((s, e))
            return out
        cut = raws[199].end()
        out.append((s, cut))
        s = cut
        if len(_TOKEN_RE.findall(text, s, e)) < 100:
            if text[s:e].strip():
                out.append((s, e))
            return out


def sentence_spans(text: str, force_chunk: bool = False) -> list[tuple[int, int]]:
    """Sentence boundaries, exclusive-end spans over ``text``.

    Same split rule as the reference (sentence_split ops.py:98-166): break
    after ``?``/``!`` always; after ``.`` only when followed by a space and
    an uppercase letter / quote / dash; no break within the final 2 chars.

    ``force_chunk=False`` (default): spans always tile the text exactly
    (the extractor's 30-token windowing bounds downstream work instead).
    ``force_chunk=True``: reproduces the reference's W1 rule — any
    sentence longer than 100 CoNLL tokens is split into 200-raw-token
    chunks (ops.py:119-143); a whitespace-only tail is dropped, so spans
    may then not tile trailing whitespace, exactly as the reference's
    string outputs don't.
    """
    spans: list[tuple[int, int]] = []
    piv = 0
    n = len(text)

    def emit(a: int, b: int) -> None:
        if force_chunk and len(_TOKEN_RE.findall(text, a, b)) > 100:
            spans.extend(_force_chunk_spans(text, a, b))
        else:
            spans.append((a, b))

    for idx, ch in enumerate(text):
        if ch in _SENT_END_ALWAYS:
            if idx > n - 3:
                emit(piv, n)
                return spans
            emit(piv, idx + 1)
            piv = idx + 1
        elif ch == ".":
            if idx > n - 3:
                emit(piv, n)
                return spans
            if text[idx + 1] == " " and text[idx + 2] in _SENT_DOT_FOLLOW:
                emit(piv, idx + 1)
                piv = idx + 1
    if piv < n or not spans:
        emit(piv, n)
    return spans


# ---------------------------------------------------------------------------
# String-similarity kernels (pairwise scoring stage).
# Standard published algorithms (Jaro 1989, Winkler 1990; Levenshtein 1966)
# implemented from their definitions.
# ---------------------------------------------------------------------------


def levenshtein_sim(a: str, b: str) -> float:
    """1 - normalized Levenshtein distance. Two-row DP, O(len(a)*len(b))."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        bj = b[j - 1]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev, cur = cur, prev
    return 1.0 - prev[la] / lb


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and a[i] == b[j]:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    # canonical convention (rapidfuzz / jellyfish / DuckDB): the
    # half-transposition count floors — integer division, not float.
    # Cross-engine-checked bit-for-bit vs DuckDB jaro_winkler_similarity
    # (the er_score_pairs oracle row).
    t = transpositions // 2
    m = matches
    return (m / la + m / lb + (m - t) / m) / 3


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1) -> float:
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1 - j)


def token_jaccard(a: str, b: str) -> float:
    sa, sb = set(conll_tokens(a.lower())), set(conll_tokens(b.lower()))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def wordpiece_tokenize(
    token: str,
    vocab: frozenset[str] | set[str] | dict,
    unk_token: str = "[UNK]",
    max_input_chars_per_word: int = 200,
) -> list[str]:
    """W5: greedy longest-match-first WordPiece split of ONE token
    (reference WordpieceTokenizer.tokenize, tokenization.py:304-360):
    repeatedly take the longest vocab prefix, '##'-prefixing every
    non-initial piece; any unmatched position makes the whole token
    ``unk_token``, as does a token over ``max_input_chars_per_word``."""
    if len(token) > max_input_chars_per_word:
        return [unk_token]
    pieces: list[str] = []
    start = 0
    n = len(token)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = token[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk_token]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_tokens(text: str, vocab, unk_token: str = "[UNK]") -> list[str]:
    """WordPiece over whitespace-separated tokens of ``text`` (the
    reference feeds BasicTokenizer output, i.e. whitespace tokens,
    tokenization.py:311-329)."""
    out: list[str] = []
    for tok in (text or "").split():
        out.extend(wordpiece_tokenize(tok, vocab, unk_token))
    return out


# W6 feature framing (reference convert_single_example, run_ner.py:785-847):
# label ids are 1-based positions in this fixed list (run_ner.py:225,787).
NER_LABELS = ["B", "I", "O", "X", "[CLS]", "[SEP]"]
_LABEL_MAP = {l: i for i, l in enumerate(NER_LABELS, 1)}


def frame_features(
    words: list[str],
    word_labels: list[str],
    vocab_ids: dict[str, int],
    max_seq_length: int = 256,
    unk_token: str = "[UNK]",
    long_word_cap: tuple[int, int] | None = (20, 10),
) -> dict[str, list]:
    """W6: frame one sentence for a learned sequence model — the pure-
    kernel form of the reference's ``convert_single_example``
    (run_ner.py:785-847): WordPiece each whitespace word (first piece
    keeps the word's BIO label, continuations get ``X``,
    run_ner.py:793-801), truncate to ``max_seq_length - 2``
    (run_ner.py:803-805), wrap in ``[CLS]``/``[SEP]`` with their own
    label ids (run_ner.py:806-821), convert to vocab ids, then pad
    ids/mask/segments/labels with 0 and tokens with ``**NULL**`` to
    exactly ``max_seq_length`` (run_ner.py:824-831).

    ``long_word_cap=(over, keep)`` is the P3 model-input truncation
    (reference ops.py:50-53): a word longer than ``over`` chars feeds
    only its first ``keep`` chars to the model — character offsets in the
    source text are NOT affected (the reference tracks full-word spans
    beside the capped word ids). ``None`` disables the cap.

    ``vocab_ids``: WordPiece vocab token -> id (also the membership set
    for :func:`wordpiece_tokenize`). Completes the §2.5 pre-stage for any
    learned-embedding scorer plugged into the pairwise scoring blend.
    """
    tokens: list[str] = []
    labels: list[str] = []
    for word, lab in zip(words, word_labels):
        if long_word_cap and len(word) > long_word_cap[0]:
            word = word[: long_word_cap[1]]
        pieces = wordpiece_tokenize(word, vocab_ids, unk_token)
        tokens.extend(pieces)
        # label only per emitted piece (reference run_ner.py:796-801): a
        # word yielding zero pieces (empty string) contributes no label,
        # else labels would misalign one past the tokens
        if pieces:
            labels.append(lab)
            labels.extend("X" for _ in pieces[1:])
    if len(tokens) >= max_seq_length - 1:
        tokens = tokens[: max_seq_length - 2]
        labels = labels[: max_seq_length - 2]
    ntokens = ["[CLS]", *tokens, "[SEP]"]
    segment_ids = [0] * len(ntokens)
    label_ids = [_LABEL_MAP["[CLS]"]]
    label_ids += [_LABEL_MAP[l] for l in labels]
    label_ids.append(_LABEL_MAP["[SEP]"])
    input_ids = [vocab_ids[t] for t in ntokens]
    input_mask = [1] * len(input_ids)
    pad = max_seq_length - len(input_ids)
    input_ids += [0] * pad
    input_mask += [0] * pad
    segment_ids += [0] * pad
    label_ids += [0] * pad
    ntokens += ["**NULL**"] * pad
    return {
        "ntokens": ntokens,
        "input_ids": input_ids,
        "input_mask": input_mask,
        "segment_ids": segment_ids,
        "label_ids": label_ids,
    }


def detokenize(
    tokens: list[str], labels: list[str], logits: list[float]
) -> tuple[list[list[str]], list[list[str]], list[list[float]]]:
    """W7: merge WordPiece output back to words, grouped by sentence —
    the reference's ``detokenize`` (ops.py:479-510), same semantics:
    ``[CLS]`` is skipped, ``[SEP]`` closes a sentence group, ``##``-pieces
    append their suffix to the previous word (the FIRST piece's
    label/logit represents the word — continuation labels are the W6
    ``X`` filler and are dropped). Inputs are parallel arrays as framed
    by :func:`frame_features`; callers slice off padding first (apply
    ``input_mask`` — the reference never sees pad tokens here because it
    detokenizes the model's per-token output stream)."""
    words: list[list[str]] = []
    wlabels: list[list[str]] = []
    wlogits: list[list[float]] = []
    cur_w: list[str] = []
    cur_l: list[str] = []
    cur_s: list[float] = []
    for t, l, s in zip(tokens, labels, logits):
        if t == "[CLS]":
            continue
        if t == "[SEP]":
            words.append(cur_w)
            wlabels.append(cur_l)
            wlogits.append(cur_s)
            cur_w, cur_l, cur_s = [], [], []
            continue
        if t[:2] == "##":
            cur_w[-1] = cur_w[-1] + t[2:]
        else:
            cur_w.append(t)
            cur_l.append(l)
            cur_s.append(s)
    return words, wlabels, wlogits


def char_shingles(text: str, k: int = 3) -> set[str]:
    """Character k-shingles of the lowercased, space-collapsed string —
    the MinHash input unit for blocking."""
    s = re.sub(r"\s+", " ", text.lower()).strip()
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}
