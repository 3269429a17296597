"""Sentence index (W1-W3) and word windows (W4)."""

from pyspark.sql import functions as F


def _turns(spark, texts):
    return spark.createDataFrame(
        [("c1", i, t) for i, t in enumerate(texts)], ["conv_id", "turn_idx", "text"]
    )


def test_sentence_index_tiles_text(spark):
    from bern_spark.operators.sentences import sentence_index

    texts = ["Hello there. Next one. And more!", "approx. value is 3", ""]
    idx = sentence_index(_turns(spark, texts)).collect()
    by_turn = {}
    for r in idx:
        by_turn.setdefault(r.turn_idx, []).append(r)
    assert len(by_turn[0]) == 3
    assert len(by_turn[1]) == 1  # 'approx. v' does not split
    # spans tile: concatenation of sentences == text
    joined = "".join(r.sentence for r in sorted(by_turn[0], key=lambda r: r.sent_idx))
    assert joined == texts[0]


def test_word_windows(spark):
    from bern_spark.operators.sentences import word_windows

    text = " ".join(f"w{i}" for i in range(70))
    rows = word_windows(_turns(spark, [text]), window_tokens=30).collect()
    assert [r.win_idx for r in sorted(rows, key=lambda r: r.win_idx)] == [0, 1, 2]
    # windows cover all tokens, chunks are exact slices
    for r in rows:
        assert text[r.start:r.end] == r.chunk
    assert rows[0].chunk.split()[0] == "w0"
    last = max(rows, key=lambda r: r.win_idx)
    assert last.chunk.split()[-1] == "w69"
