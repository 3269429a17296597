"""P1-P4 preprocessing: bit-exact vs a direct reimplementation of
convert.py:301-348 + server.py:338-382 semantics."""

from pyspark.sql import functions as F

from bern_spark.functions.text import (
    ascii_letter_guard,
    canonical_text,
    collapse_control_chars,
    preprocess_text,
    truncate_long_words,
)

SPACE_CHARS = [
    "\u2028", "\u2029", "\u200A", "\u2009", "\u2008", "\u2005", "\u2004",
    "\u2003", "\u2002", "\u00A0", "\uF8FF", "\u202F", "\uFEFF", "\uF044",
    "\uF02D", "\uF0BB",
]


def ref_preprocess(text: str) -> str:
    text = text.replace("\r ", " ")
    for ch in SPACE_CHARS:
        text = text.replace(ch, " ")
    text = text.replace("", "Η")
    text = text.replace("", "°")
    return text


def _one(spark, col, s):
    df = spark.createDataFrame([(s,)], ["s"])
    return df.select(col(F.col("s")).alias("v")).collect()[0][0]


def test_preprocess_bit_exact(spark):
    cases = [
        "plain text",
        "a b c d",
        "eta: deg:",
        "cr\r space",
        "".join(SPACE_CHARS),
        "\r x\r\r y",  # '\r ' -> ' ', lone \r preserved by P1
    ]
    for c in cases:
        assert _one(spark, preprocess_text, c) == ref_preprocess(c), repr(c)


def test_preprocess_preserves_length_for_1to1_chars(spark):
    s = "a b c"
    assert len(_one(spark, preprocess_text, s)) == len(s)


def test_collapse_control_chars(spark):
    assert _one(spark, collapse_control_chars, "a\r\nb\tc") == "a  b c"


def test_truncate_long_words_two_limits(spark):
    long_word = "x" * 80
    s = f"short {long_word} end"
    out = _one(spark, truncate_long_words, s)
    assert out == f"short {'x' * 50} end"  # server.py max_word_len=50


def test_ascii_guard(spark):
    assert "No text available" in _one(spark, ascii_letter_guard, "123 !!! 456")
    assert _one(spark, ascii_letter_guard, "has Letters") == "has Letters"


def test_canonical_chain(spark):
    s = "a b\r\nc " + "y" * 60
    out = _one(spark, canonical_text, s)
    assert out == "a b  c " + "y" * 50
