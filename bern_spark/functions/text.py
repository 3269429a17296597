"""Text-preprocessing projections (SURVEY §2.2 P1-P4).

These feed character offsets downstream, so they must be **bit-exact**
reproductions of the reference behavior (convert.py:301-348,
server.py:338-382). Every transform here is 1-substitution-per-char or
char-for-char, so downstream span offsets computed on the preprocessed text
are valid against it — the pipeline's per-turn text-equality invariant is
checked on the *preprocessed* text, exactly as the reference emits the text
it tagged (convert.py:483-496).

All are Catalyst ``translate``/``regexp_replace`` expressions — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exotic unicode whitespace / PUA chars -> ASCII space, plus two glyph
# fixes. Mirrors preprocess() at convert.py:301-348 1:1. All source chars
# are single BMP code points and all targets single chars, so a single
# ``translate`` reproduces the chain of str.replace calls (they are
# non-overlapping, order-independent).
_SPACE_SOURCES = (
    "\u2028\u2029"  # line / paragraph separator
    "\u200A\u2009\u2008"  # hair / thin / punctuation space
    "\u2005\u2004\u2003\u2002"  # four/three-per-em / em / en space
    "\u00A0"  # no-break space
    "\uF8FF\u202F\uFEFF\uF044\uF02D\uF0BB"  # PUA + narrow nbsp + BOM
)
_TRANSLATE_SRC = _SPACE_SOURCES + "\uF048\uF0B0"
_TRANSLATE_DST = " " * len(_SPACE_SOURCES) + "\u0397\u00B0"  # capital Eta, degree sign


def preprocess_text(col: Column | str) -> Column:
    """P1: unicode whitespace normalization (convert.py:301-348).

    The reference additionally maps the two-char sequence ``'\\r '`` to
    ``' '`` (convert.py:302) — note that is ``\\r + space -> single space``
    (length-changing!). We reproduce it with regexp_replace before the
    char-for-char translate.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "\r ", " ")
    return F.translate(c, _TRANSLATE_SRC, _TRANSLATE_DST)


def collapse_control_chars(col: Column | str) -> Column:
    """P2: CR/LF/TAB -> space (server.py:338-356, download.py:654-660).

    Char-for-char (no collapsing of runs — the reference replaces each
    occurrence with one space), so offsets survive.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "\r\n\t", "   ")


def truncate_long_words(col: Column | str, max_word_len: int = 50) -> Column:
    """P3: truncate whitespace-delimited words longer than ``max_word_len``
    (server.py:358-368, default max_word_len=50 at server.py:671-672).

    This one is length-changing, so the pipeline applies it as part of the
    canonical preprocessing *before* any offsets are assigned; the
    invariant text is the post-truncation text.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(F.split(c, " "), lambda w: F.substring(w, 1, max_word_len)),
        " ",
    )


_NO_ASCII_MSG = "No text available. The input text has no ASCII letters."


def ascii_letter_guard(col: Column | str, message: str = _NO_ASCII_MSG) -> Column:
    """P4: if the text contains zero ASCII letters, replace it with a fixed
    English message (server.py:375-382) so downstream tokenization never
    sees an all-symbol turn."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike("[A-Za-z]"), c).otherwise(F.lit(message))


def canonical_text(col: Column | str, max_word_len: int = 50) -> Column:
    """The full canonical preprocessing chain P1->P2->P3->P4 in reference
    order (server.py:338-382 applies control-collapse + truncation + guard;
    convert.py path applies P1). Output is the text every downstream span
    offset refers to, and the text the per-turn equality invariant holds
    over."""
    return ascii_letter_guard(truncate_long_words(collapse_control_chars(preprocess_text(col)), max_word_len))
