"""Key-normalization scalar functions (SURVEY §2.8).

All are pure Catalyst ``Column`` expressions — whole-stage-codegen'd
JVM-side, no Python in the hot path. Each reproduces a reference key
function, cited file:line; semantics cross-checked by tests against a pure
Python re-implementation of the reference behavior.
"""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference strips ``string.punctuation`` + space (get_tmchem_name,
# /root/reference/normalizers/chemical_normalizer.py:64-72). Build the exact
# character class from the same constant so semantics match Python's
# definition of punctuation, not a regex approximation.
_TMCHEM_STRIP_CLASS = "[" + "".join("\\" + c for c in string.punctuation) + "\\s]"


def tmchem_key(col: Column | str) -> Column:
    """tmChem dictionary key: lowercase, remove all whitespace+punctuation.

    Reference: get_tmchem_name, chemical_normalizer.py:64-72. Used both as
    the drug-normalization join key (J1) and as a blocking key for pairwise
    scoring (SURVEY §2.3 tail note).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), _TMCHEM_STRIP_CLASS, "")


def species_fallback_key(col: Column | str) -> Column:
    """Second-level species key: plain lowercase (species_normalizer.py:49-50)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c)


def gene_suffix_strip(col: Column | str) -> Column:
    """Drop a trailing ``" gene"`` (case-insensitive) from gene mentions
    before dictionary lookup. Reference: normalize.py:540-548."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "(?i) gene$", "")


def gene_id_root(col: Column | str) -> Column:
    """Truncate a gene id at its first ``-``: ``672-2`` -> ``672``.

    Reference: normalize.py:76-81 (dict load) and normalize.py:578-580
    (query side).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "-", 2).getItem(0)


def mutation_head(col: Column | str) -> Column:
    """First ``;``-separated component of a tmVar normalizedName — the
    mutation lookup key (P9). Reference: normalize.py:208-212."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, ";", 2).getItem(0)


def species_taxid(oid: Column | str) -> Column:
    """Map a species dictionary oid to its NCBI taxonomy id:
    ``NCBI:txid{oid // 100}``. Reference: normalize.py:486-495."""
    c = F.col(oid) if isinstance(oid, str) else oid
    return F.concat(F.lit("NCBI:txid"), (c.cast("long") / 100).cast("long").cast("string"))


def text_sha224(col: Column | str) -> Column:
    """sha224 hex digest of the text — the reference's dedup/cache/tempfile
    identity (server.py:116-117, server.py:384). Used here as a
    deterministic content key for exact dedup and idempotent writes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 224)


def hgnc_fix(col: Column | str) -> Column:
    """``HGNC:HGNC:`` -> ``HGNC:`` cleanup in gene metadata external ids.
    Reference: normalize.py:114."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^HGNC:HGNC:", "HGNC:")
