"""Compact Bloom filter for the extraction anchor set (SURVEY §7 hard
part b: lexicon distribution).

The anchor gate in ``bern_spark.operators.extract`` needs a membership
test over the set of lexicon-surface first tokens inside an Arrow UDF.
For vocabulary-sized lexicons an exact frozenset in the closure is fine;
for a 10^8-surface lexicon the driver collect and the pickled closure
both blow up. This Bloom filter bounds the closure to ``m`` bits
(~1.2 MB per 10^6 items at 1% fp) and is built EXECUTOR-side: each input
partition ORs into a local bit array, partial filters tree-reduce to one.

False positives only admit extra candidate spans, which the broadcast
lexicon join discards — extraction semantics are unchanged, by
construction. (The reference sidesteps the problem by loading whole
dictionaries into every normalizer process, chemical_normalizer.py:30-40
— not an option at the graft's 10^12-turn target.)

Hashing is blake2b-derived double hashing (Kirsch–Mitzenmacher): two
64-bit lanes from one digest give k index streams, deterministic across
driver and executors (no PYTHONHASHSEED exposure).
"""

from __future__ import annotations

import math
from hashlib import blake2b


class BloomFilter:
    __slots__ = ("m", "k", "bits")

    def __init__(self, m: int, k: int, bits: bytearray | None = None):
        self.m = m
        self.k = k
        self.bits = bits if bits is not None else bytearray((m + 7) // 8)

    # -- sizing ---------------------------------------------------------

    @staticmethod
    def params(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
        """Optimal (m bits, k hashes) for n items at the target fp rate."""
        n = max(1, n_items)
        m = max(8, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
        k = max(1, int(round(m / n * math.log(2))))
        return m, k

    @classmethod
    def sized_for(cls, n_items: int, fp_rate: float = 0.01) -> "BloomFilter":
        m, k = cls.params(n_items, fp_rate)
        return cls(m, k)

    # -- core -----------------------------------------------------------

    def _lanes(self, s: str) -> tuple[int, int]:
        d = blake2b(s.encode("utf-8"), digest_size=16).digest()
        return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")

    def add(self, s: str) -> None:
        h1, h2 = self._lanes(s)
        m, bits = self.m, self.bits
        for i in range(self.k):
            idx = (h1 + i * h2) % m
            bits[idx >> 3] |= 1 << (idx & 7)

    def __contains__(self, s: str) -> bool:
        h1, h2 = self._lanes(s)
        m, bits = self.m, self.bits
        for i in range(self.k):
            idx = (h1 + i * h2) % m
            if not bits[idx >> 3] & (1 << (idx & 7)):
                return False
        return True

    def union_bytes(self, other: bytes) -> None:
        self.bits = bytearray(a | b for a, b in zip(self.bits, other))

    def nbytes(self) -> int:
        return len(self.bits)


def bloom_from_rdd(rdd, n_items: int, fp_rate: float = 0.01) -> BloomFilter:
    """Build a BloomFilter over an RDD[str] executor-side.

    Each partition folds its strings into a local bit array; partials
    tree-reduce by bytewise OR. The driver only ever holds O(m) bytes —
    never the strings themselves.
    """
    m, k = BloomFilter.params(n_items, fp_rate)

    def _partition(it):
        bf = BloomFilter(m, k)
        for s in it:
            if s is not None:
                bf.add(s)
        yield bytes(bf.bits)

    def _or(a: bytes, b: bytes) -> bytes:
        return bytes(x | y for x, y in zip(a, b))

    bits = rdd.mapPartitions(_partition).treeReduce(_or)
    return BloomFilter(m, k, bytearray(bits))
