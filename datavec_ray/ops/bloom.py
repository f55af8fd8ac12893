"""Distributed Bloom filter over Dataset key columns.

The scale companion to semi/anti joins and blocklist filtering: at
100 TB the right side's distinct-key set can exceed a worker heap, but
a Bloom filter over it stays a few hundred MB at 10^9 keys / 1% FP —
small enough to ``ray.put`` once and consult per batch with zero
shuffle. Build is one streaming ``ds.aggregate`` pass (per-block bit
arrays OR-merged in Ray's tree reduce), matching the aggregateByKey
partial/final discipline used everywhere else in this repo
(reference cost model: ``SparkTransformExecutor.java:252-290``).

Membership answers are one-sided: ``contains`` may return false
positives (rate ≈ ``fp`` at the sized capacity) but never false
negatives — callers that need exact semantics (``join.semi_join``)
use the filter only to PRUNE work and confirm survivors exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from datavec_ray.hll import hash64
from datavec_ray.steps.base import combine

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def key_hash64(table: pa.Table, keys: list[str]) -> np.ndarray:
    """One deterministic 64-bit hash per row over a multi-column key
    (same mixing as the inequality joins' bucket assignment)."""
    h = hash64(combine(table[keys[0]]))
    for k in keys[1:]:
        h = h * np.uint64(1000003) + hash64(combine(table[k]))
    return h


class BloomFilter:
    """Vectorized double-hashing Bloom filter on a uint64 word array."""

    __slots__ = ("num_bits", "num_hashes", "words")

    def __init__(self, num_bits: int = 1 << 24, num_hashes: int = 4,
                 words: np.ndarray | None = None):
        num_bits = max(64, (num_bits + 63) // 64 * 64)
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.words = (words if words is not None
                      else np.zeros(num_bits // 64, dtype=np.uint64))

    # -- sizing ----------------------------------------------------------
    @staticmethod
    def size_for(n_keys: int, fp: float = 0.01) -> tuple[int, int]:
        """(num_bits, num_hashes) for the target false-positive rate."""
        n = max(1, n_keys)
        m = int(-n * math.log(fp) / (math.log(2) ** 2)) + 64
        k = max(1, round(m / n * math.log(2)))
        return m, min(k, 8)

    # -- core ------------------------------------------------------------
    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        # double hashing: pos_i = h1 + i*h2 (h2 forced odd)
        h2 = (h ^ (h >> np.uint64(33))) * _MIX | np.uint64(1)
        return (h + np.uint64(i) * h2) % np.uint64(self.num_bits)

    def add_hashes(self, h: np.ndarray) -> None:
        for i in range(self.num_hashes):
            pos = self._positions(h, i)
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        mask = np.ones(len(h), dtype=bool)
        for i in range(self.num_hashes):
            pos = self._positions(h, i)
            bit = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            mask &= bit.astype(bool)
        return mask

    def add_table(self, table: pa.Table, keys: list[str]) -> None:
        if table.num_rows:
            self.add_hashes(key_hash64(table, keys))

    def contains_table(self, table: pa.Table, keys: list[str]) -> np.ndarray:
        if not table.num_rows:
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(key_hash64(table, keys))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


def bloom_from_dataset(ds, keys, num_bits: int | None = None,
                       num_hashes: int | None = None,
                       expected_keys: int | None = None,
                       fp: float = 0.01) -> BloomFilter:
    """Build a BloomFilter over ``keys`` of a Dataset (or pa.Table) in one
    streaming aggregate pass. Partial per-block filters are OR-merged in
    Ray's tree reduce — nothing but bit arrays crosses the wire."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if num_bits is None or num_hashes is None:
        n = expected_keys
        if n is None:
            n = ds.num_rows if isinstance(ds, pa.Table) else ds.count()
        m, k = BloomFilter.size_for(n, fp)
        num_bits = num_bits or m
        num_hashes = num_hashes or k
    if isinstance(ds, pa.Table):
        bf = BloomFilter(num_bits, num_hashes)
        bf.add_table(ds, keys)
        return bf

    from ray.data.aggregate import AggregateFn

    nb, nh = num_bits, num_hashes

    # the aggregate STATE is the raw uint64 word array (Arrow-friendly
    # when Ray blocks partial states between map and reduce); the
    # BloomFilter wrapper is rebuilt around the merged words at the end
    def _acc(words: np.ndarray, blk: pa.Table) -> np.ndarray:
        bf = BloomFilter(nb, nh, words=words)
        bf.add_table(blk, keys)
        return bf.words

    agg = AggregateFn(
        init=lambda _k: np.zeros(max(64, (nb + 63) // 64 * 64) // 64,
                                 dtype=np.uint64),
        merge=lambda a, b: np.bitwise_or(a, b),
        accumulate_block=_acc,
        finalize=lambda w: w, name="bloom")
    row = ds.select_columns(keys).aggregate(agg)
    return BloomFilter(nb, nh, words=np.asarray(row["bloom"],
                                                dtype=np.uint64))
