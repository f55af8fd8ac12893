"""HyperLogLog — mergeable approximate-distinct sketch.

Parity target: the reference's ``AggregableCountUnique`` which wraps
streamlib's HyperLogLogPlus with relative error ≈ 1.054/√(2^p)
(``datavec-api/.../transform/ops/AggregatorImpls.java:472-516``; the
default construction converts rsd=0.05 → p=9). This is an independent
implementation of the published HLL algorithm (Flajolet et al. 2007,
with the linear-counting small-range correction) on numpy registers —
dense representation only; registers merge by elementwise max, which is
what makes it a distributive partial-aggregate (combiner-friendly).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hashes of an array of values (vectorized for
    common dtypes; stable across processes — no PYTHONHASHSEED dependence).
    Distinct ``seed`` values give independent hash families — pair two
    seeds for a 128-bit fingerprint with negligible collision mass.

    Fast paths: numeric numpy → splitmix64; Arrow string arrays → polars'
    vectorized 64-bit hash (seeded, deterministic across processes for a
    given polars build — every node runs the same image); anything else →
    per-value blake2b (slow path, small inputs only).
    """
    import pyarrow as pa
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        typ = values.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ) \
                or pa.types.is_binary(typ):
            try:
                import polars as pl
                return pl.from_arrow(
                    values.combine_chunks() if isinstance(values, pa.ChunkedArray)
                    else values).hash(seed=seed).to_numpy().astype(np.uint64)
            except ImportError:
                pass
        values = (values.combine_chunks() if isinstance(values, pa.ChunkedArray)
                  else values)
        # An int/bool array WITH nulls would to_numpy() into float64/
        # object — the same integer would then hash differently in
        # batches that happen to contain a null vs batches that don't,
        # splitting key groups across hash partitions. Pin the dtype by
        # filling nulls with 0 first; callers that need null-distinct
        # semantics overwrite null positions afterwards (see
        # setops._row_hash's _NULL_MARK).
        if values.null_count and (pa.types.is_integer(typ)
                                  or pa.types.is_boolean(typ)):
            import pyarrow.compute as pc
            values = pc.fill_null(values, 0)
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype.kind in "iufb":
        data = arr.astype(np.float64, copy=False).tobytes() if arr.dtype.kind == "f" \
            else arr.astype(np.int64, copy=False).tobytes()
        raw = np.frombuffer(data, dtype=np.uint64)
        # splitmix64 finalizer, vectorized; seed folded in up front
        with np.errstate(over="ignore"):
            x = raw ^ (np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
                       * np.uint64(0x9E3779B97F4A7C15))
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return x
    out = np.empty(len(arr), dtype=np.uint64)
    sb = seed.to_bytes(8, "little", signed=False) if seed else b""
    for i, v in enumerate(arr):
        h = hashlib.blake2b(sb + str(v).encode("utf-8"),
                            digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def register_updates(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per 64-bit hash — the HLL scatter kernel,
    shared by HyperLogLog.add_hashes and the grouped combiner fold in
    datavec_ray.reduce."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) | np.uint64(1 << (p - 1))
    # rank = leading zeros of w + 1. Exact vectorized clz: split into
    # 32-bit halves (32-bit ints are exact in float64; a direct log2 of
    # a full uint64 is not).
    hi = (w >> np.uint64(32)).astype(np.int64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.int64)
    lz = np.empty(len(w), dtype=np.int64)
    hi_nz = hi != 0
    lz[hi_nz] = 31 - np.floor(np.log2(hi[hi_nz])).astype(np.int64)
    lo_part = ~hi_nz
    # w always has the (p-1) guard bit set, so lo != 0 where hi == 0
    lz[lo_part] = 32 + (31 - np.floor(np.log2(lo[lo_part])).astype(np.int64))
    rank = (lz + 1).astype(np.uint8)
    return idx, rank


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 9, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None \
            else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        idx, rank = register_updates(h, self.p)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values: Iterable) -> None:
        self.add_hashes(hash64(list(values)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def cardinality(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(est)

    # serde for crossing process boundaries in partial aggregation
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        regs = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return cls(p, regs)
