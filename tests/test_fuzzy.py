"""Tests: SymSpell fuzzy duplicate pairs (ops/fuzzy.py)."""

import itertools
import random

import numpy as np
import pyarrow as pa
import pytest


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(dp[j] + 1, nd[-1] + 1, dp[j - 1] + (ca != cb)))
        dp = nd
    return dp[-1]


def _poly_hash(s: str):
    from datavec_ray.ops.fuzzy import _B
    h, p = np.uint64(0), np.uint64(1)
    with np.errstate(over="ignore"):
        for c in s.encode():
            h = h + np.uint64(c) * p
            p = p * _B
    return int(h)


def test_deletion_variant_hashes_match_materialized_variants():
    from datavec_ray.ops.fuzzy import deletion_variant_hashes
    strs = ["abc", "hello", "", "a", "xy", "aaaa"]
    vh, rows, posn = deletion_variant_hashes(pa.array(strs), 2)
    exp = set()
    for r, s in enumerate(strs):
        exp.add((_poly_hash(s), r))
        for i in range(len(s)):
            exp.add((_poly_hash(s[:i] + s[i + 1:]), r))
        for i, j in itertools.combinations(range(len(s)), 2):
            exp.add((_poly_hash(s[:i] + s[i + 1:j] + s[j + 1:]), r))
    got = {(int(h), int(r)) for h, r in zip(vh.astype(object), rows)}
    assert got == exp


def test_levenshtein_batch_parity():
    from datavec_ray.ops.fuzzy import levenshtein_batch
    rng = random.Random(0)
    A = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 12)))
         for _ in range(200)]
    B = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 12)))
         for _ in range(200)]
    got = levenshtein_batch(pa.array(A), pa.array(B))
    assert got.tolist() == [_lev(a, b) for a, b in zip(A, B)]


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_dup_pairs_exact_vs_bruteforce(ray_session, k):
    import ray
    from datavec_ray.ops.fuzzy import fuzzy_dup_pairs
    rng = random.Random(7)
    strs = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 6)))
            for _ in range(120)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(strs)), pa.int64()),
        "text": pa.array(strs)}))
    out = fuzzy_dup_pairs(ds, max_edits=k)
    got = sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                     out["dist"].to_pylist()))
    exp = sorted((i, j, _lev(strs[i], strs[j]))
                 for i in range(len(strs)) for j in range(i + 1, len(strs))
                 if _lev(strs[i], strs[j]) <= k)
    assert got == exp


def test_fuzzy_long_rows_whole_string_only(ray_session):
    import ray
    from datavec_ray.ops.fuzzy import fuzzy_dup_pairs
    long = "z" * 400
    strs = [long, long, long + "q", "abc", "abd"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(strs)}))
    out = fuzzy_dup_pairs(ds, max_edits=1, max_len=256)
    got = sorted(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    # long rows: only exact-equality pair (0,1) survives (no deletion
    # variants emitted), the lev-1 pair (0,2)/(1,2) is knowingly missed
    assert got == [(0, 1), (3, 4)]


def test_deletion_variant_positions():
    from datavec_ray.ops.fuzzy import deletion_variant_hashes
    vh, rows, posn = deletion_variant_hashes(pa.array(["abc"]), 2)
    # one full (-1), three single-dels (0,1,2), three double-dels (-2)
    assert sorted(posn.tolist()) == [-2, -2, -2, -1, 0, 1, 2]
