"""Engine-wide tuning knobs resolved from the environment.

The wide (hash-exchange) operators — grouped reduce, window ranks,
set ops, bucketed joins, LSH bucket stages — default to 32 exchange
partitions, which is right for the single-node test/bench envelope
(32 vCPUs). A 100 TB run on a multi-node cluster needs orders of
magnitude more exchange partitions (rule of thumb: 2-4x total cluster
cores, and no partition above a few hundred MB); set

    DATAVEC_NUM_PARTITIONS=4096

on the driver and every wide exchange that was left at its default
picks it up. An explicit ``num_partitions=`` argument at a call site
still wins — the env only replaces the library default.

Determinism: every EXACT operator's result is partition-count
independent (hash-partition groupbys compute per-key answers
regardless of how keys are packed into partitions). The documented
partition-SENSITIVE outputs are the rows-only approximations
(t-digest quantile estimates, k-means at equal seeds, LSH bucket
splits past ``max_bucket``), which carry that caveat in COVERAGE.md.
"""

from __future__ import annotations

import os

_ENV = "DATAVEC_NUM_PARTITIONS"


def partitions_default(fallback: int = 32) -> int:
    """The exchange-partition default: ``DATAVEC_NUM_PARTITIONS`` if
    set, else ``fallback``."""
    env = os.environ.get(_ENV)
    if not env:
        return fallback
    n = int(env)
    if n < 1:
        raise ValueError(f"{_ENV} must be >= 1, got {n}")
    return n


def partitions_override(requested: int, library_default: int = 32) -> int:
    """Resolve a call-site partition count against the env knob: a
    caller who passed a NON-default value wins; the library default is
    replaced by ``DATAVEC_NUM_PARTITIONS`` when set."""
    if requested != library_default:
        return requested
    return partitions_default(library_default)
