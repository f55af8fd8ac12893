"""Schema-compatibility checking for CDC schema evolution.

Confluent-Schema-Registry-style modes mapped onto Arrow schemas
(public semantics — docs.confluent.io schema-evolution rules; the
reference's nearest notion is the fixed Schema contract of
``transform/schema/Schema.java``, which cannot evolve at all):

- BACKWARD: a reader holding the NEW schema can read data written
  with the OLD one — every new field either exists in old (with a
  lossless old→new type promotion) or is nullable (fills null);
  dropped fields are fine (the new reader ignores them).
- FORWARD: a reader holding the OLD schema can read data written
  with the NEW one — every old field either survives in new (with a
  lossless new→old... i.e. the type must not have narrowed) or is
  nullable in old.
- FULL: both. NONE: anything goes.

``CompatRegistry`` validates a version CHAIN (each registration
checked against the latest accepted version) and is the pure-Python
core the engine's ``SchemaRegistry`` actor guards with (pass
``compat_mode=`` to ``CdcIngestEngine``): an incoming binlog segment
whose unified schema would break the configured mode is REJECTED
before any lake write, so every committed lake file stays readable
under every later canonical schema.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

MODES = ("backward", "forward", "full", "none")

_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_ORDER = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2,
               pa.uint64(): 3}
_FLOAT_ORDER = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}


class SchemaCompatError(ValueError):
    """Raised when a schema registration violates the configured mode."""


def promotable(frm: pa.DataType, to: pa.DataType) -> bool:
    """True iff data of type ``frm`` is losslessly readable as ``to``
    (identity, integer/float widening, int→float64, string↔large,
    timestamp unit refinement)."""
    if frm.equals(to):
        return True
    if frm in _INT_ORDER and to in _INT_ORDER:
        return _INT_ORDER[frm] <= _INT_ORDER[to]
    if frm in _UINT_ORDER and to in _UINT_ORDER:
        return _UINT_ORDER[frm] <= _UINT_ORDER[to]
    if frm in _FLOAT_ORDER and to in _FLOAT_ORDER:
        return _FLOAT_ORDER[frm] <= _FLOAT_ORDER[to]
    if (frm in _INT_ORDER or frm in _UINT_ORDER) and to == pa.float64():
        # int up to 32 bits is exact in float64; int64 is not
        return frm not in (pa.int64(), pa.uint64())
    if {frm, to} <= {pa.string(), pa.large_string()}:
        return True
    if {frm, to} <= {pa.binary(), pa.large_binary()}:
        return True
    if pa.types.is_timestamp(frm) and pa.types.is_timestamp(to):
        units = {"s": 0, "ms": 1, "us": 2, "ns": 3}
        return (frm.tz == to.tz
                and units[frm.unit] <= units[to.unit])
    if pa.types.is_list(frm) and pa.types.is_list(to):
        return promotable(frm.value_type, to.value_type)
    return False


def _reader_can_read(writer: pa.Schema, reader: pa.Schema) -> list[str]:
    """Violations preventing a ``reader``-schema consumer from reading
    ``writer``-schema data."""
    probs = []
    for f in reader:
        w = writer.field(f.name) if f.name in writer.names else None
        if w is None:
            if not f.nullable:
                probs.append(
                    f"field '{f.name}' missing from writer and not "
                    "nullable in reader")
        elif not promotable(w.type, f.type):
            probs.append(
                f"field '{f.name}': writer type {w.type} not promotable "
                f"to reader type {f.type}")
    return probs


def check_compatibility(old: pa.Schema, new: pa.Schema,
                        mode: str = "backward") -> list[str]:
    """Violation list (empty = compatible) for evolving ``old`` →
    ``new`` under ``mode``."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    probs = []
    if mode in ("backward", "full"):
        probs += [f"backward: {p}" for p in _reader_can_read(old, new)]
    if mode in ("forward", "full"):
        probs += [f"forward: {p}" for p in _reader_can_read(new, old)]
    return probs


class CompatRegistry:
    """Versioned schema chain with per-registration compatibility
    enforcement (each new version checked against the LATEST accepted
    one, the Confluent default)."""

    def __init__(self, mode: str = "backward"):
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        self.mode = mode
        self.versions: list[pa.Schema] = []

    @property
    def latest(self) -> Optional[pa.Schema]:
        return self.versions[-1] if self.versions else None

    def register(self, schema: pa.Schema) -> int:
        """Validate + append; returns the 1-based version id."""
        if self.versions:
            probs = check_compatibility(self.versions[-1], schema,
                                        self.mode)
            if probs:
                raise SchemaCompatError(
                    f"schema v{len(self.versions) + 1} violates "
                    f"{self.mode} compatibility: " + "; ".join(probs))
        self.versions.append(schema)
        return len(self.versions)
