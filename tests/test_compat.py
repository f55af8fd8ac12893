"""Schema-compatibility modes (``datavec_ray/cdc/compat.py``) and the
engine's compat-guarded evolution."""

import pyarrow as pa
import pytest

from datavec_ray.cdc.compat import (CompatRegistry, SchemaCompatError,
                                    check_compatibility, promotable)


def test_promotable_matrix():
    assert promotable(pa.int32(), pa.int64())
    assert not promotable(pa.int64(), pa.int32())
    assert promotable(pa.float32(), pa.float64())
    assert promotable(pa.int32(), pa.float64())
    assert not promotable(pa.int64(), pa.float64())  # not exact
    assert promotable(pa.string(), pa.large_string())
    assert promotable(pa.timestamp("ms"), pa.timestamp("us"))
    assert not promotable(pa.timestamp("us"), pa.timestamp("ms"))
    assert promotable(pa.list_(pa.int32()), pa.list_(pa.int64()))
    assert not promotable(pa.int32(), pa.string())


def _s(*fields):
    return pa.schema(list(fields))


BASE = _s(("a", pa.int32()), ("b", pa.string()))


def test_backward_add_nullable_ok():
    new = _s(("a", pa.int32()), ("b", pa.string()), ("c", pa.float64()))
    assert check_compatibility(BASE, new, "backward") == []
    # forward fails only if old has fields new lacks — not here
    assert check_compatibility(BASE, new, "forward") == []


def test_backward_add_required_fails():
    new = pa.schema([("a", pa.int32()), ("b", pa.string()),
                     pa.field("c", pa.float64(), nullable=False)])
    probs = check_compatibility(BASE, new, "backward")
    assert probs and "not nullable" in probs[0]


def test_forward_drop_required_fails():
    new = _s(("a", pa.int32()))
    # backward: new reader ignores dropped b -> ok
    assert check_compatibility(BASE, new, "backward") == []
    # forward: old reader wants b; b nullable in old -> ok
    assert check_compatibility(BASE, new, "forward") == []
    old_req = pa.schema([("a", pa.int32()),
                         pa.field("b", pa.string(), nullable=False)])
    probs = check_compatibility(old_req, new, "forward")
    assert probs and probs[0].startswith("forward")


def test_widening_is_backward_not_forward():
    new = _s(("a", pa.int64()), ("b", pa.string()))
    assert check_compatibility(BASE, new, "backward") == []
    probs = check_compatibility(BASE, new, "forward")
    assert probs and "not promotable" in probs[0]
    assert check_compatibility(BASE, new, "full") == probs


def test_compat_registry_chain():
    r = CompatRegistry("backward")
    assert r.register(BASE) == 1
    assert r.register(_s(("a", pa.int64()), ("b", pa.string()))) == 2
    with pytest.raises(SchemaCompatError):
        r.register(_s(("a", pa.string()), ("b", pa.string())))
    assert len(r.versions) == 2
    with pytest.raises(ValueError):
        CompatRegistry("sideways")


def test_engine_compat_guard(ray_session, tmp_path):
    """compat_mode='full' rejects a backward-only evolution (turn_idx
    widened int32→int64: old readers can't consume int64 data), while
    'backward' (and the default None) accepts it."""
    from datavec_ray.cdc.binlog import synth_binlog
    from datavec_ray.cdc.engine import CdcIngestEngine
    bl = synth_binlog(800, seed=2)
    early = bl.slice(0, 400)
    late = bl.slice(400, 400)
    i = late.schema.get_field_index("turn_idx")
    late = late.set_column(i, pa.field("turn_idx", pa.int64()),
                           late["turn_idx"].cast(pa.int64()))  # widened

    eng = CdcIngestEngine(str(tmp_path / "full"), num_partitions=2,
                          compat_mode="full")
    try:
        eng.ingest(early)
        with pytest.raises(Exception) as ei:
            eng.ingest(late, min_lsn_exclusive=400)
        assert "compatibility" in str(ei.value)
    finally:
        eng.shutdown()

    eng2 = CdcIngestEngine(str(tmp_path / "bw"), num_partitions=2,
                           compat_mode="backward")
    try:
        eng2.ingest(early)
        eng2.ingest(late, min_lsn_exclusive=400)
        eng2.commit()
        out = eng2.read_lake()
        assert pa.types.is_int64(out.schema.field("turn_idx").type)
    finally:
        eng2.shutdown()
