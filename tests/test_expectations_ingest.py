"""Ingest-time expectations: declarative row-level rules quarantine
semantic garbage to the DLQ (Delta-Live-Tables "expect or drop" gate),
on BOTH ingest paths, without disturbing exactly-once LWW state."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datavec_ray.cdc import CdcIngestEngine, replay_oracle, synth_binlog
from datavec_ray.cdc.engine import split_invalid_events

RULES = [{"column": "turn_idx", "check": "max_le", "value": 5},
         {"column": "role", "check": "in_set",
          "value": ["user", "assistant"]}]


@pytest.fixture(scope="module")
def binlog():
    return synth_binlog(4000, seed=11)


def _passing(binlog: pa.Table) -> pa.Table:
    ok = pc.and_(
        pc.fill_null(pc.less_equal(binlog["turn_idx"], 5), False),
        pc.or_(pc.is_null(binlog["role"]),
               pc.is_in(binlog["role"],
                        value_set=pa.array(["user", "assistant"]))))
    return binlog.filter(ok)


def test_split_invalid_events_expectation_masks(binlog):
    good, bad = split_invalid_events(binlog, expectations=RULES)
    assert good.num_rows + bad.num_rows == binlog.num_rows
    assert good.equals(_passing(binlog))
    reasons = set(bad["reason"].to_pylist())
    assert reasons == {"expect:max_le:turn_idx", "expect:in_set:role"}
    # nulls pass value checks (deletes carry null role)
    assert pc.max(good["turn_idx"]).as_py() <= 5
    assert good.filter(pc.is_null(good["role"])).num_rows > 0


def test_replay_with_expectations_matches_gated_oracle(
        ray_session, binlog, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, expectations=RULES)
    assert eng.dlq_dir is not None  # expectations imply a DLQ
    eng.replay(binlog, checkpoint_name="v1")
    want = replay_oracle(_passing(binlog))
    assert eng.read_lake().equals(want)
    dlq = eng.read_dlq()
    assert dlq.num_rows == binlog.num_rows - _passing(binlog).num_rows > 0
    assert set(dlq["reason"].to_pylist()) == {"expect:max_le:turn_idx",
                                              "expect:in_set:role"}
    eng.shutdown()


def test_router_ingest_with_expectations(ray_session, binlog, tmp_path):
    lake = str(tmp_path / "lake")
    eng = CdcIngestEngine(lake, num_partitions=4, ingest_mode="router",
                          expectations=RULES)
    eng.ingest(binlog)
    eng.checkpoint("v1", int(pc.max(binlog["lsn"]).as_py()))
    eng.commit()
    want = replay_oracle(_passing(binlog))
    assert eng.read_lake().equals(want)
    assert eng.read_dlq().num_rows > 0
    eng.shutdown()


def test_unknown_check_raises(binlog):
    with pytest.raises(ValueError, match="unsupported ingest expectation"):
        split_invalid_events(
            binlog, expectations=[{"column": "role", "check": "unique"}])


def test_rule_on_absent_column_passes(binlog):
    good, bad = split_invalid_events(
        binlog.drop_columns(["tool"]),
        expectations=[{"column": "tool", "check": "not_null"}])
    assert bad.num_rows == 0
