"""CDC / incremental-ingest engine (the north-star layer).

binlog/WAL tail → DataVec-style transform steps (stateless map_batches)
→ hash-partitioned last-writer-wins upsert (actor pool) → exactly-once
Parquet lake sink with manifest/commit-log, LSN watermark checkpoints,
schema evolution and per-partition lineage. See SURVEY.md §7.
"""

from datavec_ray.cdc.binlog import synth_binlog, binlog_from_events, TRANSCRIPT_SCHEMA
from datavec_ray.cdc.oracle import replay_oracle
from datavec_ray.cdc.engine import CdcIngestEngine, lww_compact_dataset
from datavec_ray.cdc.joinview import JoinView
from datavec_ray.cdc.watermark import (assign_watermarks,
                                       route_late_events, session_stream,
                                       windowed_stream)
from datavec_ray.cdc.txn import txn_split, committed_txns, synth_txn_binlog
from datavec_ray.cdc.wap import StagedCommit, StageConflictError
from datavec_ray.cdc.multitable import (replay_tables, recover_tables,
                                        open_table_engines)
