"""datavec_ray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch rebuild of the capabilities of huitseeker/DataVec
(schema-tracked record-transform pipelines: transforms, filters,
group-reduces, sequence ops, joins, readers/writers) re-expressed in
idiomatic Ray Data (`ray.data.Dataset` + vectorized `map_batches` over
zero-copy Arrow batches, actor pools for stateful stages), plus the
CDC/incremental-ingest layer the north rule requires (binlog tail →
hash-partitioned LWW upsert → exactly-once Parquet lake sink with
schema evolution, checkpointing and lineage).

Nothing in this package is a translation of the reference Java — the
reference (at /root/reference) defines WHAT each operator computes;
docstrings cite it as ``file:line`` for parity checking only.
"""

from datavec_ray.schema import ColumnMeta, Schema
from datavec_ray.pipeline import TransformPipeline

__all__ = ["Schema", "ColumnMeta", "TransformPipeline"]
__version__ = "0.1.0"
