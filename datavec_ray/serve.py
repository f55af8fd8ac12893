"""Single-record / incremental pipeline application (inference-server core).

Parity target: the reference's REST inference server executes a held
TransformProcess one record at a time and supports hot-swapping the
pipeline JSON (``datavec-spark-inference-parent/.../CSVSparkTransformServer.java:33-192``,
``CSVSparkTransform.java:30``). The transport layer (Play/REST) is out of
scope here; this module is the engine side — wrap it in Ray Serve or any
HTTP framework. State = the compiled pipeline, swappable via
``set_pipeline`` (the POST /transformprocess equivalent).
"""

from __future__ import annotations

from typing import Any, Sequence

import pyarrow as pa

from datavec_ray.pipeline import TransformPipeline


class IncrementalTransformer:
    """Holds a TransformPipeline; transforms single records or small
    batches synchronously (the /transform and /transformincremental
    paths). Wide steps are rejected exactly like the reference's
    per-record execute throws on ConvertToSequence/groupBy
    (``TransformProcess.java:244-253``)."""

    def __init__(self, pipeline: TransformPipeline | str):
        self.pipeline: TransformPipeline = None  # type: ignore
        self.set_pipeline(pipeline)

    def set_pipeline(self, pipeline: TransformPipeline | str) -> None:
        if isinstance(pipeline, str):
            pipeline = TransformPipeline.from_json(pipeline)
        for step in pipeline.steps:
            if step.is_wide:
                raise ValueError(
                    f"incremental execution cannot run wide step "
                    f"{type(step).__name__} (needs the whole dataset)")
        self.pipeline = pipeline

    def get_pipeline_json(self) -> str:
        return self.pipeline.to_json()

    def transform_record(self, record: dict[str, Any]) -> dict[str, Any] | None:
        """One record in → one record out (None if a filter dropped it)."""
        tbl = pa.table({k: pa.array([v], type=self.pipeline.initial_schema.type_of(k))
                        for k in self.pipeline.initial_schema.names
                        for v in [record.get(k)]})
        out = self.pipeline.execute_table(tbl)
        if out.num_rows == 0:
            return None
        return {c: out[c][0].as_py() for c in out.column_names}

    def transform_batch(self, records: Sequence[dict[str, Any]]) -> list[dict]:
        cols = self.pipeline.initial_schema.names
        tbl = pa.table({k: pa.array([r.get(k) for r in records],
                                    type=self.pipeline.initial_schema.type_of(k))
                        for k in cols})
        out = self.pipeline.execute_table(tbl)
        return out.to_pylist()

    def transform_array(self, records: Sequence[dict[str, Any]]):
        """Batch → 2-D float32 ndarray of the numeric output columns (the
        /transformarray path: CSVSparkTransformServer.java → base64
        NDArray; our transport base64-encodes the raw float32 bytes)."""
        import numpy as np
        cols = self.pipeline.initial_schema.names
        tbl = pa.table({k: pa.array([r.get(k) for r in records],
                                    type=self.pipeline.initial_schema.type_of(k))
                        for k in cols})
        out = self.pipeline.execute_table(tbl)
        numeric = [c for c in out.column_names
                   if pa.types.is_integer(out[c].type)
                   or pa.types.is_floating(out[c].type)
                   or pa.types.is_boolean(out[c].type)]
        if not numeric:
            raise ValueError("no numeric output columns to convert")
        mat = np.column_stack([
            out[c].cast(pa.float32()).to_numpy(zero_copy_only=False)
            for c in numeric]).astype(np.float32)
        return mat, numeric
