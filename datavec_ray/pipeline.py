"""TransformPipeline — the TransformProcess equivalent. SURVEY.md §2.1, §3.

Parity target: ``transform/TransformProcess.java:101`` — an ordered list
of actions with (a) eager schema propagation at build time
(``TransformProcess.java:110-156``: every step maps input schema →
output schema before any data flows, failing fast on mismatch),
(b) JSON serde of the whole pipeline (``TransformProcess.java:404-481``),
(c) execution over a distributed dataset
(``datavec-spark/.../SparkTransformExecutor.java:161-322``).

Ray-Data-first execution: consecutive NARROW steps are fused into a
single vectorized ``map_batches(fused_fn, batch_format="pyarrow")`` call
(zero-copy Arrow in/out, one Python-function dispatch per batch per fused
run); WIDE steps (groupby-reduce, convert-to-sequence ops, sorted-rank,
join) each contribute their own shuffle stage via ``apply_dataset``.
``execute_table`` runs the identical step objects single-process over one
pyarrow Table — the executor-parity oracle used by the tests (mirrors
``ExecutionTest.java:41-117``).
"""

from __future__ import annotations

import json
from typing import Any, Optional, Sequence

import pyarrow as pa

from datavec_ray.registry import resolve
from datavec_ray.schema import Schema
from datavec_ray.steps.base import Step

# import step modules for registry side effects
import datavec_ray.steps.column  # noqa: F401
import datavec_ray.steps.math  # noqa: F401
import datavec_ray.steps.string  # noqa: F401
import datavec_ray.steps.categorical  # noqa: F401
import datavec_ray.steps.time  # noqa: F401
import datavec_ray.steps.ndarray  # noqa: F401
import datavec_ray.steps.conditional  # noqa: F401


class _FusedSteps:
    """Picklable chain of narrow steps — one map_batches body.

    Arrow tables flow through the chain without copies; each step is a
    vectorized kernel (pyarrow.compute / numpy).
    """

    def __init__(self, steps: Sequence[Step], out_schema: pa.Schema):
        self.steps = list(steps)
        self.out_schema = out_schema

    def __call__(self, table: pa.Table) -> pa.Table:
        if table.schema.metadata:
            # parquet pandas-metadata dicts make the schema unhashable
            # downstream (Ray sort logs a warning per reduce task)
            table = table.replace_schema_metadata(None)
        for s in self.steps:
            table = s.apply(table)
        if table.num_rows == 0:
            # keep schema stable for empty batches
            return self.out_schema.empty_table()
        return table


class TransformPipeline:
    """Ordered step list with eagerly-propagated schemas."""

    def __init__(self, initial_schema: Schema | pa.Schema):
        if isinstance(initial_schema, pa.Schema):
            initial_schema = Schema(initial_schema)
        self.initial_schema = initial_schema
        self.steps: list[Step] = []
        self._schemas: list[Schema] = [initial_schema]  # schema AFTER step i at i+1

    # -- construction --------------------------------------------------------
    def add(self, step: Step) -> "TransformPipeline":
        out = step.output_schema(self._schemas[-1])
        self.steps.append(step)
        self._schemas.append(out)
        return self

    def __iadd__(self, step: Step) -> "TransformPipeline":
        return self.add(step)

    @property
    def final_schema(self) -> Schema:
        return self._schemas[-1]

    def schema_after_step(self, i: int) -> Schema:
        """Parity: TransformProcess.getSchemaAfterStep (TransformProcess.java:182-221)."""
        return self._schemas[i + 1]

    # -- execution -----------------------------------------------------------
    def _plan(self) -> list[tuple[str, Any]]:
        """Group steps into ('narrow', [steps...]) / ('wide', step) stages."""
        plan: list[tuple[str, Any]] = []
        run: list[Step] = []
        run_start = 0
        for i, s in enumerate(self.steps):
            if s.is_wide:
                if run:
                    plan.append(("narrow", (run, self._schemas[i])))
                    run = []
                plan.append(("wide", (s, self._schemas[i])))
                run_start = i + 1
            else:
                if not run:
                    run_start = i
                run.append(s)
        if run:
            plan.append(("narrow", (run, self._schemas[len(self.steps)])))
        return plan

    def explain(self) -> str:
        """Human-readable physical plan: how the step list fuses into
        narrow (single map_batches, zero exchanges) and wide (shuffle)
        stages, with the statically-propagated schema after each stage
        — the what-will-this-cost view (each 'wide' line is an
        all-to-all exchange; reference counterpart: the DataAction
        staging of TransformProcess, SURVEY §2.1)."""
        lines = []
        for i, (kind, payload) in enumerate(self._plan()):
            if kind == "narrow":
                steps, out_schema = payload
                names = ", ".join(type(s).__name__ for s in steps)
                lines.append(
                    f"stage {i}: narrow map_batches [{names}] "
                    f"-> ({', '.join(out_schema.arrow().names)})")
            else:
                step, in_schema = payload
                lines.append(
                    f"stage {i}: WIDE {type(step).__name__} (exchange) "
                    f"<- ({', '.join(in_schema.arrow().names)})")
        n_wide = sum(1 for k, _ in self._plan() if k == "wide")
        lines.append(f"total: {len(self.steps)} steps, "
                     f"{n_wide} exchange(s)")
        return "\n".join(lines)

    def execute(self, ds, batch_size: Optional[int] = None):
        """Run over a ray.data.Dataset; returns a Dataset (lazy).

        batch_size=None (default) feeds WHOLE BLOCKS to the fused kernel —
        the right granularity for vectorized Arrow work (Ray's 1024-row
        default exists for Python-heavy UDFs and costs ~2x here).
        """
        for kind, payload in self._plan():
            if kind == "narrow":
                steps, out_schema = payload
                fn = _FusedSteps(steps, out_schema.arrow())
                ds = ds.map_batches(fn, batch_format="pyarrow",
                                    batch_size=batch_size)
            else:
                step, in_schema = payload
                # hand the wide step its statically-propagated input
                # schema so it never calls ds.schema() — a schema fetch
                # on an unexecuted plan runs the WHOLE upstream (joins,
                # sorts) through a limit(1) probe
                step._in_schema_hint = in_schema
                ds = step.apply_dataset(ds)
        return ds

    def execute_table(self, table: pa.Table) -> pa.Table:
        """Single-process reference execution (the parity oracle)."""
        for s in self.steps:
            table = s.apply(table)
        return table

    # -- serde (parity: TransformProcess.java:404-481) -----------------------
    def to_dict(self) -> dict[str, Any]:
        return {"initial_schema": self.initial_schema.to_dict(),
                "steps": [s.to_dict() for s in self.steps]}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TransformPipeline":
        p = cls(Schema.from_dict(d["initial_schema"]))
        for sd in d["steps"]:
            step_cls = resolve("step", sd["cls"])
            p.add(step_cls.from_dict(sd))
        return p

    @classmethod
    def from_json(cls, s: str) -> "TransformPipeline":
        return cls.from_dict(json.loads(s))

    def to_yaml(self) -> str:
        """YAML serde — the reference serializes pipelines to JSON AND
        YAML (``TransformProcess.java:404-481``, ``serde/BaseSerializer``)."""
        import yaml
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    @classmethod
    def from_yaml(cls, s: str) -> "TransformPipeline":
        import yaml
        return cls.from_dict(yaml.safe_load(s))

    def __repr__(self) -> str:
        inner = ",\n  ".join(repr(s) for s in self.steps)
        return f"TransformPipeline(\n  {inner}\n)"
