"""Write-audit-publish (WAP) staged commits for the CDC lake.

The Iceberg/Delta "WAP" pattern the reference has no counterpart for
(nearest: DataVec's analysis/quality gate, `analysis/DataQualityAnalysis`,
which inspects data but cannot gate a commit): a producer replays new
binlog segments into an isolated STAGING area that shares the main
lake's partition layout and prior state, runs validation over the full
staged table state, and only then atomically promotes the staged files
into the reader-visible lake — or aborts, leaving the lake untouched.

Design (reuses the engine's own exactly-once machinery end to end):

- ``CdcIngestEngine.stage(name)`` creates ``<lake>/_stage_<name>/``
  holding a full inner engine. Its checkpoint chain is SEEDED with a
  hardlinked copy of the parent's last checkpoint + the matching
  manifest entry, so staged ``replay()`` merges prior state exactly as
  a direct replay would — but every file it writes lands under the
  staging dir. Readers of the main lake never see it.
- ``audit()`` runs suite-level rules (``datavec_ray.expect.expect``)
  over the staged merged state (``read_lake_dataset``) — the staged
  table is validated POST-merge, catching violations an ingest-time
  row gate cannot (e.g. aggregate row counts, uniqueness after LWW).
- ``publish()`` is optimistic-concurrency: it refuses if any
  state-mutating manifest entry landed on the parent since the stage
  was opened (the Iceberg snapshot-CAS equivalent). Promotion order
  makes a crash at ANY point recoverable: (1) per-partition atomic
  hardlink+rename of staged lake files, (2) hardlink staged checkpoint
  dirs, (3) append the staged checkpoint/commit entries plus one
  ``publish`` entry to the parent manifest — the durable commit point,
  (4) remove the staging dir. A rerun of ``publish()`` after a crash
  before (3) redoes idempotent file promotion; after (3) it only
  cleans up (the publish entry records the stage name).
- ``abort()`` removes the staging dir; nothing in the parent was ever
  mutated.

Scale shape: staging costs hardlinks (no data copy) + the staged
replay itself, which is the ordinary two-stage task exchange; publish
moves inodes and appends manifest lines — O(partitions), never O(rows).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional, Sequence

import pyarrow as pa


class StageConflictError(RuntimeError):
    """The parent lake advanced while this stage was open — publishing
    would overwrite commits the stage never saw. Re-stage on top of the
    new state (optimistic concurrency, Iceberg-style)."""


class StagedCommit:
    """One staged (write → audit → publish/abort) unit over a parent
    :class:`CdcIngestEngine`. Create via ``engine.stage(name)``."""

    _MUTATING = ("checkpoint", "commit", "compact", "optimize",
                 "repartition", "publish")

    def __init__(self, parent, name: str):
        from datavec_ray.cdc.engine import CdcIngestEngine
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in name)
        if not safe:
            raise ValueError("stage name must be non-empty")
        self.parent = parent
        self.name = safe
        self.dir = os.path.join(parent.lake_dir, f"_stage_{safe}")
        self._published = False
        self._audit_report: Optional[pa.Table] = None
        resuming = os.path.isdir(self.dir)
        # conflict baseline: every state-mutating entry present at open
        parent.manifest.reload()
        self._base_fingerprint = self._mutation_fingerprint(
            parent.manifest.entries)
        base_path = os.path.join(self.dir, "_base.json")
        if resuming:
            # crash-resume: the baseline must be the one the ORIGINAL
            # stage opened against, not the current manifest
            with open(base_path) as f:
                self._base_fingerprint = json.load(f)["fingerprint"]
        os.makedirs(self.dir, exist_ok=True)
        self.eng = CdcIngestEngine(
            self.dir, num_partitions=parent.num_partitions,
            salt_turns=parent.salt_turns,
            hot_convs=sorted(parent.hot_convs) if parent.hot_convs else None,
            ingest_mode=parent.ingest_mode,
            commit_mode=parent.commit_mode,
            expectations=parent.expectations,
            dlq=parent.dlq_dir is not None,
            fence_writer=False)
        if not resuming:
            self._seed_from_parent()
            with open(base_path, "w") as f:
                json.dump({"fingerprint": self._base_fingerprint,
                           "stage": safe}, f)

    # -- setup ------------------------------------------------------------
    @classmethod
    def _mutation_fingerprint(cls, entries: list[dict]) -> int:
        return sum(1 for e in entries if e.get("type") in cls._MUTATING)

    def _seed_from_parent(self) -> None:
        """Hardlink the parent's last checkpoint into the staging
        checkpoint chain and mirror its manifest entry, so staged
        replays merge the parent's prior state without copying bytes."""
        cp = self.parent.manifest.last_checkpoint()
        if not cp:
            return
        src = os.path.join(self.parent.ckpt_dir, cp["name"])
        dst = os.path.join(self.eng.ckpt_dir, cp["name"])
        _link_tree(src, dst)
        entry = dict(cp)
        entry["seeded_from_parent"] = True
        self.eng.manifest.append(entry)
        sch = cp.get("schema")
        if sch:
            import ray
            ray.get(self.eng.registry.evolve.remote(bytes.fromhex(sch)))

    # -- write ------------------------------------------------------------
    def replay(self, ds, checkpoint_name: Optional[str] = None, **kw):
        """Staged replay through the ordinary two-stage exchange; may be
        called repeatedly (multi-segment stages)."""
        self._check_open()
        n = checkpoint_name or f"{self.name}-replay"
        return self.eng.replay(ds, checkpoint_name=n, **kw)

    def read_staged(self):
        """Dataset view of the staged (merged base + staged) state."""
        return self.eng.read_lake_dataset()

    # -- audit ------------------------------------------------------------
    def audit(self, rules: Sequence[dict]) -> pa.Table:
        """Run suite-level expectation rules over the FULL staged table
        state (one aggregate pass). Returns the per-rule report table
        (``passed`` column); publish(require_audit=True) consumes it."""
        from datavec_ray.expect import expect
        self._check_open()
        self._audit_report = expect(self.read_staged(), rules)
        return self._audit_report

    @property
    def audit_passed(self) -> Optional[bool]:
        if self._audit_report is None:
            return None
        import pyarrow.compute as pc
        return bool(pc.all(self._audit_report["passed"]).as_py())

    # -- publish / abort ---------------------------------------------------
    def publish(self, require_audit: bool = False) -> dict:
        """Atomically promote the staged lake files, checkpoints and
        manifest entries into the parent. See module docstring for the
        crash-ordering argument. Returns the publish manifest entry."""
        if self._published:
            raise RuntimeError(f"stage {self.name!r} already published")
        if require_audit and not self.audit_passed:
            raise RuntimeError(
                f"stage {self.name!r}: audit "
                f"{'failed' if self._audit_report is not None else 'not run'}"
                " — publish(require_audit=True) refused")
        self.parent.manifest.reload()
        already = [e for e in self.parent.manifest.entries
                   if e.get("type") == "publish"
                   and e.get("stage") == self.name]
        if already:
            # crash between manifest publish and cleanup: finish cleanup
            self._cleanup()
            self._published = True
            return already[-1]
        now = self._mutation_fingerprint(self.parent.manifest.entries)
        if now != self._base_fingerprint:
            raise StageConflictError(
                f"stage {self.name!r}: parent lake advanced "
                f"({now - self._base_fingerprint} new commits) since the "
                "stage opened — abort and re-stage")
        # (1) promote lake data files (atomic per file: link tmp + rename)
        promoted = 0
        for f in sorted(os.listdir(self.dir)):
            if not f.endswith(".parquet") or not f.startswith("part-"):
                continue
            src = os.path.join(self.dir, f)
            dst = os.path.join(self.parent.lake_dir, f)
            if os.path.exists(dst) and os.path.samefile(src, dst):
                continue  # hardlink-seeded segment, unchanged
            _atomic_link(src, dst)
            promoted += 1
        # (2) promote staged checkpoints (skip the parent-seeded one)
        seeded = {e["name"] for e in self.eng.manifest.entries
                  if e.get("seeded_from_parent")}
        staged_cps = [e for e in self.eng.manifest.entries
                      if e.get("type") == "checkpoint"
                      and e["name"] not in seeded]
        for e in staged_cps:
            _link_tree(os.path.join(self.eng.ckpt_dir, e["name"]),
                       os.path.join(self.parent.ckpt_dir, e["name"]))
        # promote staged DLQ quarantine files, if any
        if self.eng.dlq_dir and os.path.isdir(self.eng.dlq_dir) \
                and self.parent.dlq_dir:
            os.makedirs(self.parent.dlq_dir, exist_ok=True)
            for f in os.listdir(self.eng.dlq_dir):
                _atomic_link(os.path.join(self.eng.dlq_dir, f),
                             os.path.join(self.parent.dlq_dir, f))
        # (3) manifest: staged checkpoint/commit entries, then the
        # publish marker — the durable commit point
        for e in self.eng.manifest.entries:
            if e.get("seeded_from_parent"):
                continue
            if e.get("type") in ("checkpoint", "commit", "compact"):
                self.parent._fenced_append(dict(e))
        sch = staged_cps[-1].get("schema") if staged_cps else None
        if sch:
            import ray
            evolved = ray.get(self.parent.registry.evolve.remote(
                bytes.fromhex(sch)))
            self.parent._canonical = pa.ipc.read_schema(
                pa.BufferReader(evolved))
        entry = {"type": "publish", "stage": self.name,
                 "files": promoted, "checkpoints": len(staged_cps),
                 "lsn_hi": self.eng.manifest.watermark(),
                 "audit_passed": self.audit_passed}
        self.parent._fenced_append(entry)
        self.parent.events_seen += self.eng.events_seen
        # (4) cleanup
        self._cleanup()
        self._published = True
        return entry

    def abort(self) -> None:
        """Discard the stage — the parent lake was never touched."""
        self._cleanup()
        self._published = True  # stage is closed either way

    def _cleanup(self) -> None:
        self.eng.shutdown()
        shutil.rmtree(self.dir, ignore_errors=True)

    def _check_open(self) -> None:
        if self._published:
            raise RuntimeError(f"stage {self.name!r} is closed")


def _atomic_link(src: str, dst: str) -> None:
    """Atomically make dst refer to src's inode (hardlink tmp + rename;
    copy fallback for cross-device)."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = f"{dst}.tmp.{os.getpid()}"
    try:
        if os.path.exists(tmp):
            os.remove(tmp)
        os.link(src, tmp)
    except OSError:
        shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


def _link_tree(src: str, dst: str) -> None:
    """Hardlink every file of a (flat) checkpoint dir; idempotent."""
    if not os.path.isdir(src):
        return
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        s, d = os.path.join(src, f), os.path.join(dst, f)
        if os.path.exists(d):
            continue
        try:
            os.link(s, d)
        except OSError:
            shutil.copyfile(s, d)
