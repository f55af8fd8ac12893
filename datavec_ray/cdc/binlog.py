"""Deterministic synthetic binlog of transcript change events.

The input-table shape is fixed by the task brief (BASELINE.json
``input_hint``): conversation transcripts with columns
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[ms]) wrapped in a CDC envelope (lsn:int64 monotonic unique,
op ∈ {"I","U","D"}). Everything here is a pure function of (seed, sizes)
— no wall clock, no external data (FIXTURES.md §1-2).

Generator properties exercised by the tests:
- conversation lengths Zipf-like → a few hot conversations (salting);
- updates/deletes reference existing (conv_id, turn_idx) keys;
- out-of-ts-order updates and same-ts conflicts (LSN tiebreak);
- ~70/25/5 I/U/D mix; delete events carry null payload;
- optional schema-evolution variant: events before `evolve_at_lsn`
  LACK the `tool` column (additive evolution) and carry int32 turn_idx
  (widening int32→int64 downstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("ms")),
])

BINLOG_SCHEMA = pa.schema([("lsn", pa.int64()), ("op", pa.string())]
                          + list(TRANSCRIPT_SCHEMA))

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["", "", "", "", "search", "calculator", "browser", "python"])
_WORDS = np.array([
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "naïve", "café", "日本語", "emoji🙂", "", "  padded  ",
])

BASE_EPOCH_MS = 1_700_000_000_000  # fixed, deterministic


def _conv_lengths(num_convs: int, mean_turns: int, rng: np.random.Generator) -> np.ndarray:
    """Zipf-ish lengths: most conversations short, a few very hot."""
    raw = rng.zipf(1.7, size=num_convs)
    lengths = np.clip(raw * max(1, mean_turns // 2), 1, mean_turns * 60)
    return lengths.astype(np.int64)


def synth_binlog(num_events: int, num_convs: int = 0, seed: int = 42,
                 mean_turns: int = 8, update_frac: float = 0.25,
                 delete_frac: float = 0.05) -> pa.Table:
    """Generate a change-event table, ordered by strictly-monotonic lsn."""
    rng = np.random.default_rng(seed)
    target_base = max(1, int(num_events * (1.0 - update_frac - delete_frac)))
    if num_convs <= 0:
        num_convs = max(1, target_base // mean_turns)
    lengths = _conv_lengths(num_convs, mean_turns, rng)
    # trim conversations so base inserts ≈ target_base (the rest of the
    # event budget becomes updates/deletes referencing existing keys)
    csum = np.cumsum(lengths)
    # an explicit num_convs may not cover target_base — keep all convs then
    cut = min(int(np.searchsorted(csum, target_base)) + 1, len(lengths))
    lengths = lengths[:cut]
    if csum[cut - 1] > target_base:
        lengths = lengths.copy()
        lengths[-1] -= csum[cut - 1] - target_base
    num_convs = len(lengths)

    # Base inserts: every (conv, turn) key appears as an insert exactly once.
    conv_idx = np.repeat(np.arange(num_convs), lengths)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if num_convs else np.array([], np.int64)
    turn_idx = np.arange(int(lengths.sum())) - np.repeat(starts, lengths)
    n_base = len(conv_idx)

    n_extra = max(0, num_events - n_base)
    if n_extra:
        # updates/deletes reference existing keys (biased to hot convs by
        # sampling positions uniformly from the key population)
        pick = rng.integers(0, n_base, size=n_extra)
        e_conv = conv_idx[pick]
        e_turn = turn_idx[pick]
        p_del = delete_frac / (update_frac + delete_frac) if (update_frac + delete_frac) else 0
        is_del = rng.random(n_extra) < p_del
        conv_idx = np.concatenate([conv_idx, e_conv])
        turn_idx = np.concatenate([turn_idx, e_turn])
        op = np.concatenate([np.full(n_base, "I"), np.where(is_del, "D", "U")])
    else:
        conv_idx = conv_idx[:num_events]
        turn_idx = turn_idx[:num_events]
        op = np.full(len(conv_idx), "I")

    n = len(conv_idx)
    # interleave events: inserts roughly in conv order, updates after, then
    # shuffle a bounded window so updates can arrive out of ts order
    order = rng.permutation(n)
    conv_idx, turn_idx, op = conv_idx[order], turn_idx[order], op[order]

    lsn = np.arange(1, n + 1, dtype=np.int64)
    # ts: base + per-conv offset + per-turn increment + jitter; some exact
    # duplicates on the same key to force the LSN tiebreak
    ts = (BASE_EPOCH_MS + conv_idx.astype(np.int64) * 60_000
          + turn_idx.astype(np.int64) * 1_000
          + rng.integers(0, 3, size=n) * 500)
    is_update = op != "I"
    # half of the updates get an OLDER ts than base (out-of-order arrival →
    # LWW must ignore them); the rest newer
    older = is_update & (rng.random(n) < 0.5)
    ts = np.where(older, ts - 750, ts + is_update.astype(np.int64) * 250)

    import pyarrow.compute as pc

    role = _ROLES[turn_idx % 2 + (rng.random(n) < 0.05) * 2]
    w1_i = rng.integers(0, len(_WORDS), n)
    w2_i = rng.integers(0, len(_WORDS), n)
    tool_i = rng.integers(0, len(_TOOLS), n)
    # string assembly with Arrow kernels — 12M+ rows in seconds, no
    # per-row Python and no slow numpy-unicode ops. Assembled in slices
    # of <=16M rows: a single text array would overflow 32-bit utf8
    # offsets (2 GiB) around ~50M rows.
    text_chunks, conv_chunks, tool_chunks = [], [], []
    STEP = 16_000_000
    for lo in range(0, n, STEP):
        hi = min(n, lo + STEP)
        conv_s = pc.cast(pa.array(conv_idx[lo:hi]), pa.string())
        turn_s = pc.cast(pa.array(turn_idx[lo:hi]), pa.string())
        lsn_s = pc.cast(pa.array(lsn[lo:hi]), pa.string())
        text_chunks.append(pc.binary_join_element_wise(
            pa.array(_WORDS[w1_i[lo:hi]], pa.string()),
            pa.array(_WORDS[w2_i[lo:hi]], pa.string()),
            pc.binary_join_element_wise("c", conv_s, ""),
            pc.binary_join_element_wise("t", turn_s, ""),
            pc.binary_join_element_wise("v", lsn_s, ""),
            " "))
        conv_chunks.append(pc.binary_join_element_wise(
            "conv-", pc.utf8_lpad(conv_s, 8, "0"), ""))
        tool_chunks.append(pa.array(_TOOLS[tool_i[lo:hi]], pa.string()))
    text = pa.chunked_array(text_chunks)
    conv = pa.chunked_array(conv_chunks)
    tool = pa.chunked_array(tool_chunks)

    not_d = pa.array(op != "D")
    null_s = pa.scalar(None, pa.string())
    return pa.table({
        "lsn": pa.array(lsn),
        "op": pa.array(op, type=pa.string()),
        "conv_id": conv,
        "turn_idx": pa.array(turn_idx.astype(np.int32)),
        "role": pc.if_else(not_d, pa.array(role, pa.string()), null_s),
        "text": pc.if_else(not_d, text, null_s),
        "tool": pc.if_else(not_d, tool, null_s),
        "ts": pa.array(ts).cast(pa.timestamp("ms")),
    }, schema=BINLOG_SCHEMA)


def split_segments(binlog: pa.Table, num_segments: int) -> list[pa.Table]:
    """Split a binlog into contiguous LSN segments (crash/resume tests)."""
    n = binlog.num_rows
    bounds = np.linspace(0, n, num_segments + 1).astype(int)
    return [binlog.slice(a, b - a) for a, b in zip(bounds[:-1], bounds[1:])]


def strip_tool_column(binlog: pa.Table) -> pa.Table:
    """Schema-evolution variant: the early segment lacks `tool` entirely."""
    return binlog.drop_columns(["tool"])


def binlog_from_events(events: pa.Table) -> pa.Table:
    """Deterministically derive a transcript binlog from the driver's
    ``events`` test table (event_id, ts, user_id, event_type, value, props)
    — a pure vectorized map, so the CDC pipeline over it is expressible in
    oracle SQL on the same parquet (driver correctness gate).

    Mapping: lsn=event_id; op from event_type ('click'→'U', 'purchase'→'D',
    else 'I'); conv_id = 'conv-' || user_id; turn_idx = event_id % 16;
    role by turn parity; text = props; tool = event_type; ts passes through.
    """
    import pyarrow.compute as pc
    lsn = events["event_id"]
    et = events["event_type"]
    op = pc.if_else(pc.equal(et, "click"), "U",
                    pc.if_else(pc.equal(et, "purchase"), "D", "I"))
    conv = pc.binary_join_element_wise(
        "conv-", pc.cast(events["user_id"], pa.string()), "")
    turn = pc.cast(pc.subtract(lsn, pc.multiply(pc.divide(lsn, 16), 16)),
                   pa.int32())
    role = pc.if_else(pc.equal(pc.subtract(turn, pc.multiply(pc.divide(turn, 2), 2)),
                               pa.scalar(0, pa.int32())), "user", "assistant")
    is_d = pc.equal(op, "D")
    text = pc.if_else(is_d, pa.scalar(None, pa.string()),
                      pc.cast(events["props"], pa.string()))
    tool = pc.if_else(is_d, pa.scalar(None, pa.string()),
                      pc.cast(et, pa.string()))
    role = pc.if_else(is_d, pa.scalar(None, pa.string()), role)
    return pa.table({
        "lsn": pc.cast(lsn, pa.int64()),
        "op": op,
        "conv_id": conv,
        "turn_idx": turn,
        "role": role,
        "text": text,
        "tool": tool,
        # truncate us→ms (oracle SQL side uses date_trunc('milliseconds', ts))
        "ts": pc.cast(events["ts"], pa.timestamp("ms"), safe=False),
    }, schema=BINLOG_SCHEMA)


def scd2_history(ds, keys=("conv_id", "turn_idx"), order_col: str = "lsn",
                 op_col: str = "op", num_partitions: int = 32):
    """Slowly-Changing-Dimension Type-2 view of a binlog: every I/U
    event becomes a VERSION row with ``valid_from`` = its LSN and
    ``valid_to`` = the next event's LSN for the same key (any op,
    deletes included — a D closes the last version without opening a
    new one); the current version has ``valid_to`` null. The full
    audit-history companion to the LWW live state (SQL: ``lead(lsn)
    OVER (PARTITION BY key ORDER BY lsn)`` then filter op <> 'D').

    Shape: ONE hash-partition shuffle on the key; per partition one
    sort + a shifted-array next-LSN scan over all keys at once.
    """
    from datavec_ray.misc import (_GPART, _group_partition,
                                  _key_run_starts)
    from datavec_ray.steps.base import combine

    keys = list(keys)

    def hist(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys]
            + [(order_col, "ascending")])
        n = g.num_rows
        if n == 0:
            return g.append_column(
                pa.field("valid_to", pa.int64()),
                pa.array([], pa.int64())).rename_columns(
                [c if c != order_col else "valid_from"
                 for c in g.column_names] + ["valid_to"])
        lsn = combine(g[order_col]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        last_of_key = np.empty(n, dtype=bool)
        last_of_key[:-1] = _key_run_starts(g, keys)[1:]
        last_of_key[-1] = True
        nxt = np.empty(n, dtype=np.float64)
        nxt[:-1] = lsn[1:]
        nxt[-1] = np.nan
        nxt[last_of_key] = np.nan
        out = g.rename_columns(
            [c if c != order_col else "valid_from"
             for c in g.column_names])
        out = out.append_column(pa.field("valid_to", pa.int64()),
                                pa.array(nxt, pa.int64(),
                                         from_pandas=True))
        return out.filter(pc.not_equal(out[op_col], "D"))

    hist.__name__ = "scd2_history"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(hist, batch_format="pyarrow")


def patch_upsert(ds, keys=("conv_id", "turn_idx"),
                 order_cols=("ts", "lsn"), op_col: str = "op",
                 payload_cols=("role", "text", "tool"),
                 ts_col: str = "ts", num_partitions: int = 32):
    """Debezium-style PARTIAL-update replay: an update's null payload
    column means "unchanged" (a patch), not "set to null". Final state
    per key = the events after its last delete, with each payload
    column taking its LAST NON-NULL value in ``order_cols`` order; a
    key whose last event is a delete is absent. This is the
    complementary merge semantic to the engine's full-image LWW
    (``lww_compact_table``): sources that ship sparse column patches
    (JDBC CDC, API diffs) replay correctly without re-reading old rows.

    Shape: ONE key shuffle; per partition one sort, a segmented
    last-delete scan, per payload column one ``maximum.accumulate``
    donor pass (the ffill kernel), and a take of each key's last row.
    """
    from datavec_ray.misc import (_GPART, _group_partition,
                                  _key_run_starts)
    from datavec_ray.steps.base import combine

    keys = list(keys)
    order_cols = list(order_cols)
    payload_cols = list(payload_cols)

    def patch(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in keys + order_cols])
        n = g.num_rows
        if n == 0:
            return g.drop_columns([op_col])
        idx = np.arange(n, dtype=np.int64)
        starts_mask = _key_run_starts(g, keys)
        seg_starts = np.flatnonzero(starts_mask)
        lens = np.diff(np.append(seg_starts, n))
        seg_lo = np.repeat(seg_starts, lens)
        is_d = pc.equal(combine(g[op_col]), "D") \
            .to_numpy(zero_copy_only=False)
        last_d = np.maximum.reduceat(np.where(is_d, idx, -1), seg_starts)
        keep = (idx > np.repeat(last_d, lens)) & ~is_d
        kept = g.filter(pa.array(keep))
        m = kept.num_rows
        if m == 0:
            return g.slice(0, 0).drop_columns([op_col])
        k_starts_mask = _key_run_starts(kept, keys)
        k_starts = np.flatnonzero(k_starts_mask)
        k_lens = np.diff(np.append(k_starts, m))
        k_lo = np.repeat(k_starts, k_lens)
        kidx = np.arange(m, dtype=np.int64)
        cols = {}
        for c in keys + order_cols:
            if c not in cols:
                cols[c] = combine(kept[c])
        for c in payload_cols:
            arr = combine(kept[c])
            valid = ~pc.is_null(arr).to_numpy(zero_copy_only=False)
            lv = np.maximum.accumulate(np.where(valid, kidx, -1))
            ok = lv >= k_lo
            filled = arr.take(pa.array(np.where(ok, lv, 0)))
            cols[c] = pc.if_else(pa.array(ok), filled,
                                 pa.scalar(None, arr.type))
        ends = pa.array(k_starts + k_lens - 1, pa.int64())
        out_cols = {c: (cols[c].take(ends) if isinstance(cols[c], pa.Array)
                        else cols[c].combine_chunks().take(ends))
                    for c in keys + order_cols + payload_cols}
        return pa.table(out_cols)

    patch.__name__ = "patch_upsert"
    return _group_partition(ds, keys, num_partitions) \
        .groupby(_GPART).map_groups(patch, batch_format="pyarrow")


def edit_pairs(ds, keys=("conv_id", "turn_idx"), order_cols=("ts", "lsn"),
               op_col: str = "op", text_col: str = "text",
               extra_cols=("role",), num_partitions: int = 32):
    """Consecutive VERSION PAIRS per key from a change stream: for each
    (conv_id, turn_idx), order its non-delete events by ``order_cols``
    (the LWW application order — value ts, monotonic-LSN tiebreak) and
    emit one row per adjacent (previous, current) version. This is the
    edit-history-mining primitive of a transcript CDC lake: every
    assistant-turn revision becomes an (old draft → new draft) example
    for revision/preference training, with both timestamps kept so
    downstream can filter by edit latency.

    SQL mirror: ``LAG(text/ts/lsn) OVER (PARTITION BY key ORDER BY
    ts, lsn)`` over ``op <> 'D'`` rows, keeping rows whose LAG exists.

    Shape: tombstones and unused payload columns are dropped MAP-SIDE
    (before any exchange — deletes carry null payloads and can never
    pair), then ONE hash-partition shuffle on the key; per partition a
    single lexsort + shifted-array pairing resolves every key at once
    (no per-key Python, no per-key map_groups).
    """
    from datavec_ray.misc import (_GPART, _group_partition,
                                  _key_run_starts)
    from datavec_ray.steps.base import combine

    keys = list(keys)
    order_cols = list(order_cols)
    extra_cols = [c for c in extra_cols if c]
    need = keys + order_cols + [text_col] + extra_cols

    def prune(batch: pa.Table) -> pa.Table:
        live = batch.filter(
            pc.fill_null(pc.not_equal(batch[op_col], "D"), True))
        return live.select(need)

    def pair(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(k, "ascending") for k in keys]
            + [(c, "ascending") for c in order_cols])
        n = g.num_rows
        first = _key_run_starts(g, keys) if n else \
            np.ones(0, dtype=bool)
        cur = np.flatnonzero(~first)          # rows with a predecessor
        prev = cur - 1
        cur_i = pa.array(cur, pa.int64())
        prev_i = pa.array(prev, pa.int64())
        ts_c, lsn_c = order_cols[0], order_cols[-1]
        ts_ms = combine(g[ts_c]).cast(pa.int64()) if n else \
            pa.chunked_array([], pa.int64())
        cols: dict = {k: g[k].take(cur_i) for k in keys}
        for c in extra_cols:
            cols[f"prev_{c}"] = g[c].take(prev_i)
            cols[c] = g[c].take(cur_i)
        cols[f"prev_{text_col}"] = g[text_col].take(prev_i)
        cols[text_col] = g[text_col].take(cur_i)
        cols["prev_ts_ms"] = ts_ms.take(prev_i)
        cols["ts_ms"] = ts_ms.take(cur_i)
        cols[lsn_c] = g[lsn_c].take(cur_i)
        return pa.table(cols)

    pair.__name__ = "edit_pairs"
    live = ds.map_batches(prune, batch_format="pyarrow")
    return _group_partition(live, keys, num_partitions) \
        .groupby(_GPART).map_groups(pair, batch_format="pyarrow")


def preference_pairs(ds, keys=("conv_id", "turn_idx"),
                     order_cols=("ts", "lsn"), op_col: str = "op",
                     text_col: str = "text", role_col: str = "role",
                     num_partitions: int = 32):
    """(rejected → chosen) PREFERENCE pairs from the edit history: every
    key with >= 2 non-delete versions emits one row pairing its FIRST
    draft (rejected) with its final LWW winner (chosen) — the raw
    material for preference/DPO-style training mined straight from a
    transcript change stream. Versions order by ``order_cols`` (value
    ts, monotonic-LSN tiebreak), the same order replay applies them.

    SQL mirror: first_value/last_value over (PARTITION BY key ORDER BY
    ts, lsn ROWS UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) on
    ``op <> 'D'`` rows, QUALIFY count(*) OVER key >= 2.

    Shape: tombstones and unused columns drop MAP-SIDE, then ONE
    key-hash exchange; per partition a single lexsort + run-boundary
    scan pairs every key at once (first index gathered for the
    rejected columns, last index for the chosen ones) — no per-key
    Python, no window materialization.
    """
    from datavec_ray.misc import _GPART, _group_partition, _key_run_starts
    from datavec_ray.steps.base import combine

    keys = list(keys)
    order_cols = list(order_cols)
    need = keys + order_cols + [role_col, text_col]

    def prune(batch: pa.Table) -> pa.Table:
        live = batch.filter(
            pc.fill_null(pc.not_equal(batch[op_col], "D"), True))
        return live.select(need)

    def pair(group: pa.Table) -> pa.Table:
        g = group.drop_columns([_GPART]).sort_by(
            [(c, "ascending") for c in keys + order_cols])
        n = g.num_rows
        first = _key_run_starts(g, keys) if n else np.ones(0, bool)
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n) - 1      # last row of each run
        multi = ends > starts                    # >= 2 versions
        lo = pa.array(starts[multi], pa.int64())
        hi = pa.array(ends[multi], pa.int64())
        lsn_c = order_cols[-1]
        cols: dict = {k: g[k].take(hi) for k in keys}
        cols[role_col] = g[role_col].take(hi)
        cols["rejected"] = g[text_col].take(lo)
        cols["chosen"] = g[text_col].take(hi)
        cols["n_versions"] = pa.array(ends[multi] - starts[multi] + 1,
                                      pa.int64())
        cols[lsn_c] = g[lsn_c].take(hi)
        return pa.table(cols)

    pair.__name__ = "preference_pairs"
    live = ds.map_batches(prune, batch_format="pyarrow")
    return _group_partition(live, keys, num_partitions) \
        .groupby(_GPART).map_groups(pair, batch_format="pyarrow")
