"""Event-stream operators: tumbling windows, sessionization, as-of join.

The reference is a batch index library with no streaming features
(`/root/reference/README.md:25,30` — immutable, bulk-load only), but a
large-scale training-data engine needs time-ordered operators.  All three
are expressed Ray-Data-first:

- ``tumbling_window``: partial aggregation inside ``map_batches`` (combiner)
  followed by one small ``groupby`` over (window, type) — the classic
  pre-aggregate-before-shuffle pattern; the shuffle moves only the
  per-batch partials, never the events.
- ``sessionize`` / ``asof_join``: one hash shuffle on the entity key
  (``groupby(user_id).map_groups``), then vectorized numpy (sort +
  searchsorted) within each group.  The only all-to-all is the single
  key exchange; group payloads are the lean projected columns only.

Timestamps are carried as int64 epoch-microseconds (zero-copy from Arrow
``timestamp[us]``) so every output column hash-compares exactly against
the DuckDB oracle (no float accumulation order issues).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp column → int64 epoch microseconds (zero-copy for
    timestamp[us] input; ns/ms/s units are normalized first)."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        # safe=False: ns → us truncates sub-microsecond digits
        col = pc.cast(col, pa.timestamp("us", tz=t.tz), safe=False)
    return pc.cast(col, pa.int64()).to_numpy()


def tumbling_window(ds, window_us: int, key_col: str = "event_type",
                    ts_col: str = "ts", value_col: str = "value"):
    """Per-(window, key) tumbling-window aggregate.

    Returns (window_id, key, n_events, min_value, max_value) where
    ``window_id = epoch_us // window_us``.  min/max are order-independent
    so results are bit-exact under any partitioning.
    """

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        wid = _ts_us(batch[ts_col]) // window_us
        t = pa.table(
            {
                "window_id": pa.array(wid),
                key_col: batch[key_col],
                "v": batch[value_col],
            }
        )
        g = t.group_by(["window_id", key_col]).aggregate(
            [
                ("v", "count", pc.CountOptions(mode="all")),
                ("v", "min"), ("v", "max"),
            ]
        )
        g = g.rename_columns(
            ["window_id", key_col, "n_events", "min_value", "max_value"]
        )
        return g.append_column(
            "rkey", pa.array(g["window_id"].to_numpy() % np.int64(R))
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    # coarse-keyed merge: one Arrow hash-aggregate per reducer instead
    # of one Python call per (window, key) group — and no pandas dtype
    # round-trip
    def merge_many(g: pa.Table) -> pa.Table:
        out = g.group_by(["window_id", key_col]).aggregate(
            [("n_events", "sum"), ("min_value", "min"), ("max_value", "max")]
        )
        out = out.rename_columns(
            ["window_id", key_col, "n_events", "min_value", "max_value"]
        )
        return out.set_column(
            2, "n_events", pc.cast(out["n_events"], pa.int64())
        )

    return partials.groupby("rkey").map_groups(merge_many, batch_format="pyarrow")


def sessionize(ds, gap_us: int, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_us``.

    Returns one row per session:
    (user_id, session_seq, n_events, start_us, end_us) — all int64.
    """

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def project(batch: pa.Table) -> pa.Table:
        uid = batch[user_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "rkey": pa.array(
                    (uid.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                     % np.uint64(R)).astype(np.int64)
                ),
                user_col: batch[user_col],
                "tus": pa.array(_ts_us(batch[ts_col])),
                id_col: batch[id_col],
            }
        )

    lean = coalesce_for_shuffle(
        ds.map_batches(project, batch_format="pyarrow"), 0.25
    )

    # coarse-keyed reduce: ALL of a reducer's users sessionize in one
    # vectorized pass (lexsort by (user, ts) + run-length session cuts) —
    # no per-user Python, so millions of users cost what thousands do
    def sessionize_reducer(g: pa.Table) -> pa.Table:
        uid = g[user_col].to_numpy().astype(np.int64)
        tus = g["tus"].to_numpy()
        eid = g[id_col].to_numpy()
        order = np.lexsort((eid, tus, uid))
        u = uid[order]
        t = tus[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[True, (t[1:] - t[:-1]) > gap_us]
        is_new = (new_user | gap).astype(np.int64)
        starts = np.nonzero(is_new)[0]
        ends = np.r_[starts[1:], len(u)] - 1
        # session_seq within user: global session ordinal minus the user's
        # first session ordinal + 1
        sess_ord = np.arange(len(starts), dtype=np.int64)
        user_first = np.nonzero(new_user[starts])[0]
        first_of_user = np.repeat(
            sess_ord[user_first], np.diff(np.r_[user_first, len(starts)])
        )
        return pa.table(
            {
                user_col: pa.array(u[starts]),
                "session_seq": pa.array(sess_ord - first_of_user + 1),
                "n_events": pa.array(ends - starts + 1),
                "start_us": pa.array(t[starts]),
                "end_us": pa.array(t[ends]),
            }
        )

    return lean.groupby("rkey").map_groups(sessionize_reducer, batch_format="pyarrow")


def asof_join(left_ds, right_ds, key_col: str = "user_id", ts_col: str = "ts",
              left_id: str = "left_id", right_id: str = "right_id",
              direction: str = "backward"):
    """As-of join: for each left row, the right row with the greatest
    ``ts <= left.ts`` sharing ``key_col`` (inner — unmatched left rows are
    dropped), matching DuckDB ``ASOF JOIN … ON l.key = r.key AND l.ts >= r.ts``.

    ``direction="forward"`` mirrors it: the right row with the SMALLEST
    ``ts >= left.ts`` (the next-event lookup — time-to-conversion
    features), right-side ties at equal ts broken by smallest right id
    (``ROW_NUMBER() OVER (… ORDER BY r.ts, r.id) = 1`` semantics).

    Single hash shuffle on the key (tagged union → ``groupby(key)``), then
    per-key sorted ``searchsorted`` — no sort-merge over the full stream.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def tag(ds, side: int, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[key_col].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "rkey": pa.array(
                        (key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         % np.uint64(R)).astype(np.int64)
                    ),
                    key_col: batch[key_col],
                    "tus": pa.array(_ts_us(batch[ts_col])),
                    "rid": batch[id_col],
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    unioned = coalesce_for_shuffle(tag(left_ds, 1, left_id), 0.25).union(
        coalesce_for_shuffle(tag(right_ds, 0, right_id), 0.25)
    )

    _empty = pa.table(
        {left_id: pa.array([], pa.int64()), right_id: pa.array([], pa.int64())}
    )

    # coarse-keyed merge-based as-of: one lexsort by (key, ts, side) per
    # reducer, rights before lefts at equal ts; each left row's match is
    # the latest right position at or before it, tracked with one global
    # cummax and invalidated across key boundaries — no per-key Python.
    def asof_reducer(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy().astype(np.int64)
        tus = g["tus"].to_numpy()
        rid = g["rid"].to_numpy()
        side = g["side"].to_numpy()  # right=0, left=1
        lmask = side == 1
        if not lmask.any() or lmask.all():
            return _empty
        # sort by (key, ts, side, rid): rights (side 0) before lefts at
        # equal ts; rid last so tie order never depends on shuffle order
        order = np.lexsort((rid, side, tus, key))
        k_s = key[order]
        s_s = side[order]
        r_s = rid[order]
        pos = np.arange(len(order))
        last_right = np.maximum.accumulate(np.where(s_s == 0, pos, -1))
        is_left = s_s == 1
        lr = last_right[is_left]
        valid = (lr >= 0) & (k_s[np.maximum(lr, 0)] == k_s[is_left])
        return pa.table(
            {
                left_id: pa.array(r_s[is_left][valid].astype(np.int64)),
                right_id: pa.array(r_s[np.maximum(lr, 0)][valid].astype(np.int64)),
            }
        )

    # forward mirror: lefts BEFORE rights at equal ts (an equal-ts right
    # matches), each left's match is the next right position at/after it
    # via one reversed cummin; rid ascending in the sort keeps equal-ts
    # right ties at the smallest id — no per-key Python.
    def asof_forward_reducer(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy().astype(np.int64)
        tus = g["tus"].to_numpy()
        rid = g["rid"].to_numpy()
        side = g["side"].to_numpy()  # right=0, left=1
        lmask = side == 1
        if not lmask.any() or lmask.all():
            return _empty
        order = np.lexsort((rid, 1 - side, tus, key))
        k_s = key[order]
        s_s = side[order]
        r_s = rid[order]
        n = len(order)
        pos = np.arange(n)
        rp = np.where(s_s == 0, pos, n)
        next_right = np.minimum.accumulate(rp[::-1])[::-1]
        is_left = s_s == 1
        nr = next_right[is_left]
        safe = np.minimum(nr, n - 1)
        valid = (nr < n) & (k_s[safe] == k_s[is_left])
        return pa.table(
            {
                left_id: pa.array(r_s[is_left][valid].astype(np.int64)),
                right_id: pa.array(r_s[safe][valid].astype(np.int64)),
            }
        )

    reducer = asof_reducer if direction == "backward" else asof_forward_reducer
    return unioned.groupby("rkey").map_groups(reducer, batch_format="pyarrow")


def window_count_join(left_ds, right_ds, window_us: int,
                      key_col: str = "user_id", ts_col: str = "ts",
                      left_id: str = "left_id", count_name: str = "n_right"):
    """Windowed interval join: for each left (anchor) row, the COUNT of
    right rows sharing ``key_col`` with ``ts`` in
    ``(anchor.ts - window_us, anchor.ts]`` — left-join semantics (anchors
    with zero matches emit 0).

    Same single-shuffle shape as :func:`asof_join` (tagged union →
    coarse-key groupby).  The reducer evaluates the prefix function
    F(k, t) = #rights with (key, tus) ≤ (k, t) at both window bounds via
    ONE lexsort of rights + both query points — rights at equal (key, ts)
    sort before queries, making both bounds inclusive, so the difference
    is exactly the half-open window (t-w, t].  No per-key Python.
    """

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def tag(ds, side: int, id_col: str | None):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[key_col].to_numpy().astype(np.int64)
            rid = (
                batch[id_col]
                if id_col is not None
                # right-side rows are only counted, never identified
                else pa.array(np.zeros(batch.num_rows, dtype=np.int64))
            )
            return pa.table(
                {
                    "rkey": pa.array(
                        (key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         % np.uint64(R)).astype(np.int64)
                    ),
                    key_col: batch[key_col],
                    "tus": pa.array(_ts_us(batch[ts_col])),
                    "rid": rid,
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    unioned = coalesce_for_shuffle(tag(left_ds, 1, left_id), 0.25).union(
        coalesce_for_shuffle(tag(right_ds, 0, None), 0.25)
    )

    _empty = pa.table(
        {left_id: pa.array([], pa.int64()), count_name: pa.array([], pa.int64())}
    )

    def window_reducer(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy().astype(np.int64)
        tus = g["tus"].to_numpy()
        rid = g["rid"].to_numpy()
        side = g["side"].to_numpy()  # right=0, left=1
        lmask = side == 1
        if not lmask.any():
            return _empty
        lk, lt, lid = key[lmask], tus[lmask], rid[lmask]
        rk, rt = key[~lmask], tus[~lmask]
        nq = len(lk)
        # merged stream: rights (kind 0), then each anchor contributes a
        # query at t (hi bound) and at t - w (lo bound), both inclusive
        mk = np.concatenate([rk, lk, lk])
        mt = np.concatenate([rt, lt, lt - window_us])
        kind = np.concatenate(
            [np.zeros(len(rk), np.int8), np.ones(2 * nq, np.int8)]
        )
        order = np.lexsort((kind, mt, mk))
        prefix = np.cumsum(kind[order] == 0)
        fvals = np.empty(len(order), dtype=np.int64)
        fvals[order] = prefix
        f_hi = fvals[len(rk) : len(rk) + nq]
        f_lo = fvals[len(rk) + nq :]
        # the difference cancels every key ≠ anchor key (both bounds carry
        # the same key), leaving #rights with key==k and t-w < tus <= t
        return pa.table(
            {
                left_id: pa.array(lid.astype(np.int64)),
                count_name: pa.array(f_hi - f_lo),
            }
        )

    return unioned.groupby("rkey").map_groups(window_reducer, batch_format="pyarrow")


def hopping_window(ds, size_us: int, hop_us: int, key_col: str = "event_type",
                   ts_col: str = "ts", value_col: str = "value"):
    """Hopping (overlapping) windows: every event lands in size/hop
    windows; windows emit (window_id, key, n_events, min_value, max_value)
    where window w covers [w*hop, w*hop + size).

    The per-batch combiner emits one partial row per (window, key) — the
    fan-out multiplies the PARTIALS, never the events, and the shuffle
    still only moves aggregated rows.
    """
    assert size_us % hop_us == 0, "size must be a multiple of hop"
    fanout = size_us // hop_us

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        tus = _ts_us(batch[ts_col])
        key = batch[key_col]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        val = batch[value_col]
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        last = tus // hop_us  # last window whose start is <= t
        frames = []
        for j in range(fanout):
            wid = last - j  # window [wid*hop, wid*hop+size) contains t
            ok = tus - wid * hop_us < size_us
            sel = pa.array(np.flatnonzero(ok))
            frames.append(
                pa.table(
                    {
                        "window_id": pa.array(wid[ok]),
                        key_col: key.take(sel),
                        "v": val.take(sel),
                    }
                )
            )
        t = pa.concat_tables(frames)
        g = t.group_by(["window_id", key_col]).aggregate(
            [
                ("v", "count", pc.CountOptions(mode="all")),
                ("v", "min"), ("v", "max"),
            ]
        ).rename_columns(
            ["window_id", key_col, "n_events", "min_value", "max_value"]
        )
        return g.append_column(
            "rkey", pa.array(g["window_id"].to_numpy() % np.int64(R))
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    def merge_many(g: pa.Table) -> pa.Table:
        out = g.group_by(["window_id", key_col]).aggregate(
            [("n_events", "sum"), ("min_value", "min"), ("max_value", "max")]
        ).rename_columns(
            ["window_id", key_col, "n_events", "min_value", "max_value"]
        )
        return out.set_column(
            2, "n_events", pc.cast(out["n_events"], pa.int64())
        )

    return partials.groupby("rkey").map_groups(merge_many, batch_format="pyarrow")


def distinct_count(ds, key_col: str, distinct_col: str, ts_col: str | None = None):
    """Exact per-key distinct count: per-batch (key, value) dedup partials,
    one shuffle on the pair, then a run-length count — the two-level
    exact-distinct pattern (the approximate path would swap the pair
    shuffle for per-batch HLL sketches merged in one tiny groupby)."""
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        d = pa.table(
            {key_col: batch[key_col], distinct_col: batch[distinct_col]}
        ).group_by([key_col, distinct_col]).aggregate([])
        v = d[distinct_col].to_numpy().astype(np.int64)
        return d.append_column(
            "rkey",
            pa.array((v.view(np.uint64) % np.uint64(R)).astype(np.int64)),
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    # dedup (key, value) within each reducer (a value hashes to one
    # reducer, so global dedup holds), then count per key — two Arrow
    # hash-aggregates, no pandas
    def count_distinct(g: pa.Table) -> pa.Table:
        d = pa.table(
            {key_col: g[key_col], distinct_col: g[distinct_col]}
        ).group_by([key_col, distinct_col]).aggregate([])
        out = d.group_by([key_col]).aggregate(
            [(distinct_col, "count", pc.CountOptions(mode="all"))]
        )
        return out.rename_columns([key_col, "partial_n"])

    per_reducer = partials.groupby("rkey").map_groups(
        count_distinct, batch_format="pyarrow"
    )

    # native aggregate — no per-key Python even at 10^6+ keys (Dataset
    # rename_columns chokes on the pandas blocks map_groups emits, so
    # rename through an Arrow map_batches)
    agg = per_reducer.groupby(key_col).sum("partial_n")

    def rn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("sum(partial_n)")
        return batch.set_column(i, "n_distinct", batch["sum(partial_n)"])

    return agg.map_batches(rn, batch_format="pyarrow")


def _rkeyed(partials, key_col: str):
    """Append a coarse reducer key (hash(key) % reducer_count) so the
    final merge handles MANY keys per Python call — never one call per
    key (rule 3).  String keys hash off the Arrow UTF-8 buffer."""
    from ..stages.util import reducer_count, rkey_of

    R = reducer_count()

    def add_rkey(batch: pa.Table) -> pa.Table:
        return batch.append_column("rkey", pa.array(rkey_of(batch[key_col], R)))

    return partials.map_batches(add_rkey, batch_format="pyarrow")


def _weighted_key_segments(g: pa.Table, key_col: str, value_col: str):
    """Vectorized multi-key weighted-quantile scaffolding over a coarse
    reducer group of (key, value, cnt) rows: merge duplicate values per
    key, compute per-key totals and a within-key cumulative count, and
    return a ``locate(target_per_key)`` that answers "first distinct
    value whose within-key cumulative count reaches target" for ALL keys
    in one ``searchsorted`` (within-key cumulatives are lifted onto
    disjoint ranges via ``key_index * BIG``)."""
    keys = g[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    g = g.drop_columns(["rkey"]) if "rkey" in g.column_names else g
    dic = pc.dictionary_encode(keys)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    c = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((v, codes))
    codes, v, c = codes[order], v[order], c[order]
    # merge duplicate (key, value) rows arriving from different blocks
    new = np.r_[True, (codes[1:] != codes[:-1]) | (v[1:] != v[:-1])]
    idx = np.nonzero(new)[0]
    vu = v[new]
    cu = np.add.reduceat(c, idx)
    ku = codes[new]
    starts = np.nonzero(np.r_[True, ku[1:] != ku[:-1]])[0]
    seglen = np.diff(np.r_[starts, len(ku)])
    n_per = np.add.reduceat(cu, starts)
    cum = np.cumsum(cu)
    seg_before = np.repeat(np.r_[np.int64(0), cum[starts[1:] - 1]], seglen)
    cumk = cum - seg_before
    big = np.int64(n_per.max()) + 1 if len(n_per) else np.int64(1)
    kidx_row = np.repeat(np.arange(len(starts), dtype=np.int64), seglen)
    adjusted = cumk + kidx_row * big
    kidx = np.arange(len(starts), dtype=np.int64)

    def locate(target_per_key):
        pos = np.searchsorted(adjusted, target_per_key + kidx * big, side="left")
        return vu[pos]

    return {
        "keys": dic.dictionary.take(pa.array(ku[starts])),
        "n_per": n_per,
        "locate": locate,
    }


def grouped_median(ds, key_col: str, value_col: str,
                   median_name: str = "median_value",
                   count_name: str = "n_events"):
    """EXACT per-key median without materializing any group's raw rows.

    Classic combiner shape: ``map_batches`` pre-aggregates each batch to
    (key, value, cnt) — the shuffle then carries at most one row per
    distinct (key, value) per block, and the coarse-keyed reducer (many
    keys per Python call, one lexsort each) holds only DISTINCT values
    with weights per key, from which the exact median
    (midpoint interpolation for even n, matching ``numpy.median`` /
    DuckDB ``quantile_cont(0.5)``) is a cumulative-sum lookup.  A hot key
    is bounded by its distinct-value count, not its row count; for
    continuous never-repeating values this degenerates to the row count,
    where ``grouped_quantiles_sketch`` (below) is the opt-in trade —
    this operator keeps the exact contract.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({key_col: batch[key_col], value_col: batch[value_col]})
            .group_by([key_col, value_col])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, value_col, "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def med_many(g: pa.Table) -> pa.Table:
        st = _weighted_key_segments(g, key_col, value_col)
        lo = (st["n_per"] + 1) // 2  # 1-indexed middle positions
        hi = st["n_per"] // 2 + 1
        vlo = st["locate"](lo)
        vhi = st["locate"](hi)
        return pa.table(
            {
                key_col: st["keys"],
                median_name: pa.array((vlo + vhi) / 2.0, pa.float64()),
                count_name: pa.array(st["n_per"]),
            }
        )

    return (
        _rkeyed(partials, key_col)
        .groupby("rkey")
        .map_groups(med_many, batch_format="pyarrow")
    )


def grouped_percentiles(ds, key_col: str, value_col: str,
                        qs=(0.25, 0.5, 0.9, 0.99),
                        names=("p25", "p50", "p90", "p99")):
    """EXACT per-key continuous percentiles via the same distinct-value
    count combiner as :func:`grouped_median` — the shuffle carries at most
    one (key, value, cnt) row per distinct value per block, and the
    reducer interpolates DuckDB ``quantile_cont`` style
    (``lo * (1 - frac) + hi * frac`` at position ``q * (n - 1)`` —
    empirically DuckDB's exact double arithmetic, NOT the algebraically
    equal ``lo + (hi - lo) * frac``), so results are bit-identical to the
    SQL oracle."""

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({key_col: batch[key_col], value_col: batch[value_col]})
            .group_by([key_col, value_col])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, value_col, "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def pct_many(g: pa.Table) -> pa.Table:
        st = _weighted_key_segments(g, key_col, value_col)
        n = st["n_per"]
        out = {key_col: st["keys"]}
        for q, name in zip(qs, names):
            pos = q * (n - 1).astype(np.float64)
            i = np.floor(pos).astype(np.int64)
            frac = pos - i
            lo = st["locate"](i + 1)
            hi = st["locate"](np.minimum(i + 2, n))
            out[name] = pa.array(lo * (1.0 - frac) + hi * frac, pa.float64())
        out["n_events"] = pa.array(n)
        return pa.table(out)

    return (
        _rkeyed(partials, key_col)
        .groupby("rkey")
        .map_groups(pct_many, batch_format="pyarrow")
    )


# -- approximate quantiles for continuous hot keys ---------------------------


def _sketch_compress(codes, v, w, delta):
    """Equi-weight compression: per key, bin rows by center-of-mass rank
    into ≤ delta weighted centroids.  Vectorized across ALL keys in one
    pass (sort → grouped cumsum → bincount); deterministic.

    Returns (codes', means', weights') with codes' ascending.
    """
    order = np.lexsort((v, codes))
    c_s, v_s, w_s = codes[order], v[order], w[order]
    tot = np.bincount(c_s, weights=w_s)
    cum = np.cumsum(w_s)
    first = np.searchsorted(c_s, c_s, side="left")
    base = cum[first] - w_s[first]
    center = cum - base - w_s / 2.0
    width = np.maximum(tot[c_s], 1e-300) / delta
    bucket = np.minimum((center / width).astype(np.int64), delta - 1)
    gid = c_s * delta + bucket
    uniq, inv = np.unique(gid, return_inverse=True)
    ws = np.bincount(inv, weights=w_s)
    wv = np.bincount(inv, weights=w_s * v_s)
    return (uniq // delta).astype(np.int64), wv / ws, ws


def grouped_quantiles_sketch(ds, key_col: str, value_col: str,
                             qs=(0.5, 0.9, 0.99), delta: int = 256):
    """APPROXIMATE per-key quantiles with bounded reducer state — the
    documented trade for continuous never-repeating values where the
    exact distinct-value combiner (``grouped_percentiles``) degenerates
    to the row count.

    Mergeable equi-weight sketch: each batch compresses every key to
    ≤ ``delta`` weighted centroids (rank width ``W/delta``), the shuffle
    carries centroid rows only, and the reducer re-compresses the merged
    centroids — per-key state is O(delta) regardless of row count, and
    rank error is bounded by ~1/delta.  Deterministic under any
    partitioning of equal batches; NOT oracle-gated (approximate by
    design — tests pin the rank-error bound against exact numpy).
    Returns one row per key: (key, q_<q> …, n_events).
    """
    names = [f"q_{str(q).replace('0.', '')}" for q in qs]

    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.ones(len(v), dtype=np.float64)
        cc, mm, ww = _sketch_compress(codes, v, w, delta)
        karr = dic.dictionary.take(pa.array(cc))
        return pa.table(
            {
                "rkey": pa.array(rkey_of(karr, R)),
                key_col: karr,
                "c_mean": pa.array(mm),
                "c_w": pa.array(ww),
            }
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    # coarse-key merge (rule 3): centroid rows shuffle under
    # hash(key) % R and a reducer re-compresses ALL of its keys in one
    # multi-key _sketch_compress pass, then reads the quantiles off a
    # (keys × delta) padded rank matrix — zero per-key interpreter calls,
    # so 10^6+-key workloads keep the same shape.
    def final_many(g: pa.Table) -> pa.Table:
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = g["c_mean"].to_numpy(zero_copy_only=False)
        w = g["c_w"].to_numpy(zero_copy_only=False)
        cc, mm, ww = _sketch_compress(codes, m, w, delta)
        nk = len(dic.dictionary)
        counts = np.bincount(cc, minlength=nk)
        seg_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
        idx_in_key = np.arange(len(cc)) - seg_start[cc]
        cumw = np.cumsum(ww)
        base = cumw[seg_start] - ww[seg_start]
        centers = cumw - base[cc] - ww / 2.0
        n_key = np.bincount(cc, weights=ww, minlength=nk)
        cmat = np.full((nk, delta), np.inf)
        mmat = np.zeros((nk, delta))
        cmat[cc, idx_in_key] = centers
        mmat[cc, idx_in_key] = mm
        last = np.maximum(counts - 1, 0)
        out = {key_col: dic.dictionary}
        rows = np.arange(nk)
        for q, name in zip(qs, names):
            t = q * n_key
            i = (cmat < t[:, None]).sum(axis=1)  # searchsorted left, per key
            lo_i = np.clip(i - 1, 0, last)
            hi_i = np.clip(i, 0, last)
            c_lo = cmat[rows, lo_i]
            c_hi = cmat[rows, hi_i]
            f = (t - c_lo) / np.maximum(c_hi - c_lo, 1e-300)
            est = mmat[rows, lo_i] * (1.0 - f) + mmat[rows, hi_i] * f
            est = np.where(i == 0, mmat[rows, 0], est)
            est = np.where(i > last, mmat[rows, last], est)
            out[name] = pa.array(est, pa.float64())
        out["n_events"] = pa.array(np.round(n_key).astype(np.int64))
        return pa.table(out)

    return partials.groupby("rkey").map_groups(final_many, batch_format="pyarrow")


def grouped_distinct_sketch(ds, key_col: str, distinct_col: str, p: int = 12):
    """Approximate per-key distinct count via HyperLogLog (Flajolet et
    al. 2007, with the small-range linear-counting correction) — the
    mergeable O(2^p)-state scale path beside exact
    :func:`distinct_count`, for keys whose distinct sets are too large to
    shuffle even deduped (exact ships one row per distinct (key, value)
    per block; the sketch ships 2^p bytes per (key, block) REGARDLESS of
    cardinality).

    Per-batch combiner: one register vector (max leading-zero rank per
    register, packed as a ``2^p``-byte binary cell) per key; reducers
    max-merge ALL of their keys' vectors in one sorted ``reduceat`` pass
    (no per-key Python) and read the estimate off the merged registers.
    Deterministic under any partitioning (max is commutative); NOT
    oracle-gated (approximate by design) — tests pin the ±1.04/√2^p
    error bound against exact numpy.  Returns (key, approx_distinct).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()
    m = 1 << p
    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def _hash_vals(col) -> np.ndarray:
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            from ..sources.pages import url_hash64

            return url_hash64(col)
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = v.view(np.uint64) * _GOLD
            return h ^ (h >> np.uint64(29))

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = batch[distinct_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = _hash_vals(vals)
        reg = (h & np.uint64(m - 1)).astype(np.int64)
        rest = h >> np.uint64(p)
        # rank = leading-zero count of the remaining 64-p bits + 1,
        # computed as (64 - p) - bit_length(rest) + 1; bit_length via the
        # float64 exponent would be inexact above 2^53 — use a vectorized
        # de Bruijn-free loop over the 6 shift levels instead
        bl = np.zeros(len(rest), dtype=np.int64)
        r = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = r >= (np.uint64(1) << np.uint64(s))
            bl[big] += s
            r[big] >>= np.uint64(s)
        bl[rest > 0] += 1
        rank = (64 - p) - bl + 1
        nk = len(dic.dictionary)
        regs = np.zeros((nk, m), dtype=np.uint8)
        np.maximum.at(regs, (codes, reg), rank.astype(np.uint8))
        off = (np.arange(nk + 1, dtype=np.int64) * m).astype(np.int32)
        cells = pa.BinaryArray.from_buffers(
            pa.binary(), nk,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(regs.tobytes())],
        )
        rk = _rkey_generic(dic.dictionary, R)
        return pa.table(
            {"rkey": pa.array(rk), key_col: dic.dictionary, "regs": cells}
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    _empty = None

    def merge_many(g: pa.Table) -> pa.Table:
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        cells = g["regs"]
        if isinstance(cells, pa.ChunkedArray):
            cells = cells.combine_chunks()
        nrows = len(keys)
        if nrows == 0:
            return pa.table(
                {key_col: keys, "approx_distinct": pa.array([], pa.int64())}
            )
        flat = np.frombuffer(cells.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(cells.buffers()[1], dtype=np.int32)[
            cells.offset : cells.offset + nrows + 1
        ]
        mat = np.empty((nrows, m), dtype=np.uint8)
        for i in range(nrows):  # bounded by keys × blocks per reducer
            mat[i] = flat[offs[i]:offs[i + 1]]
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sorted_mat = mat[order]
        starts = np.r_[0, np.flatnonzero(np.diff(codes[order])) + 1]
        merged = np.maximum.reduceat(sorted_mat, starts, axis=0)
        # HLL estimate per key, vectorized across keys
        regs_f = merged.astype(np.float64)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs_f), axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = m * np.log(m / np.maximum(zeros, 1))
        est = np.where(small, lin, est)
        return pa.table(
            {
                key_col: dic.dictionary,
                "approx_distinct": pa.array(np.round(est).astype(np.int64)),
            }
        )

    return partials.groupby("rkey").map_groups(merge_many, batch_format="pyarrow")


def _rkey_generic(keys: pa.Array, R: int) -> np.ndarray:
    """hash(key) % R for string or int64 key dictionaries — delegates to
    the shared ``stages.util.rkey_of`` recipe."""
    from ..stages.util import rkey_of

    return rkey_of(keys, R)


# -- funnel analysis ---------------------------------------------------------


def funnel_conversion(ds, stages, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type"):
    """Ordered funnel: how many users completed stage k strictly after
    completing stage k-1 (first-touch semantics — each stage anchors at
    its EARLIEST qualifying timestamp, the standard product-analytics
    definition).

    Returns one row per stage: (stage:string, users:int64).

    Shape: events outside the funnel are dropped map-side; the single
    all-to-all carries (user_id, ts_us, stage_idx) = 17 B/row.  Each
    coarse reducer (hash(user) % R — rule 3) owns complete users, so the
    per-stage anchor chain runs vectorized over ALL its users at once
    (np.minimum.at per stage over dense user codes) and emits one
    (stage, partial_count) row per stage; the final merge sums R×S tiny
    partials.  No per-user Python, no corpus re-shuffle, and the final
    exchange is O(R × n_stages) regardless of user count.
    """

    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    stages = list(stages)
    n_stages = len(stages)
    R = reducer_count()
    stage_arr = pa.array(stages, pa.string())

    def project(batch: pa.Table) -> pa.Table:
        sidx = pc.index_in(batch[type_col], value_set=stage_arr)
        keep = pc.is_valid(sidx)
        uid = pc.cast(pc.filter(batch[user_col], keep), pa.int64())
        return pa.table(
            {
                "rkey": pa.array(rkey_of(uid, R)),
                "u": uid,
                "t": pa.array(_ts_us(pc.filter(batch[ts_col], keep))),
                "s": pc.cast(pc.filter(sidx, keep), pa.int8()),
            }
        )

    lean = coalesce_for_shuffle(ds.map_batches(project, batch_format="pyarrow"), 0.5)

    def funnel_reducer(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(u, return_inverse=True)
        nu = len(uniq)
        counts = np.zeros(n_stages, dtype=np.int64)
        # anchor[j] = first-touch ts of the previous stage for user j
        anchor = np.full(nu, np.iinfo(np.int64).min, dtype=np.int64)
        alive = np.ones(nu, dtype=bool)
        for k in range(n_stages):
            first = np.full(nu, np.iinfo(np.int64).max, dtype=np.int64)
            m = (s == k) & (t > anchor[codes]) & alive[codes]
            np.minimum.at(first, codes[m], t[m])
            alive &= first != np.iinfo(np.int64).max
            counts[k] = int(alive.sum())
            anchor = first
        return pa.table(
            {
                "stage": pa.array(stages, pa.string()),
                "users": pa.array(counts),
            }
        )

    partials = lean.groupby("rkey").map_groups(funnel_reducer, batch_format="pyarrow")

    # Zero-count seed: with zero qualifying events the groupby yields no
    # groups and an empty schema-less dataset would flow out; the SQL twin
    # always returns one row per stage.  One n_stages-row union fixes both.
    import ray

    seed = ray.data.from_arrow(
        pa.table({"stage": stage_arr,
                  "users": pa.array(np.zeros(n_stages, dtype=np.int64))})
    )
    partials = partials.union(seed)

    # final merge: R reducers × n_stages rows — a handful of partials whose
    # key cardinality is the LITERAL stage list (bounded by the API call),
    # not data-dependent, so a per-stage vectorized sum is rule-3 safe
    def merge(batch: pa.Table) -> pa.Table:
        sidx = pc.index_in(batch["stage"], value_set=stage_arr).to_numpy(
            zero_copy_only=False
        )
        tot = np.zeros(n_stages, dtype=np.int64)
        np.add.at(tot, sidx, batch["users"].to_numpy(zero_copy_only=False))
        return pa.table({"stage": stage_arr, "users": pa.array(tot)})

    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


# -- cohort retention --------------------------------------------------------


def cohort_retention(ds, bucket_us: int, user_col: str = "user_id",
                     ts_col: str = "ts"):
    """Cohort retention matrix: users are cohorted by the time bucket of
    their FIRST event; for every (cohort, offset) cell, count the
    distinct users of that cohort active ``offset`` buckets later.

    Returns (cohort_bucket:int64, bucket_offset:int64, users:int64).

    Shape: per-batch distinct (user, bucket) pairs first (combiner — the
    exchange carries at most one row per user-bucket, 16 B + rkey, never
    the events); one coarse shuffle on hash(user) % R gives each reducer
    complete users, so cohort assignment (per-user min bucket) and the
    offset expansion are one vectorized pass; the second exchange moves
    only per-reducer (cohort, offset, partial_count) rows — cardinality
    is O(active_buckets²/2) per reducer, independent of user count — and
    the final coarse merge sums them under hash(cohort·P+offset) % R.
    """

    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def project(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch[user_col], pa.int64()).to_numpy()
        b = _ts_us(batch[ts_col]) // bucket_us
        pairs = np.unique(np.stack([uid, b], axis=1), axis=0)
        u = pairs[:, 0]
        return pa.table(
            {
                "rkey": pa.array(rkey_of(u, R)),
                "u": pa.array(u),
                "b": pa.array(pairs[:, 1]),
            }
        )

    lean = coalesce_for_shuffle(ds.map_batches(project, batch_format="pyarrow"), 0.5)

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def cohort_reducer(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        # cross-batch re-distinct: the map-side combiner only dedups
        # within its batch
        pairs = np.unique(np.stack([u, b], axis=1), axis=0)
        u, b = pairs[:, 0], pairs[:, 1]
        uniq, codes = np.unique(u, return_inverse=True)
        cohort_of = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(cohort_of, codes, b)
        cohort = cohort_of[codes]
        off = b - cohort
        cells, cnt = np.unique(np.stack([cohort, off], axis=1), axis=0,
                               return_counts=True)
        code = cells[:, 0] * np.int64(1 << 20) + cells[:, 1]
        with np.errstate(over="ignore"):
            rk = ((code.view(np.uint64) * GOLD) >> np.uint64(40)) % np.uint64(R)
        return pa.table(
            {
                "rkey2": pa.array(rk.astype(np.int64)),
                "cohort_bucket": pa.array(cells[:, 0]),
                "bucket_offset": pa.array(cells[:, 1]),
                "users": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = lean.groupby("rkey").map_groups(cohort_reducer, batch_format="pyarrow")

    # coarse-key final merge (rule 3): all of a reducer's (cohort, offset)
    # cells sum in one np.add.at pass
    def merge_many(g: pa.Table) -> pa.Table:
        c = g["cohort_bucket"].to_numpy(zero_copy_only=False)
        o = g["bucket_offset"].to_numpy(zero_copy_only=False)
        w = g["users"].to_numpy(zero_copy_only=False)
        cells, inv = np.unique(np.stack([c, o], axis=1), axis=0, return_inverse=True)
        tot = np.zeros(len(cells), dtype=np.int64)
        np.add.at(tot, inv, w)
        return pa.table(
            {
                "cohort_bucket": pa.array(cells[:, 0]),
                "bucket_offset": pa.array(cells[:, 1]),
                "users": pa.array(tot),
            }
        )

    return partials.groupby("rkey2").map_groups(merge_many, batch_format="pyarrow")


def rate_limit(ds, window_us: int, n: int, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """Keep the first ``n`` events per (user, tumbling window), ordered by
    (ts, event_id) — the per-key rate limiter / throttler a streaming
    ingest pipeline applies before expensive downstream stages.

    Returns (id_col, user_col, window_id, rnk) with ``rnk`` 1-based.

    Scale shape: a per-batch PRE-TRIM keeps at most ``n`` rows per
    (user, window) before the shuffle — a row ranked > n within its own
    batch has ≥ n earlier rows in that batch alone, so it can never be in
    the global first-n (same combiner argument as ``topk_per_group``).
    The single exchange then carries ≤ n·|active keys| lean rows of
    (user, window, ts, id); the reducer re-ranks ALL of its keys in one
    lexsort (rule 3 — no per-key Python).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def _rank(user, wid, tus, eid):
        """1-based rank of each row within its (user, window) group under
        (ts, id) order; returns (perm, rank) with perm sorting the rows."""
        perm = np.lexsort((eid, tus, wid, user))
        us, ws = user[perm], wid[perm]
        new = np.empty(len(us), dtype=bool)
        new[:1] = True
        new[1:] = (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])
        first = np.maximum.accumulate(np.where(new, np.arange(len(us)), 0))
        rank = np.arange(len(us)) - first + 1
        return perm, rank

    def pretrim(batch: pa.Table) -> pa.Table:
        user = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tus = _ts_us(batch[ts_col])
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wid = tus // window_us
        perm, rank = _rank(user, wid, tus, eid)
        sel = perm[rank <= n]
        return pa.table(
            {
                id_col: pa.array(eid[sel]),
                user_col: pa.array(user[sel]),
                "window_id": pa.array(wid[sel]),
                "tus": pa.array(tus[sel]),
                "rkey": pa.array(rkey_of(user[sel], R)),
            }
        )

    trimmed = coalesce_for_shuffle(
        ds.map_batches(pretrim, batch_format="pyarrow"), 0.25
    )

    def limit_reducer(g: pa.Table) -> pa.Table:
        user = g[user_col].to_numpy(zero_copy_only=False)
        wid = g["window_id"].to_numpy(zero_copy_only=False)
        tus = g["tus"].to_numpy(zero_copy_only=False)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        perm, rank = _rank(user, wid, tus, eid)
        sel = rank <= n
        p = perm[sel]
        return pa.table(
            {
                id_col: pa.array(eid[p]),
                user_col: pa.array(user[p]),
                "window_id": pa.array(wid[p]),
                "rnk": pa.array(rank[sel].astype(np.int64)),
            }
        )

    return trimmed.groupby("rkey").map_groups(limit_reducer, batch_format="pyarrow")


def grouped_corr(ds, key_col: str, x_col: str, y_col: str):
    """Exact per-key Pearson correlation of two int64 columns.

    Returns (key_col, n, corr) with
    ``corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))`` —
    every inner moment an exact integer sum, so the three final float ops
    (two sqrts, one divide) run the IDENTICAL IEEE sequence as the SQL
    twin and hash-reproduce.  NULL when either variance is zero.

    Scale shape: per-batch moment partials (one vectorized Arrow group_by
    per block — six int64 sums per key), then a native Dataset
    ``groupby(key).sum`` (no per-key interpreter work at any key
    cardinality), then one vectorized finisher over the key-sized result.
    Contract: per-key Σx², Σy², Σxy must fit int64 (they ride the native
    sum); the FINAL products (n·Σx², Σx·Σy …) may pass 2⁶³ — the finisher
    detects that and falls back to arbitrary-precision Python ints for
    that key-sized batch only, never corpus-sized work.
    """

    def partials(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy().astype(np.int64)
        y = batch[y_col].to_numpy().astype(np.int64)
        t = pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "sxy": pa.array(x * y),
            }
        )
        agg = t.group_by(key_col).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
        )
        return agg.rename_columns(
            [key_col, "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    from ..stages.util import coalesce_for_shuffle

    parts = coalesce_for_shuffle(
        ds.map_batches(partials, batch_format="pyarrow"), 0.25
    )
    agg = parts.groupby(key_col).sum(["n", "sx", "sy", "sxx", "syy", "sxy"])

    def finish(batch: pa.Table) -> pa.Table:
        cols = {c: batch[f"sum({c})"].to_numpy() for c in
                ("n", "sx", "sy", "sxx", "syy", "sxy")}
        n, sx, sy = cols["n"], cols["sx"], cols["sy"]
        sxx, syy, sxy = cols["sxx"], cols["syy"], cols["sxy"]
        # int64 fast path is exact iff no product can reach 2^63
        lim = float(2**62)
        safe = bool(
            (
                (n.astype(np.float64) * np.maximum(sxx, syy).astype(np.float64)
                 < lim)
                & (np.abs(sx.astype(np.float64) * sy.astype(np.float64)) < lim)
            ).all()
        )
        if safe:
            numf = (n * sxy - sx * sy).astype(np.float64)
            vxf = (n * sxx - sx * sx).astype(np.float64)
            vyf = (n * syy - sy * sy).astype(np.float64)
        else:
            # arbitrary-precision exact moments; float() matches SQL's
            # CAST(HUGEINT AS DOUBLE) round-to-nearest on the same integer
            k = len(n)
            numf = np.empty(k)
            vxf = np.empty(k)
            vyf = np.empty(k)
            for i in range(k):
                N, SX, SY = int(n[i]), int(sx[i]), int(sy[i])
                numf[i] = float(N * int(sxy[i]) - SX * SY)
                vxf[i] = float(N * int(sxx[i]) - SX * SX)
                vyf[i] = float(N * int(syy[i]) - SY * SY)
        mask = (vxf <= 0) | (vyf <= 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = numf / (np.sqrt(vxf) * np.sqrt(vyf))
        return pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(n),
                "corr": pa.array(np.where(mask, np.nan, corr), mask=mask),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def pivot_counts(ds, key_col: str, type_col: str, types: list[str],
                 out_prefix: str = "n_", total_col: str = "n_total"):
    """Wide reshape (pivot): one output row per key, one int64 count
    column per ``types`` entry plus a total — the long→wide step every
    per-entity feature table starts with.

    Returns (key_col, {out_prefix}{type}..., total_col).  Types absent
    for a key count 0; rows whose type is not in ``types`` still count
    toward ``total_col`` (matching COUNT(*) FILTER semantics in SQL).

    Scale shape: each block collapses to per-key partial counts with ONE
    vectorized Arrow group_by (indicator columns are pc.equal + cast —
    no Python per row), so the only all-to-all is a native Dataset
    ``groupby(key).sum`` over partials whose row count is bounded by
    keys-per-block, never events.  Column count scales with
    ``len(types)`` — a pivot over an unbounded type domain should use
    the long form (``tumbling_window`` / ``mode_per_key``) instead; the
    wide form is for the bounded vocabularies (event kinds, languages)
    a feature pipeline actually pivots on.
    """
    from ..stages.util import coalesce_for_shuffle

    cnt_cols = [f"{out_prefix}{t}" for t in types] + [total_col]

    def partials(batch: pa.Table) -> pa.Table:
        tv = batch[type_col]
        cols: dict[str, object] = {key_col: batch[key_col]}
        for t, c in zip(types, cnt_cols):
            cols[c] = pc.cast(pc.equal(tv, t), pa.int64())
        cols[total_col] = pa.array(np.ones(len(batch), np.int64))
        t = pa.table(cols)
        agg = t.group_by(key_col).aggregate([(c, "sum") for c in cnt_cols])
        return agg.rename_columns([key_col] + cnt_cols)

    parts = coalesce_for_shuffle(
        ds.map_batches(partials, batch_format="pyarrow"), 0.25
    )
    agg = parts.groupby(key_col).sum(cnt_cols)

    def finish(batch: pa.Table) -> pa.Table:
        out = {key_col: batch[key_col]}
        for c in cnt_cols:
            out[c] = batch[f"sum({c})"]
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def running_sum(ds, key_col: str, ts_col: str, id_col: str, value_col: str,
                out_col: str = "running_value", scale: int = 100):
    """Per-key running (cumulative) sum of ``value_col`` in (ts, id)
    order — the ordered-scan window function (SUM ... OVER (PARTITION BY
    key ORDER BY ts ROWS UNBOUNDED PRECEDING)) behind balances, session
    spend, and cumulative token budgets.

    Returns (id_col, key_col, out_col float64) with one row per input
    row.  Values are scaled to int64 (``round(value*scale)``) before
    accumulation so the prefix sums are EXACT integers at any
    distribution order, and the single final float op
    (``int64 → float64 / scale``) is the identical IEEE sequence as the
    SQL twin — hash-reproducible (same trick as grouped_corr /
    spatial-lag cents).

    Scale shape: a cumulative sum cannot pre-aggregate (every row is an
    output), but it needs only KEY-LOCALITY, not global order: one lean
    hash(key) exchange of (id, key, ts_us, cents) — 32 B/row — then each
    reducer lexsorts ALL of its keys at once and computes every per-key
    prefix sum with one np.cumsum minus a segment-start offset gather
    (rule 3: no per-key Python).  Skew ceiling: a single key's full
    history must fit one reducer — the same contract as SQL PARTITION BY.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def lean(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        # caller contract: value has <= log10(scale) decimals, so v*scale
        # sits ~1e-10 from integral and never at a .5 tie — np.round
        # (half-even) and SQL ROUND (half-away) land the same integer
        cents = np.round(v * scale).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: pa.array(key),
                "tus": pa.array(_ts_us(batch[ts_col])),
                "cents": pa.array(cents),
                "rkey": pa.array(rkey_of(key, R)),
            }
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(lean, batch_format="pyarrow"), 0.25
    )

    def scan(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy(zero_copy_only=False)
        tus = g["tus"].to_numpy(zero_copy_only=False)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        perm = np.lexsort((eid, tus, key))
        ks, cs = key[perm], cents[perm]
        run = np.cumsum(cs)
        new = np.empty(len(ks), dtype=bool)
        new[:1] = True
        new[1:] = ks[1:] != ks[:-1]
        # value of `run` just before each segment start, gathered to rows
        base = np.where(new, run - cs, 0)
        start = np.maximum.accumulate(np.where(new, np.arange(len(ks)), 0))
        cum = run - base[start]
        return pa.table(
            {
                id_col: pa.array(eid[perm]),
                key_col: pa.array(ks),
                out_col: pa.array(cum.astype(np.float64) / float(scale)),
            }
        )

    return keyed.groupby("rkey").map_groups(scan, batch_format="pyarrow")


def grouped_regression(ds, key_col: str, x_col: str, y_col: str):
    """Exact per-key OLS fit y = slope·x + intercept of two int64 columns.

    Same integer-moment machinery as :func:`grouped_corr` (per-batch
    Arrow group_by partials → native groupby sum → vectorized finisher):

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Every moment is an exact int64 (with the same big-int fallback past
    2⁶² in the final products), and the float ops run the identical IEEE
    sequence as the SQL twin — hash-exact.  Zero x-variance → NULL
    slope/intercept.  Returns (key, n, slope, intercept).
    """

    def partials(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy().astype(np.int64)
        y = batch[y_col].to_numpy().astype(np.int64)
        t = pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
            }
        )
        agg = t.group_by(key_col).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "sxy")]
        )
        return agg.rename_columns([key_col, "n", "sx", "sy", "sxx", "sxy"])

    from ..stages.util import coalesce_for_shuffle

    parts = coalesce_for_shuffle(
        ds.map_batches(partials, batch_format="pyarrow"), 0.25
    )
    agg = parts.groupby(key_col).sum(["n", "sx", "sy", "sxx", "sxy"])

    def finish(batch: pa.Table) -> pa.Table:
        cols = {c: batch[f"sum({c})"].to_numpy() for c in
                ("n", "sx", "sy", "sxx", "sxy")}
        n, sx, sy, sxx, sxy = (cols[c] for c in ("n", "sx", "sy", "sxx", "sxy"))
        lim = float(2**62)
        # unlike grouped_corr there is no syy to give |sxy| a
        # Cauchy-Schwarz ceiling, so n·|sxy| needs its own bound
        safe = bool(
            (
                (n.astype(np.float64) * sxx.astype(np.float64) < lim)
                & (n.astype(np.float64) * np.abs(sxy.astype(np.float64))
                   < lim)
                & (np.abs(sx.astype(np.float64) * sy.astype(np.float64)) < lim)
            ).all()
        )
        if safe:
            numf = (n * sxy - sx * sy).astype(np.float64)
            vxf = (n * sxx - sx * sx).astype(np.float64)
        else:
            k = len(n)
            numf = np.empty(k)
            vxf = np.empty(k)
            for i in range(k):
                N, SX = int(n[i]), int(sx[i])
                numf[i] = float(N * int(sxy[i]) - SX * int(sy[i]))
                vxf[i] = float(N * int(sxx[i]) - SX * SX)
        mask = vxf <= 0
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = numf / vxf
            intercept = (
                sy.astype(np.float64) - slope * sx.astype(np.float64)
            ) / n.astype(np.float64)
        return pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(n),
                "slope": pa.array(np.where(mask, np.nan, slope), mask=mask),
                "intercept": pa.array(
                    np.where(mask, np.nan, intercept), mask=mask
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def interval_union(ds, key_col: str, start_col: str, end_col: str):
    """Per-key UNION length of half-open intervals [s, e) — "how long was
    this entity actually active", with overlaps counted once (coverage
    aggregation; touching intervals merge).  Returns
    (key, n_intervals, covered) — covered is an exact int64 in the input
    unit, so the result hash-matches the SQL gaps-and-islands twin.

    Scale shape: one 32 B/row (rkey, key, s, e) exchange under
    hash(key); each reducer runs ONE vectorized sweep over all its keys
    at once — +1/−1 boundary events, a global cumsum minus segment-start
    offsets for the per-key active count (the invertible-scan reset
    trick of :func:`running_sum`; max-based cummax would not reset this
    way), and covered = Σ inter-event gaps where active > 0.  No per-key
    Python at any key cardinality; skew ceiling = one key's intervals
    fit one reducer (the SQL PARTITION BY contract).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def lean(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(key),
                "s": batch[start_col],
                "e": batch[end_col],
                "rkey": pa.array(rkey_of(key, R)),
            }
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(lean, batch_format="pyarrow"), 0.25
    )

    def sweep(g: pa.Table) -> pa.Table:
        k0 = g[key_col].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        e = g["e"].to_numpy(zero_copy_only=False)
        n = len(k0)
        k2 = np.concatenate([k0, k0])
        pos = np.concatenate([s, e])
        delta = np.concatenate(
            [np.ones(n, np.int64), np.full(n, -1, np.int64)]
        )
        order = np.lexsort((pos, k2))
        k2, pos, delta = k2[order], pos[order], delta[order]
        newk = np.r_[True, k2[1:] != k2[:-1]]
        starts = np.nonzero(newk)[0]
        run = np.cumsum(delta)
        base = np.where(starts > 0, run[starts - 1], 0)
        act = run - np.repeat(base, np.diff(np.r_[starts, len(k2)]))
        gap = pos[1:] - pos[:-1]
        hot = (act[:-1] > 0) & (k2[1:] == k2[:-1])
        codes = np.cumsum(newk) - 1
        nk = len(starts)
        covered = np.zeros(nk, dtype=np.int64)
        np.add.at(covered, codes[:-1][hot], gap[hot])
        cnt = np.zeros(nk, dtype=np.int64)
        np.add.at(cnt, codes[delta > 0], 1)
        return pa.table(
            {
                key_col: pa.array(k2[starts]),
                "n_intervals": pa.array(cnt),
                "covered": pa.array(covered),
            }
        )

    return keyed.groupby("rkey").map_groups(sweep, batch_format="pyarrow")


def sql_interval_union(intervals_cte: str, key_col: str) -> str:
    """DuckDB twin of :func:`interval_union` — ``intervals_cte`` must
    yield (key, s, e); islands merge when the next start does not pass
    the running max end (touching intervals merge, as in the sweep)."""
    return f"""
WITH iv AS ({intervals_cte}),
o AS (
  SELECT *, MAX(e) OVER (PARTITION BY {key_col} ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pm
  FROM iv
),
i AS (SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS brk
      FROM o),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY {key_col} ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS isl
  FROM i
),
isl AS (
  SELECT {key_col}, isl, COUNT(*) AS cnt, MAX(e) - MIN(s) AS len
  FROM g GROUP BY 1, 2
)
SELECT {key_col}, CAST(SUM(cnt) AS BIGINT) AS n_intervals,
       CAST(SUM(len) AS BIGINT) AS covered
FROM isl GROUP BY {key_col}
"""


def event_sequences(ds, key_col: str, ts_col: str, id_col: str,
                    val_col: str, out_col: str = "seq", sep: str = ","):
    """Per-key ordered sequence construction — concatenate ``val_col``
    in (ts, id) order per key, the STRING_AGG(... ORDER BY ts, id)
    window.  THE conversion step that turns an event log into
    next-event-model / recommender training sequences (one text row per
    user).

    Returns (key_col, n_events int64, out_col string), one row per key.

    Scale shape: sequence building cannot pre-aggregate (order spans
    blocks) but needs only KEY-LOCALITY: one lean hash(key) exchange of
    (key, ts_us, id, val) rows, then each reducer lexsorts ALL of its
    keys at once and materializes every sequence with ONE
    ``pc.binary_join`` over a LargeListArray built from int64 segment
    offsets (64-bit offsets + large_string values, so a reducer is
    bounded by its memory, not by 2³¹ rows / 2 GiB of joined text) —
    rule 3, no per-key Python.  Skew ceiling: a single key's full event
    list must fit one reducer — the same contract as SQL PARTITION BY
    (and the repo's running_sum / sessionize reducers).

    Caller contract: ``val_col`` is non-null (``binary_join`` nulls the
    whole sequence on one null element, where SQL STRING_AGG skips it).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def lean(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(key),
                "tus": pa.array(_ts_us(batch[ts_col])),
                id_col: batch[id_col],
                val_col: pc.cast(batch[val_col], pa.string()),
                "rkey": pa.array(rkey_of(key, R)),
            }
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(lean, batch_format="pyarrow"), 0.25
    )

    def build(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy(zero_copy_only=False)
        tus = g["tus"].to_numpy(zero_copy_only=False)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        perm = np.lexsort((eid, tus, key))
        ks = key[perm]
        vals = g[val_col].combine_chunks().take(pa.array(perm, pa.int64()))
        new = np.empty(len(ks), dtype=bool)
        new[:1] = True
        new[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(new)
        offsets = np.append(starts, len(ks)).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets), vals.cast(pa.large_string())
        )
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        n = np.diff(offsets).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(ks[starts]),
                "n_events": pa.array(n),
                out_col: joined,
            }
        )

    return keyed.groupby("rkey").map_groups(build, batch_format="pyarrow")


def rolling_avg(ds, key_col: str, ts_col: str, id_col: str, value_col: str,
                k: int, out_col: str = "rolling_avg", scale: int = 100):
    """Per-key rolling mean over the last ``k`` rows in (ts, id) order —
    AVG(value) OVER (PARTITION BY key ORDER BY ts, id ROWS BETWEEN k-1
    PRECEDING AND CURRENT ROW), the smoothing window behind
    moving-average features and burst detection.

    Returns (id_col, key_col, out_col float64, n_window int64), one row
    per input row.  Values are scaled to int64 (caller contract:
    ≤ log10(scale) decimals) so window sums are EXACT integers at any
    distribution order; the finisher ``int64 → float64 / (scale * n)``
    is the identical IEEE sequence as the SQL twin's
    ``CAST(int_sum AS DOUBLE) / (scale * COUNT(*) OVER w)``.

    Scale shape: same as running_sum — no pre-aggregation possible
    (every row is an output) but only KEY-LOCALITY needed: one lean
    32 B/row hash(key) exchange, then each reducer lexsorts ALL of its
    keys once and computes every window with one np.cumsum + clipped
    back-offset gather (rule 3: no per-key Python).  Skew ceiling: one
    key's history per reducer — the SQL PARTITION BY contract.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def lean(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        cents = np.round(v * scale).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: pa.array(key),
                "tus": pa.array(_ts_us(batch[ts_col])),
                "cents": pa.array(cents),
                "rkey": pa.array(rkey_of(key, R)),
            }
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(lean, batch_format="pyarrow"), 0.25
    )

    def windows(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy(zero_copy_only=False)
        tus = g["tus"].to_numpy(zero_copy_only=False)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        perm = np.lexsort((eid, tus, key))
        ks, cs = key[perm], cents[perm]
        n = len(ks)
        idx = np.arange(n, dtype=np.int64)
        new = np.empty(n, dtype=bool)
        new[:1] = True
        new[1:] = ks[1:] != ks[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        back = np.minimum(idx - seg_start, k - 1)
        start = idx - back
        cum = np.cumsum(cs)
        win = cum - (cum[start] - cs[start])
        cnt = back + 1
        avg = win.astype(np.float64) / (float(scale) * cnt)
        return pa.table(
            {
                id_col: pa.array(eid[perm]),
                key_col: pa.array(ks),
                out_col: pa.array(avg),
                "n_window": pa.array(cnt.astype(np.int64)),
            }
        )

    return keyed.groupby("rkey").map_groups(windows, batch_format="pyarrow")


def event_gaps(ds, key_col: str, ts_col: str, id_col: str,
               out_col: str = "gap_us", first_sentinel: int = -1):
    """Per-row inter-arrival time: microseconds since the key's PREVIOUS
    event in (ts, id) order — ``ts - LAG(ts) OVER (PARTITION BY key
    ORDER BY ts, id)``, the feature behind session gaps, churn signals,
    and burst detection.  The first event of each key gets
    ``first_sentinel`` (SQL twin coalesces its NULL to the same value so
    the hash gate stays exact — int64 nulls would otherwise widen to
    float64 through the comparator's pandas leg).

    Scale shape: identical to running_sum / rolling_avg — one lean
    hash(key) exchange of (id, key, ts_us) at 24 B/row, all keys per
    reducer lexsorted once, every gap from one shifted subtraction.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def lean(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: pa.array(key),
                "tus": pa.array(_ts_us(batch[ts_col])),
                "rkey": pa.array(rkey_of(key, R)),
            }
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(lean, batch_format="pyarrow"), 0.25
    )

    def gaps(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy(zero_copy_only=False)
        tus = g["tus"].to_numpy(zero_copy_only=False)
        eid = g[id_col].to_numpy(zero_copy_only=False)
        perm = np.lexsort((eid, tus, key))
        ks, ts_s = key[perm], tus[perm]
        gap = np.empty(len(ks), dtype=np.int64)
        gap[:1] = first_sentinel
        gap[1:] = np.where(
            ks[1:] == ks[:-1], ts_s[1:] - ts_s[:-1], first_sentinel
        )
        return pa.table(
            {
                id_col: pa.array(eid[perm]),
                key_col: pa.array(ks),
                out_col: pa.array(gap),
            }
        )

    return keyed.groupby("rkey").map_groups(gaps, batch_format="pyarrow")


def grouped_zscore(ds, key_col: str, value_col: str, id_col: str,
                   out_col: str = "z"):
    """Per-group z-score normalization of an int64 column —
    ``(v - AVG(v) OVER (PARTITION BY key)) / STDDEV_SAMP(v) OVER ...``,
    the feature-scaling map behind per-language length filters and
    per-source quality thresholds.

    Returns one row per input row: (id_col, key_col, value_col,
    out_col float64).

    Hash-exactness: pass 1 reduces EXACT int64 moments (n, Σv, Σv²)
    through one native groupby-sum (group-cardinality-bounded, not
    corpus-bounded); the driver folds them to per-group (mean, std)
    with the identical IEEE sequence as the SQL twin
    (``sx/n``, ``sqrt((n·sxx − sx²)/(n·(n−1)))``).  Pass 2 is a pure
    per-batch map against the broadcast (mean, std) table — the corpus
    never shuffles.

    Caller contract: |v| < 3.03e9 so v² fits int64 per element (lengths,
    counts, quantized scores — NOT epoch timestamps); enforced with a
    loud per-batch check.  The int64 Σv² partials can still wrap past
    ~10¹⁸ rows per group at the contract maximum — at that scale split
    the moments into (hi, lo) int64 pairs first.  Rows with a NULL key
    are passed through with a NULL z (SQL's NULL group yields non-NULL
    stats instead — keep keys non-null where the twin must hash-match).

    Scale shape: the broadcast is one row per DISTINCT KEY (the bm25 df
    trade) — fine for languages/sources/buckets; swap pass 2 for a
    key-sheltered join when keys near 10⁸.  Groups with n < 2 or zero
    variance emit NULL (SQL: division by NULL std).
    """
    import math

    partial_cols = [key_col, "n", "sx", "sxx"]

    def moments(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and np.abs(v).max() > 3_030_000_000:
            raise ValueError(
                "grouped_zscore: |value| must stay below 3.03e9 so v*v "
                "fits int64 exactly (got max |v| = "
                f"{int(np.abs(v).max())})"
            )
        t = pa.table(
            {
                key_col: batch[key_col],
                "n": pa.array(np.ones(len(v), np.int64)),
                "sx": pa.array(v),
                "sxx": pa.array(v * v),
            }
        )
        agg = t.group_by(key_col).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum")]
        )
        return agg.rename_columns(partial_cols)

    stats = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["n", "sx", "sxx"])
        .to_pandas()
    )
    mean_of, std_of = {}, {}
    for _, row in stats.iterrows():
        # Python ints: Σv² exact at any magnitude (no int64 wrap)
        n, sx, sxx = int(row["sum(n)"]), int(row["sum(sx)"]), int(row["sum(sxx)"])
        k = row[key_col]
        if n < 2:
            mean_of[k], std_of[k] = float(sx) / float(n), None
            continue
        n_d, sx_d, sxx_d = float(n), float(sx), float(sxx)
        var = (n_d * sxx_d - sx_d * sx_d) / (n_d * (n_d - 1.0))
        mean_of[k] = sx_d / n_d
        std_of[k] = math.sqrt(var) if var > 0.0 else None

    keys = list(mean_of)
    key_arr = pa.array(keys)
    mean_arr = np.array([mean_of[k] for k in keys], np.float64)
    std_arr = np.array(
        [np.nan if std_of[k] is None else std_of[k] for k in keys], np.float64
    )

    def zmap(batch: pa.Table) -> pa.Table:
        raw = pc.index_in(batch[key_col], key_arr).to_numpy(
            zero_copy_only=False
        )
        # a NULL key has no stats row: index_in yields null -> NaN; gate
        # it to a NULL z instead of an out-of-bounds int64 gather
        ok = ~np.isnan(raw)
        idx = np.where(ok, raw, 0).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            z = (v - mean_arr[idx]) / std_arr[idx]
        z = np.where(ok, z, np.nan)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                value_col: batch[value_col],
                out_col: pa.array(z, pa.float64(), from_pandas=True),
            }
        )

    return ds.map_batches(zmap, batch_format="pyarrow")


def winsorize(ds, key_col: str, value_col: str, id_col: str,
              q_lo: float = 0.05, q_hi: float = 0.95,
              out_col: str = "clipped"):
    """Per-group winsorization — clip each row's value to its group's
    exact [q_lo, q_hi] continuous percentiles (the standard outlier-
    taming step before model training / feature scaling).

    Pass 1 reuses :func:`grouped_percentiles` (distinct-value count
    combiner, ``quantile_cont``-identical interpolation — bit-exact vs
    the SQL twin); the resulting (key, lo, hi) table is driver-collected
    and broadcast — one row per DISTINCT KEY, the bm25 df trade (fine
    for event types / languages / buckets; swap pass 2 for a hash_join
    at 10⁸+ keys).  Pass 2 is a pure per-batch ``LEAST(GREATEST(v, lo),
    hi)`` map — the corpus never shuffles.  Rows whose key has no stats
    row (NULL key) pass through with a NULL clip.
    """
    pct = grouped_percentiles(
        ds, key_col, value_col, qs=(q_lo, q_hi), names=("lo", "hi")
    ).to_pandas()
    key_arr = pa.array(pct[key_col].tolist())
    lo_arr = pct["lo"].to_numpy(np.float64)
    hi_arr = pct["hi"].to_numpy(np.float64)

    def clip(batch: pa.Table) -> pa.Table:
        raw = pc.index_in(batch[key_col], key_arr).to_numpy(
            zero_copy_only=False
        )
        ok = ~np.isnan(raw)
        idx = np.where(ok, raw, 0).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.minimum(np.maximum(v, lo_arr[idx]), hi_arr[idx])
        c = np.where(ok, c, np.nan)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                value_col: batch[value_col],
                # from_pandas=True: the NULL-key NaN becomes a real
                # Arrow null, matching the documented SQL-join-miss
                # semantics (the grouped_zscore convention)
                out_col: pa.array(c, pa.float64(), from_pandas=True),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow")
