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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] column → int64 epoch microseconds (zero-copy)."""
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
        df = pd.DataFrame(
            {
                "window_id": wid,
                key_col: batch[key_col].to_pandas(),
                "v": batch[value_col].to_numpy(),
            }
        )
        g = df.groupby(["window_id", key_col], sort=False).agg(
            n_events=("v", "size"), min_value=("v", "min"), max_value=("v", "max")
        ).reset_index()
        g.insert(0, "rkey", g["window_id"].to_numpy() % R)
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    # coarse-keyed merge: one vectorized pandas groupby per reducer instead
    # of one Python call per (window, key) group
    def merge_many(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["window_id", key_col], sort=False).agg(
            n_events=("n_events", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        ).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return partials.groupby("rkey").map_groups(merge_many, batch_format="pandas")


def sessionize(ds, gap_us: int, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_us``.

    Returns one row per session:
    (user_id, session_seq, n_events, start_us, end_us) — all int64.
    """

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch[user_col],
                "tus": pa.array(_ts_us(batch[ts_col])),
                id_col: batch[id_col],
            }
        )

    from ..stages.util import coalesce_for_shuffle

    lean = coalesce_for_shuffle(
        ds.map_batches(project, batch_format="pyarrow"), 0.25
    )

    def per_user(g: pa.Table) -> pa.Table:
        tus = g["tus"].to_numpy()
        eid = g[id_col].to_numpy()
        order = np.lexsort((eid, tus))
        tus = tus[order]
        is_new = np.empty(len(tus), dtype=np.int64)
        is_new[0] = 1
        is_new[1:] = (np.diff(tus) > gap_us).astype(np.int64)
        seq = np.cumsum(is_new)
        starts = np.nonzero(is_new)[0]
        ends = np.r_[starts[1:], len(tus)] - 1
        uid = g[user_col][0].as_py()
        return pa.table(
            {
                user_col: pa.array(np.full(len(starts), uid, dtype=np.int64)),
                "session_seq": pa.array(seq[starts]),
                "n_events": pa.array(ends - starts + 1),
                "start_us": pa.array(tus[starts]),
                "end_us": pa.array(tus[ends]),
            }
        )

    return lean.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


def asof_join(left_ds, right_ds, key_col: str = "user_id", ts_col: str = "ts",
              left_id: str = "left_id", right_id: str = "right_id"):
    """As-of join: for each left row, the right row with the greatest
    ``ts <= left.ts`` sharing ``key_col`` (inner — unmatched left rows are
    dropped), matching DuckDB ``ASOF JOIN … ON l.key = r.key AND l.ts >= r.ts``.

    Single hash shuffle on the key (tagged union → ``groupby(key)``), then
    per-key sorted ``searchsorted`` — no sort-merge over the full stream.
    """

    def tag(ds, side: int, id_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_col: batch[key_col],
                    "tus": pa.array(_ts_us(batch[ts_col])),
                    "rid": batch[id_col],
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8)
                    ),
                }
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    from ..stages.util import coalesce_for_shuffle

    unioned = coalesce_for_shuffle(tag(left_ds, 0, left_id), 0.25).union(
        coalesce_for_shuffle(tag(right_ds, 1, right_id), 0.25)
    )

    _empty = pa.table(
        {left_id: pa.array([], pa.int64()), right_id: pa.array([], pa.int64())}
    )

    def per_key(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        lmask = side == 0
        if not lmask.any() or lmask.all():
            return _empty
        tus = g["tus"].to_numpy()
        rid = g["rid"].to_numpy()
        lt, lid_ = tus[lmask], rid[lmask]
        rt, rid_ = tus[~lmask], rid[~lmask]
        order = np.lexsort((rid_, rt))
        rt, rid_ = rt[order], rid_[order]
        pos = np.searchsorted(rt, lt, side="right") - 1
        keep = pos >= 0
        return pa.table(
            {
                left_id: pa.array(lid_[keep].astype(np.int64)),
                right_id: pa.array(rid_[pos[keep]].astype(np.int64)),
            }
        )

    return unioned.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
