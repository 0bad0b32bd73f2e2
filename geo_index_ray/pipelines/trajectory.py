"""Trajectory analytics over keyed event streams.

The reference engine indexes static points and boxes
(reference src/rtree/builder.rs, src/kdtree/builder.rs); a moving-object
workload additionally needs ORDERED per-entity analytics: how far did
each entity move, which grid cells does traffic flow between, and where
did an entity sit still.  These three operators share one distributed
shape:

  project lean columns → shuffle ONCE under ``rkey = hash(user) % R``
  → per-reducer vectorized multi-user pass (lexsort by (user, ts, id),
  adjacent-row diffs, run-length segment cuts — the sessionize recipe,
  ``events.py:sessionize``).

All geometry derives from the shared integer milli-degree grid
(:mod:`..functions.geocode`), and every reported aggregate is either an
int64 sum of int64 terms or a count, so results are hash-exact against
the DuckDB window-function twins — no order-dependent float sums.

Scale shape: one exchange of 40 B/row (rkey, user, tus, id, mx, my);
reducers never see more than one coarse key's users; outputs are
entity- or cell-bounded, never corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import geocode
from ..kernels import cells as cellmod
from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of
from .events import _ts_us


def _project(ds, user_col: str, ts_col: str, key_col: str, res: int | None,
             R: int):
    """Lean pre-shuffle projection: routing key, user, epoch-us, tiebreak
    id, and either milli-degree coords (res None) or the flat cell id."""

    def stage(batch: pa.Table) -> pa.Table:
        uid = batch[user_col]
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "rkey": pa.array(rkey_of(uid, R)),
            user_col: uid,
            "tus": pa.array(_ts_us(batch[ts_col])),
            key_col: batch[key_col],
        }
        if res is None:
            cols["mx"] = pa.array(geocode.derive_ilon_md(key))
            cols["my"] = pa.array(geocode.derive_ilat_md(key))
        else:
            cols["cell"] = pa.array(
                cellmod.flat_cell_id(
                    geocode.derive_lon(key), geocode.derive_lat(key), res
                )
            )
        return pa.table(cols)

    return coalesce_for_shuffle(
        ds.map_batches(stage, batch_format="pyarrow"), 0.25
    )


def _sorted_cols(g: pa.Table, user_col: str, key_col: str, *extra: str):
    """lexsort a reducer group by (user, ts, id); return sorted arrays."""
    uid = g[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tus = g["tus"].to_numpy(zero_copy_only=False)
    eid = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, tus, uid))
    out = [uid[order], tus[order]]
    for name in extra:
        out.append(g[name].to_numpy(zero_copy_only=False)[order])
    return out


def trajectory_stats(ds, user_col: str = "user_id", ts_col: str = "ts",
                     key_col: str = "event_id"):
    """Per-entity movement summary over the derived milli-degree grid.

    A *leg* is a pair of consecutive events of the same user in
    (ts, id) order; its squared length ``dx² + dy²`` (milli-degrees) is
    an exact int64 (|d| < 360 000 so a term < 2.6·10¹¹; int64 holds
    ~3.5·10⁷ legs per user before overflow — far beyond any event
    stream).  Output per user with ≥ 1 leg:

        (user, n_legs, path_sq_md = Σ leg², max_leg_sq_md = max leg²)

    max_leg is the GPS-jump / teleport detector; path_sq the movement
    magnitude.  Exact counterpart of the SQL ``LAG`` twin
    (:func:`sql_trajectory_stats`).
    """
    R = reducer_count()
    lean = _project(ds, user_col, ts_col, key_col, None, R)

    def reducer(g: pa.Table) -> pa.Table:
        u, _, mx, my = _sorted_cols(g, user_col, key_col, "mx", "my")
        same = u[1:] == u[:-1]
        dx = (mx[1:] - mx[:-1])[same]
        dy = (my[1:] - my[:-1])[same]
        leg = dx * dx + dy * dy
        owner = u[1:][same]
        if len(owner) == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "n_legs": pa.array([], pa.int64()),
                    "path_sq_md": pa.array([], pa.int64()),
                    "max_leg_sq_md": pa.array([], pa.int64()),
                }
            )
        # per-user segment sums: owners are contiguous after the lexsort
        starts = np.nonzero(np.r_[True, owner[1:] != owner[:-1]])[0]
        ends = np.r_[starts[1:], len(owner)]
        sums = np.add.reduceat(leg, starts)
        maxs = np.maximum.reduceat(leg, starts)
        return pa.table(
            {
                user_col: pa.array(owner[starts]),
                "n_legs": pa.array(ends - starts),
                "path_sq_md": pa.array(sums),
                "max_leg_sq_md": pa.array(maxs),
            }
        )

    return lean.groupby("rkey").map_groups(reducer, batch_format="pyarrow")


def sql_trajectory_stats(table: str, user_col: str = "user_id",
                         key_col: str = "event_id") -> str:
    mx = geocode.sql_ilon_md(key_col)
    my = geocode.sql_ilat_md(key_col)
    return f"""
WITH p AS (SELECT {user_col}, ts, {key_col}, {mx} AS mx, {my} AS my
           FROM {table}),
l AS (
  SELECT {user_col},
         mx - LAG(mx) OVER w AS dx,
         my - LAG(my) OVER w AS dy
  FROM p WINDOW w AS (PARTITION BY {user_col} ORDER BY ts, {key_col})
)
SELECT {user_col}, CAST(COUNT(*) AS BIGINT) AS n_legs,
       CAST(SUM(dx*dx + dy*dy) AS BIGINT) AS path_sq_md,
       CAST(MAX(dx*dx + dy*dy) AS BIGINT) AS max_leg_sq_md
FROM l WHERE dx IS NOT NULL GROUP BY {user_col}
"""


def od_matrix(ds, res: int, user_col: str = "user_id", ts_col: str = "ts",
              key_col: str = "event_id"):
    """Origin–destination flow matrix at grid resolution ``res``: how many
    consecutive-event transitions go from cell A to cell B, over all
    users.  The classic mobility-mining aggregate (flows between zones).

    Self-transitions (A → A) are kept — they are the stationarity mass a
    flow normalization needs; :func:`dwell_segments` details them.

    Two-level reduce: the per-reducer pass emits (from_cell, to_cell,
    partial n) via one np.unique over packed pair codes, then a final
    ``groupby(from,to).sum`` over at most R × (cells²) tiny partial rows
    — nothing user- or event-scaled crosses the second exchange.
    """
    R = reducer_count()
    lean = _project(ds, user_col, ts_col, key_col, res, R)
    n_cells = np.int64(1) << np.int64(2 * res)  # flat ids < 2^res * 2^res

    def reducer(g: pa.Table) -> pa.Table:
        u, _, cell = _sorted_cols(g, user_col, key_col, "cell")
        same = u[1:] == u[:-1]
        frm = cell[:-1][same]
        to = cell[1:][same]
        code, n = np.unique(frm * n_cells + to, return_counts=True)
        return pa.table(
            {
                "from_cell": pa.array(code // n_cells),
                "to_cell": pa.array(code % n_cells),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    partials = lean.groupby("rkey").map_groups(reducer, batch_format="pyarrow")
    return (
        partials.groupby(["from_cell", "to_cell"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["from_cell", "to_cell", "n_trips"]),
            batch_format="pyarrow",
        )
    )


def sql_od_matrix(table: str, res: int, user_col: str = "user_id",
                  key_col: str = "event_id") -> str:
    lon = geocode.sql_lon(key_col)
    lat = geocode.sql_lat(key_col)
    cell = geocode.sql_flat_cell("x", "y", res)
    return f"""
WITH p AS (SELECT {user_col}, ts, {key_col}, {lon} AS x, {lat} AS y
           FROM {table}),
c AS (SELECT {user_col}, ts, {key_col}, {cell} AS cell FROM p),
l AS (
  SELECT LAG(cell) OVER (PARTITION BY {user_col}
                         ORDER BY ts, {key_col}) AS from_cell,
         cell AS to_cell
  FROM c
)
SELECT from_cell, to_cell, CAST(COUNT(*) AS BIGINT) AS n_trips
FROM l WHERE from_cell IS NOT NULL GROUP BY from_cell, to_cell
"""


def dwell_segments(ds, res: int, min_events: int = 2,
                   user_col: str = "user_id", ts_col: str = "ts",
                   key_col: str = "event_id"):
    """Stay-point detection: maximal runs of consecutive events (per user,
    (ts, id) order) that fall in the SAME grid cell — where an entity
    lingered.  Output one row per run with ≥ ``min_events`` events:

        (user, seg_seq, cell, n_events, dur_us)

    ``seg_seq`` is the run's 1-based ordinal among ALL of the user's runs
    (including runs below ``min_events``, so ordinals are stable under
    the filter); ``dur_us`` = last-event ts − first-event ts, exact int64
    microseconds.  Gaps-and-islands in one vectorized reducer pass — the
    SQL twin uses the standard LAG-break + running-SUM island id.
    """
    R = reducer_count()
    lean = _project(ds, user_col, ts_col, key_col, res, R)

    def reducer(g: pa.Table) -> pa.Table:
        u, t, cell = _sorted_cols(g, user_col, key_col, "cell")
        if len(u) == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "seg_seq": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "dur_us": pa.array([], pa.int64()),
                }
            )
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = np.r_[True, cell[1:] != cell[:-1]] | new_user
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(u)] - 1
        seg_ord = np.arange(len(starts), dtype=np.int64)
        user_first = np.nonzero(new_user[starts])[0]
        first_of_user = np.repeat(
            seg_ord[user_first], np.diff(np.r_[user_first, len(starts)])
        )
        n_ev = ends - starts + 1
        keep = n_ev >= min_events
        return pa.table(
            {
                user_col: pa.array(u[starts][keep]),
                "seg_seq": pa.array((seg_ord - first_of_user + 1)[keep]),
                "cell": pa.array(cell[starts][keep]),
                "n_events": pa.array(n_ev[keep]),
                "dur_us": pa.array(t[ends][keep] - t[starts][keep]),
            }
        )

    return lean.groupby("rkey").map_groups(reducer, batch_format="pyarrow")


def sql_dwell_segments(table: str, res: int, min_events: int = 2,
                       user_col: str = "user_id",
                       key_col: str = "event_id") -> str:
    lon = geocode.sql_lon(key_col)
    lat = geocode.sql_lat(key_col)
    cell = geocode.sql_flat_cell("x", "y", res)
    return f"""
WITH p AS (SELECT {user_col}, ts, {key_col}, {lon} AS x, {lat} AS y
           FROM {table}),
c AS (SELECT {user_col}, ts, {key_col}, {cell} AS cell FROM p),
f AS (
  SELECT *,
         CASE WHEN LAG(cell) OVER w IS DISTINCT FROM cell
              THEN 1 ELSE 0 END AS brk
  FROM c WINDOW w AS (PARTITION BY {user_col} ORDER BY ts, {key_col})
),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY {user_col} ORDER BY ts, {key_col}
                           ROWS UNBOUNDED PRECEDING) AS seg
  FROM f
)
SELECT {user_col}, CAST(seg AS BIGINT) AS seg_seq, cell,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
FROM g GROUP BY {user_col}, seg, cell
HAVING COUNT(*) >= {min_events}
"""


def state_transitions(ds, state_col: str, user_col: str = "user_id",
                      ts_col: str = "ts", key_col: str = "event_id"):
    """First-order Markov transition counts over a categorical column:
    how often does state A follow state B in a user's (ts, id)-ordered
    stream — the training aggregate for next-event models and the
    behavioral analogue of :func:`od_matrix` (which this generalizes to
    string states).

    Output (from_state, to_state, n_trans), exact int64.  Per-reducer
    partials dictionary-encode each side and count packed code pairs in
    one np.unique; only (state, state, n) rows — state-vocabulary
    bounded — cross the second exchange.
    """
    R = reducer_count()

    def project(batch: pa.Table) -> pa.Table:
        uid = batch[user_col]
        return pa.table(
            {
                "rkey": pa.array(rkey_of(uid, R)),
                user_col: uid,
                "tus": pa.array(_ts_us(batch[ts_col])),
                key_col: batch[key_col],
                state_col: batch[state_col],
            }
        )

    lean = coalesce_for_shuffle(
        ds.map_batches(project, batch_format="pyarrow"), 0.25
    )

    def reducer(g: pa.Table) -> pa.Table:
        uid = g[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tus = g["tus"].to_numpy(zero_copy_only=False)
        eid = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, tus, uid))
        u = uid[order]
        st = g[state_col]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        st = st.take(pa.array(order))
        dic = pc.dictionary_encode(st)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        same = u[1:] == u[:-1]
        frm = codes[:-1][same]
        to = codes[1:][same]
        nv = np.int64(max(len(dic.dictionary), 1))
        pair, n = np.unique(frm * nv + to, return_counts=True)
        return pa.table(
            {
                "from_state": dic.dictionary.take(pa.array(pair // nv)),
                "to_state": dic.dictionary.take(pa.array(pair % nv)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    partials = lean.groupby("rkey").map_groups(reducer, batch_format="pyarrow")
    return (
        partials.groupby(["from_state", "to_state"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["from_state", "to_state", "n_trans"]),
            batch_format="pyarrow",
        )
    )


def sql_state_transitions(table: str, state_col: str,
                          user_col: str = "user_id",
                          key_col: str = "event_id") -> str:
    return f"""
WITH l AS (
  SELECT LAG({state_col}) OVER (PARTITION BY {user_col}
                                ORDER BY ts, {key_col}) AS from_state,
         {state_col} AS to_state
  FROM {table}
)
SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_trans
FROM l WHERE from_state IS NOT NULL GROUP BY 1, 2
"""
