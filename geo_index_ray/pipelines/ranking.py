"""Per-group ranking and stratified sampling operators.

Training-data-curation shapes: keep the top-k rows per group (best-k
documents per language/domain) and deterministic per-stratum sampling
(rebalance a corpus by language without a shuffle).  Both are single
map_batches passes plus (for top-k) one small groupby over per-batch
survivors — the shuffle never carries more than k rows per (group,
input block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _topk_table(batch: pa.Table, key_col: str, order_col: str, id_col: str,
                k: int, with_rank: bool) -> pa.Table:
    """Rows with rank < k per key under (order_col DESC, id_col ASC) —
    one lexsort, first-occurrence rank, no per-group Python."""
    keys = batch[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = pc.dictionary_encode(keys).indices.to_numpy(zero_copy_only=False)
    order = batch[order_col].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    # sort by (key, order DESC, id ASC).  Descending integers negate IN
    # int64 (~a is order-reversing and exact at any magnitude) — a
    # float64 cast would collapse distinct values above 2^53 (ns-epoch
    # timestamps, hash ids) and mis-rank; floats negate in their dtype
    if order.dtype.kind in "iMm":
        # datetime64/timedelta64 are int64 under the hood — same exact path
        neg = np.bitwise_not(order.view(np.int64) if order.dtype.kind in "Mm"
                             else order.astype(np.int64))
    elif order.dtype.kind == "u":
        neg = np.iinfo(order.dtype).max - order
    else:
        neg = -order.astype(np.float64)
    perm = np.lexsort((ids, neg, codes))
    ck = codes[perm]
    first = np.searchsorted(ck, ck, side="left")
    rank = np.arange(len(ck)) - first
    sel = rank < k
    # emit in (key, order DESC, id) order — ranks align positionally
    out = batch.take(pa.array(perm[sel]))
    if not with_rank:
        return out
    return out.append_column("rnk", pa.array(rank[sel] + 1))


def grouped_topk(ds, key_col: str, order_col: str, id_col: str, k: int):
    """Top-k rows per key by (order_col DESC, id_col ASC), with a 1-based
    ``rnk`` column — ROW_NUMBER() OVER (PARTITION BY key ORDER BY order
    DESC, id) <= k semantics.

    Per-batch pre-filter keeps ≤ k rows per key per block, so the
    groupby exchange is bounded by k × blocks per key regardless of group
    size; survivors shuffle under COARSE keys (``hash(key) %
    reducer_count`` — never one Python call per key) and each reducer
    re-ranks all of its keys exactly in one lexsort (the dictionary
    codes inside ``_topk_table`` group keys exactly; the hash only
    routes, so collisions are harmless).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        out = _topk_table(batch, key_col, order_col, id_col, k, False)
        return out.append_column("rkey", pa.array(rkey_of(out[key_col], R)))

    survivors = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.5
    )

    def final(g: pa.Table) -> pa.Table:
        return _topk_table(
            g.drop_columns(["rkey"]), key_col, order_col, id_col, k, True
        )

    return survivors.groupby("rkey").map_groups(final, batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, id_col: str,
                      rates: dict[str, float], default_rate: float = 0.0):
    """Deterministic per-stratum sample: keep a row iff
    ``(id * golden64) mod 2^64 < floor(rate[stratum] * 2^64)``.

    Reproducible under any partitioning / retry (pure function of the
    row), no shuffle, and SQL-twin-expressible with the same HUGEINT
    arithmetic as the flat ``sample_docs`` query.
    """
    strata = list(rates)
    thresholds = {
        s: np.uint64(min(int(rates[s] * 2.0**64), 2**64 - 1)) for s in strata
    }
    default_thr = np.uint64(min(int(default_rate * 2.0**64), 2**64 - 1))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * _GOLDEN
        col = batch[stratum_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dic = pc.dictionary_encode(col)
        lut = np.array(
            [thresholds.get(v.as_py(), default_thr) for v in dic.dictionary],
            dtype=np.uint64,
        )
        thr = (
            lut[dic.indices.to_numpy(zero_copy_only=False)]
            if len(lut)
            else np.empty(0, np.uint64)
        )
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def sql_threshold(rate: float) -> int:
    """The oracle-side integer threshold for ``rate`` (same floor)."""
    return min(int(rate * 2.0**64), 2**64 - 1)


def ntile_bins(ds, value_col: str, id_col: str, k: int):
    """Equal-frequency binning (SQL ``NTILE(k) OVER (ORDER BY value,
    id)``) without a global sort — curriculum/quality bucketing for
    training-data pipelines.

    Two-pass distributed exact rank (same shape as
    ``text.pack_sequences``'s prefix sum and
    ``partition.spatial_partition``'s Hilbert rank):

    - pass 1: per-``value`` row counts via per-batch ``np.unique``
      combiners then a value-keyed groupby; the driver holds one
      (value, count) row per DISTINCT value (exclusive cumsum → the
      global base rank of each value) and broadcasts it.  Distinct-value
      cardinality bounds driver memory — right for discrete scores
      (lengths, quality levels); for continuous scores quantize first or
      use ``events.grouped_quantiles_sketch``.
    - pass 2: ONE lean shuffle of ``(value, id)`` (16 B/row) keyed on
      ``hash(value) % R`` — all rows of a value land in one reducer,
      which ranks every one of its values in a single lexsort and applies
      the NTILE split (first ``n % k`` bins get ``⌈n/k⌉`` rows).

    Returns ``(id, value, bin)`` with ``bin`` in 1..k.
    """
    import ray

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def count_partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq), "c": pa.array(cnt.astype(np.int64))})

    hist = (
        ds.map_batches(count_partial, batch_format="pyarrow").groupby("v").sum("c")
    )
    vs, cs = [], []
    for b in hist.iter_batches(batch_format="pyarrow"):
        vs.append(b["v"].to_numpy())
        cs.append(b["sum(c)"].to_numpy())
    vs = np.concatenate(vs) if vs else np.zeros(0, np.int64)
    cs = np.concatenate(cs) if cs else np.zeros(0, np.int64)
    order = np.argsort(vs)
    vs, cs = vs[order], cs[order]
    base = np.r_[np.int64(0), np.cumsum(cs)[:-1]]
    n_total = int(cs.sum())
    ref = ray.put((vs, base))

    q, rem = divmod(n_total, max(k, 1))
    boundary = rem * (q + 1)

    def lean(batch: pa.Table) -> pa.Table:
        from ..stages.util import rkey_of

        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "rkey": pa.array(rkey_of(v, R)),
                "v": pa.array(v),
                id_col: batch[id_col],
            }
        )

    lean_ds = coalesce_for_shuffle(ds.map_batches(lean, batch_format="pyarrow"), 0.5)

    _empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "bin": pa.array([], pa.int64()),
        }
    )

    def bin_reducer(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        vs_g, base_g = ray.get(ref)
        v = g["v"].to_numpy()
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, v))
        v_s, id_s = v[order], ids[order]
        run_start = np.r_[True, v_s[1:] != v_s[:-1]]
        starts = np.nonzero(run_start)[0]
        seglen = np.diff(np.r_[starts, len(v_s)])
        within = np.arange(len(v_s)) - np.repeat(starts, seglen)
        rank = base_g[np.searchsorted(vs_g, v_s)] + within
        bins = np.where(
            rank < boundary,
            rank // max(q + 1, 1),
            rem + (rank - boundary) // max(q, 1),
        ) + 1
        return pa.table(
            {
                id_col: pa.array(id_s),
                value_col: pa.array(v_s),
                "bin": pa.array(bins.astype(np.int64)),
            }
        )

    return lean_ds.groupby("rkey").map_groups(bin_reducer, batch_format="pyarrow")


def sql_ntile_bins(table: str, value_col: str, id_col: str, k: int) -> str:
    """DuckDB twin of :func:`ntile_bins`."""
    return f"""
        SELECT {id_col}, {value_col},
               CAST(NTILE({k}) OVER (ORDER BY {value_col}, {id_col}) AS BIGINT)
                 AS bin
        FROM {table}
    """


def _skyline_kernel(ids: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Boolean keep-mask of the 2-D Pareto frontier (minimize ``x``,
    maximize ``y``) in original row order.  A row is dominated iff some
    row has x' <= x and y' >= y with one inequality strict; duplicate
    (x, y) points never dominate each other, so all survive together.

    One lexsort (x asc, y desc): within an x-group the first row carries
    the group max; a row survives iff its y beats the running max over
    all STRICTLY cheaper groups AND equals its own group's max.
    """
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    if y.dtype.kind in "iu":
        yk = y.astype(np.int64)
        ydesc = np.bitwise_not(yk)  # exact at any magnitude
        lo = np.iinfo(np.int64).min
    else:
        yk = y.astype(np.float64)
        ydesc = -yk
        lo = -np.inf
    perm = np.lexsort((ids, ydesc, x))
    xs, ys = x[perm], yk[perm]
    new = np.empty(n, dtype=bool)
    new[:1] = True
    new[1:] = xs[1:] != xs[:-1]
    gidx = np.cumsum(new) - 1
    gmax = ys[new]
    prev = np.empty(len(gmax), gmax.dtype)
    prev[0] = lo
    np.maximum.accumulate(gmax[:-1], out=prev[1:])
    keep[perm] = (ys > prev[gidx]) & (ys == gmax[gidx])
    return keep


def skyline(ds, id_col: str, min_col: str, max_col: str):
    """2-D skyline (Pareto frontier): rows not dominated on
    (minimize ``min_col``, maximize ``max_col``) — the cheapest-for-its-
    quality query behind price/performance sweeps and data-mixture
    frontier picks.  Returns (id_col, min_col, max_col).

    Scale shape: dominance is transitive through the frontier, so each
    block prunes LOCALLY first (every global skyline row survives its
    own block's prune — nothing in the block dominates it) and only the
    per-block frontiers — expected O(log block_rows) rows each on
    independent dimensions — reach the single final prune, which runs
    the identical kernel once over the candidate union.  The corpus is
    read once and never shuffled; no driver-side loops.
    """
    cols = [id_col, min_col, max_col]

    def local(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        x = batch[min_col].to_numpy(zero_copy_only=False)
        y = batch[max_col].to_numpy(zero_copy_only=False)
        return batch.select(cols).filter(pa.array(_skyline_kernel(ids, x, y)))

    cand = ds.map_batches(local, batch_format="pyarrow").repartition(1)

    def final(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        x = batch[min_col].to_numpy(zero_copy_only=False)
        y = batch[max_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_skyline_kernel(ids, x, y)))

    return cand.map_batches(final, batch_format="pyarrow", batch_size=None)


def mode_per_key(ds, key_col: str, value_col: str,
                 out_val: str = "top_value", out_cnt: str = "cnt"):
    """Per-key mode: the most frequent ``value_col`` for every key, ties
    broken by the lexicographically smallest value (ROW_NUMBER ... ORDER
    BY cnt DESC, value semantics).  Returns (key_col, out_val, out_cnt).

    Scale shape: each block run-length-compresses to per-(key, value)
    partial counts with one lexsort (no Python per row); one lean
    hash(key) exchange of (key, value, cnt) partials — bounded by
    distinct pairs per block, never rows; each reducer merges and ranks
    ALL of its keys in two vectorized passes (rule 3).  Values are
    factorized to sorted codes inside the reducer so the tie-break
    compares integers, not strings, in the hot lexsort.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def _compress(key: np.ndarray, vcode: np.ndarray, cnt: np.ndarray):
        """Sum ``cnt`` over runs of equal (key, vcode); returns the
        compressed (key, vcode, cnt) triple sorted by (key, vcode)."""
        perm = np.lexsort((vcode, key))
        ks, vs, cs = key[perm], vcode[perm], cnt[perm]
        new = np.empty(len(ks), dtype=bool)
        new[:1] = True
        new[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        seg = np.cumsum(new) - 1
        # int64 scatter-add (np.bincount(weights=...) sums in float64,
        # which silently loses exactness past 2^53)
        sums = np.zeros(int(seg[-1]) + 1, np.int64)
        np.add.at(sums, seg, cs)
        return ks[new], vs[new], sums

    def partial(batch: pa.Table) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, vcode = np.unique(
            batch[value_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        ks, vs, cs = _compress(key, vcode, np.ones(len(key), np.int64))
        return pa.table(
            {
                key_col: pa.array(ks),
                value_col: pa.array(vals[vs]),
                "cnt": pa.array(cs),
                "rkey": pa.array(rkey_of(ks, R)),
            }
        )

    parts = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.25
    )

    def rank(g: pa.Table) -> pa.Table:
        key = g[key_col].to_numpy(zero_copy_only=False)
        vals, vcode = np.unique(
            g[value_col].to_numpy(zero_copy_only=False), return_inverse=True
        )
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        ks, vs, cs = _compress(key, vcode, cnt)
        # (cnt desc, value asc) within key; first row per key wins
        perm = np.lexsort((vs, np.bitwise_not(cs), ks))
        ko = ks[perm]
        first = np.empty(len(ko), dtype=bool)
        first[:1] = True
        first[1:] = ko[1:] != ko[:-1]
        sel = perm[first]
        return pa.table(
            {
                key_col: pa.array(ks[sel]),
                out_val: pa.array(vals[vs[sel]]),
                out_cnt: pa.array(cs[sel]),
            }
        )

    return parts.groupby("rkey").map_groups(rank, batch_format="pyarrow")


_NS_A = 48271    # MINSTD — same public LCG family as functions/geocode
_NS_B = 16807
_NS_MOD = 2147483647


def negative_samples(pos_ds, user_col: str, item_col: str, n_items: int,
                     k: int, m_factor: int = 4):
    """Deterministic negative sampling for recommender / contrastive
    training sets: for every user in ``pos_ds`` (a (user, item) positives
    Dataset), emit up to ``k`` items the user did NOT interact with,
    reproducibly — the same (user, item, rnk) rows on every run, cluster
    layout, and engine, so the SQL oracle can regenerate them.

    Candidates come from a keyed LCG, ``item = ((u·A + (slot+1)·B)
    mod 2³¹−1) mod n_items`` for slot = 0..m−1 (m = m_factor·k) — item
    ids land in [0, n_items), the same dense id space as the data, and
    the anti-join packs with stride n_items+1 (``u·(n_items+1) + item``)
    so a 1-based data id space (positives with item == n_items) cannot
    alias the next user's item 0 and silently drop valid negatives; each
    user's duplicate candidate items collapse to their smallest slot
    (one np.unique — all of a user's slots are generated in one batch
    row-expansion); positives are removed with the lean anti
    :func:`~.relational.hash_join` on the packed key ``u·n_items +
    item``; survivors rank by slot via :func:`~..stages.util.topk_per_group`.
    Users whose m candidates all collide with positives yield < k rows —
    identically on both sides.

    Bounds (documented, asserted): ``u·n_items`` and ``u·A`` must fit
    int64 — u < 2⁶³/max(n_items, A) (10⁹ users × 10⁷ items is fine).

    Scale shape: positives are projected to the two id columns
    (16 B/row) and materialized ONCE — they feed both the distinct-user
    groupby and the anti-join, and a lazy input would re-run its whole
    upstream derivation (e.g. the orders⋈lineitem join) per consumer
    (measured 10.3 → 7.7 s at sf0.1/8cpu).  Object-store resident,
    spills under pressure — the same lean-table trade as the graph
    ops' edge lists; candidates are m rows per DISTINCT user (never
    per event); nothing is broadcast.
    """
    from ..stages.util import topk_per_group
    from .relational import hash_join

    m = m_factor * k
    pos_ds = pos_ds.select_columns([user_col, item_col]).materialize()
    users = pos_ds.groupby(user_col).count()

    # pack stride n_items+1: candidates are 0-based (item < n_items) but
    # DATA item ids may legitimately reach n_items (1-based id spaces),
    # and u*(n_items)+n_items would alias user u+1's item 0
    stride = np.int64(int(n_items) + 1)

    def expand(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u):
            umax = int(u.max())
            lim = (2**63 - 1) // max(int(stride), _NS_A)
            assert 0 <= int(u.min()) and umax <= lim, (
                f"negative_samples: user id {umax} would overflow int64 "
                f"in u*A / u*stride+item (limit {lim})"
            )
        uu = np.repeat(u, m)
        slot = np.tile(np.arange(m, dtype=np.int64), len(u))
        item = ((uu * _NS_A + (slot + 1) * _NS_B) % _NS_MOD) % n_items
        packed = uu * stride + item
        order = np.lexsort((slot, packed))
        pk = packed[order]
        keep = np.r_[True, pk[1:] != pk[:-1]]  # min slot per (user, item)
        sel = order[keep]
        return pa.table(
            {
                user_col: pa.array(uu[sel]),
                item_col: pa.array(item[sel]),
                "slot": pa.array(slot[sel]),
                "ck": pa.array(packed[sel]),
            }
        )

    cands = users.map_batches(expand, batch_format="pyarrow")

    def pos_key(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        it = batch[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u):
            lim = (2**63 - 1) // max(int(stride), _NS_A)
            assert 0 <= int(u.min()) and int(u.max()) <= lim, (
                "negative_samples: user id overflows the packed "
                f"u*stride+item key (limit {lim})"
            )
            assert 0 <= int(it.min()) and int(it.max()) <= int(n_items), (
                "negative_samples: positive item id outside [0, n_items] "
                "would alias another user's packed key"
            )
        return pa.table({"ck": pa.array(u * stride + it)})

    pos_keys = pos_ds.map_batches(pos_key, batch_format="pyarrow")
    surv = hash_join(
        cands, pos_keys, "ck", "ck",
        [user_col, item_col, "slot"], [], how="anti",
    )
    return topk_per_group(
        surv, user_col, k, ["slot"], [False],
        [user_col, item_col, "slot"], rank_col="rnk",
    )


def sql_negative_samples(pos_cte: str, user_col: str, item_col: str,
                         n_items_sql: str, k: int, m_factor: int = 4) -> str:
    """DuckDB twin of :func:`negative_samples`.  ``pos_cte`` yields
    (u, it) positives; ``n_items_sql`` is a scalar subquery for the item
    count."""
    m = m_factor * k
    return f"""
WITH pos AS ({pos_cte}),
np AS (SELECT {n_items_sql} AS n),
uu AS (SELECT DISTINCT u FROM pos),
cand AS (
  SELECT uu.u, CAST(t.i AS BIGINT) AS slot,
         ((uu.u * {_NS_A} + (t.i + 1) * {_NS_B}) % {_NS_MOD}) % np.n
           AS it
  FROM uu CROSS JOIN np, unnest(range(0, {m})) AS t(i)
),
cd AS (SELECT u, it, MIN(slot) AS slot FROM cand GROUP BY 1, 2),
surv AS (
  SELECT cd.* FROM cd
  WHERE NOT EXISTS (SELECT 1 FROM pos WHERE pos.u = cd.u AND pos.it = cd.it)
)
SELECT u AS {user_col}, it AS {item_col}, slot, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY slot)
                 AS BIGINT) AS rnk
  FROM surv
) WHERE rnk <= {k}
"""


#: auto-switch ceiling for the (key, value)-pair broadcast used by
#: rank_in_group / percent_rank_in_group: past this many DISTINCT pairs
#: the driver-side collect + ray.put is the documented OOM wall, and the
#: key-sheltered shuffle-join path takes over.  2M pairs ≈ 50-100 MB of
#: lut — comfortably broadcastable; the gate MEASURES the histogram (a
#: one-row-per-block count), never guesses.
RANK_BROADCAST_MAX_PAIRS = 2_000_000

_JK_SEP = "\x1f"
_JK_NULL = "\x00\x00<null-key>"


def _pair_hist(ds, key_col: str, value_col: str):
    """(key, v) → cnt histogram Dataset (column ``cnt``) plus its
    measured row count — the size signal both window functions gate on.
    Materialized: it is value-domain-bounded and feeds two consumers."""

    hist = (
        ds.map_batches(
            lambda b: pa.table({key_col: b[key_col], "v": b[value_col]}),
            batch_format="pyarrow",
        )
        .groupby([key_col, "v"])
        .count()
    )

    def rename_cnt(b: pa.Table) -> pa.Table:
        names = [key_col, "v"] + ["cnt"] * (b.num_columns - 2)
        return b.rename_columns(names)

    hist = hist.map_batches(rename_cnt, batch_format="pyarrow").materialize()
    return hist, hist.count()


def _pair_jk(key_arr, v_arr) -> pa.Array:
    """Exact (key, value) join key as a single string column — both the
    histogram and the corpus build it through the SAME Arrow casts, so
    equality is representation-stable (ints exact; floats via Arrow's
    shortest-roundtrip repr on both sides).  NULL keys map to a reserved
    sentinel no real key produces, so they join nothing (SQL-null-ish:
    the left join leaves their rank NULL)."""
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()
    if isinstance(v_arr, pa.ChunkedArray):
        v_arr = v_arr.combine_chunks()
    k = key_arr if pa.types.is_string(key_arr.type) else pc.cast(key_arr, pa.string())
    v = pc.cast(v_arr, pa.string())
    jk = pc.binary_join_element_wise(k, v, _JK_SEP)
    return pc.fill_null(jk, _JK_NULL)


def _rank_join_path(ds, hist_ds, key_col: str, value_col: str, id_col: str,
                    mode: str, out_col: str):
    """Key-sheltered shuffle-join pass 2 for rank / percent_rank.

    The HISTOGRAM (not the corpus) takes one hash(key) exchange; each
    reducer sorts all of its keys' (key, v, cnt) rows at once and turns
    counts into segmented exclusive prefix sums (= rank − 1) plus
    per-key totals.  The corpus then inner-resolves its exact (key,
    value) pair against that table through the lean shared-slot
    ``hash_join`` (left join: null-key rows keep a NULL window value).
    Skew ceiling: one KEY's distinct values must fit a reducer — the
    same PARTITION BY locality contract as ntile_in_group, but on the
    value-domain-bounded histogram, never corpus rows.
    """
    from ..stages.util import reducer_count, rkey_of
    from .relational import hash_join

    R = reducer_count()

    def key_hist(batch: pa.Table) -> pa.Table:
        # null keys have no rank partition on the broadcast path either
        batch = batch.filter(pc.is_valid(batch[key_col]))
        return batch.append_column("rkey", pa.array(rkey_of(batch[key_col].combine_chunks() if isinstance(batch[key_col], pa.ChunkedArray) else batch[key_col], R)))

    def rank_rows(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), ("v", "ascending")]
        )
        t = g.take(idx)
        kcol = t[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        codes = pc.dictionary_encode(kcol).indices.to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy().astype(np.int64)
        newk = np.r_[True, codes[1:] != codes[:-1]]
        cum = np.cumsum(cnt) - cnt  # running exclusive prefix, unsegmented
        seg_id = np.cumsum(newk) - 1
        prefix = cum - cum[newk][seg_id]
        totals = np.add.reduceat(cnt, np.flatnonzero(newk))
        return pa.table(
            {
                "jk": _pair_jk(kcol, t["v"]),
                "rnk": pa.array(prefix + 1),
                "n": pa.array(totals[seg_id]),
            }
        )

    ranks = (
        hist_ds.map_batches(key_hist, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(rank_rows, batch_format="pyarrow")
    )

    def corpus_jk(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                value_col: batch[value_col],
                "jk": _pair_jk(batch[key_col], batch[value_col]),
            }
        )

    joined = hash_join(
        ds.map_batches(corpus_jk, batch_format="pyarrow"),
        ranks, "jk", "jk",
        [id_col, key_col, value_col], ["rnk", "n"], how="left",
    )

    if mode == "rank":
        def finish(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: b[id_col],
                    key_col: b[key_col],
                    value_col: b[value_col],
                    out_col: pc.cast(b["rnk"], pa.int64()),
                }
            )
    else:
        def finish(b: pa.Table) -> pa.Table:
            rnk = b["rnk"].to_numpy(zero_copy_only=False).astype(np.float64)
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                pr = np.where(n > 1.0, (rnk - 1.0) / (n - 1.0), 0.0)
            pr[np.isnan(rnk)] = np.nan  # null-key rows stay null
            return pa.table(
                {
                    id_col: b[id_col],
                    key_col: b[key_col],
                    value_col: b[value_col],
                    out_col: pa.array(pr, pa.float64(), from_pandas=True),
                }
            )

    return joined.map_batches(finish, batch_format="pyarrow")


def rank_in_group(ds, key_col: str, value_col: str, id_col: str,
                  rank_col: str = "rnk", *,
                  max_broadcast_pairs: int = RANK_BROADCAST_MAX_PAIRS,
                  force_join_path: bool = False):
    """Distributed ``RANK() OVER (PARTITION BY key ORDER BY value)`` —
    one output row PER INPUT ROW (unlike :func:`grouped_topk`), the
    window function behind percentile features and keep-best-rank dedup.

    Rank = 1 + count of same-key rows with strictly smaller value, ties
    share (SQL RANK, not ROW_NUMBER — a per-row tiebreak would need a
    total order the histogram can't see).

    Two passes: pass 1 reduces (key, value) → count through a native
    groupby (value-DOMAIN-bounded, not corpus-bounded).  The pass-2 plan
    is SIZE-GATED on the histogram's measured row count:

    - ``pairs ≤ max_broadcast_pairs`` (the common case): broadcast
      per-key sorted values + exclusive prefix counts once, map every
      row to ``prefix[searchsorted(values, v)] + 1`` — rows never leave
      their blocks, the 100 TB side only streams.
    - bigger (open value domains, ~10⁸ distinct pairs would OOM the
      driver): the key-sheltered JOIN path — the histogram takes ONE
      hash(key) exchange (histogram-sized, per-reducer segmented prefix
      sums), and the corpus joins it on the exact (key, value) pair via
      the lean :func:`~.relational.hash_join` left join.  The corpus
      pays one shuffle; nothing is ever driver-collected.

    Both paths emit identical rows (``tests/test_rank_in_group.py``
    forces the join path against the broadcast result).  NULL-key rows
    get a NULL rank on both paths (they match no histogram entry).
    """
    hist_ds, n_pairs = _pair_hist(ds, key_col, value_col)
    if force_join_path or n_pairs > max_broadcast_pairs:
        return _rank_join_path(
            ds, hist_ds, key_col, value_col, id_col,
            mode="rank", out_col=rank_col,
        )
    import ray

    hist = hist_ds.to_pandas().sort_values([key_col, "v"], kind="mergesort")
    lut = {}
    for key, sub in hist.groupby(key_col, sort=False):
        vals = sub["v"].to_numpy()
        cnts = sub["cnt"].to_numpy().astype(np.int64)
        prefix = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        lut[key] = (vals, prefix)
    lut_ref = ray.put(lut)

    def stage(batch: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        kcol = batch[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        dic = pc.dictionary_encode(kcol)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        rnk = np.zeros(len(v), dtype=np.int64)
        seen = np.zeros(len(v), dtype=bool)
        # Python touches only the batch's DISTINCT keys, never its rows
        for ki, key in enumerate(dic.dictionary.to_pylist()):
            sel = codes == ki
            vals, prefix = table[key]
            rnk[sel] = prefix[np.searchsorted(vals, v[sel])] + 1
            seen[sel] = True
        return batch.select([id_col, key_col, value_col]).append_column(
            rank_col, pa.array(rnk, pa.int64(), mask=~seen)
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def sql_rank_in_group(table: str, key_col: str, value_col: str,
                      id_col: str, rank_col: str = "rnk") -> str:
    return f"""
        SELECT {id_col}, {key_col}, {value_col},
               CAST(RANK() OVER (PARTITION BY {key_col}
                                 ORDER BY {value_col}) AS BIGINT)
                 AS {rank_col}
        FROM {table}
    """


def uniform_sample_k(ds, id_col: str, k: int):
    """Deterministic global uniform k-sample — the k rows with the
    smallest golden-hash unit values, i.e. ``ORDER BY hash_unit(id), id
    LIMIT k`` (held-out eval-set selection that is a pure function of
    the ids: stable under partitioning, retries, cluster size, and
    corpus append-order).

    No global sort: each block pre-trims to its own k smallest under
    the total order (u, id) — a row ranked > k inside its own block
    cannot be in the global k — so the exchange carries ≤ k rows per
    block, then one single-group coarse-key merge
    (:func:`stages.util.topk_per_group`) ranks the candidates.  Output
    ``(id, u, rank)`` with rank = 1-based ROW_NUMBER.
    """
    from ..stages.util import topk_per_group

    def pretrim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            u = (ids.view(np.uint64) * _GOLDEN).astype(np.float64) / 2.0**64
        sel = np.lexsort((ids, u))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[sel]),
                "u": pa.array(u[sel], pa.float64()),
                "g": pa.array(np.zeros(len(sel), np.int64)),
            }
        )

    cands = ds.map_batches(pretrim, batch_format="pyarrow")
    return topk_per_group(
        cands, "g", k,
        sort_cols=["u", id_col], sort_desc=[False, False],
        keep_cols=[id_col, "u"], rank_col="rank",
    )


def ntile_in_group(ds, key_col: str, value_col: str, id_col: str,
                   n_tiles: int, out_col: str = "tile"):
    """Distributed ``NTILE(t) OVER (PARTITION BY key ORDER BY value,
    id)`` — equal-frequency bucketing (decile features, balanced split
    assignment), one output row per input row.

    Unlike :func:`rank_in_group`'s broadcast histogram, NTILE needs a
    per-row ROW_NUMBER under a total order, so this is the key-locality
    shape (running_sum / rate_limit contract): ONE lean hash(key)
    exchange of (rkey, key, v, id), then each reducer lexsorts ALL of
    its keys at once, computes segmented row numbers, and applies SQL's
    tile split exactly — the first ``n % t`` tiles get ``n // t + 1``
    rows, the rest ``n // t``.  Skew ceiling: one key's rows must fit a
    reducer (the PARTITION BY contract).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()
    t = int(n_tiles)
    if t < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")

    def lean(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rkey": pa.array(rkey_of(batch[key_col], R)),
                key_col: batch[key_col],
                "v": batch[value_col],
                id_col: batch[id_col],
            }
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(lean, batch_format="pyarrow"), 0.5
    )

    def tile_reducer(g: pa.Table) -> pa.Table:
        kcol = g[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        codes = pc.dictionary_encode(kcol).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = g["v"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        perm = np.lexsort((ids, v, codes))
        cs = codes[perm]
        first = np.searchsorted(cs, cs, side="left")
        last = np.searchsorted(cs, cs, side="right")
        rn = np.arange(len(cs)) - first          # 0-based row number
        n = last - first                          # segment (key) size
        q, r = n // t, n % t
        cut = r * (q + 1)
        big = rn < cut                            # rows in the fat tiles
        safe_q = np.maximum(q, 1)                 # q=0 only when big is True
        tile = np.where(big, rn // (q + 1), r + (rn - cut) // safe_q) + 1
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        return pa.table(
            {
                id_col: g[id_col],
                key_col: g[key_col],
                value_col: g["v"],
                out_col: pa.array(tile[inv].astype(np.int64)),
            }
        )

    return keyed.groupby("rkey").map_groups(
        tile_reducer, batch_format="pyarrow"
    )


def group_holdout_k(ds, id_col: str, group_col: str, k: int):
    """Deterministic per-group uniform k-sample — the k rows with the
    smallest golden-hash units WITHIN each group (``ROW_NUMBER() OVER
    (PARTITION BY group ORDER BY hash_unit(id), id) <= k``): balanced
    per-language / per-source eval sets that are a pure function of the
    ids.

    Same two-phase shape as :func:`uniform_sample_k` but grouped and
    string-key-safe: each block pre-trims to its own k per group (a row
    ranked > k inside its block can't be in the group's global k), then
    ONE coarse ``hash(group) % R`` exchange (``rkey_of`` — rule 3) and a
    single lexsort + first-occurrence rank per reducer across ALL of its
    groups.  Exchange ≤ k rows per (group, block).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def pretrim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            u = (ids.view(np.uint64) * _GOLDEN).astype(np.float64) / 2.0**64
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        perm = np.lexsort((ids, u, codes))
        cs = codes[perm]
        first = np.searchsorted(cs, cs, side="left")
        sel = perm[(np.arange(len(cs)) - first) < k]
        t = batch.select([id_col, group_col]).take(pa.array(sel))
        t = t.append_column("u", pa.array(u[sel], pa.float64()))
        return t.append_column(
            "rkey", pa.array(rkey_of(t[group_col], R))
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(pretrim, batch_format="pyarrow"), 0.25
    )

    def merge(g: pa.Table) -> pa.Table:
        gcol = g[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        codes = pc.dictionary_encode(gcol).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        u = g["u"].to_numpy(zero_copy_only=False)
        perm = np.lexsort((ids, u, codes))
        cs = codes[perm]
        first = np.searchsorted(cs, cs, side="left")
        rank = np.arange(len(cs)) - first
        sel = rank < k
        out = g.select([id_col, group_col, "u"]).take(pa.array(perm[sel]))
        return out.append_column(
            "rank", pa.array((rank[sel] + 1).astype(np.int64))
        )

    return keyed.groupby("rkey").map_groups(merge, batch_format="pyarrow")


def percent_rank_in_group(ds, key_col: str, value_col: str, id_col: str,
                          out_col: str = "pct_rank", *,
                          max_broadcast_pairs: int = RANK_BROADCAST_MAX_PAIRS,
                          force_join_path: bool = False):
    """Distributed ``PERCENT_RANK() OVER (PARTITION BY key ORDER BY
    value)`` — ``(rank − 1) / (n − 1)`` with SQL RANK tie semantics
    (single-row groups → 0.0): the normalized-score feature behind
    cross-group comparability.

    Same two-pass, size-gated shape as :func:`rank_in_group`: below
    ``max_broadcast_pairs`` DISTINCT (key, value) pairs the histogram
    broadcasts (per-key prefix counts AND totals, corpus never
    shuffles); above it — or with ``force_join_path`` — pass 2 becomes
    the key-sheltered histogram exchange + :func:`~.relational.hash_join`
    left join, identical rows, one corpus shuffle instead of a
    driver-side collect.
    """
    hist_ds, n_pairs = _pair_hist(ds, key_col, value_col)
    if force_join_path or n_pairs > max_broadcast_pairs:
        return _rank_join_path(
            ds, hist_ds, key_col, value_col, id_col,
            mode="percent", out_col=out_col,
        )
    import ray

    hist = hist_ds.to_pandas().sort_values([key_col, "v"], kind="mergesort")
    cnt_col = "cnt"
    lut = {}
    for key, sub in hist.groupby(key_col, sort=False):
        vals = sub["v"].to_numpy()
        cnts = sub[cnt_col].to_numpy().astype(np.int64)
        prefix = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        lut[key] = (vals, prefix, int(cnts.sum()))
    lut_ref = ray.put(lut)

    def stage(batch: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        kcol = batch[key_col]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        dic = pc.dictionary_encode(kcol)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        # NULL-key rows have no histogram entry and match no dictionary
        # code below — start from NaN (→ Arrow null) instead of
        # uninitialized memory (the grouped_zscore null-key contract)
        pr = np.full(len(v), np.nan, dtype=np.float64)
        for ki, key in enumerate(dic.dictionary.to_pylist()):
            sel = codes == ki
            vals, prefix, n = table[key]
            rnk = prefix[np.searchsorted(vals, v[sel])]  # rank - 1
            pr[sel] = (
                rnk.astype(np.float64) / float(n - 1) if n > 1
                else np.zeros(int(sel.sum()))
            )
        return batch.select([id_col, key_col, value_col]).append_column(
            out_col, pa.array(pr, pa.float64(), from_pandas=True)
        )

    return ds.map_batches(stage, batch_format="pyarrow")
