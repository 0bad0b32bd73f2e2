"""General-purpose relational joins.

The spatial/dedup layers all join through domain-specific machinery
(cell shuffles, pair joins, anti-joins); these are the two generic
building blocks a pipeline author reaches for directly:

- ``hash_join`` — large × large equi-join (inner/left/right/full/semi/
  anti): ONE tagged-union exchange on ``hash(key) % reducer_count``
  (coarse keys — rule 3), then a vectorized sort + searchsorted
  many-to-many zip per reducer, executed entirely in Arrow.
- ``broadcast_join`` — large × small inner equi-join: the small side is
  ``ray.put`` once (plasma caches per node — rule 4) and each batch
  resolves matches with two searchsorteds; no shuffle at all.

Lean-exchange layout: the two sides of the union share TYPE-BUCKETED
SLOT columns (``int64_0``, ``string_1``, …).  Each side writes its own
projected columns into slots of the matching Arrow type; because a row
belongs to exactly one side, the same physical slot carries a left
column in left rows and a right column in right rows.  Exchanged width
is therefore max(side widths) per type — NOT left+right — and the only
null padding is the per-type count difference between the sides.  (A
typed ``pa.nulls`` int64 column eagerly allocates its full 8 B/row data
buffer — measured — so padding every row with the other side's full
schema ships dead bytes through the exchange; this layout avoids that,
the same fix stages/pairjoin.py applies to list payloads.)

Reducers gather output columns with ``pa.Array.take`` on the slot
columns — types survive exactly (an int64 id above 2^53 is never routed
through pandas' float64 null widening) and null join-misses come from
take-with-null-index, so every reducer emits one stable schema.

Reference scope note: kylebarron/geo-index is an index library with no
relational layer; these belong to the engine-added operators audited in
SURVEY.md §2.4/§2.5.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.util import coalesce_for_shuffle, reducer_count

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _key_rkey(keys: np.ndarray, R: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (
            ((keys.view(np.uint64) * _GOLDEN) >> np.uint64(33)) % np.uint64(R)
        ).astype(np.int64)


def _type_key(t: pa.DataType) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "_", str(t))


def plan_slots(types: dict[str, pa.DataType], left_cols: list[str],
               right_cols: list[str]):
    """Slot plan for the lean tagged union: per side, columns of one Arrow
    type fill slots ``<typekey>_0``, ``<typekey>_1``, …; the union
    allocates max(side counts) slots per type, so a slot carries live data
    for (almost) every exchanged row and the only null padding is the
    per-type count difference between the sides.

    Returns ``(left_slots, right_slots, slot_types)`` where the first two
    map column name → slot name and the third maps slot name → type.
    """

    def _side(cols: list[str]) -> dict[str, str]:
        counters: dict[str, int] = {}
        mapping = {}
        for c in cols:
            tk = _type_key(types[c])
            i = counters.get(tk, 0)
            counters[tk] = i + 1
            mapping[c] = f"{tk}_{i}"
        return mapping

    left_slots = _side(left_cols)
    right_slots = _side(right_cols)
    slot_types: dict[str, pa.DataType] = {}
    for mapping, cols in ((left_slots, left_cols), (right_slots, right_cols)):
        for c, s in mapping.items():
            slot_types.setdefault(s, types[c])
    return left_slots, right_slots, slot_types


def hash_join(left, right, left_key: str, right_key: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner", salt_hot_keys: int | None = None,
              salt_threshold: int = 1_000_000):
    """Equi-join of two Datasets on an int64 or string key (``how`` =
    "inner", "left", "right", "full", "semi", or "anti").

    Output columns: ``left_cols + right_cols`` (the key columns are
    included only if listed; a name listed on both sides is emitted once,
    coalesced left-then-right so outer rows keep their key).  Many-to-many
    semantics, exact; "left"/"right"/"full" emit unmatched rows with nulls
    in the other side's columns; "semi" / "anti" emit each left row at
    most once (EXISTS / NOT EXISTS — pass ``right_cols=[]``).  The
    exchange carries only (rkey, jk, side) + the shared slot columns (see
    module docstring); reducers zip both sides with one argsort + two
    searchsorteds — no per-key Python, no pandas dtype round-trips.

    Skew ceiling and the escape hatch: ``rkey = hash(key) % R`` sends ALL
    of a key's rows to one reducer, so a web-scale hot key (the empty
    string, a null-sentinel id, one viral URL) serializes the join.
    ``salt_hot_keys=S`` splits every detected hot key across S
    sub-reducers: LEFT rows of a hot key are salted round-robin (each
    left row lands in exactly one shard — so semi/anti/left-outer
    emit-at-most-once stays exact), RIGHT rows of a hot key are
    REPLICATED to all S shards (every shard sees the key's full right
    side — so each (l, r) pair meets exactly once and inner many-to-many
    stays exact).  Supported for inner/left/semi/anti (the salted side
    must be the probe side; use the mirrored call for a hot right
    stream).  Detection is a per-block count pre-filter (a key enters
    the candidate exchange only if one block already shows ≥
    threshold / shuffle-block-count occurrences) — one lean candidate
    groupby, never a full key-cardinality collect; a marginally-hot key
    spread too thin to detect costs only balance, never correctness.
    Detection consumes BOTH inputs one extra time, eagerly at call
    time — with expensive derived inputs, ``.materialize()`` them
    before a salted join so the upstream stages run once.
    """
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(
            "hash_join: how must be one of inner/left/right/full/semi/anti,"
            f" got {how!r}"
        )
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"hash_join: right_cols must be empty for how={how!r}")
    if salt_hot_keys is not None and how in ("right", "full"):
        raise ValueError(
            "hash_join: salt_hot_keys supports inner/left/semi/anti only "
            "(salting replicates the right side, which would duplicate "
            "right/full outer null-emission)"
        )
    R = reducer_count()

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()  # pandas object columns

    types: dict[str, pa.DataType] = {}
    for sch, cols, key in (
        (left.schema(), left_cols, left_key),
        (right.schema(), right_cols, right_key),
    ):
        for name, typ in zip(sch.names, sch.types):
            if name in cols or name == key:
                types.setdefault(name, _pa_type(typ))

    str_key = pa.types.is_string(types[left_key]) or pa.types.is_large_string(
        types[left_key]
    )

    left_slots, right_slots, slot_types = plan_slots(types, left_cols, right_cols)
    all_slots = sorted(slot_types)
    jk_type = pa.string() if str_key else pa.int64()

    def _key_h(kc):
        """int64 routing value and the jk exchange column for a key col."""
        if str_key:
            # the key itself rides the exchange (exact — the hash only
            # routes); reducers group by dictionary codes of the strings
            from ..sources.pages import url_hash64

            return url_hash64(kc).view(np.int64), kc.cast(jk_type)
        k = kc.to_numpy(zero_copy_only=False).astype(np.int64)
        return k, pa.array(k)

    hot_arr = None
    S = int(salt_hot_keys) if salt_hot_keys else 1
    if S > 1:
        from ..stages.util import shuffle_block_count

        blk_thresh = max(2, int(salt_threshold) // shuffle_block_count())

        def cand(key_col: str):
            def fn(batch: pa.Table) -> pa.Table:
                kc = batch[key_col]
                if isinstance(kc, pa.ChunkedArray):
                    kc = kc.combine_chunks()
                h, _ = _key_h(kc)
                u, c = np.unique(h, return_counts=True)
                return pa.table({"hk": pa.array(u[c >= blk_thresh])})

            return fn

        cands = left.map_batches(cand(left_key), batch_format="pyarrow").union(
            right.map_batches(cand(right_key), batch_format="pyarrow")
        ).to_pandas()
        if len(cands):
            hot_arr = np.unique(cands["hk"].to_numpy().astype(np.int64))

    _SALT_MIX = np.uint64(2654435761)

    def tag(key_col: str, slots: dict[str, str], side: int):
        inv = {s: c for c, s in slots.items()}
        replicate = side == 1  # right side fans hot keys out to all shards

        def fn(batch: pa.Table) -> pa.Table:
            kc = batch[key_col]
            if isinstance(kc, pa.ChunkedArray):
                kc = kc.combine_chunks()
            h, jk = _key_h(kc)
            if hot_arr is not None:
                pos = np.searchsorted(hot_arr, h)
                hot = (pos < len(hot_arr)) & (
                    hot_arr[np.minimum(pos, len(hot_arr) - 1)] == h
                )
                if replicate and hot.any():
                    reps = np.where(hot, S, 1).astype(np.int64)
                    idx = np.repeat(
                        np.arange(len(h), dtype=np.int64), reps
                    )
                    salt = np.arange(len(idx), dtype=np.int64) - np.repeat(
                        np.cumsum(reps) - reps, reps
                    )
                    take = pa.array(idx)
                    batch = batch.take(take)
                    h = h[idx]
                    jk = jk.take(take) if str_key else pa.array(h)
                elif not replicate:
                    salt = np.where(
                        hot, np.arange(len(h), dtype=np.int64) % S, 0
                    )
                else:
                    salt = np.zeros(len(h), np.int64)
            else:
                salt = None
            with np.errstate(over="ignore"):
                base = (h.view(np.uint64) * _GOLDEN) >> np.uint64(33)
                if salt is not None:
                    base = base + salt.view(np.uint64) * _SALT_MIX
            rk = (base % np.uint64(R)).astype(np.int64)
            out = {
                "rkey": pa.array(rk),
                "jk": jk,
                "side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
            }
            for s in all_slots:
                if s in inv:
                    col = batch[inv[s]]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    out[s] = col
                else:
                    # per-type count difference between the sides only
                    out[s] = pa.nulls(batch.num_rows, type=slot_types[s])
            return pa.table(out)

        return fn

    lt = left.map_batches(tag(left_key, left_slots, 0), batch_format="pyarrow")
    rt = right.map_batches(tag(right_key, right_slots, 1), batch_format="pyarrow")
    unioned = coalesce_for_shuffle(lt.union(rt), 0.5)

    out_cols = list(dict.fromkeys(left_cols + right_cols))
    shared = set(left_cols) & set(right_cols)

    def _opt_idx(idx: np.ndarray) -> pa.Array:
        """int64 gather indices with -1 → null (take yields null rows)."""
        return pa.array(idx, pa.int64(), mask=idx < 0)

    def zip_sides(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        jk = g["jk"]
        if isinstance(jk, pa.ChunkedArray):
            jk = jk.combine_chunks()
        if str_key:
            codes = pc.dictionary_encode(jk).indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        else:
            codes = jk.to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        rk = codes[ri]
        rsort = np.argsort(rk, kind="stable")
        rks = rk[rsort]
        lk = codes[li]
        lo = np.searchsorted(rks, lk, side="left")
        hi = np.searchsorted(rks, lk, side="right")
        counts = hi - lo

        if how in ("semi", "anti"):
            keep = (counts > 0) if how == "semi" else (counts == 0)
            pick = pa.array(li[keep], pa.int64())
            return pa.table(
                {c: g[left_slots[c]].take(pick) for c in left_cols}
            )

        total = int(counts.sum())
        # matched pairs (many-to-many): left row i repeats counts[i] times,
        # right partner walks rsort[lo[i]:hi[i]]
        l_rep = np.repeat(li, counts)
        ends = np.cumsum(counts)
        starts = ends - counts
        offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        r_pos = np.repeat(lo, counts) + offs
        r_rep = ri[rsort[r_pos]] if total else np.empty(0, np.int64)

        l_take, r_take = [l_rep], [r_rep]
        if how in ("left", "full"):
            lx = li[counts == 0]
            l_take.append(lx)
            r_take.append(np.full(len(lx), -1, dtype=np.int64))
        if how in ("right", "full"):
            rmatched = np.zeros(len(ri), dtype=bool)
            if total:
                rmatched[rsort[r_pos]] = True
            rx = ri[~rmatched]
            l_take.append(np.full(len(rx), -1, dtype=np.int64))
            r_take.append(rx)
        l_idx = _opt_idx(np.concatenate(l_take))
        r_idx = _opt_idx(np.concatenate(r_take))

        out = {}
        for c in out_cols:
            if c in shared:
                out[c] = pc.coalesce(
                    g[left_slots[c]].take(l_idx), g[right_slots[c]].take(r_idx)
                )
            elif c in left_slots:
                out[c] = g[left_slots[c]].take(l_idx)
            else:
                out[c] = g[right_slots[c]].take(r_idx)
        return pa.table(out)

    return unioned.groupby("rkey").map_groups(zip_sides, batch_format="pyarrow")


def broadcast_join(big, small_tbl: pa.Table, big_key: str, small_key: str,
                   small_cols: list[str]):
    """Inner equi-join where the small side is broadcast once.

    ``small_tbl`` is an in-memory Arrow table (metadata-scale: a
    dimension table, a keep-list head, centroid labels); its key must
    be unique.  Each batch of ``big`` appends the small side's columns
    by binary search and drops non-matching rows — map-side only, no
    shuffle, workers read the plasma copy zero-copy.
    """
    import ray

    sk = small_tbl[small_key].to_numpy().astype(np.int64)
    order = np.argsort(sk, kind="stable")
    if len(sk) > 1 and (sk[order][1:] == sk[order][:-1]).any():
        raise ValueError(
            "broadcast_join: small-side key must be unique "
            f"(column {small_key!r} has duplicates)"
        )
    payload = {
        "keys": sk[order],
        "cols": {c: small_tbl[c].to_numpy(zero_copy_only=False)[order]
                 for c in small_cols},
    }
    ref = ray.put(payload)

    def fn(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        keys = s["keys"]
        bk = batch[big_key].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, bk)
        pos_c = np.minimum(pos, len(keys) - 1) if len(keys) else pos
        hit = (len(keys) > 0) & (keys[pos_c] == bk) if len(keys) else (
            np.zeros(len(bk), dtype=bool)
        )
        out = batch.filter(pa.array(hit))
        for c in small_cols:
            out = out.append_column(c, pa.array(s["cols"][c][pos_c[hit]]))
        return out

    return big.map_batches(fn, batch_format="pyarrow")


def band_join(left, right, left_val: str, right_val: str, delta: float,
              left_cols: list[str], right_cols: list[str],
              left_eq: str | None = None, right_eq: str | None = None,
              candidate_eps: float = 1e-6):
    """Numeric band join: inner join on ``abs(left_val - right_val) <=
    delta``, optionally AND an int64/string equality key (``left_eq`` /
    ``right_eq``).  The inequality-join workhorse (price bands, sensor
    tolerances, timestamp proximity when an as-of is too strict).

    PBSM-style bin replication: both sides bin values at width ``delta``
    (``floor(v / delta)``); the RIGHT side replicates to bins b-1, b, b+1
    (3 lean copies), the left stays in its own bin, so every qualifying
    pair co-locates in exactly ONE (eq, left-bin) group — no pair dedup
    needed.  One coarse-key exchange on ``hash(eq, bin) % R``; each
    reducer zips ALL of its groups in one pass (rule 3): rows sort by
    (group, value); per-group value ranges resolve through an exact
    integer composite ``gid * (nR + 1) + global_value_rank`` so a single
    ``np.searchsorted`` answers every left row's [v - delta, v + delta]
    window — no per-group Python, no float composite keys (which lose
    exactness past 2^53).

    Candidate windows widen by ``candidate_eps`` and the FINAL predicate
    re-evaluates ``abs(lv - rv) <= delta`` pairwise — bit-identical to the
    SQL expression, so boundary pairs (|diff| == delta) agree with an
    oracle even though the window arithmetic (``lv - delta``) rounds
    differently from the predicate arithmetic (``lv - rv``).

    Skew note: a value-heavy bin concentrates on one reducer exactly like
    a hot key in ``hash_join`` — pick ``delta`` near the matching radius
    so bins stay balanced, and salt the eq key upstream for pathological
    distributions.
    """
    R = reducer_count()

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    types: dict[str, pa.DataType] = {}
    for sch, cols in ((left.schema(), left_cols), (right.schema(), right_cols)):
        for name, typ in zip(sch.names, sch.types):
            if name in cols:
                types.setdefault(name, _pa_type(typ))

    left_slots, right_slots, slot_types = plan_slots(types, left_cols, right_cols)
    all_slots = sorted(slot_types)

    str_eq = False
    if left_eq is not None:
        et = dict(zip(left.schema().names, left.schema().types))[left_eq]
        str_eq = pa.types.is_string(_pa_type(et)) or pa.types.is_large_string(
            _pa_type(et)
        )

    def tag(val_col: str, eq_col: str | None, slots: dict[str, str], side: int):
        inv = {s: c for c, s in slots.items()}
        reps = (0,) if side == 0 else (-1, 0, 1)

        def fn(batch: pa.Table) -> pa.Table:
            v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
            b = np.floor(v / delta).astype(np.int64)
            if eq_col is None:
                eh = np.zeros(len(v), dtype=np.int64)
                ek = pa.array(eh)
            else:
                ec = batch[eq_col]
                if isinstance(ec, pa.ChunkedArray):
                    ec = ec.combine_chunks()
                if str_eq:
                    from ..sources.pages import url_hash64

                    eh = url_hash64(ec).view(np.int64)
                    ek = ec
                else:
                    eh = ec.to_numpy(zero_copy_only=False).astype(np.int64)
                    ek = pa.array(eh)
            parts = []
            for off in reps:
                bb = b + off
                with np.errstate(over="ignore"):
                    mix = (
                        (eh.view(np.uint64) * _GOLDEN)
                        ^ (bb.view(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
                    )
                rk = ((mix * _GOLDEN) >> np.uint64(33)) % np.uint64(R)
                out = {
                    "rkey": pa.array(rk.astype(np.int64)),
                    "eqk": ek,
                    "bin": pa.array(bb),
                    "val": pa.array(v),
                    "side": pa.array(
                        np.full(batch.num_rows, side, dtype=np.int8)
                    ),
                }
                for s in all_slots:
                    if s in inv:
                        col = batch[inv[s]]
                        if isinstance(col, pa.ChunkedArray):
                            col = col.combine_chunks()
                        out[s] = col
                    else:
                        out[s] = pa.nulls(batch.num_rows, type=slot_types[s])
                parts.append(pa.table(out))
            return pa.concat_tables(parts)

        return fn

    lt = left.map_batches(tag(left_val, left_eq, left_slots, 0),
                          batch_format="pyarrow")
    rt = right.map_batches(tag(right_val, right_eq, right_slots, 1),
                           batch_format="pyarrow")
    unioned = coalesce_for_shuffle(lt.union(rt), 0.5)

    out_cols = list(dict.fromkeys(left_cols + right_cols))
    shared = set(left_cols) & set(right_cols)

    def zip_band(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        v = g["val"].to_numpy(zero_copy_only=False)
        b = g["bin"].to_numpy(zero_copy_only=False)
        eq = g["eqk"]
        if isinstance(eq, pa.ChunkedArray):
            eq = eq.combine_chunks()
        if str_eq:
            ecodes = pc.dictionary_encode(eq).indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        else:
            ecodes = eq.to_numpy(zero_copy_only=False).astype(np.int64)
        # dense (eq, bin) group ids across BOTH sides in one pass
        pairs = np.stack([ecodes, b], axis=1)
        _, gid = np.unique(pairs, axis=0, return_inverse=True)

        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        if len(li) == 0 or len(ri) == 0:
            return pa.table(
                {c: pa.nulls(0, type=types[c]) for c in out_cols}
            )
        rv, rg = v[ri], gid[ri]
        rsort = np.lexsort((rv, rg))
        rvs, rgs = rv[rsort], rg[rsort]
        # exact integer composite: global 'left' rank of each value makes
        # (group, value) order a single strictly-sortable int64 key
        glob = np.sort(rvs)
        nR = len(rvs)
        M = np.int64(nR + 1)
        r_rank = np.searchsorted(glob, rvs, side="left")
        comp = rgs * M + r_rank
        lv, lg = v[li], gid[li]
        q_lo = lg * M + np.searchsorted(glob, lv - delta - candidate_eps,
                                        side="left")
        q_hi = lg * M + np.searchsorted(glob, lv + delta + candidate_eps,
                                        side="right")
        lo = np.searchsorted(comp, q_lo, side="left")
        hi = np.searchsorted(comp, q_hi, side="left")
        counts = hi - lo
        total = int(counts.sum())
        l_rep = np.repeat(li, counts)
        ends = np.cumsum(counts)
        starts = ends - counts
        offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        r_pos = np.repeat(lo, counts) + offs
        r_rep = ri[rsort[r_pos]] if total else np.empty(0, np.int64)
        # final predicate, bit-identical to SQL abs(l - r) <= delta
        keep = np.abs(v[l_rep] - v[r_rep]) <= delta if total else np.empty(
            0, bool
        )
        l_idx = pa.array(l_rep[keep], pa.int64())
        r_idx = pa.array(r_rep[keep], pa.int64())
        out = {}
        for c in out_cols:
            if c in shared:
                out[c] = pc.coalesce(
                    g[left_slots[c]].take(l_idx), g[right_slots[c]].take(r_idx)
                )
            elif c in left_slots:
                out[c] = g[left_slots[c]].take(l_idx)
            else:
                out[c] = g[right_slots[c]].take(r_idx)
        return pa.table(out)

    return unioned.groupby("rkey").map_groups(zip_band, batch_format="pyarrow")


def set_op(left, right, left_key: str, right_key: str, op: str,
           out_col: str | None = None):
    """Distinct set operation between two int64 key columns —
    ``EXCEPT`` / ``INTERSECT`` with SQL bag-to-set semantics (each side
    deduplicated first, output has one row per surviving key).

    Scale shape: per-batch ``np.unique`` pre-aggregation means the
    exchange carries at most one (key, side, rkey) row per distinct key
    per block — 24 B/row and sublinear in input rows when keys repeat
    within blocks.  One coarse ``hash(key) % R`` exchange (rule 3), then
    each reducer resolves ALL of its keys with one sorted
    ``np.setdiff1d`` / ``np.intersect1d`` per side-pair — no per-key
    Python.  Both sides of a key hash to the same reducer, so the
    verdict is exact under any partitioning.

    Reference scope note: engine-added relational operator (SURVEY.md
    §2.4); the reference index library has no set-op layer.
    """
    if op not in ("except", "intersect"):
        raise ValueError(f"op must be 'except' or 'intersect', got {op!r}")
    out_col = out_col or left_key
    R = reducer_count()

    def lean(key_col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = np.unique(
                batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pa.table(
                {
                    "k": pa.array(k),
                    "side": pa.array(
                        np.full(len(k), side, dtype=np.int8)
                    ),
                    "rkey": pa.array(_key_rkey(k, R)),
                }
            )

        return fn

    unioned = coalesce_for_shuffle(
        left.map_batches(lean(left_key, 0), batch_format="pyarrow").union(
            right.map_batches(lean(right_key, 1), batch_format="pyarrow")
        ),
        0.25,
    )

    def resolve(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        a = np.unique(k[side == 0])
        b = np.unique(k[side == 1])
        if op == "except":
            keep = np.setdiff1d(a, b, assume_unique=True)
        else:
            keep = np.intersect1d(a, b, assume_unique=True)
        return pa.table({out_col: pa.array(keep, pa.int64())})

    out = unioned.groupby("rkey").map_groups(resolve, batch_format="pyarrow")
    # typed zero-row block so a both-sides-empty result keeps its schema
    # (an empty groupby otherwise yields a schema-less Dataset)
    import ray.data as rd

    empty = pa.table({out_col: pa.array([], pa.int64())})
    return rd.from_arrow(empty).union(out)


def _t64(col) -> np.ndarray:
    """int64/timestamp column → int64 numpy (epoch µs for timestamps)."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        col = pc.cast(col, pa.timestamp("us", tz=t.tz), safe=False)
    return pc.cast(col, pa.int64()).to_numpy()


def interval_count_join(points, intervals, ts_col: str, ikey_col: str,
                        start_col: str, end_col: str, bin_width: int,
                        out_count: str = "n_pts"):
    """Temporal containment count-join: per interval, how many points
    fall in ``[start, end)`` — SQL ``JOIN ON p.ts >= i.start AND
    p.ts < i.end GROUP BY i.key`` (inner semantics: zero-match intervals
    drop) — with NO pair enumeration and NO all-pairs.

    Shape (PBSM on time bins of ``bin_width``, boundary-rank trick):

    - every point emits ONE row ``(rkey=hash(bin), t=ts, ikey=0,
      sign=0)``;
    - every interval emits TWO rows per bin it overlaps, the CLIPPED
      bounds as signed boundaries: ``(hash(bin), hi_clip, ikey, +1)``
      and ``(hash(bin), lo_clip, ikey, −1)``;
    - one lean 25 B/row union exchange (all four columns shared by both
      sides — none of hash_join's per-type null padding), then each
      reducer sorts its point timestamps ONCE and resolves every
      boundary with a single ``searchsorted``: the interval's count
      contribution from a bin is ``rank(hi_clip) − rank(lo_clip)``.

    Why clipping needs no per-bin masking: bins partition time, so a
    foreign bin's point on the same reducer is either below ``bin_lo``
    (counted by BOTH clipped bounds) or at/above ``bin_hi`` (counted by
    neither) — the subtraction cancels it exactly.  Each (interval,
    point) pair is counted in exactly one replica, the point's own bin.

    Per-reducer partials ``(ikey, partial)`` then one tiny native
    ``groupby(ikey).sum`` (rows bounded by intervals × bins-spanned, not
    by points).  Replication factor is ``span / bin_width + 1`` — pick
    ``bin_width`` near the typical interval span.  Skew ceiling: one
    BIN's points must fit a reducer (same contract as the PBSM spatial
    join); a hot bin splits by shrinking ``bin_width``.

    Reference scope note: engine-added relational operator (SURVEY.md
    §2.4); the reference index library has no temporal-join layer.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    R = reducer_count()
    bw = np.int64(bin_width)

    def point_rows(batch: pa.Table) -> pa.Table:
        t = _t64(batch[ts_col])
        z64 = np.zeros(len(t), np.int64)
        return pa.table(
            {
                "rkey": pa.array(_key_rkey(np.floor_divide(t, bw), R)),
                "t": pa.array(t),
                "ikey": pa.array(z64),
                "sign": pa.array(z64.astype(np.int8)),
            }
        )

    def boundary_rows(batch: pa.Table) -> pa.Table:
        lo = _t64(batch[start_col])
        hi = _t64(batch[end_col])
        k = batch[ikey_col].to_numpy(zero_copy_only=False).astype(np.int64)
        live = hi > lo  # empty/inverted intervals match nothing
        lo, hi, k = lo[live], hi[live], k[live]
        b0 = np.floor_divide(lo, bw)
        b1 = np.floor_divide(hi - 1, bw)  # last bin touched (end exclusive)
        reps = b1 - b0 + 1
        idx = np.repeat(np.arange(len(k), dtype=np.int64), reps)
        offs = (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        bins = b0[idx] + offs
        bin_lo = bins * bw
        lo_c = np.maximum(lo[idx], bin_lo)
        hi_c = np.minimum(hi[idx], bin_lo + bw)
        rk = _key_rkey(bins, R)
        n = len(idx)
        sign = np.empty(2 * n, np.int8)
        sign[:n], sign[n:] = 1, -1
        return pa.table(
            {
                "rkey": pa.array(np.concatenate([rk, rk])),
                "t": pa.array(np.concatenate([hi_c, lo_c])),
                "ikey": pa.array(np.concatenate([k[idx], k[idx]])),
                "sign": pa.array(sign),
            }
        )

    unioned = coalesce_for_shuffle(
        points.map_batches(point_rows, batch_format="pyarrow").union(
            intervals.map_batches(boundary_rows, batch_format="pyarrow")
        ),
        0.5,
    )

    def rank_reducer(g: pa.Table) -> pa.Table:
        sign = g["sign"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        pts = np.sort(t[sign == 0])
        bmask = sign != 0
        bt = t[bmask]
        bk = g["ikey"].to_numpy(zero_copy_only=False)[bmask]
        bs = sign[bmask].astype(np.int64)
        contrib = bs * np.searchsorted(pts, bt, side="left")
        keys, inv = np.unique(bk, return_inverse=True)
        partial = np.zeros(len(keys), np.int64)
        np.add.at(partial, inv, contrib)
        return pa.table(
            {"ikey": pa.array(keys), "partial": pa.array(partial)}
        )

    partials = unioned.groupby("rkey").map_groups(
        rank_reducer, batch_format="pyarrow"
    )
    summed = partials.groupby("ikey").sum("partial")

    def finish(b: pa.Table) -> pa.Table:
        n = b["sum(partial)"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        return pa.table(
            {
                ikey_col: b["ikey"].filter(pa.array(keep)),
                out_count: pa.array(n[keep]),
            }
        )

    from .components import _with_schema

    # zero matching intervals -> empty groupby loses its schema
    return _with_schema(
        summed.map_batches(finish, batch_format="pyarrow"),
        {ikey_col: pa.int64(), out_count: pa.int64()},
    )
