"""General-purpose relational joins.

The spatial/dedup layers all join through domain-specific machinery
(cell shuffles, pair joins, anti-joins); these are the two generic
building blocks a pipeline author reaches for directly:

- ``hash_join`` — large × large inner equi-join: ONE tagged-union
  exchange on ``hash(key) % reducer_count`` (coarse keys — rule 3),
  then a vectorized sort + searchsorted many-to-many zip per reducer.
  Only the projected columns enter the exchange (rule 1).
- ``broadcast_join`` — large × small inner equi-join: the small side is
  ``ray.put`` once (plasma caches per node — rule 4) and each batch
  resolves matches with two searchsorteds; no shuffle at all.

Reference scope note: kylebarron/geo-index is an index library with no
relational layer; these belong to the engine-added operators audited in
SURVEY.md §2.4/§2.5.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.util import coalesce_for_shuffle, reducer_count

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _key_rkey(keys: np.ndarray, R: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (
            ((keys.view(np.uint64) * _GOLDEN) >> np.uint64(33)) % np.uint64(R)
        ).astype(np.int64)


def hash_join(left, right, left_key: str, right_key: str,
              left_cols: list[str], right_cols: list[str],
              how: str = "inner"):
    """Equi-join of two Datasets on an int64 or string key (``how`` =
    "inner", "left", "semi", or "anti").

    Output columns: ``left_cols + right_cols`` (the key columns are
    included only if listed).  Many-to-many semantics, exact; "left"
    emits unmatched left rows with nulls in the right columns; "semi" /
    "anti" emit each left row at most once (EXISTS / NOT EXISTS — pass
    ``right_cols=[]``).  The
    exchange carries only the listed columns plus (key, side, rkey);
    reducers zip both sides with one argsort + two searchsorteds —
    no per-key Python.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"hash_join: how must be one of inner/left/semi/anti, got {how!r}"
        )
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"hash_join: right_cols must be empty for how={how!r}")
    R = reducer_count()
    all_cols = list(dict.fromkeys(left_cols + right_cols))
    # typed nulls for the tagged union (untyped pa.nulls would give the
    # two sides incompatible schemas); schema() reads metadata only
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()  # pandas object columns

    types = {}
    for sch in (left.schema(), right.schema()):
        for name, typ in zip(sch.names, sch.types):
            types.setdefault(name, _pa_type(typ))

    str_key = pa.types.is_string(types[left_key]) or pa.types.is_large_string(
        types[left_key]
    )

    def tag(key_col: str, cols: list[str], side: int):
        def fn(batch: pa.Table) -> pa.Table:
            kc = batch[key_col]
            if isinstance(kc, pa.ChunkedArray):
                kc = kc.combine_chunks()
            if str_key:
                # the key itself rides the exchange (exact — the hash only
                # routes); reducers group by the actual strings
                from ..sources.pages import url_hash64

                h = url_hash64(kc).view(np.int64)
                rk, jk = _key_rkey(h, R), kc
            else:
                k = kc.to_numpy().astype(np.int64)
                rk, jk = _key_rkey(k, R), pa.array(k)
            out = {
                "rkey": pa.array(rk),
                "jk": jk,
                "side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
            }
            for c in all_cols:
                if c in cols:
                    out[c] = batch[c]
                else:
                    out[c] = pa.nulls(batch.num_rows, type=types[c])
            return pa.table(out)

        return fn

    lt = left.map_batches(tag(left_key, left_cols, 0), batch_format="pyarrow")
    rt = right.map_batches(tag(right_key, right_cols, 1), batch_format="pyarrow")
    unioned = coalesce_for_shuffle(lt.union(rt), 0.5)

    def zip_sides(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        k = g["jk"].to_numpy()
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]

        def empty():
            return pd.DataFrame(
                {c: g[c].to_numpy()[:0] for c in all_cols}
            )

        if len(li) == 0 or (how in ("inner", "semi") and len(ri) == 0):
            return empty()
        rk = k[ri]
        rsort = np.argsort(rk, kind="stable")
        rks = rk[rsort]
        lo = np.searchsorted(rks, k[li], side="left")
        hi = np.searchsorted(rks, k[li], side="right")
        counts = hi - lo
        if how in ("semi", "anti"):
            keep = (counts > 0) if how == "semi" else (counts == 0)
            pick = li[keep]
            out = {c: g[c].to_numpy()[pick] for c in left_cols}
            for c, v in out.items():
                if pa.types.is_integer(types[c]) and v.dtype.kind == "f":
                    out[c] = v.astype(np.int64)
            return pd.DataFrame(out)
        if how == "left":
            # unmatched left rows still emit once, with a null right side
            counts = np.maximum(counts, 1)
        total = int(counts.sum())
        if total == 0:
            return empty()
        l_rep = np.repeat(np.arange(len(li)), counts)
        # within-match offsets: arange minus each match-run's start
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        offs = np.arange(total) - np.repeat(starts, counts)
        matched = np.repeat(hi - lo, counts) > 0
        pos = np.minimum(np.repeat(lo, counts) + offs, len(rks) - 1) if len(
            rks
        ) else np.zeros(total, dtype=np.int64)
        l_pick = li[l_rep]
        out = {}
        for c in left_cols:
            out[c] = g[c].to_numpy()[l_pick]
        for c in right_cols:
            if c not in out:
                numeric = pa.types.is_integer(types[c]) or pa.types.is_floating(
                    types[c]
                )
                if len(rks):
                    v = g[c].to_numpy()[ri[rsort[pos]]]
                    if how == "left" and not matched.all():
                        if numeric:
                            v = v.astype(np.float64)
                            v[~matched] = np.nan
                        else:
                            v = v.astype(object)
                            v[~matched] = None
                else:  # left join against an empty right side
                    v = (
                        np.full(total, np.nan)
                        if numeric
                        else np.full(total, None, dtype=object)
                    )
                out[c] = v
        # dtype normalization: the tagged union's null padding widened
        # int columns to float64 — restore ints where nulls are
        # impossible (left columns, and right columns of an inner join);
        # under a left join, right numeric columns are ALWAYS float64 so
        # every reducer emits the same dtype whether or not it saw nulls
        right_only = set(right_cols) - set(left_cols)
        for c, v in out.items():
            if pa.types.is_integer(types[c]):
                if how == "left" and c in right_only:
                    out[c] = v.astype(np.float64)
                elif v.dtype.kind == "f":
                    out[c] = v.astype(np.int64)
        return pd.DataFrame(out)

    return unioned.groupby("rkey").map_groups(zip_sides, batch_format="pandas")


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
