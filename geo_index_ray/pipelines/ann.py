"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: exact brute-force cosine top-k — the baseline.  The query
  matrix is broadcast once (`ray.put`), each actor does one f64 matmul per
  batch (zero-copy flatten of the Arrow list column), per-batch top-k via
  argpartition, then one tiny groupby merges per-block top-ks globally.
- ``lsh_cosine_pairs``: embedding near-duplicate pairs via random
  hyperplane LSH buckets + exact cosine verification — the scale path for
  all-pairs similarity (only the bucket groupby shuffles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // max(1, len(arr))
    return flat.reshape(len(arr), dim).astype(np.float64)


class _BruteCosine:
    """Broadcast-probe: normalized query matrix in the object store; one
    matmul per batch.  Only the ObjectRef is pickled into the task closure;
    each task resolves it via ``ray.get`` (plasma-local, zero-copy after
    the first fetch per node)."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        self.queries_ref = queries_ref
        self.qids = None
        self.qm = None
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def _load(self):
        import ray

        q = ray.get(self.queries_ref)
        self.qids = q["ids"]
        qm = q["matrix"].astype(np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.qm is None:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        m = _emb_matrix(batch, self.emb_col)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ self.qm.T  # (batch, nq)
        k = min(self.k, len(ids))
        # keep every row tied with the k-th similarity so a tied smaller-id
        # neighbor is never dropped before the global merge (matches the
        # oracle's ORDER BY sim DESC, neighbor_id)
        kth = -np.partition(-sims, k - 1, axis=0)[k - 1]  # (nq,)
        ti, qi = np.nonzero(sims >= kth[None, :])
        return pa.table(
            {
                "query_id": pa.array(self.qids[qi]),
                "neighbor_id": pa.array(ids[ti]),
                "sim": pa.array(sims[ti, qi]),
            }
        )


def ann_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, k: int, id_col: str, emb_col: str = "embedding", concurrency: int | None = None):
    """Exact cosine top-k per query.  Returns (query_id, neighbor_id, rank)."""
    import ray

    if concurrency is None:
        from ..stages.util import default_concurrency

        concurrency = default_concurrency()
    queries_ref = ray.put(
        {
            "matrix": np.ascontiguousarray(query_matrix, dtype=np.float64),
            "ids": np.asarray(query_ids, dtype=np.int64),
        }
    )
    # task-based broadcast: the ref is resolved with ray.get inside the
    # task — plasma caches the object per node, so every task after the
    # first on a node reads it zero-copy from shared memory.  No actor
    # pool to spin up, and idle workers are reused across stages.
    probe = _BruteCosine(queries_ref, k, id_col, emb_col)
    cands = ds.map_batches(probe, batch_format="pyarrow")

    from ..stages.util import topk_per_group

    return topk_per_group(
        cands, "query_id", k, ["sim", "neighbor_id"], [True, False],
        ["query_id", "neighbor_id"],
    )


def lsh_cosine_pairs(
    ds,
    id_col: str,
    emb_col: str = "embedding",
    dim: int = 64,
    num_tables: int = 16,
    planes_per_table: int = 4,
    threshold: float = 0.9,
    seed: int = 13,
    planes: np.ndarray | None = None,
):
    """Embedding near-dup pairs: banded multi-table hyperplane LSH with
    exact-cosine verification.

    Returns (a_id, b_id, cos_sim) with a_id < b_id, cos_sim ≥ threshold,
    each pair once.  A pair is a candidate iff ALL planes of SOME table
    agree — the sign-bit analog of MinHash banding.  At the defaults,
    recall for cos = 0.4 is ≈ 0.93 and ≈ 1.0 above 0.7, while a random
    orthogonal pair collides in a table with probability 2^-4.

    Scale shape: the bucket shuffle carries only 24 B/row
    ``(rkey, bucket, id)`` — embeddings NEVER ride the all-to-all.  Exact
    cosine verification happens afterwards, per candidate pair, via an
    id-hash payload join (stages.pairjoin) that ships each involved
    embedding once.  ``planes`` may be given explicitly (e.g. derived from
    fixed data rows so an external oracle can reproduce the buckets);
    default is seeded Gaussian.
    """
    if planes is None:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, num_tables * planes_per_table))
    else:
        planes = np.ascontiguousarray(planes, dtype=np.float64)
        num_tables = planes.shape[1] // planes_per_table

    from ..stages.pairjoin import verify_pairs
    from ..stages.util import reducer_count

    R = reducer_count()

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        m = _emb_matrix(batch, emb_col)
        bits = (m @ planes > 0).astype(np.uint64)
        out_bucket, out_id = [], []
        for t in range(num_tables):
            seg = bits[:, t * planes_per_table : (t + 1) * planes_per_table]
            bucket = np.full(
                len(ids),
                np.uint64(t * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF),
                dtype=np.uint64,
            )
            with np.errstate(over="ignore"):
                for p in range(planes_per_table):
                    bucket = (bucket << np.uint64(1)) | seg[:, p]
                bucket = bucket * np.uint64(0xD1B54A32D192ED03) + np.uint64(t)
            out_bucket.append(bucket)
            out_id.append(ids)
        bucket = np.concatenate(out_bucket)
        return pa.table(
            {
                "rkey": pa.array((bucket % np.uint64(R)).astype(np.int64)),
                "bucket": pa.array(bucket.view(np.int64)),
                id_col: pa.array(np.concatenate(out_id)),
            }
        )

    buckets = ds.map_batches(bucketize, batch_format="pyarrow")

    _empty_ab = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )

    def pairs_in_reducer(g: pa.Table) -> pa.Table:
        """All in-bucket candidate pairs of this reducer, via the
        vectorized k-offset sweep — ids only, no embeddings here."""
        if g.num_rows < 2:
            return _empty_ab
        ids = g[id_col].to_numpy().astype(np.int64)
        bucket = g["bucket"].to_numpy()
        order = np.lexsort((ids, bucket))
        b_s = bucket[order]
        starts = np.nonzero(np.r_[True, b_s[1:] != b_s[:-1]])[0]
        sizes = np.diff(np.r_[starts, len(order)])
        # giant buckets (only 2^planes_per_table codes per table exist, so
        # a bucket can hold O(N/16) ids): all-pairs would grow the
        # materialized id-pair stream O(N²).  Chain-link them to the
        # bucket's min id instead — precision is unaffected (exact cosine
        # verification filters), only in-bucket recall of a pathological
        # bucket degrades gracefully (cf. minhash pairs_in_reducer).
        small = sizes <= 2048
        s_small = np.where(small, sizes, 0)
        out_a, out_b = [], []
        for k in range(1, int(s_small.max(initial=1))):
            act = np.nonzero(s_small > k)[0]
            if not len(act):
                break
            cnt = s_small[act] - k
            t0 = np.repeat(starts[act], cnt) + (
                np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            a = ids[order[t0]]
            b = ids[order[t0 + k]]
            keep = a != b
            if keep.any():
                out_a.append(np.minimum(a[keep], b[keep]))
                out_b.append(np.maximum(a[keep], b[keep]))
        for gi in np.nonzero(~small)[0]:
            rids = ids[order[starts[gi] : starts[gi] + sizes[gi]]]
            a = np.full(len(rids) - 1, rids[0])
            b = rids[1:]
            keep = a != b
            out_a.append(np.minimum(a[keep], b[keep]))
            out_b.append(np.maximum(a[keep], b[keep]))
        if not out_a:
            return _empty_ab
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(out_a)),
                "b_id": pa.array(np.concatenate(out_b)),
            }
        )

    # multi-table duplicate candidates die inside the verification join's
    # first reducer — no separate pair-dedup shuffle needed
    pairs = buckets.groupby("rkey").map_groups(pairs_in_reducer, batch_format="pyarrow")

    _empty = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )

    sch = ds.schema()
    payload_type = dict(zip(sch.names, sch.types))[emb_col]

    def verify_red(a, b, apay, bpay) -> pa.Table:
        if len(a) == 0:
            return _empty
        ma = apay.flatten().to_numpy(zero_copy_only=False).reshape(len(a), -1).astype(np.float64)
        mb = bpay.flatten().to_numpy(zero_copy_only=False).reshape(len(b), -1).astype(np.float64)
        ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
        mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
        sims = np.einsum("ij,ij->i", ma, mb)
        keep = sims >= threshold
        return pa.table(
            {
                "a_id": pa.array(a[keep]),
                "b_id": pa.array(b[keep]),
                "cos_sim": pa.array(sims[keep]),
            }
        )

    return verify_pairs(pairs, ds, id_col, emb_col, payload_type, verify_red)


class _PairProbe:
    """Broadcast-probe: full normalized matrix in the object store; per
    batch emit all pairs (batch_row, any_row) with sim >= threshold and
    batch_id < other_id — each qualifying global pair is produced by
    exactly one batch row, so no dedup shuffle is needed.  Lazy ref
    resolution: only the ObjectRef travels with the task."""

    def __init__(self, all_ref, threshold: float, id_col: str, emb_col: str):
        self.all_ref = all_ref
        self.all_ids = None
        self.am = None
        self.threshold = threshold
        self.id_col = id_col
        self.emb_col = emb_col

    def _load(self):
        import ray

        a = ray.get(self.all_ref)
        self.all_ids = a["ids"]
        am = a["matrix"]
        self.am = am / np.linalg.norm(am, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.am is None:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
            )
        m = _emb_matrix(batch, self.emb_col)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ self.am.T  # (batch, n_all)
        ii, jj = np.nonzero(sims >= self.threshold)
        a = ids[ii]
        b = self.all_ids[jj]
        keep = a < b
        return pa.table({"a_id": pa.array(a[keep]), "b_id": pa.array(b[keep])})


def cosine_pairs_exact(ds, threshold: float, id_col: str, emb_col: str = "embedding",
                       concurrency: int | None = None):
    """Exact all-pairs cosine similarity >= threshold (a_id < b_id).

    Quadratic oracle baseline for ``lsh_cosine_pairs``: the full normalized
    matrix is broadcast once (``ray.put``), each batch does one matmul
    against it — distributed over rows, O(n²/p) per worker, no shuffle.
    """
    import ray

    # the broadcast side needs the full (ids, matrix) once on the driver —
    # gathered via a streamed pass (d floats/row, small); at 100 TB the
    # broadcast side would be a sampled/clustered subset (IVF centroids)
    ids_chunks, mat_chunks = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        ids_chunks.append(b[id_col].to_numpy().astype(np.int64))
        mat_chunks.append(_emb_matrix(b, emb_col))
    all_ids = np.concatenate(ids_chunks)
    all_mat = np.concatenate(mat_chunks)
    all_ref = ray.put({"ids": all_ids, "matrix": all_mat})

    return ds.map_batches(
        _PairProbe(all_ref, threshold, id_col, emb_col), batch_format="pyarrow"
    )


def _kmeans_centroids(sample: np.ndarray, nlist: int, iters: int = 8,
                      seed: int = 5) -> np.ndarray:
    """Deterministic mini Lloyd's k-means on a (normalized) sample —
    driver-side, the sample is small.  Returns (nlist, dim) normalized
    centroids."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    init = rng.choice(n, size=min(nlist, n), replace=False)
    cent = sample[init].copy()
    for _ in range(iters):
        sims = sample @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


class _IvfProbe:
    """IVF probe: assign each stored vector to its nearest centroid; a
    query only scores vectors in its ``nprobe`` closest lists.  Broadcast
    state (centroids + query matrix) resolves lazily from plasma."""

    def __init__(self, state_ref, k: int, nprobe: int, id_col: str, emb_col: str):
        self.state_ref = state_ref
        self.loaded = False
        self.k = k
        self.nprobe = nprobe
        self.id_col = id_col
        self.emb_col = emb_col

    def _load(self):
        import ray

        s = ray.get(self.state_ref)
        self.cent = s["centroids"]
        self.qids = s["qids"]
        self.qm = s["qm"]
        # per query: its nprobe nearest lists (stable → ties break to the
        # lowest centroid index, reproducible by an external oracle);
        # inverted to per-LIST query sets so the probe loops over the
        # (bounded) centroid count, never over the query count
        qsims = self.qm @ self.cent.T
        qlists = np.argsort(-qsims, axis=1, kind="stable")[:, : self.nprobe]
        nq = len(self.qids)
        ql_flat = qlists.ravel()
        q_flat = np.repeat(np.arange(nq, dtype=np.int64), qlists.shape[1])
        order = np.argsort(ql_flat, kind="stable")
        self.list_queries = [
            q_flat[order[lo:hi]]
            for lo, hi in zip(
                np.searchsorted(ql_flat[order], np.arange(len(self.cent))),
                np.searchsorted(ql_flat[order], np.arange(1, len(self.cent) + 1)),
            )
        ]
        self.loaded = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.loaded:
            self._load()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        if len(ids) == 0:
            return empty
        m = _emb_matrix(batch, self.emb_col)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ self.cent.T, axis=1)
        # group the batch's vectors by their list; ONE matmul per nonempty
        # list against just the queries probing it.  Per-list top-k(+ties)
        # is a superset of each query's union top-k, so the global
        # (sim desc, neighbor_id) merge stays exact.  Work is
        # O(per-list-members × probing-queries) — flat per query.
        vorder = np.argsort(assign, kind="stable")
        a_s = assign[vorder]
        starts = np.nonzero(np.r_[True, a_s[1:] != a_s[:-1]])[0]
        ends = np.r_[starts[1:], len(a_s)]
        out_q, out_n, out_s = [], [], []
        for li, s, e in zip(a_s[starts], starts, ends):
            ql = self.list_queries[int(li)]
            if not len(ql):
                continue
            rows = vorder[s:e]
            sims = m[rows] @ self.qm[ql].T  # (members, queries-of-list)
            kk = min(self.k, sims.shape[0])
            kth = -np.partition(-sims, kk - 1, axis=0)[kk - 1]  # (nq_l,)
            vi, qi = np.nonzero(sims >= kth[None, :])
            out_q.append(self.qids[ql[qi]])
            out_n.append(ids[rows[vi]])
            out_s.append(sims[vi, qi])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )


def ivf_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray, k: int,
             id_col: str, emb_col: str = "embedding", nlist: int = 16,
             nprobe: int = 4, train_rows: int = 10_000,
             centroid_ids: np.ndarray | None = None):
    """Approximate cosine top-k via IVF (inverted file) — the scale path
    for similarity search: each stored vector lands in one centroid list,
    queries score only ``nprobe`` lists (~nprobe/nlist of the data).
    ``nprobe = nlist`` degrades gracefully to exact brute force.

    Centroids either train driver-side with k-means on a streamed sample
    (default), or — with ``centroid_ids`` — are the normalized embeddings
    of those fixed rows in ascending id order (a fully deterministic,
    SQL-reproducible flat-centroid mode).  Everything else is one
    broadcast + per-batch matmuls + the global top-k merge.
    Returns (query_id, neighbor_id, rank).
    """
    import ray

    if centroid_ids is not None:
        cid = np.unique(np.asarray(centroid_ids, dtype=np.int64))
        cid_set = cid

        def keep_cent(b: pa.Table) -> pa.Table:
            return b.filter(
                pa.array(np.isin(b[id_col].to_numpy().astype(np.int64), cid_set))
            )

        got_ids, got_mat = [], []
        for b in ds.map_batches(keep_cent, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows:
                got_ids.append(b[id_col].to_numpy().astype(np.int64))
                got_mat.append(_emb_matrix(b, emb_col))
        if not got_ids:
            raise ValueError(
                f"ivf_topk: none of the {len(cid)} requested centroid_ids "
                f"exist in column {id_col!r}"
            )
        ids_found = np.concatenate(got_ids)
        mat_found = np.concatenate(got_mat)
        if len(ids_found) != len(cid):
            missing = np.setdiff1d(cid, ids_found)
            raise ValueError(
                f"ivf_topk: {len(missing)} of {len(cid)} centroid_ids are "
                f"missing from the dataset (first few: {missing[:8].tolist()}); "
                "a silently shrunk centroid set would change nlist and probe "
                "behavior"
            )
        order = np.argsort(ids_found, kind="stable")
        cent = mat_found[order]
        cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    else:
        # deterministic training sample: first train_rows in id order stream
        got = 0
        chunks = []
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
            chunks.append(_emb_matrix(b, emb_col))
            got += chunks[-1].shape[0]
            if got >= train_rows:
                break
        sample = np.concatenate(chunks)[:train_rows]
        sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        cent = _kmeans_centroids(sample, nlist)

    qm = np.ascontiguousarray(query_matrix, dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    state_ref = ray.put(
        {
            "centroids": cent,
            "qm": qm,
            "qids": np.asarray(query_ids, dtype=np.int64),
        }
    )
    cands = ds.map_batches(
        _IvfProbe(state_ref, k, nprobe, id_col, emb_col), batch_format="pyarrow"
    )

    from ..stages.util import topk_per_group

    return topk_per_group(
        cands, "query_id", k, ["sim", "neighbor_id"], [True, False],
        ["query_id", "neighbor_id"],
    )


class _KmeansPass:
    """Actor-pool stage for one Lloyd iteration: assign each vector to
    its nearest (cosine) centroid; emit either per-cluster partial sums
    (update pass) or the assignment rows (final pass)."""

    def __init__(self, state_ref, id_col: str, emb_col: str, emit: str):
        self.state_ref = state_ref
        self.id_col = id_col
        self.emb_col = emb_col
        self.emit = emit
        self._loaded = False

    def _load(self):
        import ray

        cidx, cent = ray.get(self.state_ref)
        self.cidx = cidx
        norms = np.linalg.norm(cent, axis=1, keepdims=True)
        self.cn = cent / np.where(norms == 0, 1.0, norms)
        self._loaded = True

    def _assign(self, batch: pa.Table):
        m = _emb_matrix(batch, self.emb_col).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        sims = (m / np.where(norms == 0, 1.0, norms)) @ self.cn.T
        # argmax returns the FIRST maximum → smallest cidx on exact ties,
        # matching the oracle's ORDER BY sim DESC, cidx
        return m, np.argmax(sims, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._loaded:
            self._load()
        m, a = self._assign(batch)
        if self.emit == "assign":
            return pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "cluster": pa.array(self.cidx[a].astype(np.int64)),
                }
            )
        nlist, dim = len(self.cidx), m.shape[1]
        sums = np.zeros((nlist, dim), dtype=np.float64)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=nlist).astype(np.int64)
        return pa.table(
            {
                "cidx": pa.array(np.arange(nlist, dtype=np.int64)),
                "cnt": pa.array(counts),
                "sums": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )


def kmeans_assign(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                  centroid_mod: int = 31, iters: int = 2,
                  quant_bits: int = 20, concurrency: int | None = None):
    """Distributed spherical k-means (Lloyd's): deterministic flat init
    (centroids = embeddings of ``id % centroid_mod == 0``, ascending id),
    ``iters`` assignment passes with ``iters - 1`` centroid updates in
    between.  Output: (id_col, cluster) — cluster is the centroid INDEX
    in the init ordering, so the result is SQL-reproducible.

    Scale shape: centroids broadcast once per iteration (``ray.put``);
    each pass is one streaming map over the corpus emitting (nlist × dim)
    per-block partials, reduced driver-side (tiny) — the corpus itself
    never re-shuffles and nothing corpus-sized is pinned.  Updated
    centroid means are quantized to a ``2**-quant_bits`` grid on BOTH
    engine and oracle sides, absorbing float-summation-order noise so
    the refined assignment stays bit-reproducible.  Empty clusters are
    dropped (their cidx disappears), mirroring the SQL group-by.
    """
    import ray

    scale = float(1 << quant_bits)

    def keep_cent(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        return b.filter(pa.array(ids % centroid_mod == 0))

    got_ids, got_mat = [], []
    for b in ds.map_batches(keep_cent, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            got_ids.append(b[id_col].to_numpy().astype(np.int64))
            got_mat.append(_emb_matrix(b, emb_col).astype(np.float64))
    if not got_ids:
        raise ValueError(
            f"kmeans_assign: no rows with {id_col} % {centroid_mod} == 0"
        )
    init_ids = np.concatenate(got_ids)
    order = np.argsort(init_ids)
    cent = np.concatenate(got_mat)[order]
    cidx = np.arange(len(init_ids), dtype=np.int64)

    kwargs = dict(batch_format="pyarrow")
    if concurrency is not None:
        kwargs["concurrency"] = concurrency

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def add_rkey(b: pa.Table) -> pa.Table:
        return b.append_column(
            "rkey",
            pa.array((b["cidx"].to_numpy().astype(np.int64) % R)),
        )

    def combine(g: pa.Table) -> pa.Table:
        # merge all of this reducer's (cidx, partial) rows vectorized
        c = g["cidx"].to_numpy().astype(np.int64)
        cnt = g["cnt"].to_numpy().astype(np.int64)
        mat = np.stack(g["sums"].to_numpy(zero_copy_only=False))
        uniq, codes = np.unique(c, return_inverse=True)
        s = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(s, codes, mat)
        n = np.bincount(codes, weights=cnt, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "cidx": pa.array(uniq),
                "cnt": pa.array(n),
                "sums": pa.array(list(s), pa.list_(pa.float64())),
            }
        )

    for _ in range(iters - 1):
        state_ref = ray.put((cidx, cent))
        parts_ds = ds.map_batches(
            _KmeansPass,
            fn_constructor_kwargs={
                "state_ref": state_ref, "id_col": id_col,
                "emb_col": emb_col, "emit": "partial",
            },
            concurrency=kwargs.get("concurrency", 2),
            batch_format="pyarrow",
        )
        # tree reduce under coarse keys: the (blocks × nlist) partial rows
        # combine inside workers; the driver reads ≤ nlist rows
        # (SCALING.md flagged the old take_all as ~400 GB through one
        # process at 10⁵ blocks × 4096 clusters)
        parts = (
            coalesce_for_shuffle(
                parts_ds.map_batches(add_rkey, batch_format="pyarrow"), 0.25
            )
            .groupby("rkey")
            .map_groups(combine, batch_format="pyarrow")
            .take_all()
        )
        nlist, dim = cent.shape
        sums = np.zeros((nlist, dim), dtype=np.float64)
        counts = np.zeros(nlist, dtype=np.int64)
        for row in parts:
            sums[int(row["cidx"])] += np.asarray(row["sums"], dtype=np.float64)
            counts[int(row["cidx"])] += int(row["cnt"])
        live = counts > 0
        cent = np.floor((sums[live] / counts[live, None]) * scale) / scale
        cidx = cidx[live]

    state_ref = ray.put((cidx, cent))
    return ds.map_batches(
        _KmeansPass,
        fn_constructor_kwargs={
            "state_ref": state_ref, "id_col": id_col,
            "emb_col": emb_col, "emit": "assign",
        },
        concurrency=kwargs.get("concurrency", 2),
        batch_format="pyarrow",
    )


def sql_kmeans_assign(table: str, id_col: str = "vec_id",
                      emb_col: str = "embedding", centroid_mod: int = 31,
                      iters: int = 2, quant_bits: int = 20) -> str:
    """DuckDB twin of :func:`kmeans_assign`: same flat init, same
    quantized-mean update, same sim-DESC-then-cidx assignment."""
    scale = repr(float(1 << quant_bits))
    emb = f"CAST({emb_col} AS DOUBLE[])"

    def assign_cte(cent: str) -> str:
        return f"""(
          SELECT {id_col}, cidx FROM (
            SELECT e.{id_col}, c.cidx,
                   ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                     ORDER BY list_cosine_similarity({emb}, c.c) DESC, c.cidx) AS rn
            FROM {table} e CROSS JOIN {cent} c
          ) WHERE rn = 1
        )"""

    ctes = [f"""cent0 AS (
          SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cidx,
                 {emb} AS c
          FROM {table} WHERE {id_col} % {centroid_mod} = 0
        )"""]
    for it in range(iters - 1):
        ctes.append(f"a{it} AS {assign_cte(f'cent{it}')}")
        ctes.append(f"""cent{it + 1} AS (
          SELECT cidx, list(val ORDER BY pos) AS c FROM (
            SELECT cidx, pos, FLOOR(AVG(val) * {scale}) / {scale} AS val
            FROM (
              SELECT a.cidx,
                     generate_subscripts(CAST(e.{emb_col} AS DOUBLE[]), 1) AS pos,
                     unnest(CAST(e.{emb_col} AS DOUBLE[])) AS val
              FROM a{it} a JOIN {table} e USING ({id_col})
            ) GROUP BY cidx, pos
          ) GROUP BY cidx
        )""")
    final = iters - 1
    return f"""
        WITH {', '.join(ctes)}
        SELECT {id_col}, cidx AS cluster
        FROM {assign_cte(f'cent{final}')} t
    """


def _pq_codes_mat(q: np.ndarray, cq: np.ndarray, n_sub: int) -> np.ndarray:
    """(n, n_sub) nearest-codebook-centroid codes over int-quantized
    matrices; exact int64 distances, first-min = lowest cid tie order."""
    n, dim = q.shape
    sub = dim // n_sub
    codes = np.empty((n, n_sub), dtype=np.int64)
    for m in range(n_sub):
        qa = q[:, m * sub:(m + 1) * sub]
        ca = cq[:, m * sub:(m + 1) * sub]
        d2 = (
            (qa * qa).sum(1)[:, None]
            - 2 * qa @ ca.T
            + (ca * ca).sum(1)[None, :]
        )
        codes[:, m] = np.argmin(d2, axis=1)  # first min = lowest cid
    return codes


def pq_codes(ds, id_col: str = "vec_id", emb_col: str = "embedding",
             n_sub: int = 4, centroid_mod: int = 101, quant_bits: int = 10):
    """Product-quantization code assignment — the compression half of an
    IVF-PQ index: split each embedding into ``n_sub`` contiguous
    subspaces and assign each to its nearest codebook centroid, emitting
    (id, m, code) — ``n_sub`` small codes per vector instead of the full
    float payload.

    Codebook = the embeddings with ``id % centroid_mod == 0`` (ascending
    id; the :func:`kmeans_assign` deterministic-init convention — swap in
    trained sub-codebooks without changing the serving path).  BOTH
    vectors and centroids are quantized to a ``2^-quant_bits`` grid
    first (FLOOR — round's half-tie differs between numpy and SQL; the
    ×2^quant_bits product is exact in float64, so floor is deterministic),
    so every subspace distance is an exact int64 sum of squares
    and argmin ties break to the lowest code identically in numpy
    (first-min) and SQL (ROW_NUMBER ORDER BY dist, cid) — hash-exact.

    Scale shape: the codebook broadcasts once (``ray.put``,
    K × dim × 8 B); assignment is one streaming map emitting n_sub rows
    per vector — the corpus never shuffles.
    """
    import ray

    scale = float(1 << quant_bits)

    def keep_cent(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        return b.filter(pa.array(ids % centroid_mod == 0))

    got_ids, got_mat = [], []
    for b in ds.map_batches(keep_cent, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            got_ids.append(b[id_col].to_numpy().astype(np.int64))
            got_mat.append(_emb_matrix(b, emb_col).astype(np.float64))
    if not got_ids:
        raise ValueError(
            f"pq_codes: no rows with {id_col} % {centroid_mod} == 0"
        )
    init_ids = np.concatenate(got_ids)
    order = np.argsort(init_ids)
    cent_q = np.floor(np.concatenate(got_mat)[order] * scale).astype(np.int64)
    dim = cent_q.shape[1]
    if dim % n_sub:
        raise ValueError(f"pq_codes: dim {dim} not divisible by {n_sub}")
    cent_ref = ray.put(cent_q)

    def assign(batch: pa.Table) -> pa.Table:
        cq = ray.get(cent_ref)
        q = np.floor(
            _emb_matrix(batch, emb_col).astype(np.float64) * scale
        ).astype(np.int64)
        n = len(q)
        ids = batch[id_col].to_numpy().astype(np.int64)
        out_id = np.repeat(ids, n_sub)
        out_m = np.tile(np.arange(n_sub, dtype=np.int64), n)
        codes = _pq_codes_mat(q, cq, n_sub).reshape(-1)
        return pa.table(
            {
                id_col: pa.array(out_id),
                "m": pa.array(out_m),
                "code": pa.array(codes),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def sql_pq_codes(table: str, id_col: str = "vec_id",
                 emb_col: str = "embedding", n_sub: int = 4,
                 centroid_mod: int = 101, quant_bits: int = 10) -> str:
    """DuckDB twin of :func:`pq_codes` — same quantized grid, same
    subspace split, same (dist, cid) tie order."""
    scale = 1 << quant_bits
    return f"""
WITH dd AS (SELECT MAX(len({emb_col})) AS d FROM {table}),
q AS (
  SELECT {id_col}, CAST(t.i AS BIGINT) AS dim,
         CAST(FLOOR(CAST({emb_col}[CAST(t.i + 1 AS INT)] AS DOUBLE)
                    * {scale}) AS BIGINT) AS x
  FROM {table} CROSS JOIN dd,
       UNNEST(generate_series(0, CAST(dd.d - 1 AS BIGINT))) AS t(i)
),
cidx AS (
  SELECT {id_col} AS cvid,
         CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS BIGINT) AS cid
  FROM {table} WHERE {id_col} % {centroid_mod} = 0
),
cv AS (SELECT c.cid, q.dim, q.x FROM cidx c JOIN q ON q.{id_col} = c.cvid),
d AS (
  SELECT q.{id_col}, (q.dim * {n_sub}) // dd.d AS m, cv.cid,
         SUM((q.x - cv.x) * (q.x - cv.x)) AS dist
  FROM q JOIN cv ON cv.dim = q.dim CROSS JOIN dd
  GROUP BY 1, 2, 3
),
best AS (
  SELECT {id_col}, m, cid,
         ROW_NUMBER() OVER (PARTITION BY {id_col}, m
                            ORDER BY dist, cid) AS rn
  FROM d
)
SELECT {id_col}, m, cid AS code FROM best WHERE rn = 1
"""


def adc_topk(ds, k: int, id_col: str = "vec_id", emb_col: str = "embedding",
             query_mod: int = 97, n_sub: int = 4, centroid_mod: int = 101,
             quant_bits: int = 10):
    """Asymmetric-distance (ADC) top-k over PQ codes — the serving half
    of IVF-PQ: each query precomputes a (n_sub × K) lookup table of
    exact int64 squared distances to every sub-centroid, and a target's
    approximate distance is n_sub table gathers + a sum, never a d-dim
    dot product.  Declared-approximate RANKING (it is PQ's approximation)
    but every number is integer-exact, so the oracle reproduces the
    result hash-for-hash.

    Queries = vectors with ``id % query_mod == 0`` (the ann_topk
    convention); codebook as :func:`pq_codes`.  Output
    (query_id, neighbor_id, rank, adist) — rank 1-based by
    (adist, neighbor_id).

    Scale shape: LUTs broadcast once (nq × n_sub × K × 8 B); the corpus
    streams through one map emitting ≤ nq·k rows per block into the
    coarse-key top-k merge.  At 10⁹ vectors the per-batch work is the
    code assignment (already needed for the index) + an O(n_sub) gather
    per (query, row) — the whole point of PQ serving.
    """
    import ray

    from ..stages.util import topk_per_group

    scale = float(1 << quant_bits)

    # ONE corpus pass gathers both small sides (centroids + queries);
    # the quantize/sort-by-id recipe is shared with pq_codes so the
    # codebook here and the codes it assigns can never drift apart
    def keep_either(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        return b.filter(
            pa.array((ids % centroid_mod == 0) | (ids % query_mod == 0))
        )

    got_i, got_m = [], []
    for b in ds.map_batches(keep_either, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            got_i.append(b[id_col].to_numpy().astype(np.int64))
            got_m.append(_emb_matrix(b, emb_col).astype(np.float64))
    if not got_i:
        raise ValueError(
            f"adc_topk: no rows with {id_col} % {centroid_mod} == 0 "
            f"or % {query_mod} == 0"
        )
    all_ids = np.concatenate(got_i)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    all_q = np.floor(np.concatenate(got_m)[order] * scale).astype(np.int64)

    def side(mod):
        sel = all_ids % mod == 0
        if not sel.any():
            raise ValueError(f"adc_topk: no rows with {id_col} % {mod} == 0")
        return all_ids[sel], all_q[sel]

    cent_ids, cq = side(centroid_mod)
    qids, qmat = side(query_mod)
    dim = cq.shape[1]
    if dim % n_sub:
        raise ValueError(f"adc_topk: dim {dim} not divisible by {n_sub}")
    sub = dim // n_sub
    nq, K = len(qids), len(cent_ids)
    lut = np.empty((nq, n_sub, K), dtype=np.int64)
    for m in range(n_sub):
        qa = qmat[:, m * sub:(m + 1) * sub]
        ca = cq[:, m * sub:(m + 1) * sub]
        lut[:, m, :] = (
            (qa * qa).sum(1)[:, None]
            - 2 * qa @ ca.T
            + (ca * ca).sum(1)[None, :]
        )
    bc = ray.put((qids, lut, cq))

    def stage(batch: pa.Table) -> pa.Table:
        qids_b, lut_b, cq_b = ray.get(bc)
        x = np.floor(
            _emb_matrix(batch, emb_col).astype(np.float64) * scale
        ).astype(np.int64)
        ids = batch[id_col].to_numpy().astype(np.int64)
        codes = _pq_codes_mat(x, cq_b, n_sub)              # (b, M)
        # (nq, b): accumulate per-subspace LUT gathers instead of
        # materializing the (nq, b, n_sub) fancy-index intermediate —
        # same integer result at 1/n_sub the peak memory
        adist = lut_b[:, 0, codes[:, 0]]  # fancy index → fresh array
        for m in range(1, n_sub):
            adist += lut_b[:, m, codes[:, m]]
        nqb, b = adist.shape
        kk = min(k, b)
        if b > kk:
            part = np.argpartition(adist, kk - 1, axis=1)[:, :kk]
            # keep ties at the boundary: threshold per query
            kth = np.take_along_axis(adist, part[:, kk - 1:kk], axis=1)
            keep_mask = adist <= kth
        else:
            keep_mask = np.ones_like(adist, dtype=bool)
        qi, ri = np.nonzero(keep_mask)
        return pa.table(
            {
                "query_id": pa.array(qids_b[qi]),
                "neighbor_id": pa.array(ids[ri]),
                "adist": pa.array(adist[qi, ri]),
            }
        )

    cands = ds.map_batches(stage, batch_format="pyarrow")
    return topk_per_group(
        cands, "query_id", k, ["adist", "neighbor_id"], [False, False],
        ["query_id", "neighbor_id", "adist"],
    )


def sql_adc_topk(table: str, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding", query_mod: int = 97,
                 n_sub: int = 4, centroid_mod: int = 101,
                 quant_bits: int = 10) -> str:
    """DuckDB twin of :func:`adc_topk` — recomputes codes and LUT
    distances from the same quantized grid."""
    scale = 1 << quant_bits
    return f"""
WITH dd AS (SELECT MAX(len({emb_col})) AS d FROM {table}),
q AS (
  SELECT {id_col}, CAST(t.i AS BIGINT) AS dim,
         CAST(FLOOR(CAST({emb_col}[CAST(t.i + 1 AS INT)] AS DOUBLE)
                    * {scale}) AS BIGINT) AS x
  FROM {table} CROSS JOIN dd,
       UNNEST(generate_series(0, CAST(dd.d - 1 AS BIGINT))) AS t(i)
),
cidx AS (
  SELECT {id_col} AS cvid,
         CAST(ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS BIGINT) AS cid
  FROM {table} WHERE {id_col} % {centroid_mod} = 0
),
cv AS (SELECT c.cid, q.dim, q.x FROM cidx c JOIN q ON q.{id_col} = c.cvid),
d0 AS (
  SELECT q.{id_col}, (q.dim * {n_sub}) // dd.d AS m, cv.cid,
         SUM((q.x - cv.x) * (q.x - cv.x)) AS dist
  FROM q JOIN cv ON cv.dim = q.dim CROSS JOIN dd
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT {id_col}, m, cid AS code FROM (
    SELECT {id_col}, m, cid,
           ROW_NUMBER() OVER (PARTITION BY {id_col}, m
                              ORDER BY dist, cid) AS rn
    FROM d0
  ) WHERE rn = 1
),
qd AS (
  SELECT q.{id_col} AS query_id, q.dim, q.x FROM q
  WHERE q.{id_col} % {query_mod} = 0
),
ad AS (
  SELECT qd.query_id, c.{id_col} AS neighbor_id,
         SUM((qd.x - cv.x) * (qd.x - cv.x)) AS adist
  FROM codes c
  JOIN cv ON cv.cid = c.code
  CROSS JOIN dd
  JOIN qd ON qd.dim = cv.dim AND (cv.dim * {n_sub}) // dd.d = c.m
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rank, CAST(adist AS BIGINT) AS adist FROM (
  SELECT query_id, neighbor_id, adist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adist, neighbor_id) AS BIGINT)
           AS rank
  FROM ad
) WHERE rank <= {k}
"""
