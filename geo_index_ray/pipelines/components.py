"""Distributed connected components over a dup-pair edge list.

The terminal stage of every web-scale dedup pipeline: near-dup PAIRS
(minhash / simhash / ngram / embedding) are only half the job — keeping
one document per duplicate *cluster* requires the transitive closure of
the pair graph.  This module computes it with the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14): each round is one groupby-shuffle
over the edge list, and the edge set provably converges to a forest of
stars rooted at each component's minimum id in O(log n) rounds — no
O(diameter) label chasing, no driver-side graph.

Scale shape: only (u, v) int64 edges ever shuffle (16 B/row); per-round
work inside each reducer is vectorized numpy (lexsort + reduceat, no
Python per node).  The driver holds nothing but an 8-byte convergence
fingerprint per round.  The round count is logarithmic in the largest
component's size, and near-dup clusters are overwhelmingly tiny, so in
practice 2-4 rounds close the graph.  Reference scope: geo-index has no
graph stage; this is an engine-added operator for the LLM-data pipeline
(SURVEY.md §2.4), mirroring the dedup post-pass in web-corpus curation.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..stages.util import gap_pair_offsets, reducer_count


def _group_mins(u: np.ndarray, v: np.ndarray):
    """Per-u neighbourhood minimum, vectorized across all groups.

    Returns (order, starts, group_id_per_sorted_row, m_per_group) where
    ``m = min(min_{v in N(u)} v, u)`` and rows sorted by (u, v)."""
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    starts = np.r_[0, np.flatnonzero(us[1:] != us[:-1]) + 1]
    gid = np.cumsum(np.r_[False, us[1:] != us[:-1]])
    min_v = np.minimum.reduceat(vs, starts)
    m = np.minimum(min_v, us[starts])
    return order, starts, gid, m, us, vs


def _large_star_reducer(g: pa.Table) -> pa.Table:
    """large-star: for each u, emit (v, m) for every neighbour v > u."""
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    _, _, gid, m, us, vs = _group_mins(u, v)
    keep = vs > us
    out_u = vs[keep]
    out_v = m[gid][keep]
    return _dedup_edges(out_u, out_v)


def _small_star_reducer(g: pa.Table) -> pa.Table:
    """small-star: edges arrive oriented (u = max, v = min); for each u
    emit (v, m) for v in N(u) ∪ {u}, v ≠ m."""
    u = g["u"].to_numpy()
    v = g["v"].to_numpy()
    _, starts, gid, m, us, vs = _group_mins(u, v)
    # neighbours (all < u by orientation) re-pointed at m, m itself skipped
    keep = vs != m[gid]
    out_u = [vs[keep]]
    out_v = [m[gid][keep]]
    # u itself re-pointed at m (u > m always holds unless u was isolated)
    uu = us[starts]
    ukeep = uu != m
    out_u.append(uu[ukeep])
    out_v.append(m[ukeep])
    return _dedup_edges(np.concatenate(out_u), np.concatenate(out_v))


def _dedup_edges(u: np.ndarray, v: np.ndarray) -> pa.Table:
    if len(u) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})


_MIX = np.uint64(0x9E3779B97F4A7C15)


def _edge_fingerprint_block(batch: pa.Table) -> pa.Table:
    """Order-insensitive (sum, xor, count) partial per block.

    Two independent 64-bit accumulators (wrap-around sum AND xor of the
    per-edge mixed hashes) make an accidental collision between two
    *different* edge multisets effectively impossible — the convergence
    loop treats fingerprint equality as "the edge set stopped changing",
    so a collision would end the loop on a non-star edge set and emit
    wrong component labels (the round-4 grid_clusters suspect)."""
    u = batch["u"].to_numpy().view(np.uint64)
    v = batch["v"].to_numpy().view(np.uint64)
    with np.errstate(over="ignore"):
        h = (u * _MIX) ^ (v + _MIX)
        h2 = (h ^ (h >> np.uint64(29))) * np.uint64(0xBF58476D1CE4E5B9)
        s = np.uint64(0)
        for chunk in np.array_split(h, max(1, len(h) // 65536)):
            s += np.sum(chunk, dtype=np.uint64)
        x = np.bitwise_xor.reduce(h2) if len(h2) else np.uint64(0)
    return pa.table({"fp": pa.array([int(s)], pa.uint64()),
                     "fpx": pa.array([int(x)], pa.uint64()),
                     "n": pa.array([len(u)], pa.int64())})


def _rkey(col: np.ndarray, r: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((col.view(np.uint64) * _MIX) % np.uint64(r)).astype(np.int64)


def _star_violations(edges_ds, r: int) -> int:
    """Count violations of the min-rooted star-forest invariant.

    A converged edge set must satisfy, per edge (u, v): u > v (child
    points DOWN to its root), every child u appears in exactly ONE edge,
    and no id is both a child and a root.  One lean exchange: (id, tag)
    rows hashed on id, per-reducer vectorized checks, driver sums a
    per-reducer count.  Cost: one pass over the (16 B/row) star edges —
    paid once at convergence, so correctness is asserted, not assumed.
    """

    def tag_rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        ids = np.concatenate([u, v])
        tag = np.concatenate(
            [np.zeros(len(u), np.int8), np.ones(len(v), np.int8)]
        )
        bad_orient = int(np.sum(u <= v))
        out = pa.table({
            "id": pa.array(ids),
            "tag": pa.array(tag),
            "rkey": pa.array(_rkey(ids, r)),
        })
        # ship the orientation violations as poisoned root rows so the
        # driver sees them without a second pass
        if bad_orient:
            out = pa.concat_tables([out, pa.table({
                "id": pa.array([np.int64(-1)] * bad_orient, pa.int64()),
                "tag": pa.array([np.int8(2)] * bad_orient, pa.int8()),
                "rkey": pa.array([np.int64(0)] * bad_orient, pa.int64()),
            })])
        return out

    def check(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy()
        tag = g["tag"].to_numpy()
        n_bad = int(np.sum(tag == 2))
        child = np.sort(ids[tag == 0])
        roots = ids[tag == 1]
        # child appearing twice = two outgoing edges
        n_bad += int(np.sum(child[1:] == child[:-1]))
        # id both child and root
        if len(child) and len(roots):
            uroots = np.unique(roots)
            pos = np.searchsorted(child, uroots)
            hit = (pos < len(child)) & (child[np.minimum(pos, len(child) - 1)] == uroots)
            n_bad += int(np.sum(hit))
        return pa.table({"n_bad": pa.array([n_bad], pa.int64())})

    parts = (
        edges_ds.map_batches(tag_rows, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(check, batch_format="pyarrow")
        .take_all()
    )
    return sum(int(row["n_bad"]) for row in parts)


def _star_round(edges_ds, large: bool, r: int):
    """One large- or small-star round: orient, groupby u-hash, reduce."""

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy()
        v = batch["v"].to_numpy()
        if large:
            # symmetrize: every edge contributes to both endpoints' stars
            ou = np.concatenate([u, v])
            ov = np.concatenate([v, u])
        else:
            ou = np.maximum(u, v)
            ov = np.minimum(u, v)
        return pa.table({"u": pa.array(ou), "v": pa.array(ov),
                         "rkey": pa.array(_rkey(ou, r))})

    reducer = _large_star_reducer if large else _small_star_reducer
    oriented = edges_ds.map_batches(orient, batch_format="pyarrow")
    # all edges of one u share an rkey, so per-reducer group math is global
    return oriented.groupby("rkey").map_groups(
        lambda g: reducer(g), batch_format="pyarrow"
    )


def connected_components(pairs_ds, a_col: str = "a_id", b_col: str = "b_id",
                         max_rounds: int = 24,
                         small_graph_rows: int = 2_000_000):
    """(node, component) for every node in the pair list; component = min id.

    ``pairs_ds``: Dataset with two int64 id columns.  Returns a Dataset
    with columns (node, component), one row per distinct node.

    Driver loop holds only an (hash, count) fingerprint per round; the
    edge Dataset is re-materialized each round (lean: 16 B/row) so the
    streaming executor frees the previous round's blocks.

    ``small_graph_rows``: the cleaned edge list is materialized once up
    front (its first large-star round would materialize it anyway), so
    its row count is free metadata; at or under the gate the labels are
    resolved inside ONE task (vectorized min-label propagation with
    pointer jumping) instead of O(log n) two-exchange rounds — min-id
    component labels are canonical, so the two paths agree exactly
    (pinned by ``tests/test_components.py::TestSmallGraphFold``).
    """
    r = reducer_count()

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy().astype(np.int64)
        b = batch[b_col].to_numpy().astype(np.int64)
        keep = a != b
        return pa.table({"u": pa.array(a[keep]), "v": pa.array(b[keep])})

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()

    if edges.count() <= small_graph_rows:
        def cc_all(b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy()
            v = b["v"].to_numpy()
            nodes = np.unique(np.concatenate([u, v]))
            ui = np.searchsorted(nodes, u)
            vi = np.searchsorted(nodes, v)
            lbl = np.arange(len(nodes), dtype=np.int64)
            while True:
                prev = lbl.copy()
                # propagate the smaller label across every edge, both
                # directions, then compress one pointer-jump level;
                # labels are indices into the SORTED node array, so the
                # fixpoint label is the component's min id's index
                np.minimum.at(lbl, ui, lbl[vi])
                np.minimum.at(lbl, vi, lbl[ui])
                lbl = np.minimum(lbl, lbl[lbl])
                if np.array_equal(lbl, prev):
                    break
            return pa.table(
                {"node": pa.array(nodes), "component": pa.array(nodes[lbl])}
            )

        return _with_schema(
            edges.repartition(1)
            .map_batches(cc_all, batch_format="pyarrow", batch_size=None),
            {"node": pa.int64(), "component": pa.int64()},
        )

    def fingerprint(ds) -> tuple[int, int, int]:
        parts = ds.map_batches(
            _edge_fingerprint_block, batch_format="pyarrow"
        ).take_all()  # one tiny row per block
        s = np.uint64(0)
        x = np.uint64(0)
        n = 0
        with np.errstate(over="ignore"):
            for row in parts:
                s += np.uint64(row["fp"])
                x ^= np.uint64(row["fpx"])
                n += int(row["n"])
        return int(s), int(x), n

    prev_fp = None
    converged = False
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True, r=r)
        edges = _star_round(edges, large=False, r=r).materialize()
        fp = fingerprint(edges)
        if fp == prev_fp:
            # Fingerprint stability says the edge multiset stopped
            # changing; the Kiveris et al. fixed point is a star forest,
            # but assert that DIRECTLY before trusting the labels — a
            # fingerprint collision (or any deviation from the paper's
            # invariants) would otherwise ship wrong components.
            if _star_violations(edges, r) == 0:
                converged = True
                break
        prev_fp = fp
    if not converged and _star_violations(edges, r) != 0:
        raise RuntimeError(
            "connected_components: star-forest invariant violated after "
            f"{max_rounds} rounds — edge set did not converge"
        )

    # converged: edges form stars (child → root, child > root). Final
    # result = every child→root plus each root→itself, deduped on node
    # via one more lean groupby on the node hash.
    expanded = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([b["u"].combine_chunks(), b["v"].combine_chunks()]) if b.num_rows else pa.array([], pa.int64()),
            "component": pa.concat_arrays([b["v"].combine_chunks(), b["v"].combine_chunks()]) if b.num_rows else pa.array([], pa.int64()),
        }),
        batch_format="pyarrow",
    )

    def dedup_nodes(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy()
        comp = g["component"].to_numpy()
        order = np.lexsort((comp, node))
        node, comp = node[order], comp[order]
        keep = np.r_[True, node[1:] != node[:-1]]
        return pa.table({"node": pa.array(node[keep]),
                         "component": pa.array(comp[keep])})

    keyed = expanded.map_batches(
        lambda b: b.append_column("nkey", pa.array(_rkey(b["node"].to_numpy(), r))),
        batch_format="pyarrow",
    )
    out = keyed.groupby("nkey").map_groups(
        dedup_nodes, batch_format="pyarrow"
    ).select_columns(["node", "component"])
    return _with_schema(out, {"node": pa.int64(), "component": pa.int64()})


def _with_schema(ds, fields: dict):
    """Union a typed zero-row block so an empty result keeps its schema
    (an empty groupby otherwise yields a schema-less Dataset)."""
    import ray.data as rd

    empty = pa.table({k: pa.array([], t) for k, t in fields.items()})
    return rd.from_arrow(empty).union(ds)


def keep_list(docs_ds, clusters_ds, id_col: str = "doc_id"):
    """Canonical dedup keep-list: every document except non-representative
    cluster members (representative = the cluster's min id, i.e. the
    node whose label equals itself).  Output: (id_col,) kept ids.

    Scale shape: a hash-partitioned anti-join — only 8 B ids shuffle on
    both sides (corpus ids tagged 0, drop ids tagged 1, one groupby on
    the id hash, reduce-side filter).  No broadcast of the drop set: at
    web scale half the corpus can be duplicates, so the drop side is NOT
    small enough to ``ray.put``.
    """
    r = reducer_count()

    def drops(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        comp = batch["component"].to_numpy()
        d = node[node != comp].astype(np.int64)
        return pa.table({"id": pa.array(d),
                         "tag": pa.array(np.ones(len(d), np.int8)),
                         "rkey": pa.array(_rkey(d, r))})

    def keeps(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pa.table({"id": pa.array(ids),
                         "tag": pa.array(np.zeros(len(ids), np.int8)),
                         "rkey": pa.array(_rkey(ids, r))})

    tagged = docs_ds.map_batches(keeps, batch_format="pyarrow").union(
        clusters_ds.map_batches(drops, batch_format="pyarrow")
    )

    def anti(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy()
        tag = g["tag"].to_numpy()
        order = np.lexsort((tag, ids))
        ids, tag = ids[order], tag[order]
        # a dropped id contributes a tag-1 row; corpus rows are tag 0 and
        # sort first within the id, so an id is kept iff its id-group
        # contains no tag-1 row
        starts = np.r_[0, np.flatnonzero(ids[1:] != ids[:-1]) + 1]
        has_drop = np.maximum.reduceat(tag, starts) == 1
        out = ids[starts][~has_drop]
        return pa.table({id_col: pa.array(out)})

    return _with_schema(
        tagged.groupby("rkey").map_groups(anti, batch_format="pyarrow"),
        {id_col: pa.int64()},
    )


def pagerank_int(edges, src_col: str, dst_col: str, iters: int = 3,
                 scale: int = 10**12, damp_num: int = 85,
                 damp_den: int = 100, state: str = "memory",
                 checkpoint_dir: str | None = None,
                 small_graph_rows: int = 2_000_000):
    """PageRank over an int64 edge list in EXACT integer arithmetic —
    ``iters`` synchronous power-iteration rounds of ``pr' = base +
    (damp_num * Σ_in floor(pr/outdeg)) // damp_den`` with ``base =
    scale*(damp_den-damp_num)//damp_den`` (dangling mass dropped, the
    standard sparse simplification).  Integer floor-division at every
    step makes the result independent of summation order, so the same
    recurrence in any engine reproduces it bit-for-bit (the oracle twin
    unrolls it in SQL); overflow bound: ``damp_num * max_indegree *
    scale`` must stay under 2^63 — at the default scale that is ~10^5
    in-edges per node; shrink ``scale`` for denser graphs.

    Shape per iteration — exactly TWO coarse-key exchanges (the GraphX
    src-cut/dst-cut shape, fused so each half-step is one shuffle plus
    one vectorized reducer, with no general hash_join machinery):

    - exchange 1 (src partition): edge rows keyed ``hash(src) % R``
      union the state rows keyed ``hash(node) % R`` — co-located, so
      each reducer resolves ``share = pr // outdeg`` for ALL of its
      srcs with one searchsorted and emits per-dst partial sums
      already keyed ``hash(dst) % R`` for the next exchange.
    - exchange 2 (dst partition): partials union the static (node, d)
      rows; each reducer sums incoming mass per node and applies the
      damping recurrence — its output IS the next round's state leg,
      already carrying its routing key.

    The pr table never broadcasts (node count can be corpus-sized);
    the driver holds nothing; per-round state is the (node, d, pr)
    dataset.  Integer floor-division keeps every grouping order
    equivalent, so the fused plan is bit-identical to the unfused one.

    ``state`` controls how the per-round state and the re-consumed
    inputs are held between iterations.  Ray Data lineages are TREES:
    a Dataset consumed by two downstream stages re-executes its whole
    upstream derivation once per consumer, so a lazy iterative loop is
    super-linear in ``iters`` (measured at sf0.1: 3.1 s for one
    iteration but 20.5 s for three — each round was re-deriving the
    edge list and re-running the degree groupby of every earlier
    round).

    - ``"memory"`` (default): ``materialize()`` the edge list and the
      static degree table once and the (node, d, pr) state after every
      round — each round then executes exactly one join + one groupby.
      Pins one edge-list copy + one node-state copy in the object
      store; right whenever the graph fits cluster memory (node state
      is 24 B/node, edges 16 B/edge).
    - ``"parquet"``: same shape, but each round's state is written to
      ``checkpoint_dir/round_i`` and read back — nothing pinned, and a
      killed job resumes from the last completed round (the 10^12-edge
      path).
    - ``"lazy"``: the original chained plan, zero pinning; only sane
      for 1-2 iterations.

    ``small_graph_rows``: once the slot-encoded edge list is
    materialized its row count is free metadata; at or under this gate
    (and outside ``"parquet"`` mode) the whole power iteration runs
    inside ONE reducer task instead of ``2*iters`` exchanges — the
    same fold every engine applies to aggregates that fit a block.
    Integer floor-division makes the recurrence order-independent, so
    the two paths are bit-identical (pinned by
    ``tests/test_components.py``); a corpus-scale link graph blows
    past the gate and takes the exchange path unchanged.
    """
    if state not in ("memory", "parquet", "lazy"):
        raise ValueError(f"unknown state mode {state!r}")
    if state == "parquet":
        if checkpoint_dir is None:
            raise ValueError("state='parquet' requires checkpoint_dir")
        import ray.data as rd

        def _persist(ds, label: str):
            # resume: a round directory with a DONE marker is complete
            # (the marker is written after write_parquet returns, so a
            # killed mid-write round recomputes)
            path = os.path.join(checkpoint_dir, label)
            marker = os.path.join(path, "DONE")
            if not os.path.exists(marker):
                ds.write_parquet(path)
                with open(marker, "w") as f:
                    f.write("1\n")
            return rd.read_parquet(
                path, file_extensions=["parquet"]
            )
    elif state == "memory":
        def _persist(ds, label: str):
            return ds.materialize()
    else:
        def _persist(ds, label: str):
            return ds

    base = scale * (damp_den - damp_num) // damp_den

    # node state carries the STATIC out-degree alongside the evolving
    # rank: one groupby builds (node, d) from both edge endpoints (dst
    # rows contribute d=0, so sinks appear with degree 0) and every later
    # iteration is exactly ONE hash_join (pr ⋈ edges on src) + one
    # union-groupby refresh — no per-iteration edge⋈outdeg re-derivation
    # and no second join for the base term.
    # (endpoint/degree rows are derived from the slot-encoded edge list
    # below — the raw edge Dataset is never persisted on its own: the
    # only two consumers both read the slot encoding, so persisting the
    # plain copy too was one whole extra setup execution, measured at
    # ~0.3 s of pure executor floor per run at sf0.1.)

    r = reducer_count()

    # shared slot schema for BOTH exchanges: (rkey, k1, k2, k3, tag).
    # exchange 1 — edge row: (h(src)%R, src, dst, 0, tag=0);
    #              state row: (h(node)%R, node, pr, d, tag=1).
    # exchange 2 — partial:  (h(dst)%R, dst, inc, 0, tag=0);
    #              degree:   (h(node)%R, node, 0, d, tag=1).
    _state_fields = {
        "rkey": pa.int64(), "k1": pa.int64(), "k2": pa.int64(),
        "k3": pa.int64(), "tag": pa.int8(),
    }

    def edge_slots(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        t = batch[dst_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "rkey": pa.array(_rkey(s, r)),
                "k1": pa.array(s),
                "k2": pa.array(t),
                "k3": pa.array(np.zeros(len(s), np.int64)),
                "tag": pa.array(np.zeros(len(s), np.int8)),
            }
        )

    def deg_slots(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "rkey": pa.array(_rkey(n, r)),
                "k1": pa.array(n),
                "k2": pa.array(np.zeros(len(n), np.int64)),
                "k3": pa.array(batch["d"].to_numpy().astype(np.int64)),
                "tag": pa.array(np.ones(len(n), np.int8)),
            }
        )

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        # derive (node, degree-partial) straight from the slot rows so
        # the degree chain consumes the one persisted edge encoding
        s = batch["k1"].to_numpy()
        t = batch["k2"].to_numpy()
        us, cs = np.unique(s, return_counts=True)
        ut = np.unique(t)
        return pa.table(
            {
                "node": pa.array(np.concatenate([us, ut])),
                "d": pa.array(
                    np.concatenate([cs.astype(np.int64),
                                    np.zeros(len(ut), np.int64)])
                ),
            }
        )

    edge_rows = _persist(
        edges.select_columns([src_col, dst_col])
        .map_batches(edge_slots, batch_format="pyarrow"),
        "edge_slots",
    )

    if state != "parquet" and edge_rows.count() <= small_graph_rows:
        # small-graph fold: the count is free metadata on the
        # materialized slot table; every edge fits one reducer, so run
        # all `iters` rounds there in one exchange (bit-identical —
        # integer floor-division is order-independent)
        def all_rounds(g: pa.Table) -> pa.Table:
            s = g["k1"].to_numpy()
            t = g["k2"].to_numpy()
            nodes = np.unique(np.concatenate([s, t]))
            si = np.searchsorted(nodes, s)
            ti = np.searchsorted(nodes, t)
            deg = np.zeros(len(nodes), np.int64)
            np.add.at(deg, si, 1)
            pr = np.full(len(nodes), scale, np.int64)
            for _ in range(iters):
                share = pr[si] // np.maximum(deg[si], 1)
                inc = np.zeros(len(nodes), np.int64)
                np.add.at(inc, ti, share)
                pr = base + (damp_num * inc) // damp_den
            return pa.table({"node": pa.array(nodes), "pr": pa.array(pr)})

        return _with_schema(
            edge_rows.groupby("tag")  # constant 0 → a single group
            .map_groups(all_rounds, batch_format="pyarrow"),
            {"node": pa.int64(), "pr": pa.int64()},
        )

    # node_deg is consumed exactly once (by deg_slots), so it stays lazy
    # and only the slot encoding is persisted — two setup executions
    # total instead of four
    node_deg = (
        edge_rows.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("node")
        .sum("d")
        .rename_columns({"sum(d)": "d"})
    )
    deg_rows = _persist(
        node_deg.map_batches(deg_slots, batch_format="pyarrow"), "deg_slots"
    )

    def init_state(batch: pa.Table) -> pa.Table:
        # state row: k2 = pr (starts at `scale`), k3 = static degree
        return pa.table(
            {
                "rkey": batch["rkey"],
                "k1": batch["k1"],
                "k2": pa.array(np.full(batch.num_rows, scale, np.int64)),
                "k3": batch["k3"],
                "tag": batch["tag"],
            }
        )

    state = _with_schema(
        deg_rows.map_batches(init_state, batch_format="pyarrow"), _state_fields
    )

    def scatter(g: pa.Table) -> pa.Table:
        """Exchange-1 reducer: all of this rkey's srcs resolve pr/d with
        one searchsorted; emit per-dst partial sums keyed for exchange 2."""
        tag = g["tag"].to_numpy()
        k1 = g["k1"].to_numpy()
        k2 = g["k2"].to_numpy()
        is_e = tag == 0
        src, dst = k1[is_e], k2[is_e]
        node = k1[~is_e]
        pr_v = k2[~is_e]
        d_v = g["k3"].to_numpy()[~is_e]
        if not len(src):
            return pa.table({k: pa.array([], t) for k, t in _state_fields.items()})
        order = np.argsort(node, kind="stable")
        node_s, pr_s, d_s = node[order], pr_v[order], d_v[order]
        pos = np.searchsorted(node_s, src)
        share = pr_s[pos] // np.maximum(d_s[pos], 1)
        u, inv = np.unique(dst, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, share)
        return pa.table(
            {
                "rkey": pa.array(_rkey(u, r)),
                "k1": pa.array(u),
                "k2": pa.array(acc),
                "k3": pa.array(np.zeros(len(u), np.int64)),
                "tag": pa.array(np.zeros(len(u), np.int8)),
            }
        )

    def gather(g: pa.Table) -> pa.Table:
        """Exchange-2 reducer: sum incoming mass per node, apply the
        damping recurrence — output IS the next round's state leg."""
        tag = g["tag"].to_numpy()
        k1 = g["k1"].to_numpy()
        k2 = g["k2"].to_numpy()
        node = k1[tag == 1]
        d_v = g["k3"].to_numpy()[tag == 1]
        order = np.argsort(node, kind="stable")
        node_s, d_s = node[order], d_v[order]
        inc = np.zeros(len(node_s), dtype=np.int64)
        pd_, pv = k1[tag == 0], k2[tag == 0]
        if len(pd_):
            np.add.at(inc, np.searchsorted(node_s, pd_), pv)
        npr = base + (damp_num * inc) // damp_den
        return pa.table(
            {
                "rkey": pa.array(_rkey(node_s, r)),
                "k1": pa.array(node_s),
                "k2": pa.array(npr),
                "k3": pa.array(d_s),
                "tag": pa.array(np.ones(len(node_s), np.int8)),
            }
        )

    from ..stages.util import coalesce_for_shuffle

    for _round in range(iters):
        # coalesce before each sort: without it, the sort's output
        # partition count compounds round over round (each round's state
        # carries the previous sort's partitioning into the next union,
        # and per-round wall time snowballs — measured 2.2/4.8/8.9 s for
        # rounds 0/1/2 at sf0.1 before the clamp)
        partials = (
            coalesce_for_shuffle(edge_rows.union(state), 0.25)
            .groupby("rkey")
            .map_groups(scatter, batch_format="pyarrow")
        )
        refreshed = (
            coalesce_for_shuffle(deg_rows.union(partials), 0.25)
            .groupby("rkey")
            .map_groups(gather, batch_format="pyarrow")
        )
        # re-seed the static schema each round (gather sits behind a
        # groupby, so inference would otherwise execute it — or yield
        # None on an empty graph)
        state = _with_schema(
            _persist(refreshed, f"round_{_round}"), _state_fields
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["k1"], "pr": batch["k2"]})

    return _with_schema(
        state.map_batches(finish, batch_format="pyarrow"),
        {"node": pa.int64(), "pr": pa.int64()},
    )


def sql_pagerank_int(edges_sql: str, iters: int = 3, scale: int = 10**12,
                     damp_num: int = 85, damp_den: int = 100) -> str:
    """DuckDB twin of :func:`pagerank_int` — the identical integer
    recurrence unrolled ``iters`` times over ``edges_sql`` (a SELECT
    yielding ``src, dst``)."""
    base = scale * (damp_den - damp_num) // damp_den
    ctes = [
        f"e AS ({edges_sql})",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1)",
        "nodes AS (SELECT DISTINCT src AS node FROM e"
        " UNION SELECT DISTINCT dst FROM e)",
        f"pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT n.node,
         CAST({base} + ({damp_num} * COALESCE(s.inc, 0)) // {damp_den}
              AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, CAST(SUM(p.pr // d.d) AS BIGINT) AS inc
    FROM e JOIN deg d ON e.src = d.src JOIN pr{i - 1} p ON p.node = e.src
    GROUP BY 1
  ) s ON n.node = s.node
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr FROM pr{iters}"
    )


def events_bipartite_edges(ds, user_col: str = "user_id",
                           props_col: str = "props"):
    """The user → props-"k" bipartite edge list used by the PageRank
    query and bench: src = user·2, dst = k·2+1 (disjoint parities).
    One RE2 extract per batch; rows without a "k" field drop out.
    Shared by ``__ray_entry__.pagerank_events`` and ``bench.py`` so the
    edge-derivation contract lives in exactly one place.
    """
    import pyarrow.compute as pc

    def edges(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch[props_col], r'"k"\s*:\s*(?P<v>-?\d+)')
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        ok = pc.is_valid(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)
        u = batch[user_col].to_numpy().astype(np.int64)
        return pa.table(
            {"src": pa.array(u[ok] * 2), "dst": pa.array(kv[ok] * 2 + 1)}
        )

    return ds.map_batches(edges, batch_format="pyarrow")


# -- triangle counting --------------------------------------------------------


def _pair_view(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Structured (int64, int64) view of edge pairs — sortable and
    searchsorted-able lexicographically with FULL 64-bit exactness (no
    composite-code overflow assumptions about id ranges)."""
    m = np.empty(len(x), dtype=[("x", np.int64), ("y", np.int64)])
    m["x"] = x
    m["y"] = y
    return m


# One pair-hash recipe repo-wide: reuse the pairjoin exchange key.
from ..stages.pairjoin import pair_hash_mod as _pair_rkey  # noqa: E402


def triangle_counts(ds, a_col: str, b_col: str,
                    small_graph_rows: int = 2_000_000):
    """Per-node triangle counts of an undirected graph (the clustering-
    coefficient numerator) — exact, via rank-oriented wedge closure
    ("compact-forward", Latapy 2008): orient each edge from the lower
    (degree, id) endpoint to the higher, generate the out-wedges of each
    source, and keep the wedges closed by a directed edge.  Degree
    orientation bounds every out-degree by O(√m), so wedge volume is
    O(m^1.5) even on skewed graphs — id-orientation would square the
    hub's degree instead.

    Input may contain duplicate / reversed / self-loop rows; they are
    canonicalized first.  Returns (node:int64, n_tri:int64) for nodes in
    ≥1 triangle.

    Exchanges (all lean, 16-24 B/row): edge dedup → degree partials →
    two degree-attach zips → wedges (hash(v,w)-keyed — the O(m^1.5)
    step, the algorithm's documented cost) → closed-triangle per-node
    partials.  Every reducer is a vectorized multi-group pass under
    coarse keys (rule 3); pair membership tests use structured-dtype
    searchsorted, exact for full 64-bit ids.
    """
    from ..stages.util import coalesce_for_shuffle, rkey_of

    R = reducer_count()

    # -- 1. canonical distinct edges (x < y) -------------------------------
    def canon(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy().astype(np.int64)
        b = batch[b_col].to_numpy().astype(np.int64)
        ok = a != b
        a, b = a[ok], b[ok]
        x, y = np.minimum(a, b), np.maximum(a, b)
        # per-batch combiner: distinct before the exchange
        p = np.unique(_pair_view(x, y))
        return pa.table(
            {
                "rkey": pa.array(_pair_rkey(p["x"], p["y"], R)),
                "x": pa.array(p["x"]),
                "y": pa.array(p["y"]),
            }
        )

    def distinct_edges(g: pa.Table) -> pa.Table:
        p = np.unique(
            _pair_view(
                g["x"].to_numpy(zero_copy_only=False),
                g["y"].to_numpy(zero_copy_only=False),
            )
        )
        return pa.table({"x": pa.array(p["x"]), "y": pa.array(p["y"])})

    edges = (
        coalesce_for_shuffle(ds.map_batches(canon, batch_format="pyarrow"), 0.5)
        .groupby("rkey")
        .map_groups(distinct_edges, batch_format="pyarrow")
    ).materialize()  # consumed twice below (degrees + attach); count is
    # then free metadata for the small-graph gate

    if edges.count() <= small_graph_rows:
        # small-graph fold (same gate as pagerank/bfs/CC): exact wedge
        # closure is deterministic, so one task over the whole edge
        # list returns the identical (node, n_tri) table
        def tri_all(b: pa.Table) -> pa.Table:
            x = b["x"].to_numpy(zero_copy_only=False)
            y = b["y"].to_numpy(zero_copy_only=False)
            ends = np.concatenate([x, y])
            nodes_arr, inv = np.unique(ends, return_inverse=True)
            deg_all = np.bincount(inv, minlength=len(nodes_arr)).astype(np.int64)
            dx = deg_all[inv[: len(x)]]
            dy = deg_all[inv[len(x):]]
            fwd = (dx < dy) | ((dx == dy) & (x < y))
            u = np.where(fwd, x, y)
            v = np.where(fwd, y, x)
            dv = np.where(fwd, dy, dx)
            order = np.lexsort((v, dv, u))
            us, vs = u[order], v[order]
            starts = np.nonzero(np.r_[True, us[1:] != us[:-1]])[0]
            sizes = np.diff(np.r_[starts, len(us)])
            out_u, out_v, out_w = [], [], []
            for t0, t1 in gap_pair_offsets(starts, sizes):
                out_u.append(us[t0])
                out_v.append(vs[t0])
                out_w.append(vs[t1])
            uniq = np.array([], np.int64)
            cnt = np.array([], np.int64)
            if out_u:
                wu = np.concatenate(out_u)
                wv = np.concatenate(out_v)
                ww = np.concatenate(out_w)
                ev = np.sort(_pair_view(u, v))
                q = _pair_view(wv, ww)
                pos = np.searchsorted(ev, q)
                hit = np.zeros(len(q), bool)
                inb = pos < len(ev)
                hit[inb] = ev[pos[inb]] == q[inb]
                tri_nodes = np.concatenate([wu[hit], wv[hit], ww[hit]])
                uniq, cnt = np.unique(tri_nodes, return_counts=True)
            return pa.table(
                {
                    "node": pa.array(uniq.astype(np.int64)),
                    "n_tri": pa.array(cnt.astype(np.int64)),
                }
            )

        return _with_schema(
            edges.repartition(1)
            .map_batches(tri_all, batch_format="pyarrow", batch_size=None),
            {"node": pa.int64(), "n_tri": pa.int64()},
        )

    # -- 2. degrees (node, deg) --------------------------------------------
    def deg_partial(batch: pa.Table) -> pa.Table:
        ends = np.concatenate(
            [
                batch["x"].to_numpy(zero_copy_only=False),
                batch["y"].to_numpy(zero_copy_only=False),
            ]
        )
        n, c = np.unique(ends, return_counts=True)
        return pa.table(
            {
                "rkey": pa.array(rkey_of(n, R)),
                "node": pa.array(n),
                "pdeg": pa.array(c.astype(np.int64)),
            }
        )

    def deg_final(g: pa.Table) -> pa.Table:
        n = g["node"].to_numpy(zero_copy_only=False)
        p = g["pdeg"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(n, return_inverse=True)
        d = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(d, inv, p)
        return pa.table({"node": pa.array(uniq), "deg": pa.array(d)})

    degs = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(deg_final, batch_format="pyarrow")
    )

    # -- 3. attach degrees to both endpoints (two lean zip exchanges) ------
    def _attach(edge_ds, deg_ds, end_col: str, out_col: str):
        other = "y" if end_col == "x" else "x"

        def tag_e(batch: pa.Table) -> pa.Table:
            k = batch[end_col].to_numpy(zero_copy_only=False)
            t = {"rkey": pa.array(rkey_of(k, R)), "k": pa.array(k)}
            for c in batch.column_names:
                if c not in ("rkey",):
                    t[c] = batch[c]
            t["deg_v"] = pa.nulls(batch.num_rows, pa.int64())
            return pa.table(t)

        e_cols = [c for c in edge_ds.schema().names if c != "rkey"]

        def tag_d(batch: pa.Table) -> pa.Table:
            # same column ORDER as tag_e so the union legs share a schema
            k = batch["node"].to_numpy(zero_copy_only=False)
            t: dict = {"rkey": pa.array(rkey_of(k, R)), "k": pa.array(k)}
            for c in e_cols:
                t[c] = pa.nulls(batch.num_rows, pa.int64())
            t["deg_v"] = batch["deg"]
            return pa.table(t)

        def zip_deg(g: pa.Table) -> pa.Table:
            dv = g["deg_v"]
            is_deg = dv.combine_chunks().is_valid().to_numpy(
                zero_copy_only=False
            ) if g.num_rows else np.zeros(0, bool)
            k = g["k"].to_numpy(zero_copy_only=False)
            dk = k[is_deg]
            dvv = dv.to_numpy(zero_copy_only=False)[is_deg].astype(np.int64)
            order = np.argsort(dk)
            dk, dvv = dk[order], dvv[order]
            ei = np.nonzero(~is_deg)[0]
            pos = np.searchsorted(dk, k[ei])
            # every edge endpoint has a degree row by construction
            got = dvv[np.clip(pos, 0, max(len(dk) - 1, 0))] if len(dk) else (
                np.zeros(len(ei), np.int64)
            )
            out = {c: g[c].take(pa.array(ei)) for c in e_cols}
            out[out_col] = pa.array(got)
            return pa.table(out)

        unioned = coalesce_for_shuffle(
            edge_ds.map_batches(tag_e, batch_format="pyarrow").union(
                deg_ds.map_batches(tag_d, batch_format="pyarrow")
            ),
            0.5,
        )
        return unioned.groupby("rkey").map_groups(
            zip_deg, batch_format="pyarrow"
        )

    e_dx = _attach(edges, degs, "x", "deg_x")
    e_dxy = _attach(e_dx, degs, "y", "deg_y")

    # -- 4+5. orient by (deg, id) rank, emit wedges per source -------------
    def wedges(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        dx = g["deg_x"].to_numpy(zero_copy_only=False)
        dy = g["deg_y"].to_numpy(zero_copy_only=False)
        fwd = (dx < dy) | ((dx == dy) & (x < y))
        u = np.where(fwd, x, y)
        v = np.where(fwd, y, x)
        du = np.where(fwd, dx, dy)
        dv = np.where(fwd, dy, dx)
        # group by source u; within a group order out-neighbors by rank
        order = np.lexsort((v, dv, u))
        us, vs = u[order], v[order]
        starts = np.nonzero(np.r_[True, us[1:] != us[:-1]])[0]
        sizes = np.diff(np.r_[starts, len(us)])
        out_u, out_v, out_w = [], [], []
        for t0, t1 in gap_pair_offsets(starts, sizes):
            out_u.append(us[t0])
            out_v.append(vs[t0])   # lower-rank wedge tip
            out_w.append(vs[t1])   # higher-rank wedge tip
        if not out_u:
            return pa.table(
                {
                    "rkey": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                    "is_edge": pa.array([], pa.int8()),
                }
            )
        wu = np.concatenate(out_u)
        wv = np.concatenate(out_v)
        ww = np.concatenate(out_w)
        # a wedge (u; v, w) with rank(v) < rank(w) closes iff the
        # DIRECTED edge v -> w exists: key both sides by (v, w)
        return pa.table(
            {
                "rkey": pa.array(_pair_rkey(wv, ww, R)),
                "u": pa.array(wu),
                "v": pa.array(wv),
                "w": pa.array(ww),
                "is_edge": pa.array(np.zeros(len(wu), np.int8)),
            }
        )

    # wedge generation needs each source's FULL out-list in one place
    def key_by_src(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        dx = batch["deg_x"].to_numpy(zero_copy_only=False)
        dy = batch["deg_y"].to_numpy(zero_copy_only=False)
        fwd = (dx < dy) | ((dx == dy) & (x < y))
        u = np.where(fwd, x, y)
        return batch.append_column("rkey", pa.array(rkey_of(u, R)))

    wedge_ds = (
        coalesce_for_shuffle(
            e_dxy.map_batches(key_by_src, batch_format="pyarrow"), 0.5
        )
        .groupby("rkey")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def dir_edges(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        dx = batch["deg_x"].to_numpy(zero_copy_only=False)
        dy = batch["deg_y"].to_numpy(zero_copy_only=False)
        fwd = (dx < dy) | ((dx == dy) & (x < y))
        u = np.where(fwd, x, y)
        v = np.where(fwd, y, x)
        return pa.table(
            {
                "rkey": pa.array(_pair_rkey(u, v, R)),
                "u": pa.array(np.zeros(len(u), np.int64)),  # unused slot
                "v": pa.array(u),
                "w": pa.array(v),
                "is_edge": pa.array(np.ones(len(u), np.int8)),
            }
        )

    closure_in = coalesce_for_shuffle(
        wedge_ds.union(e_dxy.map_batches(dir_edges, batch_format="pyarrow")),
        0.5,
    )

    # -- 6. close wedges, emit per-node partial counts ----------------------
    def close(g: pa.Table) -> pa.Table:
        is_e = g["is_edge"].to_numpy(zero_copy_only=False) == 1
        v = g["v"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        ev = np.sort(_pair_view(v[is_e], w[is_e]))
        qi = np.nonzero(~is_e)[0]
        q = _pair_view(v[qi], w[qi])
        pos = np.searchsorted(ev, q)
        hit = np.zeros(len(qi), dtype=bool)
        inb = pos < len(ev)
        hit[inb] = ev[pos[inb]] == q[inb]
        tu = g["u"].to_numpy(zero_copy_only=False)[qi[hit]]
        tv = v[qi[hit]]
        tw = w[qi[hit]]
        nodes = np.concatenate([tu, tv, tw])
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "rkey2": pa.array(rkey_of(uniq, R)),
                "node": pa.array(uniq),
                "ptri": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = closure_in.groupby("rkey").map_groups(
        close, batch_format="pyarrow"
    )

    def tri_final(g: pa.Table) -> pa.Table:
        n = g["node"].to_numpy(zero_copy_only=False)
        p = g["ptri"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(n, return_inverse=True)
        t = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(t, inv, p)
        return pa.table({"node": pa.array(uniq), "n_tri": pa.array(t)})

    return partials.groupby("rkey2").map_groups(
        tri_final, batch_format="pyarrow"
    )


def user_k_ring_edges(ds, user_col: str = "user_id", props_col: str = "props"):
    """Sparse user co-occurrence graph off the events table: within each
    props-"k" bucket, sort the distinct users and connect each to its
    next and next-next neighbor (ring + skip edges) — consecutive user
    triples in a bucket form real triangles without the near-clique
    blowup full co-occurrence would give (max bucket ≈ 85 users at
    sf0.01 → 3.5k pairs per bucket).  One coarse hash(k) exchange of
    distinct (k, user) rows; adjacency is a vectorized pass per reducer.
    """
    import pyarrow.compute as pc

    from ..stages.util import coalesce_for_shuffle, rkey_of

    R = reducer_count()

    def uk(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch[props_col], r'"k"\s*:\s*(?P<v>-?\d+)')
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        ok = pc.is_valid(k).to_numpy(zero_copy_only=False)
        kv = pc.fill_null(k, 0).to_numpy(zero_copy_only=False)[ok]
        u = batch[user_col].to_numpy().astype(np.int64)[ok]
        p = np.unique(_pair_view(kv, u))  # per-batch distinct combiner
        return pa.table(
            {
                "rkey": pa.array(rkey_of(p["x"], R)),
                "k": pa.array(p["x"]),
                "u": pa.array(p["y"]),
            }
        )

    def ring(g: pa.Table) -> pa.Table:
        p = np.unique(
            _pair_view(
                g["k"].to_numpy(zero_copy_only=False),
                g["u"].to_numpy(zero_copy_only=False),
            )
        )
        k, u = p["x"], p["y"]  # sorted by (k, u) — exactly ROW_NUMBER order
        same1 = np.r_[k[1:] == k[:-1], False]
        same2 = np.r_[k[2:] == k[:-2], False, False]
        i1 = np.nonzero(same1)[0]
        i2 = np.nonzero(same2)[0]
        a = np.concatenate([u[i1], u[i2]])
        b = np.concatenate([u[i1 + 1], u[i2 + 2]])
        return pa.table({"src": pa.array(a), "dst": pa.array(b)})

    return (
        coalesce_for_shuffle(ds.map_batches(uk, batch_format="pyarrow"), 0.5)
        .groupby("rkey")
        .map_groups(ring, batch_format="pyarrow")
    )


def pagerank(edges, src_col: str = "src", dst_col: str = "dst",
             iters: int = 2, r0_bits: int = 20,
             alpha_num: int = 85, alpha_den: int = 100,
             small_graph_rows: int = 2_000_000):
    """Integer-quantized PageRank over a directed edge Dataset — the
    canonical link-authority score for web-corpus curation (rank pages
    before sampling / filtering), engine-added like the rest of the
    graph layer (geo-index has no graph stage).

    Every node starts at ``r0 = 2^r0_bits`` rank units; one iteration is

        share(u)  = r(u) // outdeg(u)                (integer floor)
        s(v)      = Σ_{u→v} share(u)
        r'(v)     = (alpha_num · s(v)) // alpha_den + teleport

    with ``teleport = ((alpha_den − alpha_num) · r0) // alpha_den``
    (0.15·r0 at the default damping 85/100).  All arithmetic is exact
    nonneg int64, so a fixed-``iters`` run is hash-identical to the SQL
    CTE twin — the same trick as :func:`~.ann.kmeans_assign`'s
    2-iteration oracle.  Dangling nodes (outdeg 0) keep only teleport
    mass and their share leaks, the standard simplification; multi-edges
    contribute once per edge (multigraph semantics on BOTH sides).

    Overflow bound: total rank mass never exceeds N·r0 (mass is damped
    each round and teleport adds back at most what damping removed), so
    ``alpha_num · s(v) ≤ 85 · N · 2^20`` stays inside int64 for
    N < 10^11 nodes at the defaults.

    Scale shape: per iteration ONE edge-bound exchange (the
    :func:`~.relational.hash_join` of edges against the node-keyed share
    table — 16 B/edge plus the 8 B share slot) and one node-bound
    groupby; nothing is broadcast, no per-node Python anywhere.  The
    ``edges`` Dataset is consumed ``iters + 2`` times (nodes, outdeg,
    one join per iteration), so it is materialized ONCE on entry (Ray
    lineages are trees — each consumer would otherwise re-run the whole
    upstream derivation; measured 7.8 s → 2.9 s at sf0.01 on the ring
    graph).  Object-store resident, spills under pressure; at corpus
    scale where even spill is unwanted, persist the derived edge list
    to Parquet first (state/checkpoint) and pass the re-read Dataset.
    """
    import pyarrow.compute as pc

    from .relational import hash_join

    edges = edges.materialize()

    r0 = np.int64(1) << np.int64(r0_bits)
    teleport = np.int64((alpha_den - alpha_num) * int(r0) // alpha_den)

    if edges.count() <= small_graph_rows:
        # small-graph fold (same gate as pagerank_int): all-integer
        # arithmetic is order-independent, so running every round in one
        # task is bit-identical to the exchange path (pinned by
        # tests/test_components.py::TestSmallGraphFold)
        def all_rounds(b: pa.Table) -> pa.Table:
            s = b[src_col].to_numpy().astype(np.int64)
            t = b[dst_col].to_numpy().astype(np.int64)
            nodes = np.unique(np.concatenate([s, t]))
            si = np.searchsorted(nodes, s)
            ti = np.searchsorted(nodes, t)
            outdeg = np.bincount(si, minlength=len(nodes)).astype(np.int64)
            rq = np.full(len(nodes), int(r0), np.int64)
            for _ in range(iters):
                share = np.zeros(len(nodes), np.int64)
                nz = outdeg > 0
                share[nz] = rq[nz] // outdeg[nz]
                sacc = np.zeros(len(nodes), np.int64)
                np.add.at(sacc, ti, share[si])
                rq = (
                    np.int64(alpha_num) * sacc // np.int64(alpha_den)
                    + teleport
                )
            return pa.table({"node": pa.array(nodes), "rank_q": pa.array(rq)})

        return _with_schema(
            edges.select_columns([src_col, dst_col])
            .repartition(1)
            .map_batches(all_rounds, batch_format="pyarrow", batch_size=None),
            {"node": pa.int64(), "rank_q": pa.int64()},
        )

    def as_node(col):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": pa.array(np.unique(
                    batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
                ))}
            )
        return f

    # distinct node set = distinct(src) ∪ distinct(dst)
    nodes = (
        edges.map_batches(as_node(src_col), batch_format="pyarrow")
        .union(edges.map_batches(as_node(dst_col), batch_format="pyarrow"))
        .groupby("node")
        .count()
        .select_columns(["node"])
    )
    outdeg = (
        edges.map_batches(
            lambda b: pa.table({"node": b[src_col]}), batch_format="pyarrow"
        )
        .groupby("node")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["node", "outdeg"]),
            batch_format="pyarrow",
        )
    )

    def init_rank(batch: pa.Table) -> pa.Table:
        od = pc.fill_null(batch["outdeg"], 0)
        return pa.table(
            {
                "node": batch["node"],
                "outdeg": od,
                "rank_q": pa.array(
                    np.full(batch.num_rows, r0, dtype=np.int64)
                ),
            }
        )

    rank = hash_join(
        nodes, outdeg, "node", "node", ["node"], ["outdeg"], how="left"
    ).map_batches(init_rank, batch_format="pyarrow")

    def to_share(batch: pa.Table) -> pa.Table:
        od = batch["outdeg"].to_numpy(zero_copy_only=False)
        keep = od > 0
        rq = batch["rank_q"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "node": batch["node"].filter(pa.array(keep)),
                "share": pa.array(rq // od[keep]),
            }
        )

    def apply_rank(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch["s"], 0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": batch["node"],
                "outdeg": batch["outdeg"],
                "rank_q": pa.array(
                    np.int64(alpha_num) * s // np.int64(alpha_den) + teleport
                ),
            }
        )

    for _ in range(iters):
        # checkpoint the NODE-bounded rank table each round: it is
        # consumed twice per iteration (share leg + update join), and
        # without a barrier the lazy DAG would replay every earlier
        # round 2^iters times.  Blocks live in the object store and
        # spill; the corpus-sized edge list is never materialized.
        rank = rank.materialize()
        share = rank.map_batches(to_share, batch_format="pyarrow")
        contrib = hash_join(
            edges, share, src_col, "node", [dst_col], ["share"], how="inner"
        )
        sums = (
            contrib.groupby(dst_col)
            .sum("share")
            .map_batches(
                lambda t: t.rename_columns(["node", "s"]),
                batch_format="pyarrow",
            )
        )
        rank = hash_join(
            rank, sums, "node", "node", ["node", "outdeg"], ["s"], how="left"
        ).map_batches(apply_rank, batch_format="pyarrow")

    return rank.select_columns(["node", "rank_q"])


def sql_pagerank(edges_cte: str, iters: int = 2, r0_bits: int = 20,
                 alpha_num: int = 85, alpha_den: int = 100) -> str:
    """DuckDB twin of :func:`pagerank` — ``edges_cte`` must yield
    (src, dst); same integer floor arithmetic, unrolled ``iters`` CTEs."""
    r0 = 1 << r0_bits
    tele = (alpha_den - alpha_num) * r0 // alpha_den
    parts = [
        f"WITH e AS ({edges_cte})",
        "n0 AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "od AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1)",
        "r0 AS (SELECT n0.node, COALESCE(od.outdeg, 0) AS outdeg,"
        f" CAST({r0} AS BIGINT) AS rq FROM n0 LEFT JOIN od USING (node))",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            # CAST: DuckDB SUM(BIGINT) widens to HUGEINT, which pandas
            # renders float64 — the engine emits int64 and the driver
            # hashes dtypes as materialized
            f"s{i} AS (SELECT e.dst AS node,"
            f" CAST(SUM({prev}.rq // {prev}.outdeg) AS BIGINT)"
            f" AS s FROM e JOIN {prev} ON {prev}.node = e.src"
            f" AND {prev}.outdeg > 0 GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT {prev}.node, {prev}.outdeg,"
            f" ({alpha_num} * COALESCE(s{i}.s, 0)) // {alpha_den} + {tele}"
            f" AS rq FROM {prev} LEFT JOIN s{i} USING (node))"
        )
        prev = f"r{i}"
    return (
        ",\n".join(parts) + f"\nSELECT node, rq AS rank_q FROM {prev}"
    )


def keep_best(docs_ds, clusters_ds, id_col: str, score_col: str):
    """Keep-BEST dedup list: every document except cluster members that
    lose to a higher-scoring member (representative = the cluster's max
    ``score_col``, ties → min id) — the RefinedWeb/C4-style "keep the
    longest/highest-quality near-duplicate" refinement of
    :func:`keep_list`'s keep-min-id rule.  Output: (id_col,) kept ids.

    Scale shape, three lean exchanges and no broadcast:
      1. attach scores to CLUSTER MEMBERS only — (id, score) rows from
         the corpus union (node, component) rows, one hash(id) exchange,
         per-reducer searchsorted gather (members ≪ corpus after LSH);
      2. per-cluster argmax — per-batch partial argmax by
         (score desc, id asc), final argmax under coarse
         hash(component) keys (two-phase, like url_keep_latest);
      3. drop list (members minus winners) resolved in the same
         component-keyed reduce, then :func:`keep_list`'s 8 B/id
         anti-join against the corpus — the drop set is never broadcast.

    Caller contract: ``score_col`` is a non-negative int64 (length,
    count, quantized quality — the argmax lexsort negates it), and every
    cluster node exists in ``docs_ds`` (true by construction when
    clusters come from pairs mined over the same corpus).
    """
    r = reducer_count()

    # -- exchange 1: score lookup for cluster members -------------------
    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": pa.array(ids), "other": pa.array(s),
                         "tag": pa.array(np.zeros(len(ids), np.int8)),
                         "rkey": pa.array(_rkey(ids, r))})

    def member_rows(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy().astype(np.int64)
        comp = batch["component"].to_numpy().astype(np.int64)
        return pa.table({"id": pa.array(node), "other": pa.array(comp),
                         "tag": pa.array(np.ones(len(node), np.int8)),
                         "rkey": pa.array(_rkey(node, r))})

    tagged = docs_ds.map_batches(doc_rows, batch_format="pyarrow").union(
        clusters_ds.map_batches(member_rows, batch_format="pyarrow")
    )

    def attach(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy()
        other = g["other"].to_numpy()
        tag = g["tag"].to_numpy()
        d_ids, d_score = ids[tag == 0], other[tag == 0]
        m_ids, m_comp = ids[tag == 1], other[tag == 1]
        order = np.argsort(d_ids)
        pos = np.searchsorted(d_ids[order], m_ids)
        # fail loudly on a cluster node absent from docs_ds — a bare
        # gather would silently read a NEIGHBORING doc's score (or walk
        # off the array end) and crown the wrong cluster member
        hit = pos < len(d_ids)
        if not hit.all() or not np.array_equal(d_ids[order][pos[hit]],
                                               m_ids[hit]):
            missing = m_ids[~hit] if not hit.all() else m_ids[
                hit][d_ids[order][pos[hit]] != m_ids[hit]]
            raise ValueError(
                f"keep_best: {missing.size} cluster node(s) missing from "
                f"docs_ds (first: {missing[:3].tolist()}); clusters must "
                "be mined over the same corpus"
            )
        return pa.table({
            "node": pa.array(m_ids),
            "component": pa.array(m_comp),
            "score": pa.array(d_score[order][pos]),
        })

    scored = _with_schema(
        tagged.groupby("rkey").map_groups(attach, batch_format="pyarrow"),
        {"node": pa.int64(), "component": pa.int64(), "score": pa.int64()},
    )

    # -- exchange 2+3: per-component winner, then losers = drop list ----
    def comp_keyed(batch: pa.Table) -> pa.Table:
        comp = batch["component"].to_numpy()
        return batch.append_column("rkey", pa.array(_rkey(comp, r)))

    keyed = scored.map_batches(comp_keyed, batch_format="pyarrow")

    def losers(g: pa.Table) -> pa.Table:
        node = g["node"].to_numpy()
        comp = g["component"].to_numpy()
        score = g["score"].to_numpy()
        # winner per component = max score, ties -> min node: lexsort
        # ascending by (comp, -score, node); winner is each segment head
        order = np.lexsort((node, -score, comp))
        c_s, n_s = comp[order], node[order]
        new = np.empty(len(c_s), dtype=bool)
        new[:1] = True
        new[1:] = c_s[1:] != c_s[:-1]
        drop = n_s[~new]
        return pa.table({"id": pa.array(drop),
                         "tag": pa.array(np.ones(len(drop), np.int8)),
                         "rkey": pa.array(_rkey(drop, r))})

    drops = keyed.groupby("rkey").map_groups(losers, batch_format="pyarrow")

    def keeps(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        return pa.table({"id": pa.array(ids),
                         "tag": pa.array(np.zeros(len(ids), np.int8)),
                         "rkey": pa.array(_rkey(ids, r))})

    tagged2 = docs_ds.map_batches(keeps, batch_format="pyarrow").union(drops)

    def anti(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy()
        tag = g["tag"].to_numpy()
        order = np.lexsort((tag, ids))
        ids, tag = ids[order], tag[order]
        starts = np.r_[0, np.flatnonzero(ids[1:] != ids[:-1]) + 1]
        has_drop = np.maximum.reduceat(tag, starts) == 1
        out = ids[starts][~has_drop]
        return pa.table({id_col: pa.array(out)})

    return _with_schema(
        tagged2.groupby("rkey").map_groups(anti, batch_format="pyarrow"),
        {id_col: pa.int64()},
    )


def bfs_hops(edges, seeds, max_hops: int,
             src_col: str = "src", dst_col: str = "dst",
             node_col: str = "node", hop_col: str = "hops",
             small_graph_rows: int = 2_000_000):
    """Multi-source BFS hop labelling: the minimum undirected hop
    distance from any seed, for every node within ``max_hops`` — the
    link-distance-from-trusted-set signal (spam distance / seed-domain
    proximity) of web-graph curation.

    Driver-coordinated rounds (≤ max_hops, the pagerank_int two-exchange
    shape): exchange 1 co-locates the frontier with the symmetrized
    edges under ``hash(u) % R`` and each reducer emits the out-neighbors
    of ITS frontier nodes (per-reducer distinct) already keyed
    ``hash(v) % R``; exchange 2 co-locates those candidates with the
    visited set and each reducer resolves global distinct + the
    anti-membership test + the hop label in one pass — its output IS
    the next round's visited state, with the new frontier as a role
    column.  The visited set and frontier stay DISTRIBUTED Datasets
    throughout (never broadcast, never driver-collected — the driver
    reads one count per round for the early exit).  The symmetrized
    edge list is materialized once and re-read every round (the CC
    trade: object-store resident, spills under pressure).  Frontier
    monotonically shrinks to the unvisited boundary, so total join work
    is O(edges × rounds) worst-case and O(edges) on expander-like
    graphs.

    ``small_graph_rows``: at or under this gate (row count of the
    materialized symmetrized edge table — free metadata) the whole BFS
    runs inside ONE task instead of ``2*max_hops`` exchanges, the same
    small-side fold as :func:`pagerank_int`; BFS hop labels are
    deterministic, so the two paths agree exactly (pinned by
    ``tests/test_components.py``).
    """
    from ..stages.util import coalesce_for_shuffle

    r = reducer_count()

    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy().astype(np.int64)
        d = batch[dst_col].to_numpy().astype(np.int64)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        return pa.table(
            {
                "rkey": pa.array(_rkey(u, r)),
                "node": pa.array(u),      # routing endpoint
                "v": pa.array(v),
                hop_col: pa.array(np.full(len(u), -1, np.int64)),
                "role": pa.array(np.full(len(u), 2, np.int8)),  # edge
            }
        )

    _fields = {
        "rkey": pa.int64(), "node": pa.int64(), "v": pa.int64(),
        hop_col: pa.int64(), "role": pa.int8(),
    }
    e = _with_schema(
        edges.map_batches(sym, batch_format="pyarrow"), _fields
    ).materialize()

    def seed_rows(batch: pa.Table) -> pa.Table:
        n = batch[node_col].to_numpy().astype(np.int64)
        n = np.unique(n)
        return pa.table(
            {
                "rkey": pa.array(_rkey(n, r)),
                "node": pa.array(n),
                "v": pa.array(np.zeros(len(n), np.int64)),
                hop_col: pa.array(np.zeros(len(n), np.int64)),
                "role": pa.array(np.ones(len(n), np.int8)),  # new/frontier
            }
        )

    if e.count() <= small_graph_rows:
        # small-graph fold: one repartition co-locates every edge and
        # seed row in a single block; the BFS levels run vectorized
        # inside one task (sorted-CSR frontier expansion)
        seed_slots = _with_schema(
            seeds.map_batches(seed_rows, batch_format="pyarrow"), _fields
        )

        def bfs_all(b: pa.Table) -> pa.Table:
            role = b["role"].to_numpy()
            is_e = role == 2
            eu = b["node"].to_numpy()[is_e]
            ev_ = b["v"].to_numpy()[is_e]
            order = np.argsort(eu, kind="stable")
            eu_s, ev_s = eu[order], ev_[order]
            visited = np.unique(b["node"].to_numpy()[role == 1])
            hops = np.zeros(len(visited), np.int64)
            frontier = visited
            for h in range(1, int(max_hops) + 1):
                if not len(frontier) or not len(eu_s):
                    break
                lo = np.searchsorted(eu_s, frontier, side="left")
                hi = np.searchsorted(eu_s, frontier, side="right")
                diff = np.zeros(len(eu_s) + 1, np.int64)
                np.add.at(diff, lo, 1)
                np.add.at(diff, hi, -1)
                nbrs = np.unique(ev_s[np.cumsum(diff[:-1]) > 0])
                new = np.setdiff1d(nbrs, visited, assume_unique=True)
                if not len(new):
                    break
                visited = np.concatenate([visited, new])
                hops = np.concatenate(
                    [hops, np.full(len(new), h, np.int64)]
                )
                frontier = new
            return pa.table(
                {node_col: pa.array(visited), hop_col: pa.array(hops)}
            )

        return _with_schema(
            e.union(seed_slots)
            .repartition(1)
            .map_batches(bfs_all, batch_format="pyarrow", batch_size=None),
            {node_col: pa.int64(), hop_col: pa.int64()},
        )

    def absorb_seeds(g: pa.Table) -> pa.Table:
        # global seed distinct (per-batch uniques can collide across
        # blocks): keep the first row per node
        n = g["node"].to_numpy()
        keep = np.unique(n, return_index=True)[1]
        return g.take(pa.array(np.sort(keep)))

    state = (
        coalesce_for_shuffle(
            _with_schema(
                seeds.map_batches(seed_rows, batch_format="pyarrow"), _fields
            ),
            0.25,
        )
        .groupby("rkey")
        .map_groups(absorb_seeds, batch_format="pyarrow")
        .materialize()
    )
    state = _with_schema(state, _fields)

    def is_frontier(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return b.filter(_pc.equal(b["role"], 1))

    def expand(g: pa.Table) -> pa.Table:
        """Exchange 1: neighbors of this reducer's frontier nodes."""
        role = g["role"].to_numpy()
        is_e = role == 2
        fr = np.unique(g["node"].to_numpy()[role == 1])
        if not len(fr) or not is_e.any():
            return pa.table({k: pa.array([], t) for k, t in _fields.items()})
        eu = g["node"].to_numpy()[is_e]
        ev = g["v"].to_numpy()[is_e]
        pos = np.searchsorted(fr, eu)
        hit = (pos < len(fr)) & (fr[np.minimum(pos, len(fr) - 1)] == eu)
        out = np.unique(ev[hit])
        return pa.table(
            {
                "rkey": pa.array(_rkey(out, r)),
                "node": pa.array(out),
                "v": pa.array(np.zeros(len(out), np.int64)),
                hop_col: pa.array(np.full(len(out), -1, np.int64)),
                "role": pa.array(np.zeros(len(out), np.int8)),  # candidate
            }
        )

    def absorb(g: pa.Table, h: int) -> pa.Table:
        """Exchange 2: visited rows pass through (role -> keep), globally
        distinct unvisited candidates join labelled hop h (role new)."""
        role = g["role"].to_numpy()
        vis = role >= 1
        vn = np.sort(g["node"].to_numpy()[vis])
        cand = np.unique(g["node"].to_numpy()[role == 0])
        if len(vn) and len(cand):
            pos = np.searchsorted(vn, cand)
            seen = (pos < len(vn)) & (vn[np.minimum(pos, len(vn) - 1)] == cand)
            cand = cand[~seen]
        keep = g.filter(pa.array(vis))
        keep = keep.set_column(
            4, "role", pa.array(np.full(keep.num_rows, 3, np.int8))
        )
        new = pa.table(
            {
                "rkey": pa.array(_rkey(cand, r)),
                "node": pa.array(cand),
                "v": pa.array(np.zeros(len(cand), np.int64)),
                hop_col: pa.array(np.full(len(cand), h, np.int64)),
                "role": pa.array(np.ones(len(cand), np.int8)),
            }
        )
        return pa.concat_tables([keep, new])

    import functools

    for h in range(1, int(max_hops) + 1):
        cands = (
            coalesce_for_shuffle(e.union(state), 0.25)
            .groupby("rkey")
            .map_groups(expand, batch_format="pyarrow")
        )
        state = _with_schema(
            coalesce_for_shuffle(state.union(cands), 0.25)
            .groupby("rkey")
            .map_groups(
                functools.partial(absorb, h=h), batch_format="pyarrow"
            )
            .materialize(),
            _fields,
        )
        n_new = state.map_batches(
            is_frontier, batch_format="pyarrow"
        ).count()
        if n_new == 0:
            break

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({node_col: b["node"], hop_col: b[hop_col]})

    return _with_schema(
        state.map_batches(finish, batch_format="pyarrow"),
        {node_col: pa.int64(), hop_col: pa.int64()},
    )
