"""Tests for event-stream operators and global Hilbert partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _to_df(ds) -> pd.DataFrame:
    return ds.to_pandas()


class TestTumblingWindow:
    def test_matches_pandas(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines import events as ev
        from geo_index_ray.sources import tables

        W = 3_600_000_000
        ds = tables.read_table(SF, "events", columns=["ts", "event_type", "value"])
        got = _to_df(ev.tumbling_window(ds, W)).sort_values(
            ["window_id", "event_type"]
        ).reset_index(drop=True)

        t = pq.read_table(f"{SF}/events.parquet").to_pandas()
        t["window_id"] = t["ts"].astype("int64") // W
        want = (
            t.groupby(["window_id", "event_type"])
            .agg(n_events=("value", "size"), min_value=("value", "min"), max_value=("value", "max"))
            .reset_index()
            .sort_values(["window_id", "event_type"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
        assert np.allclose(got["min_value"], want["min_value"])

    def test_partition_invariant(self):
        from geo_index_ray.pipelines import events as ev
        from geo_index_ray.sources import tables

        W = 3_600_000_000
        a = _to_df(
            ev.tumbling_window(
                tables.read_table(SF, "events", columns=["ts", "event_type", "value"]).repartition(1), W
            )
        )
        b = _to_df(
            ev.tumbling_window(
                tables.read_table(SF, "events", columns=["ts", "event_type", "value"]).repartition(7), W
            )
        )
        key = ["window_id", "event_type"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert (a["n_events"].to_numpy() == b["n_events"].to_numpy()).all()


class TestSessionize:
    def test_sessions_cover_all_events(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines import events as ev
        from geo_index_ray.sources import tables

        GAP = 1_800_000_000
        ds = tables.read_table(SF, "events", columns=["event_id", "ts", "user_id"])
        got = _to_df(ev.sessionize(ds, GAP))
        n_events = pq.read_table(f"{SF}/events.parquet").num_rows
        assert got["n_events"].sum() == n_events
        # session_seq contiguous 1..n per user
        for _, g in got.groupby("user_id"):
            assert sorted(g["session_seq"].tolist()) == list(range(1, len(g) + 1))
        # within a session, duration consistent; between consecutive
        # sessions of one user the gap must exceed GAP
        for _, g in got.sort_values("session_seq").groupby("user_id"):
            starts = g["start_us"].to_numpy()
            ends = g["end_us"].to_numpy()
            assert (ends >= starts).all()
            assert (starts[1:] - ends[:-1] > GAP).all()


class TestAsofJoin:
    def test_matches_pandas_merge_asof(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines import events as ev
        import ray.data

        t = pq.read_table(f"{SF}/events.parquet").to_pandas()
        clicks = t[t.event_type == "click"][["event_id", "ts", "user_id"]].rename(
            columns={"event_id": "click_id"}
        )
        purchases = t[t.event_type == "purchase"][["event_id", "ts", "user_id"]].rename(
            columns={"event_id": "purchase_id"}
        )
        got = _to_df(
            ev.asof_join(
                ray.data.from_pandas(clicks.reset_index(drop=True)),
                ray.data.from_pandas(purchases.reset_index(drop=True)),
                key_col="user_id",
                left_id="click_id",
                right_id="purchase_id",
            )
        )
        want = pd.merge_asof(
            clicks.sort_values("ts"),
            purchases.sort_values("ts"),
            on="ts",
            by="user_id",
            direction="backward",
        ).dropna(subset=["purchase_id"])
        got_pairs = set(zip(got["click_id"], got["purchase_id"]))
        want_pairs = set(
            zip(want["click_id"].astype(int), want["purchase_id"].astype(int))
        )
        assert got_pairs == want_pairs


class TestSpatialPartition:
    def test_cover_once_and_hilbert_contiguous(self):
        from geo_index_ray.pipelines import partition as pp
        from geo_index_ray.sources import tables

        ds = tables.points_ds(SF, "customer", "c_custkey")
        got = _to_df(pp.spatial_partition(ds, "c_custkey", 64))
        n = tables.read_table(SF, "customer").count()
        # every row exactly once
        assert len(got) == n
        assert got["c_custkey"].is_unique
        # partition sizes: all == 64 except possibly the last
        sizes = got.groupby("partition_id").size().sort_index()
        assert (sizes.iloc[:-1] == 64).all()
        assert sizes.iloc[-1] <= 64
        # hilbert keys are non-overlapping across partition ids (global order)
        hk = pp._hilbert_keys(got["x"].to_numpy(), got["y"].to_numpy())
        got = got.assign(hk=hk)
        g = got.groupby("partition_id").agg(lo=("hk", "min"), hi=("hk", "max")).sort_index()
        assert (g["lo"].to_numpy()[1:] >= g["hi"].to_numpy()[:-1]).all()

    def test_partition_invariant_to_blocks(self):
        from geo_index_ray.pipelines import partition as pp
        from geo_index_ray.sources import tables

        a = _to_df(
            pp.spatial_partition(
                tables.points_ds(SF, "customer", "c_custkey").repartition(1), "c_custkey", 64
            )
        ).sort_values("c_custkey")
        b = _to_df(
            pp.spatial_partition(
                tables.points_ds(SF, "customer", "c_custkey").repartition(5), "c_custkey", 64
            )
        ).sort_values("c_custkey")
        assert (a["partition_id"].to_numpy() == b["partition_id"].to_numpy()).all()

    def test_envelopes(self):
        from geo_index_ray.pipelines import partition as pp
        from geo_index_ray.sources import tables

        ds = tables.points_ds(SF, "customer", "c_custkey")
        parts = pp.spatial_partition(ds, "c_custkey", 64)
        env = _to_df(pp.partition_envelopes(parts))
        assert env["n_rows"].sum() == tables.read_table(SF, "customer").count()
        assert (env["min_x"] <= env["max_x"]).all()
        assert (env["min_y"] <= env["max_y"]).all()


class TestExactSimilarity:
    def test_cosine_pairs_exact_vs_numpy(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines import ann as ann_pipe
        from geo_index_ray.sources import tables

        ds = tables.read_table(SF, "embeddings", columns=["vec_id", "embedding"])
        got = _to_df(ann_pipe.cosine_pairs_exact(ds, 0.3, "vec_id"))
        t = pq.read_table(f"{SF}/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= 0.3, k=1))
        want = set(zip(np.minimum(ids[ii], ids[jj]), np.maximum(ids[ii], ids[jj])))
        assert set(zip(got["a_id"], got["b_id"])) == want

    def test_ngram_jaccard_exact_on_planted(self):
        import ray.data

        from geo_index_ray.pipelines import dedup as dd

        base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
        near = base.replace("lazy", "hazy")
        other = "completely different content with nothing shared at all here " * 4
        df = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [base, near, other]}
        )
        got = _to_df(
            dd.ngram_jaccard_dedup(
                ray.data.from_pandas(df), "doc_id", threshold=0.5
            )
        )
        assert set(zip(got["a_id"], got["b_id"])) == {(1, 2)}
        # exact jaccard value matches a direct computation
        s1 = set(dd._shingle_hashes(base, 5).tolist())
        s2 = set(dd._shingle_hashes(near, 5).tolist())
        want_j = len(s1 & s2) / len(s1 | s2)
        assert np.isclose(got["jaccard"].iloc[0], want_j)

    def test_ngram_jaccard_hot_shingle_freq_ordering(self):
        """A shingle shared by EVERY doc must be detected as heavy and
        pushed out of prefixes (frequency-ascending AllPairs order), and
        the output pairs must be byte-identical with and without the
        heavy-hitter reordering (exact recall under any total order)."""
        import ray.data

        from geo_index_ray.pipelines import dedup as dd

        rng = np.random.default_rng(7)
        common = "sharedcorephrasetokens everywhere present "
        docs = [
            common + " ".join(
                f"w{rng.integers(0, 50)}" for _ in range(6)
            )
            for _ in range(40)
        ]
        df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": docs})

        # heavy detection on the full sample sees the planted hot shingles
        hs, hc = dd._heavy_shingle_table(
            ray.data.from_pandas(df), "doc_id", "text", 5,
            sample=1.0, min_count=30, cap=1 << 16,
        )
        assert len(hs) > 0 and hc.max() == 40

        def run(**kw):
            out = _to_df(
                dd.ngram_jaccard_dedup(
                    ray.data.from_pandas(df), "doc_id", threshold=0.6, **kw
                )
            )
            return set(zip(out["a_id"], out["b_id"]))

        with_heavy = run(heavy_sample=1.0, heavy_min_count=4)
        without_heavy = run(heavy_min_count=10**9)  # nothing qualifies
        assert with_heavy == without_heavy

        # brute-force ground truth
        sets = [set(dd._shingle_hashes(t, 5).tolist()) for t in docs]
        want = set()
        for i in range(40):
            for j in range(i + 1, 40):
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if jac >= 0.6:
                    want.add((i, j))
        assert with_heavy == want


class TestKnnBrute:
    def test_brute_equals_tree(self):
        import pyarrow.parquet as pq

        from geo_index_ray.functions import geocode
        from geo_index_ray.pipelines import knn as knn_pipe
        from geo_index_ray.sources import tables

        nk = pq.read_table(f"{SF}/nation.parquet", columns=["n_nationkey"])[
            "n_nationkey"
        ].to_numpy().astype(np.int64)
        qxy = np.stack([geocode.derive_lon(nk), geocode.derive_lat(nk)], axis=1)
        targets = tables.points_ds(SF, "customer", "c_custkey")
        a = _to_df(
            knn_pipe.knn(targets, qxy, 5, id_col="c_custkey", query_ids=nk, method="brute")
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        targets2 = tables.points_ds(SF, "customer", "c_custkey")
        b = _to_df(
            knn_pipe.knn(targets2, qxy, 5, id_col="c_custkey", query_ids=nk, method="tree")
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert (a["target_id"].to_numpy() == b["target_id"].to_numpy()).all()


class TestLshCosinePairs:
    def test_finds_planted_neardup_vectors(self):
        import ray.data

        from geo_index_ray.pipelines import ann as ann_pipe

        rng = np.random.default_rng(3)
        base = rng.standard_normal((40, 64))
        # plant 5 near-dup pairs: id 100+i is a tiny perturbation of id i
        near = base[:5] + 0.01 * rng.standard_normal((5, 64))
        ids = np.r_[np.arange(40), 100 + np.arange(5)]
        mat = np.concatenate([base, near]).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel()), 64
                ),
            }
        )
        got = (
            ann_pipe.lsh_cosine_pairs(
                ray.data.from_arrow(tbl), "vec_id", threshold=0.95
            )
            .to_pandas()
        )
        found = set(zip(got["a_id"], got["b_id"]))
        want = {(i, 100 + i) for i in range(5)}
        # LSH is approximate in general, but 0.9995+ cosine pairs collide
        # in at least one 12-bit bucket with overwhelming probability
        assert want <= found
        # and nothing below threshold sneaks in
        assert (got["cos_sim"] >= 0.95).all()


class TestIvf:
    def test_nprobe_full_equals_exact(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines import ann as ann_pipe
        from geo_index_ray.sources import tables

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        vid = t["vec_id"].to_numpy().astype(np.int64)
        mask = vid % 7 == 0
        mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)[mask]
        qids = vid[mask]
        ds = tables.read_table(SF, "embeddings", columns=["vec_id", "embedding"])
        exact = _to_df(
            ann_pipe.ann_topk(ds, mat, qids, 5, id_col="vec_id")
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        ds2 = tables.read_table(SF, "embeddings", columns=["vec_id", "embedding"])
        full = _to_df(
            ann_pipe.ivf_topk(ds2, mat, qids, 5, id_col="vec_id", nlist=8, nprobe=8)
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert (exact["neighbor_id"].to_numpy() == full["neighbor_id"].to_numpy()).all()

    def test_partial_probe_recall(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines import ann as ann_pipe
        from geo_index_ray.sources import tables

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        vid = t["vec_id"].to_numpy().astype(np.int64)
        mask = vid % 7 == 0
        mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)[mask]
        qids = vid[mask]
        ds = tables.read_table(SF, "embeddings", columns=["vec_id", "embedding"])
        exact = _to_df(ann_pipe.ann_topk(ds, mat, qids, 5, id_col="vec_id"))
        ds2 = tables.read_table(SF, "embeddings", columns=["vec_id", "embedding"])
        approx = _to_df(
            ann_pipe.ivf_topk(ds2, mat, qids, 5, id_col="vec_id", nlist=8, nprobe=4)
        )
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        recall = len(e & a) / len(e)
        # probing half the lists should keep recall well above random
        assert recall >= 0.5, recall


class TestSkewSplit:
    def test_skew_split_preserves_join_result(self):
        """Hot cells raise the shuffle resolution; pair set is invariant."""
        import ray.data

        from geo_index_ray.pipelines import spatial_join as sj

        rng = np.random.default_rng(11)
        n = 4000
        # 80% of points piled into one res-5 cell (hot), rest uniform
        hot = rng.uniform([10.0, 10.0], [10.5, 10.5], size=(int(n * 0.8), 2))
        cold = rng.uniform([-170, -80], [170, 80], size=(n - len(hot), 2))
        xy = np.concatenate([hot, cold])
        pts = pa.table(
            {
                "pid": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(xy[:, 0]), "y": pa.array(xy[:, 1]),
                "min_x": pa.array(xy[:, 0]), "min_y": pa.array(xy[:, 1]),
                "max_x": pa.array(xy[:, 0]), "max_y": pa.array(xy[:, 1]),
            }
        )
        boxes = pa.table(
            {
                "bid": pa.array(np.arange(50, dtype=np.int64)),
                "min_x": pa.array(rng.uniform(-170, 160, 50)),
                "min_y": pa.array(rng.uniform(-80, 70, 50)),
            }
        )
        boxes = boxes.append_column(
            "max_x", pa.array(boxes["min_x"].to_numpy() + rng.uniform(1, 30, 50))
        ).append_column(
            "max_y", pa.array(boxes["min_y"].to_numpy() + rng.uniform(1, 30, 50))
        )

        def run(threshold):
            return (
                sj.shuffle_spatial_join(
                    ray.data.from_arrow(pts).repartition(4),
                    ray.data.from_arrow(boxes),
                    res=5, how="pip", left_id="pid", right_id="bid",
                    skew_split_threshold=threshold,
                )
                .to_pandas()
            )

        plain = run(None)
        split = run(200)  # forces resolution raise (hot cell has 3200 rows)
        a = set(zip(plain["pid"], plain["bid"]))
        b = set(zip(split["pid"], split["bid"]))
        assert a == b and len(a) > 0


class TestSimhashPairs:
    def test_exact_recall_vs_brute_force(self):
        """4-block bucketing guarantees recall for hamming <= 3 — the
        distributed result must EQUAL the brute-force hamming join."""
        from geo_index_ray.pipelines import dedup as dd
        from geo_index_ray.sources import tables

        ds = tables.read_table(SF, "documents", columns=["doc_id", "text"])
        got = _to_df(dd.simhash_pairs(ds, "doc_id", max_hamming=3))

        ds2 = tables.read_table(SF, "documents", columns=["doc_id", "text"])
        sh = _to_df(ds2.map_batches(dd.simhash_stage("doc_id"), batch_format="pyarrow"))
        ids = sh["doc_id"].to_numpy()
        h = sh["simhash"].to_numpy().view(np.uint64)
        x = h[:, None] ^ h[None, :]
        ham = np.unpackbits(
            x.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2
        ).sum(axis=2)
        ii, jj = np.nonzero(np.triu(ham <= 3, k=1))
        want = set(zip(np.minimum(ids[ii], ids[jj]), np.maximum(ids[ii], ids[jj])))
        assert set(zip(got["a_id"], got["b_id"])) == want
        # hamming values correct
        for _, r in got.iterrows():
            i = np.nonzero(ids == r["a_id"])[0][0]
            j = np.nonzero(ids == r["b_id"])[0][0]
            assert ham[i, j] == r["hamming"]


class TestIndexByteStability:
    def test_index_bytes_stable_under_rerun(self):
        """Per-partition tree bytes are a pure function of the partition's
        rows — identical across reruns (safe lineage-based retry)."""
        from geo_index_ray.sources import tables
        from geo_index_ray.stages.index_build import build_rtree_index_stage

        def build_digests():
            ds = tables.point_boxes_ds(SF, "customer", "c_custkey").repartition(4)
            idx = ds.map_batches(
                build_rtree_index_stage("c_custkey"), batch_format="pyarrow"
            )
            out = {}
            for b in idx.iter_batches(batch_format="pyarrow"):
                for i in range(b.num_rows):
                    import hashlib

                    tree = b["index"][i].as_py()
                    out[hashlib.sha1(tree).hexdigest()] = b["num_items"][i].as_py()
            return out

        a = build_digests()
        b = build_digests()
        assert a == b and len(a) > 0


class TestKnnPartitioned:
    def test_equals_brute_knn_and_prunes(self):
        """Ring-expansion kNN over the two-level index must equal the
        broadcast brute-force path, while probing far fewer partitions
        than exist."""
        from geo_index_ray.pipelines import knn as knn_pipe
        from geo_index_ray.pipelines import partition as pp
        from geo_index_ray.sources import tables

        rng = np.random.default_rng(11)
        qxy = np.stack(
            [rng.uniform(-170, 170, 12), rng.uniform(-80, 80, 12)], axis=1
        )
        qids = np.arange(100, 112, dtype=np.int64)
        targets = tables.points_ds(SF, "customer", "c_custkey")
        idx = pp.build_partitioned_index(targets, "c_custkey", 32)
        got, stats = pp.knn_partitioned(idx, qxy, 4, query_ids=qids,
                                        return_stats=True)
        want = _to_df(
            knn_pipe.knn(targets, qxy, 4, id_col="c_custkey", query_ids=qids)
        )
        cols = ["query_id", "target_id", "rank"]
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # sub-linear: phase B never probes every remaining partition
        assert stats["probes_b"] < stats["partitions_total"] * len(qids) * 0.5

    def test_quantized_grid_ties_match_brute_oracle(self):
        """Integer-grid targets make k-th-distance ties common INSIDE one
        partition probe; every tied candidate must survive to the global
        (dist, target_id) merge (regression: max_results=k used to truncate
        ties in heap order, dropping smaller-id neighbors)."""
        import ray.data

        from geo_index_ray.pipelines import partition as pp

        rng = np.random.default_rng(42)
        n = 4000
        tx = rng.integers(0, 60, n).astype(np.float64)
        ty = rng.integers(0, 60, n).astype(np.float64)
        tid = rng.permutation(n).astype(np.int64)  # ids uncorrelated w/ space
        ds = ray.data.from_arrow(
            pa.table({"tid": pa.array(tid), "x": pa.array(tx), "y": pa.array(ty)})
        ).repartition(4)
        idx = pp.build_partitioned_index(ds, "tid", 128)
        k = 5
        qx = rng.integers(0, 60, 40).astype(np.float64)
        qy = rng.integers(0, 60, 40).astype(np.float64)
        qids = np.arange(40, dtype=np.int64)
        got = pp.knn_partitioned(idx, np.stack([qx, qy], axis=1), k,
                                 query_ids=qids)
        # brute-force oracle: ORDER BY dist, target_id LIMIT k per query
        rows = []
        for qi in range(40):
            d = (tx - qx[qi]) ** 2 + (ty - qy[qi]) ** 2
            order = np.lexsort((tid, d))[:k]
            for r, j in enumerate(order, 1):
                rows.append((qi, tid[j], r, d[j]))
        want = pd.DataFrame(rows, columns=["query_id", "target_id", "rank", "dist"])
        cols = ["query_id", "rank", "target_id"]
        a = got[cols].sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = want[cols].sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_tie_at_kth_distance_matches_oracle_order(self):
        """Equidistant targets at the k-th rank must resolve by smaller id
        (the documented ORDER BY dist, target_id tie-break)."""
        import ray.data

        from geo_index_ray.pipelines import knn as knn_pipe

        # four targets at exactly distance 1 from the origin query
        t = pa.table(
            {
                "tid": pa.array([10, 2, 7, 1], pa.int64()),
                "x": pa.array([1.0, -1.0, 0.0, 0.0]),
                "y": pa.array([0.0, 0.0, 1.0, -1.0]),
            }
        )
        ds = ray.data.from_arrow(t)
        got = _to_df(
            knn_pipe.knn(ds, np.array([[0.0, 0.0]]), 2, id_col="tid")
        ).sort_values("rank")
        assert got["target_id"].tolist() == [1, 2]


class TestGroupedQuantilesSketch:
    def test_rank_error_bounded_on_continuous_values(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines import events

        rng = np.random.default_rng(17)
        n = 60_000
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], n),
                "v": rng.standard_normal(n) * 10.0 + rng.integers(0, 3, n) * 5,
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        out = (
            events.grouped_quantiles_sketch(ds, "k", "v", qs=(0.5, 0.9), delta=256)
            .to_pandas()
            .set_index("k")
        )
        for key, grp in df.groupby("k"):
            vals = np.sort(grp["v"].to_numpy())
            for q, col in [(0.5, "q_5"), (0.9, "q_9")]:
                est = out.loc[key, col]
                # rank of the estimate must be within ~2/delta of q
                rank = np.searchsorted(vals, est) / len(vals)
                assert abs(rank - q) < 2.5 / 256 + 0.01, (key, q, rank)
            assert out.loc[key, "n_events"] == len(grp)

    def test_deterministic_under_repartition(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines import events

        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {
                "k": rng.choice(["x", "y"], 5000),
                "v": rng.standard_normal(5000),
            }
        )
        # identical BATCHES (not just rows) → identical sketches
        a = (
            events.grouped_quantiles_sketch(
                ray.data.from_pandas(df).repartition(6), "k", "v"
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        b = (
            events.grouped_quantiles_sketch(
                ray.data.from_pandas(df).repartition(6), "k", "v"
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_compress_bounds_centroids(self):
        from geo_index_ray.pipelines.events import _sketch_compress

        rng = np.random.default_rng(3)
        codes = np.zeros(100_000, dtype=np.int64)
        v = rng.standard_normal(100_000)
        w = np.ones(100_000)
        cc, mm, ww = _sketch_compress(codes, v, w, 128)
        assert len(mm) <= 128
        assert abs(ww.sum() - 100_000) < 1e-6
        assert (np.diff(mm) >= 0).all()  # centroid means ascending


class TestHaversinePartitioned:
    """Haversine through the two-level index (round 4): envelope pruning
    must use a TRUE spherical lower bound — the reference's clamped
    closest-point bbox distance over-estimates across large or
    antimeridian-spanning envelopes and would mis-prune."""

    def test_env_lower_bounds_every_in_box_distance(self):
        from geo_index_ray.kernels import geom

        rng = np.random.default_rng(3)
        for _ in range(300):
            qlon = rng.uniform(-180, 180)
            qlat = rng.uniform(-89, 89)
            lo_lon, hi_lon = np.sort(rng.uniform(-180, 180, 2))
            lo_lat, hi_lat = np.sort(rng.uniform(-89, 89, 2))
            lb = float(
                geom.haversine_env_lower(qlon, qlat, lo_lon, lo_lat, hi_lon, hi_lat)
            )
            plon = rng.uniform(lo_lon, hi_lon, 64)
            plat = rng.uniform(lo_lat, hi_lat, 64)
            d = geom.haversine(qlon, qlat, plon, plat)
            assert lb <= d.min() + 1e-6, (
                qlon, qlat, lo_lon, lo_lat, hi_lon, hi_lat, lb, d.min()
            )

    def test_knn_haversine_matches_brute(self):
        import ray.data

        from geo_index_ray.kernels import geom
        from geo_index_ray.pipelines import partition as pp

        rng = np.random.default_rng(9)
        n = 3000
        tx = rng.uniform(-180, 180, n)
        ty = rng.uniform(-86, 86, n)
        tid = rng.permutation(n).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"tid": pa.array(tid), "x": pa.array(tx), "y": pa.array(ty)})
        ).repartition(4)
        idx = pp.build_partitioned_index(ds, "tid", 128)
        # include polar + antimeridian queries (the measured failure modes)
        qxy = np.array(
            [[-180.0, -85.0], [179.5, 2.0], [-179.5, 60.0], [0.0, 0.0],
             [10.0, 89.0], [-90.0, -45.0]]
        )
        qids = np.arange(6, dtype=np.int64)
        k = 7
        got = pp.knn_partitioned(idx, qxy, k, query_ids=qids, metric="haversine")
        # brute oracle
        order_t = np.argsort(tid, kind="stable")
        sx, sy, sid = tx[order_t], ty[order_t], tid[order_t]
        rows = []
        for qi in range(len(qxy)):
            d = geom.haversine(qxy[qi, 0], qxy[qi, 1], sx, sy)
            o = np.lexsort((sid, d))[:k]
            for r, j in enumerate(o):
                rows.append((qids[qi], sid[j], r + 1))
        want = pd.DataFrame(rows, columns=["query_id", "target_id", "rank"])
        cols = ["query_id", "target_id", "rank"]
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_radius_matches_brute_euclidean_and_haversine(self):
        import ray.data

        from geo_index_ray.kernels import geom
        from geo_index_ray.pipelines import partition as pp

        rng = np.random.default_rng(17)
        n = 2500
        tx = rng.uniform(-180, 180, n)
        ty = rng.uniform(-86, 86, n)
        tid = np.arange(n, dtype=np.int64)
        ds = ray.data.from_arrow(
            pa.table({"tid": pa.array(tid), "x": pa.array(tx), "y": pa.array(ty)})
        ).repartition(3)
        idx = pp.build_partitioned_index(ds, "tid", 256)
        qxy = np.array(
            [[-180.0, -85.0], [179.0, 10.0], [0.0, 0.0], [5.0, 88.5]]
        )
        qids = np.arange(4, dtype=np.int64)

        got, stats = pp.radius_partitioned(
            idx, qxy, 2_000_000.0, query_ids=qids, metric="haversine",
            return_stats=True,
        )
        gt = _to_df(got)
        a = sorted(zip(gt["query_id"], gt["target_id"]))
        b = []
        for qi in range(len(qxy)):
            d = geom.haversine(qxy[qi, 0], qxy[qi, 1], tx, ty)
            for j in np.nonzero(d <= 2_000_000.0)[0]:
                b.append((qids[qi], tid[j]))
        assert a == sorted(b)

        got_e = _to_df(
            pp.radius_partitioned(idx, qxy, 25.0, query_ids=qids,
                                  metric="euclidean")
        )
        a = sorted(zip(got_e["query_id"], got_e["target_id"]))
        b = []
        for qi in range(len(qxy)):
            d2 = (tx - qxy[qi, 0]) ** 2 + (ty - qxy[qi, 1]) ** 2
            for j in np.nonzero(d2 <= 25.0**2)[0]:
                b.append((qids[qi], tid[j]))
        assert a == sorted(b)


class TestGroupedQuantilesManyKeys:
    """Multi-key-per-reducer path: with key cardinality >> reducer_count,
    each coarse reducer ranks MANY keys in one vectorized pass — pin the
    segment arithmetic against DuckDB's quantile_cont."""

    def test_median_and_percentiles_200_keys(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines import events as ev

        rng = np.random.default_rng(21)
        n = 8000
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 200, n),
                "value": np.round(rng.normal(50, 20, n), 2),
            }
        )
        # force duplicate (key, value) rows across blocks
        df = pd.concat([df, df.iloc[: n // 4]], ignore_index=True)
        ds = ray.data.from_pandas(df).repartition(9)
        got_med = (
            ev.grouped_median(ds, "k", "value")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        got_pct = (
            ev.grouped_percentiles(ds, "k", "value")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want_med = con.execute(
            "SELECT k, quantile_cont(value, 0.5) AS median_value,"
            " CAST(COUNT(*) AS BIGINT) AS n_events FROM t GROUP BY k ORDER BY k"
        ).df()
        want_pct = con.execute(
            "SELECT k, quantile_cont(value, 0.25) AS p25,"
            " quantile_cont(value, 0.5) AS p50,"
            " quantile_cont(value, 0.9) AS p90,"
            " quantile_cont(value, 0.99) AS p99,"
            " CAST(COUNT(*) AS BIGINT) AS n_events FROM t GROUP BY k ORDER BY k"
        ).df()
        pd.testing.assert_frame_equal(
            got_med[want_med.columns.tolist()], want_med, check_dtype=False
        )
        pd.testing.assert_frame_equal(
            got_pct[want_pct.columns.tolist()], want_pct, check_dtype=False
        )

    def test_string_keys_multi_per_reducer(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines import events as ev

        rng = np.random.default_rng(22)
        keys = [f"key_{i:03d}" for i in rng.integers(0, 60, 3000)]
        df = pd.DataFrame({"k": keys, "value": rng.integers(0, 50, 3000).astype(np.float64)})
        ds = ray.data.from_pandas(df).repartition(5)
        got = (
            ev.grouped_median(ds, "k", "value")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k, quantile_cont(value, 0.5) AS median_value,"
            " CAST(COUNT(*) AS BIGINT) AS n_events FROM t GROUP BY k ORDER BY k"
        ).df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )


class TestDistinctSketch:
    def test_error_bound_and_merge_invariance(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from geo_index_ray.pipelines.events import grouped_distinct_sketch

        rng = np.random.default_rng(41)
        rows = []
        truth = {}
        for key, card in [("a", 50), ("b", 1000), ("c", 20000)]:
            vals = rng.choice(np.arange(card * 3, dtype=np.int64), card,
                              replace=False)
            truth[key] = len(np.unique(vals))
            draws = rng.choice(vals, card * 3)  # duplicates galore
            rows.append(pd.DataFrame({"k": key, "v": draws}))
        df = pd.concat(rows, ignore_index=True)

        outs = []
        for parts in (3, 11):  # estimate must not depend on partitioning
            ds = ray.data.from_pandas(df).repartition(parts)
            out = (
                grouped_distinct_sketch(ds, "k", "v", p=12)
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        got = dict(zip(outs[0]["k"], outs[0]["approx_distinct"]))
        for key, exact in truth.items():
            rel = abs(got[key] - exact) / exact
            assert rel < 0.05, (key, exact, got[key], rel)


class TestRateLimit:
    def test_matches_pandas_and_partition_invariant(self):
        import pyarrow.parquet as pq
        import ray

        from geo_index_ray.pipelines import events as ev

        W = 3_600_000_000
        N = 2
        t = pq.read_table(f"{SF}/events.parquet",
                          columns=["event_id", "user_id", "ts"]).to_pandas()
        t["window_id"] = t["ts"].astype("int64") // W
        t = t.sort_values(["user_id", "window_id", "ts", "event_id"])
        t["rnk"] = t.groupby(["user_id", "window_id"]).cumcount() + 1
        want = (
            t[t["rnk"] <= N][["event_id", "user_id", "window_id", "rnk"]]
            .sort_values("event_id").reset_index(drop=True)
        )

        for blocks in (1, 7):
            ds = ray.data.read_parquet(
                f"{SF}/events.parquet",
                columns=["event_id", "user_id", "ts"],
            ).repartition(blocks)
            got = _to_df(ev.rate_limit(ds, W, N)).sort_values(
                "event_id"
            ).reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got.astype({"rnk": "int64"}), want.astype({"rnk": "int64"})
            )


class TestGroupedCorr:
    @staticmethod
    def _ref(df):
        rows = []
        for g, sub in df.groupby("g", sort=True):
            n = len(sub)
            sx, sy = int(sub.x.sum()), int(sub.y.sum())
            sxx = int((sub.x.astype(object) ** 2).sum())
            syy = int((sub.y.astype(object) ** 2).sum())
            sxy = int((sub.x.astype(object) * sub.y.astype(object)).sum())
            num = n * sxy - sx * sy
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            corr = (
                None if vx <= 0 or vy <= 0
                else float(num) / (float(vx) ** 0.5 * float(vy) ** 0.5)
            )
            rows.append((g, n, corr))
        return pd.DataFrame(rows, columns=["g", "n", "corr"])

    def test_exact_and_partition_invariant(self):
        import ray

        from geo_index_ray.pipelines import events as ev

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "g": np.array(["a", "b", "c"])[rng.integers(0, 3, 400)],
                "x": rng.integers(0, 5000, 400),
                "y": rng.integers(0, 5000, 400),
            }
        )
        # one constant-x group: zero variance -> NULL corr
        df.loc[df.g == "c", "x"] = 7
        want = self._ref(df)
        for blocks in (1, 6):
            ds = ray.data.from_pandas(df).repartition(blocks)
            got = (
                _to_df(ev.grouped_corr(ds, "g", "x", "y"))
                .sort_values("g").reset_index(drop=True)
            )
            assert got["g"].tolist() == want["g"].tolist()
            assert got["n"].tolist() == want["n"].tolist()
            for a, b in zip(got["corr"], want["corr"]):
                assert (pd.isna(b) and pd.isna(a)) or a == b  # bit-exact

    def test_bigint_fallback_exact(self):
        import ray

        from geo_index_ray.pipelines import events as ev

        # per-key sums fit int64 (the documented contract), but the final
        # products n*sxx and sx*sx pass 2^63 -> the exact python-int path
        # must engage and match the big-int reference
        df = pd.DataFrame(
            {
                "g": ["a"] * 4,
                "x": [860_000_000, 870_000_000, 850_000_000, 865_000_000],
                "y": [5, 9, 3, 8],
            }
        )
        want = self._ref(df)
        got = _to_df(
            ev.grouped_corr(ray.data.from_pandas(df).repartition(2), "g", "x", "y")
        )
        assert got["n"].tolist() == want["n"].tolist()
        assert got["corr"].tolist() == want["corr"].tolist()


class TestEventSequences:
    def test_matches_pandas_groupby_order(self, ray_session):
        import ray

        from geo_index_ray.pipelines import events as events_pipe

        rng = np.random.default_rng(3)
        n = 500
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 25, n).astype(np.int64),
                "ts": pd.to_datetime(
                    rng.integers(0, 10**6, n), unit="us"
                ),
                "event_type": rng.choice(["a", "b", "cc"], n),
            }
        )
        want = (
            df.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id")["event_type"]
            .agg(lambda s: ",".join(s))
            .rename("seq")
            .reset_index()
        )
        want["n_events"] = (
            df.groupby("user_id").size().reindex(want["user_id"]).to_numpy()
        )
        for blocks in (1, 5):
            got = (
                events_pipe.event_sequences(
                    ray.data.from_pandas(df).repartition(blocks),
                    "user_id", "ts", "event_id", "event_type",
                )
                .to_pandas()
                .sort_values("user_id")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got[["user_id", "seq", "n_events"]],
                want[["user_id", "seq", "n_events"]],
                check_dtype=False,
            )


class TestRollingAvgAndGaps:
    def _events(self, seed=5, n=600, users=20):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, users, n).astype(np.int64),
                "ts": pd.to_datetime(rng.integers(0, 10**7, n), unit="us"),
                "value": np.round(rng.uniform(0, 100, n), 2),
            }
        )

    def test_rolling_avg_matches_pandas(self, ray_session):
        import ray

        from geo_index_ray.pipelines import events as events_pipe

        df = self._events()
        k = 5
        s = df.sort_values(["user_id", "ts", "event_id"]).copy()
        cents = np.round(s["value"].to_numpy() * 100).astype(np.int64)
        s["cents"] = cents
        roll = (
            s.groupby("user_id")["cents"]
            .rolling(k, min_periods=1)
            .agg(["sum", "count"])
            .reset_index(drop=True)
        )
        s["want"] = roll["sum"].to_numpy() / (100.0 * roll["count"].to_numpy())
        s["want_n"] = roll["count"].to_numpy().astype(np.int64)
        for blocks in (1, 4):
            got = (
                events_pipe.rolling_avg(
                    ray.data.from_pandas(df).repartition(blocks),
                    "user_id", "ts", "event_id", "value", k=k,
                )
                .to_pandas()
                .sort_values("event_id")
                .reset_index(drop=True)
            )
            want = s.sort_values("event_id").reset_index(drop=True)
            np.testing.assert_allclose(
                got["rolling_avg"].to_numpy(), want["want"].to_numpy(),
                rtol=0, atol=0,
            )
            np.testing.assert_array_equal(
                got["n_window"].to_numpy(), want["want_n"].to_numpy()
            )

    def test_event_gaps_matches_pandas_lag(self, ray_session):
        import ray

        from geo_index_ray.pipelines import events as events_pipe

        df = self._events(seed=9)
        s = df.sort_values(["user_id", "ts", "event_id"]).copy()
        tus = s["ts"].astype("int64").to_numpy() // 1000  # ns → us
        prev = np.roll(tus, 1)
        same = s["user_id"].to_numpy() == np.roll(s["user_id"].to_numpy(), 1)
        same[0] = False
        s["want"] = np.where(same, tus - prev, -1)
        got = (
            events_pipe.event_gaps(
                ray.data.from_pandas(df).repartition(3),
                "user_id", "ts", "event_id",
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = s.sort_values("event_id").reset_index(drop=True)
        np.testing.assert_array_equal(
            got["gap_us"].to_numpy(), want["want"].to_numpy()
        )


class TestGroupedZscore:
    def test_matches_numpy_and_null_degenerates(self, ray_session):
        import ray

        from geo_index_ray.pipelines import events as events_pipe

        rng = np.random.default_rng(13)
        # group 0/1 normal; group 2 singleton; group 3 zero-variance
        df = pd.DataFrame(
            {
                "id": np.arange(203, dtype=np.int64),
                "g": np.r_[np.zeros(100), np.ones(100), [2], [3, 3]].astype(
                    np.int64
                ).astype(str),
                "v": np.r_[
                    rng.integers(0, 1000, 200), [42], [7, 7]
                ].astype(np.int64),
            }
        )
        got = (
            events_pipe.grouped_zscore(
                ray.data.from_pandas(df).repartition(4), "g", "v", "id"
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        for g in ("0", "1"):
            sub = df[df["g"] == g]["v"].to_numpy().astype(np.float64)
            want = (sub - sub.mean()) / sub.std(ddof=1)
            np.testing.assert_allclose(
                got[got["g"] == g]["z"].to_numpy(), want, rtol=1e-12
            )
        assert got[got["g"] == "2"]["z"].isna().all()   # n < 2
        assert got[got["g"] == "3"]["z"].isna().all()   # zero variance


class TestWinsorize:
    def test_matches_pandas_groupwise_clip(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.events import winsorize

        rng = np.random.default_rng(11)
        n = 2_000
        key = rng.integers(0, 5, n)
        val = rng.normal(0, 100, n)
        ids = np.arange(n, dtype=np.int64)
        ds = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array(ids),
                    "k": pa.array(key.astype(np.int64)),
                    "v": pa.array(val),
                }
            )
        ).repartition(7)
        got = (
            winsorize(ds, "k", "v", "id", 0.1, 0.9)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        df = pd.DataFrame({"id": ids, "k": key, "v": val})
        lo = df.groupby("k")["v"].transform(
            lambda s: np.quantile(s, 0.1, method="linear")
        )
        hi = df.groupby("k")["v"].transform(
            lambda s: np.quantile(s, 0.9, method="linear")
        )
        want = np.clip(df["v"].to_numpy(), lo, hi)
        np.testing.assert_allclose(got["clipped"].to_numpy(), want, rtol=1e-12)
        # interior values untouched, outliers clipped to the bounds
        assert (got["clipped"].to_numpy() != got["v"].to_numpy()).any()


class TestAsofForward:
    def test_matches_bruteforce_next_event(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.events import asof_join

        rng = np.random.default_rng(13)
        nl, nr = 400, 300
        base = np.datetime64("2024-01-01", "us").astype(np.int64)

        def mk(n, id0):
            return pd.DataFrame(
                {
                    "eid": np.arange(id0, id0 + n, dtype=np.int64),
                    "user_id": rng.integers(0, 25, n),
                    "ts": base + rng.integers(0, 10_000, n),
                }
            )

        L, Rt = mk(nl, 0), mk(nr, 10_000)
        # plant equal-ts collisions to pin tie semantics
        Rt.loc[0, ["user_id", "ts"]] = [L.loc[0, "user_id"], L.loc[0, "ts"]]
        Rt.loc[1, ["user_id", "ts"]] = [L.loc[0, "user_id"], L.loc[0, "ts"]]

        def to_ds(df, idn):
            t = pa.table(
                {
                    idn: pa.array(df["eid"].to_numpy()),
                    "user_id": pa.array(df["user_id"].to_numpy()),
                    "ts": pa.array(df["ts"].to_numpy()).cast(
                        pa.timestamp("us")
                    ),
                }
            )
            return rd.from_arrow(t).repartition(4)

        got = (
            asof_join(
                to_ds(L, "left_id"), to_ds(Rt, "right_id"),
                key_col="user_id", left_id="left_id",
                right_id="right_id", direction="forward",
            )
            .to_pandas()
            .sort_values("left_id")
            .reset_index(drop=True)
        )
        rows = []
        for _, l in L.iterrows():
            cand = Rt[(Rt.user_id == l.user_id) & (Rt.ts >= l.ts)]
            if len(cand):
                cand = cand.sort_values(["ts", "eid"]).iloc[0]
                rows.append((l.eid, cand.eid))
        want = (
            pd.DataFrame(rows, columns=["left_id", "right_id"])
            .astype(np.int64)
            .sort_values("left_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
