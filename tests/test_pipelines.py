"""Ray Data pipeline tests (FIXTURES.md F6 invariants)."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def pairs_set(df: pd.DataFrame, a: str, b: str) -> set:
    return set(zip(df[a].tolist(), df[b].tolist()))


class TestEntry:
    def test_entry_smoke(self):
        import __ray_entry__ as e

        res = e.entry()
        df = res.to_pandas()
        assert len(df) >= 0
        assert sorted(df.columns) == ["c_custkey", "p_partkey"]


class TestJoinInvariance:
    def _join_pairs(self, num_blocks):
        from geo_index_ray.pipelines import spatial_join as sj
        from geo_index_ray.sources import tables
        import __ray_entry__ as e

        pts = tables.point_boxes_ds(SF, "customer", "c_custkey").repartition(num_blocks)
        tiles = e._part_tiles_ds(SF).repartition(num_blocks)
        out = sj.shuffle_spatial_join(
            pts, tiles, res=5, how="pip", left_id="c_custkey", right_id="p_partkey"
        ).to_pandas()
        return pairs_set(out, "c_custkey", "p_partkey")

    def test_partition_count_invariance(self):
        # F6: join output identical with 1 vs 8 partitions
        assert self._join_pairs(1) == self._join_pairs(8)

    def test_box_join_matches_brute_force(self):
        from geo_index_ray.pipelines import spatial_join as sj
        from geo_index_ray.functions import geocode
        import ray.data

        rng = np.random.default_rng(17)
        lkeys = np.arange(1, 400, dtype=np.int64)
        rkeys = np.arange(1000, 1200, dtype=np.int64)

        def mk(keys, idname):
            cx = geocode.derive_lon(keys)
            cy = geocode.derive_lat(keys)
            hw = geocode.derive_half_w(keys) * 3
            hh = geocode.derive_half_h(keys) * 3
            return pa.table(
                {
                    idname: pa.array(keys),
                    "min_x": pa.array(cx - hw),
                    "min_y": pa.array(cy - hh),
                    "max_x": pa.array(cx + hw),
                    "max_y": pa.array(cy + hh),
                }
            )

        lt, rt = mk(lkeys, "left_id"), mk(rkeys, "right_id")
        got = sj.shuffle_spatial_join(
            ray.data.from_arrow(lt).repartition(4),
            ray.data.from_arrow(rt).repartition(3),
            res=4,
            how="intersects",
        ).to_pandas()
        exp = set()
        l = lt.to_pandas()
        r = rt.to_pandas()
        for _, lr in l.iterrows():
            hit = ~(
                (r.max_x < lr.min_x)
                | (r.max_y < lr.min_y)
                | (r.min_x > lr.max_x)
                | (r.min_y > lr.max_y)
            )
            exp |= {(int(lr.left_id), int(i)) for i in r.right_id[hit]}
        assert pairs_set(got, "left_id", "right_id") == exp

    def test_broadcast_equals_shuffle(self):
        from geo_index_ray.pipelines import spatial_join as sj
        from geo_index_ray.sources import tables
        import __ray_entry__ as e
        import ray

        pts = tables.point_boxes_ds(SF, "customer", "c_custkey")
        tiles_tbl = pa.concat_tables(
            ray.get(e._part_tiles_ds(SF).to_arrow_refs())
        ).rename_columns(["p_partkey", "min_x", "min_y", "max_x", "max_y"])
        bro = sj.broadcast_spatial_join(
            pts, tiles_tbl, left_id="c_custkey", right_id="p_partkey"
        ).to_pandas()
        shu = sj.shuffle_spatial_join(
            tables.point_boxes_ds(SF, "customer", "c_custkey"),
            e._part_tiles_ds(SF),
            res=5,
            how="pip",
            left_id="c_custkey",
            right_id="p_partkey",
        ).to_pandas()
        assert pairs_set(bro, "c_custkey", "p_partkey") == pairs_set(
            shu, "c_custkey", "p_partkey"
        )


class TestKnn:
    def test_knn_matches_brute(self):
        from geo_index_ray.pipelines import knn as knn_pipe
        from geo_index_ray.sources import tables
        from geo_index_ray.functions import geocode
        import pyarrow.parquet as pq

        nk = np.arange(25, dtype=np.int64)
        qx = geocode.derive_lon(nk)
        qy = geocode.derive_lat(nk)
        targets = tables.points_ds(SF, "customer", "c_custkey").repartition(5)
        got = knn_pipe.knn(
            targets, np.stack([qx, qy], axis=1), 5, id_col="c_custkey", query_ids=nk
        ).to_pandas()

        cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
        ck = cust["c_custkey"].to_numpy().astype(np.int64)
        cx = geocode.derive_lon(ck)
        cy = geocode.derive_lat(ck)
        for qi in range(25):
            d = (cx - qx[qi]) ** 2 + (cy - qy[qi]) ** 2
            order = np.lexsort((ck, d))[:5]
            expect = ck[order].tolist()
            sub = got[got.query_id == qi].sort_values("rank")
            assert sub.target_id.tolist() == expect, qi


class TestDedup:
    def test_exact_dedup_planted(self):
        from geo_index_ray.pipelines import dedup
        import ray.data

        t = pa.table(
            {
                "doc_id": pa.array(np.arange(10, dtype=np.int64)),
                "text": pa.array(
                    ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa", "ddd", "eee", "fff", "ggg"]
                ),
            }
        )
        out = dedup.exact_dedup(ray.data.from_arrow(t).repartition(3), "doc_id").to_pandas()
        got = {(int(r.keep_id), int(r.n_dups)) for _, r in out.iterrows()}
        assert got == {(0, 3), (1, 2), (3, 1), (6, 1), (7, 1), (8, 1), (9, 1)}

    def test_minhash_finds_planted_neardups(self):
        from geo_index_ray.pipelines import dedup
        import ray.data

        base = "the quick brown fox jumps over the lazy dog " * 8
        near = base.replace("lazy", "sleepy")
        far = "completely different content about ray data pipelines " * 8
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array([base, near, far, base + " extra"]),
            }
        )
        out = dedup.minhash_dedup(
            ray.data.from_arrow(t).repartition(2), "doc_id", threshold=0.5
        ).to_pandas()
        got = pairs_set(out, "a_id", "b_id")
        assert (0, 1) in got and (0, 3) in got
        assert not any(2 in p for p in got)

    def test_ngram_jaccard_symmetry(self):
        from geo_index_ray.pipelines.dedup import ngram_jaccard

        assert ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
        assert ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0


class TestCheckpoint:
    def test_resume_skips_done_partitions(self):
        from geo_index_ray.state import checkpoint
        from geo_index_ray.sources import tables

        with tempfile.TemporaryDirectory() as d:
            ds = tables.points_ds(SF, "orders", "o_orderkey").repartition(4)
            rep1 = checkpoint.write_partitioned(ds, d, "pts", "o_orderkey")
            assert not rep1.skipped.any()
            n_parts = len(rep1)
            # rerun: all partitions skipped, data identical
            ds2 = tables.points_ds(SF, "orders", "o_orderkey").repartition(4)
            rep2 = checkpoint.write_partitioned(ds2, d, "pts", "o_orderkey")
            assert rep2.skipped.all()
            back = checkpoint.read_partitioned(d).to_pandas()
            assert len(back) == 1500
            assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == n_parts

    def test_duplicate_keys_fingerprint_stable_across_row_orders(self):
        """Reruns that deliver duplicate-key rows in a different arrival
        order must still skip every partition: the fingerprint canonicalizes
        over ALL columns, not just the key (regression: key-only stable sort
        left dup-key rows in Ray's nondeterministic order)."""
        import ray.data

        from geo_index_ray.state import checkpoint

        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 2, 3] * 10, pa.int64()),
                "v": pa.array(list(range(60)), pa.int64()),
            }
        )
        rev = t.take(pa.array(list(range(59, -1, -1)), pa.int64()))
        with tempfile.TemporaryDirectory() as d:
            rep1 = checkpoint.write_partitioned(
                ray.data.from_arrow(t).repartition(3), d, "s", "k", 4
            )
            rep2 = checkpoint.write_partitioned(
                ray.data.from_arrow(rev).repartition(5), d, "s", "k", 4
            )
            assert not rep1.skipped.any()
            assert rep2.skipped.all()

    def test_resume_after_partial_write(self):
        from geo_index_ray.state import checkpoint
        from geo_index_ray.sources import tables

        with tempfile.TemporaryDirectory() as d:
            ds = tables.points_ds(SF, "orders", "o_orderkey").repartition(4)
            checkpoint.write_partitioned(ds, d, "pts", "o_orderkey")
            # simulate a killed run: delete one partition + its manifest line
            parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            victim = parts[0]
            os.remove(os.path.join(d, victim))
            fp = victim[len("part-") : -len(".parquet")]
            mpath = os.path.join(d, checkpoint.MANIFEST_NAME)
            lines = [l for l in open(mpath) if f'"{fp}"' not in l]
            open(mpath, "w").writelines(lines)

            ds2 = tables.points_ds(SF, "orders", "o_orderkey").repartition(4)
            rep = checkpoint.write_partitioned(ds2, d, "pts", "o_orderkey")
            assert rep.skipped.sum() == len(rep) - 1  # only the victim rewritten
            back = checkpoint.read_partitioned(d).to_pandas()
            assert len(back) == 1500


class TestPages:
    def test_pages_deterministic_and_text_stable(self):
        from geo_index_ray.sources import pages

        t1 = pages.make_pages_batch(100, 50)
        t2 = pages.make_pages_batch(100, 50)
        assert t1.equals(t2)
        # text byte-identical per url through a pipeline round-trip
        ds = pages.pages_dataset(500, parallelism=4)
        df = ds.to_pandas()
        assert len(df) == 500
        ref = {u: t for u, t in zip(t1["url"].to_pylist(), t1["text"].to_pylist())}
        for u, t in zip(df.url, df.text):
            if u in ref:
                assert ref[u] == t

    def test_pages_skew_clusters(self):
        from geo_index_ray.sources import pages
        from geo_index_ray.kernels import cells

        t = pages.make_pages_batch(0, 5000)
        lon, lat = pages.page_geometry(t["url"].to_pylist())
        cell = cells.lonlat_to_cell(lon, lat, 5)
        _, counts = np.unique(cell, return_counts=True)
        # hot cells must exist (clustered 20%) — max cell count far above uniform
        assert counts.max() > 5 * counts.mean()


class TestContamination:
    def test_planted_overlap(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines import dedup as dd

        # doc 0 and 37 are eval (id % 37 == 0); doc 5 copies doc 37's
        # text so every one of its shingles is contaminated; doc 6 is
        # unique text sharing nothing with the eval docs
        texts = {
            0: "held out benchmark question alpha beta",
            37: "the exact answer string to leak",
            5: "the exact answer string to leak",
            6: "zzqqy wwxxv unrelated uuu material",
            8: "partial overlap: the exact answer here",
        }
        ids = np.array(sorted(texts), dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids, "text": [texts[i] for i in ids]})
        ds = ray.data.from_pandas(df).repartition(3)
        got = (
            dd.contamination_stats(ds, "doc_id", "text")
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        # eval docs excluded from output
        assert set(got.index) == {5, 6, 8}
        assert got.loc[5, "n_contaminated"] == got.loc[5, "n_shingles"]
        assert got.loc[6, "n_contaminated"] == 0
        assert 0 < got.loc[8, "n_contaminated"] < got.loc[8, "n_shingles"]

    def test_matches_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.functions import sqltext
        from geo_index_ray.pipelines import dedup as dd

        rng = np.random.default_rng(13)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(150, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(vocab, rng.integers(1, 12)))
                    for _ in range(150)
                ],
            }
        )
        ds = ray.data.from_pandas(df).repartition(4)
        got = (
            dd.contamination_stats(ds, "doc_id", "text")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(sqltext.sql_contamination_stats("documents", "doc_id"))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )


class TestSnapshotDelta:
    def test_matches_bruteforce_and_partitioning(self):
        import ray

        from geo_index_ray.pipelines import dedup as dd

        rng = np.random.default_rng(9)
        # small text pool so old/new overlap is substantial
        pool = [f"text body {i}" for i in range(40)]
        old = pd.DataFrame(
            {
                "doc_id": np.arange(100),
                "text": [pool[i] for i in rng.integers(0, 40, 100)],
            }
        )
        new = pd.DataFrame(
            {
                "doc_id": np.arange(100, 220),
                "text": [pool[i] for i in rng.integers(0, 60 - 20, 120)]
                + [],
            }
        )
        # make some new texts genuinely unseen
        new.loc[new.index[:30], "text"] = [f"fresh {i}" for i in range(30)]
        seen = set(old["text"])
        want = sorted(new.loc[~new["text"].isin(seen), "doc_id"].tolist())
        for blocks in (1, 6):
            o = ray.data.from_pandas(old).repartition(blocks)
            n = ray.data.from_pandas(new).repartition(blocks)
            got = sorted(
                dd.snapshot_delta(o, n, "doc_id").to_pandas()["doc_id"].tolist()
            )
            assert got == want

    def test_carry_cols_and_new_side_dups_pass(self):
        import ray

        from geo_index_ray.pipelines import dedup as dd

        old = pd.DataFrame({"doc_id": [1], "text": ["seen"]})
        new = pd.DataFrame(
            {
                "doc_id": [2, 3, 4],
                "text": ["fresh", "fresh", "seen"],
                "src": ["a", "b", "c"],
            }
        )
        out = (
            dd.snapshot_delta(
                ray.data.from_pandas(old),
                ray.data.from_pandas(new),
                "doc_id",
                carry_cols=("src",),
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # both new-side duplicates pass; the old-content match drops
        assert out["doc_id"].tolist() == [2, 3]
        assert out["src"].tolist() == ["a", "b"]
