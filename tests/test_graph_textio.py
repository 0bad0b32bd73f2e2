"""pagerank_int, heavy_hitters_per_group, and the JSONL/CSV sources."""

import numpy as np
import pandas as pd
import pytest


class TestPagerankInt:
    def test_matches_sql_twin(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines.components import (
            pagerank_int,
            sql_pagerank_int,
        )

        rng = np.random.default_rng(17)
        df = pd.DataFrame(
            {
                "src": rng.integers(0, 30, 200).astype(np.int64),
                "dst": rng.integers(0, 30, 200).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(4)
        out = (
            pagerank_int(ds, "src", "dst", iters=2)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        ora = duckdb.sql(
            sql_pagerank_int("SELECT src, dst FROM df", iters=2)
            + " ORDER BY node"
        ).df()
        pd.testing.assert_frame_equal(
            out.astype({"node": np.int64, "pr": np.int64}),
            ora.astype({"node": np.int64, "pr": np.int64}),
        )

    def test_sink_node_gets_base_only_after_sources_drain(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.components import pagerank_int

        # chain 0 -> 1 -> 2; node 0 has no in-edges so it holds base
        # after one iteration; mass flows down the chain exactly
        df = pd.DataFrame(
            {"src": np.array([0, 1], dtype=np.int64),
             "dst": np.array([1, 2], dtype=np.int64)}
        )
        ds = ray.data.from_pandas(df)
        out = (
            pagerank_int(ds, "src", "dst", iters=2, scale=100, damp_num=85,
                         damp_den=100)
            .to_pandas()
            .set_index("node")["pr"]
        )
        base = 100 * 15 // 100
        pr1 = {0: base, 1: base + 85 * 100 // 100, 2: base + 85 * 100 // 100}
        expect = {
            0: base,
            1: base + 85 * pr1[0] // 100,
            2: base + 85 * pr1[1] // 100,
        }
        assert dict(out) == expect

    def test_state_modes_agree_and_parquet_resumes(self, ray_session, tmp_path):
        import ray.data

        from geo_index_ray.pipelines.components import pagerank_int

        rng = np.random.default_rng(41)
        df = pd.DataFrame(
            {
                "src": rng.integers(0, 25, 150).astype(np.int64),
                "dst": rng.integers(0, 25, 150).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(3)

        def run(**kw):
            return (
                pagerank_int(ds, "src", "dst", iters=3, **kw)
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )

        mem = run()  # default state="memory"
        lazy = run(state="lazy")
        ck = str(tmp_path / "ck")
        pq_run = run(state="parquet", checkpoint_dir=ck)
        pd.testing.assert_frame_equal(mem, lazy)
        pd.testing.assert_frame_equal(mem, pq_run)
        # every persisted label carries a DONE marker
        import os

        labels = sorted(os.listdir(ck))
        assert {"edge_slots", "deg_slots",
                "round_0", "round_1", "round_2"} <= set(labels)
        # resume: rerun with the same dir reuses completed rounds and
        # still returns the identical result
        resumed = run(state="parquet", checkpoint_dir=ck)
        pd.testing.assert_frame_equal(mem, resumed)


class TestHeavyHittersPerGroup:
    def test_row_number_semantics(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines.webtext import heavy_hitters_per_group

        rng = np.random.default_rng(23)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
        rows = []
        for i in range(300):
            rows.append(
                {
                    "source": f"s{int(rng.integers(0, 4))}",
                    "text": " ".join(rng.choice(vocab, size=rng.integers(1, 9))),
                }
            )
        df = pd.DataFrame(rows)
        ds = ray.data.from_pandas(df).repartition(6)
        out = heavy_hitters_per_group(ds, "source", "text", k=3).to_pandas()
        ora = duckdb.sql(
            """
            WITH w AS (SELECT source,
                       unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS token FROM df),
            c AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM w GROUP BY 1, 2)
            SELECT source, token, cnt,
                   CAST(ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY cnt DESC, token) AS BIGINT) AS rnk
            FROM c QUALIFY rnk <= 3
            ORDER BY source, rnk
            """
        ).df()
        got = out.sort_values(["source", "rnk"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["source", "token", "cnt", "rnk"]].astype({"cnt": np.int64,
                                                           "rnk": np.int64}),
            ora.astype({"cnt": np.int64, "rnk": np.int64}),
        )


class TestTextIO:
    @pytest.mark.parametrize("fmt", ["jsonl", "csv"])
    def test_roundtrip_ints_and_strings(self, ray_session, fmt, tmp_path):
        import ray.data

        from geo_index_ray.sources import textio

        df = pd.DataFrame(
            {
                "k": np.arange(50, dtype=np.int64),
                "name": [f"row-{i}" for i in range(50)],
            }
        )
        ds = ray.data.from_pandas(df).repartition(3)
        out_dir = str(tmp_path / fmt)
        if fmt == "jsonl":
            textio.write_jsonl(ds, out_dir)
            back = textio.read_jsonl(out_dir)
        else:
            textio.write_csv(ds, out_dir)
            back = textio.read_csv(out_dir)
        got = back.to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "name"]], df)
