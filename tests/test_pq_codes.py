"""pq_codes — product-quantization assignment vs its DuckDB twin."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.ann import pq_codes, sql_pq_codes


import pyarrow as pa


def _vectors(n=120, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = [rng.normal(size=dim).astype(np.float32) for _ in range(n)]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    return tbl, tbl.to_pandas()


class TestPqCodes:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        tbl, df = _vectors()
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = (
            pq_codes(ds, n_sub=4, centroid_mod=29)
            .to_pandas()
            .sort_values(["vec_id", "m"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", df)
        ora = (
            con.sql(
                sql_pq_codes("embeddings", n_sub=4, centroid_mod=29)
                + " ORDER BY vec_id, m"
            )
            .df()
            .astype(out.dtypes)
        )
        pd.testing.assert_frame_equal(out, ora)
        # every vector gets exactly n_sub codes; codes within codebook
        assert len(out) == 4 * len(df)
        k = (df["vec_id"] % 29 == 0).sum()
        assert out["code"].max() < k

    def test_centroid_assigns_to_itself(self, ray_session):
        import ray.data

        tbl, df = _vectors(n=60, dim=8, seed=4)
        ds = ray.data.from_arrow(tbl)
        out = pq_codes(ds, n_sub=2, centroid_mod=20).to_pandas()
        cents = np.sort(df.loc[df["vec_id"] % 20 == 0, "vec_id"].to_numpy())
        for cid, vid in enumerate(cents):
            mine = out[out["vec_id"] == vid]
            assert (mine["code"] == cid).all()


class TestAdcTopk:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.ann import adc_topk, sql_adc_topk

        tbl, df = _vectors(n=150, dim=16, seed=9)
        ds = ray.data.from_arrow(tbl).repartition(5)
        cols = ["query_id", "neighbor_id", "rank", "adist"]
        out = (
            adc_topk(ds, k=4, query_mod=37, n_sub=4, centroid_mod=29)
            .to_pandas()[cols]
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("embeddings", df)
        ora = (
            con.sql(
                sql_adc_topk(
                    "embeddings", 4, query_mod=37, n_sub=4, centroid_mod=29
                )
                + " ORDER BY query_id, rank"
            )
            .df()
            .astype(out.dtypes)
        )
        pd.testing.assert_frame_equal(out, ora)
        assert (out.groupby("query_id")["rank"].max() == 4).all()
        # ADC distance to a vector sharing the query's codes is minimal:
        # each query's own row must be its rank-1 hit or tied with it
        for qid, sub in out.groupby("query_id"):
            top = sub[sub["rank"] == 1].iloc[0]
            own = sub[sub["neighbor_id"] == qid]
            if len(own):
                assert own.iloc[0]["adist"] == top["adist"] or (
                    own.iloc[0]["adist"] >= top["adist"]
                )
