"""lm_bigram_score — corpus bigram-LM fluency score vs its DuckDB twin."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.text import lm_bigram_score, sql_lm_bigram_score

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox jumps over the lazy dog",  # exact dup
    "a b",
    "x",            # single token: no bigrams, excluded
    "",             # empty: excluded
    "der hund und die katze sind nicht da",
    "the the the the",          # repeated hot bigram
    "Quick  brown\tfox the quick",  # case fold + multi-whitespace
]


def _run(ray_session, df, **kw):
    import ray.data

    ds = ray.data.from_pandas(df).repartition(3)
    return (
        lm_bigram_score(ds, "doc_id", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"n_bigrams": np.int64})
    )


class TestLmBigramScore:
    def test_matches_sql_twin(self, ray_session):
        df = pd.DataFrame(
            {"doc_id": np.arange(len(CORPUS), dtype=np.int64), "text": CORPUS}
        )
        out = _run(ray_session, df)
        con = duckdb.connect()
        con.register("documents", df)
        ora = con.sql(
            sql_lm_bigram_score("documents", "doc_id") + " ORDER BY doc_id"
        ).df().astype({"n_bigrams": np.int64})
        pd.testing.assert_frame_equal(out, ora)
        # exact dup docs score identically; no-bigram docs are absent
        byid = out.set_index("doc_id")["lm_score"]
        assert byid[0] == byid[2]
        assert 4 not in byid.index and 5 not in byid.index

    def test_partition_invariant(self, ray_session):
        import ray.data

        rng = np.random.default_rng(7)
        words = np.array(["alpha", "beta", "gamma", "delta", "the", "of"])
        texts = [
            " ".join(rng.choice(words, rng.integers(0, 12)))
            for _ in range(60)
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
        )
        a = _run(ray_session, df)
        ds = ray.data.from_pandas(df).repartition(11)
        b = (
            lm_bigram_score(ds, "doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({"n_bigrams": np.int64})
        )
        pd.testing.assert_frame_equal(a, b)

    def test_score_bounded_by_scale(self, ray_session):
        # pq <= 2^scale_bits since c(bigram) <= c(w1) and V >= 1, so the
        # per-doc mean is bounded too
        df = pd.DataFrame(
            {"doc_id": np.arange(len(CORPUS), dtype=np.int64), "text": CORPUS}
        )
        out = _run(ray_session, df, scale_bits=12)
        assert (out["lm_score"] <= float(1 << 12)).all()
        assert (out["lm_score"] > 0).all()
