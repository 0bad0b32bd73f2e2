"""Round-5 size-gated broadcast→shuffle swaps: every operator that
broadcasts a driver-collected lookup table (tf·idf df, LM unigram
counts, common-bigram set) must produce IDENTICAL rows through its
key-sheltered hash_join fallback — the path a 10⁸-distinct-key corpus
takes automatically once the measured table size crosses the gate."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    pass


def _docs_df(n=80, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        " ".join(rng.choice(vocab, rng.integers(2, 30)))
        for _ in range(n - 2)
    ]
    docs += ["", "single"]  # empty + one-token docs exercise edge paths
    return pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "text": docs}
    )


class TestTfidfJoinPath:
    def test_identical_to_broadcast(self):
        import ray.data

        from geo_index_ray.pipelines.text import top_tfidf_terms

        df = _docs_df()
        ds = ray.data.from_pandas(df).repartition(4)
        a = (
            top_tfidf_terms(ds, "doc_id", k=3)
            .to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
        )
        b = (
            top_tfidf_terms(ds, "doc_id", k=3, force_join_path=True)
            .to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict())[a.columns])

    def test_auto_switch_by_measured_terms(self):
        import ray.data

        from geo_index_ray.pipelines.text import top_tfidf_terms

        df = _docs_df(seed=6)
        ds = ray.data.from_pandas(df).repartition(3)
        a = (
            top_tfidf_terms(ds, "doc_id", k=2)
            .to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
        )
        b = (
            top_tfidf_terms(ds, "doc_id", k=2, max_broadcast_terms=1)
            .to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict())[a.columns])


class TestLmBigramJoinPath:
    def test_identical_to_broadcast(self):
        import ray.data

        from geo_index_ray.pipelines.text import lm_bigram_score

        df = _docs_df(seed=7)
        ds = ray.data.from_pandas(df).repartition(4)
        a = (
            lm_bigram_score(ds, "doc_id")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            lm_bigram_score(ds, "doc_id", force_join_path=True)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # integer-quantized scores: exact equality, including the float
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict())[a.columns], check_exact=True
        )


class TestNoveltyJoinPath:
    def test_identical_to_broadcast(self):
        import ray.data

        from geo_index_ray.pipelines.webtext import bigram_novelty

        df = _docs_df(seed=8, n=120)
        ds = ray.data.from_pandas(df).repartition(5)
        a = (
            bigram_novelty(ds, "doc_id", min_df=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            bigram_novelty(ds, "doc_id", min_df=3, force_join_path=True)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict())[a.columns], check_exact=True
        )

    def test_auto_switch(self):
        import ray.data

        from geo_index_ray.pipelines.webtext import bigram_novelty

        df = _docs_df(seed=9)
        ds = ray.data.from_pandas(df).repartition(3)
        a = (
            bigram_novelty(ds, "doc_id", min_df=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            bigram_novelty(ds, "doc_id", min_df=2, max_broadcast_bigrams=1)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            a, b.astype(a.dtypes.to_dict())[a.columns], check_exact=True
        )
