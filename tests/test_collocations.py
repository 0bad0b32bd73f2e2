"""top_collocations and normalized_dedup vs their DuckDB twins."""

import duckdb
import numpy as np
import pandas as pd

from geo_index_ray.pipelines.dedup import normalized_dedup, sql_normalized_dedup
from geo_index_ray.pipelines.text import sql_top_collocations, top_collocations

CORPUS = [
    "new york is big and new york is loud",
    "the new york times covers new york news",
    "san francisco fog meets san francisco hills",
    "machine learning and machine learning again machine learning",
    "a a a a a b a b a b",
    "new york san francisco machine learning",
    "",
    "one",
]


def _df(texts=CORPUS):
    return pd.DataFrame(
        {"doc_id": np.arange(1, len(texts) + 1, dtype=np.int64),
         "text": texts}
    )


def _oracle(df, sql):
    con = duckdb.connect()
    con.register("documents", df)
    return con.sql(sql).df()


class TestTopCollocations:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        df = _df()
        out = (
            top_collocations(
                ray.data.from_pandas(df).repartition(3), k=5, min_count=2
            )
            .to_pandas()
            .sort_values("rnk")
            .reset_index(drop=True)
        )
        ora = (
            _oracle(df, sql_top_collocations("documents", k=5, min_count=2))
            .sort_values("rnk")
            .reset_index(drop=True)
            .astype(out.dtypes)
        )
        pd.testing.assert_frame_equal(out, ora)
        # strong collocations outrank the promiscuous "a b" pair
        pairs = list(zip(out["w1"], out["w2"]))
        assert ("new", "york") in pairs
        assert ("machine", "learning") in pairs

    def test_separator_byte_in_tokens_cannot_collide(self, ray_session):
        """Tokens may contain any non-\\s byte (e.g. \\x1f).  With a \\x1f
        join separator the pairs ('a\\x1fb','c') and ('a','b\\x1fc')
        collided into one per-block count bucket; the space separator
        (unreachable inside \\s+-split tokens) keeps them distinct."""
        import ray.data

        texts = ["a\x1fb c " * 3, "a b\x1fc " * 3]
        df = _df(texts)
        out = (
            top_collocations(
                ray.data.from_pandas(df).repartition(2), k=10, min_count=2
            )
            .to_pandas()
            .sort_values("rnk")
            .reset_index(drop=True)
        )
        ora = (
            _oracle(df, sql_top_collocations("documents", k=10, min_count=2))
            .sort_values("rnk")
            .reset_index(drop=True)
            .astype(out.dtypes)
        )
        pd.testing.assert_frame_equal(out, ora)
        counts = {(w1, w2): c for w1, w2, c in
                  zip(out["w1"], out["w2"], out["c12"])}
        assert counts[("a\x1fb", "c")] == 3
        assert counts[("a", "b\x1fc")] == 3

    def test_min_count_filters(self, ray_session):
        import ray.data

        df = _df()
        out = top_collocations(
            ray.data.from_pandas(df), k=50, min_count=4
        ).to_pandas()
        assert (out["c12"] >= 4).all()
        ora = _oracle(df, sql_top_collocations("documents", k=50, min_count=4))
        assert len(out) == len(ora)


class TestNormalizedDedup:
    def test_matches_sql_twin(self, ray_session):
        import ray.data

        texts = [
            "Hello,   World!",
            "hello world",
            "HELLO-WORLD",
            "hello  worlds",      # different after normalization
            "  hello world  ",
            "unrelated text",
        ]
        df = _df(texts)
        out = (
            normalized_dedup(ray.data.from_pandas(df).repartition(3), "doc_id")
            .to_pandas()
            .sort_values("keep_id")
            .reset_index(drop=True)
        )
        ora = (
            _oracle(df, sql_normalized_dedup("documents", "doc_id"))
            .sort_values("keep_id")
            .reset_index(drop=True)
            .astype(out.dtypes)
        )
        pd.testing.assert_frame_equal(out, ora)
        # the four case/punct/space variants collapse to keep_id=1, dups=4
        assert out.set_index("keep_id").loc[1, "n_dups"] == 4
