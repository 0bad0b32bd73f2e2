"""inverted_index, ntile_bins, and the cross-side similarity join."""

import numpy as np
import pandas as pd
import pytest


class TestInvertedIndex:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.text import inverted_index

        rng = np.random.default_rng(3)
        vocab = ["alpha", "beta", "gamma", "delta", "EPS"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 8)))
            for _ in range(200)
        ]
        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
        ds = ray.data.from_pandas(df).repartition(6)
        out = inverted_index(ds, "doc_id").to_pandas()

        expect = {}
        for i, t in enumerate(texts):
            for w in set(t.lower().split()):
                expect.setdefault(w, []).append(i)
        assert set(out["term"]) == set(expect)
        got = out.set_index("term")
        for term, ids in expect.items():
            assert got.loc[term, "df"] == len(ids)
            assert got.loc[term, "postings"] == ",".join(map(str, sorted(ids)))

    def test_min_df_filters_after_exact_count(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.text import inverted_index

        df = pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], dtype=np.int64),
                "text": ["rare common", "common", "common other"],
            }
        )
        ds = ray.data.from_pandas(df).repartition(3)
        out = inverted_index(ds, "doc_id", min_df=2).to_pandas()
        assert set(out["term"]) == {"common"}
        assert out.iloc[0]["postings"] == "1,2,3"


class TestNtileBins:
    @pytest.mark.parametrize("n,k", [(100, 10), (7, 10), (23, 4), (1, 3)])
    def test_matches_sql_ntile(self, ray_session, n, k):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines.ranking import ntile_bins

        rng = np.random.default_rng(n * 31 + k)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                # heavy ties exercise the within-value rank path
                "n_chars": rng.integers(0, max(n // 3, 2), n).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(min(5, n))
        out = (
            ntile_bins(ds, "n_chars", "doc_id", k)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ora = duckdb.sql(
            f"SELECT doc_id, n_chars, CAST(NTILE({k}) OVER "
            "(ORDER BY n_chars, doc_id) AS BIGINT) AS bin FROM df "
            "ORDER BY doc_id"
        ).df()
        pd.testing.assert_frame_equal(
            out.astype({"bin": np.int64}), ora.astype({"bin": np.int64})
        )


class TestSimilarityJoin:
    def test_cross_side_exact(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.dedup import (
            _batch_shingle_hashes,
            ngram_jaccard_dedup,
        )

        rng = np.random.default_rng(11)
        base = "the quick brown fox jumps over the lazy dog again and again"
        texts = []
        for i in range(80):
            words = base.split()
            # a few point mutations keep most docs highly similar so the
            # cross-side pair set is non-trivial at threshold 0.5
            for _ in range(int(rng.integers(0, 3))):
                words[int(rng.integers(0, len(words)))] = f"w{rng.integers(0, 9)}"
            texts.append(" ".join(words))
        df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": texts})
        side = lambda ids: (np.asarray(ids) % 5) == 0  # noqa: E731
        ds = ray.data.from_pandas(df).repartition(4)
        out = ngram_jaccard_dedup(
            ds, "doc_id", threshold=0.5, side_of=side
        ).to_pandas()

        # brute-force cross-side jaccard over exact shingle sets
        sets = {}
        for i, t in enumerate(texts):
            h, doc, _ = _batch_shingle_hashes([t], 5)
            sets[i] = set(h.tolist())
        expect = set()
        for a in range(80):
            if not side(np.array([a]))[0]:
                continue
            for b in range(80):
                if side(np.array([b]))[0]:
                    continue
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter / union >= 0.5:
                    expect.add((a, b))
        got = (
            set() if out.empty else set(zip(out["a_id"], out["b_id"]))
        )
        assert expect, "test setup must produce at least one cross-side pair"
        assert got == expect
        assert len(got) == len(out), "pairs must be unique"
        # orientation: a is always the side-True id
        assert all(side(np.array([a]))[0] for a, _ in got)


class TestBpeTopMerges:
    def test_matches_duckdb(self, ray_session):
        import duckdb
        import numpy as np
        import ray.data

        from geo_index_ray.pipelines.text import (
            bpe_top_merges,
            sql_bpe_top_merges,
        )

        rng = np.random.default_rng(7)
        vocab = ["banana", "bandana", "cabana", "Ana", "naan", "x", "日本語up"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 10)))
            for _ in range(150)
        ]
        df = pd.DataFrame({"text": texts})
        ds = ray.data.from_pandas(df).repartition(5)
        out = bpe_top_merges(ds, "text", k=8).to_pandas()
        ora = duckdb.sql(sql_bpe_top_merges("df", "text", k=8)).df()
        got = out.sort_values("rnk").reset_index(drop=True)
        exp = ora.sort_values("rnk").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"cnt": np.int64, "rnk": np.int64}),
            exp.astype({"cnt": np.int64, "rnk": np.int64}),
        )


class TestNewOpEdgeCases:
    def test_ntile_bins_negative_values(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines.ranking import ntile_bins

        df = pd.DataFrame(
            {
                "doc_id": np.arange(40, dtype=np.int64),
                "n_chars": np.concatenate(
                    [np.arange(-20, 0), np.arange(0, 20)]
                ).astype(np.int64),
            }
        )
        out = (
            ntile_bins(ray.data.from_pandas(df).repartition(4),
                       "n_chars", "doc_id", 7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        ora = duckdb.sql(
            "SELECT doc_id, n_chars, CAST(NTILE(7) OVER (ORDER BY n_chars,"
            " doc_id) AS BIGINT) AS bin FROM df ORDER BY doc_id"
        ).df()
        pd.testing.assert_frame_equal(out.astype({"bin": np.int64}),
                                      ora.astype({"bin": np.int64}))

    def test_inverted_index_unicode_terms(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.text import inverted_index

        df = pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], dtype=np.int64),
                "text": ["日本語 hello", "日本語 мир", "hello мир"],
            }
        )
        out = inverted_index(ray.data.from_pandas(df).repartition(3),
                             "doc_id").to_pandas().set_index("term")
        assert out.loc["日本語", "postings"] == "1,2"
        assert out.loc["мир", "postings"] == "2,3"
        assert out.loc["hello", "postings"] == "1,3"

    def test_pagerank_empty_edges(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.components import pagerank_int

        df = pd.DataFrame({"src": np.array([], dtype=np.int64),
                           "dst": np.array([], dtype=np.int64)})
        out = pagerank_int(ray.data.from_pandas(df), "src", "dst",
                           iters=2).to_pandas()
        assert len(out) == 0

    def test_similarity_join_one_empty_side(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.dedup import ngram_jaccard_dedup

        df = pd.DataFrame(
            {"doc_id": np.arange(1, 11, dtype=np.int64),
             "text": ["same text here always"] * 10}
        )
        # side_of never True → no cross pairs
        out = ngram_jaccard_dedup(
            ray.data.from_pandas(df), "doc_id", threshold=0.3,
            side_of=lambda ids: np.zeros(len(np.asarray(ids)), dtype=bool),
        ).to_pandas()
        assert len(out) == 0
