"""Tests for per-group top-k, stratified sampling, and grouped percentiles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


class TestGroupedTopk:
    def test_matches_pandas_row_number(self):
        import ray.data

        from geo_index_ray.pipelines import ranking

        rng = np.random.default_rng(11)
        n = 5000
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "de", "fr"], n),
                # heavy ties so the (order DESC, id ASC) tie-break matters
                "n_chars": rng.integers(0, 40, n).astype(np.int64),
            }
        )
        ds = ray.data.from_pandas(df).repartition(7)
        got = (
            ranking.grouped_topk(ds, "lang", "n_chars", "doc_id", k=5)
            .to_pandas()
            .sort_values(["lang", "rnk"])
            .reset_index(drop=True)
        )
        want = df.sort_values(
            ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
        )
        want["rnk"] = want.groupby("lang").cumcount() + 1
        want = want[want["rnk"] <= 5].reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["lang", "doc_id", "n_chars", "rnk"]],
            want[["lang", "doc_id", "n_chars", "rnk"]],
            check_dtype=False,
        )

    def test_partial_prefilter_bounds_survivors(self):
        from geo_index_ray.pipelines.ranking import _topk_table

        rng = np.random.default_rng(3)
        batch = pa.table(
            {
                "lang": pa.array(rng.choice(["a", "b"], 1000).tolist()),
                "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
                "n_chars": pa.array(rng.integers(0, 10, 1000).astype(np.int64)),
            }
        )
        out = _topk_table(batch, "lang", "n_chars", "doc_id", 4, False)
        assert out.num_rows <= 8  # ≤ k per key per block rides the shuffle


class TestStratifiedSample:
    def test_deterministic_and_rate_respecting(self):
        import ray.data

        from geo_index_ray.pipelines import ranking

        n = 20000
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": np.where(np.arange(n) % 3 == 0, "en", "de"),
            }
        )
        rates = {"en": 0.1, "de": 0.5}
        ds = ray.data.from_pandas(df).repartition(5)
        got = ranking.stratified_sample(ds, "lang", "doc_id", rates).to_pandas()
        # rerun under different partitioning → identical rows
        ds2 = ray.data.from_pandas(df).repartition(2)
        got2 = ranking.stratified_sample(ds2, "lang", "doc_id", rates).to_pandas()
        assert sorted(got["doc_id"]) == sorted(got2["doc_id"])
        frac = got.groupby("lang").size() / df.groupby("lang").size()
        assert abs(frac["en"] - 0.1) < 0.02
        assert abs(frac["de"] - 0.5) < 0.02
        # unknown stratum → default_rate (0.0 here) drops everything
        df3 = df.assign(lang="xx")
        got3 = ranking.stratified_sample(
            ray.data.from_pandas(df3), "lang", "doc_id", rates
        ).to_pandas()
        assert len(got3) == 0


class TestGroupedPercentiles:
    def test_matches_numpy_weighted(self):
        import ray.data

        from geo_index_ray.pipelines import events as ev

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "event_type": rng.choice(["x", "y"], 4000),
                # repeated discrete values exercise the weighted cumsum path
                "value": rng.integers(0, 50, 4000).astype(np.float64) / 2.0,
            }
        )
        ds = ray.data.from_pandas(df).repartition(6)
        got = (
            ev.grouped_percentiles(ds, "event_type", "value")
            .to_pandas()
            .set_index("event_type")
            .sort_index()
        )
        for et, g in df.groupby("event_type"):
            v = g["value"].to_numpy()
            for q, name in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
                assert got.loc[et, name] == pytest.approx(
                    np.percentile(v, q * 100), abs=1e-12
                ), (et, name)
            assert got.loc[et, "n_events"] == len(g)


class TestWindowCountJoin:
    def test_matches_pandas_brute_force(self):
        import ray.data

        from geo_index_ray.pipelines import events as ev

        rng = np.random.default_rng(9)
        n_l, n_r = 600, 3000
        W = 50_000_000  # 50 s in µs
        base = pd.Timestamp("2024-01-01").value // 1000
        lt = base + rng.integers(0, 500_000_000, n_l)
        rt = base + rng.integers(0, 500_000_000, n_r)
        left = pd.DataFrame(
            {
                "anchor_id": np.arange(n_l, dtype=np.int64),
                "user_id": rng.integers(0, 40, n_l),
                "ts": pd.to_datetime(lt, unit="us"),
            }
        )
        right = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, n_r),
                "ts": pd.to_datetime(rt, unit="us"),
            }
        )
        got = (
            ev.window_count_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                window_us=W, key_col="user_id",
                left_id="anchor_id", count_name="n_right",
            )
            .to_pandas()
            .sort_values("anchor_id")
            .reset_index(drop=True)
        )
        assert len(got) == n_l  # left-join semantics: every anchor emits
        rus = right["ts"].astype("int64").to_numpy() // 1000  # ns → µs
        rkey = right["user_id"].to_numpy()
        for i in rng.choice(n_l, 80, replace=False):
            t = lt[i]
            want = int(
                ((rkey == left.loc[i, "user_id"]) & (rus > t - W) & (rus <= t)).sum()
            )
            assert got.loc[got["anchor_id"] == i, "n_right"].item() == want


class TestTopTfidfTerms:
    def test_matches_brute_force(self):
        import ray.data

        from geo_index_ray.pipelines import text as tp

        docs = [
            "apple banana apple cherry",
            "banana banana date",
            "cherry date elderberry date",
            "  apple  ",
            "",
        ]
        df_in = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": docs})
        got = (
            tp.top_tfidf_terms(ray.data.from_pandas(df_in).repartition(3), "doc_id", k=2)
            .to_pandas()
            .sort_values(["doc_id", "rnk"])
            .reset_index(drop=True)
        )
        # brute force
        import collections
        N = 5
        tfs = [collections.Counter((d or "").lower().split()) for d in docs]
        dfc = collections.Counter()
        for t in tfs:
            dfc.update(t.keys())
        rows = []
        for i, t in enumerate(tfs):
            scored = sorted(
                ((tf * ((N + 1.0) / (dfc[w] + 1.0)), w) for w, tf in t.items()),
                key=lambda s: (-s[0], s[1]),
            )
            for r, (_, w) in enumerate(scored[:2]):
                rows.append((i, w, r + 1))
        want = pd.DataFrame(rows, columns=["doc_id", "term", "rnk"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestBm25Topk:
    def test_matches_brute_force(self):
        import collections

        import ray.data

        from geo_index_ray.pipelines import text as tp

        rng = np.random.default_rng(11)
        vocab = ["hash", "join", "scan", "vector", "stream", "table", "row"]
        docs = [
            " ".join(rng.choice(vocab, rng.integers(1, 40)))
            for _ in range(120)
        ] + ["", "   "]  # empty docs count toward N, not toward dl
        df_in = pd.DataFrame(
            {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
        )
        terms = ["hash", "vector", "unseen_term"]
        k1, b, k = 1.2, 0.75, 10
        got = (
            tp.bm25_topk(
                ray.data.from_pandas(df_in).repartition(5),
                "doc_id", terms, k=k, k1=k1, b=b,
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        # brute force
        N = len(docs)
        tfs = [collections.Counter(d.lower().split()) for d in docs]
        dl = np.array([sum(t.values()) for t in tfs], dtype=float)
        avgdl = dl.sum() / N
        dfc = collections.Counter()
        for t in tfs:
            dfc.update(t.keys())
        scores = []
        for i, t in enumerate(tfs):
            s = 0.0
            for q in terms:
                tf = float(t.get(q, 0))
                idf = ((N - dfc.get(q, 0)) + 0.5) / (dfc.get(q, 0) + 0.5)
                s = s + idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * (dl[i] / avgdl))
                )
            if any(t.get(q, 0) for q in terms):
                scores.append((i, s))
        scores.sort(key=lambda r: (-r[1], r[0]))
        want_ids = [i for i, _ in scores[:k]]
        assert got["doc_id"].tolist() == want_ids
        want_scores = np.array([s for _, s in scores[:k]])
        np.testing.assert_allclose(got["score"].to_numpy(), want_scores, rtol=1e-12)

    def test_no_candidates(self):
        import ray.data

        from geo_index_ray.pipelines import text as tp

        df_in = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                              "text": ["a b", "c", "d e f"]})
        got = tp.bm25_topk(
            ray.data.from_pandas(df_in).repartition(2), "doc_id", ["zzz"], k=5
        ).to_pandas()
        assert len(got) == 0


class TestSpanDedup:
    def test_matches_brute_force(self):
        import ray.data

        from geo_index_ray.pipelines import text as tp

        rng = np.random.default_rng(5)
        vocab = ["aa", "bb", "cc", "dd"]
        docs = [" ".join(rng.choice(vocab, rng.integers(0, 30))) for _ in range(60)]
        docs += ["", "  ", docs[0], docs[1] + " zz"]  # exact dup + extension
        w = 4
        df_in = pd.DataFrame(
            {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
        )
        got = (
            tp.span_dedup(ray.data.from_pandas(df_in).repartition(5),
                          "doc_id", span_words=w)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # brute force
        seen = {}
        spans_by_doc = []
        for i, d in enumerate(docs):
            toks = [t for t in d.lower().split() if t]
            spans = [" ".join(toks[j: j + w]) for j in range(0, len(toks), w)]
            spans_by_doc.append(spans)
            for si, s in enumerate(spans):
                seen.setdefault(s, (i, si))
        want = [
            " ".join(s for si, s in enumerate(spans) if seen[s] == (i, si))
            for i, spans in enumerate(spans_by_doc)
        ]
        assert got["doc_id"].tolist() == list(range(len(docs)))
        assert got["clean_text"].tolist() == want
        # the exact-duplicate doc must be fully emptied
        assert got["clean_text"][len(docs) - 2] == "" or docs[0] == ""


class TestPackSequences:
    def test_matches_pandas_prefix_sum(self):
        import ray.data

        from geo_index_ray.pipelines import text as tx

        rng = np.random.default_rng(5)
        # sparse, shuffled ids across many buckets (bucket_shift=4 ->
        # 16 ids/bucket, with empty buckets in between)
        ids = np.sort(rng.choice(5000, 700, replace=False)).astype(np.int64)
        texts = [
            " ".join(["w"] * int(k)) if k else ""
            for k in rng.integers(0, 40, len(ids))
        ]
        df = pd.DataFrame({"doc_id": ids, "text": texts})
        shuffled = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
        ds = ray.data.from_pandas(shuffled).repartition(7)
        got = (
            tx.pack_sequences(ds, "doc_id", "text", seq_len=64, bucket_shift=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        n_tok = df["text"].str.split().str.len().astype(np.int64)
        start = n_tok.cumsum().shift(1, fill_value=0).astype(np.int64)
        want = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n_tok,
                "start_offset": start,
                "pack_id": start // 64,
            }
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_topk_int64_order_above_2_53(ray_session):
    """Descending int64 order keys above 2^53 must not collapse through
    float64 (ns-epoch timestamps, hash ids)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from geo_index_ray.pipelines.ranking import grouped_topk

    base = (1 << 61) + 1
    df = pd.DataFrame(
        {
            "host": ["a"] * 3,
            "ts": np.array([base, base + 2, base + 1], dtype=np.int64),
            "id": np.array([1, 2, 3], dtype=np.int64),
        }
    )
    out = (
        grouped_topk(ray.data.from_pandas(df), "host", "ts", "id", k=2)
        .to_pandas()
        .sort_values("rnk")
    )
    assert out["ts"].tolist() == [base + 2, base + 1]
    assert out["id"].tolist() == [2, 3]


def test_grouped_topk_datetime64_order_above_2_53(ray_session):
    """Arrow timestamp order columns arrive as numpy datetime64 (kind
    'M') — they must take the exact int64 negation path, not float64."""
    import numpy as np
    import pandas as pd
    import ray.data

    from geo_index_ray.pipelines.ranking import grouped_topk

    base = (1 << 61) + 1
    df = pd.DataFrame(
        {
            "host": ["a"] * 3,
            "ts": np.array([base, base + 2, base + 1],
                           dtype="datetime64[ns]"),
            "id": np.array([1, 2, 3], dtype=np.int64),
        }
    )
    out = (
        grouped_topk(ray.data.from_pandas(df), "host", "ts", "id", k=2)
        .to_pandas()
        .sort_values("rnk")
    )
    assert out["id"].tolist() == [2, 3]


class TestModelScore:
    """Hashed-feature linear scorer: broadcast weights + actor pool."""

    def test_scores_match_local_recompute(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from geo_index_ray.pipelines import text as text_pipe
        from geo_index_ray.pipelines.text import (
            _fnv1a_ragged,
            _string_views,
            scorer_weights,
        )

        docs = ["the cat sat", "", "   ", "one TWO two", "solo"]
        ids = list(range(len(docs)))
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(docs)})
        )
        out = text_pipe.model_score(ds, "doc_id", "text").to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)

        w = scorer_weights(1024)
        for i, d in enumerate(docs):
            toks = [t for t in d.lower().split() if t]
            arr = pa.array(toks if toks else [], pa.string())
            if len(arr):
                lens, starts, vals = _string_views(pa.chunked_array([arr]))
                h = _fnv1a_ragged(lens, starts, vals)
                exp = int(w[(h % np.uint64(1024)).astype(np.int64)].sum())
            else:
                exp = 0
            assert out.loc[i, "n_tok"] == len(toks)
            assert out.loc[i, "score"] == exp
            assert bool(out.loc[i, "label"]) == (exp > 0)

    def test_weights_deterministic_int64(self):
        from geo_index_ray.pipelines.text import scorer_weights

        w = scorer_weights(1024)
        assert w.dtype.name == "int64"
        assert (w == scorer_weights(1024)).all()
        assert abs(w).max() <= 500001


class TestUniformSampleK:
    def test_matches_global_hash_order(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.ranking import _GOLDEN, uniform_sample_k

        ids = np.arange(1, 501, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)})).repartition(9)
        k = 37
        got = (
            uniform_sample_k(ds, "doc_id", k)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        with np.errstate(over="ignore"):
            u = (ids.view(np.uint64) * _GOLDEN).astype(np.float64) / 2.0**64
        order = np.lexsort((ids, u))[:k]
        assert got["doc_id"].tolist() == ids[order].tolist()
        assert got["rank"].tolist() == list(range(1, k + 1))
        np.testing.assert_array_equal(got["u"].to_numpy(), u[order])

    def test_k_larger_than_corpus_returns_all(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.ranking import uniform_sample_k

        ids = np.arange(5, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
        got = uniform_sample_k(ds, "doc_id", 50).to_pandas()
        assert sorted(got["doc_id"].tolist()) == ids.tolist()


class TestNtileInGroup:
    def test_matches_duckdb_ntile(self, ray_session):
        import duckdb
        import ray.data as rd

        from geo_index_ray.pipelines.ranking import ntile_in_group

        rng = np.random.default_rng(5)
        n = 1_200
        key = np.array([f"k{g}" for g in rng.integers(0, 7, n)], object)
        val = rng.integers(0, 40, n).astype(np.int64)  # heavy ties
        ids = np.arange(n, dtype=np.int64)
        df = pd.DataFrame({"id": ids, "k": key, "v": val})
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
        got = (
            ntile_in_group(ds, "k", "v", "id", 10)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            """
            SELECT id, k, v,
                   CAST(NTILE(10) OVER (PARTITION BY k ORDER BY v, id)
                        AS BIGINT) AS tile
            FROM df ORDER BY id
            """
        ).df()
        pd.testing.assert_frame_equal(got, want)

    def test_group_smaller_than_tiles(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.ranking import ntile_in_group

        ds = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([1, 2, 3], pa.int64()),
                    "k": pa.array(["a"] * 3),
                    "v": pa.array([30, 10, 20], pa.int64()),
                }
            )
        )
        got = (
            ntile_in_group(ds, "k", "v", "id", 10)
            .to_pandas()
            .sort_values("id")
        )
        # n=3 < t=10: tiles are 1,2,3 in (v, id) order
        assert got.set_index("id")["tile"].to_dict() == {2: 1, 3: 2, 1: 3}


class TestGroupHoldoutK:
    def test_matches_per_group_hash_order(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.ranking import _GOLDEN, group_holdout_k

        rng = np.random.default_rng(17)
        n = 900
        ids = np.arange(1, n + 1, dtype=np.int64)
        grp = np.array([f"g{x}" for x in rng.integers(0, 6, n)], object)
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids), "lang": pa.array(grp.tolist())})
        ).repartition(8)
        k = 12
        got = (
            group_holdout_k(ds, "doc_id", "lang", k)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        with np.errstate(over="ignore"):
            u = (ids.view(np.uint64) * _GOLDEN).astype(np.float64) / 2.0**64
        df = pd.DataFrame({"doc_id": ids, "lang": grp, "u": u})
        df["rank"] = (
            df.sort_values(["u", "doc_id"]).groupby("lang").cumcount() + 1
        )
        want = (
            df[df["rank"] <= k]
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
            .astype({"rank": np.int64})
        )
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


class TestPercentRankInGroup:
    def test_matches_duckdb_percent_rank(self, ray_session):
        import duckdb
        import ray.data as rd

        from geo_index_ray.pipelines.ranking import percent_rank_in_group

        rng = np.random.default_rng(41)
        n = 800
        key = np.array([f"k{g}" for g in rng.integers(0, 6, n)], object)
        val = rng.integers(0, 30, n).astype(np.int64)  # heavy ties
        ids = np.arange(n, dtype=np.int64)
        df = pd.DataFrame({"id": ids, "k": key, "v": val})
        # one singleton group: PERCENT_RANK must emit 0.0, not NaN
        df.loc[0, "k"] = "solo"
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        got = (
            percent_rank_in_group(ds, "k", "v", "id")
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            """
            SELECT id, k, v,
                   PERCENT_RANK() OVER (PARTITION BY k ORDER BY v)
                     AS pct_rank
            FROM df ORDER BY id
            """
        ).df()
        pd.testing.assert_frame_equal(got, want)
