"""Tests for funnel_conversion, cohort_retention, fuzzy_ed1_pairs and
chunk_words (round-4 additions)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EVENTS = f"{SF}/events.parquet"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


class TestFunnel:
    STAGES = ["view", "click", "purchase"]

    def _oracle(self):
        return duckdb.sql(f"""
        WITH s0 AS (SELECT user_id, min(ts) a FROM '{EVENTS}'
                    WHERE event_type='view' GROUP BY user_id),
        s1 AS (SELECT e.user_id, min(e.ts) a FROM '{EVENTS}' e JOIN s0 USING (user_id)
               WHERE e.event_type='click' AND e.ts > s0.a GROUP BY e.user_id),
        s2 AS (SELECT e.user_id, min(e.ts) a FROM '{EVENTS}' e JOIN s1 USING (user_id)
               WHERE e.event_type='purchase' AND e.ts > s1.a GROUP BY e.user_id)
        SELECT stage, users FROM (VALUES
            ('view',(SELECT count(*) FROM s0)),
            ('click',(SELECT count(*) FROM s1)),
            ('purchase',(SELECT count(*) FROM s2))) t(stage, users)
        ORDER BY stage""").df()

    def test_matches_oracle(self):
        from geo_index_ray.pipelines import events as ev

        ds = ray.data.read_parquet(EVENTS)
        got = (
            ev.funnel_conversion(ds, self.STAGES)
            .to_pandas()
            .sort_values("stage")
            .reset_index(drop=True)
        )
        want = self._oracle()
        assert got["users"].tolist() == want["users"].tolist()
        assert got["stage"].tolist() == want["stage"].tolist()

    def test_strictly_after_semantics(self):
        """A user whose click precedes every view must not count as
        converted at the click stage."""
        from geo_index_ray.pipelines import events as ev

        t = pa.table(
            {
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
                "ts": pa.array([100, 200, 200, 100]).cast(pa.timestamp("us")),
                "event_type": pa.array(["view", "click", "view", "click"]),
            }
        )
        got = (
            ev.funnel_conversion(ray.data.from_arrow(t), ["view", "click"])
            .to_pandas()
            .set_index("stage")["users"]
        )
        assert got["view"] == 2
        assert got["click"] == 1  # user 2's click is before their view

    def test_partition_invariant(self):
        from geo_index_ray.pipelines import events as ev

        a = (
            ev.funnel_conversion(ray.data.read_parquet(EVENTS).repartition(1), self.STAGES)
            .to_pandas().sort_values("stage").reset_index(drop=True)
        )
        b = (
            ev.funnel_conversion(ray.data.read_parquet(EVENTS).repartition(7), self.STAGES)
            .to_pandas().sort_values("stage").reset_index(drop=True)
        )
        assert a.equals(b)


class TestCohortRetention:
    B = 86_400_000_000

    def test_matches_oracle(self):
        from geo_index_ray.pipelines import events as ev

        ds = ray.data.read_parquet(EVENTS)
        got = (
            ev.cohort_retention(ds, self.B)
            .to_pandas()
            .sort_values(["cohort_bucket", "bucket_offset"])
            .reset_index(drop=True)
        )
        want = duckdb.sql(f"""
        WITH pairs AS (SELECT DISTINCT user_id, epoch_us(ts)//{self.B} AS b FROM '{EVENTS}'),
        coh AS (SELECT user_id, min(b) AS cohort FROM pairs GROUP BY user_id)
        SELECT coh.cohort AS cohort_bucket, p.b - coh.cohort AS bucket_offset,
               count(*)::BIGINT AS users
        FROM pairs p JOIN coh USING (user_id) GROUP BY 1,2 ORDER BY 1,2""").df()
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_offset_zero_is_cohort_size(self):
        """Every cohort retains 100% of itself at offset 0."""
        from geo_index_ray.pipelines import events as ev

        got = ev.cohort_retention(ray.data.read_parquet(EVENTS), self.B).to_pandas()
        at0 = got[got.bucket_offset == 0].set_index("cohort_bucket")["users"]
        per_cohort_max = got.groupby("cohort_bucket")["users"].max()
        assert (at0 >= per_cohort_max.loc[at0.index]).all()

    def test_partition_invariant(self):
        from geo_index_ray.pipelines import events as ev

        a = (
            ev.cohort_retention(ray.data.read_parquet(EVENTS).repartition(1), self.B)
            .to_pandas().sort_values(["cohort_bucket", "bucket_offset"]).reset_index(drop=True)
        )
        b = (
            ev.cohort_retention(ray.data.read_parquet(EVENTS).repartition(7), self.B)
            .to_pandas().sort_values(["cohort_bucket", "bucket_offset"]).reset_index(drop=True)
        )
        assert a.equals(b)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestFuzzyEd1:
    def test_kernel_cases(self):
        from geo_index_ray.pipelines.dedup import _ed1_leq1

        a = pa.array(["abc", "abc", "abc", "abc", "ab", "ba", "", "a", "xabc"])
        b = pa.array(["abc", "abd", "abcd", "bc", "ba", "ab", "a", "", "abc"])
        dist = _ed1_leq1(a, b)
        #          eq   sub  ins  del  swap(2) swap rev ins del  prefix-ins
        assert dist.tolist() == [0, 1, 1, 1, 2, 2, 1, 1, 1]

    def test_exhaustive_small_alphabet(self):
        """All-pairs parity with a reference Levenshtein DP over random
        short strings on a 2-letter alphabet (dense ed-1 neighborhoods)."""
        from geo_index_ray.pipelines.dedup import fuzzy_ed1_pairs

        rng = np.random.default_rng(7)
        keys = list(
            {
                "".join(rng.choice(list("ab"), size=rng.integers(0, 7)))
                for _ in range(120)
            }
        )
        t = pa.table(
            {"doc_id": pa.array(range(len(keys)), pa.int64()),
             "text": pa.array(keys)}
        )
        got = (
            fuzzy_ed1_pairs(ray.data.from_arrow(t), "doc_id", prefix=16)
            .to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
        )
        want = sorted(
            (i, j, _lev(keys[i], keys[j]))
            for i in range(len(keys))
            for j in range(i + 1, len(keys))
            if _lev(keys[i], keys[j]) <= 1
        )
        assert list(map(tuple, got.to_numpy())) == want

    def test_matches_duckdb_on_docs(self):
        from geo_index_ray.pipelines.dedup import fuzzy_ed1_pairs

        ds = ray.data.read_parquet(DOCS)
        got = (
            fuzzy_ed1_pairs(ds, "doc_id", prefix=16)
            .to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
        )
        want = duckdb.sql(f"""
        WITH k AS (SELECT doc_id, substr(text,1,16) AS key FROM '{DOCS}')
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM k a JOIN k b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= 1 ORDER BY 1,2""").df()
        assert len(got) > 0  # the fixture corpus has real prefix dups
        assert got.equals(want.astype(got.dtypes.to_dict()))


class TestChunkWords:
    def _ref(self, texts, size, overlap):
        s = size - overlap
        rows = []
        for did, txt in texts:
            toks = txt.split(" ")
            for k in range((len(toks) - 1) // s + 1):
                sel = toks[k * s : k * s + size]
                rows.append((did, k, " ".join(sel), len(sel)))
        return pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk", "n_tok"])

    def test_edge_cases(self):
        from geo_index_ray.pipelines.text import chunk_words

        texts = [
            (1, ""),                      # empty -> one empty chunk
            (2, "solo"),                  # single word
            (3, "a b c d"),               # exact multiple of stride
            (4, "a b c d e"),             # remainder chunk
            (5, "w x y z q r s t u v"),   # several windows
        ]
        t = pa.table(
            {"doc_id": pa.array([d for d, _ in texts], pa.int64()),
             "text": pa.array([x for _, x in texts])}
        )
        got = (
            chunk_words(ray.data.from_arrow(t), 2, 0)
            .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        )
        want = self._ref(texts, 2, 0)
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_overlap_matches_reference_on_docs(self):
        import pyarrow.parquet as pq

        from geo_index_ray.pipelines.text import chunk_words

        tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
        got = (
            chunk_words(ray.data.read_parquet(DOCS), 32, 8)
            .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        )
        want = self._ref(
            list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())), 32, 8
        )
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_every_word_covered_once_per_window(self):
        """With overlap 0 the chunks concatenate back to the document."""
        from geo_index_ray.pipelines.text import chunk_words

        got = chunk_words(ray.data.read_parquet(DOCS), 16, 0).to_pandas()
        rebuilt = (
            got.sort_values(["doc_id", "chunk_id"])
            .groupby("doc_id")["chunk"]
            .agg(" ".join)
        )
        import pyarrow.parquet as pq

        orig = (
            pq.read_table(DOCS, columns=["doc_id", "text"])
            .to_pandas().set_index("doc_id")["text"]
        )
        assert (rebuilt == orig.loc[rebuilt.index]).all()


class TestNNSelfJoin:
    def test_matches_bruteforce_with_chunking(self):
        import duckdb

        from geo_index_ray.functions import geocode as g
        from geo_index_ray.pipelines import partition as pp
        from geo_index_ray.sources import tables

        pts = tables.points_ds(SF, "customer", "c_custkey")
        # chunk_rows=40 forces many driver chunks over 150 customers
        got = (
            pp.nn_self_join(pts, "c_custkey", chunk_rows=40)
            .sort_values("query_id").reset_index(drop=True)
        )
        want = duckdb.sql(f"""
        WITH pts AS (SELECT c_custkey AS id, {g.sql_lon('c_custkey')} AS x,
                            {g.sql_lat('c_custkey')} AS y
                     FROM '{SF}/customer.parquet'),
        dd AS (SELECT a.id qid, b.id tid,
                 (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) AS dist
               FROM pts a JOIN pts b ON a.id <> b.id)
        SELECT qid AS query_id, tid AS nn_id FROM (
          SELECT qid, tid,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, tid) rn
          FROM dd) WHERE rn = 1 ORDER BY query_id""").df()
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_duplicate_coordinates(self):
        """Points at identical coordinates: the nearest other is the
        dist-0 twin with the smallest id, through the inclusive-tie
        path."""
        import ray.data

        from geo_index_ray.pipelines import partition as pp

        t = pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "x": pa.array([0.0, 0.0, 5.0, 9.0]),
                "y": pa.array([0.0, 0.0, 5.0, 9.0]),
            }
        )
        got = (
            pp.nn_self_join(ray.data.from_arrow(t), "id", partition_size=2)
            .sort_values("query_id").reset_index(drop=True)
        )
        assert got["query_id"].tolist() == [1, 2, 3, 4]
        assert got["nn_id"].tolist() == [2, 1, 4, 3]


class TestFuzzyEd1Scale:
    def test_planted_mutations_found_exactly(self):
        """50k keys, every 10th a 1-char mutation of its predecessor:
        recall and precision are exact and nothing is quadratic."""
        from geo_index_ray.pipelines.dedup import fuzzy_ed1_pairs

        rng = np.random.default_rng(6)
        n = 50_000
        base = rng.integers(97, 123, size=(n, 12), dtype=np.uint8)
        mut = np.arange(9, n, 10)
        base[mut] = base[mut - 1]
        base[mut, 3] = 35
        keys = [bytes(r).decode() for r in base]
        t = pa.table(
            {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(keys)}
        )
        got = (
            fuzzy_ed1_pairs(ray.data.from_arrow(t).repartition(8), "doc_id", prefix=16)
            .to_pandas().sort_values("a_id").reset_index(drop=True)
        )
        # random 12-char keys over a 26-letter alphabet collide at ~26^-11:
        # the planted pairs are exactly the result set
        assert got["a_id"].tolist() == (mut - 1).tolist()
        assert got["b_id"].tolist() == mut.tolist()
        assert (got["dist"] == 1).all()
