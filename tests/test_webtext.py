"""Tests for the web-corpus curation operators (pipelines/webtext.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _docs_df(n=400, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 30)))
        for _ in range(n - 2)
    ]
    # degenerate docs that must trip the repetition gates
    texts.append("spam spam spam spam spam")
    texts.append("   ")
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"src{i % 6}" for i in range(n)],
            "text": texts,
        }
    )


class TestUrlKeepLatest:
    def test_matches_pandas_argmax(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df()
        ds = ray.data.from_pandas(df).repartition(5)
        pages = wt.derive_pages(ds, "doc_id", "source")
        pdf = pages.to_pandas()
        got = (
            wt.url_keep_latest(pages, "url", "warc_ts", "doc_id")
            .to_pandas()[["canon_url", "doc_id", "warc_ts"]]
            .sort_values("canon_url")
            .reset_index(drop=True)
        )
        canon = (
            pdf["url"]
            .str.lower()
            .str.replace(r"#.*$", "", regex=True)
            .str.replace(r"/$", "", regex=True)
        )
        want = (
            pdf.assign(canon_url=canon)
            .sort_values(["canon_url", "warc_ts", "doc_id"],
                         ascending=[True, False, True])
            .groupby("canon_url", as_index=False)
            .first()[["canon_url", "doc_id", "warc_ts"]]
            .sort_values("canon_url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_canonicalization_collapses_variants(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = pd.DataFrame(
            {
                "url": [
                    "https://A.example.com/x",
                    "https://a.example.com/x/",
                    "https://a.example.com/x#frag",
                ],
                "warc_ts": np.array([5, 9, 7], dtype=np.int64),
                "doc_id": np.array([1, 2, 3], dtype=np.int64),
            }
        )
        ds = ray.data.from_pandas(df)
        out = wt.url_keep_latest(ds, "url", "warc_ts", "doc_id").to_pandas()
        assert len(out) == 1
        assert out["doc_id"].iloc[0] == 2  # the latest capture wins


class TestHeavyHitters:
    def test_matches_counter(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df()
        ds = ray.data.from_pandas(df).repartition(6)
        got = wt.heavy_hitters(ds, "text", 4).to_pandas()
        toks = df["text"].str.lower().str.split(r"\s+", regex=True).explode()
        toks = toks[toks.astype(str).str.len() > 0]
        want = (
            toks.value_counts()
            .rename_axis("token")
            .reset_index(name="cnt")
            .sort_values(["cnt", "token"], ascending=[False, True])
            .head(4)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


class TestHeavyHitterBigrams:
    def test_matches_counter(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df(300)
        ds = ray.data.from_pandas(df).repartition(6)
        got = wt.heavy_hitter_bigrams(ds, "text", 5).to_pandas()
        from collections import Counter

        c = Counter()
        for t in df["text"]:
            toks = [x for x in t.lower().split() if x]
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        want = (
            pd.DataFrame(c.items(), columns=["bigram", "cnt"])
            .sort_values(["cnt", "bigram"], ascending=[False, True])
            .head(5)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_no_cross_document_bigrams(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = pd.DataFrame({"text": ["aa bb", "cc dd"]})
        got = wt.heavy_hitter_bigrams(
            ray.data.from_pandas(df), "text", 10
        ).to_pandas()
        assert set(got["bigram"]) == {"aa bb", "cc dd"}


class TestRepetitionStats:
    def test_gates_and_fractions(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df()
        ds = ray.data.from_pandas(df).repartition(4)
        out = (
            wt.repetition_stats(ds, "doc_id", "text")
            .to_pandas()
            .set_index("doc_id")
        )
        # the all-repeat doc: 5 words, 1 distinct → dup 0.8, top 1.0, drop
        spam = out.loc[len(df) - 2]
        assert spam["n_words"] == 5
        assert spam["dup_word_frac"] == pytest.approx(0.8)
        assert spam["top_word_frac"] == pytest.approx(1.0)
        assert not spam["keep"]
        # the whitespace-only doc: 0 words, dropped
        empty = out.loc[len(df) - 1]
        assert empty["n_words"] == 0 and not empty["keep"]
        # spot-check one ordinary doc against a python count
        words = df["text"].iloc[0].lower().split()
        row = out.loc[0]
        assert row["n_words"] == len(words)
        assert row["dup_word_frac"] == pytest.approx(
            1 - len(set(words)) / len(words)
        )


class TestSplitAssign:
    def test_deterministic_and_partition_invariant(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df()
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = (
            wt.split_assign(ray.data.from_pandas(df), "doc_id", w)
            .to_pandas()
            .sort_values("doc_id")["split"]
            .to_numpy()
        )
        b = (
            wt.split_assign(
                ray.data.from_pandas(df).repartition(9), "doc_id", w
            )
            .to_pandas()
            .sort_values("doc_id")["split"]
            .to_numpy()
        )
        assert (a == b).all()
        frac = (a == "train").mean()
        assert 0.7 < frac < 0.9  # roughly the requested weight

    def test_sql_case_matches(self):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df()
        w = {"train": 0.6, "val": 0.4}
        got = (
            wt.split_assign(ray.data.from_pandas(df), "doc_id", w)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        case = wt.sql_split_case("doc_id", w)
        want = (
            duckdb.connect()
            .execute(
                f"SELECT doc_id, source, text, {case} AS split FROM df "
                "ORDER BY doc_id"
            )
            .df()
        )
        assert (got["split"] == want["split"]).all()


class TestExtractText:
    def test_pages_generator_roundtrip_byte_identical(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt
        from geo_index_ray.sources import pages

        tbl = pages.make_pages_batch(0, 200, columns=["url", "html", "text"])
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = wt.extract_text(ds, "html", normalize_ws=False).to_pandas()
        assert (out["extracted_text"] == out["text"]).all()

    def test_entities_and_whitespace(self):
        import pyarrow as pa
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        html = [
            b"<p>a &amp; b</p>",
            b"<div>x &lt;tag&gt; &quot;q&quot; &#39;s&#39;</div>",
            b"<p>  spaced\n\tout  </p>",
            b"&amp;lt; stays one level</p>",
        ]
        ds = ray.data.from_arrow(
            pa.table({"html": pa.array(html, pa.binary())})
        )
        got = wt.extract_text(ds, "html").to_pandas()["extracted_text"].tolist()
        assert got == [
            "a & b",
            'x <tag> "q" \'s\'',
            "spaced out",
            "&lt; stays one level",
        ]

    def test_sql_twin_matches(self):
        import duckdb
        import pyarrow as pa
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        texts = ["plain words here", "a  double  space", " lead and trail "]
        html = [f"<html><body><p>{t}</p></body></html>" for t in texts]
        ds = ray.data.from_arrow(
            pa.table({"html": pa.array([h.encode() for h in html], pa.binary())})
        )
        got = wt.extract_text(ds, "html").to_pandas()["extracted_text"].tolist()
        df = pa.table({"h": pa.array(html)}).to_pandas()
        want = (
            duckdb.connect()
            .execute(f"SELECT {wt.sql_extract_text('h')} AS e FROM df")
            .df()["e"]
            .tolist()
        )
        assert got == want


class TestCurationPipeline:
    def test_matches_pandas_chain(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df(300)
        # plant exact duplicates that must dedup to the smallest id
        df.loc[10, "text"] = df.loc[4, "text"]
        df.loc[11, "text"] = df.loc[4, "text"]
        df["lang"] = ["en", "de"] * 150
        w = {"train": 0.8, "val": 0.2}
        ds = ray.data.from_pandas(df).repartition(6)
        got = (
            wt.curation_pipeline(ds, "doc_id", "text", "lang", w)
            .to_pandas()
            .sort_values(["split", "lang"])
            .reset_index(drop=True)
        )

        words = df["text"].str.lower().str.split(r"\s+", regex=True)
        words = words.apply(lambda ws: [x for x in ws if x])
        nw = words.apply(len)
        nd = words.apply(lambda ws: len(set(ws)))
        tt = words.apply(lambda ws: max((ws.count(x) for x in set(ws)), default=0))
        denom = nw.clip(lower=1)
        keep = (
            ((1 - nd / denom) <= 0.9)
            & ((tt / denom) <= 0.2)
            & (nw > 0)
        )
        kept = df[keep]
        surv = kept.loc[kept.groupby("text")["doc_id"].idxmin()]
        ids = surv["doc_id"].to_numpy().astype(np.int64).view(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        thr = np.uint64(min(int(0.8 * 2.0**64), 2**64 - 1))
        split = np.where(h < thr, "train", "val")
        want = (
            surv.assign(split=split)
            .groupby(["split", "lang"], as_index=False)
            .size()
            .rename(columns={"size": "n_docs"})
            .sort_values(["split", "lang"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["split", "lang", "n_docs"]], want, check_dtype=False
        )


class TestExtractTextProperties:
    def test_tagless_text_roundtrips_exactly(self):
        """Property: any text free of '<', '>' and '&' survives the
        envelope + raw extraction byte-identically (hypothesis)."""
        import pyarrow as pa
        import ray.data
        from hypothesis import given, settings, strategies as st

        from geo_index_ray.pipelines import webtext as wt

        plain = st.text(
            alphabet=st.characters(
                blacklist_characters="<>&",
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            max_size=120,
        )

        @settings(max_examples=20, deadline=None)
        @given(texts=st.lists(plain, min_size=1, max_size=8))
        def check(texts):
            html = [
                f"<html><body><p>{t}</p></body></html>".encode()
                for t in texts
            ]
            ds = ray.data.from_arrow(
                pa.table({"html": pa.array(html, pa.binary())})
            )
            got = (
                wt.extract_text(ds, "html", normalize_ws=False)
                .to_pandas()["extracted_text"]
                .tolist()
            )
            assert got == texts

        check()

    def test_derive_pages_partition_invariant(self):
        import pandas as pd
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df(120)
        a = (
            wt.derive_pages(ray.data.from_pandas(df), "doc_id", "source")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            wt.derive_pages(
                ray.data.from_pandas(df).repartition(11), "doc_id", "source"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestJsonFieldStats:
    def test_matches_pandas(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        rng = np.random.default_rng(3)
        n = 300
        keys = rng.choice(["a", "b", "c"], n)
        vals = rng.integers(-50, 100, n)
        props = [
            '{"k": %d}' % v if i % 17 else '{"other": 1}'
            for i, v in enumerate(vals)
        ]
        df = pd.DataFrame({"etype": keys, "props": props})
        ds = ray.data.from_pandas(df).repartition(5)
        got = (
            wt.json_field_stats(ds, "etype", "props", "k")
            .to_pandas()
            .sort_values("etype")
            .reset_index(drop=True)
        )
        sub = df[df.index % 17 != 0].assign(v=vals[df.index % 17 != 0])
        want = (
            sub.groupby("etype")["v"]
            .agg(n_vals="count", sum_val="sum", min_val="min", max_val="max")
            .reset_index()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestPiiScrub:
    def test_redacts_and_counts(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "text": [
                    "write to a.b-c%d@mail.example.co today",
                    "call +1 555 867-5309 or 020-555 1234 now",
                    "server at 10.0.0.1 and 192.168.255.254",
                    "no pii here at all",
                    "two mails x@y.io z@w.org one ip 8.8.8.8",
                ],
            }
        )
        ds = ray.data.from_pandas(df).repartition(2)
        got = (
            wt.pii_scrub(ds, "doc_id", "text")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.loc[0, "scrubbed"] == "write to <EMAIL> today"
        assert got.loc[0, "n_email"] == 1
        assert got.loc[1, "n_phone"] == 2
        assert "<PHONE>" in got.loc[1, "scrubbed"]
        assert got.loc[2, "n_ipv4"] == 2
        assert got.loc[2, "scrubbed"] == "server at <IP> and <IP>"
        assert got.loc[3, "scrubbed"] == "no pii here at all"
        assert (
            got.loc[3, ["n_email", "n_phone", "n_ipv4"]] == 0
        ).all()
        assert got.loc[4, "n_email"] == 2 and got.loc[4, "n_ipv4"] == 1

    def test_matches_duckdb_twin(self):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        rng = np.random.default_rng(11)
        frags = [
            "plain words", "u%d@ex%d.com", "1.2.3.4", "+44 123 4567",
            "dot.name+tag@sub.domain.org", "999.999.999.999",
        ]
        texts = [
            " ".join(
                (frags[j] % (i, j) if "%d" in frags[j] else frags[j])
                for j in rng.integers(0, len(frags), rng.integers(1, 6))
            )
            for i in range(200)
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(200, dtype=np.int64), "text": texts}
        )
        ds = ray.data.from_pandas(df).repartition(3)
        got = (
            wt.pii_scrub(ds, "doc_id", "text")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(wt.sql_pii_scrub("documents", "doc_id", "text"))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )


class TestDomainStats:
    def test_matches_pandas(self):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df(300)
        ds = ray.data.from_pandas(df).repartition(4)
        pages = wt.derive_pages(ds, "doc_id", "source")
        pdf = pages.to_pandas()
        got = wt.domain_stats(pages, "url", "warc_ts").to_pandas()
        host = (
            pdf["url"]
            .str.lower()
            .str.extract(r"^https?://([^/#]+)", expand=False)
        )
        want = (
            pdf.assign(host=host)
            .groupby("host")["warc_ts"]
            .agg(n_pages="count", first_ts="min", last_ts="max")
            .reset_index()
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_domain_stats_malformed_urls_grouped_as_empty(ray_session):
    """Non-http(s) / relative URLs must group under '' (SQL
    regexp_extract semantics), not crash the dictionary codes."""
    import numpy as np
    import pandas as pd
    import ray.data

    from geo_index_ray.pipelines.webtext import domain_stats

    df = pd.DataFrame(
        {
            "url": ["https://a.example/x", "ftp://weird/y", "not a url",
                    "https://a.example/z"],
            "ts": np.array([10, 20, 30, 40], dtype=np.int64),
        }
    )
    out = domain_stats(ray.data.from_pandas(df), "url", "ts").to_pandas()
    got = out.set_index("host")
    assert got.loc["a.example", "n_pages"] == 2
    assert got.loc["", "n_pages"] == 2
    assert got.loc["", "first_ts"] == 20 and got.loc["", "last_ts"] == 30


def test_url_hash64_large_string_offsets_match_string():
    """large_string offsets are int64 — hashing must agree with the
    plain-string path byte for byte (rkey_of routes every string shuffle
    through this)."""
    import numpy as np
    import pyarrow as pa

    from geo_index_ray.sources.pages import url_hash64
    from geo_index_ray.stages.util import rkey_of

    vals = ["http://a.example/x", "", "zz", "http://b.example/yyyy"] * 7
    small = pa.array(vals, pa.string())
    big = pa.array(vals, pa.large_string())
    np.testing.assert_array_equal(url_hash64(small), url_hash64(big))
    np.testing.assert_array_equal(rkey_of(small, 64), rkey_of(big, 64))
    # sliced large arrays too (nonzero arr.offset)
    np.testing.assert_array_equal(
        url_hash64(small.slice(3, 20)), url_hash64(big.slice(3, 20))
    )


class TestBigramNovelty:
    def test_matches_oracle(self, ray_session):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines.webtext import (
            bigram_novelty,
            sql_bigram_novelty,
        )

        d = "/root/testdata/sf0.001/documents.parquet"
        got = (
            bigram_novelty(ray.data.read_parquet(d), "doc_id", min_df=25)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = duckdb.sql(
            sql_bigram_novelty(f"'{d}'", "doc_id", 25) + " ORDER BY doc_id"
        ).df()
        assert got.equals(want.astype(got.dtypes.to_dict()))
        # the score discriminates: not all docs identical
        assert got["novelty"].nunique() > 10

    def test_edge_no_bigrams(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.webtext import bigram_novelty

        t = pa.table(
            {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": pa.array(["solo", "", "two words two words"])}
        )
        got = (
            bigram_novelty(ray.data.from_arrow(t), "doc_id", min_df=1)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert got["n_bigrams"].tolist() == [0, 0, 3]
        assert got["novelty"].isna().tolist() == [True, True, False]
        # min_df=1: every bigram is common -> novelty 0 for doc 3
        assert got.loc[2, "novelty"] == 0.0

    def test_partition_invariant(self, ray_session):
        import ray.data

        from geo_index_ray.pipelines.webtext import bigram_novelty

        d = "/root/testdata/sf0.001/documents.parquet"
        a = (
            bigram_novelty(ray.data.read_parquet(d).repartition(1), "doc_id", min_df=25)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            bigram_novelty(ray.data.read_parquet(d).repartition(7), "doc_id", min_df=25)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert a.equals(b)


class TestContamination:
    def _run(self, corpus_texts, bench_texts, n=3):
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        cdf = pd.DataFrame(
            {"doc_id": np.arange(len(corpus_texts), dtype=np.int64),
             "text": corpus_texts}
        )
        bdf = pd.DataFrame(
            {"doc_id": np.arange(len(bench_texts), dtype=np.int64) + 1000,
             "text": bench_texts}
        )
        cds = ray.data.from_pandas(cdf).repartition(3)
        bds = ray.data.from_pandas(bdf).repartition(2)
        out = (
            wt.contamination_flags(cds, bds, "doc_id", n=n)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return out

    def test_flags_shared_ngram(self):
        out = self._run(
            ["the quick brown fox jumps", "a totally clean document here"],
            ["somewhere the quick brown fox ran"],
            n=3,
        )
        assert out.loc[0, "contaminated"] == 1
        assert out.loc[0, "n_hits"] >= 1
        assert out.loc[1, "contaminated"] == 0
        assert out.loc[1, "n_hits"] == 0
        # n_ngrams = tokens - n + 1
        assert out.loc[0, "n_ngrams"] == 3
        assert out.loc[1, "n_ngrams"] == 3

    def test_short_docs_and_empty_bench(self):
        out = self._run(["one two", "   ", "x"], ["unrelated text body"], n=3)
        assert (out["n_ngrams"] == 0).all()
        assert (out["contaminated"] == 0).all()
        # bench with nothing long enough -> empty set, nothing flagged
        out2 = self._run(["alpha beta gamma delta"], ["tiny"], n=3)
        assert out2.loc[0, "contaminated"] == 0

    def test_case_and_occurrence_counting(self):
        # lowercased matching; every occurrence counts
        out = self._run(
            ["A B C x a b c"], ["a b c"], n=3,
        )
        assert out.loc[0, "n_hits"] == 2
        assert out.loc[0, "n_ngrams"] == 5

    def test_matches_oracle(self):
        import duckdb
        import ray.data

        from geo_index_ray.pipelines import webtext as wt

        df = _docs_df(n=300, seed=11)[["doc_id", "text"]]
        ds = ray.data.from_pandas(df).repartition(4)

        def is_bench(batch):
            ids = batch["doc_id"].to_numpy()
            return batch.filter(pa.array(ids % 13 == 0))

        bench = ds.map_batches(is_bench, batch_format="pyarrow")
        mine = (
            wt.contamination_flags(ds, bench, "doc_id", n=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        ora = (
            con.execute(
                wt.sql_contamination("documents", "doc_id", 4,
                                     "doc_id % 13 = 0")
            )
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            mine[["doc_id", "n_ngrams", "n_hits", "contaminated"]],
            ora[["doc_id", "n_ngrams", "n_hits", "contaminated"]],
        )


class TestWordNgramsHelper:
    def test_n2_equals_bigrams(self):
        from geo_index_ray.pipelines import webtext as wt

        batch = pa.table(
            {"text": pa.array(["a b  c", "", "solo", "x y z w"])}
        )
        r2, g2 = wt._batch_word_ngrams(batch, "text", 2)
        rb, gb = wt._batch_bigrams(batch, "text")
        assert r2.tolist() == rb.tolist()
        assert g2.to_pylist() == gb.to_pylist()
        assert g2.to_pylist() == ["a b", "b c", "x y", "y z", "z w"]

    def test_n_larger_than_doc(self):
        from geo_index_ray.pipelines import webtext as wt

        batch = pa.table({"text": pa.array(["a b c"])})
        r, g = wt._batch_word_ngrams(batch, "text", 5)
        assert len(g) == 0 and len(r) == 0
        r3, g3 = wt._batch_word_ngrams(batch, "text", 3)
        assert g3.to_pylist() == ["a b c"] and r3.tolist() == [0]


class TestWeightedSample:
    def _ds(self, n=500, w=None, parts=4):
        import ray.data

        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
        df["weight"] = np.full(n, 0.5) if w is None else w
        return ray.data.from_pandas(df).repartition(parts)

    def test_boundary_weights(self):
        from geo_index_ray.pipelines import webtext as wt

        n = 400
        keep_all = wt.weighted_sample(
            self._ds(n, np.ones(n)), "doc_id", "weight"
        ).count()
        keep_none = wt.weighted_sample(
            self._ds(n, np.zeros(n)), "doc_id", "weight"
        ).count()
        assert keep_all == n  # hash_unit < 1.0 always
        assert keep_none == 0

    def test_deterministic_under_partitioning(self):
        from geo_index_ray.pipelines import webtext as wt

        rng = np.random.default_rng(3)
        w = rng.uniform(0, 1, 600)
        a = wt.weighted_sample(self._ds(600, w, parts=2), "doc_id", "weight")
        b = wt.weighted_sample(self._ds(600, w, parts=11), "doc_id", "weight")
        ai = sorted(a.to_pandas()["doc_id"])
        bi = sorted(b.to_pandas()["doc_id"])
        assert ai == bi
        # acceptance rate tracks mean weight (golden-ratio hash is
        # equidistributed; 600 draws, generous tolerance)
        assert abs(len(ai) / 600 - w.mean()) < 0.12

    def test_matches_sql_predicate(self):
        import duckdb

        from geo_index_ray.pipelines import webtext as wt

        rng = np.random.default_rng(5)
        w = rng.uniform(0, 1, 300)
        df = pd.DataFrame(
            {"doc_id": np.arange(300, dtype=np.int64), "weight": w}
        )
        mine = sorted(
            wt.weighted_sample(self._ds(300, w), "doc_id", "weight")
            .to_pandas()["doc_id"]
        )
        con = duckdb.connect()
        con.register("t", df)
        ora = sorted(
            con.execute(
                f"SELECT doc_id FROM t WHERE {wt.sql_hash_unit('doc_id')} < weight"
            ).fetchdf()["doc_id"]
        )
        assert mine == ora


class TestTokenBudgetMix:
    def test_matches_hash_rule_and_caps_tokens(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.webtext import _GOLDEN, token_budget_mix

        rng = np.random.default_rng(3)
        n = 1_000
        ids = np.arange(n, dtype=np.int64)
        grp = np.array([f"s{g}" for g in rng.integers(0, 4, n)], object)
        tok = rng.integers(1, 50, n).astype(np.int64)
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "source": pa.array(grp.tolist()),
                    "n_tokens": pa.array(tok),
                }
            )
        ).repartition(5)
        budget = 2_000
        got = (
            token_budget_mix(ds, "doc_id", "source", "n_tokens", budget)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        df = pd.DataFrame({"doc_id": ids, "source": grp, "n_tokens": tok})
        tot = df.groupby("source")["n_tokens"].transform("sum").to_numpy()
        rate = np.minimum(1.0, budget / tot.astype(np.float64))
        with np.errstate(over="ignore"):
            u = (ids.view(np.uint64) * _GOLDEN).astype(np.float64) / 2.0**64
        want = df[u < rate].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        # sampled groups land near budget; whole groups stay whole
        kept = got.groupby("source")["n_tokens"].sum()
        full = df.groupby("source")["n_tokens"].sum()
        for s in full.index:
            if full[s] <= budget:
                assert kept.get(s, 0) == full[s]
            else:
                assert kept.get(s, 0) < full[s]


class TestUpsampleRepeat:
    def test_repeats_rows_with_epoch_ordinals(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.webtext import upsample_repeat

        ids = np.array([10, 20, 30, 40], np.int64)
        eps = np.array([1, 3, 0, 2], np.int64)
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids), "epochs": pa.array(eps)})
        ).repartition(2)
        got = (
            upsample_repeat(ds, "doc_id", "epochs")
            .to_pandas()
            .sort_values(["doc_id", "epoch"])
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            [(10, 0), (20, 0), (20, 1), (20, 2), (40, 0), (40, 1)],
            columns=["doc_id", "epoch"],
        ).astype(np.int64)
        pd.testing.assert_frame_equal(got, want)


class TestExtractOutlinks:
    def test_extracts_all_links_in_order(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.webtext import extract_outlinks

        html = [
            '<a href="https://a.com/1">x</a><p><a href="https://b.com/2">y</a>',
            "no links here",
            '<a href="https://c.com/3">z</a>',
            '<a href="broken-no-close',  # unterminated: drops
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "html": pa.array(html),
                }
            )
        ).repartition(2)
        got = (
            extract_outlinks(ds, "doc_id", "html")
            .to_pandas()
            .sort_values(["doc_id", "href"])
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            {
                "doc_id": np.array([1, 1, 3], np.int64),
                "href": ["https://a.com/1", "https://b.com/2",
                         "https://c.com/3"],
            }
        )
        pd.testing.assert_frame_equal(got, want)


class TestGroupVocabJaccard:
    def test_matches_bruteforce_sets(self, ray_session):
        import ray.data as rd

        from geo_index_ray.pipelines.webtext import group_vocab_jaccard

        rng = np.random.default_rng(43)
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        for i in range(200):
            src = f"s{i % 4}"
            words = rng.choice(vocab, size=rng.integers(3, 9))
            rows.append((i, src, " ".join(words.tolist())))
        df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
        got = (
            group_vocab_jaccard(ds, "source")
            .to_pandas()
            .sort_values(["a_source", "b_source"])
            .reset_index(drop=True)
        )
        sets = {
            s: set(" ".join(sub["text"]).split())
            for s, sub in df.groupby("source")
        }
        names = sorted(sets)
        want_rows = []
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                c = len(sets[a] & sets[b])
                if c:
                    want_rows.append(
                        (a, b, c, c / len(sets[a] | sets[b]))
                    )
        want = pd.DataFrame(
            want_rows,
            columns=["a_source", "b_source", "n_common", "jaccard"],
        )
        pd.testing.assert_frame_equal(got, want)
