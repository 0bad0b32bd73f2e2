"""Common-Crawl-style web-corpus curation operators.

The north rule's input is a pages table ``(url, warc_ts, html, text,
lang)``; these operators cover the curation steps a crawl corpus needs
before the spatial / dedup stages:

- ``url_keep_latest`` — snapshot dedup: canonicalize the URL and keep
  the most recent capture per canonical URL (CC index semantics).
- ``heavy_hitters`` — corpus-wide top-k tokens via per-batch partial
  counts; only (token, partial_count) rows shuffle, never tokens per
  occurrence.
- ``repetition_stats`` — Gopher-style per-document repetition filters
  (duplicate-word fraction, top-word fraction) used as quality gates.
- ``split_assign`` — deterministic train/val/test assignment from a
  row-pure hash; reproducible under any partitioning or retry.
- ``json_field_stats`` — extract a numeric field from a semi-structured
  string column (regexp, all-Arrow) and aggregate per key.
- ``extract_text`` — deterministic HTML→text extraction discharging the
  input_hint's byte-identical-extracted-text invariant.
- ``curation_pipeline`` — the composed flow (quality gate → exact dedup
  → split → per-(split, lang) counts) in one corpus-sized exchange.

Every operator has a DuckDB oracle twin (see ``__ray_entry__``).
Reference scope note: the reference (kylebarron/geo-index) is an index
library with no corpus operators; these belong to the engine-added
curation layer audited in SURVEY.md §2.4/§2.5.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _string_views

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# -- deterministic page derivation (north-rule input shape) ------------------

_TS_MIX = 2654435761  # Knuth multiplicative constant, fits int64 at any sf


def derive_pages(ds, id_col: str, source_col: str):
    """Derive the north-rule page columns ``(url, warc_ts)``
    deterministically from a document row (same contract as the
    geometry derivation: a pure, SQL-reproducible function of the row).

    ``url`` collides across documents (``id % 211`` path slots per
    source) and carries canonicalization noise — an uppercase variant
    every 5th id, a trailing slash every 7th, a fragment every 3rd — so
    ``url_keep_latest`` has real work to do.  ``warc_ts`` is a
    pseudo-shuffled capture time in seconds.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        base = pc.binary_join_element_wise(
            pa.array(["https://"] * len(ids)),
            batch[source_col],
            pa.array([".example.com/p/"] * len(ids)),
            pc.cast(pa.array(ids % 211), pa.string()),
            pa.array(np.where(ids % 7 == 0, "/", "").tolist()),
            pa.array(np.where(ids % 3 == 0, "#frag", "").tolist()),
            "",
        )
        url = pc.if_else(
            pa.array(ids % 5 == 0), pc.utf8_upper(base), base
        )
        warc_ts = (ids * _TS_MIX) % 86400
        return pa.table(
            {
                id_col: batch[id_col],
                "url": url,
                "warc_ts": pa.array(warc_ts),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_derive_pages(table: str, id_col: str, source_col: str) -> str:
    """DuckDB CTE body reproducing ``derive_pages`` bit-exactly."""
    return f"""
        SELECT {id_col},
               CASE WHEN {id_col} % 5 = 0 THEN upper(u) ELSE u END AS url,
               ({id_col} * {_TS_MIX}) % 86400 AS warc_ts
        FROM (
          SELECT {id_col},
                 'https://' || {source_col} || '.example.com/p/' ||
                 CAST({id_col} % 211 AS VARCHAR) ||
                 CASE WHEN {id_col} % 7 = 0 THEN '/' ELSE '' END ||
                 CASE WHEN {id_col} % 3 = 0 THEN '#frag' ELSE '' END AS u
          FROM {table})
    """


# -- URL snapshot dedup ------------------------------------------------------

_URL_STRIP_RE = r"#.*$"  # fragment; applied after lowercasing


def canonical_url(col):
    """Lowercase, strip the ``#fragment``, strip one trailing slash —
    the (deliberately SQL-reproducible) canonicalization used by
    ``url_keep_latest``."""
    low = pc.utf8_lower(col)
    nofrag = pc.replace_substring_regex(low, _URL_STRIP_RE, "")
    return pc.replace_substring_regex(nofrag, r"/$", "")


def url_keep_latest(ds, url_col: str, ts_col: str, id_col: str):
    """One row per canonical URL: the latest capture, ties broken by the
    smallest id (CC-index "keep newest snapshot" semantics).

    Two-phase argmax: a per-batch pass keeps one candidate row per
    (canonical URL, block) — so the exchange carries at most one row per
    URL per input block — then the survivors shuffle under COARSE keys
    (``hash(url) % reducer_count``) and each reducer re-runs the argmax
    for all of its URLs in one lexsort (one Python call per reducer, not
    per URL — rule 3 of SCALING.md).  Nothing document-sized beyond the
    surviving rows moves.
    """
    from ..sources.pages import url_hash64
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def local_best(batch: pa.Table) -> pa.Table:
        canon = canonical_url(batch[url_col])
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        batch = batch.append_column("canon_url", canon)
        codes = pc.dictionary_encode(canon).indices.to_numpy(
            zero_copy_only=False
        )
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        perm = np.lexsort((ids, -ts, codes))
        ck = codes[perm]
        first = np.searchsorted(ck, ck, side="left")
        keep = np.arange(len(ck)) == first
        out = batch.take(pa.array(perm[keep]))
        h = url_hash64(out["canon_url"])
        return out.append_column(
            "rkey", pa.array(((h >> np.uint64(3)) % np.uint64(R)).astype(np.int64))
        )

    survivors = coalesce_for_shuffle(
        ds.map_batches(local_best, batch_format="pyarrow"), 0.5
    )

    def final_many(g: pa.Table) -> pa.Table:
        # one lexsort over ALL the reducer's URLs; group by the 64-bit
        # url hash (same accepted collision tradeoff as exact_dedup)
        h = url_hash64(g["canon_url"]).view(np.int64)
        ts = g[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        perm = np.lexsort((ids, -ts, h))
        hs = h[perm]
        first = np.searchsorted(hs, hs, side="left")
        keep = np.arange(len(hs)) == first
        return g.take(pa.array(perm[keep])).drop_columns(["rkey"])

    return survivors.groupby("rkey").map_groups(
        final_many, batch_format="pyarrow"
    )


# -- corpus heavy hitters ----------------------------------------------------


def heavy_hitters(ds, text_col: str, k: int):
    """Corpus-wide top-k tokens by total occurrence count (ties by token
    ascending), lowercased, whitespace-tokenized.

    Per-batch combiner: one dictionary-encode + bincount per block emits
    (token, partial count) rows, so the groupby exchange is bounded by
    the block vocabulary, not token occurrences.  The final top-k is a
    sort+limit over vocabulary-sized rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(
            pc.utf8_lower(batch[text_col]), r"\s+"
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        wlens, _, _ = _string_views(flat)
        dic = pc.dictionary_encode(flat.filter(pa.array(wlens > 0)))
        codes = dic.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(dic.dictionary))
        return pa.table(
            {"token": dic.dictionary, "cnt": pa.array(cnt.astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    totals = partials.groupby("token").sum("cnt").rename_columns(
        {"sum(cnt)": "cnt"}
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        # counts are final after the groupby, so the global top-k is a
        # subset of each block's top-k — the final sort sees ~k rows per
        # block instead of the whole vocabulary.  Keep ALL rows tied at
        # the k-th count: the (cnt DESC, token ASC) tie-break belongs to
        # the final sort, and dropping a tied token here could drop the
        # global winner.
        cnt = batch["cnt"].to_numpy()
        if len(cnt) <= k:
            return batch
        kth = -np.partition(-cnt, k - 1)[k - 1]
        return batch.filter(pa.array(cnt >= kth))

    pruned = totals.map_batches(block_topk, batch_format="pyarrow")
    return pruned.sort(["cnt", "token"], descending=[True, False]).limit(k)


def _batch_word_ngrams(batch: pa.Table, text_col: str, n: int):
    """(doc_row int64, ngram string array) for one batch — lowercased
    whitespace tokens with empties removed, runs of ``n`` consecutive
    same-doc tokens joined with spaces.  Adjacency is computed on the
    flattened token buffer (``n`` zero-copy slices + one join kernel —
    no per-row Python)."""
    words = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    wlens, _, _ = _string_views(flat)
    nonempty = wlens > 0
    f = flat.filter(pa.array(nonempty))
    p = parents[nonempty]
    if len(f) < n:
        return np.empty(0, np.int64), pa.array([], pa.string())
    m = len(f) - n + 1
    # a window of n tokens stays inside one doc iff its first and last
    # token share a parent (parents are non-decreasing)
    inside = p[n - 1:] == p[:m]
    ngrams = pc.binary_join_element_wise(
        *(f.slice(i, m) for i in range(n)), " "
    ).filter(pa.array(inside))
    return p[:m][inside].astype(np.int64), ngrams


def _batch_bigrams(batch: pa.Table, text_col: str):
    """(doc_row, bigram) — the n=2 word-ngram case."""
    return _batch_word_ngrams(batch, text_col, 2)


def heavy_hitter_bigrams(ds, text_col: str, k: int):
    """Corpus-wide top-k word BIGRAMS ("tok1 tok2", lowercased; empty
    tokens removed before pairing) — the n-gram analog of
    ``heavy_hitters``, the shape contamination / boilerplate checks use.

    Per-batch combiner (``_batch_bigrams``): only (bigram, partial count)
    rows shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        _, bigrams = _batch_bigrams(batch, text_col)
        if len(bigrams) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        dic = pc.dictionary_encode(bigrams)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(dic.dictionary))
        return pa.table(
            {"bigram": dic.dictionary, "cnt": pa.array(cnt.astype(np.int64))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    totals = partials.groupby("bigram").sum("cnt").rename_columns(
        {"sum(cnt)": "cnt"}
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        cnt = batch["cnt"].to_numpy()
        if len(cnt) <= k:
            return batch
        kth = -np.partition(-cnt, k - 1)[k - 1]
        return batch.filter(pa.array(cnt >= kth))

    pruned = totals.map_batches(block_topk, batch_format="pyarrow")
    return pruned.sort(["cnt", "bigram"], descending=[True, False]).limit(k)


# -- Gopher-style repetition quality gates -----------------------------------


def _repetition_arrays(batch: pa.Table, text_col: str,
                       max_dup_frac: float, max_top_frac: float):
    """(n_words, dup_word_frac, top_word_frac, keep) numpy arrays for one
    batch — all-Arrow tokenization plus one composite np.unique."""
    n = batch.num_rows
    words = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    wlens, _, _ = _string_views(flat)
    nonempty = wlens > 0
    rows = parents[nonempty]
    dic = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = max(len(dic.dictionary), 1)
    pair, tf = np.unique(rows * vocab + codes, return_counts=True)
    prow = (pair // vocab).astype(np.int64)
    n_words = np.bincount(rows, minlength=n).astype(np.int64)
    n_distinct = np.bincount(prow, minlength=n).astype(np.int64)
    top_tf = np.zeros(n, dtype=np.int64)
    np.maximum.at(top_tf, prow, tf)
    denom = np.maximum(n_words, 1).astype(np.float64)
    dup = 1.0 - n_distinct / denom
    top = top_tf / denom
    keep = (dup <= max_dup_frac) & (top <= max_top_frac) & (n_words > 0)
    return n_words, dup, top, keep


def repetition_stats(ds, id_col: str, text_col: str,
                     max_dup_frac: float = 0.9,
                     max_top_frac: float = 0.2):
    """Per-document repetition metrics and a keep/drop verdict.

    Emits ``(id, n_words, dup_word_frac, top_word_frac, keep)`` where
    ``dup_word_frac = 1 - distinct_words / words`` and ``top_word_frac``
    is the most frequent word's share — the word-level analog of
    Gopher's duplicate-line / top-n-gram fractions (Rae et al. 2021),
    which degenerate to these on single-line documents.  Pure per-batch
    map, no shuffle; all-Arrow tokenization plus one composite
    np.unique per batch (no per-row Python).
    """

    def fn(batch: pa.Table) -> pa.Table:
        n_words, dup, top, keep = _repetition_arrays(
            batch, text_col, max_dup_frac, max_top_frac
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "dup_word_frac": pa.array(dup),
                "top_word_frac": pa.array(top),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# -- deterministic split assignment ------------------------------------------


def split_assign(ds, id_col: str, weights: dict[str, float]):
    """Assign each row to a named split by a pure hash of its id.

    ``bucket = (id * golden64 mod 2^64) / 2^64`` falls into cumulative
    weight ranges, in the given dict order.  Reproducible under any
    partitioning, retry, or cluster size; no shuffle.  The SQL twin uses
    the identical HUGEINT arithmetic (``sql_split_case``).
    """
    names = list(weights)
    edges = np.cumsum([weights[s] for s in names], dtype=np.float64)
    edges = edges / edges[-1]
    thresholds = np.array(
        [min(int(e * 2.0**64), 2**64 - 1) for e in edges], dtype=np.uint64
    )

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * _GOLDEN
        idx = np.searchsorted(thresholds, h, side="right")
        idx = np.minimum(idx, len(names) - 1)
        split = np.array(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split.tolist()))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(ds, id_col: str, weight_col: str):
    """Deterministic weighted acceptance sampling (the DSIR-style quality
    resample: keep high-quality docs with probability ∝ a per-row
    weight, reproducibly).  A row survives iff
    ``hash_unit(id) < weight``, where ``hash_unit`` maps the id through
    the split_assign golden-ratio hash onto [0, 1) — so acceptance is a
    pure function of (id, weight): stable under any partitioning, retry,
    cluster size, or execution order, and a re-run resumes to the exact
    same subset (the property random() sampling can't give a 100 TB
    pipeline).  Weights are taken as-is; values ≥ 1 always survive
    (upsampling by repetition is a caller-side repeat, not done here).
    Map-only — no shuffle, nothing collected.

    SQL twin predicate: :func:`sql_hash_unit` ``< weight`` (identical
    HUGEINT→DOUBLE arithmetic; uint64→float64 rounds to nearest in both
    numpy and DuckDB).
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * _GOLDEN
        u = h.astype(np.float64) / 2.0**64
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.filter(pa.array(u < w))

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_hash_unit(id_col: str) -> str:
    """DuckDB expression mirroring ``weighted_sample``'s hash_unit(id)
    bit-exactly: golden-ratio multiply mod 2^64, then one uint64→double
    round-to-nearest and one IEEE divide."""
    return (
        f"(CAST((CAST({id_col} AS HUGEINT) * 11400714819323198485)"
        f" % 18446744073709551616 AS DOUBLE) / 18446744073709551616.0)"
    )


def sql_split_case(id_col: str, weights: dict[str, float]) -> str:
    """DuckDB CASE expression mirroring ``split_assign`` bit-exactly."""
    names = list(weights)
    edges = np.cumsum([weights[s] for s in names], dtype=np.float64)
    edges = edges / edges[-1]
    thresholds = [min(int(e * 2.0**64), 2**64 - 1) for e in edges]
    h = (
        f"((CAST({id_col} AS HUGEINT) * 11400714819323198485)"
        f" % 18446744073709551616)"
    )
    clauses = " ".join(
        f"WHEN {h} < {t} THEN '{s}'"
        for s, t in zip(names[:-1], thresholds[:-1])
    )
    return f"CASE {clauses} ELSE '{names[-1]}' END"


# -- HTML → text extraction --------------------------------------------------

# entity decode order matters: &amp; LAST, so "&amp;lt;" → "&lt;" (one level)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]


def extract_text(ds, html_col: str, out_col: str = "extracted_text",
                 normalize_ws: bool = True):
    """Deterministic HTML → text extraction over a binary column.

    The north-rule invariant is *byte-identical extracted text per url*,
    so the transform is a fixed, SQL-reproducible chain — strip tags
    (``<[^>]*>``), decode the five basic entities (``&amp;`` last) —
    never a heuristic readability pass.  With ``normalize_ws`` (the
    quality-pipeline default) whitespace runs collapse to single spaces
    and the result is trimmed; the invariant check runs with
    ``normalize_ws=False`` so the chain exactly inverts the page
    envelope whatever whitespace the source text carries.  All-Arrow
    (RE2 kernels over the utf8 view of the binary buffer); no per-row
    Python.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[html_col], pa.string())
        s = pc.replace_substring_regex(s, r"<[^>]*>", "")
        for ent, ch in _ENTITIES:
            s = pc.replace_substring(s, ent, ch)
        if normalize_ws:
            s = pc.replace_substring_regex(s, r"\s+", " ")
            s = pc.utf8_trim_whitespace(s)
        return batch.append_column(out_col, s)

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_extract_text(expr: str, normalize_ws: bool = True) -> str:
    """DuckDB expression reproducing ``extract_text`` byte-exactly over a
    VARCHAR html expression."""
    s = f"regexp_replace({expr}, '<[^>]*>', '', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    if normalize_ws:
        s = f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
    return s


# -- end-to-end curation pipeline --------------------------------------------


def curation_pipeline(ds, id_col: str, text_col: str, lang_col: str,
                      weights: dict[str, float],
                      max_dup_frac: float = 0.9,
                      max_top_frac: float = 0.2):
    """The composed corpus-curation flow a training run starts from:

    quality gates → exact dedup (keep min id per text) → deterministic
    split assignment → (split, lang) document counts.

    Scale shape: the quality gate is a pure per-batch filter, so
    dropped rows never shuffle; the dedup exchange carries
    (rkey, hash64, id, lang) = 24 B + lang per surviving row under
    coarse reducer keys; split assignment is a pure row hash; the final
    count groupby sees one combined row per (split, lang, block).  One
    corpus-sized exchange total.
    """
    import pandas as pd

    from ..stages.util import coalesce_for_shuffle, reducer_count
    from .dedup import _text_hash64

    R = reducer_count()

    def gate_and_hash(batch: pa.Table) -> pa.Table:
        _, _, _, keep = _repetition_arrays(
            batch, text_col, max_dup_frac, max_top_frac
        )
        kept = batch.filter(pa.array(keep))
        h = _text_hash64(kept[text_col])
        return pa.table(
            {
                "rkey": pa.array(
                    ((h >> np.uint64(3)) % np.uint64(R)).astype(np.int64)
                ),
                "h": pa.array(h.view(np.int64)),
                id_col: kept[id_col],
                lang_col: kept[lang_col],
            }
        )

    hashed = coalesce_for_shuffle(
        ds.map_batches(gate_and_hash, batch_format="pyarrow"), 0.5
    )

    def first_per_hash(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, h))
        hs = h[order]
        keep = np.r_[True, hs[1:] != hs[:-1]]
        idx = pa.array(order[keep])
        return pa.table(
            {id_col: g[id_col].take(idx), lang_col: g[lang_col].take(idx)}
        )

    survivors = hashed.groupby("rkey").map_groups(
        first_per_hash, batch_format="pyarrow"
    )

    assigned = split_assign(survivors, id_col, weights)

    def count_partial(batch: pa.Table) -> pa.Table:
        out = (
            batch.select(["split", lang_col])
            .group_by(["split", lang_col])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["split", lang_col, "n_docs"])

    partials = assigned.map_batches(count_partial, batch_format="pyarrow")
    return (
        partials.groupby(["split", lang_col])
        .sum("n_docs")
        .rename_columns({"sum(n_docs)": "n_docs"})
    )


# -- semi-structured field extraction ----------------------------------------


def json_field_stats(ds, key_col: str, json_col: str, field: str):
    """Extract integer ``field`` from a JSON-ish string column with one
    vectorized regexp per batch, then aggregate (count, sum, min, max)
    per key.  A per-batch combiner pre-aggregates so the groupby sees
    one row per (key, block)."""
    pat = f'"{field}"\\s*:\\s*(?P<v>-?\\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch[json_col], pat)
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        ok = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        nk = len(dic.dictionary)
        cnt = np.bincount(codes, weights=ok, minlength=nk).astype(np.int64)
        # sums accumulate in int64 via add.at — a float64 bincount
        # weights pass would lose low bits above 2^53 before the exact
        # merge ever sees them (the merge already does this correctly)
        s = np.zeros(nk, dtype=np.int64)
        np.add.at(s, codes, v.astype(np.int64) * ok)
        mn = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(nk, np.iinfo(np.int64).min, dtype=np.int64)
        okc = codes[ok]
        np.minimum.at(mn, okc, v[ok])
        np.maximum.at(mx, okc, v[ok])
        return pa.table(
            {
                key_col: dic.dictionary,
                "cnt": pa.array(cnt),
                "s": pa.array(s),
                "mn": pa.array(mn),
                "mx": pa.array(mx),
            }
        )

    from ..sources.pages import url_hash64
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def partial_with_rkey(batch: pa.Table) -> pa.Table:
        out = partial(batch)
        h = url_hash64(out[key_col])
        return out.append_column(
            "rkey", pa.array((h % np.uint64(R)).astype(np.int64))
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial_with_rkey, batch_format="pyarrow"), 0.25
    )

    # coarse-key merge: one shuffle on hash(key) % R, then ALL of a
    # reducer's keys aggregate in one vectorized pass (rule 3 — never one
    # interpreter call per key; key cardinality can be 10^5+).  Keys with
    # zero extracted values emit SQL aggregate NULLs (SUM/MIN/MAX over
    # all-NULL), matching the DuckDB oracle — not int64 sentinels.
    def final_many(g: pa.Table) -> pa.Table:
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        nk = len(dic.dictionary)
        cnt = np.zeros(nk, dtype=np.int64)
        s = np.zeros(nk, dtype=np.int64)
        mn = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(nk, np.iinfo(np.int64).min, dtype=np.int64)
        # int64 accumulation via add.at (bincount weights would round-trip
        # through float64 and corrupt sums above 2^53)
        np.add.at(cnt, codes, g["cnt"].to_numpy(zero_copy_only=False))
        np.add.at(s, codes, g["s"].to_numpy(zero_copy_only=False))
        np.minimum.at(mn, codes, g["mn"].to_numpy(zero_copy_only=False))
        np.maximum.at(mx, codes, g["mx"].to_numpy(zero_copy_only=False))
        empty = cnt == 0
        return pa.table(
            {
                key_col: dic.dictionary,
                "n_vals": pa.array(cnt),
                "sum_val": pa.array(s, mask=empty),
                "min_val": pa.array(mn, mask=empty),
                "max_val": pa.array(mx, mask=empty),
            }
        )

    return partials.groupby("rkey").map_groups(final_many, batch_format="pyarrow")


# -- PII scrubbing -----------------------------------------------------------

# Order matters: each pattern counts and replaces over the text as left
# by the previous one, and the SQL twin nests regexp_replace in the same
# order.  Arrow's string kernels and DuckDB both run RE2, so a shared
# pattern string behaves identically on both sides.
_PII_PATTERNS = [
    ("n_email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phone", r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("n_ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(ds, id_col: str, text_col: str):
    """Streaming PII redaction (emails, phone-shaped numbers, IPv4) —
    the standard webtext scrub step run before a corpus is released.

    Pure per-batch map over zero-copy Arrow — ``count_substring_regex``
    to report how much was redacted, ``replace_substring_regex`` to
    redact — no shuffle, no Python per row, so it streams at any corpus
    size.  Non-overlapping left-to-right replacement matches DuckDB's
    ``regexp_replace(..., 'g')`` exactly (both are RE2).
    """

    def stage(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        counts = {}
        for name, pat, repl in _PII_PATTERNS:
            counts[name] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64()
            )
            txt = pc.replace_substring_regex(txt, pat, repl)
        cols = {id_col: batch[id_col], "scrubbed": txt}
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(stage, batch_format="pyarrow")


def sql_pii_scrub(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`pii_scrub` — same RE2 patterns, same order."""
    count_exprs = []
    cur = text_col
    for name, pat, _repl in _PII_PATTERNS:
        count_exprs.append(f"len(regexp_extract_all({cur}, '{pat}')) AS {name}")
        cur = f"regexp_replace({cur}, '{pat}', '{_repl}', 'g')"
    return (
        f"SELECT {id_col}, {cur} AS scrubbed, {', '.join(count_exprs)} "
        f"FROM {table}"
    )


# -- per-host (domain) stats -------------------------------------------------


def domain_stats(ds, url_col: str, ts_col: str):
    """Per-host page statistics over a CC-style pages table: page count
    and first/last capture time per hostname.

    Host extraction is one RE2 ``extract_regex`` kernel; per-batch
    partials (dictionary-encode + bincount / minimum.at) mean the
    groupby exchange carries one row per (host, block), never per page.
    Host cardinality is registry-bounded (millions at crawl scale), so
    the final groupby is small relative to the corpus.
    """
    from ray.data.aggregate import Max, Min, Sum

    _host_re = r"^https?://(?P<host>[^/#]+)"

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(pc.utf8_lower(batch[url_col]), _host_re),
            "host",
        )
        # URLs that don't match (relative, ftp://, garbage) extract a
        # null host — group them under '' like the SQL twin's
        # regexp_extract; a null here would float-widen the dictionary
        # codes and crash bincount/minimum.at
        host = pc.fill_null(host, "")
        dic = pc.dictionary_encode(host)
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        k = len(dic.dictionary)
        n = np.bincount(codes, minlength=k).astype(np.int64)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, codes, ts)
        np.maximum.at(mx, codes, ts)
        return pa.table(
            {
                "host": dic.dictionary,
                "n_pages": pa.array(n),
                "first_ts": pa.array(mn),
                "last_ts": pa.array(mx),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("host").aggregate(
        Sum("n_pages"), Min("first_ts"), Max("last_ts")
    )
    return out.rename_columns(
        {
            "sum(n_pages)": "n_pages",
            "min(first_ts)": "first_ts",
            "max(last_ts)": "last_ts",
        }
    ).sort("host")


def sql_domain_stats(pages_cte: str) -> str:
    """DuckDB twin of :func:`domain_stats` over the derived pages CTE."""
    return f"""
        WITH pages AS ({pages_cte})
        SELECT regexp_extract(lower(url), '^https?://([^/#]+)', 1) AS host,
               count(*) AS n_pages,
               min(warc_ts) AS first_ts,
               max(warc_ts) AS last_ts
        FROM pages
        GROUP BY host
        ORDER BY host
    """


def heavy_hitters_per_group(ds, group_col: str, text_col: str, k: int):
    """Top-k tokens per group (domain/source/language) by occurrence
    count, ROW_NUMBER semantics (cnt DESC, token ASC) — the per-group
    variant of :func:`heavy_hitters`.

    Per-batch combiner: one composite ``np.unique`` over (group code ×
    token code) emits (group, token, partial cnt) rows, so the single
    shuffle is bounded by block vocabulary × groups-per-block.  Rows
    route under ``hash(group) % R`` (all of a group's tokens meet in one
    reducer, so its sums are global there) and a reducer finishes ALL of
    its groups in one ``pc.sort_indices`` (native string collation for
    the token tie-break) + first-occurrence rank — no per-group Python.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    R = reducer_count()

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        wlens, _, _ = _string_views(flat)
        nonempty = wlens > 0
        tok_dic = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
        t_codes = tok_dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        g_dic = pc.dictionary_encode(grp)
        g_codes = (
            g_dic.indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)[parents[nonempty]]
        )
        n_tok = max(len(tok_dic.dictionary), 1)
        comp, cnt = np.unique(g_codes * n_tok + t_codes, return_counts=True)
        g_out = g_dic.dictionary.take(pa.array(comp // n_tok))
        return pa.table(
            {
                "rkey": pa.array(rkey_of(g_out, R)),
                group_col: g_out,
                "token": tok_dic.dictionary.take(pa.array(comp % n_tok)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = coalesce_for_shuffle(
        ds.map_batches(partial, batch_format="pyarrow"), 0.5
    )

    _empty = pa.table(
        {
            group_col: pa.array([], pa.string()),
            "token": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
        }
    )

    def reduce_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        grp = g[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        tok = g["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        g_dic = pc.dictionary_encode(grp)
        t_dic = pc.dictionary_encode(tok)
        gc = g_dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t_dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = g["cnt"].to_numpy()
        n_tok = max(len(t_dic.dictionary), 1)
        comp = gc * n_tok + tc
        uniq, inv = np.unique(comp, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, cnt)
        merged = pa.table(
            {
                group_col: g_dic.dictionary.take(pa.array(uniq // n_tok)),
                "token": t_dic.dictionary.take(pa.array(uniq % n_tok)),
                "cnt": pa.array(sums),
            }
        )
        idx = pc.sort_indices(
            merged,
            sort_keys=[
                (group_col, "ascending"),
                ("cnt", "descending"),
                ("token", "ascending"),
            ],
        )
        s = merged.take(idx)
        sg = pc.dictionary_encode(s[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        )
        first = np.searchsorted(sg, sg, side="left")
        rnk = np.arange(len(sg)) - first + 1
        keep = rnk <= k
        return s.filter(pa.array(keep)).append_column(
            "rnk", pa.array(rnk[keep].astype(np.int64))
        )

    return partials.groupby("rkey").map_groups(reduce_topk, batch_format="pyarrow")


# -- bigram novelty scoring ---------------------------------------------------


#: auto-switch ceiling for the common-bigram broadcast in
#: bigram_novelty — measured from the ≥min_df slice's row count; past
#: it the membership test becomes a bigram-keyed shuffle join.
NOVELTY_BROADCAST_MAX_BIGRAMS = 2_000_000


def bigram_novelty(ds, id_col: str, text_col: str = "text", min_df: int = 5, *,
                   max_broadcast_bigrams: int = NOVELTY_BROADCAST_MAX_BIGRAMS,
                   force_join_path: bool = False):
    """Per-document novelty score against the corpus's common-bigram
    vocabulary — the boilerplate/template detector quality filters pair
    with the repetition gates: a doc whose bigrams are mostly corpus-wide
    commonplaces (novelty → 0) is template/spam-shaped; a doc of mostly
    rare bigrams (novelty → 1) is original text.

    df(bigram) = number of DISTINCT docs containing it (self-inclusive);
    a bigram is "common" when df ≥ ``min_df``.  Returns one row per doc:
    (id, n_bigrams:int64, n_common:int64, novelty:float64) with
    novelty = 1 − n_common/n_bigrams (NULL when the doc has no bigrams),
    computed as one IEEE divide so it hash-matches the SQL twin bit for
    bit.

    Shape: two streaming passes over the corpus (text is never cached or
    shuffled).  Pass 1 builds the df table with per-batch DISTINCT
    (doc, bigram) combiners — the exchange carries (bigram, partial_df)
    rows bounded by each block's bigram vocabulary.  The ≥min_df slice's
    row count is then MEASURED and the membership pass is size-gated:

    - ≤ ``max_broadcast_bigrams`` common bigrams (the normal case — the
      common set is the Zipf head): broadcast ONCE via ``ray.put`` (the
      bm25 df pattern); pass 2 re-derives each batch's bigrams and
      counts membership with one ``pc.index_in`` per batch DICTIONARY
      (exact string compares — never hash-trusted).
    - bigger (or ``force_join_path``): the bigram-keyed JOIN path —
      per-doc distinct (id, bigram, occ) rows semi-join the common-set
      Dataset through :func:`~.relational.hash_join`, reduce per doc,
      and left-join back onto the per-doc bigram totals; identical
      integers, one corpus-pairs shuffle instead of a driver collect.
    """
    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        rows, bigrams = _batch_bigrams(batch, text_col)
        if len(bigrams) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "pdf": pa.array([], pa.int64())}
            )
        dic = pc.dictionary_encode(bigrams)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(dic.dictionary)
        # distinct (doc, bigram) within the batch: docs never span
        # batches, so per-batch distinct-doc counts sum to the global df
        pair = np.unique(rows * np.int64(nv) + codes)
        pdf = np.bincount((pair % nv).astype(np.int64), minlength=nv)
        return pa.table(
            {"bigram": dic.dictionary, "pdf": pa.array(pdf.astype(np.int64))}
        )

    # Slice df >= min_df DATASET-side: the Zipf tail of rare bigrams
    # dominates the vocabulary, so the driver must only ever see the
    # common slice, never the full (bigram, df) table.
    def common_slice(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["sum(pdf)"], pa.scalar(min_df))
        com = pc.cast(batch.filter(keep)["bigram"], pa.string())
        return pa.table({"bigram": com})

    common_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("pdf")
        .map_batches(common_slice, batch_format="pyarrow")
        .materialize()
    )
    if force_join_path or common_ds.count() > max_broadcast_bigrams:
        return _novelty_join_path(ds, common_ds, id_col, text_col)

    common_parts = _arrow_parts(ray.get(common_ds.to_arrow_refs()))
    common_arr = (
        pa.concat_tables(common_parts).column("bigram").combine_chunks()
        if common_parts
        else pa.array([], pa.string())
    )
    if isinstance(common_arr, pa.ChunkedArray):
        common_arr = (
            common_arr.chunk(0) if common_arr.num_chunks
            else pa.array([], pa.string())
        )
    common_ref = ray.put(common_arr)

    def score(batch: pa.Table) -> pa.Table:
        common_bc = ray.get(common_ref)
        n = batch.num_rows
        rows, bigrams = _batch_bigrams(batch, text_col)
        n_bigrams = np.bincount(rows, minlength=n).astype(np.int64)
        if len(bigrams):
            dic = pc.dictionary_encode(bigrams)
            codes = dic.indices.to_numpy(zero_copy_only=False)
            hit = pc.is_valid(
                pc.index_in(dic.dictionary, value_set=common_bc)
            ).to_numpy(zero_copy_only=False)
            n_common = np.bincount(
                rows[hit[codes]], minlength=n
            ).astype(np.int64)
        else:
            n_common = np.zeros(n, dtype=np.int64)
        empty = n_bigrams == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            novelty = 1.0 - n_common / n_bigrams.astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(n_bigrams),
                "n_common": pa.array(n_common),
                "novelty": pa.array(novelty, pa.float64(), mask=empty),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _novelty_join_path(ds, common_ds, id_col: str, text_col: str):
    """Open-vocabulary membership pass for :func:`bigram_novelty`.

    Per-batch DISTINCT (id, bigram) rows carry their within-doc
    occurrence counts; a semi hash_join against the common-set Dataset
    keeps the common ones (each (id, bigram) pair is distinct, so
    emit-at-most-once semi semantics are exact), one id-keyed groupby
    sums them to n_common, and a left join onto the per-doc bigram
    totals restores zero-common and zero-bigram docs.  Same integers,
    same single IEEE divide as the broadcast path.
    """
    from .relational import hash_join

    def pair_stage(batch: pa.Table) -> pa.Table:
        rows, bigrams = _batch_bigrams(batch, text_col)
        if len(bigrams) == 0:
            return pa.table(
                {
                    id_col: batch[id_col].slice(0, 0),
                    "bigram": pa.array([], pa.string()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        dic = pc.dictionary_encode(bigrams)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = np.int64(len(dic.dictionary))
        pair, occ = np.unique(rows * nv + codes, return_counts=True)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(pair // nv)),
                "bigram": dic.dictionary.take(pa.array(pair % nv)),
                "occ": pa.array(occ.astype(np.int64)),
            }
        )

    common_pairs = hash_join(
        ds.map_batches(pair_stage, batch_format="pyarrow"),
        common_ds, "bigram", "bigram",
        [id_col, "occ"], [], how="semi",
    )
    ncom = common_pairs.groupby(id_col).sum("occ").map_batches(
        lambda t: t.rename_columns([id_col, "n_common"]),
        batch_format="pyarrow",
    )

    def totals(batch: pa.Table) -> pa.Table:
        rows, bigrams = _batch_bigrams(batch, text_col)
        n = batch.num_rows
        n_bigrams = np.bincount(rows, minlength=n).astype(np.int64)
        return pa.table(
            {id_col: batch[id_col], "n_bigrams": pa.array(n_bigrams)}
        )

    base = ds.map_batches(totals, batch_format="pyarrow")
    j = hash_join(
        base, ncom, id_col, id_col,
        [id_col, "n_bigrams"], ["n_common"], how="left",
    )

    def finish(b: pa.Table) -> pa.Table:
        nb = b["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = (
            pc.fill_null(pc.cast(b["n_common"], pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        empty = nb == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            novelty = 1.0 - nc / nb.astype(np.float64)
        return pa.table(
            {
                id_col: b[id_col],
                "n_bigrams": pa.array(nb),
                "n_common": pa.array(nc),
                "novelty": pa.array(novelty, pa.float64(), mask=empty),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


def sql_bigram_novelty(table: str, id_col: str, min_df: int) -> str:
    """DuckDB twin of :func:`bigram_novelty`."""
    return rf"""
WITH toks AS (
  SELECT {id_col}, tok, ord FROM (
    SELECT {id_col},
           unnest(string_split_regex(lower(text), '\s+')) AS tok,
           generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS ord
    FROM {table})
  WHERE tok <> ''),
seq AS (
  SELECT {id_col}, tok,
         ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY ord) AS rn
  FROM toks),
bg AS (
  SELECT a.{id_col}, a.tok || ' ' || b.tok AS bigram
  FROM seq a JOIN seq b ON a.{id_col} = b.{id_col} AND b.rn = a.rn + 1),
df AS (SELECT bigram, count(DISTINCT {id_col}) AS df FROM bg GROUP BY 1),
sc AS (
  SELECT bg.{id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN df.df >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common
  FROM bg JOIN df USING (bigram) GROUP BY 1)
SELECT d.{id_col},
       COALESCE(sc.n_bigrams, 0) AS n_bigrams,
       COALESCE(sc.n_common, 0) AS n_common,
       CASE WHEN sc.n_bigrams > 0
            THEN 1.0 - sc.n_common / CAST(sc.n_bigrams AS DOUBLE)
            ELSE NULL END AS novelty
FROM {table} d LEFT JOIN sc USING ({id_col})
"""


def _arrow_parts(parts):
    """Normalize ``Dataset.to_arrow_refs()`` results: empty input
    partitions can surface as schema-less tables or raw pandas blocks —
    keep only real Arrow tables with columns."""
    out = []
    for p in parts:
        if not isinstance(p, pa.Table):
            p = pa.Table.from_pandas(p)
        if p.num_columns:
            out.append(p)
    return out


# -- benchmark decontamination ------------------------------------------------


def contamination_flags(ds, bench_ds, id_col: str, text_col: str = "text",
                        n: int = 8):
    """Benchmark decontamination: flag every corpus doc that shares at
    least one word ``n``-gram with a benchmark/eval set — the standard
    train-set contamination screen run before every LLM training job
    (n=8..13 word-grams is the published convention, e.g. GPT-3 App. C /
    PaLM-style 8-gram overlap).  Returns one row per corpus doc:
    (id, n_ngrams:int64, n_hits:int64, contaminated:int64 0/1).

    Shape: the benchmark side is SMALL by definition (eval suites are
    MBs), so its distinct n-gram set is computed with per-batch distinct
    combiners, collected once, and broadcast via ``ray.put`` as a SORTED
    uint64 hash array (8 B per distinct benchmark n-gram — a 10⁶-ngram
    suite is 8 MB); the 100 TB corpus side then streams: each batch
    re-derives its n-grams off Arrow buffers (``_batch_word_ngrams``),
    hashes them ragged (``_fnv1a_ragged`` — sum(len) work, no padded
    matrix), and membership is one ``searchsorted`` per batch.  The
    corpus is never shuffled and nothing corpus-sized is collected.
    Matching is on 64-bit FNV-1a n-gram hashes (collision odds ~2⁻⁶⁴ per
    pair — the exact_dedup trade, declared).
    """
    import ray

    from .text import _fnv1a_ragged

    def _ngram_hashes(batch: pa.Table):
        rows, ngrams = _batch_word_ngrams(batch, text_col, n)
        if len(ngrams) == 0:
            return rows, np.empty(0, np.uint64)
        return rows, _fnv1a_ragged(*_string_views(ngrams))

    def bench_partial(batch: pa.Table) -> pa.Table:
        _, h = _ngram_hashes(batch)
        return pa.table({"h": pa.array(np.unique(h).view(np.int64))})

    parts = ray.get(
        bench_ds.map_batches(bench_partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    parts = _arrow_parts(parts)
    allh = (
        pa.concat_tables(parts).column("h").to_numpy(zero_copy_only=False)
        if parts
        else np.empty(0, np.int64)
    )
    bench_ref = ray.put(np.unique(allh.view(np.uint64)))  # sorted

    def score(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        nrows = batch.num_rows
        rows, h = _ngram_hashes(batch)
        n_ngrams = np.bincount(rows, minlength=nrows).astype(np.int64)
        if len(h) and len(bench):
            pos = np.searchsorted(bench, h)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == h
            n_hits = np.bincount(rows[hit], minlength=nrows).astype(np.int64)
        else:
            n_hits = np.zeros(nrows, dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_ngrams": pa.array(n_ngrams),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array((n_hits > 0).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def sql_contamination(table: str, id_col: str, n: int,
                      bench_pred: str) -> str:
    """DuckDB twin of :func:`contamination_flags` — ``bench_pred`` is the
    SQL predicate selecting the benchmark rows (e.g. ``id % 97 = 0``)."""
    joined = " || ' ' || ".join(
        "tok" if i == 0 else f"lead(tok, {i}) OVER w" for i in range(n)
    )
    return rf"""
WITH toks AS (
  SELECT {id_col}, tok, ord FROM (
    SELECT {id_col},
           unnest(string_split_regex(lower(text), '\s+')) AS tok,
           generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS ord
    FROM {table})
  WHERE tok <> ''),
seq AS (
  SELECT {id_col}, tok,
         ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY ord) AS rn
  FROM toks),
ng AS (
  SELECT {id_col}, {joined} AS ngram
  FROM seq WINDOW w AS (PARTITION BY {id_col} ORDER BY rn)),
ngc AS (SELECT {id_col}, ngram FROM ng WHERE ngram IS NOT NULL),
bench AS (SELECT DISTINCT ngram FROM ngc WHERE {bench_pred}),
sc AS (
  SELECT ngc.{id_col}, CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(CASE WHEN bench.ngram IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM ngc LEFT JOIN bench USING (ngram) GROUP BY 1)
SELECT d.{id_col},
       COALESCE(sc.n_ngrams, 0) AS n_ngrams,
       COALESCE(sc.n_hits, 0) AS n_hits,
       CAST(COALESCE(sc.n_hits, 0) > 0 AS BIGINT) AS contaminated
FROM {table} d LEFT JOIN sc USING ({id_col})
"""


def token_budget_mix(ds, id_col: str, group_col: str, token_col: str,
                     budget: int):
    """Deterministic per-source data mixing to a token budget — the
    corpus-assembly step that downsamples each source to ≈ ``budget``
    tokens (never upsamples): a row survives iff
    ``hash_unit(id) < min(1, budget / group_total_tokens)``.

    Pass 1: per-batch (group, tokens) partial sums → one tiny native
    ``groupby(group).sum`` — the shuffle carries ≤ one row per group per
    block, and the driver reads ≤ #groups rows (the bm25 df trade; swap
    the broadcast for a hash_join at 10⁸+ groups).  Pass 2 is map-only:
    the same golden-hash acceptance as :func:`weighted_sample`, so the
    kept subset is a pure function of (id, group totals) — identical
    under any partitioning, retry, cluster size, and resumable re-runs.

    Rate arithmetic is one exact int→double conversion per side and one
    IEEE divide (``budget / tot``), bit-identical to the SQL twin's
    ``LEAST(1.0, CAST(b AS DOUBLE) / CAST(tot AS DOUBLE))``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {group_col: batch[group_col], token_col: batch[token_col]}
        )
        agg = t.group_by(group_col).aggregate([(token_col, "sum")])
        return agg.rename_columns([group_col, "tok"])

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .sum("tok")
        .to_pandas()
    )
    key_arr = pa.array(totals[group_col].tolist())
    tots = totals["sum(tok)"].to_numpy(np.int64)
    rate_arr = np.minimum(1.0, float(budget) / tots.astype(np.float64))

    def accept(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            u = (ids * _GOLDEN).astype(np.float64) / 2.0**64
        idx = pc.index_in(batch[group_col], key_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)  # every group has a totals row by construction
        return batch.filter(pa.array(u < rate_arr[idx]))

    return ds.map_batches(accept, batch_format="pyarrow")


def upsample_repeat(ds, id_col: str, epochs_col: str, out_col: str = "epoch"):
    """Deterministic repetition upsampling — the UP half of data-mixture
    weighting (:func:`token_budget_mix` is the down half): emit each row
    ``epochs`` times with an epoch ordinal 0..epochs−1, so high-quality
    sources can be repeated a bounded number of times in the training
    mix (the Doremi/data-mixing repeat trick, never more than the
    caller's per-row cap).

    Map-only and shuffle-free: the expansion is one vectorized
    ``np.repeat`` gather per batch (a flat_map shape with Arrow ``take``
    — no Python per row); amplification is bounded by max(epochs), so a
    block's output stays proportional to its input.  Rows with epochs
    ≤ 0 drop out.
    """

    def fn(batch: pa.Table) -> pa.Table:
        e = batch[epochs_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = np.maximum(e, 0)
        idx = np.repeat(np.arange(len(e), dtype=np.int64), e)
        offs = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(e) - e, e
        )
        out = batch.select([id_col]).take(pa.array(idx))
        return out.append_column(out_col, pa.array(offs))

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_outlinks(ds, id_col: str, html_col: str, out_col: str = "href"):
    """All ``href="…"`` outlinks per page — the edge-derivation step of
    the host-level web graph (the Common-Crawl webgraph product).

    All-Arrow and shuffle-free: one ``split_pattern(html, 'href="')``
    per batch, the per-row FIRST segment dropped via the list offsets
    (it precedes any link), the link text clipped at the closing quote
    with one RE2 kernel — no Python per row, no regexp_extract_all
    emulation loops.  Output one (id, href) row per link, in document
    order; pages without links emit nothing; an unterminated href drops.

    Contract note vs a ``regexp_extract_all(html, 'href="([^"]*)"')``
    twin: the two agree on well-formed markup, but a PATHOLOGICAL value
    containing the literal ``href="`` inside an href (e.g.
    ``href="a href="b"``) splits differently — the regex scan returns
    ``a href=`` while this splitter returns ``b``.  Real attribute
    values URL-encode the quote, so the divergence needs deliberately
    malformed html; callers gating against a SQL twin should
    pre-sanitize or accept the shared well-formedness assumption.
    """

    def fn(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[html_col], pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        parts = pc.split_pattern(s, 'href="')
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        parents = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False
        )
        offsets = np.asarray(parts.offsets)
        keep = np.ones(len(flat), dtype=bool)
        first = offsets[:-1]
        keep[first[first < len(flat)]] = False
        kept = pa.array(np.flatnonzero(keep))
        seg = flat.take(kept)
        ex = pc.extract_regex(seg, '^(?P<v>[^"]*)"')
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        href = pc.struct_field(ex, "v")
        ok = pc.is_valid(href).to_numpy(zero_copy_only=False)
        ids = batch[id_col].take(
            pa.array(parents[keep][ok])
        )
        return pa.table({id_col: ids, out_col: href.filter(pa.array(ok))})

    return ds.map_batches(fn, batch_format="pyarrow")


def group_vocab_jaccard(ds, group_col: str, text_col: str = "text"):
    """Pairwise vocabulary overlap between groups — Jaccard of the
    DISTINCT lowercased-whitespace-token sets of every (source a,
    source b) pair: the corpus-diversity / source-redundancy matrix a
    mixture designer reads before weighting sources.

    Scale shape: output and broadcast are GROUPS²-bounded by definition
    (sources/languages — metadata scale).  The distinct (group, token)
    pairs reduce under coarse ``hash(token)`` keys, so every copy of a
    token lands on one reducer and reducer-level dedup IS global dedup;
    each reducer then expands its tokens' source sets into pair codes
    (≤ groups²/2 per token, vectorized repeat/offset — no Python per
    token) and bincounts them into (pair_code, cnt) partials.  One tiny
    final groupby; per-group vocabulary sizes ride the same exchange.
    Exchange rows are bounded by block-vocabulary × groups-per-block,
    sublinear in corpus rows.
    """
    import ray.data  # noqa: F401  (Dataset ops on ds)

    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    # distinct-group listing via a 1-column per-batch combiner — a full
    # groupby here would shuffle the whole corpus (text included) just
    # to list a handful of sources
    def group_partial(batch: pa.Table) -> pa.Table:
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        return pa.table(
            {group_col: pc.unique(gcol)}
        )

    groups = sorted(
        ds.map_batches(group_partial, batch_format="pyarrow")
        .groupby(group_col)
        .count()
        .to_pandas()[group_col]
        .tolist()
    )
    garr = pa.array(groups)
    K = len(groups)
    R = reducer_count()

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch[text_col]), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parents = parents.filter(keep)
        gcol = batch[group_col].take(parents)
        gi = pc.index_in(gcol, garr).cast(pa.int64())
        t = pa.table({"token": flat, "g": gi})
        dedup = t.group_by(["token", "g"]).aggregate([])
        return dedup.append_column(
            "rkey", pa.array(rkey_of(dedup["token"], R))
        )

    keyed = coalesce_for_shuffle(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"), 0.25
    )

    def pair_partials(g: pa.Table) -> pa.Table:
        tok = g["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        tcode = pc.dictionary_encode(tok).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        gi = g["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        # reducer-level dedup == global dedup (token-partitioned)
        m = np.unique(tcode * np.int64(K) + gi)
        tc, gc = m // K, m % K
        # vocabulary-size partials (one distinct (token, group) each)
        vocab = np.bincount(gc, minlength=K).astype(np.int64)
        # all (a < b) source pairs within each token's segment
        last = np.searchsorted(tc, tc, side="right")
        reps = last - (np.arange(len(tc)) + 1)   # partners after each row
        la = np.repeat(gc, reps)
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        rb = gc[np.repeat(np.arange(len(tc)), reps) + 1 + offs]
        code = la * np.int64(K) + rb          # gc ascending per token → a < b
        cnt = np.bincount(code, minlength=K * K).astype(np.int64)
        nz = np.flatnonzero(cnt)
        out_code = np.concatenate([nz, -(np.arange(K) + 1)])
        out_cnt = np.concatenate([cnt[nz], vocab])
        return pa.table(
            {"code": pa.array(out_code), "cnt": pa.array(out_cnt)}
        )

    agg = (
        keyed.groupby("rkey")
        .map_groups(pair_partials, batch_format="pyarrow")
        .groupby("code")
        .sum("cnt")
        .to_pandas()
    )
    cnt_of = dict(zip(agg["code"].astype(np.int64),
                      agg["sum(cnt)"].astype(np.int64)))
    nv = np.array([cnt_of.get(-(i + 1), 0) for i in range(K)], np.int64)
    rows_a, rows_b, inter, jac = [], [], [], []
    for a in range(K):
        for b in range(a + 1, K):
            c = int(cnt_of.get(a * K + b, 0))
            if c == 0:
                continue
            rows_a.append(groups[a])
            rows_b.append(groups[b])
            inter.append(c)
            jac.append(float(c) / float(int(nv[a]) + int(nv[b]) - c))
    return pa.table(
        {
            "a_source": pa.array(rows_a, pa.string()),
            "b_source": pa.array(rows_b, pa.string()),
            "n_common": pa.array(inter, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )
