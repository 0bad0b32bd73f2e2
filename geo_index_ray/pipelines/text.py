"""Text-analysis stages for training-data pipelines over `documents`.

All stages are stateless map_batches transforms; string kernels use
pyarrow.compute where available, bounded per-row Python where not.
Stages with exact SQL twins (token_count, quality) keep their arithmetic
ANSI-expressible; heuristics (lang_id, fingerprint) are rows-only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic (alphabetical langs only; zh/ja matched by codepoint ranges)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "de"],
    "pt": ["o", "a", "os", "e", "é", "uma", "que", "não"],
    "ru": ["и", "в", "не", "на", "что", "это", "с", "как"],
}


def token_count_stage(id_col: str, text_col: str = "text"):
    """(id, n_tokens): whitespace-token count.

    SQL twin: ``len(list_filter(string_split_regex(text, '\\s+'),
    x -> x <> ''))``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        # count of non-empty \s+-separated segments ≡ count of \S+ runs —
        # one RE2 kernel pass, no Python strings in the hot path
        n = pc.count_substring_regex(batch[text_col], r"\S+")
        return pa.table(
            {id_col: batch[id_col], "n_tokens": n.cast(pa.int64())}
        )

    return fn


def bpe_token_count_stage(id_col: str, text_col: str = "text"):
    """(id, n_tokens): BPE-pretokenizer-style regex token count — runs of
    word characters or runs of non-word non-space punctuation, the shape
    GPT-2-style pretokenizers split on.  The pattern compiles ONCE per
    stage closure (per worker), never per batch.

    SQL twin: ``len(regexp_extract_all(text,
    '[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]+'))`` (explicit classes so the
    Arrow RE2 kernel and DuckDB RE2 agree).
    """
    pat = r"[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]+"

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[text_col], pat)
        return pa.table(
            {id_col: batch[id_col], "n_tokens": n.cast(pa.int64())}
        )

    return fn


def quality_stage(id_col: str, text_col: str = "text"):
    """(id, n_chars, n_punct, quality_score) — cheap quality signals.

    quality_score = n_chars / (n_punct + 1) computed in double; all three
    are exactly SQL-expressible.
    """

    def fn(batch: pa.Table) -> pa.Table:
        n_chars = pc.utf8_length(batch[text_col]).to_numpy().astype(np.int64)
        stripped = pc.replace_substring_regex(batch[text_col], r"[.,!?]", "")
        n_punct = n_chars - pc.utf8_length(stripped).to_numpy().astype(np.int64)
        score = n_chars / (n_punct + 1.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(n_chars),
                "n_punct": pa.array(n_punct),
                "quality_score": pa.array(score),
            }
        )

    return fn


def lang_id_stage(id_col: str, text_col: str = "text"):
    """(id, lang_pred): stopword-voting language ID heuristic.

    Semantics are pinned by the SQL twin (functions/sqltext.sql_lang_id):
    kana/CJK codepoint dominance over the first 200 CHARS, else the
    stopword vote over the first 200 \\s+-words of lower(text) with
    first-language-wins ties.  Vectorized batch-wide: the CJK gates are
    two RE2 kernel passes; the vote hashes every candidate word once and
    segment-sums per (row, language) — no per-word Python."""

    langs = list(_LANG_MARKERS)
    marker_hashes = [
        _fnv1a_batch([w.encode() for w in _LANG_MARKERS[lg]]) for lg in langs
    ]

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        n = len(col)
        head = pc.utf8_slice_codeunits(col, 0, 200)
        kana = pc.count_substring_regex(head, "[぀-ヿ]").to_numpy(
            zero_copy_only=False
        )
        cjk = pc.count_substring_regex(head, "[一-鿿]").to_numpy(
            zero_copy_only=False
        )
        # stopword vote only where the CJK gates didn't fire.  All-Arrow
        # tokenization: lower → \s+ split → drop empties → first 200
        # non-empty words per row (rank-within-row, vectorized) → FNV
        # hash straight off the flattened token buffers.
        words = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        wlens, wstarts, wvalues = _string_views(flat)
        nonempty = np.nonzero(wlens > 0)[0]
        pk = parents[nonempty]
        # rank of each kept token within its row (parents ascending, so the
        # first index sharing a parent is a searchsorted away)
        rank = np.arange(len(pk)) - np.searchsorted(pk, pk, side="left")
        keep = nonempty[rank < 200]
        hits = np.zeros((n, len(langs)), dtype=np.int64)
        if len(keep):
            th = _fnv1a_ragged(wlens[keep], wstarts[keep], wvalues)
            row = parents[keep]
            for li, mh in enumerate(marker_hashes):
                hits[:, li] = np.bincount(
                    row, weights=np.isin(th, mh), minlength=n
                ).astype(np.int64)
        vote = np.array(langs, dtype=object)[np.argmax(hits, axis=1)]
        preds = np.where(kana > 2, "ja", np.where(cjk > 2, "zh", vote))
        return pa.table(
            {id_col: batch[id_col], "lang_pred": pa.array(preds.tolist())}
        )

    return fn


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(0xCBF29CE484222325)


def _fnv1a_batch(encs) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over a list of byte strings (used for the
    small static marker tables; document-scale hashing goes through
    ``_fnv1a_ragged`` straight off Arrow buffers)."""
    n = len(encs)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.array([len(t) for t in encs], dtype=np.int64)
    values = np.frombuffer(b"".join(encs), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return _fnv1a_ragged(lens, starts, values)


def _fnv1a_ragged(lens, starts, values) -> np.ndarray:
    """64-bit FNV-1a per document over ragged utf8 bytes.

    FNV is byte-sequential per doc but embarrassingly parallel across
    docs: sort docs by length descending so the docs still alive at byte
    position j are a contiguous prefix, then one gather+xor+multiply pass
    per position over exactly the live docs — total work is sum(lens)
    with no padded matrix and no Python strings."""
    n = len(lens)
    h = np.full(n, _FP_OFFSET, dtype=np.uint64)
    if n == 0 or len(values) == 0 or lens.max(initial=0) == 0:
        return h
    order = np.argsort(-lens, kind="stable")
    s_sorted = starts[order]
    l_sorted = lens[order]
    maxlen = int(l_sorted[0])
    # live-prefix size at position j = count of docs with len > j
    asc = np.sort(lens)
    live = n - np.searchsorted(asc, np.arange(maxlen), side="right")
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = int(live[j])
            h[:m] = (h[:m] ^ values[s_sorted[:m] + j]) * _FP_BASE
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def _string_views(col):
    """(lens, starts, values) numpy views of a utf8 column's buffers —
    zero-copy, nulls normalized to empty strings."""
    arr = pc.fill_null(col, "")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf_val = arr.buffers()[2]
    values = (
        np.frombuffer(buf_val, dtype=np.uint8)
        if buf_val is not None
        else np.empty(0, np.uint8)
    )
    return offsets[1:] - offsets[:-1], offsets[:-1], values


def _doc_term_tf(batch: pa.Table, id_col: str, text_col: str):
    """(doc_row, term_code, tf, dictionary) for one batch — all-Arrow
    tokenization (lower → \\s+ split → drop empties) then one composite
    np.unique over (row, code) pairs."""
    col = batch[text_col]
    words = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    wlens, _, _ = _string_views(flat)
    nonempty = wlens > 0
    dic = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    rows = parents[nonempty]
    vocab = len(dic.dictionary)
    pair, tf = np.unique(rows * max(vocab, 1) + codes, return_counts=True)
    return pair // max(vocab, 1), pair % max(vocab, 1), tf.astype(np.int64), dic.dictionary


#: auto-switch ceiling for the document-frequency broadcast in
#: top_tfidf_terms: past this many DISTINCT terms the driver collect +
#: ray.put is the documented open-web OOM wall and the term-keyed
#: shuffle-join path takes over.  Measured from the df aggregate itself
#: (one count over a vocab-bounded Dataset), never guessed.
TFIDF_BROADCAST_MAX_TERMS = 2_000_000


def top_tfidf_terms(ds, id_col: str, text_col: str = "text", k: int = 3, *,
                    max_broadcast_terms: int = TFIDF_BROADCAST_MAX_TERMS,
                    force_join_path: bool = False):
    """Per-document top-k terms by tf·idf with a RATIONAL idf
    (``tf * (N + 1) / (df + 1)``, no transcendentals → bit-identical to
    the SQL oracle), ROW_NUMBER semantics (score DESC, term ASC), output
    (id, term, rnk).

    Shape, SIZE-GATED on the measured distinct-term count:

    - vocabulary ≤ ``max_broadcast_terms`` (the common case): tf rows
      for a document never leave their batch; the only exchange is the
      vocabulary-sized df aggregate, collected once and broadcast
      (``ray.put``).  The corpus is tokenized twice (df pass + scoring
      pass) rather than pinning a corpus-sized intermediate.
    - open-web vocabularies (10⁸+ terms would OOM the driver): the
      term-keyed JOIN path — per-doc (id, term, tf) postings join the
      df Dataset through the lean :func:`~.relational.hash_join`, scores
      compute post-join with the identical IEEE expression, and
      ROW_NUMBER(score DESC, term ASC) reduces through one
      ``topk_per_group`` exchange on hash(id).  Costs two corpus-sized
      exchanges (postings join + per-doc top-k) — the honest price of a
      vocabulary that cannot be broadcast; nothing driver-side.

    Both paths emit identical rows (tests force the join path).
    """
    import ray

    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        _, codes, _, dictionary = _doc_term_tf(batch, id_col, text_col)
        pdf = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        present = pdf > 0
        return pa.table(
            {
                "term": dictionary.filter(pa.array(present)),
                "pdf": pa.array(pdf[present]),
            }
        )

    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("pdf")
    )
    df_ds = df_ds.map_batches(
        lambda b: b.rename_columns(["term", "df"]), batch_format="pyarrow"
    ).materialize()

    if force_join_path or df_ds.count() > max_broadcast_terms:
        return _tfidf_join_path(ds, df_ds, id_col, text_col, k, n_docs)

    df_tbl = df_ds.to_pandas()
    df_ref = ray.put(
        (
            pa.array(df_tbl["term"].tolist(), pa.string()),
            df_tbl["df"].to_numpy().astype(np.int64),
        )
    )

    def score_topk(batch: pa.Table) -> pa.Table:
        terms_bc, dfv_bc = ray.get(df_ref)
        rows, codes, tf, dictionary = _doc_term_tf(batch, id_col, text_col)
        pos = pc.index_in(dictionary, value_set=terms_bc).to_numpy(
            zero_copy_only=False
        )
        df = dfv_bc[pos[codes]]
        score = tf.astype(np.float64) * ((n_docs + 1.0) / (df + 1.0))
        # tie-break term ASC without Python string compares: rank the
        # batch dictionary once with the Arrow sort kernel (binary utf8
        # collation — exactly DuckDB's ORDER BY)
        dict_order = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False)
        term_rank = np.empty(len(dictionary), dtype=np.int64)
        term_rank[dict_order] = np.arange(len(dictionary))
        order = np.lexsort((term_rank[codes], -score, rows))
        rs = rows[order]
        first = np.searchsorted(rs, rs, side="left")
        rank = np.arange(len(rs)) - first
        sel = order[rank < k]
        ids = batch[id_col].to_numpy()
        return pa.table(
            {
                id_col: pa.array(ids[rows[sel]]),
                "term": dictionary.take(pa.array(codes[sel])),
                "rnk": pa.array((rank[rank < k] + 1).astype(np.int64)),
            }
        )

    return ds.map_batches(score_topk, batch_format="pyarrow")


def _tfidf_join_path(ds, df_ds, id_col: str, text_col: str, k: int,
                     n_docs: int):
    """Open-vocabulary tf·idf pass 2: postings ⋈ df, then per-doc top-k.

    Postings are (id, term, tf) — one row per distinct (doc, term); the
    join shuffles them under hash(term) against the vocab-bounded df
    Dataset (nothing broadcast, nothing driver-collected), the score is
    the same ``tf * (N + 1) / (df + 1)`` IEEE expression as the
    broadcast path, and the per-doc ROW_NUMBER(score DESC, term ASC)
    cut reduces through ``topk_per_group`` (string tie-break compares
    UTF-8 bytes — identical collation to the Arrow sort kernel the
    broadcast path uses).
    """
    from ..stages.util import topk_per_group
    from .relational import hash_join

    def postings(batch: pa.Table) -> pa.Table:
        rows, codes, tf, dictionary = _doc_term_tf(batch, id_col, text_col)
        ids = batch[id_col].to_numpy()
        return pa.table(
            {
                id_col: pa.array(ids[rows]),
                "term": dictionary.take(pa.array(codes)),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    joined = hash_join(
        ds.map_batches(postings, batch_format="pyarrow"),
        df_ds, "term", "term",
        [id_col, "term", "tf"], ["df"], how="inner",
    )

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy().astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tf * ((n_docs + 1.0) / (dfv + 1.0))
        return pa.table(
            {
                id_col: batch[id_col],
                "term": batch["term"],
                "score": pa.array(s, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    out = topk_per_group(
        scored, id_col, k,
        sort_cols=["score", "term"], sort_desc=[True, False],
        keep_cols=[id_col, "term"], rank_col="rnk",
    )
    return out


def fingerprint_stage(id_col: str, text_col: str = "text"):
    """(id, fp): 64-bit rolling (FNV-1a) document fingerprint, computed
    straight off the Arrow utf8 buffers (no Python strings)."""

    def fn(batch: pa.Table) -> pa.Table:
        lens, starts, values = _string_views(batch[text_col])
        h = _fnv1a_ragged(lens, starts, values)
        return pa.table({id_col: batch[id_col], "fp": pa.array(h.view(np.int64))})

    return fn


def bm25_topk(ds, id_col: str, query_terms, text_col: str = "text",
              k: int = 20, k1: float = 1.2, b: float = 0.75):
    """Global top-k documents for a keyword query under BM25-style
    scoring with a RATIONAL idf (``(N - df + 0.5) / (df + 0.5)``, no
    log → bit-identical to the SQL oracle).  Output (id, score),
    ordered score DESC then id, limit k.

    Scale shape: the query-term list is tiny and broadcast by closure;
    pass 1 computes per-term document frequency plus corpus (N, Σdl) as
    per-block partials reduced through a vocabulary-bounded groupby;
    pass 2 re-tokenizes (nothing corpus-sized pinned — same trade as
    ``top_tfidf_terms``), scores candidates with one fixed-order
    accumulation over the query terms, and feeds a per-block top-k into
    the global sort+limit, so only ``k`` rows per block reach the final
    exchange.  Score arithmetic mirrors the oracle expression
    operation-for-operation so float64 results hash-match.
    """
    terms = [t.lower() for t in query_terms]
    tset = pa.array(terms, pa.string())

    n_docs = ds.count()

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows, codes, tf, dictionary = _doc_term_tf(batch, id_col, text_col)
        # dl partial: total tokens in this block; df partial per query term
        pos = pc.index_in(dictionary, value_set=tset).to_numpy(
            zero_copy_only=False
        )
        pos = np.nan_to_num(pos.astype(np.float64), nan=-1).astype(np.int64)
        hit = pos[codes] >= 0
        dfp = np.bincount(pos[codes][hit], minlength=len(terms))
        out = {"qi": pa.array(np.arange(len(terms) + 1, dtype=np.int64))}
        out["cnt"] = pa.array(
            np.r_[dfp, int(tf.sum())].astype(np.int64)
        )  # row len(terms) carries the Σdl partial
        return pa.table(out)

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("qi")
        .sum("cnt")
        .to_pandas()
        .set_index("qi")["sum(cnt)"]
    )
    dfv = np.array([int(stats.get(i, 0)) for i in range(len(terms))], dtype=np.float64)
    total_dl = float(stats.get(len(terms), 0))
    avgdl = total_dl / n_docs
    idf = ((n_docs - dfv) + 0.5) / (dfv + 0.5)
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def score_block(batch: pa.Table) -> pa.Table:
        rows, codes, tf, dictionary = _doc_term_tf(batch, id_col, text_col)
        n = batch.num_rows
        dl = np.bincount(rows, weights=tf, minlength=n)
        pos = pc.index_in(dictionary, value_set=tset).to_numpy(
            zero_copy_only=False
        )
        pos = np.nan_to_num(pos.astype(np.float64), nan=-1).astype(np.int64)
        tfq = np.zeros((n, len(terms)), dtype=np.float64)
        hit = pos[codes] >= 0
        tfq[rows[hit], pos[codes][hit]] = tf[hit]
        denom_norm = k1 * (one_minus_b + b * (dl / avgdl))
        score = np.zeros(n, dtype=np.float64)
        for i in range(len(terms)):  # fixed-order sum == the SQL expression
            ti = tfq[:, i]
            score = score + idf[i] * (ti * k1p1) / (ti + denom_norm)
        cand = tfq.sum(axis=1) > 0
        ids = batch[id_col].to_numpy()[cand]
        sc = score[cand]
        # per-block truncation: only k rows per block reach the exchange
        if len(sc) > k:
            order = np.lexsort((ids, -sc))[:k]
            ids, sc = ids[order], sc[order]
        return pa.table({id_col: pa.array(ids), "score": pa.array(sc)})

    out = (
        ds.map_batches(score_block, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
        .materialize()  # bounded: at most k rows
    )
    if out.count() == 0:
        # zero keyword hits: Ray's empty limit loses its schema (and a
        # typed-empty union cannot wrap a limit — the planner asserts
        # re-planning union+limit), so return a typed empty directly
        import ray.data as rd

        return rd.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
        )
    return out


def sql_bm25_topk(table: str, id_col: str, query_terms, k: int = 20,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenizer, same rational
    idf, score written as the same fixed-order left-associated sum."""
    terms = [t.lower() for t in query_terms]
    k1p1 = repr(k1 + 1.0)
    omb = repr(1.0 - b)
    rk1 = repr(k1)
    rb = repr(b)
    tf_cols = ",\n               ".join(
        f"CAST(MAX(CASE WHEN term = '{t}' THEN tf ELSE 0 END) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    parts = " + ".join(
        f"(((CAST(n AS DOUBLE) - df{i}) + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {k1p1}) / (tf{i} + {rk1} * ({omb} + {rb} * (dl / avgdl)))"
        for i in range(len(terms))
    )
    df_cols = ", ".join(
        f"CAST(COALESCE((SELECT COUNT(*) FROM tf WHERE term = '{t}'), 0) AS DOUBLE) AS df{i}"
        for i, t in enumerate(terms)
    )
    return f"""
        WITH w AS (
          SELECT {id_col},
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                        x -> x <> '')) AS term
          FROM {table}
        ),
        dl AS (SELECT {id_col}, CAST(COUNT(*) AS DOUBLE) AS dl FROM w GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n FROM {table}),
        ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / (SELECT n FROM nd) AS avgdl FROM dl),
        tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM w
               WHERE term IN ({in_list}) GROUP BY 1, 2),
        dfs AS (SELECT {df_cols}),
        piv AS (SELECT {id_col},
               {tf_cols}
          FROM tf GROUP BY {id_col})
        SELECT {id_col}, {parts} AS score
        FROM piv JOIN dl USING ({id_col}) CROSS JOIN nd CROSS JOIN ad CROSS JOIN dfs
        ORDER BY score DESC, {id_col} LIMIT {k}
    """


def span_dedup(ds, id_col: str, text_col: str = "text", span_words: int = 8):
    """C4-style global exact span dedup: each document is cut into
    consecutive non-overlapping ``span_words``-word spans (lowercased,
    whitespace-normalized); a span occurrence survives only if it is the
    minimum (doc_id, span_idx) among all occurrences of that span text
    in the corpus.  Output: (id_col, clean_text) — the surviving spans
    rejoined with single spaces, one row per input document (possibly
    empty).

    Scale shape: the winner-selection exchange carries only
    (span_hash64, doc_id, span_idx) = 24 B/span; document text moves
    through exactly ONE doc-keyed exchange for the rebuild.  Span
    identity uses a 64-bit FNV of the span text (collision odds ~n²/2⁶⁵
    — negligible below ~10⁹ distinct spans per corpus; widen to 128-bit
    before that).
    """
    from ..pipelines.components import _rkey
    from ..stages.util import reducer_count

    r = reducer_count()

    def _doc_spans(batch: pa.Table):
        """(row, span_idx, span_hash) per span — all-Arrow tokenization,
        span hash chained FNV over word hashes + word count."""
        col = batch[text_col]
        words = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        wlens, wstarts, wvalues = _string_views(flat)
        nonempty = np.nonzero(wlens > 0)[0]
        rows = parents[nonempty]
        # rank within row → span index
        rank = np.arange(len(rows)) - np.searchsorted(rows, rows, side="left")
        sidx = rank // span_words
        wh = _fnv1a_ragged(wlens[nonempty], wstarts[nonempty], wvalues)
        # combine word hashes within each (row, span): order-DEPENDENT
        # mix — multiply each word hash by a position-in-span constant,
        # then segment-sum (commutative ops on position-tagged values
        # keep order sensitivity)
        pos_in_span = (rank % span_words).astype(np.uint64)
        with np.errstate(over="ignore"):
            mixed = (wh + np.uint64(0x9E3779B97F4A7C15)) * (
                np.uint64(0xBF58476D1CE4E5B9) ** pos_in_span
            )
        key = rows.astype(np.uint64) * np.uint64(1 << 32) + sidx.astype(np.uint64)
        uk, inv = np.unique(key, return_inverse=True)
        with np.errstate(over="ignore"):
            sh = np.zeros(len(uk), dtype=np.uint64)
            np.add.at(sh, inv, mixed)
            cnt = np.bincount(inv).astype(np.uint64)
            sh = (sh ^ (cnt * np.uint64(0x94D049BB133111EB))) | np.uint64(1)
        return (uk // np.uint64(1 << 32)).astype(np.int64), (
            uk & np.uint64(0xFFFFFFFF)
        ).astype(np.int64), sh

    def spans_stage(batch: pa.Table) -> pa.Table:
        row, sidx, sh = _doc_spans(batch)
        ids = batch[id_col].to_numpy().astype(np.int64)
        h = sh.view(np.int64)
        return pa.table({
            "h": pa.array(h),
            "doc": pa.array(ids[row]),
            "sidx": pa.array(sidx),
            "rkey": pa.array(_rkey(h, r)),
        })

    def winners(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        doc = g["doc"].to_numpy()
        sidx = g["sidx"].to_numpy()
        order = np.lexsort((sidx, doc, h))
        h, doc, sidx = h[order], doc[order], sidx[order]
        first = np.r_[True, h[1:] != h[:-1]]
        return pa.table({
            "doc": pa.array(doc[first]),
            "sidx": pa.array(sidx[first]),
        })

    win = (
        ds.map_batches(spans_stage, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(winners, batch_format="pyarrow")
    )

    def tag_win(batch: pa.Table) -> pa.Table:
        doc = batch["doc"].to_numpy()
        return pa.table({
            "doc": batch["doc"],
            "sidx": batch["sidx"],
            "text": pa.array([None] * batch.num_rows, pa.string()),
            "dkey": pa.array(_rkey(doc, r)),
        })

    def tag_doc(batch: pa.Table) -> pa.Table:
        doc = batch[id_col].to_numpy().astype(np.int64)
        return pa.table({
            "doc": pa.array(doc),
            "sidx": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "text": batch[text_col].cast(pa.string()),
            "dkey": pa.array(_rkey(doc, r)),
        })

    unioned = win.map_batches(tag_win, batch_format="pyarrow").union(
        ds.map_batches(tag_doc, batch_format="pyarrow")
    )

    def rebuild(g: pa.Table) -> pa.Table:
        doc = g["doc"].to_numpy()
        sidx = g["sidx"].to_numpy()
        text = g["text"]
        doc_rows = np.nonzero(sidx == -1)[0]
        out_ids, out_text = [], []
        # winner idx set per doc
        keep_doc = doc[sidx >= 0]
        keep_idx = sidx[sidx >= 0]
        order = np.lexsort((keep_idx, keep_doc))
        keep_doc, keep_idx = keep_doc[order], keep_idx[order]
        bounds = np.searchsorted(keep_doc, doc[doc_rows], side="left")
        bounds_r = np.searchsorted(keep_doc, doc[doc_rows], side="right")
        import re

        ws = re.compile(r"\s+")
        for j, row in enumerate(doc_rows):
            t = text[int(row)].as_py() or ""
            toks = [w for w in ws.split(t.lower()) if w]
            spans = [
                " ".join(toks[i: i + span_words])
                for i in range(0, len(toks), span_words)
            ]
            kept = keep_idx[bounds[j]: bounds_r[j]]
            out_ids.append(int(doc[row]))
            out_text.append(" ".join(spans[i] for i in kept if i < len(spans)))
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "clean_text": pa.array(out_text, pa.string()),
        })

    from ..pipelines.components import _with_schema

    return _with_schema(
        unioned.groupby("dkey").map_groups(rebuild, batch_format="pyarrow"),
        {id_col: pa.int64(), "clean_text": pa.string()},
    )


def sql_span_dedup(table: str, id_col: str, span_words: int = 8) -> str:
    """DuckDB twin of :func:`span_dedup` (groups by actual span text —
    the engine's 64-bit span hash stands in for it)."""
    return f"""
        WITH w AS (
          SELECT {id_col}, pos, tok FROM (
            SELECT {id_col},
                   generate_subscripts(toks, 1) - 1 AS pos,
                   unnest(toks) AS tok
            FROM (SELECT {id_col},
                         list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x <> '') AS toks
                  FROM {table})
          )
        ),
        spans AS (
          SELECT {id_col}, pos // {span_words} AS span_idx,
                 string_agg(tok, ' ' ORDER BY pos) AS span
          FROM w GROUP BY {id_col}, pos // {span_words}
        ),
        win AS (
          SELECT {id_col}, span_idx FROM (
            SELECT {id_col}, span_idx,
                   ROW_NUMBER() OVER (PARTITION BY span
                                      ORDER BY {id_col}, span_idx) AS rn
            FROM spans) WHERE rn = 1
        )
        SELECT d.{id_col},
               COALESCE(s.clean_text, '') AS clean_text
        FROM {table} d LEFT JOIN (
          SELECT {id_col}, string_agg(span, ' ' ORDER BY span_idx) AS clean_text
          FROM spans JOIN win USING ({id_col}, span_idx)
          GROUP BY {id_col}
        ) s USING ({id_col})
    """


# -- sequence packing --------------------------------------------------------


def pack_sequences(ds, id_col: str, text_col: str = "text",
                   seq_len: int = 2048, bucket_shift: int = 16):
    """GPT-style concatenate-and-chunk packing plan: give every document
    its exclusive global token start offset (documents concatenated in
    ``id_col`` order) and the fixed-length training chunk (``pack_id``)
    its first token lands in.

    A distributed EXACT prefix sum with no global sort (the same
    two-pass shape as ``partition.spatial_partition``'s exact Hilbert
    rank):

    - pass 1: per-``(id >> bucket_shift)`` token totals — per-batch
      combiners, then a bucket-sized groupby (one 16-byte row per
      bucket, never per document);
    - driver: exclusive cumsum over the bucket totals (8 B/bucket;
      ``bucket_shift`` trades driver memory against bucket count —
      16 ⇒ 65k ids per bucket, so 10^12 ids need shift 24 for a 60 MB
      driver array, documented knob);
    - pass 2: reducers keyed on CONTIGUOUS bucket ranges compute the
      within-bucket exclusive cumsum for ALL their buckets in one
      vectorized pass and add the broadcast bucket base.

    Output: ``(id, n_tokens, start_offset, pack_id)``.  SQL twin:
    ``sum(n_tokens) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)`` — :func:`sql_pack_sequences`.
    """
    import pandas as pd

    from ..stages.util import reducer_count

    count = token_count_stage(id_col, text_col)

    def keyed(batch: pa.Table) -> pa.Table:
        t = count(batch)
        ids = t[id_col].to_numpy()
        return t.append_column(
            "bucket", pa.array((ids >> np.int64(bucket_shift)).astype(np.int64))
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def partial_sums(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy()
        n = batch["n_tokens"].to_numpy()
        uniq, inv = np.unique(b, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, n)
        return pa.table({"bucket": pa.array(uniq), "s": pa.array(s)})

    hist = (
        keyed_ds.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("bucket")
        .sum("s")
    )
    bks, sums = [], []
    for b in hist.iter_batches(batch_format="pyarrow"):
        bks.append(b["bucket"].to_numpy())
        sums.append(b["sum(s)"].to_numpy())
    bks = np.concatenate(bks) if bks else np.zeros(0, dtype=np.int64)
    sums = np.concatenate(sums) if sums else np.zeros(0, dtype=np.int64)
    order = np.argsort(bks)
    bks = bks[order]
    base = np.r_[np.int64(0), np.cumsum(sums[order])[:-1]]

    R = reducer_count()
    nb = max(1, len(bks))
    shift2 = max(0, int(np.ceil(np.log2(nb / max(2, R)))) if nb > R else 0)

    def add_rkey(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy()
        return batch.append_column("rkey", pa.array(b >> np.int64(shift2)))

    def pack_reducer(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy()
        tok = g["n_tokens"].to_numpy()
        bkt = g["bucket"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, tok, bkt = ids[order], tok[order], bkt[order]
        ecs = np.r_[np.int64(0), np.cumsum(tok)[:-1]]
        new_b = np.r_[True, bkt[1:] != bkt[:-1]]
        starts = np.nonzero(new_b)[0]
        seglen = np.diff(np.r_[starts, len(ids)])
        within = ecs - np.repeat(ecs[starts], seglen)
        start = base[np.searchsorted(bks, bkt)] + within
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(tok),
                "start_offset": pa.array(start),
                "pack_id": pa.array(start // np.int64(seq_len)),
            }
        )

    return (
        keyed_ds.map_batches(add_rkey, batch_format="pyarrow")
        .groupby("rkey")
        .map_groups(pack_reducer, batch_format="pyarrow")
    )


def sql_pack_sequences(table: str, id_col: str, text_col: str = "text",
                       seq_len: int = 2048) -> str:
    """DuckDB twin of :func:`pack_sequences`."""
    return f"""
        WITH t AS (
          SELECT {id_col},
                 CAST(len(list_filter(string_split_regex({text_col}, '\\s+'),
                          x -> x <> '')) AS BIGINT) AS n_tokens
          FROM {table})
        SELECT {id_col}, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                      ORDER BY {id_col}
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS start_offset,
               CAST(COALESCE(SUM(n_tokens) OVER (
                      ORDER BY {id_col}
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) // {seq_len} AS BIGINT) AS pack_id
        FROM t
    """


def inverted_index(ds, id_col: str, text_col: str = "text", min_df: int = 1):
    """Full-text inverted index: one row per term with its document
    frequency and the ascending-id posting list (comma-joined string —
    a stable, engine-neutral wire format).

    Scale shape: tokenization is the all-Arrow ``_doc_term_tf`` pass;
    the ONLY exchange carries distinct ``(term, id)`` pairs keyed on
    ``hash(term) % R`` (the term string + 8 B id — nothing else), and a
    reducer builds posting strings for ALL of its terms in one pass: a
    single lexsort groups ``(term, id)`` runs, ``pa.ListArray`` +
    ``pc.binary_join`` materialize the joined lists with zero per-term
    Python.  Postings for a df=10⁹ term would be a multi-GB string —
    at that scale cap df or emit ``list<int64>`` chunks per (term,
    shard); ``min_df`` bounds the tail instead (df < min_df terms are
    dropped AFTER the exchange, where df is exact).

    Mirrors the query surface of the reference's index-then-probe shape
    (reference: ``src/rtree/index.rs`` builds a static index once, many
    probes) for the text modality.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def term_id_pairs(batch: pa.Table) -> pa.Table:
        from ..stages.util import rkey_of

        rows, codes, _, dictionary = _doc_term_tf(batch, id_col, text_col)
        ids = batch[id_col].to_numpy().astype(np.int64)
        terms = dictionary.take(pa.array(codes))
        return pa.table(
            {"rkey": pa.array(rkey_of(terms, R)), "term": terms,
             id_col: pa.array(ids[rows])}
        )

    pairs = coalesce_for_shuffle(
        ds.map_batches(term_id_pairs, batch_format="pyarrow"), 0.5
    )

    _empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "postings": pa.array([], pa.string()),
        }
    )

    def build_postings(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        terms = g["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        dic = pc.dictionary_encode(terms)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, codes))
        cs, is_ = codes[order], ids[order]
        df = np.bincount(cs, minlength=len(dic.dictionary)).astype(np.int64)
        offsets = np.zeros(len(df) + 1, dtype=np.int32)
        offsets[1:] = np.cumsum(df)
        id_strs = pc.cast(pa.array(is_), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offsets), id_strs)
        postings = pc.binary_join(lists, ",")
        out = pa.table(
            {"term": dic.dictionary, "df": pa.array(df), "postings": postings}
        )
        if min_df > 1:
            out = out.filter(pc.greater_equal(out["df"], min_df))
        return out

    return pairs.groupby("rkey").map_groups(build_postings, batch_format="pyarrow")


def sql_inverted_index(table: str, id_col: str, text_col: str = "text",
                       min_df: int = 1) -> str:
    """DuckDB twin of :func:`inverted_index` (same lower → \\s+ split →
    drop-empties tokenization as the ``top_terms`` oracle)."""
    return f"""
        WITH toks AS (
          SELECT DISTINCT {id_col},
                 unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                        x -> x <> '')) AS term
          FROM {table})
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               string_agg(CAST({id_col} AS VARCHAR), ',' ORDER BY {id_col})
                 AS postings
        FROM toks GROUP BY term HAVING COUNT(*) >= {min_df}
    """


def bpe_top_merges(ds, text_col: str = "text", k: int = 20):
    """The first decision of BPE tokenizer training: the corpus's top-k
    most frequent ADJACENT BYTE PAIRS inside whitespace tokens
    (lowercased, ASCII-printable tokens — real BPE trainers operate on
    bytes, and the ASCII gate keeps the byte/character duality exact for
    the SQL twin).  Returns (pair, cnt, rnk), ROW_NUMBER semantics
    (cnt DESC, pair ASC).

    Per-batch combiner: pair codes are ``b1*256+b2`` uint16s read
    straight off the Arrow value buffer (one fancy-index per side, one
    np.unique per block — no per-word Python), so the exchange carries
    ≤ 65 536 rows per block regardless of corpus size; the final top-k
    is a tie-safe block top-k + sort over pair-vocabulary-sized rows.
    """
    _ASCII = r"^[ -~]+$"

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        keep = pc.match_substring_regex(flat, _ASCII)
        flat = flat.filter(keep)
        lens, starts, values = _string_views(flat)
        npair = np.maximum(lens - 1, 0)
        total = int(npair.sum())
        if total == 0:
            return pa.table(
                {"code": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        rep = np.repeat(np.arange(len(lens)), npair)
        pos = np.arange(total) - np.repeat(np.cumsum(npair) - npair, npair)
        base = starts[rep] + pos
        code = values[base].astype(np.int64) * 256 + values[base + 1]
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {"code": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("code")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
    )

    def to_pair(batch: pa.Table) -> pa.Table:
        code = batch["code"].to_numpy()
        raw = np.empty((len(code), 2), dtype=np.uint8)
        raw[:, 0] = code // 256
        raw[:, 1] = code % 256
        offs = (np.arange(len(code) + 1, dtype=np.int64) * 2).astype(np.int32)
        pair = pa.StringArray.from_buffers(
            len(code), pa.py_buffer(offs.tobytes()), pa.py_buffer(raw.tobytes())
        )
        return pa.table({"pair": pair, "cnt": batch["cnt"]})

    def block_topk(batch: pa.Table) -> pa.Table:
        cnt = batch["cnt"].to_numpy()
        if len(cnt) <= k:
            return batch
        kth = -np.partition(-cnt, k - 1)[k - 1]
        return batch.filter(pa.array(cnt >= kth))  # ties survive to the sort

    top = (
        totals.map_batches(to_pair, batch_format="pyarrow")
        .map_batches(block_topk, batch_format="pyarrow")
        .sort(["cnt", "pair"], descending=[True, False])
        .limit(k)
    )

    def add_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rnk", pa.array(np.arange(1, batch.num_rows + 1, dtype=np.int64))
        )

    # limit(k) yields a single ordered block, so ranks are positional
    return top.repartition(1).map_batches(add_rank, batch_format="pyarrow")


def sql_bpe_top_merges(table: str, text_col: str = "text", k: int = 20) -> str:
    """DuckDB twin of :func:`bpe_top_merges`."""
    return f"""
        WITH w AS (
          SELECT unnest(list_filter(string_split_regex(lower({text_col}), '\\s+'),
                 x -> x <> '' AND regexp_matches(x, '^[ -~]+$'))) AS w
          FROM {table}),
        p AS (
          SELECT substr(w, CAST(t.i AS INT), 2) AS pair
          FROM w, UNNEST(generate_series(1, CAST(length(w) - 1 AS BIGINT))) AS t(i)
          WHERE length(w) >= 2),
        c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM p GROUP BY 1)
        SELECT pair, cnt, rnk FROM (
          SELECT pair, cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT)
                   AS rnk
          FROM c
        ) WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# batched model inference: hashed-feature linear scorer
# ---------------------------------------------------------------------------

_SCORER_GOLD = 2654435761
_SCORER_MOD = 1000003
_SCORER_HALF = 500001


def scorer_weights(num_buckets: int) -> np.ndarray:
    """The deterministic weight table w[b] = ((b+1)·2654435761) mod
    1000003 − 500001 — integer-exact, so the SQL oracle recomputes the
    model instead of trusting a serialized artifact.  Stands in for a
    trained fasttext-style quality classifier; swapping in real weights
    changes nothing about the serving path."""
    b = np.arange(num_buckets, dtype=np.int64)
    return (b + 1) * _SCORER_GOLD % _SCORER_MOD - _SCORER_HALF


class HashedLinearScorer:
    """Actor-pool inference stage: hashed-unigram linear model.

    The canonical batched-model-inference shape on Ray Data: the weight
    table is ``ray.put`` into the object store ONCE by the pipeline
    builder; each actor resolves it ONCE in ``__init__`` (plasma-local,
    zero-copy) and every ``__call__`` is pure vectorized numpy — Arrow
    tokenize, ragged FNV-1a per token, bucket gather, exact int64
    segment sums.  10^12-doc shape: weights move node-count times, not
    task-count times; nothing per-batch touches the driver.
    """

    def __init__(self, id_col: str, text_col: str, weights_ref,
                 num_buckets: int):
        import ray

        self.id_col = id_col
        self.text_col = text_col
        self.w = ray.get(weights_ref) if not isinstance(
            weights_ref, np.ndarray
        ) else weights_ref
        self.num_buckets = np.uint64(num_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        words = pc.split_pattern_regex(
            pc.utf8_lower(batch[self.text_col]), r"\s+"
        )
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        wlens, wstarts, wvals = _string_views(flat)
        nonempty = wlens > 0
        h = _fnv1a_ragged(wlens[nonempty], wstarts[nonempty], wvals)
        rows = parents[nonempty]
        wt = self.w[(h % self.num_buckets).astype(np.int64)]
        score = np.zeros(n, dtype=np.int64)
        np.add.at(score, rows, wt)
        n_tok = np.bincount(rows, minlength=n).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tok": pa.array(n_tok),
                "score": pa.array(score),
                "label": pa.array(score > 0),
            }
        )


def model_score(ds, id_col: str, text_col: str = "text",
                num_buckets: int = 1024, concurrency: int = 2,
                batch_size: int = 4096):
    """Score every document with the hashed-feature linear model
    (broadcast weights + actor pool)."""
    import ray

    weights_ref = ray.put(scorer_weights(num_buckets))
    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={
            "id_col": id_col, "text_col": text_col,
            "weights_ref": weights_ref, "num_buckets": num_buckets,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sql_model_score(table: str, id_col: str, num_buckets: int = 1024) -> str:
    """DuckDB twin: recompute every token's hash, bucket, and weight with
    the same integer arithmetic (empty-token filter and zero-token docs
    filled exactly like the stage)."""
    from ..functions.sqltext import sql_fnv1a_of

    return f"""
WITH tok AS (
  SELECT {id_col}, t.t AS tok
  FROM {table},
       UNNEST(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                          x -> x <> '')) AS t(t)
),
wt AS (
  SELECT {id_col},
         CAST((({sql_fnv1a_of('tok')} % {num_buckets}) + 1)
              * {_SCORER_GOLD} % {_SCORER_MOD} - {_SCORER_HALF} AS BIGINT)
           AS w
  FROM tok
),
agg AS (
  SELECT {id_col}, COUNT(*) AS n_tok, SUM(w) AS score
  FROM wt GROUP BY {id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(agg.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(COALESCE(agg.score, 0) AS BIGINT) AS score,
       COALESCE(agg.score, 0) > 0 AS label
FROM {table} d LEFT JOIN agg USING ({id_col})
"""


# -- RAG chunking -------------------------------------------------------------


def chunk_words(ds, size: int, overlap: int = 0, id_col: str = "doc_id",
                text_col: str = "text"):
    """Split each document into overlapping word-window chunks for RAG
    indexing: chunk ``k`` covers words ``[k·stride, k·stride + size)``
    with ``stride = size − overlap``; the last chunk may be shorter and
    every word starts exactly one chunk's window, so coverage is total.

    Returns (id_col, chunk_id:int64, chunk:string, n_tok:int64) — one row
    per chunk, equivalent to SQL
    ``array_to_string(string_split(text,' ')[k·stride+1 : k·stride+size], ' ')``.

    Shape: a pure ``map_batches`` stage — no shuffle, embarrassingly
    parallel, the natural pre-stage for an embedding actor pool.  Word
    boundaries are found with one numpy scan over the batch's Arrow value
    buffer (byte 0x20 — documents are single-space tokenized; multi-space
    runs would yield empty words exactly as SQL ``string_split`` does) and
    each chunk's text is ONE ragged byte-range gather from the original
    buffer: tokens are never materialized as a list column and each output
    byte is copied exactly once.  Overlapping windows duplicate only the
    overlap bytes (size/stride amplification), the documented cost of
    overlap.
    """
    stride = size - overlap
    assert 0 < stride <= size, "need 0 <= overlap < size"

    def stage(batch: pa.Table) -> pa.Table:
        lens, starts, values = _string_views(batch[text_col])
        n = len(lens)
        ends = starts + lens
        # spaces inside any document's byte range (the value buffer may
        # carry slack outside the slice)
        sp = np.nonzero(values == 0x20)[0]
        di = np.searchsorted(starts, sp, side="right") - 1
        ok = (di >= 0) & (sp >= starts[di]) & (sp < ends[di])
        sp, di = sp[ok], di[ok]
        # global token-start offsets, doc-major (doc starts and the byte
        # after each space interleave in sorted order)
        tstart = np.empty(n + len(sp), dtype=np.int64)
        n_tok = np.bincount(di, minlength=n).astype(np.int64) + 1
        tok_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_tok, out=tok_off[1:])
        tstart[tok_off[:-1]] = starts
        rest = np.arange(len(sp), dtype=np.int64) + 1 + di  # skip doc-start slots
        tstart[rest] = sp + 1
        T = tok_off[-1]
        # exclusive token end = next token's start − 1 (the space); the
        # last token of each doc ends at the doc end
        tendx = np.empty(T, dtype=np.int64)
        if T > 1:
            tendx[: T - 1] = tstart[1:] - 1
        tendx[tok_off[1:] - 1] = ends

        n_chunks = (n_tok - 1) // stride + 1
        total = int(n_chunks.sum())
        reps = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        cid = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        first = tok_off[reps] + cid * stride
        last = np.minimum(first + size, tok_off[reps] + n_tok[reps]) - 1
        bs = tstart[first]
        be = tendx[last]
        out_len = be - bs
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(out_len, out=out_off[1:])
        nbytes = int(out_off[-1])
        if nbytes and len(values):
            gather = np.repeat(bs - out_off[:-1], out_len) + np.arange(nbytes)
            data = values[gather]
        else:
            data = np.empty(0, np.uint8)
        chunk = pa.LargeStringArray.from_buffers(
            total, pa.py_buffer(out_off.tobytes()), pa.py_buffer(data.tobytes())
        )
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(reps)),
                "chunk_id": pa.array(cid),
                "chunk": chunk,
                "n_tok": pa.array(last - first + 1),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def sql_chunk_words(table: str, id_col: str, size: int, overlap: int) -> str:
    """DuckDB twin of :func:`chunk_words` (word windows over a
    single-space split)."""
    s = size - overlap
    return f"""
WITH w AS (SELECT {id_col}, string_split(text, ' ') AS toks FROM {table}),
e AS (
  SELECT {id_col}, toks,
         unnest(generate_series(0, (len(toks) - 1) // {s})) AS k
  FROM w
)
SELECT {id_col}, k AS chunk_id,
       array_to_string(toks[k*{s}+1 : k*{s}+{size}], ' ') AS chunk,
       CAST(len(toks[k*{s}+1 : k*{s}+{size}]) AS BIGINT) AS n_tok
FROM e
"""


# -- bigram language-model fluency score (CCNet-style filter) ----------------


def _doc_token_stream(batch: pa.Table, text_col: str):
    """(doc_row, tokens) in document order — the shared tokenizer
    (lower → ``\\s+`` split → drop empties) WITHOUT the tf aggregation of
    :func:`_doc_term_tf`, so adjacency survives for n-gram models."""
    col = batch[text_col]
    words = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    wlens, _, _ = _string_views(flat)
    nonempty = wlens > 0
    toks = flat.filter(pa.array(nonempty))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return parents[nonempty], toks


# Bigram join separator. Tokens are produced by an RE2 \s+ split, so no
# token can contain a space — "w1 w2" therefore decomposes uniquely and
# per-block dictionary grouping on the joined string cannot merge two
# distinct (w1, w2) pairs. (A non-\s byte like \x1f would NOT be safe:
# tokens may legally contain it, and 'a\x1fb'+'c' / 'a'+'b\x1fc' would
# collide, mis-attributing counts.)
_LM_SEP = " "


def lm_bigram_score(ds, id_col: str, text_col: str = "text",
                    scale_bits: int = 20, *,
                    max_broadcast_terms: int = TFIDF_BROADCAST_MAX_TERMS,
                    force_join_path: bool = False):
    """Corpus-trained bigram language-model fluency score per document —
    the CCNet-style "does this read like the rest of the corpus" filter,
    with INTEGER-QUANTIZED add-one transition probabilities so the score
    is hash-exact against the SQL oracle (no transcendentals, no
    order-dependent float sums):

        pq(w1 w2) = (2^scale_bits * (c(w1 w2) + 1)) // (c(w1) + V)
        lm_score(doc) = Σ pq over the doc's bigram occurrences / n_bigrams

    where c(·) are corpus occurrence counts and V is the distinct-unigram
    vocabulary size.  Per-bigram pq ≤ 2^scale_bits (c(w1w2) ≤ c(w1)), the
    per-doc sum is an exact int64, and the single final int/int division
    is the only float op — bit-identical on both sides.  Valid while the
    hottest bigram count stays below 2^(63-scale_bits) occurrences
    (2^43 ≈ 8·10^12 at the default — beyond any real corpus term).

    Output (id, n_bigrams, lm_score) for documents with ≥ 1 bigram
    (single-token / empty docs have no transitions — inner-join
    semantics, as in the oracle).

    Scale shape: pass 1 reduces per-block unigram partials through a
    vocabulary-bounded groupby; below ``max_broadcast_terms`` the count
    table broadcasts (``ray.put``) — same measured size gate as
    ``top_tfidf_terms``.  At open-web vocabulary (or with
    ``force_join_path``) the unigram side instead stays a Dataset and
    the per-(doc, bigram) occurrence rows attach c(w1) through a second
    string-keyed :func:`~..pipelines.relational.hash_join` on w1 —
    nothing driver-collected, identical integer arithmetic.  The
    BIGRAM count table (the side that grows with the corpus) is never
    broadcast and never pinned: it stays a Dataset and meets the per-doc
    occurrence rows in a string-keyed :func:`~..pipelines.relational.hash_join`
    (lean slot exchange, hash routes / key rides).  The corpus is
    tokenized twice (counts pass + scoring pass) rather than pinning a
    corpus-sized intermediate.  Final per-doc reduce is a coarse-key
    vectorized merge (rule 3).
    """
    import ray

    from .relational import hash_join
    from ..stages.util import coalesce_for_shuffle, reducer_count, rkey_of

    scale = np.int64(1) << np.int64(scale_bits)

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, toks = _doc_token_stream(batch, text_col)
        dic = pc.dictionary_encode(toks)
        cnt = np.bincount(
            dic.indices.to_numpy(zero_copy_only=False),
            minlength=len(dic.dictionary),
        ).astype(np.int64)
        return pa.table({"term": dic.dictionary, "c": pa.array(cnt)})

    uni_ds = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("c")
        .map_batches(
            lambda t: t.rename_columns(["term", "c"]), batch_format="pyarrow"
        )
        .materialize()
    )
    n_terms = uni_ds.count()
    V = np.int64(n_terms)
    join_unigrams = force_join_path or n_terms > max_broadcast_terms
    if join_unigrams:
        uni_ref = None
    else:
        uni = uni_ds.to_pandas()
        uni_ref = ray.put(
            (
                pa.array(uni["term"].tolist(), pa.string()),
                uni["c"].to_numpy().astype(np.int64),
            )
        )

    def _block_bigrams(batch: pa.Table):
        """(doc_row, w1_tokens, bigram_strings) for one batch."""
        rows, toks = _doc_token_stream(batch, text_col)
        if len(toks) < 2:
            e = pa.array([], pa.string())
            return np.empty(0, np.int64), e, e
        adj = pa.array(rows[1:] == rows[:-1])
        w1 = toks.slice(0, len(toks) - 1).filter(adj)
        w2 = toks.slice(1).filter(adj)
        big = pc.binary_join_element_wise(w1, w2, _LM_SEP)
        return rows[:-1][rows[1:] == rows[:-1]], w1, big

    def big_partial(batch: pa.Table) -> pa.Table:
        _, _, big = _block_bigrams(batch)
        dic = pc.dictionary_encode(big)
        cnt = np.bincount(
            dic.indices.to_numpy(zero_copy_only=False),
            minlength=len(dic.dictionary),
        ).astype(np.int64)
        return pa.table({"bigram": dic.dictionary, "cb": pa.array(cnt)})

    cb_ds = (
        coalesce_for_shuffle(
            ds.map_batches(big_partial, batch_format="pyarrow"), 0.5
        )
        .groupby("bigram")
        .sum("cb")
        .map_batches(
            lambda t: t.rename_columns(["bigram", "cb"]),
            batch_format="pyarrow",
        )
    )

    def occ_stage(batch: pa.Table) -> pa.Table:
        drows, w1, big = _block_bigrams(batch)
        dic = pc.dictionary_encode(big)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = max(len(dic.dictionary), 1)
        pair, first, occ = np.unique(
            drows * vocab + codes, return_index=True, return_counts=True
        )
        prow, pcode = pair // vocab, pair % vocab
        out = {
            id_col: batch[id_col].take(pa.array(prow)),
            "bigram": dic.dictionary.take(pa.array(pcode)),
            "occ": pa.array(occ.astype(np.int64)),
        }
        if uni_ref is not None:
            # c(w1) lookup from the broadcast unigram table (every
            # pass-2 token was counted in pass 1, so index_in always
            # hits)
            terms_bc, cnt_bc = ray.get(uni_ref)
            pos = pc.index_in(
                w1.take(pa.array(first)), value_set=terms_bc
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            out["cu"] = pa.array(cnt_bc[pos])
        else:
            # open-vocab path: carry w1 and attach c(w1) via hash_join
            out["w1"] = w1.take(pa.array(first))
        return pa.table(out)

    occ_ds = ds.map_batches(occ_stage, batch_format="pyarrow")
    if join_unigrams:
        occ_ds = hash_join(
            occ_ds, uni_ds, "w1", "term",
            [id_col, "bigram", "occ"], ["c"], how="inner",
        ).map_batches(
            lambda t: t.rename_columns([id_col, "bigram", "occ", "cu"]),
            batch_format="pyarrow",
        )
    joined = hash_join(
        occ_ds, cb_ds, "bigram", "bigram",
        [id_col, "occ", "cu"], ["cb"], how="inner",
    )

    R = reducer_count()

    def pq_partial(batch: pa.Table) -> pa.Table:
        occ = batch["occ"].to_numpy(zero_copy_only=False)
        cu = batch["cu"].to_numpy(zero_copy_only=False)
        cb = batch["cb"].to_numpy(zero_copy_only=False)
        pq = occ * ((scale * (cb + np.int64(1))) // (cu + V))
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        dic = pc.dictionary_encode(ids)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        nk = len(dic.dictionary)
        s = np.zeros(nk, dtype=np.int64)
        nb = np.zeros(nk, dtype=np.int64)
        np.add.at(s, codes, pq)
        np.add.at(nb, codes, occ)
        key = dic.dictionary
        return pa.table(
            {
                id_col: key,
                "s": pa.array(s),
                "nb": pa.array(nb),
                "rkey": pa.array(rkey_of(key, R)),
            }
        )

    def final_many(g: pa.Table) -> pa.Table:
        ids = g[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        dic = pc.dictionary_encode(ids)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        nk = len(dic.dictionary)
        s = np.zeros(nk, dtype=np.int64)
        nb = np.zeros(nk, dtype=np.int64)
        np.add.at(s, codes, g["s"].to_numpy(zero_copy_only=False))
        np.add.at(nb, codes, g["nb"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                id_col: dic.dictionary,
                "n_bigrams": pa.array(nb),
                "lm_score": pa.array(s.astype(np.float64) / nb),
            }
        )

    return (
        coalesce_for_shuffle(
            joined.map_batches(pq_partial, batch_format="pyarrow"), 0.5
        )
        .groupby("rkey")
        .map_groups(final_many, batch_format="pyarrow")
    )


def sql_lm_bigram_score(table: str, id_col: str, scale_bits: int = 20) -> str:
    """DuckDB twin of :func:`lm_bigram_score` — same tokenizer, same
    integer-quantized add-one bigram probability, same single final
    division."""
    scale = 1 << scale_bits
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM {table}
),
w AS (SELECT {id_col}, unnest(l) AS term FROM toks),
bg AS (
  SELECT {id_col}, l[i] AS w1, l[i] || chr(31) || l[i+1] AS bigram
  FROM toks, unnest(range(1, len(l))) AS r(i)
),
cu AS (SELECT term, COUNT(*) AS c FROM w GROUP BY 1),
vv AS (SELECT COUNT(*) AS v FROM cu),
cb AS (SELECT bigram, COUNT(*) AS c FROM bg GROUP BY 1),
pq AS (
  SELECT bg.{id_col},
         ({scale} * (cb.c + 1)) // (cu.c + vv.v) AS pq
  FROM bg JOIN cb USING (bigram) JOIN cu ON bg.w1 = cu.term CROSS JOIN vv
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(pq) AS DOUBLE) / COUNT(*) AS lm_score
FROM pq GROUP BY {id_col}
"""


# -- PMI collocations ---------------------------------------------------------


def top_collocations(ds, text_col: str = "text", k: int = 30,
                     min_count: int = 5, scale_bits: int = 20):
    """Corpus top-k collocations: adjacent word pairs ranked by
    INTEGER-QUANTIZED pointwise mutual information,

        pmi_q = ((2^scale_bits * c12) // c1 * N) // c2

    (c1/c2/c12 = corpus unigram/bigram occurrence counts, N = total token
    occurrences) — the staged floor divisions are deterministic on both
    sides, so the ranking is hash-exact against the SQL twin with no
    transcendentals.  Overflow audit: ``(2^b * c12) // c1 ≤ 2^b`` (since
    c12 ≤ c1), so the second product ≤ 2^b·N — exact int64 while
    N < 2^43 ≈ 8·10¹² tokens.

    Returns (w1, w2, c12, pmi_q, rnk) for pairs with c12 ≥ ``min_count``,
    ROW_NUMBER semantics (pmi_q DESC, w1, w2).

    Scale shape: unigram table vocabulary-bounded, reduced via groupby
    then broadcast once (``ray.put``) — the ``top_tfidf_terms`` trade;
    bigram counts reduce under ``groupby(w1, w2)`` (pair-vocabulary-sized,
    already min_count-filtered per-block partials would under-count, so
    the filter runs AFTER the global sum); final top-k is a tie-safe
    block top-k + sort over surviving pair rows only.
    """
    import ray

    scale = np.int64(1) << np.int64(scale_bits)

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, toks = _doc_token_stream(batch, text_col)
        dic = pc.dictionary_encode(toks)
        cnt = np.bincount(
            dic.indices.to_numpy(zero_copy_only=False),
            minlength=len(dic.dictionary),
        ).astype(np.int64)
        return pa.table({"term": dic.dictionary, "c": pa.array(cnt)})

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("c")
        .to_pandas()
    )
    cnts = uni["sum(c)"].to_numpy().astype(np.int64)
    N = np.int64(cnts.sum())
    uni_ref = ray.put((pa.array(uni["term"].tolist(), pa.string()), cnts))

    def big_partial(batch: pa.Table) -> pa.Table:
        rows, toks = _doc_token_stream(batch, text_col)
        if len(toks) < 2:
            e = pa.array([], pa.string())
            return pa.table(
                {"w1": e, "w2": e, "c12": pa.array([], pa.int64())}
            )
        adj = pa.array(rows[1:] == rows[:-1])
        w1 = toks.slice(0, len(toks) - 1).filter(adj)
        w2 = toks.slice(1).filter(adj)
        big = pc.binary_join_element_wise(w1, w2, _LM_SEP)
        dic = pc.dictionary_encode(big)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        first = np.unique(codes, return_index=True)[1]
        cnt = np.bincount(codes, minlength=len(dic.dictionary)).astype(np.int64)
        # w1/w2 carried from each pair's first occurrence rather than by
        # re-splitting the joined key; the space separator makes the
        # joined key collision-free (see _LM_SEP), so first-occurrence
        # sides are THE sides for every occurrence in the group
        codes_at_first = codes[first]
        return pa.table(
            {
                "w1": w1.take(pa.array(first)),
                "w2": w2.take(pa.array(first)),
                "c12": pa.array(cnt[codes_at_first]),
            }
        )

    totals = (
        ds.map_batches(big_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .sum("c12")
        .map_batches(
            lambda t: t.rename_columns(["w1", "w2", "c12"]),
            batch_format="pyarrow",
        )
    )

    def pmi_stage(batch: pa.Table) -> pa.Table:
        terms_bc, cnt_bc = ray.get(uni_ref)
        c12 = batch["c12"].to_numpy(zero_copy_only=False)
        keep = c12 >= min_count
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "c12": pa.array([], pa.int64()),
                    "pmi_q": pa.array([], pa.int64()),
                }
            )
        c12 = c12[keep]
        p1 = pc.index_in(batch["w1"], value_set=terms_bc).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        p2 = pc.index_in(batch["w2"], value_set=terms_bc).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pmi = (scale * c12) // cnt_bc[p1] * N // cnt_bc[p2]
        return pa.table(
            {
                "w1": batch["w1"],
                "w2": batch["w2"],
                "c12": pa.array(c12),
                "pmi_q": pa.array(pmi),
            }
        )

    def block_topk(batch: pa.Table) -> pa.Table:
        v = batch["pmi_q"].to_numpy()
        if len(v) <= k:
            return batch
        kth = -np.partition(-v, k - 1)[k - 1]
        return batch.filter(pa.array(v >= kth))  # ties survive to the sort

    top = (
        totals.map_batches(pmi_stage, batch_format="pyarrow")
        .map_batches(block_topk, batch_format="pyarrow")
        .sort(["pmi_q", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )

    def add_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rnk", pa.array(np.arange(1, batch.num_rows + 1, dtype=np.int64))
        )

    return top.repartition(1).map_batches(add_rank, batch_format="pyarrow")


def sql_top_collocations(table: str, text_col: str = "text", k: int = 30,
                         min_count: int = 5, scale_bits: int = 20) -> str:
    """DuckDB twin of :func:`top_collocations` — same tokenizer, same
    staged integer floor divisions."""
    scale = 1 << scale_bits
    return f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     x -> x <> '') AS l
  FROM {table}
),
w AS (SELECT unnest(l) AS term FROM toks),
nn AS (SELECT COUNT(*) AS n FROM w),
bg AS (
  SELECT l[i] AS w1, l[i+1] AS w2
  FROM toks, unnest(range(1, len(l))) AS r(i)
),
cu AS (SELECT term, COUNT(*) AS c FROM w GROUP BY 1),
cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg
       GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}),
pm AS (
  SELECT cb.w1, cb.w2, cb.c12,
         ({scale} * cb.c12) // u1.c * nn.n // u2.c AS pmi_q
  FROM cb JOIN cu u1 ON cb.w1 = u1.term JOIN cu u2 ON cb.w2 = u2.term
  CROSS JOIN nn
)
SELECT w1, w2, c12, pmi_q, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY pmi_q DESC, w1, w2) AS BIGINT)
            AS rnk
  FROM pm
) WHERE rnk <= {k}
"""
