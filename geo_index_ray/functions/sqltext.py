"""DuckDB-SQL twins of the text/hash kernels — oracle generators.

Every kernel in ``pipelines.text`` / ``pipelines.dedup`` that the engine
claims as deterministic has its arithmetic re-expressed here in ANSI-ish
DuckDB SQL (HUGEINT emulating uint64 wrap, list lambdas for rolling
hashes), so the correctness driver can hash-compare the Ray output against
an independent engine.  Keep these in lockstep with the numpy kernels —
any change there must change the SQL here.
"""

from __future__ import annotations

M64 = "18446744073709551616"  # 2^64
I63 = "9223372036854775808"  # 2^63
P61 = (1 << 61) - 1
FNV_OFFSET = "CAST(14695981039346656037 AS HUGEINT)"  # 0xCBF29CE484222325
FNV_PRIME = 1099511628211


def fnv_step(h: str, c: str) -> str:
    """One FNV-1a byte step on a HUGEINT-held uint64: h = (h^c)*prime
    mod 2^64.  ``c`` < 256, so the xor only touches the low byte —
    emulated exactly with BIGINT xor on ``h % 256``."""
    return (
        f"((({h}) - ({h}) % 256 + xor(CAST(({h}) % 256 AS BIGINT), {c}))"
        f" * {FNV_PRIME}) % {M64}"
    )


def u64_to_i64(expr: str) -> str:
    """Reinterpret a uint64-in-HUGEINT as int64 (numpy .view(int64))."""
    return (
        f"CAST(CASE WHEN ({expr}) >= {I63} THEN ({expr}) - {M64}"
        f" ELSE ({expr}) END AS BIGINT)"
    )


def sql_fnv1a_of(text_expr: str) -> str:
    """Whole-string FNV-1a (pipelines.text.fingerprint_stage /
    dedup._text_hash64) via list_reduce over the codepoints (ASCII ⇒
    codepoint == UTF-8 byte)."""
    # string_split('', '') yields [''] — filter it so the empty string
    # folds to the bare offset basis like the numpy kernel
    codes = (
        f"list_transform(list_filter(string_split({text_expr}, ''), c -> c <> ''),"
        " c -> CAST(unicode(c) AS HUGEINT))"
    )
    return (
        f"list_reduce(list_prepend({FNV_OFFSET}, {codes}),"
        f" (h, c) -> {fnv_step('h', 'c')})"
    )


def sql_shingle_hash(k: int = 5, pos: str = "i", text: str = "text") -> str:
    """Unrolled k-byte rolling FNV at 1-based position ``pos`` — the SQL
    twin of dedup._shingle_hashes' window hash."""
    h = FNV_OFFSET
    for j in range(k):
        # texts shorter than k are zero-padded to k bytes (numpy kernel
        # semantics) — substr past the end yields '', which maps to byte 0
        c = f"COALESCE(unicode(nullif(substr({text}, {pos} + {j}, 1), '')), 0)"
        h = fnv_step(h, c)
    return h


def sql_shingle_cte(table: str, id_col: str, k: int = 5) -> str:
    """Distinct (id, shingle-hash) rows for every k-gram of ``text``.

    The FNV steps chain through nested-SELECT COLUMNS instead of one
    inlined expression: ``fnv_step`` references its ``h`` argument three
    times, so textual unrolling is 3^k in size (k=12 → ~5·10⁵ copies of
    the innermost term — DuckDB spent minutes just parsing it); the
    column chain is linear in k with bit-identical arithmetic.
    """
    q = (
        f"(SELECT {id_col}, i, text FROM {table}, "
        f"UNNEST(generate_series(1, CAST(GREATEST(length(text) - {k - 1},"
        f" 1) AS BIGINT))) AS t(i))"
    )
    h = str(FNV_OFFSET)
    for j in range(k):
        c = f"COALESCE(unicode(nullif(substr(text, i + {j}, 1), '')), 0)"
        q = (
            f"(SELECT {id_col}, i, text, {fnv_step(h, c)} AS h{j} "
            f"FROM {q})"
        )
        h = f"h{j}"
    return f"SELECT DISTINCT {id_col}, {h} AS h FROM {q}"


def sql_simhash_select(table: str, id_col: str) -> str:
    """(id, simhash int64) — the twin of dedup.simhash_stage: FNV-1a per
    whitespace token, 64 per-bit sign votes, bits packed MSB-safe via
    HUGEINT then viewed as int64."""
    tok_hash = sql_fnv1a_of("tok")
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64)
    )
    total = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS HUGEINT)"
        " ELSE CAST(0 AS HUGEINT) END"
        for b in range(64)
    )
    return f"""
WITH __toks AS (
  SELECT {id_col},
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
  FROM {table}
),
__th AS (SELECT {id_col}, {tok_hash} AS h FROM __toks),
__votes AS (SELECT {id_col}, {votes} FROM __th GROUP BY {id_col}),
__tot AS (SELECT {id_col}, {total} AS total FROM __votes)
SELECT d.{id_col}, COALESCE({u64_to_i64('t.total')}, 0) AS simhash
FROM {table} d LEFT JOIN __tot t USING ({id_col})
"""


def sql_minhash_pairs(
    table: str,
    id_col: str,
    a_params,
    b_params,
    num_perm: int,
    rows_per_band: int,
    threshold: float,
    k: int = 5,
) -> str:
    """Twin of dedup.minhash_dedup: per-id minhash signatures (uint64-wrap
    arithmetic identical to the numpy kernel), star pairs (signature-class
    representative → member, est 1.0), and representative candidate pairs
    that share a full band with est = matching-fraction ≥ threshold."""
    perm_vals = ", ".join(
        f"({i}, CAST({int(a_params[i])} AS HUGEINT),"
        f" CAST({int(b_params[i])} AS HUGEINT))"
        for i in range(num_perm)
    )
    return f"""
WITH __sh AS ({sql_shingle_cte(table, id_col, k)}),
__perms(p, a, b) AS (VALUES {perm_vals}),
__sig AS (
  SELECT {id_col}, p,
         MIN(((a * (h % {P61})) % {M64} + b) % {M64} % {P61}) AS m
  FROM __sh CROSS JOIN __perms GROUP BY {id_col}, p
),
__sigv AS (SELECT {id_col}, LIST(m ORDER BY p) AS sig FROM __sig GROUP BY {id_col}),
__star AS (SELECT {id_col}, MIN({id_col}) OVER (PARTITION BY sig) AS rep FROM __sigv),
__exact AS (
  SELECT rep AS a_id, {id_col} AS b_id, 1.0 AS est_jaccard
  FROM __star WHERE {id_col} <> rep
),
__reps AS (SELECT {id_col} FROM __star WHERE {id_col} = rep),
__rsig AS (SELECT s.* FROM __sig s JOIN __reps r USING ({id_col})),
__pband AS (
  SELECT sa.{id_col} AS a_id, sb.{id_col} AS b_id, sa.p // {rows_per_band} AS band,
         SUM(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS beq
  FROM __rsig sa JOIN __rsig sb
    ON sa.p = sb.p AND sa.{id_col} < sb.{id_col}
  GROUP BY 1, 2, 3
),
__perpair AS (
  SELECT a_id, b_id, SUM(beq) AS neq,
         MAX(CASE WHEN beq = {rows_per_band} THEN 1 ELSE 0 END) AS cand
  FROM __pband GROUP BY 1, 2
),
__cands AS (
  SELECT a_id, b_id, neq / {num_perm}.0 AS est_jaccard FROM __perpair
  WHERE cand = 1 AND neq / {num_perm}.0 >= {threshold} AND neq < {num_perm}
)
SELECT * FROM __exact UNION ALL SELECT * FROM __cands
"""


def sql_ngram_jaccard_pairs(table: str, id_col: str, threshold: float,
                            k: int = 5) -> str:
    """Twin of dedup.ngram_jaccard_dedup (which has exact recall): all id
    pairs with exact k-gram-set Jaccard ≥ threshold via a join on shingle
    hashes."""
    return f"""
WITH __sh AS ({sql_shingle_cte(table, id_col, k)}),
__cnt AS (SELECT {id_col}, COUNT(*) AS n FROM __sh GROUP BY 1),
__inter AS (
  SELECT x.{id_col} AS a_id, y.{id_col} AS b_id, COUNT(*) AS i
  FROM __sh x JOIN __sh y ON x.h = y.h AND x.{id_col} < y.{id_col}
  GROUP BY 1, 2
)
SELECT a_id, b_id FROM __inter
JOIN __cnt ca ON ca.{id_col} = a_id JOIN __cnt cb ON cb.{id_col} = b_id
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= {threshold}
"""


def sql_ngram_similarity_join(table: str, id_col: str, side_pred: str,
                              threshold: float, k: int = 5) -> str:
    """Twin of dedup.ngram_jaccard_dedup(side_of=...): cross-side pairs
    with exact k-gram Jaccard ≥ threshold, oriented (a_id = side-True,
    b_id = side-False).  ``side_pred`` is a SQL boolean over ``{id_col}``
    (e.g. ``doc_id % 37 = 0``)."""
    return f"""
WITH __sh AS ({sql_shingle_cte(table, id_col, k)}),
__cnt AS (SELECT {id_col}, COUNT(*) AS n FROM __sh GROUP BY 1),
__inter AS (
  SELECT x.{id_col} AS a_id, y.{id_col} AS b_id, COUNT(*) AS i
  FROM __sh x JOIN __sh y ON x.h = y.h
  WHERE ({side_pred.replace(id_col, 'x.' + id_col)})
    AND NOT ({side_pred.replace(id_col, 'y.' + id_col)})
  GROUP BY 1, 2
)
SELECT a_id, b_id, CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
FROM __inter
JOIN __cnt ca ON ca.{id_col} = a_id JOIN __cnt cb ON cb.{id_col} = b_id
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= {threshold}
"""


def sql_lang_id(table: str, id_col: str, markers: dict[str, list[str]]) -> str:
    """Twin of text.lang_id_stage: kana/CJK codepoint dominance first,
    else the stopword vote with first-language-wins ties."""
    hit_cols = ",\n    ".join(
        f"SUM(CASE WHEN w IN ({', '.join(map(repr, ws))}) THEN 1 ELSE 0 END)"
        f" AS h_{lg}"
        for lg, ws in markers.items()
    )
    union = " UNION ALL ".join(
        f"SELECT {id_col}, '{lg}' AS lang, h_{lg} AS h, {i} AS pri FROM __hits"
        for i, lg in enumerate(markers)
    )
    return f"""
WITH __w AS (
  SELECT {id_col},
         unnest(list_slice(list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> ''), 1, 200)) AS w
  FROM {table}
),
__hits AS (SELECT {id_col}, {hit_cols} FROM __w GROUP BY {id_col}),
__pick AS (
  SELECT {id_col}, lang FROM (
    SELECT {id_col}, lang,
           ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY h DESC, pri) AS rn
    FROM ({union})
  ) WHERE rn = 1
),
__cjk AS (
  SELECT {id_col},
         length(regexp_replace(substr(text, 1, 200),
                '[^\\x{{3040}}-\\x{{30FF}}]', '', 'g')) AS kana,
         length(regexp_replace(substr(text, 1, 200),
                '[^\\x{{4E00}}-\\x{{9FFF}}]', '', 'g')) AS cjkc
  FROM {table}
)
SELECT d.{id_col},
       CASE WHEN c.kana > 2 THEN 'ja' WHEN c.cjkc > 2 THEN 'zh'
            ELSE COALESCE(p.lang, 'en') END AS lang_pred
FROM {table} d JOIN __cjk c USING ({id_col}) LEFT JOIN __pick p USING ({id_col})
"""


def sql_contamination_stats(table: str, id_col: str, eval_mod: int = 37,
                            k: int = 5) -> str:
    """Twin of dedup.contamination_stats: per train-doc distinct-shingle
    count and how many of those shingles appear in the eval split."""
    return f"""
WITH __sh AS ({sql_shingle_cte(table, id_col, k)}),
__ev AS (SELECT DISTINCT h FROM __sh WHERE {id_col} % {eval_mod} = 0),
__tr AS (SELECT * FROM __sh WHERE {id_col} % {eval_mod} <> 0)
SELECT {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM __tr t LEFT JOIN __ev e ON t.h = e.h
GROUP BY {id_col}
"""
