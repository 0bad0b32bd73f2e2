"""Deterministic Common-Crawl-style web-page table (the input_hint shape).

Schema (per BASELINE.json input_hint / FIXTURES.md F6):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Generation is a pure function of the row id (seeded, no ambient RNG state),
so any shard can be (re)generated independently — that is what makes
lineage-based retries and resumable writes safe.  20% of urls snap near 16
"city" cluster centers to exercise hot-cell skew splitting.

Geometry at use-sites derives from ``url`` via a stable FNV-1a 64-bit hash
(`url_hash64`), never stored — mirroring the engine contract that geometry
is a deterministic function of the row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "pt", "ja"])
_LANG_W = np.array([0.44, 0.10, 0.09, 0.09, 0.10, 0.07, 0.06, 0.05])

# 16 deterministic "city" cluster centers (lon, lat)
_CITY_LON = np.array([-74.0, -0.1, 139.7, 116.4, 2.35, 13.4, 151.2, -122.4,
                      77.2, -43.2, 37.6, 103.8, -99.1, 28.9, 18.4, 126.9])
_CITY_LAT = np.array([40.7, 51.5, 35.7, 39.9, 48.85, 52.5, -33.9, 37.8,
                      28.6, -22.9, 55.7, 1.35, 19.4, 41.0, -33.9, 37.5])

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64_bytes(data: bytes) -> int:
    h = FNV_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def _hash_byte_matrix(mat: np.ndarray, lens: np.ndarray | None = None) -> np.ndarray:
    """FNV-1a over the rows of an (n, width) uint8 matrix, vectorized
    column-wise.  ``lens`` masks variable-length rows; omit when every row
    spans the full width (the fast fixed-format path — no masking ops)."""
    h = np.full(mat.shape[0], FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if lens is None:
            for col in range(mat.shape[1]):
                h = (h ^ mat[:, col].astype(np.uint64)) * FNV_PRIME
        else:
            for col in range(mat.shape[1]):
                active = col < lens
                hx = np.where(active, h ^ mat[:, col].astype(np.uint64), h)
                h = np.where(active, hx * FNV_PRIME, h)
    return h


def url_hash64(urls) -> np.ndarray:
    """Stable 64-bit FNV-1a hash per url.

    Accepts a Python sequence of strings OR a pyarrow StringArray /
    ChunkedArray — the Arrow path hashes straight off the column's UTF-8
    data buffer (zero-copy; no per-row Python objects).  Equal-length rows
    (the fixed-format url scheme) take a reshape + unmasked column sweep."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(urls, pa.Array):
        if len(urls) == 0:
            return np.empty(0, dtype=np.uint64)
        arr = urls
        # large_string carries int64 offsets; plain string int32.
        off_dtype = (
            np.int64
            if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
            else np.int32
        )
        off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lens = np.diff(off)
        width = int(lens.max(initial=0))
        if width == 0:
            return np.full(len(arr), FNV_OFFSET, dtype=np.uint64)
        if (lens == width).all():
            mat = data[off[0] : off[-1]].reshape(len(arr), width)
            return _hash_byte_matrix(mat)
        mat = np.zeros((len(arr), width), dtype=np.uint8)
        flat_idx = np.repeat(off[:-1], lens) + (
            np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
        )
        col_idx = np.arange(int(lens.sum())) - np.repeat(np.cumsum(lens) - lens, lens)
        mat[np.repeat(np.arange(len(arr)), lens), col_idx] = data[flat_idx]
        return _hash_byte_matrix(mat, lens)
    arr = np.asarray(urls, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = [u.encode() for u in arr]
    maxlen = max(len(e) for e in encoded)
    lens = np.array([len(e) for e in encoded])
    buf = np.frombuffer(
        b"".join(e.ljust(maxlen, b"\x00") for e in encoded), dtype=np.uint8
    )
    mat = buf.reshape(len(encoded), maxlen)
    if (lens == maxlen).all():
        return _hash_byte_matrix(mat)
    return _hash_byte_matrix(mat, lens)


def page_geometry(urls):
    """url → deterministic (lon, lat); 20% snapped near 16 city clusters."""
    return geometry_from_hash(url_hash64(urls))


def geometry_from_hash(h: np.ndarray):
    """(lon, lat) from precomputed ``url_hash64`` values — callers that
    also need the hash (as the row id) avoid hashing twice."""
    lon = (h % np.uint64(360000)).astype(np.float64) / 1000.0 - 180.0
    lat = ((h >> np.uint64(20)) % np.uint64(170000)).astype(np.float64) / 1000.0 - 85.0
    bucket = (h >> np.uint64(40)) % np.uint64(10)
    city = ((h >> np.uint64(45)) % np.uint64(16)).astype(np.int64)
    jlon = ((h >> np.uint64(50)) % np.uint64(2000)).astype(np.float64) / 1000.0 - 1.0
    jlat = ((h >> np.uint64(54)) % np.uint64(1000)).astype(np.float64) / 2000.0 - 0.25
    hot = bucket < np.uint64(2)  # 20%
    lon = np.where(hot, _CITY_LON[city] + jlon, lon)
    lat = np.where(hot, _CITY_LAT[city] + jlat, lat)
    return lon, lat


_WORD_BYTES: np.ndarray | None = None
_N_WORDS = 50_000
_WORD_W = 7  # "wXXXXX " — fixed width so rows assemble without Python loops


def _word_bytes() -> np.ndarray:
    """(50000, 7) uint8 lookup of fixed-width vocabulary words.

    Words are 6 random lowercase letters + space (not zero-padded numbers:
    numeric words share digit-heavy character n-grams, which collapses
    shingle diversity and makes every document pair look ~40% similar)."""
    global _WORD_BYTES
    if _WORD_BYTES is None:
        rng = np.random.default_rng(20240817)
        letters = rng.integers(97, 123, size=(_N_WORDS, _WORD_W - 1), dtype=np.uint8)
        _WORD_BYTES = np.concatenate(
            [letters, np.full((_N_WORDS, 1), 32, dtype=np.uint8)], axis=1
        )
    return _WORD_BYTES


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized."""
    with np.errstate(over="ignore"):
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return v ^ (v >> np.uint64(31))


def _texts_for_seeds(body_seed: np.ndarray) -> pa.Array:
    """Deterministic per-row text: 24–72 independent pseudo-random words
    from a 50k vocabulary, assembled as one Arrow StringArray straight
    from numpy buffers — no per-row Python.  Distinct seeds give
    near-disjoint shingle sets; equal seeds give byte-identical text."""
    bs = body_seed.astype(np.uint64)
    n = len(bs)
    max_w = 72
    nw = (24 + (bs % np.uint64(49))).astype(np.int64)
    pos = np.arange(max_w, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = _mix64(bs[:, None] * np.uint64(0x9E3779B97F4A7C15) + (pos[None, :] + np.uint64(1)) * np.uint64(0xD1B54A32D192ED03))
    idx = (h % np.uint64(_N_WORDS)).astype(np.int64)
    flat = _word_bytes()[idx].reshape(n, max_w * _WORD_W)
    lens = nw * _WORD_W
    mask = np.arange(max_w * _WORD_W)[None, :] < lens[:, None]
    data = flat[mask]  # concatenated rows, vectorized
    total = int(lens.sum())
    if total > np.iinfo(np.int32).max:
        # int32 StringArray offsets would wrap silently — refuse and tell
        # the caller to generate smaller shards (or switch to large_string)
        raise ValueError(
            f"generation shard holds {total} text bytes > int32 offset max; "
            "reduce rows-per-shard below ~4.2M"
        )
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())
    )


# "https://siteNNNNNN.example/p/NNNNNN" — fixed 35-byte format
_URL_TEMPLATE = np.frombuffer(b"https://site000000.example/p/000000", dtype=np.uint8)
_URL_SITE_AT = 12  # first of 6 site digits
_URL_PAGE_AT = 29  # first of 6 page digits


def _urls_for_rids(site: np.ndarray, page: np.ndarray) -> tuple[pa.Array, np.ndarray]:
    """(StringArray of fixed-format urls, their (n, 35) uint8 matrix) —
    assembled digit-by-digit from numpy integer arrays; no per-row Python."""
    n = len(site)
    mat = np.broadcast_to(_URL_TEMPLATE, (n, len(_URL_TEMPLATE))).copy()
    s = site.astype(np.int64)
    p = page.astype(np.int64)
    for d in range(6):  # most-significant digit first
        div = 10 ** (5 - d)
        mat[:, _URL_SITE_AT + d] = 48 + (s // div) % 10
        mat[:, _URL_PAGE_AT + d] = 48 + (p // div) % 10
    offsets = np.arange(0, (n + 1) * len(_URL_TEMPLATE), len(_URL_TEMPLATE), dtype=np.int32)
    arr = pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(mat.tobytes())
    )
    return arr, mat


def make_pages_batch(start: int, count: int, columns=None) -> pa.Table:
    """Generate rows [start, start+count) of the pages table.

    ``columns`` restricts generation: every expensive field (html, text,
    lang) is skipped entirely when not requested — a pruned read must not
    pay for pruned columns."""
    want = (
        set(columns)
        if columns is not None
        else {"url", "warc_ts", "html", "text", "lang"}
    )
    rid = np.arange(start, start + count, dtype=np.int64)
    site = (rid * 2654435761 % 1000003) % 100000
    page = rid % 1000000
    urls, _ = _urls_for_rids(site, page)
    cols = {"url": urls}
    if "warc_ts" in want:
        cols["warc_ts"] = pa.array(
            (1577836800_000000 + rid * 37_000_003).astype("datetime64[us]"),
            type=pa.timestamp("us"),
        )
    if "text" in want or "html" in want:
        # deterministic diverse text: 24-72 independent pseudo-random words
        # per row from a 50k-word vocabulary (realistic shingle diversity —
        # docs with distinct seeds share almost no character n-grams); ~5%
        # of rows exactly duplicate an earlier row's body (real corpora are
        # full of true duplicates — gives dedup pipelines work)
        body_seed = np.where((rid % 20 == 7) & (rid >= 7), rid - 7, rid)
        text = _texts_for_seeds(body_seed)
        if "text" in want:
            cols["text"] = text
        if "html" in want:
            cols["html"] = pc.cast(
                pc.binary_join_element_wise(
                    "<html><body><p>", text, "</p></body></html>", ""
                ),
                pa.binary(),
            )
    if "lang" in want:
        lang = _LANGS[
            np.searchsorted(
                np.cumsum(_LANG_W), (rid * 48271 % 997) / 997.0, side="right"
            ).clip(0, len(_LANGS) - 1)
        ]
        cols["lang"] = pa.array(lang.tolist(), type=pa.string())
    out = pa.table(cols)
    order = [c for c in ["url", "warc_ts", "html", "text", "lang"] if c in out.column_names]
    return out.select(order)


def pages_dataset(num_rows: int, parallelism: int = 8, columns=None):
    """A Ray Dataset of synthetic pages, generated shard-parallel (each
    shard is a pure function of its row range — no driver materialization).

    ``override_num_blocks`` pins one block per shard so generation
    parallelism is exactly ``parallelism`` regardless of Ray's auto
    block-splitting of the tiny seed items."""
    import ray
    import ray.data

    shard = int(np.ceil(num_rows / parallelism))
    spans = [(i * shard, min((i + 1) * shard, num_rows)) for i in range(parallelism)]
    spans = [(a, b) for a, b in spans if b > a]
    ds = ray.data.from_items(
        [{"start": a, "count": b - a} for a, b in spans],
        override_num_blocks=len(spans),
    )

    def expand(batch: pa.Table) -> pa.Table:
        tables = [
            make_pages_batch(int(s), int(c), columns=columns)
            for s, c in zip(batch["start"].to_pylist(), batch["count"].to_pylist())
        ]
        return pa.concat_tables(tables)

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=1)
