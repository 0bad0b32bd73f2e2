"""Deduplication pipelines over the `documents` table.

- exact: hash-partitioned first-wins (GROUP BY text ≡ group by stable
  64-bit text hash; collisions are ~2^-64 per pair).
- MinHash + LSH: shingle → minhash signature → banded buckets → candidate
  pairs → signature-estimated Jaccard filter.  The only shuffle is the
  band-bucket groupby; signatures travel with the rows so verification
  needs no second join.
- SimHash: 64-bit token-hash sign aggregate; near-dups = small Hamming
  distance within prefix buckets.
- embedding cosine near-dup lives in pipelines/ann.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.util import gap_pair_offsets

_P61 = np.uint64((1 << 61) - 1)


def _text_hash64(texts) -> np.ndarray:
    """Stable 64-bit FNV-1a per text, computed off Arrow string buffers.

    Accepts an Arrow string array (zero-copy path) or a list of Python
    strings.  Work is sum(len) via the length-descending live-prefix pass
    in ``text._fnv1a_ragged`` — no (rows × longest_doc) padded matrix, so
    one 10 MB outlier in a 4k-row batch costs 10 MB of reads, not 40 GB
    of temporaries.
    """
    from .text import _fnv1a_ragged, _string_views

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts
    else:
        arr = pa.array([t if t is not None else "" for t in texts], pa.string())
    lens, starts, values = _string_views(arr)
    return _fnv1a_ragged(lens, starts, values)


def exact_dedup(ds, id_col: str, text_col: str = "text"):
    """Per distinct text: (keep_id = min id, n_dups).

    SQL twin: ``SELECT MIN(id) AS keep_id, COUNT(*) AS n_dups FROM t
    GROUP BY text``.  Hash-partitioned: only (id, hash) enters the shuffle.
    """

    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def to_hash(batch: pa.Table) -> pa.Table:
        h = _text_hash64(batch[text_col])
        return pa.table(
            {
                "rkey": pa.array(((h >> np.uint64(3)) % np.uint64(R)).astype(np.int64)),
                "h": pa.array(h.view(np.int64)),
                id_col: batch[id_col],
            }
        )

    hashed = coalesce_for_shuffle(ds.map_batches(to_hash, batch_format="pyarrow"), 0.5)

    # coarse-keyed reduce: one shuffle on rkey, then every distinct text
    # hash inside a reducer is aggregated vectorized (no per-group calls,
    # no pandas dtype round-trip)
    def reduce_many(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        ids = g[id_col].to_numpy().astype(np.int64)
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        keep = np.full(len(cnt), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(keep, inv, ids)
        return pa.table(
            {
                "keep_id": pa.array(keep),
                "n_dups": pa.array(cnt.astype(np.int64)),
            }
        )

    return hashed.groupby("rkey").map_groups(reduce_many, batch_format="pyarrow")


def snapshot_delta(old_ds, new_ds, id_col: str, text_col: str = "text",
                   carry_cols: tuple = ()):
    """Incremental crawl dedup: rows of ``new_ds`` whose ``text_col`` does
    NOT occur anywhere in ``old_ds`` — the "what content is genuinely new
    this snapshot" filter a recrawl pipeline runs before paying for
    downstream curation of already-ingested pages.

    SQL twin: ``SELECT n.id FROM new n WHERE NOT EXISTS
    (SELECT 1 FROM old o WHERE o.text = n.text)``.  Duplicates WITHIN the
    new snapshot all pass (each is a new page); only old-content matches
    drop.  Same 64-bit-FNV content-identity convention as ``exact_dedup``.

    Scale shape: both corpora hash inside ``map_batches``
    (``_fnv1a_ragged`` off Arrow buffers, sum(len) work); the single
    exchange carries (rkey, h, side, id, carry…) — ~17 B + carry per row,
    never text.  Old-side rows could be pre-deduped per batch to shrink
    further; each reducer resolves all its hashes in one sorted
    searchsorted pass (rule 3).
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()
    # carry columns exist only on the new side; the old side ships typed
    # nulls so the union schema lines up (types from driver-side metadata)
    carry_types = {}
    if carry_cols:
        sch = new_ds.schema().base_schema
        if isinstance(sch, pa.Schema):
            carry_types = {f.name: f.type for f in sch}
        else:  # pandas-block schema: numpy dtypes (object -> string)
            for name, dt in zip(sch.names, sch.types):
                try:
                    carry_types[name] = pa.from_numpy_dtype(dt)
                except (pa.ArrowNotImplementedError, TypeError):
                    carry_types[name] = pa.string()

    def tagger(side: int):
        def to_hash(batch: pa.Table) -> pa.Table:
            h = _text_hash64(batch[text_col])
            cols = {
                "rkey": pa.array(
                    ((h >> np.uint64(3)) % np.uint64(R)).astype(np.int64)
                ),
                "h": pa.array(h.view(np.int64)),
                "side": pa.array(np.full(len(h), side, np.int8)),
                id_col: batch[id_col],
            }
            for c in carry_cols:
                cols[c] = batch[c] if side == 1 else pa.nulls(
                    len(h), carry_types[c]
                )
            return pa.table(cols)

        return to_hash

    tagged = coalesce_for_shuffle(
        old_ds.map_batches(tagger(0), batch_format="pyarrow").union(
            new_ds.map_batches(tagger(1), batch_format="pyarrow")
        ),
        0.5,
    )

    def anti_in_reducer(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        side = g["side"].to_numpy()
        old = np.sort(h[side == 0])
        keep = side == 1
        if len(old):
            nh = h[keep]
            pos = np.searchsorted(old, nh)
            hit = (pos < len(old)) & (old[np.minimum(pos, len(old) - 1)] == nh)
            idx = np.flatnonzero(keep)[~hit]
        else:
            idx = np.flatnonzero(keep)
        out = g.take(pa.array(idx))
        return out.select([id_col, *carry_cols])

    return tagged.groupby("rkey").map_groups(
        anti_in_reducer, batch_format="pyarrow"
    )


# --- MinHash ----------------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P61), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P61), size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of all k-character shingles (rolling window over the byte
    matrix, vectorized)."""
    data = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    h = np.full(len(windows), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in range(k):
            h = (h ^ windows[:, col]) * np.uint64(1099511628211)
    return np.unique(h)


def _shingle_hashes_core(data: np.ndarray, starts: np.ndarray, k: int):
    """All shingle hashes of every doc in ONE vectorized pass over a
    concatenated byte buffer (``starts`` has n+1 offsets; every doc must
    span ≥ ``k`` bytes — pad upstream).  A single k-column rolling FNV
    hashes the whole buffer; windows that straddle a doc boundary are
    masked out.  Returns ``(hashes, doc_of_hash, doc_starts)`` with
    hashes grouped doc-major in scan order.
    """
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    # window column j is just the byte buffer shifted by j — hashing over
    # shifted views avoids materializing the (windows × k) uint64 matrix
    # (8k bytes of DRAM traffic per input byte); the rolling state h is the
    # only window-sized array and it stays cache-hot across the k passes
    n_win = len(data) - k + 1
    h = np.full(n_win, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for col in range(k):
            np.bitwise_xor(h, data[col : col + n_win], out=h)
            np.multiply(h, np.uint64(1099511628211), out=h)
    pos = np.arange(n_win)
    doc = np.searchsorted(starts, pos, side="right") - 1
    valid = pos + k <= starts[doc + 1]
    h, doc = h[valid], doc[valid]
    n_docs = len(starts) - 1
    doc_h_starts = np.searchsorted(doc, np.arange(n_docs))
    return h, doc, doc_h_starts


def _batch_shingle_hashes(texts, k: int):
    """Shingle hashes from a Python string list (candidate-verify paths,
    which already hold decoded strings) — pads each doc to ≥ k bytes then
    defers to the shared core."""
    padded = [(t.encode() if t else b"").ljust(k, b"\x00") for t in texts]
    lens = np.array([len(t) for t in padded], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])
    data = np.frombuffer(b"".join(padded), dtype=np.uint8)
    return _shingle_hashes_core(data, starts, k)


def _shingle_hashes_arrow(col, k: int):
    """Shingle hashes straight off an Arrow utf8 column's buffers — the
    corpus-wide path: zero Python strings when every doc spans ≥ k bytes
    (the ``_arrow_bytes_starts`` fast path the minhash signature kernel
    uses); short/null docs fall back to the padded list path (rare)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    got = _arrow_bytes_starts(arr, k)
    if got is None:
        return _batch_shingle_hashes(arr.to_pylist(), k)
    data, starts = got
    return _shingle_hashes_core(data, starts, k)


def _arrow_bytes_starts(arr: pa.Array, k: int):
    """(data bytes, doc start offsets) straight off an Arrow StringArray's
    buffers — no Python strings, no copies.  None → caller must fall back
    (nulls, non-utf8 layout, or a doc shorter than k bytes)."""
    if arr.null_count or not pa.types.is_string(arr.type):
        return None
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    lens = np.diff(off)
    if len(lens) == 0 or (lens < k).any():
        return None
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    return data, off - off[0]


def minhash_signatures_stage(
    id_col: str, text_col: str = "text", num_perm: int = 64, shingle_k: int = 5
):
    """Stage: (id, sig list<uint64 as int64>) minhash signatures.

    Fully streaming: the utf8 bytes come straight off the Arrow buffer,
    and hashing + permutation + per-doc minima all happen per CACHE-SIZED
    window slice in reused scratch (the rolling-hash state, the
    (perms × slice) φ matrix, everything).  Doc boundaries are handled
    with interleaved-index ``minimum.reduceat`` segments, so no
    window-sized position/mask arrays exist at all — DRAM sees each text
    byte once and each signature once (~1 KB/doc), which is what lets the
    stage scale linearly when every core runs it.  Per-doc minima merge
    across slice boundaries with an exact elementwise ``np.minimum``.
    (Minhash is multiset-invariant, so skipping per-doc unique changes
    nothing.)
    """
    a, b = _minhash_params(num_perm)
    SLICE = 2048  # (perms × SLICE) scratch ≈ 1 MB — stays cache-resident
    # even with every core running this stage concurrently
    DOC_CHUNK = 4096  # docs per outer chunk (bounds the offsets arrays)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        n = len(ids)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "sig": pa.nulls(0, pa.list_(pa.int64(), num_perm)),
                }
            )
        text_arr = batch[text_col].combine_chunks()
        k = shingle_k
        sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        hbuf = np.empty(SLICE, dtype=np.uint64)
        buf = np.empty((num_perm, SLICE), dtype=np.uint64)
        fold = np.empty((num_perm, SLICE), dtype=np.uint64)
        mask = np.empty((num_perm, SLICE), dtype=bool)
        with np.errstate(over="ignore"):
            for doc0 in range(0, n, DOC_CHUNK):
                doc1 = min(n, doc0 + DOC_CHUNK)
                got = _arrow_bytes_starts(
                    text_arr.slice(doc0, doc1 - doc0), k
                )
                if got is None:  # short/null docs: padded bytes (rare)
                    padded = [
                        (t or "").encode().ljust(k, b"\x00")
                        for t in text_arr.slice(doc0, doc1 - doc0).to_pylist()
                    ]
                    data = np.frombuffer(b"".join(padded), dtype=np.uint8)
                    starts = np.concatenate(
                        [[0], np.cumsum([len(t) for t in padded])]
                    )
                else:
                    data, starts = got
                # per-doc valid-window ranges in unsliced window coords:
                # doc d's windows are [starts[d], starts[d+1] - (k-1))
                ws = starts[:-1]
                we = starts[1:] - (k - 1)
                n_win = len(data) - k + 1
                for w0 in range(0, n_win, SLICE):
                    w1 = min(n_win, w0 + SLICE)
                    w = w1 - w0
                    # rolling hash for this slice's windows, from bytes
                    h = hbuf[:w]
                    h[:] = np.uint64(0xCBF29CE484222325)
                    for col in range(k):
                        np.bitwise_xor(h, data[w0 + col : w0 + col + w], out=h)
                        np.multiply(h, np.uint64(1099511628211), out=h)
                    # h %= P61 (Mersenne fold: 2^61 ≡ 1, bit-exact)
                    f1 = fold[0, :w]
                    np.right_shift(h, np.uint64(61), out=f1)
                    np.bitwise_and(h, _P61, out=h)
                    np.add(h, f1, out=h)
                    m1 = mask[0, :w]
                    np.greater_equal(h, _P61, out=m1)
                    np.subtract(h, _P61, where=m1, out=h)
                    v = buf[:, :w]
                    f = fold[:, :w]
                    m = mask[:, :w]
                    np.multiply(a[:, None], h[None, :], out=v)
                    np.add(v, b[:, None], out=v)
                    np.right_shift(v, np.uint64(61), out=f)
                    np.bitwise_and(v, _P61, out=v)
                    np.add(v, f, out=v)
                    np.greater_equal(v, _P61, out=m)
                    np.subtract(v, _P61, where=m, out=v)
                    # docs whose valid range intersects [w0, w1):
                    # interleaved (start, end) reduceat segments pick out
                    # exactly the in-doc windows; the k-1 boundary-crossing
                    # windows fall in the odd gap segments and are dropped
                    d0 = int(np.searchsorted(we, w0, side="right"))
                    d1 = int(np.searchsorted(ws, w1, side="left"))
                    if d1 <= d0:
                        continue
                    cs = np.clip(ws[d0:d1] - w0, 0, w)
                    ce = np.clip(we[d0:d1] - w0, 0, w)
                    keep = ce > cs
                    dd = np.nonzero(keep)[0] + d0
                    if not len(dd):
                        continue
                    idx = np.empty(2 * len(dd), dtype=np.int64)
                    idx[0::2] = cs[keep]
                    idx[1::2] = ce[keep]
                    if idx[-1] == w:  # reduceat needs indices < length
                        idx = idx[:-1]
                    part = np.minimum.reduceat(v, idx, axis=1)[:, 0::2]
                    # fancy indexing copies — gather, min, scatter back
                    rows = doc0 + dd
                    cur = sigs[rows]
                    np.minimum(cur, part.T, out=cur)
                    sigs[rows] = cur
        return pa.table(
            {
                id_col: pa.array(ids),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.view(np.int64).ravel()), num_perm
                ),
            }
        )

    return fn


def minhash_dedup(
    ds,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    spread: bool = True,
    sig_store: str = "lazy",
):
    """Near-duplicate candidate pairs via MinHash-LSH.

    Returns (a_id, b_id, est_jaccard) with a_id < b_id and estimated
    Jaccard (fraction of equal minhashes) ≥ threshold.  Banding: a pair is
    a candidate iff some band of the signature matches exactly; the final
    filter uses the full signature, so band collisions don't create false
    positives above threshold.

    Scale shape: the bucket shuffle carries only 32 B/row
    ``(rkey, bucket, id, sighash)`` — the 8·num_perm-byte signature never
    rides the shuffle.  Identical-signature duplicates (the bulk of real
    corpora) resolve from sighash equality alone; only the rare
    distinct-signature collision pairs are exact-verified afterwards
    against the signatures of just the involved ids.
    """
    from ..stages.util import (
        cluster_cpus,
        coalesce_for_shuffle,
        reducer_count,
        stage_mark,
    )

    import ray.data

    _t0 = __import__("time").perf_counter()

    rows_per_band = num_perm // bands
    R = reducer_count()
    # signature computation is per-row CPU-bound: spread small inputs
    # across the cluster before the map (skip with ``spread=False`` when
    # the input already has enough blocks — the repartition is a barrier
    # and moves the full text payload); materialized because both the
    # bucket pass and the verification pass read it
    target_blocks = max(2, cluster_cpus())
    if spread:
        try:  # planned block count known for read/materialized inputs —
            # don't pay the repartition barrier when already spread enough
            spread = ds.num_blocks() < target_blocks
        except Exception:
            pass
    src = ds.repartition(target_blocks) if spread else ds
    # the signature table has two consumers (bucket pass + verification
    # payload join).  ``sig_store`` picks how the second consumer gets it:
    # - "lazy" (default): nothing persists.  The bucket pass chains
    #   generate→sign→bucket→shuffle in ONE execution (no barrier), and the
    #   verification payload RECOMPUTES signatures from the input — but only
    #   for ids that pass the broadcast Bloom filter of candidate-pair ids,
    #   i.e. the expensive kernel reruns for O(candidate ids), not the
    #   corpus.  Nothing corpus-sized is ever pinned (Plasma allocation
    #   degrades ~5× once the store holds a few GB — measured, BASELINE.md).
    # - "plasma": materialize the signature table in the object store.
    #   Saves the input re-scan when signatures are far more expensive than
    #   the scan, at the price of pinning 8·num_perm B/row × corpus.
    # - "parquet": checkpoint to local parquet and re-read lazily — the
    #   resume point a failed verification retries from.
    sig_fn = minhash_signatures_stage(id_col, text_col, num_perm, shingle_k)
    sig_pipe = src.map_batches(sig_fn, batch_format="pyarrow")
    payload_factory = None
    if sig_store == "plasma":
        sig_ds = sig_pipe.materialize()
        _t0 = stage_mark("minhash.sig_materialize", _t0)
    elif sig_store == "parquet":
        import os
        import tempfile
        import uuid

        import ray.data as rd

        path = os.path.join(
            tempfile.gettempdir(), f"gir_minhash_sig_{uuid.uuid4().hex}"
        )
        sig_pipe.write_parquet(path)
        sig_ds = rd.read_parquet(path)
    elif sig_store == "lazy":
        sig_ds = sig_pipe

        def payload_factory(bloom_ref):
            import ray

            from ..stages.pairjoin import _bloom_contains

            def prefilter(batch: pa.Table) -> pa.Table:
                bits = ray.get(bloom_ref)  # zero-copy from the local store
                ids = batch[id_col].to_numpy().astype(np.int64)
                return batch.filter(pa.array(_bloom_contains(bits, ids)))

            return src.map_batches(
                prefilter, batch_format="pyarrow"
            ).map_batches(sig_fn, batch_format="pyarrow")

    else:
        raise ValueError(f"unknown sig_store {sig_store!r}")

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        sig_col = batch["sig"].combine_chunks()
        sig = sig_col.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), num_perm)
        with np.errstate(over="ignore"):
            sighash = np.full(len(ids), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
            for c in range(num_perm):
                sighash = (sighash ^ sig[:, c].view(np.uint64)) * np.uint64(1099511628211)
        out_bucket, out_id, out_sh = [], [], []
        for band in range(bands):
            seg = sig[:, band * rows_per_band : (band + 1) * rows_per_band]
            # bucket key = hash of band values + band index
            with np.errstate(over="ignore"):
                bh = np.full(len(ids), np.uint64(1469598103934665603), dtype=np.uint64)
                for c in range(rows_per_band):
                    bh = (bh ^ seg[:, c].view(np.uint64)) * np.uint64(1099511628211)
                bh = bh ^ np.uint64(band * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
            out_bucket.append(bh.view(np.int64))
            out_id.append(ids)
            out_sh.append(sighash.view(np.int64))
        bucket = np.concatenate(out_bucket)
        return pa.table(
            {
                "rkey": pa.array(
                    (bucket.view(np.uint64) % np.uint64(R)).astype(np.int64)
                ),
                "bucket": pa.array(bucket),
                id_col: pa.array(np.concatenate(out_id)),
                "sighash": pa.array(np.concatenate(out_sh)),
            }
        )

    buckets = coalesce_for_shuffle(
        sig_ds.map_batches(to_buckets, batch_format="pyarrow"), 0.5
    )

    _empty_ab = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )

    def pairs_in_reducer(g: pa.Table) -> pa.Table:
        """All LSH buckets of one reducer in one vectorized pass.

        Rows sort by (bucket, sighash, id); identical-sighash runs link
        members to their min-id representative with pure run-length numpy.
        Buckets with ≥2 distinct sighashes emit representative candidate
        pairs via the vectorized k-offset sweep; buckets larger than 2048
        reps chain-link to the min-id rep instead of all-pairs (precision
        is unaffected — verification filters — only in-bucket recall of a
        pathological bucket degrades).  Ids only; duplicates across bands
        are deduped inside the verification join's first reducer."""
        if g.num_rows < 2:
            return _empty_ab
        ids_all = g[id_col].to_numpy().astype(np.int64)
        bucket_all = g["bucket"].to_numpy()
        sighash_all = g["sighash"].to_numpy()

        order = np.lexsort((ids_all, sighash_all, bucket_all))
        b_s = bucket_all[order]
        k_s = sighash_all[order]
        i_s = ids_all[order]

        # runs of identical (bucket, sighash): head = min id (sorted) = rep
        new_run = np.r_[True, (b_s[1:] != b_s[:-1]) | (k_s[1:] != k_s[:-1])]
        run_id = np.cumsum(new_run) - 1
        head_pos = np.nonzero(new_run)[0]
        head_of_row = head_pos[run_id]
        nonhead = ~new_run
        out_a = [i_s[head_of_row[nonhead]]]
        out_b = [i_s[nonhead]]

        # distinct-sighash reps per bucket → candidates needing exact est.
        # Pair generation sweeps the pair OFFSET k (few iterations — max
        # bucket size), emitting (t, t+k) for every bucket with > k reps in
        # one vectorized shot — never a Python loop over the (possibly
        # many) buckets themselves.
        rep_bucket = b_s[head_pos]
        rep_ids = i_s[head_pos]
        bstart = np.nonzero(np.r_[True, rep_bucket[1:] != rep_bucket[:-1]])[0]
        sizes = np.diff(np.r_[bstart, len(head_pos)])
        small = sizes <= 2048
        s_small = np.where(small, sizes, 0)
        if s_small.max(initial=0) >= 2:
            for k in range(1, int(s_small.max())):
                act = np.nonzero(s_small > k)[0]
                if not len(act):
                    break
                cnt = s_small[act] - k
                t0 = np.repeat(bstart[act], cnt) + (
                    np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                )
                a = rep_ids[t0]
                b = rep_ids[t0 + k]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
        # pathological giant buckets (> 2048 distinct signatures): chain-
        # link to the bucket's min-id rep — precision is unaffected (exact
        # verification filters), only in-bucket recall degrades gracefully
        for m in np.nonzero(~small)[0]:
            rids = rep_ids[bstart[m] : bstart[m] + sizes[m]]
            a = np.full(len(rids) - 1, rids[0])
            b = rids[1:]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        a = np.concatenate(out_a)
        if not len(a):
            return _empty_ab
        return pa.table(
            {"a_id": pa.array(a), "b_id": pa.array(np.concatenate(out_b))}
        )

    pairs = buckets.groupby("rkey").map_groups(pairs_in_reducer, batch_format="pyarrow")

    # exact verification runs entirely in workers: ONE payload shuffle
    # attaches both signatures to every candidate pair (stages.pairjoin;
    # band-duplicate pairs die inside the join's first reducer), the
    # second reducer compares signatures vectorized.  The driver never
    # gathers pairs or builds lookups; est = matching-fraction ≥ threshold
    # (identical-signature pairs come out at exactly 1.0).
    from ..stages.pairjoin import verify_pairs

    _empty_out = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )
    sig_type = pa.list_(pa.int64(), num_perm)

    def verify_red(a, b, apay, bpay) -> pa.Table:
        if len(a) == 0:
            return _empty_out
        sa = apay.flatten().to_numpy(zero_copy_only=False).reshape(len(a), num_perm)
        sb = bpay.flatten().to_numpy(zero_copy_only=False).reshape(len(b), num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "a_id": pa.array(a[keep]),
                "b_id": pa.array(b[keep]),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    return verify_pairs(
        pairs, sig_ds, id_col, "sig", sig_type, verify_red,
        payload_factory=payload_factory,
    )


# --- SimHash ----------------------------------------------------------------


def simhash_stage(id_col: str, text_col: str = "text"):
    """Stage: (id, simhash int64) — sign aggregate of token hashes.

    All-Arrow tokenization (``split_pattern_regex`` + list_parent_indices,
    mirroring ``text._doc_term_tf``) and ragged-buffer token hashing; per-row
    bit votes come from a cumulative-sum difference over the flat token axis
    (handles empty rows exactly) — no per-document Python in the hot path.
    """
    import pyarrow.compute as pc

    from .text import _fnv1a_ragged, _string_views

    shifts = np.arange(64, dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        n = len(ids)
        words = pc.split_pattern_regex(pc.fill_null(batch[text_col], ""), r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        wlens, wstarts, wvalues = _string_views(flat)
        keep = wlens > 0  # regex split emits empties at string edges; str.split drops them
        out = np.zeros(n, dtype=np.uint64)
        n_tok = int(keep.sum())
        if n_tok:
            th = _fnv1a_ragged(wlens[keep], wstarts[keep], wvalues)
            counts = np.bincount(parents[keep], minlength=n).astype(np.int64)
            bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            signs = 2 * bits - 1  # (n_tokens, 64)
            cum = np.zeros((n_tok + 1, 64), dtype=np.int64)
            np.cumsum(signs, axis=0, out=cum[1:])
            ends = np.cumsum(counts)
            starts = ends - counts
            votes = cum[ends] - cum[starts]  # (n_rows, 64); empty rows → 0
            sign_bits = (votes > 0).astype(np.uint64)
            out = np.bitwise_or.reduce(sign_bits << shifts[None, :], axis=1)
        return pa.table({id_col: pa.array(ids), "simhash": pa.array(out.view(np.int64))})

    return fn


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard between two strings (verification
    helper for minhash estimates)."""
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def shingle_sets_stage(id_col: str, text_col: str = "text", shingle_k: int = 5):
    """Stage: (id, shingles list<int64 asc>, n) — each doc's UNIQUE shingle
    hashes in ascending order, computed batch-wide (one rolling-hash pass +
    one lexsort, no per-document Python)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        n_docs = len(ids)
        if n_docs == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shingles": pa.nulls(0, pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64()),
                }
            )
        h, doc, _ = _shingle_hashes_arrow(batch[text_col], shingle_k)
        order = np.lexsort((h, doc))
        hd, dd = h[order], doc[order]
        keep = np.r_[True, (dd[1:] != dd[:-1]) | (hd[1:] != hd[:-1])]
        hu, du = hd[keep], dd[keep]
        counts = np.bincount(du, minlength=n_docs).astype(np.int64)
        offsets = np.zeros(n_docs + 1, dtype=np.int32)
        offsets[1:] = np.cumsum(counts).astype(np.int32)
        shingles = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(hu.view(np.int64))
        )
        return pa.table(
            {id_col: pa.array(ids), "shingles": shingles, "n": pa.array(counts)}
        )

    return fn


def _heavy_shingle_table(ds, id_col: str, text_col: str, shingle_k: int,
                         sample: float, min_count: int, cap: int):
    """Estimate the globally most document-frequent shingle hashes from a
    deterministic doc-id-hash sample (AllPairs needs only a consistent
    total order, so the estimate affects candidate-bucket sizes, never
    which pairs come out).

    Returns ``(sorted_hashes int64, counts int64)`` — empty arrays when no
    shingle's sampled df reaches ``min_count``.  The sampled pass shuffles
    one (sh) row per (sampled doc, distinct shingle): ``sample`` of the
    prefix exchange, and only the ≥min_count survivors (capped at ``cap``)
    ever reach the driver for broadcast.
    """
    import pyarrow.compute as pc

    thresh = np.uint64(min(int(sample * (1 << 32)), (1 << 32) - 1))

    def sample_shingles(batch: pa.Table) -> pa.Table:
        empty = pa.table({"sh": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            hv = (ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        keep = hv <= thresh
        if not keep.any():
            return empty
        col = batch[text_col].combine_chunks().filter(pa.array(keep))
        h, doc, _ = _shingle_hashes_arrow(col, shingle_k)
        if len(h) == 0:
            return empty
        order = np.lexsort((h, doc))
        hd, dd = h[order], doc[order]
        uniq = np.r_[True, (dd[1:] != dd[:-1]) | (hd[1:] != hd[:-1])]
        return pa.table({"sh": pa.array(hd[uniq].view(np.int64))})

    counted = (
        ds.map_batches(sample_shingles, batch_format="pyarrow")
        .groupby("sh")
        .count()
    )
    sh_parts, cnt_parts = [], []
    for b in counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count()"], min_count)),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            sh_parts.append(b["sh"].to_numpy().astype(np.int64))
            cnt_parts.append(b["count()"].to_numpy().astype(np.int64))
    if not sh_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    sh = np.concatenate(sh_parts)
    cnt = np.concatenate(cnt_parts)
    if len(sh) > cap:
        top = np.argpartition(cnt, len(cnt) - cap)[-cap:]
        sh, cnt = sh[top], cnt[top]
    order = np.argsort(sh)
    return sh[order], cnt[order]


def ngram_jaccard_dedup(
    ds,
    id_col: str,
    threshold: float = 0.5,
    text_col: str = "text",
    shingle_k: int = 5,
    heavy_sample: float = 1.0 / 64.0,
    heavy_min_count: int = 8,
    heavy_max: int = 65536,
    side_of=None,
):
    """Near-duplicate pairs by *exact* character-n-gram Jaccard with
    prefix-filter candidate generation (AllPairs/PPJoin-family, public:
    Bayardo et al. WWW'07, Xiao et al. WWW'08) — EXACT recall for
    jaccard >= threshold, never all-pairs.

    ``side_of`` (optional) turns the self-dedup into a SIMILARITY JOIN:
    a vectorized ``ids -> bool array`` callable splitting the corpus into
    a left (True) and right (False) side — only cross-side pairs are
    emitted, oriented (a_id = left, b_id = right).  Two physical tables
    join by unioning them under a disjoint id namespace and deriving the
    side from the id range; the prefix-filter recall guarantee is
    side-agnostic, so exactness is unchanged.

    Scale shape — three lean shuffles, no full sets and no text in any of
    them except the final per-candidate payload join:

    1. candidates: each doc ships only its PREFIX shingle hashes — the
       first ``n - (ceil(t/(1+t)·n) - 1)`` under the global total order
       (estimated-document-frequency ascending, hash tie-break; Bayardo
       et al. WWW'07 canonical ordering), 8 B each.  Any pair with J ≥ t
       shares a hash in BOTH prefixes (the two suffixes together hold
       < t/(1+t)·(na+nb) ≤ |A∩B| elements) under ANY consistent total
       order, so bucketing by prefix hash loses nothing.  Rare shingles
       sort first, so a globally common shingle lands in suffixes and
       never forms a hot bucket; df is estimated from a deterministic
       ``heavy_sample`` of docs and only the ≥``heavy_min_count``
       heavy hitters (≤``heavy_max``) are broadcast.  Inside each
       reducer a size filter (t·max ≤ min) prunes, then a vectorized
       k-offset pair sweep emits candidates — no Python pair loop.
    2. pair dedup on a coarse key (vectorized unique per reducer).
    3. exact verify: the two full shingle sets join the (rare) candidate
       pairs by id hash (stages.pairjoin); intersection counts come from
       ONE lexsort over (pair, value) across all of a reducer's pairs.

    Returns (a_id, b_id, jaccard), each qualifying pair exactly once.

    Degenerate-shingle-space hazard (measured): prefix filtering only
    prunes when the shingle df distribution is long-tailed.  On a corpus
    whose ``shingle_k``-gram space is tiny relative to the doc count
    (5 000 synthetic docs × 5-gram → 2 041 distinct shingles, median df
    291), EVERY doc pair shares prefix shingles, candidates go
    quadratic and the exchange spilled 70 GB for a true answer of
    ~1 700 pairs.  The fix is choosing ``shingle_k`` so distinct
    shingles ≫ docs (12-gram on the same corpus: 131 198 distinct,
    median df 7, Σdf² ÷13.5 — candidates collapse back to near the true
    pair count).  Rule of thumb: grow ``shingle_k`` until the sampled
    median df is O(expected duplicate-cluster size).
    """
    from ..stages.pairjoin import verify_pairs
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()
    beta = threshold / (1.0 + threshold)
    sets_stage = shingle_sets_stage(id_col, text_col, shingle_k)
    # lazily recomputed per consumer (prefix pass + the two payload-join
    # passes) — at scale, recomputing the cheap hash pass streams better
    # than materializing a corpus-sized shingle table in the object store
    sets_ds = ds.map_batches(sets_stage, batch_format="pyarrow")
    heavy_sh, heavy_cnt = _heavy_shingle_table(
        ds, id_col, text_col, shingle_k, heavy_sample, heavy_min_count, heavy_max
    )

    def emit_prefix(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        n = batch["n"].to_numpy().astype(np.int64)
        sh_col = batch["shingles"].combine_chunks()
        values = sh_col.flatten().to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(ids)), n)
        starts = np.concatenate([[0], np.cumsum(n)])[:-1]
        if len(heavy_sh) and len(values):
            # re-rank within each doc by (estimated df, hash) ascending so
            # the prefix holds the rarest shingles (non-heavy df counts as
            # 0 — any consistent order preserves exact recall)
            loc = np.clip(np.searchsorted(heavy_sh, values), 0, len(heavy_sh) - 1)
            penalty = np.where(heavy_sh[loc] == values, heavy_cnt[loc], 0)
            order = np.lexsort((values, penalty, doc_idx))
            values = values[order]
        suffix = np.maximum(np.ceil(beta * n).astype(np.int64) - 1, 0)
        plen = n - suffix
        pos_in_doc = np.arange(len(values)) - np.repeat(starts, n)
        keep = pos_in_doc < plen[doc_idx]
        sh = values[keep]
        di = doc_idx[keep]
        with np.errstate(over="ignore"):
            rkey = (sh.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(R)
        return pa.table(
            {
                "rkey": pa.array(rkey.astype(np.int64)),
                "sh": pa.array(sh),
                id_col: pa.array(ids[di]),
                "n": pa.array(n[di]),
            }
        )

    prefix_rows = coalesce_for_shuffle(
        sets_ds.map_batches(emit_prefix, batch_format="pyarrow"), 0.5
    )

    _empty_ab = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )

    def pairs_in_reducer(g: pa.Table) -> pa.Table:
        """Candidate pairs for every shingle-bucket of this reducer in one
        vectorized k-offset sweep (cf. simhash_pairs)."""
        if g.num_rows < 2:
            return _empty_ab
        ids = g[id_col].to_numpy().astype(np.int64)
        sh = g["sh"].to_numpy()
        nn = g["n"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, sh))
        s_s = sh[order]
        starts = np.nonzero(np.r_[True, s_s[1:] != s_s[:-1]])[0]
        sizes = np.diff(np.r_[starts, len(order)])
        out_a, out_b = [], []
        for t0, t1 in gap_pair_offsets(starts, sizes):
            ai, bi = order[t0], order[t1]
            na, nb = nn[ai], nn[bi]
            lo = np.minimum(na, nb)
            hi = np.maximum(na, nb)
            # J >= t ⟹ t·max <= |A∩B| <= min; small slack keeps float
            # rounding from ever dropping a true pair
            keep = (ids[ai] != ids[bi]) & (lo >= threshold * hi - 1e-9)
            if side_of is not None:
                sa = side_of(ids[ai])
                keep &= sa != side_of(ids[bi])
            if keep.any():
                a = ids[ai][keep]
                b = ids[bi][keep]
                if side_of is None:
                    out_a.append(np.minimum(a, b))
                    out_b.append(np.maximum(a, b))
                else:
                    swap = ~sa[keep]  # ai on the right side → orient
                    out_a.append(np.where(swap, b, a))
                    out_b.append(np.where(swap, a, b))
        if not out_a:
            return _empty_ab
        # dedup (a, b) BEFORE the pair rows ship: a pair sharing m prefix
        # shingles in this reducer is emitted m times by the k-offset
        # sweep (measured 35× multiplicity on a dup-heavy corpus — 4.3M
        # emitted rows for 125k distinct pairs), and every duplicate rides
        # the verification join's two exchanges.  One lexsort here keeps
        # the exchange O(distinct pairs); cross-reducer duplicates still
        # die in the verify join's first reducer.
        av = np.concatenate(out_a)
        bv = np.concatenate(out_b)
        order = np.lexsort((bv, av))
        av, bv = av[order], bv[order]
        keep = np.r_[True, (av[1:] != av[:-1]) | (bv[1:] != bv[:-1])]
        return pa.table(
            {"a_id": pa.array(av[keep]), "b_id": pa.array(bv[keep])}
        )

    raw_pairs = prefix_rows.groupby("rkey").map_groups(
        pairs_in_reducer, batch_format="pyarrow"
    )

    # cross-reducer pair dedup (design step 2): a pair sharing shingles
    # in MANY buckets re-emerges from every reducer those buckets hash
    # to (measured ~13× residual multiplicity after the in-reducer
    # dedup).  One 16 B/row exchange on the pair hash keeps the verify
    # join's (much wider) exchanges O(distinct pairs).
    def add_pkey(batch: pa.Table) -> pa.Table:
        from ..stages.pairjoin import pair_hash_mod

        a = batch["a_id"].to_numpy().astype(np.int64)
        b = batch["b_id"].to_numpy().astype(np.int64)
        return batch.append_column(
            "pkey", pa.array(pair_hash_mod(a, b, R))
        )

    def unique_ab(g: pa.Table) -> pa.Table:
        a = g["a_id"].to_numpy().astype(np.int64)
        b = g["b_id"].to_numpy().astype(np.int64)
        if len(a) == 0:
            return _empty_ab
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table({"a_id": pa.array(a[keep]), "b_id": pa.array(b[keep])})

    pairs = (
        coalesce_for_shuffle(
            raw_pairs.map_batches(add_pkey, batch_format="pyarrow"), 0.5
        )
        .groupby("pkey")
        .map_groups(unique_ab, batch_format="pyarrow")
    )

    _empty_j = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def verify_red(a, b, apay, bpay) -> pa.Table:
        if len(a) == 0:
            return _empty_j
        import pyarrow.compute as pc

        la = pc.list_value_length(apay).to_numpy().astype(np.int64)
        lb = pc.list_value_length(bpay).to_numpy().astype(np.int64)
        av = apay.flatten().to_numpy(zero_copy_only=False)
        bv = bpay.flatten().to_numpy(zero_copy_only=False)
        p = np.concatenate([np.repeat(np.arange(len(a)), la),
                            np.repeat(np.arange(len(b)), lb)])
        v = np.concatenate([av, bv])
        order = np.lexsort((v, p))
        ps, vs = p[order], v[order]
        dup = (ps[1:] == ps[:-1]) & (vs[1:] == vs[:-1])
        inter = np.bincount(ps[1:][dup], minlength=len(a))
        union = la + lb - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= threshold
        return pa.table(
            {
                "a_id": pa.array(a[keep]),
                "b_id": pa.array(b[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return verify_pairs(
        pairs, sets_ds, id_col, "shingles", pa.list_(pa.int64()), verify_red
    )


def simhash_pairs(ds, id_col: str, text_col: str = "text", max_hamming: int = 3):
    """Near-duplicate pairs by SimHash Hamming distance — EXACT recall.

    The 64-bit simhash splits into 4 blocks of 16 bits; by pigeonhole any
    pair with Hamming distance ≤ 3 agrees exactly on at least one block,
    so block-equality bucketing loses nothing.  Per bucket, candidates
    verify with a vectorized popcount of the XOR — the 8-byte hash rides
    the shuffle, nothing else.  Returns (a_id, b_id, hamming), each pair
    once.
    """
    from ..stages.util import coalesce_for_shuffle, reducer_count

    assert max_hamming < 4, "4-block bucketing guarantees recall only for <4"
    R = reducer_count()
    sim_stage = simhash_stage(id_col, text_col)

    def to_blocks(batch: pa.Table) -> pa.Table:
        sb = sim_stage(batch)
        ids = sb[id_col].to_numpy().astype(np.int64)
        h = sb["simhash"].to_numpy().view(np.uint64)
        out_bucket, out_id, out_h = [], [], []
        for blk in range(4):
            val = (h >> np.uint64(blk * 16)) & np.uint64(0xFFFF)
            bucket = (val | np.uint64(blk << 16)).astype(np.uint64)
            with np.errstate(over="ignore"):
                bucket = bucket * np.uint64(0x9E3779B97F4A7C15) + np.uint64(blk)
            out_bucket.append(bucket)
            out_id.append(ids)
            out_h.append(h)
        bucket = np.concatenate(out_bucket)
        return pa.table(
            {
                "rkey": pa.array((bucket % np.uint64(R)).astype(np.int64)),
                "bucket": pa.array(bucket.view(np.int64)),
                id_col: pa.array(np.concatenate(out_id)),
                "simhash": pa.array(np.concatenate(out_h).view(np.int64)),
            }
        )

    blocks = coalesce_for_shuffle(ds.map_batches(to_blocks, batch_format="pyarrow"), 0.5)

    _empty = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    def pairs_in_reducer(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty
        ids = g[id_col].to_numpy().astype(np.int64)
        bucket = g["bucket"].to_numpy()
        h = g["simhash"].to_numpy().view(np.uint64)
        order = np.lexsort((ids, bucket))
        b_s = bucket[order]
        starts = np.nonzero(np.r_[True, b_s[1:] != b_s[:-1]])[0]
        sizes = np.diff(np.r_[starts, len(order)])
        out_a, out_b, out_h = [], [], []
        # k-offset sweep: all (t, t+k) pairs across buckets, vectorized
        for t0, t1 in gap_pair_offsets(starts, sizes):
            ai = order[t0]
            bi = order[t1]
            x = h[ai] ^ h[bi]
            # vectorized popcount via byte-view + lookup
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            keep = (ham <= max_hamming) & (ids[ai] != ids[bi])
            if keep.any():
                a = ids[ai][keep]
                b = ids[bi][keep]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
                out_h.append(ham[keep].astype(np.int64))
        if not out_a:
            return _empty
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(out_a)),
                "b_id": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    pairs = blocks.groupby("rkey").map_groups(pairs_in_reducer, batch_format="pyarrow")

    def add_pkey(batch: pa.Table) -> pa.Table:
        a = batch["a_id"].to_numpy().view(np.uint64)
        b = batch["b_id"].to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            pk = (a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(R)
        return batch.append_column("pkey", pa.array(pk.astype(np.int64)))

    def unique_pairs(g: pa.Table) -> pa.Table:
        a = g["a_id"].to_numpy()
        b = g["b_id"].to_numpy()
        hm = g["hamming"].to_numpy()
        order = np.lexsort((b, a))
        a, b, hm = a[order], b[order], hm[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pa.table(
            {
                "a_id": pa.array(a[keep]),
                "b_id": pa.array(b[keep]),
                "hamming": pa.array(hm[keep]),
            }
        )

    return (
        pairs.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(unique_pairs, batch_format="pyarrow")
    )


# -- benchmark decontamination ----------------------------------------------


class _ContaminationStage:
    """Broadcast-probe: the eval split's sorted distinct shingle hashes
    live in the object store; only the ObjectRef is pickled into the
    task closure, each task resolves it plasma-local (same shape as
    ann._BruteCosine)."""

    def __init__(self, ev_ref, id_col: str, text_col: str,
                 eval_mod: int, shingle_k: int):
        self.ev_ref = ev_ref
        self.ev = None
        self.id_col = id_col
        self.text_col = text_col
        self.eval_mod = eval_mod
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self.ev is None:
            self.ev = ray.get(self.ev_ref)
        ids = batch[self.id_col].to_numpy()
        keep = ids % self.eval_mod != 0
        ids = ids[keep]
        if len(ids) == 0:
            return pa.table(
                {
                    self.id_col: pa.array(ids),
                    "n_shingles": pa.array(np.zeros(0, np.int64)),
                    "n_contaminated": pa.array(np.zeros(0, np.int64)),
                }
            )
        texts = [
            t if t is not None else ""
            for t in batch[self.text_col].filter(pa.array(keep)).to_pylist()
        ]
        h, doc, _ = _batch_shingle_hashes(texts, self.shingle_k)
        # distinct (doc, shingle) — the SQL twin's SELECT DISTINCT
        order = np.lexsort((h, doc))
        h, doc = h[order], doc[order]
        first = np.r_[True, (h[1:] != h[:-1]) | (doc[1:] != doc[:-1])]
        h, doc = h[first], doc[first]
        ev = self.ev
        pos = np.searchsorted(ev, h)
        member = np.zeros(len(h), dtype=bool)
        inb = pos < len(ev)
        member[inb] = ev[pos[inb]] == h[inb]
        n_sh = np.bincount(doc, minlength=len(ids)).astype(np.int64)
        n_ct = np.bincount(doc[member], minlength=len(ids)).astype(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "n_shingles": pa.array(n_sh),
                "n_contaminated": pa.array(n_ct),
            }
        )


def contamination_stats(ds, id_col: str, text_col: str = "text",
                        eval_mod: int = 37, shingle_k: int = 5):
    """Benchmark decontamination: for every train document, how many of
    its distinct k-char shingles also appear anywhere in the eval split
    (documents with ``id % eval_mod == 0`` — the deterministic stand-in
    for a held-out benchmark set).

    Scale shape: the eval side is benchmark-sized by definition, so its
    DISTINCT shingle hashes are reduced per batch, uniqued once and
    broadcast via ``ray.put`` (8 B per distinct shingle — a 10^8-shingle
    benchmark suite is an 800 MB plasma object, fetched once per node);
    the corpus side then STREAMS with a per-batch sorted-array
    membership test — no shuffle at all on the train side.  If the eval
    side ever outgrows plasma, the named swap is a hash-partitioned
    semi-join on shingle hash (stages/pairjoin shape).
    """
    import ray

    def eval_hashes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        keep = ids % eval_mod == 0
        if not keep.any():
            return pa.table({"h": pa.array(np.zeros(0, np.uint64))})
        texts = [
            t if t is not None else ""
            for t in batch[text_col].filter(pa.array(keep)).to_pylist()
        ]
        h, _, _ = _batch_shingle_hashes(texts, shingle_k)
        return pa.table({"h": pa.array(np.unique(h))})

    parts = []
    for b in (
        ds.map_batches(eval_hashes, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        parts.append(b["h"].to_numpy())
    ev = (
        np.unique(np.concatenate(parts))
        if parts
        else np.zeros(0, np.uint64)
    )
    ev_ref = ray.put(ev)
    stage = _ContaminationStage(ev_ref, id_col, text_col, eval_mod, shingle_k)
    return ds.map_batches(stage, batch_format="pyarrow")


# --- Edit-distance-1 fuzzy dedup (FastSS deletion neighborhoods) -------------


_ED1_B = np.uint64(0x100000001B3)  # FNV-64 prime: odd, good avalanche with mix
_ED1_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _ed1_matrix(col):
    """(ids-aligned) padded byte matrix of a short-string key column:
    (chars uint64 (n × P), lens int64).  P is the batch's longest key —
    callers bound it via the ``prefix`` parameter, so unlike the old
    full-document padded-matrix antipattern the width is a capped
    constant, not data-dependent."""
    from .text import _string_views

    lens, starts, values = _string_views(col)
    n = len(lens)
    P = int(lens.max(initial=0))
    c = np.zeros((n, max(P, 1)), dtype=np.uint64)
    j = np.arange(max(P, 1), dtype=np.int64)
    mask = j[None, :] < lens[:, None]
    if P:
        idx = starts[:, None] + j[None, :]
        c[mask] = values[idx[mask]]
    return c, lens, mask


def _ed1_variant_hashes(col):
    """All deletion-neighborhood hashes of each key: the key's own
    polynomial hash plus the hash of the key with char i removed, for
    every i.  One hash space — ``hash(delete(s, i))`` equals the full
    hash of the deleted STRING, so equal strings / deletion / insertion /
    substitution neighbors always collide (exact ed≤1 recall; false
    bucket-mates are killed by the exact verifier).

    Returns (row_idx int64, vhash uint64) with ``sum(len+1)`` rows.
    Everything is vectorized over the batch: Horner prefix hashes loop
    over ≤P columns (P = key width cap), never over rows.
    """
    c, lens, mask = _ed1_matrix(col)
    n, P = c.shape
    B = _ED1_B
    pow_ = np.empty(P + 1, dtype=np.uint64)
    pow_[0] = 1
    with np.errstate(over="ignore"):
        for k in range(P):
            pow_[k + 1] = pow_[k] * B
        # W[r, j] = B^(L_r - 1 - j) for j < L_r (weight of char j in the
        # full-string polynomial), else 0
        e = lens[:, None] - 1 - np.arange(P, dtype=np.int64)[None, :]
        W = np.where(mask, pow_[np.clip(e, 0, P)], np.uint64(0))
        term = c * W
        full = term.sum(axis=1, dtype=np.uint64)
        # S[r, i] = sum_{j >= i} term[r, j]  (suffix sums, shifted below)
        S = np.zeros((n, P + 1), dtype=np.uint64)
        if P:
            S[:, :P] = term[:, ::-1].cumsum(axis=1, dtype=np.uint64)[:, ::-1]
        # A[r, i] = Horner hash of the first i chars
        A = np.zeros((n, P), dtype=np.uint64)
        acc = np.zeros(n, dtype=np.uint64)
        for i in range(P):
            A[:, i] = acc
            acc = acc * B + c[:, i]
        # delete char i: prefix(i) shifted over the remaining suffix
        D = A * W + S[:, 1:]
    row = np.concatenate([np.arange(n, dtype=np.int64), np.repeat(np.arange(n, dtype=np.int64), lens)])
    vh = np.concatenate([full, D[mask]])
    return row, vh


def _ed1_leq1(apay: pa.Array, bpay: pa.Array) -> np.ndarray:
    """Vectorized exact Levenshtein ≤ 1 over short-string pairs.
    Returns dist int64 per pair (0, 1, or 2 meaning '> 1').

    Equal length: ed ≤ 1 ⟺ Hamming ≤ 1 (a single length-preserving edit
    is a substitution).  Length diff 1: delete the longer string's char
    at the first mismatch position and require byte equality.  Both are
    padded-matrix compares whose width is the key cap, not doc length.
    """
    ca, la, _ = _ed1_matrix(apay)
    cb, lb, _ = _ed1_matrix(bpay)
    P = max(ca.shape[1], cb.shape[1])
    n = len(la)
    if ca.shape[1] < P:
        ca = np.pad(ca, ((0, 0), (0, P - ca.shape[1])))
    if cb.shape[1] < P:
        cb = np.pad(cb, ((0, 0), (0, P - cb.shape[1])))
    dist = np.full(n, 2, dtype=np.int64)
    neq = ca != cb
    same = la == lb
    ham = neq.sum(axis=1)
    dist[same] = np.minimum(ham[same], 2)
    d1 = np.abs(la - lb) == 1
    if d1.any():
        a_long = (la >= lb)[:, None]
        longer = np.where(a_long, ca, cb)[d1]
        shorter = np.where(a_long, cb, ca)[d1]
        # first mismatch (rows differ somewhere: the longer's extra char
        # vs the 0 pad at worst, and 0x00 never occurs in utf8 text)
        k = np.argmax(longer != shorter, axis=1)
        j = np.arange(P - 1, dtype=np.int64)[None, :]
        del_idx = j + (j >= k[:, None])
        dele = np.take_along_axis(longer, del_idx, axis=1)
        okrow = (dele == shorter[:, : P - 1]).all(axis=1)
        sub = dist[d1]
        sub[okrow] = 1
        dist[d1] = sub
    return dist


def fuzzy_ed1_pairs(ds, id_col: str, text_col: str = "text",
                    prefix: int = 64):
    """Fuzzy-duplicate pairs at edit distance ≤ 1 over a short key —
    FastSS deletion-neighborhood bucketing (Bocek et al., "Fast Similarity
    Search in Large Dictionaries", 2007): ed(s,t) ≤ 1 ⟺ the sets
    {s} ∪ deletions(s) and {t} ∪ deletions(t) intersect, so bucketing on
    every deletion-variant hash has EXACT recall; an exact vectorized
    Levenshtein kills hash collisions.  Returns (a_id, b_id, dist), each
    qualifying pair once.

    The key is the first ``prefix`` characters of ``text_col`` (prefix
    fingerprint dedup — the standard guard that also caps the padded-
    matrix width and the variant fan-out).  Designed for SHORT keys
    (titles, URLs, prefixes): the bucket shuffle carries len+1 rows of
    16 B per key and the key strings themselves move only once, to the
    pairs that need verification (``stages/pairjoin.verify_pairs``).
    ``prefix`` ≤ 256 enforced — cost is O(len) variants per key, which is
    the wrong tool for whole documents (use minhash/simhash for those).
    """
    assert 0 < prefix <= 256, "deletion neighborhoods are for short keys"
    import pyarrow.compute as pc

    from ..stages.pairjoin import verify_pairs
    from ..stages.util import coalesce_for_shuffle, reducer_count

    R = reducer_count()

    def key_of(batch: pa.Table):
        return pc.utf8_slice_codeunits(batch[text_col], 0, prefix)

    def to_buckets(batch: pa.Table) -> pa.Table:
        # NULL text never buckets: SQL's levenshtein(NULL, x) is NULL, so
        # the oracle drops those rows — treating NULL as "" would pair a
        # NULL doc with every key of length <= 1.
        batch = batch.filter(pc.is_valid(batch[text_col]))
        ids = batch[id_col].to_numpy().astype(np.int64)
        row, vh = _ed1_variant_hashes(key_of(batch))
        with np.errstate(over="ignore"):
            rk = ((vh * _ED1_GOLD) >> np.uint64(17)) % np.uint64(R)
        return pa.table(
            {
                "rkey": pa.array(rk.astype(np.int64)),
                "vhash": pa.array(vh.view(np.int64)),
                "id": pa.array(ids[row]),
            }
        )

    buckets = coalesce_for_shuffle(
        ds.map_batches(to_buckets, batch_format="pyarrow"), 0.5
    )

    _empty = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )

    def pairs_in_reducer(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty
        ids = g["id"].to_numpy().astype(np.int64)
        vh = g["vhash"].to_numpy()
        order = np.lexsort((ids, vh))
        vs, is_ = vh[order], ids[order]
        # drop same-id duplicates inside a bucket (a key with two equal
        # adjacent chars yields the same deletion twice)
        keep = np.r_[True, (vs[1:] != vs[:-1]) | (is_[1:] != is_[:-1])]
        vs, is_ = vs[keep], is_[keep]
        starts = np.nonzero(np.r_[True, vs[1:] != vs[:-1]])[0]
        sizes = np.diff(np.r_[starts, len(vs)])
        out_a, out_b = [], []
        for t0, t1 in gap_pair_offsets(starts, sizes):
            a, b = is_[t0], is_[t1]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        if not out_a:
            return _empty
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(out_a)),
                "b_id": pa.array(np.concatenate(out_b)),
            }
        )

    pairs = buckets.groupby("rkey").map_groups(
        pairs_in_reducer, batch_format="pyarrow"
    )

    def key_table(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col], "key": key_of(batch)})

    payload = ds.map_batches(key_table, batch_format="pyarrow")

    _empty_v = pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )

    def verify_red(a, b, apay, bpay) -> pa.Table:
        if len(a) == 0:
            return _empty_v
        dist = _ed1_leq1(apay, bpay)
        keep = dist <= 1
        return pa.table(
            {
                "a_id": pa.array(a[keep]),
                "b_id": pa.array(b[keep]),
                "dist": pa.array(dist[keep]),
            }
        )

    return verify_pairs(pairs, payload, id_col, "key", pa.string(), verify_red)


_NORM_PATTERN = r"[^a-z0-9]+"


def normalized_dedup(ds, id_col: str, text_col: str = "text"):
    """Exact dedup AFTER lexical normalization — lowercase, collapse every
    non-alphanumeric run to one space, trim.  Catches the near-duplicates
    that differ only in case, punctuation, or whitespace (re-encoded
    mirrors, print views), which raw :func:`exact_dedup` misses.

    Returns (keep_id = min id, n_dups) per distinct NORMALIZED text —
    SQL twin groups by ``trim(regexp_replace(lower(text), '[^a-z0-9]+',
    ' ', 'g'), ' ')`` (Arrow and DuckDB both run RE2, so the
    normalization is byte-identical on both sides).

    Scale shape: normalization is three zero-copy Arrow kernels inside
    the same ``map_batches`` that hashes; everything downstream is
    :func:`exact_dedup`'s (id, hash)-only exchange.
    """
    import pyarrow.compute as _pc

    def norm(batch: pa.Table) -> pa.Table:
        t = _pc.utf8_trim(
            _pc.replace_substring_regex(
                _pc.utf8_lower(batch[text_col]), _NORM_PATTERN, " "
            ),
            " ",
        )
        return pa.table({id_col: batch[id_col], text_col: t})

    return exact_dedup(
        ds.map_batches(norm, batch_format="pyarrow"), id_col, text_col
    )


def sql_normalized_dedup(table: str, id_col: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`normalized_dedup`."""
    return f"""
        SELECT MIN({id_col}) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM {table}
        GROUP BY trim(regexp_replace(lower({text_col}),
                                     '{_NORM_PATTERN}', ' ', 'g'), ' ')
    """
