"""Multimodal (binary-payload) stage plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
Decode resolution is per-actor, at ``__init__`` time:

- ``decode="real"`` uses Pillow when it is importable (optional import —
  not shipped in this container, but the code path is real and used
  where PIL exists) and raises a descriptive ``NotImplementedError``
  otherwise.  Video frame extraction has no pure-python codec, so its
  real path always raises here.
- ``decode="fake"`` produces deterministic pseudo-metadata straight off
  the Arrow binary buffers — fully vectorized, no per-row Python — so
  the Ray-side plumbing (actor pools, small batch sizes for large
  payloads, binary-in / typed-out schema) is real and tested either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pil_image():
    """Optional-import hook for the real image path."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _binary_views(col: pa.ChunkedArray):
    """(lens, starts, values) numpy views of a binary column's buffers —
    zero-copy, nulls normalized to empty."""
    arr = pc.fill_null(col, b"")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # older pyarrow: still chunked
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.binary())
    buf_off = arr.buffers()[1]
    buf_val = arr.buffers()[2]
    offsets = np.frombuffer(buf_off, dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    values = (
        np.frombuffer(buf_val, dtype=np.uint8)
        if buf_val is not None
        else np.empty(0, np.uint8)
    )
    return offsets[1:] - offsets[:-1], offsets[:-1], values


def _head_bytes(lens, starts, values, k: int) -> np.ndarray:
    """(n, k) uint8 matrix of each payload's first k bytes, zero-padded."""
    n = len(lens)
    if n == 0:
        return np.empty((0, k), np.uint8)
    idx = starts[:, None] + np.arange(k)[None, :]
    valid = np.arange(k)[None, :] < lens[:, None]
    safe = np.clip(idx, 0, max(len(values) - 1, 0))
    if len(values) == 0:
        return np.zeros((n, k), np.uint8)
    return np.where(valid, values[safe], 0).astype(np.uint8)


# JPEG start-of-frame markers (FF Cx) that carry dimensions — C4 (DHT),
# C8 (JPG extension) and CC (DAC) are tables, not frames
_JPEG_SOF = np.array(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF],
    dtype=np.uint8,
)


def parse_image_headers(lens, starts, values):
    """(format, width, height) per payload — REAL container-header parsing
    in pure numpy, no image library:

    - PNG: 8-byte magic, then the IHDR chunk is mandatory-first, so width
      and height are the big-endian u32 at byte offsets 16 and 20.
    - GIF (87a/89a): logical-screen width/height are little-endian u16 at
      offsets 6 and 8.
    - JPEG: dimensions live in the first SOFn segment at a variable
      offset, found by WALKING the segment chain from offset 2 (marker,
      big-endian length, hop) — a raw byte scan for ``FF Cx`` is wrong
      because those bytes are legal inside APPn/COM payloads (an EXIF
      thumbnail embeds a whole JPEG with its own SOF).  The walk is a
      lock-step vectorized loop across every JPEG in the batch (bounded
      hops; headers are dozens of segments at most), handling fill
      bytes, standalone markers (TEM/RSTn), and malformed lengths.
      Height/width are big-endian u16 at marker offsets +5 / +7.

    Unrecognized payloads get format "unknown" and 0×0.  Everything is a
    batch-wide numpy pass; no per-row Python.
    """
    n = len(lens)
    head = _head_bytes(lens, starts, values, 24)
    fmt = np.zeros(n, dtype=np.int8)  # 0 unknown, 1 png, 2 gif, 3 jpeg
    w = np.zeros(n, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)

    png = (
        (lens >= 24)
        & (head[:, 0] == 0x89) & (head[:, 1] == 0x50)
        & (head[:, 2] == 0x4E) & (head[:, 3] == 0x47)
        & (head[:, 12] == ord("I")) & (head[:, 13] == ord("H"))
        & (head[:, 14] == ord("D")) & (head[:, 15] == ord("R"))
    )
    be32 = lambda m, o: (  # noqa: E731
        m[:, o].astype(np.int64) << 24 | m[:, o + 1].astype(np.int64) << 16
        | m[:, o + 2].astype(np.int64) << 8 | m[:, o + 3].astype(np.int64)
    )
    fmt[png] = 1
    w[png] = be32(head, 16)[png]
    h[png] = be32(head, 20)[png]

    gif = (
        (lens >= 10) & ~png
        & (head[:, 0] == ord("G")) & (head[:, 1] == ord("I"))
        & (head[:, 2] == ord("F")) & (head[:, 3] == ord("8"))
        & ((head[:, 4] == ord("7")) | (head[:, 4] == ord("9")))
        & (head[:, 5] == ord("a"))
    )
    fmt[gif] = 2
    w[gif] = (head[:, 6].astype(np.int64) | head[:, 7].astype(np.int64) << 8)[gif]
    h[gif] = (head[:, 8].astype(np.int64) | head[:, 9].astype(np.int64) << 8)[gif]

    jpeg = (lens >= 2) & ~png & ~gif & (head[:, 0] == 0xFF) & (head[:, 1] == 0xD8)
    fmt[jpeg] = 3  # dimensions stay 0×0 unless an SOF segment is found
    jidx = np.nonzero(jpeg)[0]
    if len(jidx) and len(values) >= 4:
        p = starts[jidx] + 2          # first marker after SOI
        end = starts[jidx] + lens[jidx]
        alive = np.ones(len(jidx), dtype=bool)
        # lock-step segment walk: every hop advances each live payload by
        # one marker/segment; 256 hops covers any sane header (each hop
        # is O(live payloads), not O(bytes))
        for _ in range(256):
            act = alive & (p + 1 < end)
            if not act.any():
                break
            alive = act.copy()  # out-of-span payloads stop walking
            pc_ = np.clip(p, 0, max(len(values) - 2, 0))
            b0 = values[pc_]
            b1 = values[pc_ + 1]
            # a marker must start with FF; anything else is malformed
            alive &= ~act | (b0 == 0xFF)
            act = alive & act
            pad = act & (b1 == 0xFF)          # fill byte: slide one
            p[pad] += 1
            sof = act & ~pad & np.isin(b1, _JPEG_SOF)
            got = sof & (p + 9 <= end)
            if got.any():
                pj = p[got]
                rows = jidx[got]
                h[rows] = values[pj + 5].astype(np.int64) << 8 | values[pj + 6]
                w[rows] = values[pj + 7].astype(np.int64) << 8 | values[pj + 8]
            alive &= ~sof                      # found (or truncated): stop
            standalone = act & ~pad & ~sof & (
                (b1 == 0x01) | ((b1 >= 0xD0) & (b1 <= 0xD9))
            )
            p[standalone] += 2
            seg = act & ~pad & ~sof & ~standalone
            if seg.any():
                okl = seg & (p + 3 < end)
                alive &= ~seg | okl            # no room for a length: stop
                sl = np.clip(p, 0, max(len(values) - 4, 0))
                ln = values[sl + 2].astype(np.int64) << 8 | values[sl + 3]
                good = okl & (ln >= 2)
                alive &= ~okl | good           # malformed length: stop
                p[good] += 2 + ln[good]
                # entropy-coded data follows SOS — dimensions must come
                # from a SOF BEFORE it, so stop at SOS too
                alive &= ~(good & (b1 == 0xDA))
    names = np.array(["unknown", "png", "gif", "jpeg"])
    return names[fmt], w, h


def synth_image_payloads(ids: np.ndarray) -> pa.Array:
    """Deterministic per-id image payloads with REAL container headers
    (no image library): format cycles png/gif/jpeg by ``ids % 3``; planted
    dimensions are ``width = ids % 509 + 1`` and ``height = ids % 251 + 1``
    so an SQL oracle can recompute what a correct header parse extracts.
    Fully vectorized — per-format fixed-length templates scattered into
    one flat value buffer."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    f = (ids % 3).astype(np.int64)
    w = (ids % 509 + 1).astype(np.int64)
    h = (ids % 251 + 1).astype(np.int64)
    sizes = np.array([33, 13, 35], dtype=np.int64)[f]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    vals = np.zeros(int(offs[-1]), dtype=np.uint8)

    def _scatter(rows, tpl):
        if len(rows) == 0:
            return
        width = tpl.shape[1]
        idx = offs[rows][:, None] + np.arange(width)[None, :]
        vals[idx.ravel()] = tpl.ravel()

    rows = np.nonzero(f == 0)[0]  # PNG: magic + IHDR chunk + zero CRC pad
    if len(rows):
        tpl = np.zeros((len(rows), 33), dtype=np.uint8)
        tpl[:, :16] = np.frombuffer(
            b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR", dtype=np.uint8
        )
        for j in range(4):
            tpl[:, 16 + j] = (w[rows] >> (8 * (3 - j))) & 0xFF
            tpl[:, 20 + j] = (h[rows] >> (8 * (3 - j))) & 0xFF
        tpl[:, 24] = 8  # bit depth
        tpl[:, 25] = 2  # truecolor
        _scatter(rows, tpl)

    rows = np.nonzero(f == 1)[0]  # GIF89a logical screen descriptor
    if len(rows):
        tpl = np.zeros((len(rows), 13), dtype=np.uint8)
        tpl[:, :6] = np.frombuffer(b"GIF89a", dtype=np.uint8)
        tpl[:, 6] = w[rows] & 0xFF
        tpl[:, 7] = (w[rows] >> 8) & 0xFF
        tpl[:, 8] = h[rows] & 0xFF
        tpl[:, 9] = (h[rows] >> 8) & 0xFF
        _scatter(rows, tpl)

    rows = np.nonzero(f == 2)[0]  # JPEG: SOI + APP0(JFIF) + SOF0 + EOI
    if len(rows):
        tpl = np.zeros((len(rows), 35), dtype=np.uint8)
        tpl[:, :22] = np.frombuffer(
            b"\xff\xd8"                      # SOI
            b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
            b"\xff\xc0",                     # SOF0 marker (segment continues)
            dtype=np.uint8,
        )
        tpl[:, 22:24] = [0x00, 0x0B]         # SOF0 length: 8 + 1 component
        tpl[:, 24] = 8                       # precision
        tpl[:, 25] = (h[rows] >> 8) & 0xFF
        tpl[:, 26] = h[rows] & 0xFF
        tpl[:, 27] = (w[rows] >> 8) & 0xFF
        tpl[:, 28] = w[rows] & 0xFF
        tpl[:, 29] = 1                       # 1 component
        tpl[:, 30:33] = [1, 0x11, 0]         # id, 1x1 sampling, qtable
        tpl[:, 33:35] = [0xFF, 0xD9]         # EOI
        _scatter(rows, tpl)

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
         pa.py_buffer(vals.tobytes())],
    )


class DecodeStage:
    """Actor-pool stage: binary payload → typed metadata/features.

    ``__init__`` is where the decoder loads once per actor; ``__call__``
    handles one (small) batch of payloads.

    ``decode`` modes: "header" (REAL container-header parse, pure numpy —
    see ``parse_image_headers``), "real" (full pixel decode via Pillow
    when importable), "fake" (deterministic byte math, kept for plumbing
    tests on non-image payloads).
    """

    def __init__(self, id_col: str, payload_col: str, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        if decode not in ("fake", "real", "header"):
            raise ValueError(decode)
        self.decode = decode
        self.pil = None
        if decode == "real":
            self.pil = _pil_image()
            if self.pil is None:
                raise NotImplementedError(
                    "decode='real' needs Pillow, which is not installed in "
                    "this environment; decode='fake' exercises the same "
                    "plumbing deterministically"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        lens, starts, values = _binary_views(batch[self.payload_col])
        head = _head_bytes(lens, starts, values, 8)
        checksum = (
            (head.astype(np.uint64) << (np.uint64(8) * np.arange(8, dtype=np.uint64)))
            .sum(axis=1)
            .astype(np.uint64)
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        ).astype(np.int64)
        if self.decode == "real":
            import io

            width = np.zeros(len(ids), np.int64)
            height = np.zeros(len(ids), np.int64)
            payloads = batch[self.payload_col].to_pylist()
            for i, p in enumerate(payloads):  # PIL API is per-image
                if p:
                    with self.pil.open(io.BytesIO(p)) as im:
                        width[i], height[i] = im.size
        elif self.decode == "header":
            fmt, width, height = parse_image_headers(lens, starts, values)
            return pa.table(
                {
                    self.id_col: pa.array(ids),
                    "format": pa.array(fmt),
                    "n_bytes": pa.array(lens.astype(np.int64)),
                    "width": pa.array(width),
                    "height": pa.array(height),
                }
            )
        else:
            # deterministic fake: pretend the first bytes are a header
            width = head[:, 0].astype(np.int64) * 16 + 64
            height = head[:, 1].astype(np.int64) * 16 + 64
            width[lens == 0] = 64
            height[lens <= 1] = 64
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "n_bytes": pa.array(lens.astype(np.int64)),
                "width": pa.array(width),
                "height": pa.array(height),
                "checksum": pa.array(checksum),
            }
        )


def decode_metadata(ds, id_col: str, payload_col: str, concurrency: int = 2,
                    batch_size: int = 64, decode: str = "fake"):
    """Run the decode over a dataset of binary payloads.

    Small ``batch_size`` on purpose: batch_bytes = batch_size × payload —
    size so (batch × concurrency) fits the worker heap.
    """
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col, "decode": decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStage:
    """Actor-pool stage: (payload, width, height) → resized payload.

    ``decode="real"`` decodes → resamples → re-encodes PNG with Pillow
    (loaded once per actor) when importable; the fake path produces a
    deterministic "resized" payload (input bytes tiled to a size
    proportional to the target area) so schema, batch sizing and actor
    plumbing stay testable without image libraries.
    """

    def __init__(self, id_col: str, payload_col: str,
                 target_w: int = 224, target_h: int = 224, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.target_w = target_w
        self.target_h = target_h
        self.decode = decode
        self.pil = None
        if decode == "real":
            self.pil = _pil_image()
            if self.pil is None:
                raise NotImplementedError(
                    "resize decode='real' needs Pillow (not installed here)"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "real":
            import io

            out = []
            for p in batch[self.payload_col].to_pylist():
                if not p:
                    out.append(b"")
                    continue
                with self.pil.open(io.BytesIO(p)) as im:
                    im = im.resize((self.target_w, self.target_h))
                    sink = io.BytesIO()
                    im.save(sink, format="PNG")
                    out.append(sink.getvalue())
            resized = pa.array(out, pa.binary())
        else:
            # fake: tile each payload's bytes to a target-area-derived
            # length — vectorized gather with modular indexing.  An
            # EMPTY payload tiles to an empty output (the real-decode
            # path and the SQL twin's substr(repeat(...)) agree).
            lens, starts, values = _binary_views(batch[self.payload_col])
            out_len = max(16, (self.target_w * self.target_h) // 1024)
            n = len(lens)
            safe_lens = np.maximum(lens, 1)
            row_out = np.where(lens > 0, out_len, 0).astype(np.int64)
            idx = starts[:, None] + (np.arange(out_len)[None, :] % safe_lens[:, None])
            if len(values) == 0:
                flat = np.zeros(0, np.uint8)
            else:
                keep = (lens > 0)[:, None] & np.ones(out_len, bool)[None, :]
                flat = values[np.clip(idx, 0, len(values) - 1)][keep].astype(
                    np.uint8
                ).ravel()
            offsets = pa.array(
                np.concatenate([[0], np.cumsum(row_out)]).astype(np.int32),
                pa.int32(),
            )
            resized = pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offsets.to_numpy().tobytes()),
                 pa.py_buffer(flat.tobytes())],
            )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "payload": resized,
                "width": pa.array(
                    np.full(batch.num_rows, self.target_w, dtype=np.int64)
                ),
                "height": pa.array(
                    np.full(batch.num_rows, self.target_h, dtype=np.int64)
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video payload → every-Nth-frame sample.

    Emits one row per sampled frame (``flat_map`` semantics inside
    ``map_batches``): (id, frame_idx, frame_payload).  There is no
    pure-python video codec to optionally import, so ``decode="real"``
    always raises here; the fake path treats the payload as fixed-size
    frames and slices them vectorized off the Arrow buffers.
    """

    def __init__(self, id_col: str, payload_col: str, every_n: int = 30,
                 frame_bytes: int = 64, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        if decode == "real":
            raise NotImplementedError(
                "video decode needs an ffmpeg binding, none is available "
                "in this environment"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        lens, starts, values = _binary_views(batch[self.payload_col])
        fb = self.frame_bytes
        n_frames = np.maximum(lens // fb, 1)
        n_sampled = (n_frames + self.every_n - 1) // self.every_n
        row = np.repeat(np.arange(len(ids)), n_sampled)
        ends = np.cumsum(n_sampled)
        local = np.arange(int(ends[-1]) if len(ends) else 0) - np.repeat(
            ends - n_sampled, n_sampled
        )
        fi = local * self.every_n
        f_start = starts[row] + fi * fb
        f_len = np.minimum(fb, np.maximum(lens[row] - fi * fb, 0))
        # gather all sampled frame bytes in one pass
        total = int(f_len.sum())
        out_vals = np.zeros(total, np.uint8)
        out_off = np.zeros(len(row) + 1, np.int64)
        np.cumsum(f_len, out=out_off[1:])
        if total and len(values):
            gather = np.repeat(f_start - out_off[:-1], f_len) + np.arange(total)
            out_vals = values[np.clip(gather, 0, len(values) - 1)]
        frames = pa.BinaryArray.from_buffers(
            pa.binary(), len(row),
            [None, pa.py_buffer(out_off.astype(np.int32).tobytes()),
             pa.py_buffer(out_vals.tobytes())],
        )
        return pa.table(
            {
                self.id_col: pa.array(ids[row]),
                "frame_idx": pa.array(fi.astype(np.int64)),
                "frame": frames,
            }
        )


def resize_images(ds, id_col: str, payload_col: str, target_w: int = 224,
                  target_h: int = 224, concurrency: int = 2, batch_size: int = 64,
                  decode: str = "fake"):
    """Image resize over a binary-payload dataset (real path = Pillow
    when importable; deterministic fake otherwise)."""
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col,
            "target_w": target_w, "target_h": target_h, "decode": decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, id_col: str, payload_col: str, every_n: int = 30,
                  concurrency: int = 2, batch_size: int = 16,
                  decode: str = "fake"):
    """Video frame sampling — one output row per sampled frame.

    batch_size is small on purpose: video payloads are the largest rows in
    the table and the output fans out per frame.
    """
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col, "every_n": every_n,
            "decode": decode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# audio: canonical WAV — a container numpy can decode COMPLETELY (header
# AND samples), no audio library required
# ---------------------------------------------------------------------------

_WAV_RATE = 8000
_WAV_MOD = 20011
_WAV_SUB = 10005  # waveform values in [-10005, 10005] — inside int16


def _wav_samples(ids: np.ndarray, n_samples: np.ndarray) -> np.ndarray:
    """The deterministic integer waveform: sample_t(id) =
    ((id*31 + t*t*7) mod 20011) - 10005.  Pure integer arithmetic so an
    independent engine (the SQL oracle) reproduces every sample exactly —
    no transcendentals, no float rounding."""
    total = int(n_samples.sum())
    row = np.repeat(np.arange(len(ids)), n_samples)
    starts = np.concatenate([[0], np.cumsum(n_samples)])[:-1]
    t = np.arange(total, dtype=np.int64) - starts[row]
    x = (ids[row] * np.int64(31) + t * t * np.int64(7)) % np.int64(_WAV_MOD)
    return (x - np.int64(_WAV_SUB)).astype(np.int16)


def synth_wav_payloads(ids: np.ndarray) -> pa.Array:
    """Deterministic per-id canonical 44-byte-header WAV payloads (PCM16
    mono @ 8 kHz) with ``n_samples = 160 + id % 161`` (20-40 ms).
    Vectorized: one flat value buffer, headers scattered via fancy
    indexing, samples from :func:`_wav_samples`."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    ns = (160 + ids % 161).astype(np.int64)
    dsz = ns * 2
    sizes = 44 + dsz
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    vals = np.zeros(int(offs[-1]), dtype=np.uint8)

    hdr = np.zeros((n, 44), dtype=np.uint8)
    hdr[:, 0:4] = np.frombuffer(b"RIFF", np.uint8)
    riff_sz = 36 + dsz
    for j in range(4):
        hdr[:, 4 + j] = (riff_sz >> (8 * j)) & 0xFF
    hdr[:, 8:16] = np.frombuffer(b"WAVEfmt ", np.uint8)
    hdr[:, 16] = 16  # fmt chunk size
    hdr[:, 20] = 1   # PCM
    hdr[:, 22] = 1   # mono
    for j in range(4):
        hdr[:, 24 + j] = (_WAV_RATE >> (8 * j)) & 0xFF
        hdr[:, 28 + j] = ((_WAV_RATE * 2) >> (8 * j)) & 0xFF  # byte rate
    hdr[:, 32] = 2   # block align
    hdr[:, 34] = 16  # bits per sample
    hdr[:, 36:40] = np.frombuffer(b"data", np.uint8)
    for j in range(4):
        hdr[:, 40 + j] = (dsz >> (8 * j)) & 0xFF
    idx = offs[:-1][:, None] + np.arange(44)[None, :]
    vals[idx.ravel()] = hdr.ravel()

    pcm = _wav_samples(ids, ns).view(np.uint8)
    data_pos = np.repeat(offs[:-1] + 44, dsz) + (
        np.arange(int(dsz.sum())) - np.repeat(np.cumsum(dsz) - dsz, dsz)
    )
    vals[data_pos] = pcm

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
         pa.py_buffer(vals.tobytes())],
    )


def parse_wav(lens, starts, values):
    """Vectorized canonical-WAV parse: validate RIFF/WAVE/fmt/data magics
    and PCM16 mono, read sample_rate + data size from the 44-byte header,
    then aggregate the PCM samples per row (exact int64 sum of squares,
    peak) with two ``reduceat`` calls — no Python per payload.

    Returns dict of numpy arrays: ok, sample_rate, n_samples,
    duration_us (= n·10⁶ // rate, exact), peak, sum_sq.
    """
    n = len(lens)
    head = _head_bytes(lens, starts, values, 44)
    ok = lens >= 44
    for off, magic in ((0, b"RIFF"), (8, b"WAVEfmt "), (36, b"data")):
        m = np.frombuffer(magic, np.uint8)
        ok &= (head[:, off:off + len(m)] == m[None, :]).all(axis=1)
    ok &= (head[:, 20] == 1) & (head[:, 22] == 1) & (head[:, 34] == 16)
    rate = (
        head[:, 24].astype(np.int64)
        | (head[:, 25].astype(np.int64) << 8)
        | (head[:, 26].astype(np.int64) << 16)
        | (head[:, 27].astype(np.int64) << 24)
    )
    dsz = (
        head[:, 40].astype(np.int64)
        | (head[:, 41].astype(np.int64) << 8)
        | (head[:, 42].astype(np.int64) << 16)
        | (head[:, 43].astype(np.int64) << 24)
    )
    ok &= lens >= 44 + dsz
    dsz = np.where(ok, dsz, 0)
    ns = dsz // 2
    total = int(dsz.sum())
    if total:
        pos = np.repeat(starts + 44, dsz) + (
            np.arange(total) - np.repeat(np.cumsum(dsz) - dsz, dsz)
        )
        raw = values[pos]
        x = raw.view(np.int16).astype(np.int64) if raw.flags["C_CONTIGUOUS"] \
            else np.ascontiguousarray(raw).view(np.int16).astype(np.int64)
        soff = np.concatenate([[0], np.cumsum(ns)])[:-1]
        nonempty = ns > 0
        sum_sq = np.zeros(n, dtype=np.int64)
        peak = np.zeros(n, dtype=np.int64)
        if nonempty.any():
            red = np.add.reduceat(x * x, soff[nonempty])
            sum_sq[nonempty] = red
            peak[nonempty] = np.maximum.reduceat(np.abs(x), soff[nonempty])
    else:
        sum_sq = np.zeros(n, dtype=np.int64)
        peak = np.zeros(n, dtype=np.int64)
    rate_safe = np.maximum(rate, 1)
    return {
        "ok": ok,
        "sample_rate": np.where(ok, rate, 0),
        "n_samples": np.where(ok, ns, 0),
        "duration_us": np.where(ok, ns * 1_000_000 // rate_safe, 0),
        "peak": np.where(ok, peak, 0),
        "sum_sq": np.where(ok, sum_sq, 0),
    }


class AudioDecodeStage:
    """Actor-pool stage: WAV payload → exact integer audio features.

    Unlike the image path (pixel codecs need Pillow), canonical WAV is a
    format numpy decodes COMPLETELY — this stage is real end-to-end:
    container validation, header fields, and per-sample PCM aggregation.
    Small default batches (audio payloads dominate row size; rule:
    batch × concurrency must fit the worker heap).
    """

    def __init__(self, id_col: str, payload_col: str):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lens, starts, values = _binary_views(batch[self.payload_col])
        f = parse_wav(lens, starts, values)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "ok": pa.array(f["ok"]),
                "sample_rate": pa.array(f["sample_rate"]),
                "n_samples": pa.array(f["n_samples"]),
                "duration_us": pa.array(f["duration_us"]),
                "peak": pa.array(f["peak"]),
                "sum_sq": pa.array(f["sum_sq"]),
            }
        )


def audio_stats(ds, id_col: str, payload_col: str, concurrency: int = 2,
                batch_size: int = 1024):
    """Decode a WAV binary column to exact integer features (actor pool)."""
    return ds.map_batches(
        AudioDecodeStage(id_col, payload_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sql_wav_stats(ids_sql: str, id_col: str = "id") -> str:
    """DuckDB twin of synth→decode: recompute every PCM sample of the
    deterministic waveform with generate_series and aggregate the same
    exact integers (``ids_sql`` yields an ``{id_col}`` column)."""
    return f"""
WITH ids AS ({ids_sql}),
par AS (SELECT {id_col}, CAST(160 + {id_col} % 161 AS BIGINT) AS n FROM ids),
s AS (
  SELECT {id_col}, n,
         (({id_col} * 31 + t.t * t.t * 7) % {_WAV_MOD}) - {_WAV_SUB} AS x
  FROM par, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT))) AS t(t)
)
SELECT {id_col}, CAST(1 AS BOOLEAN) AS ok,
       CAST({_WAV_RATE} AS BIGINT) AS sample_rate,
       n AS n_samples,
       CAST(n * 1000000 // {_WAV_RATE} AS BIGINT) AS duration_us,
       CAST(MAX(ABS(x)) AS BIGINT) AS peak,
       CAST(SUM(x * x) AS BIGINT) AS sum_sq
FROM s GROUP BY {id_col}, n
"""


# ---------------------------------------------------------------------------
# REAL video decode: YUV4MPEG2 (Y4M), zero libraries
#
# Y4M is the one video container numpy can decode COMPLETELY: an ASCII
# stream header (`YUV4MPEG2 W<w> H<h> F<n>:<d> ... C420\n`) followed by
# uncompressed frames, each a 6-byte `FRAME\n` marker plus w*h*3/2 raw
# 4:2:0 bytes.  Like the WAV path above this makes the video stage real
# end-to-end — container validation, ASCII header-field parsing, frame
# walking, per-pixel aggregation — while the ffmpeg-style compressed
# codecs stay behind the declared NotImplementedError.
# ---------------------------------------------------------------------------

_Y4M_PIX_MOD = 251  # pixel byte value = (id*37 + frame*13 + k*11) % 251


def _y4m_params(ids: np.ndarray):
    """Deterministic per-id stream parameters (shared by synth + SQL twin):
    width 8/12/16/20, height 8/12/16 (both multiples of 4 — valid 4:2:0),
    4-16 frames."""
    ids = np.asarray(ids, dtype=np.int64)
    w = 8 + 4 * (ids % 4)
    h = 8 + 4 * (ids % 3)
    nf = 4 + ids % 13
    return w, h, nf


def synth_y4m_payloads(ids: np.ndarray) -> pa.Array:
    """Deterministic per-id REAL YUV4MPEG2 streams.  Headers are the
    spec's ASCII parameter line (built once per distinct (w, h) pair —
    12 combinations — then scattered); frame pixels come from the pure
    integer recurrence so the SQL oracle reproduces every byte."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    w, h, nf = _y4m_params(ids)
    fsize = w * h * 3 // 2

    hdr_list = [
        np.frombuffer(
            f"YUV4MPEG2 W{int(wi)} H{int(hi)} F25:1 Ip A1:1 C420\n".encode(),
            np.uint8,
        )
        for wi, hi in zip(w, h)
    ]
    hlen = np.array([len(x) for x in hdr_list], dtype=np.int64)
    sizes = hlen + nf * (6 + fsize)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    vals = np.zeros(int(offs[-1]), dtype=np.uint8)

    # headers (ragged, tiny): scatter row by row — n × ~40 bytes
    for i, hb in enumerate(hdr_list):
        vals[offs[i] : offs[i] + hlen[i]] = hb

    # frame markers + pixels: fully vectorized over all (row, frame) pairs
    total_frames = int(nf.sum())
    if total_frames:
        frow = np.repeat(np.arange(n), nf)
        fends = np.cumsum(nf)
        flocal = np.arange(total_frames, dtype=np.int64) - np.repeat(
            fends - nf, nf
        )
        fstart = offs[:-1][frow] + hlen[frow] + flocal * (6 + fsize[frow])
        magic = np.frombuffer(b"FRAME\n", np.uint8)
        for j in range(6):
            vals[fstart + j] = magic[j]
        fbytes = fsize[frow]
        total_px = int(fbytes.sum())
        prow = np.repeat(np.arange(total_frames), fbytes)
        k = np.arange(total_px, dtype=np.int64) - np.repeat(
            np.cumsum(fbytes) - fbytes, fbytes
        )
        px = (
            ids[frow[prow]] * np.int64(37)
            + flocal[prow] * np.int64(13)
            + k * np.int64(11)
        ) % np.int64(_Y4M_PIX_MOD)
        vals[fstart[prow] + 6 + k] = px.astype(np.uint8)

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
         pa.py_buffer(vals.tobytes())],
    )


def _parse_ascii_int(head: np.ndarray, pos: np.ndarray, ok: np.ndarray,
                     max_digits: int = 5):
    """Vectorized ASCII-integer parse starting at per-row ``pos`` —
    the loop is over DIGIT POSITIONS (≤5), not rows."""
    n, k = head.shape
    rows = np.arange(n)
    val = np.zeros(n, dtype=np.int64)
    p = np.clip(pos, 0, k - 1)
    alive = ok & (pos >= 0) & (pos < k)
    any_digit = np.zeros(n, dtype=bool)
    for _ in range(max_digits):
        b = head[rows, p]
        isd = alive & (b >= 48) & (b <= 57)
        val = np.where(isd, val * 10 + (b - 48), val)
        any_digit |= isd
        p = np.where(isd & (p < k - 1), p + 1, p)
        alive = isd
    return val, any_digit, p


def _find_token(head: np.ndarray, token: bytes):
    """Per-row first index AFTER a ``token`` match (e.g. b" W") inside the
    header matrix; -1 where absent."""
    t = np.frombuffer(token, np.uint8)
    n, k = head.shape
    m = np.ones((n, k - len(t) + 1), dtype=bool)
    for j, bj in enumerate(t):
        m &= head[:, j : k - len(t) + 1 + j] == bj
    found = m.any(axis=1)
    return np.where(found, m.argmax(axis=1) + len(t), -1), found


_Y4M_HEAD = 64  # a spec-minimal parameter line fits well inside 64 bytes


def parse_y4m(lens, starts, values, every_n: int = 2):
    """REAL vectorized Y4M parse + every-Nth-frame pixel aggregation.

    Validates the `YUV4MPEG2 ` magic, parses the ASCII W/H fields from
    the actual header bytes, requires C420 chroma (anything else →
    ok=False: honesty over guessing), derives the frame size from the
    parsed geometry, validates that the payload is an exact whole number
    of `FRAME\\n`-delimited frames AND every frame marker byte, then
    aggregates each sampled frame's raw pixel bytes (exact int64 sum +
    peak via ``reduceat``).  Returns per-SAMPLED-FRAME arrays
    (row, frame_idx, width, height, frame_sum, frame_peak) plus the
    per-row ``ok`` mask.
    """
    n = len(lens)
    head = _head_bytes(lens, starts, values, _Y4M_HEAD)
    magic = np.frombuffer(b"YUV4MPEG2 ", np.uint8)
    ok = lens >= len(magic)
    ok &= (head[:, : len(magic)] == magic[None, :]).all(axis=1)

    nl_hit = head == 10
    has_nl = nl_hit.any(axis=1)
    ok &= has_nl
    hdr_len = np.where(has_nl, nl_hit.argmax(axis=1) + 1, 0).astype(np.int64)

    wpos, wfound = _find_token(head, b" W")
    hpos, hfound = _find_token(head, b" H")
    cpos, cfound = _find_token(head, b" C")
    ok &= wfound & hfound & (wpos < hdr_len) & (hpos < hdr_len)
    w, wdig, _ = _parse_ascii_int(head, wpos, ok)
    h, hdig, _ = _parse_ascii_int(head, hpos, ok)
    ok &= wdig & hdig & (w > 0) & (h > 0) & (w % 4 == 0) & (h % 2 == 0)
    # chroma: C420 (the default when the C tag is absent); C420mpeg2 /
    # C420jpeg share the same frame size and parse identically
    c420 = np.frombuffer(b"420", np.uint8)
    if head.shape[1] >= 3:
        rows = np.arange(n)
        cp = np.clip(cpos, 0, _Y4M_HEAD - 3)
        is420 = (
            (head[rows, cp] == c420[0])
            & (head[rows, np.minimum(cp + 1, _Y4M_HEAD - 1)] == c420[1])
            & (head[rows, np.minimum(cp + 2, _Y4M_HEAD - 1)] == c420[2])
        )
        ok &= np.where(cfound & (cpos < hdr_len), is420, True)

    fsize = np.where(ok, w * h * 3 // 2, 1)
    stride = 6 + fsize
    body = np.maximum(lens - hdr_len, 0)
    nf = np.where(ok, body // stride, 0)
    ok &= body % stride == 0
    nf = np.where(ok, nf, 0)

    # validate EVERY frame marker (all frames, not just sampled ones)
    total_frames = int(nf.sum())
    if total_frames:
        frow = np.repeat(np.arange(n), nf)
        fends = np.cumsum(nf)
        flocal = np.arange(total_frames, dtype=np.int64) - np.repeat(
            fends - nf, nf
        )
        fstart = starts[frow] + hdr_len[frow] + flocal * stride[frow]
        fmagic = np.frombuffer(b"FRAME\n", np.uint8)
        good = np.ones(total_frames, dtype=bool)
        for j in range(6):
            good &= values[fstart + j] == fmagic[j]
        bad_rows = np.unique(frow[~good])
        if len(bad_rows):
            ok[bad_rows] = False
            nf = np.where(ok, nf, 0)

    # sampled-frame aggregation
    ns = np.where(nf > 0, (nf + every_n - 1) // every_n, 0)
    total_s = int(ns.sum())
    if total_s == 0:
        e = np.empty(0, np.int64)
        return {"ok": ok, "row": e, "frame_idx": e, "width": e,
                "height": e, "frame_sum": e, "frame_peak": e}
    srow = np.repeat(np.arange(n), ns)
    sends = np.cumsum(ns)
    slocal = np.arange(total_s, dtype=np.int64) - np.repeat(sends - ns, ns)
    fi = slocal * every_n
    pstart = starts[srow] + hdr_len[srow] + fi * stride[srow] + 6
    fb = fsize[srow]
    total_px = int(fb.sum())
    prow = np.repeat(np.arange(total_s), fb)
    k = np.arange(total_px, dtype=np.int64) - np.repeat(
        np.cumsum(fb) - fb, fb
    )
    px = values[pstart[prow] + k].astype(np.int64)
    soff = np.concatenate([[0], np.cumsum(fb)])[:-1]
    frame_sum = np.add.reduceat(px, soff)
    frame_peak = np.maximum.reduceat(px, soff)
    return {
        "ok": ok,
        "row": srow,
        "frame_idx": fi,
        "width": w[srow],
        "height": h[srow],
        "frame_sum": frame_sum,
        "frame_peak": frame_peak,
    }


class Y4MFrameSampleStage:
    """Actor-pool stage: REAL Y4M video payload → one row per sampled
    frame with exact integer pixel aggregates.  Small batches: video
    payloads are the widest rows in any table and the output fans out
    per frame (same sizing rule as the fake-path FrameSampleStage)."""

    def __init__(self, id_col: str, payload_col: str, every_n: int = 2):
        self.id_col = id_col
        self.payload_col = payload_col
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        lens, starts, values = _binary_views(batch[self.payload_col])
        f = parse_y4m(lens, starts, values, every_n=self.every_n)
        r = f["row"]
        return pa.table(
            {
                self.id_col: pa.array(ids[r]),
                "frame_idx": pa.array(f["frame_idx"]),
                "width": pa.array(f["width"]),
                "height": pa.array(f["height"]),
                "frame_sum": pa.array(f["frame_sum"]),
                "frame_peak": pa.array(f["frame_peak"]),
            }
        )


def video_frame_stats(ds, id_col: str, payload_col: str, every_n: int = 2,
                      concurrency: int = 2, batch_size: int = 64):
    """Sample every Nth frame of a Y4M binary column and aggregate real
    pixel bytes (actor pool; zero-library decode)."""
    return ds.map_batches(
        Y4MFrameSampleStage,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col, "every_n": every_n,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sql_y4m_frame_stats(ids_sql: str, id_col: str = "id",
                        every_n: int = 2) -> str:
    """DuckDB twin of synth→decode: recompute every sampled frame's pixel
    bytes from the deterministic recurrence and aggregate the same exact
    integers."""
    return f"""
WITH ids AS ({ids_sql}),
par AS (
  SELECT {id_col},
         CAST(8 + 4 * ({id_col} % 4) AS BIGINT) AS width,
         CAST(8 + 4 * ({id_col} % 3) AS BIGINT) AS height,
         CAST(4 + {id_col} % 13 AS BIGINT) AS nf
  FROM ids
),
fr AS (
  SELECT {id_col}, width, height, f.f AS frame_idx,
         width * height * 3 // 2 AS fsize
  FROM par, UNNEST(generate_series(0, CAST(nf - 1 AS BIGINT))) AS f(f)
  WHERE f.f % {every_n} = 0
),
px AS (
  SELECT {id_col}, frame_idx, width, height,
         ({id_col} * 37 + frame_idx * 13 + k.k * 11) % {_Y4M_PIX_MOD} AS v
  FROM fr, UNNEST(generate_series(0, CAST(fsize - 1 AS BIGINT))) AS k(k)
)
SELECT {id_col}, frame_idx, width, height,
       CAST(SUM(v) AS BIGINT) AS frame_sum,
       CAST(MAX(v) AS BIGINT) AS frame_peak
FROM px GROUP BY {id_col}, frame_idx, width, height
"""
