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


class DecodeStage:
    """Actor-pool stage: binary payload → typed metadata/features.

    ``__init__`` is where the decoder loads once per actor; ``__call__``
    handles one (small) batch of payloads.
    """

    def __init__(self, id_col: str, payload_col: str, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        if decode not in ("fake", "real"):
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
            # length — vectorized gather with modular indexing
            lens, starts, values = _binary_views(batch[self.payload_col])
            out_len = max(16, (self.target_w * self.target_h) // 1024)
            n = len(lens)
            safe_lens = np.maximum(lens, 1)
            idx = starts[:, None] + (np.arange(out_len)[None, :] % safe_lens[:, None])
            if len(values) == 0:
                flat = np.zeros(n * out_len, np.uint8)
            else:
                flat = np.where(
                    (lens > 0)[:, None],
                    values[np.clip(idx, 0, len(values) - 1)],
                    0,
                ).astype(np.uint8).ravel()
            offsets = pa.array(
                (np.arange(n + 1) * out_len).astype(np.int32), pa.int32()
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
