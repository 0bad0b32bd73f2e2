"""Multimodal (binary-payload) stage plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
actual decode libraries are not available in this container, so the decode
kernel is STUBBED (`decode="fake"` produces deterministic pseudo-metadata;
`decode="real"` raises NotImplementedError) — but the Ray-side plumbing is
real and tested: actor-pool map_batches, small batch sizes for large
payloads, binary-in / typed-struct-out schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DecodeStage:
    """Actor-pool stage: binary payload → typed metadata/features.

    ``__init__`` is where a real decoder would load its model/codecs once
    per actor; ``__call__`` handles one (small) batch of payloads.
    """

    def __init__(self, id_col: str, payload_col: str, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "real":
            raise NotImplementedError(
                "image/audio decode libraries are not available in this "
                "environment; plug a real decoder in here"
            )
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        payloads = batch[self.payload_col].to_pylist()
        n_bytes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        # deterministic fake decode: pretend the first bytes are a header
        width = np.array(
            [(p[0] if p else 0) * 16 + 64 for p in payloads], dtype=np.int64
        )
        height = np.array(
            [(p[1] if p and len(p) > 1 else 0) * 16 + 64 for p in payloads],
            dtype=np.int64,
        )
        checksum = np.array(
            [int(np.frombuffer((p or b"\0")[:8].ljust(8, b"\0"), dtype=np.uint64)[0]) & 0x7FFFFFFFFFFFFFFF for p in payloads],
            dtype=np.int64,
        )
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "n_bytes": pa.array(n_bytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "checksum": pa.array(checksum),
            }
        )


def decode_metadata(ds, id_col: str, payload_col: str, concurrency: int = 2, batch_size: int = 64):
    """Run the (stubbed) decode over a dataset of binary payloads.

    Small ``batch_size`` on purpose: batch_bytes = batch_size × payload —
    size so (batch × concurrency) fits the worker heap.
    """
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"id_col": id_col, "payload_col": payload_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStage:
    """Actor-pool stage: (payload, width, height) → resized payload stub.

    A real implementation would decode → resample → re-encode per batch
    (PIL/libvips loaded once in ``__init__``); the stub produces a
    deterministic fake "resized" payload (truncated/padded to a size
    proportional to the target area) so the schema, batch sizing, and
    actor plumbing are real and testable.
    """

    def __init__(self, id_col: str, payload_col: str,
                 target_w: int = 224, target_h: int = 224, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.target_w = target_w
        self.target_h = target_h
        if decode == "real":
            raise NotImplementedError("no image libraries in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        # fake: output size scales with target area; content is a
        # deterministic slice-or-tile of the input bytes
        out_len = max(16, (self.target_w * self.target_h) // 1024)
        resized = [
            ((p or b"\0") * (out_len // max(1, len(p or b"\0")) + 1))[:out_len]
            for p in payloads
        ]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "payload": pa.array(resized, pa.binary()),
                "width": pa.array(
                    np.full(len(resized), self.target_w, dtype=np.int64)
                ),
                "height": pa.array(
                    np.full(len(resized), self.target_h, dtype=np.int64)
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video payload → every-Nth-frame sample stub.

    Emits one row per sampled frame (``flat_map`` semantics inside
    ``map_batches``): (id, frame_idx, frame_payload).  A real codec would
    be opened once per actor in ``__init__``.
    """

    def __init__(self, id_col: str, payload_col: str, every_n: int = 30,
                 frame_bytes: int = 64, decode: str = "fake"):
        self.id_col = id_col
        self.payload_col = payload_col
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        if decode == "real":
            raise NotImplementedError("no video libraries in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        payloads = batch[self.payload_col].to_pylist()
        out_id, out_fi, out_fp = [], [], []
        for rid, p in zip(ids, payloads):
            p = p or b"\0"
            n_frames = max(1, len(p) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_n):
                out_id.append(rid)
                out_fi.append(fi)
                out_fp.append(p[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table(
            {
                self.id_col: pa.array(np.asarray(out_id, dtype=np.int64)),
                "frame_idx": pa.array(np.asarray(out_fi, dtype=np.int64)),
                "frame": pa.array(out_fp, pa.binary()),
            }
        )


def resize_images(ds, id_col: str, payload_col: str, target_w: int = 224,
                  target_h: int = 224, concurrency: int = 2, batch_size: int = 64):
    """(Stubbed) image resize over a binary-payload dataset."""
    return ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col,
            "target_w": target_w, "target_h": target_h,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, id_col: str, payload_col: str, every_n: int = 30,
                  concurrency: int = 2, batch_size: int = 16):
    """(Stubbed) video frame sampling — one output row per sampled frame.

    batch_size is small on purpose: video payloads are the largest rows in
    the table and the output fans out per frame.
    """
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={
            "id_col": id_col, "payload_col": payload_col, "every_n": every_n,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
