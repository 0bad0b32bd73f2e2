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
