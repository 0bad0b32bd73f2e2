"""Vectorized Hilbert-curve d-index and the flatbush leaf orderings.

Reimplements the spatial sort semantics of geo-index's HilbertSort
(reference: src/rtree/sort/hilbert.rs:14-177) in numpy. Two paths:

- ``hilbert_d(x, y)``: the u16×u16 → u32 Hilbert d-index (bit-twiddling
  identical to reference src/rtree/sort/hilbert.rs:121-177, itself a port of
  the public-domain hilbert_curves C++ code) but vectorized over arrays.
- ``hilbert_sort_permutation``: fast path — a stable argsort over the Hilbert
  values.  Produces a valid flatbush tree (leaves ordered by Hilbert value)
  but NOT byte-identical to the reference when there are ties or within-node
  orderings to preserve (the reference's quicksort is *partial*: it stops
  sorting inside node-size-aligned chunks, src/rtree/sort/hilbert.rs:70).
- ``partial_quicksort``: exact port of the reference's node-size-aware
  partial quicksort (src/rtree/sort/hilbert.rs:60-117) used for byte-parity
  (``method="hilbert_parity"``) builds and for STR parity.  Python control
  flow over numpy state; use only for modest n (parity fixtures, tests).
"""

from __future__ import annotations

import numpy as np

_HILBERT_MAX = float((1 << 16) - 1)
U32 = np.uint32


def hilbert_d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert d-index for 16-bit x/y (arrays of uint32).

    Parity: reference src/rtree/sort/hilbert.rs:121-177.
    """
    x = x.astype(U32, copy=False)
    y = y.astype(U32, copy=False)
    M = U32(0xFFFF)

    a1 = x ^ y
    b1 = M ^ a1
    c1 = M ^ (x | y)
    d1 = x & (y ^ M)

    a2 = a1 | (b1 >> U32(1))
    b2 = (a1 >> U32(1)) ^ a1
    c2 = ((c1 >> U32(1)) ^ (b1 & (d1 >> U32(1)))) ^ c1
    d2 = ((a1 & (c1 >> U32(1))) ^ (d1 >> U32(1))) ^ d1

    a1, b1, c1, d1 = a2, b2, c2, d2
    a2 = (a1 & (a1 >> U32(2))) ^ (b1 & (b1 >> U32(2)))
    b2 = (a1 & (b1 >> U32(2))) ^ (b1 & ((a1 ^ b1) >> U32(2)))
    c2 = c2 ^ ((a1 & (c1 >> U32(2))) ^ (b1 & (d1 >> U32(2))))
    d2 = d2 ^ ((b1 & (c1 >> U32(2))) ^ ((a1 ^ b1) & (d1 >> U32(2))))

    a1, b1, c1, d1 = a2, b2, c2, d2
    a2 = (a1 & (a1 >> U32(4))) ^ (b1 & (b1 >> U32(4)))
    b2 = (a1 & (b1 >> U32(4))) ^ (b1 & ((a1 ^ b1) >> U32(4)))
    c2 = c2 ^ ((a1 & (c1 >> U32(4))) ^ (b1 & (d1 >> U32(4))))
    d2 = d2 ^ ((b1 & (c1 >> U32(4))) ^ ((a1 ^ b1) & (d1 >> U32(4))))

    a1, b1, c1, d1 = a2, b2, c2, d2
    c2 = c2 ^ ((a1 & (c1 >> U32(8))) ^ (b1 & (d1 >> U32(8))))
    d2 = d2 ^ ((b1 & (c1 >> U32(8))) ^ ((a1 ^ b1) & (d1 >> U32(8))))

    a1 = c2 ^ (c2 >> U32(1))
    b1 = d2 ^ (d2 >> U32(1))

    i0 = x ^ y
    i1 = b1 | (M ^ (i0 | a1))

    i0 = (i0 | (i0 << U32(8))) & U32(0x00FF00FF)
    i0 = (i0 | (i0 << U32(4))) & U32(0x0F0F0F0F)
    i0 = (i0 | (i0 << U32(2))) & U32(0x33333333)
    i0 = (i0 | (i0 << U32(1))) & U32(0x55555555)

    i1 = (i1 | (i1 << U32(8))) & U32(0x00FF00FF)
    i1 = (i1 | (i1 << U32(4))) & U32(0x0F0F0F0F)
    i1 = (i1 | (i1 << U32(2))) & U32(0x33333333)
    i1 = (i1 | (i1 << U32(1))) & U32(0x55555555)

    return (i1 << U32(1)) | i0


def _saturating_u32(v: np.ndarray) -> np.ndarray:
    """Rust `f64 as u32` semantics: NaN→0, clamp to [0, u32::MAX], trunc."""
    v = np.where(np.isnan(v), 0.0, v)
    v = np.clip(v, 0.0, 4294967295.0)
    return v.astype(U32)


def hilbert_values_for_boxes(
    min_x: np.ndarray,
    min_y: np.ndarray,
    max_x: np.ndarray,
    max_y: np.ndarray,
    bounds: tuple[float, float, float, float],
) -> np.ndarray:
    """Map box centers to Hilbert d-indexes over the global bbox.

    Parity: reference src/rtree/sort/hilbert.rs:16-44 (incl. the floor-and-
    cast-to-u32 on the scaled center coordinates).
    """
    gminx, gminy, gmaxx, gmaxy = bounds
    width = gmaxx - gminx
    height = gmaxy - gminy
    with np.errstate(divide="ignore", invalid="ignore"):
        hx = np.floor(_HILBERT_MAX * ((min_x + max_x) / 2.0 - gminx) / width)
        hy = np.floor(_HILBERT_MAX * ((min_y + max_y) / 2.0 - gminy) / height)
    return hilbert_d(_saturating_u32(hx), _saturating_u32(hy))


def hilbert_sort_permutation(hilbert_values: np.ndarray) -> np.ndarray:
    """Fast path: argsort by Hilbert value, ties broken by insertion index.

    Implemented as one uint64 composite-key quicksort
    (``hilbert << 32 | index``) — bit-identical output to a stable argsort
    of the bare values but ~3× faster (numpy's stable path is much slower
    than introsort on unsigned ints)."""
    key = (hilbert_values.astype(np.uint64) << np.uint64(32)) | np.arange(
        len(hilbert_values), dtype=np.uint64
    )
    return np.argsort(key, kind="quicksort")


def partial_quicksort(
    values: np.ndarray,
    boxes: np.ndarray,
    indices: np.ndarray,
    node_size: int,
    left: int = 0,
    right: int | None = None,
) -> None:
    """Exact port of the reference's node-size-aware partial quicksort.

    Sorts ``values`` (and ``boxes`` — interleaved 4-per-item — and
    ``indices`` alongside) *between* node-size-aligned chunks only, with the
    same median-of-three pivot rule and Hoare partition, so that the final
    element order is identical to the reference's
    (src/rtree/sort/hilbert.rs:60-117; STR variant src/rtree/sort/str.rs:
    115-172 is the same routine over N-typed values).

    In-place.  Uses an explicit stack (the recursion on disjoint ranges is
    order-independent) to avoid Python recursion limits.
    """
    n = len(values)
    if right is None:
        right = n - 1
    if n < 2 or right <= left:
        return
    stack = [(left, right)]
    while stack:
        left, right = stack.pop()
        if left // node_size >= right // node_size:
            continue

        start = values[left]
        mid = values[(left + right) >> 1]
        end = values[right]

        x = start if start > mid else mid
        if end > x:
            pivot = x
        elif x == start:
            pivot = mid if mid > end else end
        elif x == mid:
            pivot = start if start > end else end
        else:
            pivot = end

        i = left - 1
        j = right + 1
        while True:
            while True:
                i += 1
                if values[i] >= pivot:
                    break
            while True:
                j -= 1
                if values[j] <= pivot:
                    break
            if i >= j:
                break
            # swap values, boxes (4 coords), indices
            values[i], values[j] = values[j], values[i]
            bi, bj = 4 * i, 4 * j
            tmp = boxes[bi : bi + 4].copy()
            boxes[bi : bi + 4] = boxes[bj : bj + 4]
            boxes[bj : bj + 4] = tmp
            indices[i], indices[j] = indices[j], indices[i]

        stack.append((left, j))
        stack.append((j + 1, right))
