"""Zero-copy-ish helpers between Arrow list columns and numpy.

Geometry rings live in Arrow as ``list<fixed_size_list<double,3>>``; these
helpers expose them as one flat (N,3) float64 array + an offsets vector, so
batch kernels slice per-row views instead of materializing Python lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def ring_column(col) -> tuple[np.ndarray, np.ndarray]:
    """``list<fixed_size_list<double,3>>`` column → (points (N,3), offsets).

    ``offsets`` has len rows+1; row i's ring is ``points[offsets[i]:offsets[i+1]]``.
    Handles sliced arrays and nulls (null rows get empty ranges).
    """
    arr = _as_array(col)
    if isinstance(arr, pa.ListArray):
        raw_off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        base = raw_off[0]
        offsets = raw_off - base
        values = arr.values  # FixedSizeListArray or ListArray of doubles
    else:
        raise TypeError(f"expected ListArray, got {type(arr)}")
    if isinstance(values, pa.FixedSizeListArray):
        flat = values.flatten().to_numpy(zero_copy_only=False)
        pts = flat.reshape(-1, 3)[base : base + offsets[-1]]
    else:
        # list<list<double>> (untyped inner): rows are variable-length [x,y,z]
        inner = values
        inner_flat = inner.flatten().to_numpy(zero_copy_only=False)
        inner_off = inner.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # require uniform xyz triplets
        pts_all = np.empty((len(inner), 3), dtype=np.float64)
        lens = np.diff(inner_off)
        if not np.all(lens == 3):
            raise ValueError("inner point lists must be [x,y,z]")
        pts_all[:, 0] = inner_flat[inner_off[:-1]]
        pts_all[:, 1] = inner_flat[inner_off[:-1] + 1]
        pts_all[:, 2] = inner_flat[inner_off[:-1] + 2]
        pts = pts_all[base : base + offsets[-1]]
    return np.ascontiguousarray(pts, dtype=np.float64), offsets


def rings_column(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``list<list<fixed_size_list<double,3>>>`` (interiors) column →
    (points (N,3), ring_offsets, row_offsets): row i has rings
    ``ring_offsets[row_offsets[i]:row_offsets[i+1]+1]`` boundaries."""
    arr = _as_array(col)
    raw_row_off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_base = raw_row_off[0]
    row_offsets = raw_row_off - row_base
    inner = arr.values  # list<point>
    # slice inner to the referenced window
    inner = inner.slice(row_base, row_offsets[-1])
    pts, ring_offsets = ring_column(inner)
    return pts, ring_offsets, row_offsets


def binary_views(col) -> list[memoryview]:
    """``binary`` column → per-row zero-copy memoryviews into the Arrow
    data buffer (no per-blob ``bytes`` copies — ``to_pylist()`` on a wide
    binary column was the measured memory-bandwidth hot spot in the decode
    stage). Null rows yield empty views."""
    arr = _as_array(col)
    out: list[memoryview] = []
    chunks = [arr] if isinstance(arr, pa.Array) else arr.chunks
    for chunk in chunks:
        bufs = chunk.buffers()
        dtype = np.int64 if pa.types.is_large_binary(chunk.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=dtype)[
            chunk.offset : chunk.offset + len(chunk) + 1
        ]
        mv = memoryview(bufs[2])
        out.extend(mv[offsets[i] : offsets[i + 1]] for i in range(len(chunk)))
    return out


def rings_to_arrow(rings: list[np.ndarray]) -> pa.Array:
    """list of (n_i, 3) arrays → ``list<fixed_size_list<double,3>>``."""
    if rings:
        flat = np.concatenate([np.asarray(r, dtype=np.float64).reshape(-1, 3) for r in rings])
    else:
        flat = np.zeros((0, 3))
    lens = np.array([len(np.asarray(r).reshape(-1, 3)) for r in rings], dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    inner = pa.FixedSizeListArray.from_arrays(pa.array(flat.ravel(), pa.float64()), 3)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), inner)
