"""Zero-copy-ish helpers between Arrow string columns and numpy byte views."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def string_column_bytes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(buf, offsets): concatenated utf-8 bytes of all rows + int64 row
    offsets (n+1). No per-row Python bytes objects."""
    arr = col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # 0-chunk edge
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.string())
    arr = arr.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1 + arr.offset)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    if offsets[0] != 0:
        data = data[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
    else:
        data = data[: offsets[-1]]
    return data, offsets.astype(np.int64)


def ranges_to_struct_list(
    list_offsets: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> pa.ListArray:
    """Build the output ``sa_remove_ranges: list<struct<start:uint64,
    end:uint64>>`` column (FIXTURES.md §3) from flat arrays."""
    struct = pa.StructArray.from_arrays(
        [pa.array(starts.astype(np.uint64), pa.uint64()), pa.array(ends.astype(np.uint64), pa.uint64())],
        names=["start", "end"],
    )
    return pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
