"""Matrix Market loader with the reference's accepted grammar.

Re-design of ``loadMatrixMarketMatrix``
(include/sparse_matrix_math.h:2524-2609).  The reference accepts ONLY
``%%MatrixMarket matrix coordinate real|integer symmetric`` (banner
validation h:2544-2573 — general/complex/pattern/array are rejected),
skips ``%`` comment lines (h:2575-2578), reads a ``rows cols nnz`` size
line, then 1-based ``row col value`` triplets, and mirrors off-diagonal
entries to expand symmetric storage to full (h:2596-2601).

This module reproduces that grammar bit-for-bit as the default, and —
as a superset the reference lacks — optionally accepts ``general``
matrices via ``allow_general=True``.

Load failures return granular :class:`MatrixLoadStatus` codes through
:class:`MatrixMarketError` (matching the reference enum, h:2507-2522).
"""

from __future__ import annotations

import enum
import os
from typing import TextIO, Tuple, Union

import numpy as np

from ..formats.triplet import COOArrays, TripletMatrix, coo_from_arrays

__all__ = [
    "MatrixLoadStatus",
    "MatrixMarketError",
    "load_matrix_market",
    "load_matrix_market_coo",
]


class MatrixLoadStatus(enum.IntEnum):
    """Parity with the reference MatrixLoadStatus (h:2507-2522)."""

    SUCCESS = 0
    FAILED_TO_OPEN_FILE = 1
    FAILED_TO_OPEN_FILE_UNKNOWN_FORMAT = 2
    PARSE_ERROR = 3
    UNSUPPORTED_FORMAT = 4


class MatrixMarketError(IOError):
    def __init__(self, status: MatrixLoadStatus, message: str):
        super().__init__(message)
        self.status = status


def load_matrix_market(
    path_or_file: Union[str, os.PathLike, TextIO],
    *,
    allow_general: bool = False,
    dtype=np.float64,
) -> TripletMatrix:
    """Parse a Matrix Market file into a :class:`TripletMatrix`.

    Symmetric off-diagonal entries are mirrored (h:2596-2601), so the
    result holds FULL storage, exactly like the reference.
    """
    if hasattr(path_or_file, "read"):
        return _parse(path_or_file, allow_general, dtype)
    try:
        f = open(path_or_file, "r")
    except OSError as e:
        raise MatrixMarketError(
            MatrixLoadStatus.FAILED_TO_OPEN_FILE, f"cannot open {path_or_file}: {e}"
        ) from e
    with f:
        return _parse(f, allow_general, dtype)


def load_matrix_market_coo(
    path: Union[str, os.PathLike],
    *,
    allow_general: bool = False,
    dtype=np.float64,
) -> COOArrays:
    """Bulk-load a Matrix Market file straight to sorted/deduplicated
    :class:`COOArrays`, skipping the per-entry assembly container.

    Uses the native C parser (native/smm_native.cpp) when available —
    the framework's data-loader fast path — with the Python parser as
    fallback.  Same grammar and mirroring semantics as
    :func:`load_matrix_market`.
    """
    from .. import native

    path = str(path)
    try:
        parsed = native.mtx_read_native(path, allow_general)
    except native._MtxNativeError as e:
        raise MatrixMarketError(MatrixLoadStatus(e.status), str(e)) from e
    if parsed is not None:
        n_rows, n_cols, r, c, v = parsed
        return coo_from_arrays(r, c, v, (n_rows, n_cols), dtype=dtype)
    return load_matrix_market(
        path, allow_general=allow_general, dtype=dtype
    ).to_coo(dtype=dtype)


def _parse(f: TextIO, allow_general: bool, dtype) -> TripletMatrix:
    banner = f.readline()
    fields = banner.strip().split()
    # banner grammar checks (h:2544-2573)
    if len(fields) != 5 or fields[0] != "%%MatrixMarket":
        raise MatrixMarketError(
            MatrixLoadStatus.PARSE_ERROR, f"bad MatrixMarket banner: {banner!r}"
        )
    _, obj, fmt, field, symmetry = (s.lower() for s in fields)
    if obj != "matrix" or fmt != "coordinate":
        raise MatrixMarketError(
            MatrixLoadStatus.UNSUPPORTED_FORMAT,
            f"only 'matrix coordinate' is supported, got {obj} {fmt}",
        )
    if field not in ("real", "integer"):
        raise MatrixMarketError(
            MatrixLoadStatus.UNSUPPORTED_FORMAT,
            f"only real/integer fields are supported, got {field}",
        )
    symmetric = symmetry == "symmetric"
    if not symmetric and not (allow_general and symmetry == "general"):
        raise MatrixMarketError(
            MatrixLoadStatus.UNSUPPORTED_FORMAT,
            f"symmetry {symmetry!r} not supported "
            "(reference accepts only 'symmetric', h:2566-2573)",
        )

    # skip comments (h:2575-2578)
    line = f.readline()
    while line and line.lstrip().startswith("%"):
        line = f.readline()
    parts = line.split()
    if len(parts) != 3:
        raise MatrixMarketError(
            MatrixLoadStatus.PARSE_ERROR, f"bad size line: {line!r}"
        )
    try:
        n_rows, n_cols, nnz = (int(p) for p in parts)
    except ValueError as e:
        raise MatrixMarketError(
            MatrixLoadStatus.PARSE_ERROR, f"bad size line: {line!r}"
        ) from e

    m = TripletMatrix(n_rows, n_cols, dtype=dtype)
    read = 0
    for line in f:
        s = line.strip()
        if not s or s.startswith("%"):
            continue
        parts = s.split()
        if len(parts) != 3:
            raise MatrixMarketError(
                MatrixLoadStatus.PARSE_ERROR, f"bad entry line: {line!r}"
            )
        try:
            r = int(parts[0]) - 1  # 1-based indices (h:2595-2596)
            c = int(parts[1]) - 1
            v = float(parts[2])
        except ValueError as e:
            raise MatrixMarketError(
                MatrixLoadStatus.PARSE_ERROR, f"bad entry line: {line!r}"
            ) from e
        if not (0 <= r < n_rows and 0 <= c < n_cols):
            raise MatrixMarketError(
                MatrixLoadStatus.PARSE_ERROR,
                f"entry ({r + 1}, {c + 1}) out of bounds for {n_rows}x{n_cols}",
            )
        m.add_entry(r, c, v)
        if symmetric and r != c:
            m.add_entry(c, r, v)  # mirror expansion (h:2596-2601)
        read += 1
    if read != nnz:
        raise MatrixMarketError(
            MatrixLoadStatus.PARSE_ERROR,
            f"expected {nnz} entries, found {read}",
        )
    return m
