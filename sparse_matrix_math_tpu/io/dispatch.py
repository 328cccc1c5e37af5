"""Loader dispatch by file extension.

Re-design of the reference ``loadMatrix`` overloads
(include/sparse_matrix_math.h:2648-2669): ``.mtx`` → Matrix Market,
``.smmdt`` → dense-text, anything else →
FAILED_TO_OPEN_FILE_UNKNOWN_FORMAT.  The CSR convenience form builds the
triplet then converts (h:2661-2669).
"""

from __future__ import annotations

import os
from typing import Union

import numpy as np

from ..formats.csr import CSRMatrix, csr_from_coo, csr_from_triplet
from ..formats.triplet import TripletMatrix
from .matrix_market import (
    MatrixLoadStatus,
    MatrixMarketError,
    load_matrix_market,
    load_matrix_market_coo,
)
from .smmdt import load_smmdt

__all__ = ["load_matrix", "load_matrix_csr"]


def load_matrix(
    path: Union[str, os.PathLike], *, dtype=np.float64, allow_general: bool = False
) -> TripletMatrix:
    """Load a matrix file into a :class:`TripletMatrix`, dispatching on
    extension (h:2650-2657)."""
    ext = os.path.splitext(str(path))[1].lower()
    if ext == ".mtx":
        return load_matrix_market(path, dtype=dtype, allow_general=allow_general)
    if ext == ".smmdt":
        return load_smmdt(path, dtype=dtype)
    raise MatrixMarketError(
        MatrixLoadStatus.FAILED_TO_OPEN_FILE_UNKNOWN_FORMAT,
        f"unknown matrix file extension: {ext!r} (expected .mtx or .smmdt)",
    )


def load_matrix_csr(
    path: Union[str, os.PathLike], *, dtype=np.float64, allow_general: bool = False
) -> CSRMatrix:
    """Load straight to CSR (reference CSR overload, h:2661-2669).

    ``.mtx`` files take the bulk path (native C parser when available →
    sorted/deduplicated COO → CSR), skipping the per-entry container.
    """
    ext = os.path.splitext(str(path))[1].lower()
    if ext == ".mtx":
        return csr_from_coo(
            load_matrix_market_coo(path, dtype=dtype, allow_general=allow_general)
        )
    return csr_from_triplet(
        load_matrix(path, dtype=dtype, allow_general=allow_general)
    )
