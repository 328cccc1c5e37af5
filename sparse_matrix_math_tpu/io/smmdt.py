"""SMMDT dense-text format: save + load.

Re-design of the reference's custom dense-text persistence:
``saveDenseText`` (include/sparse_matrix_math.h:1930-1993) writes a
``rows cols`` header line then the full dense matrix as brace-delimited
rows — ``{{v,v,...},\n{...},...}`` — with fixed 6-decimal precision and
explicit zeros for empty slots; ``loadSMMDTMatrix`` (h:2611-2646) reads
it back, skipping zeros on ingest (h:2634-2636) so the reloaded triplet
holds only the nonzeros.

The writer here produces byte-compatible-in-spirit output (same grammar:
header, outer brace, one ``{...}`` per row, comma-separated, %.6f) and
the loader is grammar-tolerant the same way the reference's
stream-``ignore`` parsing is.
"""

from __future__ import annotations

import os
import re
from typing import TextIO, Union

import numpy as np

from ..formats.triplet import TripletMatrix
from .matrix_market import MatrixLoadStatus, MatrixMarketError

__all__ = ["save_dense_text", "load_smmdt"]


def save_dense_text(path_or_file: Union[str, os.PathLike, TextIO], matrix) -> None:
    """Write a matrix (any format with ``to_dense``/dense array) as SMMDT.

    Matches the reference writer's grammar (h:1955-1992): header
    ``rows cols``, outer ``{``, per-row ``{v,...},`` lines with fixed
    6-decimal values, closing ``}``.
    """
    dense = matrix.to_dense() if hasattr(matrix, "to_dense") else matrix
    dense = np.asarray(dense)
    if dense.ndim != 2:
        raise ValueError("expected a 2-D matrix")
    n_rows, n_cols = dense.shape

    def _write(f: TextIO) -> None:
        f.write(f"{n_rows} {n_cols}\n")
        f.write("{\n")
        for i in range(n_rows):
            row = ",".join(_fmt(v) for v in dense[i])
            sep = "," if i < n_rows - 1 else ""
            f.write("{" + row + "}" + sep + "\n")
        f.write("}")

    if hasattr(path_or_file, "write"):
        _write(path_or_file)
    else:
        with open(path_or_file, "w") as f:
            _write(f)


def _fmt(v) -> str:
    # the reference writes explicit zeros as a bare "0" (h:1937-1943)
    # and values with std::fixed setprecision(6) (h:1936)
    if v == 0:
        return "0"
    return f"{float(v):.6f}"


_NUM = re.compile(r"[-+0-9.eE]+")


def load_smmdt(
    path_or_file: Union[str, os.PathLike, TextIO], *, dtype=np.float64
) -> TripletMatrix:
    """Parse SMMDT into a :class:`TripletMatrix`; zeros are skipped on
    ingest exactly like the reference (h:2634-2636)."""
    if hasattr(path_or_file, "read"):
        text = path_or_file.read()
    else:
        try:
            with open(path_or_file, "r") as f:
                text = f.read()
        except OSError as e:
            raise MatrixMarketError(
                MatrixLoadStatus.FAILED_TO_OPEN_FILE,
                f"cannot open {path_or_file}: {e}",
            ) from e

    header, _, body = text.partition("{")
    parts = header.split()
    if len(parts) != 2:
        raise MatrixMarketError(
            MatrixLoadStatus.PARSE_ERROR, f"bad SMMDT header: {header!r}"
        )
    n_rows, n_cols = int(parts[0]), int(parts[1])
    m = TripletMatrix(n_rows, n_cols, dtype=dtype)

    row_blocks = re.findall(r"\{([^{}]*)\}", body)
    if len(row_blocks) != n_rows:
        raise MatrixMarketError(
            MatrixLoadStatus.PARSE_ERROR,
            f"expected {n_rows} rows, found {len(row_blocks)}",
        )
    for i, block in enumerate(row_blocks):
        values = _NUM.findall(block)
        if len(values) != n_cols:
            raise MatrixMarketError(
                MatrixLoadStatus.PARSE_ERROR,
                f"row {i}: expected {n_cols} values, found {len(values)}",
            )
        for j, tok in enumerate(values):
            v = float(tok)
            if v != 0.0:
                m.add_entry(i, j, v)
    return m
