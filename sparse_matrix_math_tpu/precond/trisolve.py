"""Sparse triangular solves on TPU.

The reference's preconditioner applies are sequential row sweeps
(SGS forward/backward substitution include/sparse_matrix_math.h:1672-1711,
IC0 h:1802-1837) — inherently serial, the main TPU-design challenge
(SURVEY §7 "hard parts" #1).  This module provides a
:class:`TriangularMatrix` factor with selectable solve strategies:

* ``dense``  — materialise the factor once and use
  ``jax.scipy.linalg.solve_triangular`` (MXU-friendly, exact; memory is
  O(n^2) so this is the small/medium-n path, e.g. the whole reference
  test suite).
* ``jacobi`` — stationary Jacobi iteration on the triangular system:
  ``x_{k+1} = D^{-1} (b - N x_k)`` with ``N`` the strictly-triangular
  part.  ``D^{-1}N`` is nilpotent with index equal to the factor's
  dependency-level count, so ``sweeps >= depth`` gives the EXACT solve;
  fewer sweeps give the standard approximate (iterative) triangular
  solve used by GPU/TPU preconditioning.  Each sweep is one fully
  parallel SpMV — this is the scalable path.

The per-sweep strict SpMV itself runs through the W-SELL Pallas layout
(``strict_layout``) when the strict pattern packs under the slot-ratio
cap — the same kernel hierarchy every solver uses — so SGS/IC0/ILU0
applies reach production speed on ARBITRARY patterns, not just DIA
stencils (the reference applies SGS to any CSR matrix,
include/sparse_matrix_math.h:1672-1711; precond/padded_sgs.py is the
stencil-only fused variant).  Patterns that do not pack fall back to
the XLA take/segment-sum strict SpMV.

The dependency depth is computed at build time (host side) via level
scheduling, so ``sweeps="exact"`` is available without guessing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TriangularMatrix", "triangular_from_csr_arrays"]

# beyond this level-schedule depth, an "exact" Jacobi-sweep apply costs
# more SpMVs than the Krylov solve it preconditions — warn loudly
_EXACT_SWEEP_WARN_DEPTH = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TriangularMatrix:
    """Sparse triangular factor (diagonal stored separately).

    ``data/indices/indptr/row_ids`` hold the STRICT triangular part in CSR
    layout; ``diag`` is the diagonal (all ones for unit-diagonal factors).
    """

    data: jnp.ndarray      # (snnz,) strict-part values
    indices: jnp.ndarray   # (snnz,) int32
    row_ids: jnp.ndarray   # (snnz,) int32
    diag: jnp.ndarray      # (n,)
    dense: Optional[jnp.ndarray]  # (n, n) materialised factor, or None
    # strict part in the W-SELL Pallas layout (formats/wsell.py), or
    # None — when present, every Jacobi sweep's strict SpMV runs the
    # Pallas kernel instead of take/segment_sum
    wsell: Optional[object]
    n: int = dataclasses.field(metadata=dict(static=True))
    lower: bool = dataclasses.field(metadata=dict(static=True))
    depth: int = dataclasses.field(metadata=dict(static=True))
    method: str = dataclasses.field(metadata=dict(static=True))
    sweeps: int = dataclasses.field(metadata=dict(static=True))

    def _strict_matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.wsell is not None:
            from ..ops.spmv import rmult

            return rmult(self.wsell, x)
        d = self.data[:, None] if x.ndim == 2 else self.data
        g = d * jnp.take(x, self.indices, axis=0)
        return jax.ops.segment_sum(
            g, self.row_ids, num_segments=self.n, indices_are_sorted=True
        )

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """x with T x = b (T = strict part + diag).

        ``b`` may be a vector (n,) or a multi-RHS panel (n, m) — every
        step below (take/segment_sum over axis 0, solve_triangular)
        operates column-wise, so panels solve in one pass.
        """
        if self.method == "dense":
            return jax.scipy.linalg.solve_triangular(
                self.dense, b, lower=self.lower
            )
        # Jacobi sweeps: x <- (b - N x) / d.  Exact when sweeps >= depth.
        inv_d = 1.0 / self.diag
        if b.ndim == 2:
            inv_d = inv_d[:, None]

        def sweep(x, _):
            return (b - self._strict_matvec(x)) * inv_d, None

        x0 = b * inv_d
        x, _ = jax.lax.scan(sweep, x0, None, length=max(self.sweeps - 1, 0))
        return x


def triangular_from_csr_arrays(
    data: np.ndarray,
    indices: np.ndarray,
    indptr: np.ndarray,
    *,
    lower: bool,
    unit_diag: bool = False,
    method: str = "auto",
    sweeps="exact",
    dense_threshold: int = 4096,
    strict_layout: str = "auto",
) -> TriangularMatrix:
    """Build a :class:`TriangularMatrix` from host CSR arrays of a
    triangular matrix (diagonal entries may be present; they are split
    out).  For ``unit_diag`` factors the diagonal is implicit ones.

    ``method="auto"`` picks ``dense`` for n <= dense_threshold else
    ``jacobi``.  ``sweeps="exact"`` uses the level-scheduling depth.

    ``strict_layout`` selects how Jacobi sweeps compute the strict SpMV:
    ``"wsell"`` forces the W-SELL Pallas layout (falls back to
    segment-sum when the pattern pads past the slot-ratio cap),
    ``"csr"`` forces take/segment_sum, and ``"auto"`` uses W-SELL on the
    TPU backend only (the CPU fallback would run the kernel in slow
    interpret mode).
    """
    data = np.asarray(data)
    indices = np.asarray(indices, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    n = indptr.shape[0] - 1
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))

    on_diag = indices == row_ids
    if unit_diag:
        diag = np.ones(n, dtype=data.dtype)
    else:
        diag = np.zeros(n, dtype=data.dtype)
        diag[row_ids[on_diag]] = data[on_diag]
        if np.any(diag == 0):
            raise ValueError("triangular factor has a zero diagonal entry")
    strict = ~on_diag
    s_data, s_idx, s_row = data[strict], indices[strict], row_ids[strict]
    if lower and np.any(s_idx > s_row):
        raise ValueError("matrix is not lower triangular")
    if not lower and np.any(s_idx < s_row):
        raise ValueError("matrix is not upper triangular")

    if method == "auto":
        method = "dense" if n <= dense_threshold else "jacobi"
    if method not in ("dense", "jacobi"):
        raise ValueError(f"unknown triangular solve method {method!r}")
    if sweeps == "exact" or method == "dense":
        # level-scheduling depth: only computed when actually needed — the
        # host-side scan is O(n) Python work, pointless for explicit sweeps
        depth = _level_depth(s_idx, s_row, n, lower=lower)
    else:
        depth = -1  # unknown (not needed)
    if sweeps == "exact":
        n_sweeps = depth
        if method == "jacobi" and depth > _EXACT_SWEEP_WARN_DEPTH:
            import warnings

            warnings.warn(
                f"sweeps='exact' implies {depth} Jacobi sweeps per "
                "triangular apply (each sweep is a full SpMV) — at this "
                "depth the preconditioner is technically exact but "
                "practically unusable.  Pass an explicit small sweep "
                "count (e.g. sweeps=2..8, the standard approximate "
                "triangular solve) for scale.",
                RuntimeWarning,
                stacklevel=3,
            )
    else:
        n_sweeps = int(sweeps)

    dense = None
    if method == "dense":
        dmat = np.zeros((n, n), dtype=data.dtype)
        dmat[s_row, s_idx] = s_data
        dmat[np.arange(n), np.arange(n)] = diag
        dense = jnp.asarray(dmat)

    if strict_layout not in ("auto", "wsell", "csr"):
        raise ValueError(f"unknown strict_layout {strict_layout!r}")
    wsell = None
    if (
        method == "jacobi"
        and s_data.size
        and (
            strict_layout == "wsell"
            or (strict_layout == "auto" and jax.default_backend() == "tpu")
        )
    ):
        from ..formats.wsell import _wsell_from_coo

        for wf in (1, 8):  # narrow windows first; wide for scattered
            try:
                wsell = _wsell_from_coo(
                    s_row, s_idx, s_data, (n, n), int(s_data.size),
                    max_slot_ratio=8.0, window_f=wf,
                )
                break
            except ValueError:
                wsell = None  # pads past the cap — try wider / fall back

    return TriangularMatrix(
        data=jnp.asarray(s_data),
        indices=jnp.asarray(s_idx.astype(np.int32)),
        row_ids=jnp.asarray(s_row.astype(np.int32)),
        diag=jnp.asarray(diag),
        dense=dense,
        wsell=wsell,
        n=int(n),
        lower=bool(lower),
        depth=int(depth),
        method=method,
        sweeps=int(n_sweeps),
    )


def _level_depth(s_idx: np.ndarray, s_row: np.ndarray, n: int, *, lower: bool) -> int:
    """Level-scheduling depth of a strict triangular pattern: the length of
    the longest dependency chain = nilpotency index of D^{-1}N."""
    level = np.zeros(n, dtype=np.int64)
    if s_row.size == 0:
        return 1
    order = range(n) if lower else range(n - 1, -1, -1)
    # group strict entries by row
    by_row_start = np.zeros(n + 1, dtype=np.int64)
    np.add.at(by_row_start[1:], s_row, 1)
    np.cumsum(by_row_start, out=by_row_start)
    sort = np.argsort(s_row, kind="stable")
    cols_sorted = s_idx[sort]
    for r in order:
        lo, hi = by_row_start[r], by_row_start[r + 1]
        if hi > lo:
            level[r] = level[cols_sorted[lo:hi]].max() + 1
    return int(level.max()) + 1
