"""Symmetric Gauss-Seidel in the padded DIA domain — preconditioning at
bench scale.

The reference's SGS apply is two sequential row substitutions
(include/sparse_matrix_math.h:1672-1711) — inherently serial, the main
TPU-design challenge (SURVEY §7 hard-part #1).  The scalable TPU strategy
(precond/trisolve.py) replaces each substitution with ``sweeps`` Jacobi
iterations; here each sweep's strict-triangular SpMV runs as the padded
Pallas stencil kernel, because for a DIA (banded/stencil) matrix the
strict lower/upper parts are themselves DIA matrices.  The factors are
laid into the SAME padded layout as the full matrix (``pad_dia``'s
``geometry_offsets``), so the whole preconditioned Krylov iteration stays
in the 2-D padded layout with zero per-iteration layout work.

A truncated sweep count (default 2) is a *fixed linear* operator, so it
is a legitimate preconditioner M̃ ≈ (D+L) D^{-1} (D+U); for constant-
diagonal SPD stencils the truncated operator is symmetric positive
definite as well (M̃^{-1} = P_k(L^T/d) P_k(L/d)/d is a Gram-form product),
so it is PCG-safe on the benchmark Poisson systems.  This is what makes
f32 BiCGStab converge at the 2M-row bench scale — mirroring the
reference's own cure for its noted f32 instability
(test/cpp/bicgstab.cpp:68 + SGS tests h:2217-2257).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dia import DIAMatrix
from ._factorize import FactorizationError
from .preconditioners import _SGS_MIN_DIAG

__all__ = ["PaddedSGS"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedSGS:
    """SGS preconditioner whose factors live in the padded DIA layout.

    ``p_lower``/``p_upper`` hold the STRICT triangular diagonals (None
    when that part is empty); ``inv_diag_p``/``diag_p`` are the padded
    2-D diagonal vectors (pad slots 0, so padding stays exactly zero
    through every sweep).
    """

    p_lower: Optional[object]   # PaddedDIA | None
    p_upper: Optional[object]   # PaddedDIA | None
    inv_diag_p: jnp.ndarray     # (rows, 128) padded layout
    diag_p: jnp.ndarray         # (rows, 128)
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    sweeps: int = dataclasses.field(metadata=dict(static=True))
    rows_blk: int = dataclasses.field(metadata=dict(static=True))
    lead: int = dataclasses.field(metadata=dict(static=True))  # layout offset

    @classmethod
    def from_dia(
        cls, a: DIAMatrix, *, sweeps: int = 2, rows_blk: int = None
    ) -> "PaddedSGS":
        """Split a DIA matrix into D / strict-L / strict-U padded factors.

        Requires a stored main diagonal with ``|d_i| >= 1e-5`` on every
        row (the reference's SGS validity check, h:1690-1693).
        """
        from ..ops.pallas_spmv import default_rows_blk, pad_dia

        if rows_blk is None:
            # match pad_dia's adaptive default for the FULL geometry so
            # the factors and the matrix share one layout
            rows_blk = default_rows_blk(len(a.offsets))
        if int(sweeps) < 1:
            raise ValueError("sweeps must be >= 1")
        offsets = a.offsets
        if 0 not in offsets:
            raise FactorizationError("SGS requires a stored main diagonal")
        n = a.shape[0]
        diag = np.asarray(a.diags[offsets.index(0)])[:n]
        if np.any(np.abs(diag) < _SGS_MIN_DIAG):
            raise FactorizationError(
                f"SGS requires |diagonal| >= {_SGS_MIN_DIAG} on every row"
            )

        def strict_part(pred):
            keep = [i for i, off in enumerate(offsets) if pred(off)]
            if not keep:
                return None
            sub = DIAMatrix(
                diags=a.diags[jnp.asarray(keep)],
                offsets=tuple(offsets[i] for i in keep),
                shape=a.shape,
                nnz=a.nnz,  # metadata only; not used by the kernels
            )
            return pad_dia(sub, rows_blk=rows_blk, geometry_offsets=offsets)

        p_lower = strict_part(lambda o: o < 0)
        p_upper = strict_part(lambda o: o > 0)
        # one full-geometry reference for vector layout (either factor or,
        # for a pure-diagonal matrix, the matrix itself)
        ref = p_lower if p_lower is not None else p_upper
        if ref is None:
            ref = pad_dia(a, rows_blk=rows_blk)
        dvec = jnp.asarray(diag)
        diag_p = ref.to_padded(dvec)
        inv_diag_p = ref.to_padded(1.0 / dvec)
        return cls(
            p_lower=p_lower,
            p_upper=p_upper,
            inv_diag_p=inv_diag_p,
            diag_p=diag_p,
            shape=a.shape,
            sweeps=int(sweeps),
            rows_blk=rows_blk,
            lead=ref.lblk * rows_blk * 128,
        )

    def _tri_sweeps(self, pfac, rhs, *, resident: bool, interpret: bool):
        """x ≈ (D + N)^{-1} rhs via Jacobi sweeps in the padded layout:
        x_{k+1} = (rhs - N x_k) * D^{-1} (trisolve.py semantics: sweep 0
        is the plain diagonal scale, then sweeps-1 SpMV sweeps)."""
        if pfac is None:
            return rhs * self.inv_diag_p
        from ..ops.pallas_spmv import dia_spmv_padded, dia_spmv_streamed

        matvec = dia_spmv_padded if resident else dia_spmv_streamed

        def sweep(x, _):
            nx = matvec(pfac, x, interpret=interpret)
            return (rhs - nx) * self.inv_diag_p, None

        x0 = rhs * self.inv_diag_p
        x, _ = jax.lax.scan(sweep, x0, None, length=max(self.sweeps - 1, 0))
        return x

    def apply_padded(self, r, *, resident: bool = True, interpret: bool = False):
        """z = M^{-1} r with r/z in the padded 2-D layout: forward
        (D+L) y = r, then backward (D+U) z = D y (h:1672-1711)."""
        y = self._tri_sweeps(self.p_lower, r, resident=resident, interpret=interpret)
        return self._tri_sweeps(
            self.p_upper, self.diag_p * y, resident=resident, interpret=interpret
        )

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """Generic 1-D apply (pads, runs the padded apply, unpads) — lets
        the same object work on the non-padded solver paths too."""
        ref = self.p_lower if self.p_lower is not None else self.p_upper
        if ref is None:  # pure-diagonal matrix: M^{-1} = D^{-1}
            n = self.shape[0]
            inv_flat = self.inv_diag_p.reshape(-1)
            return r * jax.lax.slice(inv_flat, (self.lead,), (self.lead + n,))
        from ..ops.pallas_spmv import fits_in_vmem

        interpret = jax.default_backend() != "tpu"
        resident = fits_in_vmem(ref.n_total, r.dtype)
        rp = ref.to_padded(r)
        zp = self.apply_padded(rp, resident=resident, interpret=interpret)
        return ref.from_padded(zp)
