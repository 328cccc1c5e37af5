"""IC(0)/ILU(0) factor pairs in the padded DIA domain.

PaddedSGS (precond/padded_sgs.py) covers the stateless SGS apply at
bench scale; this module does the same re-lay for the FACTORED
preconditioners: the incomplete factors of a banded/stencil matrix are
themselves banded (zero fill keeps the pattern inside A's), so their
strict parts convert to DIA and the whole two-solve apply runs as one
fused halo-deep-sweep kernel (ops/pallas_trisweep.py,
``tri_pair_apply_fused``).

The factor VALUES come from the existing factorizations (native C++
IC0/ILU0 via precond/preconditioners.py) — this is purely a layout/
kernel re-lay of their TriangularMatrix factors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.dia import DIAMatrix

__all__ = ["PaddedTriPair"]


def _strict_to_padded_dia(tri, shape, geometry_offsets, rows_blk: int):
    """Convert a TriangularMatrix's STRICT part to a PaddedDIA laid out
    with the full matrix's geometry.  Returns None when the strict part
    is empty; raises ValueError when its offsets escape the geometry
    (caller falls back to the generic path)."""
    from ..ops.pallas_spmv import pad_dia

    s_row = np.asarray(tri.row_ids, np.int64)
    s_idx = np.asarray(tri.indices, np.int64)
    s_dat = np.asarray(tri.data)
    if s_row.size == 0:
        return None
    offs = s_idx - s_row
    uniq = np.unique(offs)
    if not set(int(o) for o in uniq) <= set(geometry_offsets):
        raise ValueError(
            "factor offsets escape the matrix geometry; generic path"
        )
    n = shape[0]
    diags = np.zeros((uniq.shape[0], n), s_dat.dtype)
    di = np.searchsorted(uniq, offs)
    diags[di, s_row] = s_dat
    sub = DIAMatrix(
        diags=jnp.asarray(diags),
        offsets=tuple(int(o) for o in uniq),
        shape=shape,
        nnz=int(s_row.size),
    )
    return pad_dia(sub, rows_blk=rows_blk, geometry_offsets=geometry_offsets)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedTriPair:
    """Factored preconditioner (L then U solve) in the padded DIA layout.

    ``p_lower``/``p_upper`` hold the strict parts; ``inv_diag_l_p`` /
    ``inv_diag_u_p`` the per-factor inverse diagonals in the padded 2-D
    layout (pad slots 0 so padding stays exactly zero).
    """

    p_lower: Optional[object]
    p_upper: Optional[object]
    inv_diag_l_p: jnp.ndarray
    inv_diag_u_p: jnp.ndarray
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    sweeps: int = dataclasses.field(metadata=dict(static=True))
    lead: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_factors(
        cls, lower, upper, a: DIAMatrix, *, rows_blk: int = None
    ) -> "PaddedTriPair":
        """Re-lay two TriangularMatrix factors (method='jacobi') against
        the geometry of the DIA matrix they precondition."""
        from ..ops.pallas_spmv import default_rows_blk, pad_dia

        if rows_blk is None:
            rows_blk = default_rows_blk(len(a.offsets))
        if lower.method != "jacobi" or upper.method != "jacobi":
            raise ValueError("padded factor pairs need method='jacobi'")
        geometry = a.offsets
        pL = _strict_to_padded_dia(lower, a.shape, geometry, rows_blk)
        pU = _strict_to_padded_dia(upper, a.shape, geometry, rows_blk)
        ref = pL if pL is not None else pU
        if ref is None:
            ref = pad_dia(a, rows_blk=rows_blk)
        inv_l = ref.to_padded(1.0 / jnp.asarray(lower.diag))
        inv_u = ref.to_padded(1.0 / jnp.asarray(upper.diag))
        return cls(
            p_lower=pL,
            p_upper=pU,
            inv_diag_l_p=inv_l,
            inv_diag_u_p=inv_u,
            shape=a.shape,
            sweeps=int(lower.sweeps),
            lead=ref.lblk * rows_blk * 128,
        )

    def _tri_sweeps(self, pfac, inv_d, rhs, *, resident, interpret):
        if pfac is None:
            return rhs * inv_d
        from ..ops.pallas_spmv import dia_spmv_padded, dia_spmv_streamed

        matvec = dia_spmv_padded if resident else dia_spmv_streamed

        def sweep(x, _):
            nx = matvec(pfac, x, interpret=interpret)
            return (rhs - nx) * inv_d, None

        x0 = rhs * inv_d
        x, _ = jax.lax.scan(sweep, x0, None, length=max(self.sweeps - 1, 0))
        return x

    def apply_padded_compositional(self, r, *, interpret: bool = False):
        """Reference apply: one kernel per sweep (the fused kernel's
        fallback and its test oracle)."""
        y = self._tri_sweeps(
            self.p_lower, self.inv_diag_l_p, r,
            resident=True, interpret=interpret,
        )
        return self._tri_sweeps(
            self.p_upper, self.inv_diag_u_p, y,
            resident=True, interpret=interpret,
        )

    def apply_padded(self, r, *, interpret: bool = False):
        from ..ops.pallas_trisweep import tri_pair_apply_fused

        return tri_pair_apply_fused(self, r, interpret=interpret)
