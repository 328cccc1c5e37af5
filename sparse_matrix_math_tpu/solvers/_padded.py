"""Padded-domain solver fast path for DIA (stencil) matrices on TPU.

Krylov loops are launch-count-bound on TPU: every extra layout op per
iteration is a kernel.  For stencil matrices the SpMV runs as the Pallas
padded-layout kernel (ops/pallas_spmv.py:PaddedDIA) and every solver
vector stays in that 2-D layout across the whole ``lax.while_loop`` —
pad once before the loop, unpad once after.  Padding regions hold exact
zeros through SpMV/axpy/dot, so results are bit-identical to the
unpadded path's math.

The algorithm cores (solvers/*.py) are shape-agnostic (matvec + dotfn
parameterised), so this module is pure plumbing: no solver logic is
duplicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..formats.dia import DIAMatrix
from .bicg_symmetric import bicg_symmetric_core
from .bicgstab import bicgstab_core
from .cg import cg_core, pcg_core
from .cgs import cgs_core
from .types import SolveResult

__all__ = ["eligible", "padded_solve"]

_CORES = {
    "cg": cg_core,
    "bicg_symmetric": bicg_symmetric_core,
    "cgs": cgs_core,
    # bicgstab_core's precond arg is bound in _padded_solve_jit (identity,
    # Jacobi, or padded-SGS — see eligible())
    "bicgstab": bicgstab_core,
}


def eligible(a, preconditioner=None) -> bool:
    """Use the padded fast path? (DIA matrix, TPU backend, preconditioner
    representable in the padded domain — None/Jacobi/SGS.  For SGS the
    strict triangular factors of a DIA matrix are themselves DIA, so the
    truncated-sweep apply runs as padded Pallas kernels
    (precond/padded_sgs.py).  The solve picks the VMEM-resident or
    streamed kernel per size.)"""
    from ..precond.cheby_poly import ChebyshevPreconditioner
    from ..precond.padded_sgs import PaddedSGS
    from ..precond.padded_tri import PaddedTriPair
    from ..precond.preconditioners import (
        IC0Preconditioner,
        ILU0Preconditioner,
        JacobiPreconditioner,
        SGSPreconditioner,
    )

    if not isinstance(a, DIAMatrix):
        return False
    if jax.default_backend() != "tpu":
        return False
    if preconditioner is not None and not isinstance(
        preconditioner,
        (JacobiPreconditioner, SGSPreconditioner, PaddedSGS,
         ChebyshevPreconditioner, IC0Preconditioner, ILU0Preconditioner,
         PaddedTriPair),
    ):
        return False
    return True


def padded_solve(
    core_name: str,
    a: DIAMatrix,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    eps,
    maxiter: int,
    record: bool,
    preconditioner=None,
    interpret: bool = False,
) -> Optional[SolveResult]:
    """Run the solve through the padded Pallas path.

    Returns None when the Pallas kernel cannot be used (e.g. Mosaic
    compile failure on a part with less VMEM than assumed) — callers
    fall back to the generic solver path, matching rmult's degrade-
    gracefully contract.
    """
    from ..ops.pallas_spmv import pad_dia
    from ..ops.spmv import _warn_pallas_fallback
    from ..precond.padded_sgs import PaddedSGS
    from ..precond.preconditioners import (
        JacobiPreconditioner,
        SGSPreconditioner,
    )

    from ..precond.cheby_poly import ChebyshevPreconditioner
    from ..precond.padded_tri import PaddedTriPair
    from ..precond.preconditioners import (
        IC0Preconditioner,
        ILU0Preconditioner,
    )

    pdia = pad_dia(a)
    pre_kind, inv_diag, psgs, cheby = "none", None, None, None
    if isinstance(preconditioner, JacobiPreconditioner):
        pre_kind, inv_diag = "jacobi", preconditioner.inv_diag
    elif isinstance(preconditioner, PaddedSGS):
        pre_kind, psgs = "sgs", preconditioner
    elif isinstance(preconditioner, SGSPreconditioner):
        # re-lay the truncated-sweep apply into the padded domain; the
        # exact (dense/deep-sweep) variants stay on the generic path
        if preconditioner.fwd.method != "jacobi":
            return None
        psgs = PaddedSGS.from_dia(
            a, sweeps=preconditioner.fwd.sweeps, rows_blk=pdia.rows_blk
        )
        pre_kind = "sgs"
    elif isinstance(preconditioner, PaddedTriPair):
        pre_kind, psgs = "tripair", preconditioner
    elif isinstance(preconditioner, (IC0Preconditioner, ILU0Preconditioner)):
        # re-lay the incomplete factors into the padded DIA domain; the
        # exact (dense) variants and escape-geometry patterns stay generic
        try:
            psgs = PaddedTriPair.from_factors(
                preconditioner.lower, preconditioner.upper, a,
                rows_blk=pdia.rows_blk,
            )
        except ValueError:
            return None
        pre_kind = "tripair"
    elif isinstance(preconditioner, ChebyshevPreconditioner):
        # the polynomial apply is k applications of A itself — reuse the
        # padded matvec; only the static bounds/degree cross over.  That
        # rewrite is only valid when the preconditioner really wraps the
        # matrix being solved; otherwise keep the generic path (which
        # applies p_k(preconditioner.a) as documented).
        if preconditioner.a is not a:
            return None
        pre_kind = "cheby"
        cheby = (
            preconditioner.lmin, preconditioner.lmax, preconditioner.degree
        )
    try:
        return _padded_solve_jit(
            core_name, pdia, b, x0, jnp.asarray(eps, b.dtype), inv_diag,
            psgs, pre_kind, cheby, maxiter, record, interpret,
        )
    except Exception as e:
        _warn_pallas_fallback(e)
        return None


@partial(jax.jit, static_argnums=(0, 7, 8, 9, 10, 11))
def _padded_solve_jit(
    core_name: str, pdia, b, x0, eps, inv_diag, psgs, pre_kind: str,
    cheby, maxiter: int, record: bool, interpret: bool = False,
) -> SolveResult:
    from ..ops.pallas_spmv import dia_spmv_padded, dia_spmv_streamed, fits_in_vmem

    # residency is about the solver VECTOR (b's dtype), not the diagonal
    # storage dtype (which may be bf16)
    resident = fits_in_vmem(pdia.n_total, b.dtype)

    def matvec(v):
        if resident:
            return dia_spmv_padded(pdia, v, interpret=interpret)
        return dia_spmv_streamed(pdia, v, interpret=interpret)

    def dotfn(u, v):
        return jnp.sum(u * v)

    bp = pdia.to_padded(b)
    x0p = pdia.to_padded(x0)

    if pre_kind == "jacobi":
        invp = pdia.to_padded(inv_diag)  # pad zeros: z padding stays 0
        apply_ = lambda r: r * invp  # noqa: E731
    elif pre_kind == "sgs":
        # fused halo-deep-sweep kernel: ONE Pallas call per apply instead
        # of one per sweep per factor (ops/pallas_trisweep.py)
        from ..ops.pallas_trisweep import sgs_apply_fused

        apply_ = lambda r: sgs_apply_fused(psgs, r, interpret=interpret)  # noqa: E731
    elif pre_kind == "tripair":
        apply_ = lambda r: psgs.apply_padded(r, interpret=interpret)  # noqa: E731
    elif pre_kind == "cheby":
        from ..precond.cheby_poly import cheby_apply_fn

        apply_ = cheby_apply_fn(matvec, *cheby)
    else:
        apply_ = None

    if core_name == "cg" and apply_ is not None:
        res = pcg_core(matvec, apply_, dotfn, bp, x0p, eps, maxiter, record)
    elif core_name == "bicgstab":
        res = bicgstab_core(
            matvec, apply_ or (lambda v: v), dotfn, bp, x0p, eps, maxiter, record
        )
    else:
        res = _CORES[core_name](matvec, dotfn, bp, x0p, eps, maxiter, record)
    return dataclasses.replace(res, x=pdia.from_padded(res.x))
