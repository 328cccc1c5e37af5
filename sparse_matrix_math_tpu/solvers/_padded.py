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
    # bicgstab_core takes an extra precond arg; identity here (the padded
    # path only runs unpreconditioned/Jacobi — see eligible())
    "bicgstab": lambda matvec, dotfn, *rest: bicgstab_core(
        matvec, lambda v: v, dotfn, *rest
    ),
}


def eligible(a, preconditioner=None) -> bool:
    """Use the padded fast path? (DIA matrix, TPU backend, preconditioner
    representable in the padded domain — currently None/Jacobi.  The
    solve picks the VMEM-resident or streamed kernel per size.)"""
    from ..precond.preconditioners import JacobiPreconditioner

    if not isinstance(a, DIAMatrix):
        return False
    if jax.default_backend() != "tpu":
        return False
    if preconditioner is not None and not isinstance(
        preconditioner, JacobiPreconditioner
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

    pdia = pad_dia(a)
    inv_diag = (
        preconditioner.inv_diag if preconditioner is not None else None
    )
    try:
        return _padded_solve_jit(
            core_name, pdia, b, x0, jnp.asarray(eps, b.dtype), inv_diag,
            maxiter, record, interpret,
        )
    except Exception as e:
        _warn_pallas_fallback(e)
        return None


@partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _padded_solve_jit(
    core_name: str, pdia, b, x0, eps, inv_diag, maxiter: int, record: bool,
    interpret: bool = False,
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

    if core_name == "cg" and inv_diag is not None:
        invp = pdia.to_padded(inv_diag)  # pad zeros: z padding stays 0
        res = pcg_core(
            matvec, lambda r: r * invp, dotfn, bp, x0p, eps, maxiter, record
        )
    else:
        res = _CORES[core_name](matvec, dotfn, bp, x0p, eps, maxiter, record)
    return dataclasses.replace(res, x=pdia.from_padded(res.x))
