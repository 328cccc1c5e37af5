"""Grid-resident solver fast path for matrix-free stencils.

The twin of :mod:`solvers._padded` for :class:`GridStencilMatrix`
operators (formats/stencil.py): every solver vector stays in the N-D
grid layout across the whole ``lax.while_loop`` — reshape once before
the loop, once after — so each iteration is the bare fused stencil pass
plus VMEM-resident vector ops.  Measured on the 10M-nnz 2-D Poisson
bench system: 25.2 us per CG iteration (~400 GNNZ/s-equivalent) vs
44.6 us through the padded-DIA Pallas kernel and ~43 us when the
reshapes happen per call instead of per solve (benchmarks round 4).

Pure XLA — no Pallas, so the path is identical on CPU and TPU.  The
algorithm cores are shape-agnostic (matvec + dotfn parameterised); this
module is plumbing only.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.stencil import GridStencilMatrix
from .bicg_symmetric import bicg_symmetric_core
from .bicgstab import bicgstab_core
from .cg import cg_core, pcg_core
from .cgs import cgs_core
from .types import SolveResult

__all__ = ["eligible", "stencil_solve"]

# Above this many bytes per solver vector the 4-5 CG carries can no
# longer ALL sit in VMEM (TPU v5e: 128 MB), and WHICH carry XLA's
# memory-space-assignment pins there decides the iteration cost: with
# the stencil operand ``p`` pinned, the 7-slice apply reads VMEM and an
# iteration costs 0.648 ms at 243^3; with ``r`` pinned instead (which
# is what MSA picks whenever the same jit computes a pre-loop reduction
# on r — exactly what cg_core's outer verify round does) the apply
# re-reads ~7 slices from HBM and the same iteration costs 1.154 ms
# (measured round 5, benchmarks/profile_3d_hbm.py).  The host-driven
# outer loop below keeps the inner recurrence in its own jit whose
# carries enter as ARGUMENTS — the shape MSA reliably pins ``p`` for.
_HBM_REGIME_BYTES = 24 * 1024 * 1024

_CORES = {
    "cg": cg_core,
    "bicg_symmetric": bicg_symmetric_core,
    "cgs": cgs_core,
    "bicgstab": bicgstab_core,
}


def eligible(a, preconditioner=None) -> bool:
    """Use the grid fast path?  (GridStencilMatrix operator and a
    preconditioner representable in the grid domain: None, Jacobi —
    whose inverse diagonal reshapes — or Chebyshev wrapping ``a``
    itself, whose apply is k stencil passes.)"""
    from ..precond.cheby_poly import ChebyshevPreconditioner
    from ..precond.preconditioners import JacobiPreconditioner

    if not isinstance(a, GridStencilMatrix):
        return False
    if preconditioner is None:
        return True
    if isinstance(preconditioner, JacobiPreconditioner):
        return True
    if isinstance(preconditioner, ChebyshevPreconditioner):
        return preconditioner.a is a
    return False


def stencil_solve(
    core_name: str,
    a: GridStencilMatrix,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    eps,
    maxiter: int,
    record: bool,
    preconditioner=None,
) -> Optional[SolveResult]:
    """Run the solve with grid-resident carries; None when the
    preconditioner cannot cross into the grid domain (callers fall back
    to the generic path)."""
    from ..precond.cheby_poly import ChebyshevPreconditioner
    from ..precond.preconditioners import JacobiPreconditioner

    pre_kind, inv_diag, cheby = "none", None, None
    if isinstance(preconditioner, JacobiPreconditioner):
        pre_kind, inv_diag = "jacobi", preconditioner.inv_diag
    elif isinstance(preconditioner, ChebyshevPreconditioner):
        if preconditioner.a is not a:
            return None
        pre_kind = "cheby"
        cheby = (
            preconditioner.lmin, preconditioner.lmax, preconditioner.degree
        )
    elif preconditioner is not None:
        return None
    if (
        core_name == "cg"
        and pre_kind == "none"
        and b.size * b.dtype.itemsize > _HBM_REGIME_BYTES
    ):
        return _cg_hbm(a, b, x0, jnp.asarray(eps, b.dtype), maxiter, record)
    return _stencil_solve_jit(
        core_name, a, b, x0, jnp.asarray(eps, b.dtype), inv_diag,
        pre_kind, cheby, maxiter, record,
    )


@jax.jit
def _hbm_residual(a, b, x, rr, k):
    """One verify/restart step: the grid-shaped true residual (plus a
    DISTINCT copy for the restart search direction — separate jit
    outputs so the inner loop receives separate buffers) and ONE packed
    scalar vector [recurrence rr, true rr, bitcast k] so the host
    driver needs a single readback per round (each readback costs a
    full dispatch+sync round trip — ~26 ms on the tunneled device)."""
    r = a.to_grid(b) - a.apply_grid(x)
    t_rr = jnp.sum(r * r)
    # pack FLOATS AS INT BITS (not ints as float bits: a small int
    # reinterpreted as f32 is a denormal, and denormals flush to zero
    # somewhere between stack and transfer — observed on the CPU
    # backend); int arrays move untouched.  Width follows the residual
    # dtype so f64 solves (CPU x64) keep full precision.
    itype = jnp.int64 if r.dtype == jnp.float64 else jnp.int32
    scal = jnp.stack([
        jax.lax.bitcast_convert_type(jnp.asarray(rr, r.dtype), itype),
        jax.lax.bitcast_convert_type(t_rr, itype),
        jnp.asarray(k, itype),
    ])
    return r, r * jnp.ones((), r.dtype), t_rr, scal


@partial(jax.jit, static_argnums=(7, 8))
def _hbm_inner(a, x, r, p, rr, k0, eps2, maxiter: int, record: bool,
               trace=None):
    """The pure CG recurrence with every carry entering as a jit
    ARGUMENT (see _HBM_REGIME_BYTES: this is the program shape whose
    memory-space assignment keeps the stencil operand ``p`` pinned in
    VMEM at big n).  Runs until the RECURRENCE claims convergence,
    diverges, or hits the cap — verification happens in the host driver.
    """
    matvec = a.apply_grid

    def cond(c):
        _, _, _, rr, k, _ = c
        return (rr >= eps2) & (k < maxiter) & jnp.isfinite(rr)

    def body(c):
        x, r, p, rr, k, trace = c
        ap = matvec(p)
        pap = jnp.sum(ap * p)
        alpha = rr / pap
        x = x + alpha * p
        r = r - alpha * ap
        new_rr = jnp.sum(r * r)
        beta = new_rr / rr
        p = r + beta * p
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(new_rr))
        return x, r, p, new_rr, k + 1, trace

    x, r, p, rr, k, trace = jax.lax.while_loop(
        cond, body, (x, r, p, rr, k0, trace)
    )
    return x, rr, k, trace


def _cg_hbm(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    """HBM-regime CG: identical contract to cg_core (verified
    convergence, floor_hit, restart-from-true-residual — solvers/cg.py)
    with the outer verify loop on the HOST instead of a nested
    lax.while_loop.  Each round costs two extra dispatches (~sync floor
    each on a tunneled device, sub-ms on local hardware) and buys
    0.5 ms on EVERY inner iteration at 243^3 (87 -> 155 GNNZ/s
    in-solver; see _HBM_REGIME_BYTES).  Small-n solves keep the
    single-jit nest — VMEM holds all their carries either way."""
    from .types import SolverStatus as S

    eps2 = eps * eps
    x = a.to_grid(x0)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype) if record else None
    )

    eps2_f = float(eps2)
    k = 0  # host-side iteration count (decoded from each readback)
    floor_rr = float("inf")
    hit = False
    status = None
    t_rr = None
    # initial residual — dispatched but NOT read back: the first inner
    # call runs speculatively (its while cond no-ops on device when the
    # entry state is already converged/diverged/capped), so the ONLY
    # host sync is the one packed readback per verify round
    r_e, p_e, rr_e, _ = _hbm_residual(
        a, b, x, jnp.float32(0), jnp.int32(0)
    )
    if trace is not None:
        trace = trace.at[0].set(jnp.sqrt(rr_e))
    k_dev = jnp.int32(0)
    ftype = None
    while True:
        x, rr, k_dev, trace = _hbm_inner(
            a, x, r_e, p_e, rr_e, k_dev, eps2, maxiter, record, trace
        )
        # verify against the TRUE residual; the same arrays are the next
        # round's restart state, so one dispatch serves both (and also
        # supplies the honest ||b - A x|| on the cap/divergence exits)
        r_e, p_e, rr_e, scal = _hbm_residual(a, b, x, rr, k_dev)
        arr = np.asarray(scal)  # single sync: [rr, t_rr, k] (float bits)
        if ftype is None:
            ftype = np.float64 if arr.dtype == np.int64 else np.float32
        rr_f = float(arr[0:1].view(ftype)[0])
        t_rr_f = float(arr[1:2].view(ftype)[0])
        k = int(arr[2])
        claimed = rr_f < eps2_f

        verified = claimed and t_rr_f < eps2_f
        refuted = claimed and not verified
        stalled = refuted and (t_rr_f > floor_rr * 0.25)
        hit = hit or stalled
        if refuted:
            floor_rr = t_rr_f

        if not np.isfinite(rr_f):
            status, t_rr = S.DIVERGED, t_rr_f
            break
        if verified:
            status, t_rr = S.SUCCESS, t_rr_f
            break
        if stalled or k >= maxiter:
            status, t_rr = S.MAX_ITERATIONS_REACHED, t_rr_f
            break
        # refuted but still making progress: loop restarts from r_true

    return SolveResult(
        x=a.from_grid(x),
        status=jnp.int32(int(status)),
        iterations=jnp.int32(k),
        residual_norm=jnp.sqrt(jnp.asarray(t_rr, b.dtype)),
        residual_trace=trace,
        floor_hit=jnp.bool_(
            hit and status == S.MAX_ITERATIONS_REACHED
        ),
    )


@partial(jax.jit, static_argnums=(0, 6, 7, 8, 9))
def _stencil_solve_jit(
    core_name: str, a, b, x0, eps, inv_diag, pre_kind: str, cheby,
    maxiter: int, record: bool,
) -> SolveResult:
    matvec = a.apply_grid

    def dotfn(u, v):
        return jnp.sum(u * v)

    bg = a.to_grid(b)
    x0g = a.to_grid(x0)

    if pre_kind == "jacobi":
        invg = a.to_grid(inv_diag)
        apply_ = lambda r: r * invg  # noqa: E731
    elif pre_kind == "cheby":
        from ..precond.cheby_poly import cheby_apply_fn

        apply_ = cheby_apply_fn(matvec, *cheby)
    else:
        apply_ = None

    if core_name == "cg" and apply_ is not None:
        res = pcg_core(matvec, apply_, dotfn, bg, x0g, eps, maxiter, record)
    elif core_name == "bicgstab":
        res = bicgstab_core(
            matvec, apply_ or (lambda v: v), dotfn, bg, x0g, eps, maxiter,
            record,
        )
    else:
        res = _CORES[core_name](matvec, dotfn, bg, x0g, eps, maxiter, record)
    return dataclasses.replace(res, x=a.from_grid(res.x))
