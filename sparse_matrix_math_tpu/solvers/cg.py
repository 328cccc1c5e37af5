"""Conjugate Gradient (plain and preconditioned) as a jitted while_loop.

TPU-native re-design of the reference ``ConjugateGradient``
(include/sparse_matrix_math.h:2316-2398) and its preconditioned overload
(h:2414-2505).  Behavioral parity:

* ``r0 = b - A @ x0``; early SUCCESS when ``||r0||^2 < eps^2`` before any
  iteration (h:2341-2344).
* per iteration: one SpMV, ``alpha = rr / (Ap . p)``, fused x/r updates,
  convergence test on ``||r||^2 < eps^2`` (h:2377-2379), ``p = r + beta p``.
* returns MAX_ITERATIONS_REACHED on cap (h:2397 — the one reference solver
  that gets this right).
* preconditioned variant: ``z = M^{-1} r``; ``alpha = (r.z)/(Ap.p)``,
  ``beta = (r'.z')/(r.z)`` (pseudocode h:2424-2434).  The reference only
  instantiates this for IC(0); here any preconditioner with ``.apply``
  works (IC0/SGS/ILU0/Jacobi/Identity).

Improvements over the reference (SURVEY §7): non-finite reductions are
detected and reported as DIVERGED instead of looping on NaN.

The whole iteration runs inside ``jax.lax.while_loop`` under ``jit`` —
XLA fuses SpMV + dots + axpys into a handful of kernels, the TPU-native
equivalent of the reference's per-loop TBB parallel_for blocks
(h:2362-2394).  The matrix and the preconditioner cross the jit boundary
as pytree arguments, so compilations are cached per matrix structure.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from ..ops.vector import dot
from .types import RUNNING, SolveResult, SolverStatus, resolve_max_iterations
from ..formats.reorder import reorder_hoisted

__all__ = ["conjugate_gradient", "cg", "cg_core", "pcg_core"]


@reorder_hoisted
def conjugate_gradient(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    preconditioner=None,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve ``a @ x = b`` for SPD ``a``.

    Args:
      a: CSR/ELL/DIA matrix, dense 2-D array, or matvec callable.
      b: right-hand side.
      x0: initial guess (zeros when None) — Krylov "resume" capability,
        reference README.md:5.
      max_iterations: -1 means n (reference convention, h:2345-2347).
      epsilon: L2-norm convergence threshold on the residual.
      preconditioner: object with ``apply(r) -> z`` (SPD), or None.
      record_residuals: also return the per-iteration ||r|| trace.
    """
    a = as_operator(a)
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    from . import _padded

    if _padded.eligible(a, preconditioner):
        res = _padded.padded_solve(
            "cg", a, b, x0, eps, maxiter, record_residuals,
            preconditioner=preconditioner,
        )
        if res is not None:
            return res
    if preconditioner is None:
        return _cg_loop(a, b, x0, eps, maxiter, record_residuals)
    return _pcg_loop(a, preconditioner, b, x0, eps, maxiter, record_residuals)


cg = conjugate_gradient


@partial(jax.jit, static_argnums=(4, 5))
def _cg_loop(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    return cg_core(matvec_fn(a), dot, b, x0, eps, maxiter, record)


def cg_core(matvec, dotfn, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    """Algorithm core, parameterised over ``matvec`` and ``dotfn`` so the
    distributed layer (parallel/) can run the identical loop inside
    ``shard_map`` with psum-reducing dots (SURVEY §2.3).

    Verified convergence: the recurrence residual drifts from the true
    residual ``b - A x`` in finite precision (at n=2M/f32 the drift is
    >50x eps by iteration ~2000 — BENCH_NOTES).  SUCCESS here means the
    TRUE residual passed: when the recurrence claims convergence the loop
    recomputes ``b - matvec(x)`` (one extra SpMV, only at claimed
    convergence), and either confirms SUCCESS or restarts from the true
    residual.  If a restart fails to shrink the true residual by 2x the
    solve has hit its precision floor and stops with
    MAX_ITERATIONS_REACHED, reporting the floor in ``residual_norm`` —
    this matches the contract of the reference tests
    (test/include/test_common.h:30-51), which measure the actual error.
    """
    dot = dotfn
    eps2 = eps * eps

    r = b - matvec(x0)
    rr = dot(r, r)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(jnp.sqrt(rr))
        if record
        else None
    )

    def cond(carry):
        _, _, _, rr, _, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, p, rr, floor_rr, k, status, trace = carry
        ap = matvec(p)
        pap = dot(ap, p)
        alpha = rr / pap
        x = x + alpha * p
        r = r - alpha * ap
        new_rr = dot(r, r)
        rec_conv = new_rr < eps2

        def verify(args):
            x, r, new_rr = args
            r_t = b - matvec(x)
            t_rr = dot(r_t, r_t)
            return r_t, t_rr, t_rr < eps2

        def skip(args):
            _, r, new_rr = args
            return r, new_rr, jnp.bool_(False)

        # true-residual check runs ONLY when the recurrence claims
        # convergence; r/rr are replaced with the true values either way
        # the verify branch runs (confirmed -> exit with true residual in
        # the carry; refuted -> restart from the true residual)
        r, new_rr, verified = jax.lax.cond(
            rec_conv, verify, skip, (x, r, new_rr)
        )
        refuted = rec_conv & ~verified
        stalled = refuted & (new_rr > floor_rr * 0.25)
        floor_rr = jnp.where(refuted, new_rr, floor_rr)

        diverged = ~jnp.isfinite(new_rr)
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(
                verified,
                SolverStatus.SUCCESS,
                jnp.where(stalled, SolverStatus.MAX_ITERATIONS_REACHED, RUNNING),
            ),
        ).astype(jnp.int32)
        beta = new_rr / rr
        # restart on refutation: conjugacy history is noise at this point
        p = jnp.where(refuted, r, r + beta * p)
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(new_rr))
        return x, r, p, new_rr, floor_rr, k + 1, status, trace

    init_status = jnp.where(rr < eps2, SolverStatus.SUCCESS, RUNNING).astype(jnp.int32)
    inf = jnp.asarray(jnp.inf, rr.dtype)
    carry = (x0, r, r, rr, inf, jnp.int32(0), init_status, trace)
    x, r, _, rr, _, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)
    # on non-SUCCESS exits rr is the recurrence value — report the true
    # residual so residual_norm always means ||b - A x|| (one extra SpMV,
    # skipped on the SUCCESS path where the carry already holds it)
    def _true_rr():
        r_t = b - matvec(x)
        return dot(r_t, r_t)

    rr = jax.lax.cond(status == SolverStatus.SUCCESS, lambda: rr, _true_rr)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )


@partial(jax.jit, static_argnums=(5, 6))
def _pcg_loop(a, preconditioner, b, x0, eps, maxiter: int, record: bool):
    return pcg_core(
        matvec_fn(a), preconditioner.apply, dot, b, x0, eps, maxiter, record
    )


def pcg_core(matvec, precond_apply, dotfn, b, x0, eps, maxiter: int, record: bool):
    """Preconditioned-CG algorithm core (see :func:`cg_core`).

    Convergence is verified against the TRUE residual ``b - A x`` exactly
    as in :func:`cg_core`; a refuted claim restarts the recursion from
    the true residual (``z = M^{-1} r_true``, ``p = z``).
    """
    dot = dotfn
    eps2 = eps * eps

    r = b - matvec(x0)
    z = precond_apply(r)
    rz = dot(r, z)
    rr = dot(r, r)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(jnp.sqrt(rr))
        if record
        else None
    )

    def cond(carry):
        _, _, _, _, _, _, _, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, z, p, rz, rr, floor_rr, k, status, trace = carry
        ap = matvec(p)
        pap = dot(ap, p)
        alpha = rz / pap
        x = x + alpha * p
        r = r - alpha * ap
        new_rr = dot(r, r)
        rec_conv = new_rr < eps2

        def verify(args):
            x, r, new_rr = args
            r_t = b - matvec(x)
            t_rr = dot(r_t, r_t)
            return r_t, t_rr, t_rr < eps2

        def skip(args):
            _, r, new_rr = args
            return r, new_rr, jnp.bool_(False)

        r, new_rr, verified = jax.lax.cond(
            rec_conv, verify, skip, (x, r, new_rr)
        )
        refuted = rec_conv & ~verified
        stalled = refuted & (new_rr > floor_rr * 0.25)
        floor_rr = jnp.where(refuted, new_rr, floor_rr)

        z = precond_apply(r)
        new_rz = dot(r, z)
        diverged = ~jnp.isfinite(new_rr)
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(
                verified,
                SolverStatus.SUCCESS,
                jnp.where(stalled, SolverStatus.MAX_ITERATIONS_REACHED, RUNNING),
            ),
        ).astype(jnp.int32)
        beta = new_rz / rz
        p = jnp.where(refuted, z, z + beta * p)
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(new_rr))
        return x, r, z, p, new_rz, new_rr, floor_rr, k + 1, status, trace

    init_status = jnp.where(rr < eps2, SolverStatus.SUCCESS, RUNNING).astype(jnp.int32)
    inf = jnp.asarray(jnp.inf, rr.dtype)
    carry = (x0, r, z, z, rz, rr, inf, jnp.int32(0), init_status, trace)
    x, r, _, _, _, rr, _, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)

    def _true_rr():
        r_t = b - matvec(x)
        return dot(r_t, r_t)

    rr = jax.lax.cond(status == SolverStatus.SUCCESS, lambda: rr, _true_rr)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
