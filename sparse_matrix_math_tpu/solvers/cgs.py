"""Conjugate Gradient Squared — transpose-free BiCG with squared residual
polynomial.

TPU-native implementation of the algorithm the reference *intends* in
``ConjugateGradientSquared`` (include/sparse_matrix_math.h:2109-2178).
The reference version does not compile when instantiated — its
``residualSquared`` is declared inside the do-block but referenced in the
while condition (h:2171-2172) — and is never exercised by any test
(test/cpp/cgsquared.cpp:21 calls ConjugateGradient instead).  Per SURVEY
§7 we reproduce the intent, not the bug: a working CGS with the
convergence check on ``||r||^2``.

Recursion (Saad, "Iterative Methods for Sparse Linear Systems" §7.4.1,
matching the reference's u/p/q/r recursion, h:2120-2126, 2131-2168):

    alpha = (r . r0) / (A p . r0)
    q     = u - alpha A p
    x    += alpha (u + q)
    r    -= alpha A (u + q)
    beta  = (r' . r0) / (r . r0)
    u     = r + beta q
    p     = u + beta (q + beta p)

Like the reference, a do-while: at least one iteration runs.  Improvements:
breakdown on vanishing (A p . r0) or (r . r0) and non-finite residuals →
DIVERGED (the reference leaves these as TODO comments, h:2134, 2153);
iteration-cap exit reports MAX_ITERATIONS_REACHED (reference bug h:2174).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from ..ops.vector import dot
from .types import harmonize_dtypes, RUNNING, SolveResult, SolverStatus, resolve_max_iterations
from ..formats.reorder import reorder_hoisted

__all__ = ["conjugate_gradient_squared", "cgs", "cgs_core"]


@reorder_hoisted
def conjugate_gradient_squared(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve ``a @ x = b`` (a need not be symmetric)."""
    a = as_operator(a)
    n = b.shape[0]
    b, x0 = harmonize_dtypes(a, b, x0)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    from . import _padded

    if _padded.eligible(a):
        res = _padded.padded_solve(
            "cgs", a, b, x0, eps, maxiter, record_residuals
        )
        if res is not None:
            return res
    return _cgs_loop(a, b, x0, eps, maxiter, record_residuals)


cgs = conjugate_gradient_squared


@partial(jax.jit, static_argnums=(4, 5))
def _cgs_loop(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    return cgs_core(matvec_fn(a), dot, b, x0, eps, maxiter, record)


def cgs_core(matvec, dotfn, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    """Algorithm core, parameterised over ``matvec``/``dotfn`` for reuse by
    the distributed layer (see solvers/cg.py:cg_core).

    Verified convergence: SUCCESS means the TRUE residual ``b - A x``
    passed eps (see cg_core); a refuted recurrence claim restarts the CGS
    recursion from the current x, a stalled restart stops honestly with
    MAX_ITERATIONS_REACHED."""
    dot = dotfn
    eps2 = eps * eps
    tiny = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)

    r = b - matvec(x0)
    r0 = r
    rr0 = dot(r, r0)
    rr = dot(r, r)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(jnp.sqrt(rr))
        if record
        else None
    )

    def cond(carry):
        _, _, _, _, _, _, _, _, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, r0, p, u, q, rr0, floor_rr, k, status, trace = carry
        ap = matvec(p)
        denom = dot(ap, r0)
        breakdown = jnp.abs(denom) < tiny
        alpha = jnp.where(breakdown, 0, rr0 / denom)
        q = u - alpha * ap
        uq = u + q
        x = x + alpha * uq
        r = r - alpha * matvec(uq)
        new_rr0 = dot(r, r0)
        rr = dot(r, r)
        rec_conv = rr <= eps2

        def verify(args):
            x, r, rr = args
            r_t = b - matvec(x)
            t_rr = dot(r_t, r_t)
            return r_t, t_rr, t_rr <= eps2

        def skip(args):
            _, r, rr = args
            return r, rr, jnp.bool_(False)

        r, rr, verified = jax.lax.cond(rec_conv, verify, skip, (x, r, rr))
        refuted = rec_conv & ~verified
        stalled = refuted & (rr > floor_rr * 0.25)
        floor_rr = jnp.where(refuted, rr, floor_rr)

        breakdown |= (jnp.abs(rr0) < tiny) | ~jnp.isfinite(rr)
        status = jnp.where(
            (breakdown & ~refuted) & ~verified,
            SolverStatus.DIVERGED,
            jnp.where(
                verified,
                SolverStatus.SUCCESS,
                jnp.where(stalled, SolverStatus.MAX_ITERATIONS_REACHED, RUNNING),
            ),
        ).astype(jnp.int32)
        beta = jnp.where(jnp.abs(rr0) < tiny, 0, new_rr0 / rr0)
        u_next = r + beta * q
        p_next = u_next + beta * (q + beta * p)
        # full restart on refutation: shadow vector and recursion vectors
        # reset to the true residual
        r0 = jnp.where(refuted, r, r0)
        new_rr0 = jnp.where(refuted, rr, new_rr0)
        u = jnp.where(refuted, r, u_next)
        p = jnp.where(refuted, r, p_next)
        q = jnp.where(refuted, jnp.zeros_like(q), q)
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(rr))
        return x, r, r0, p, u, q, new_rr0, floor_rr, k + 1, status, trace

    inf = jnp.asarray(jnp.inf, rr.dtype)
    carry = (
        x0,
        r,
        r0,
        r,
        r,
        jnp.zeros_like(r),
        rr0,
        inf,
        jnp.int32(0),
        jnp.int32(RUNNING),
        trace,
    )
    x, r, _, _, _, _, _, _, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)

    def _true_rr():
        r_t = b - matvec(x)
        return dot(r_t, r_t)

    rr = jax.lax.cond(status == SolverStatus.SUCCESS, lambda: dot(r, r), _true_rr)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
