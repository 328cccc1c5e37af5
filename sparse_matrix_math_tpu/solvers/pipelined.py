"""Pipelined Conjugate Gradient — one fused reduction per iteration.

Communication-avoiding CG variant (Ghysels & Vanroose, "Hiding global
synchronization latency in the preconditioned Conjugate Gradient
algorithm", 2014 — see PAPERS.md).  Standard CG needs two dependent dot
products per iteration (two psums on a mesh); the pipelined recurrence
rearranges so both reductions — gamma = (r, r) and delta = (w, r) — are
available simultaneously and merge into ONE collective, with the SpMV
(q = A w) overlappable with the reduction.  No reference equivalent.

Trade-offs: one extra SpMV-sized vector triple (w, z, s) in the carry and
weaker rounding behavior than textbook CG (residual drift) — the
standard pipelined-CG caveat.  Measured consequence (round 2): at the
2M-row f32 benchmark the drift stalls convergence before 1e-4 where
plain cg converges in 2038 iterations — pipelined CG is a DISTRIBUTED
tool (latency-bound pods, f64 or looser tolerances), not a single-chip
f32 replacement; use plain cg when single-chip.

    r0 = b - A x0;  w0 = A r0
    loop i:
      gamma = (r, r);  delta = (w, r)        # ONE fused reduction
      q = A w                                 # overlaps the reduction
      beta  = 0 (i=0) else gamma/gamma_prev
      alpha = gamma/delta (i=0) else gamma / (delta - beta * gamma / alpha_prev)
      z = q + beta z;  s = w + beta s;  p = r + beta p
      x += alpha p;  r -= alpha s;  w -= alpha z
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from .types import RUNNING, SolveResult, SolverStatus, resolve_max_iterations

__all__ = ["cg_pipelined", "cg_pipelined_core"]


def _dot2_local(u1, v1, u2, v2):
    """Two dots, single-device: XLA fuses the reductions."""
    return jnp.dot(u1, v1, preferred_element_type=u1.dtype), jnp.dot(
        u2, v2, preferred_element_type=u2.dtype
    )


def cg_pipelined(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve SPD ``a @ x = b`` with pipelined CG."""
    a = as_operator(a)
    n = b.shape[0]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    return _pipelined_loop(a, b, x0, eps, maxiter, record_residuals)


@partial(jax.jit, static_argnums=(4, 5))
def _pipelined_loop(a, b, x0, eps, maxiter: int, record: bool) -> SolveResult:
    return cg_pipelined_core(
        matvec_fn(a), _dot2_local, b, x0, eps, maxiter, record
    )


def cg_pipelined_core(
    matvec, dot2fn, b, x0, eps, maxiter: int, record: bool
) -> SolveResult:
    """Algorithm core; ``dot2fn(u1, v1, u2, v2) -> (d1, d2)`` computes both
    inner products — the distributed layer supplies a single-psum fused
    implementation."""
    eps2 = eps * eps
    dtype = b.dtype

    r = b - matvec(x0)
    w = matvec(r)
    gamma0, _ = dot2fn(r, r, w, r)
    trace = (
        jnp.full((maxiter + 1,), jnp.nan, dtype).at[0].set(jnp.sqrt(gamma0))
        if record
        else None
    )

    zero = jnp.zeros_like(b)
    one = jnp.asarray(1.0, dtype)

    def cond(carry):
        (_, _, _, _, _, _, _, _, k, status, _) = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, w, p, s, z, gamma_prev, alpha_prev, k, status, trace = carry
        gamma, delta = dot2fn(r, r, w, r)  # ONE fused reduction
        q = matvec(w)                       # overlappable SpMV
        first = k == 0
        beta = jnp.where(first, 0.0, gamma / gamma_prev).astype(dtype)
        denom = jnp.where(
            first, delta, delta - beta * gamma / alpha_prev
        )
        alpha = (gamma / denom).astype(dtype)
        z = q + beta * z
        s = w + beta * s
        p = r + beta * p
        x = x + alpha * p
        r = r - alpha * s
        w = w - alpha * z
        diverged = ~jnp.isfinite(gamma)
        converged = gamma < eps2  # gamma is LAST iteration's ||r||^2
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(converged, SolverStatus.SUCCESS, RUNNING),
        ).astype(jnp.int32)
        if trace is not None:
            trace = trace.at[k + 1].set(jnp.sqrt(gamma))
        return x, r, w, p, s, z, gamma, alpha, k + 1, status, trace

    init_status = jnp.where(gamma0 < eps2, SolverStatus.SUCCESS, RUNNING).astype(
        jnp.int32
    )
    carry = (
        x0, r, w, zero, zero, zero,
        jnp.asarray(1.0, dtype), one, jnp.int32(0), init_status, trace,
    )
    x, r, _, _, _, _, _, _, k, status, trace = jax.lax.while_loop(
        cond, body, carry
    )
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)
    rr, _ = dot2fn(r, r, r, r)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
