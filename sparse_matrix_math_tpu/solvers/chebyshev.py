"""Chebyshev semi-iteration — the collective-minimal Krylov-type solver.

No reference equivalent (SURVEY §2.1 lists only CG/BiCG variants).  On a
distributed mesh every CG iteration needs two psum reductions; the
Chebyshev recurrence needs NONE — only the periodic convergence check
reduces.  That makes it the scaling-friendly option for pods (SURVEY §2.3:
collectives ride ICI; fewer collectives, better weak scaling), at the
cost of requiring spectrum bounds [lmin, lmax] for SPD ``A``.

Bounds default to a Lanczos extremal-eigenvalue estimate
(:func:`lanczos_extremal`, a ~k-step scan) with safety margins.

Recurrence (Saad §12.1, standard form):

    theta = (lmax + lmin)/2,  delta = (lmax - lmin)/2
    d_0 = r_0 / theta;  x_1 = x_0 + d_0
    rho_0 = delta / theta
    rho_k = 1 / (2/rho_0 - rho_{k-1})
    d_k = rho_k rho_{k-1} d_{k-1} + (2 rho_k / delta) r_k
    x_{k+1} = x_k + d_k
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.spmv import as_operator, matvec_fn
from ..ops.vector import dot
from .types import harmonize_dtypes, RUNNING, SolveResult, SolverStatus, resolve_max_iterations
from ..formats.reorder import reorder_hoisted

__all__ = [
    "chebyshev", "chebyshev_core", "lanczos_extremal", "widen_eig_bounds",
]


def widen_eig_bounds(lo: float, hi: float) -> Tuple[float, float]:
    """Sign-aware widening of interior Lanczos eigenvalue estimates.

    ``lo * 0.9`` would NARROW a slightly negative lo (near-singular SPD
    + f32 roundoff) into the spectrum; widen with sign-aware margins,
    clamp a nonpositive lo to a small positive floor (SPD spectra are
    positive), and fail loudly when the result is not a valid positive
    interval.  Shared by chebyshev(), dist_solve() and the polynomial
    preconditioner so the three sites cannot drift.
    """
    lo = lo - 0.1 * abs(lo)
    hi = hi + 0.05 * abs(hi)
    if lo <= 0.0:
        lo = 1e-8 * max(hi, 1.0)
    if hi <= lo:
        raise ValueError(
            f"estimated spectrum [{lo}, {hi}] is not positive-definite; "
            "supply eig_bounds= explicitly"
        )
    return lo, hi


def lanczos_extremal(
    a, k: int = 32, seed: int = 0, n: Optional[int] = None
) -> Tuple[float, float]:
    """Estimate (lmin, lmax) of symmetric ``a`` via k Lanczos steps.

    Returns floats (host-side; runs one small jitted scan).  Estimates are
    interior to the true spectrum — callers should widen them (chebyshev
    applies its own safety margins).  For callable (LinearOperator)
    ``a``, pass ``n`` explicitly (there is no shape to infer it from).
    """
    a = as_operator(a)
    if n is None:
        if hasattr(a, "shape"):
            n = a.shape[0]
        else:
            raise ValueError(
                "lanczos_extremal needs n= for callable operators "
                "(no shape to infer the dimension from)"
            )
    matvec = matvec_fn(a)
    dtype = getattr(a, "dtype", jnp.float32)

    v = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=dtype)
    v = v / jnp.sqrt(dot(v, v))

    def step(carry, _):
        v_prev, v_cur, beta = carry
        w = matvec(v_cur) - beta * v_prev
        alpha = dot(w, v_cur)
        w = w - alpha * v_cur
        new_beta = jnp.sqrt(dot(w, w))
        v_next = w / jnp.maximum(new_beta, jnp.asarray(1e-30, dtype))
        return (v_cur, v_next, new_beta), (alpha, new_beta)

    (_, _, _), (alphas, betas) = jax.lax.scan(
        step, (jnp.zeros_like(v), v, jnp.asarray(0.0, dtype)), None, length=k
    )
    import numpy as np

    al = np.asarray(alphas, dtype=np.float64)
    be = np.asarray(betas, dtype=np.float64)
    t = np.diag(al) + np.diag(be[:-1], 1) + np.diag(be[:-1], -1)
    eig = np.linalg.eigvalsh(t)  # k x k, host-side, full precision
    return float(eig[0]), float(eig[-1])


@reorder_hoisted
def chebyshev(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    eig_bounds: Optional[Tuple[float, float]] = None,
    check_every: int = 10,
    record_residuals: bool = False,
) -> SolveResult:
    """Solve SPD ``a @ x = b`` by Chebyshev semi-iteration.

    ``eig_bounds``: (lmin, lmax) containing the spectrum; None estimates
    them with Lanczos (+8%/-8% safety margins).  ``check_every``: residual
    norm (the only reduction) is evaluated every this many iterations.
    """
    a = as_operator(a)
    n = b.shape[0]
    b, x0 = harmonize_dtypes(a, b, x0)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    maxiter = resolve_max_iterations(max_iterations, n)
    if eig_bounds is None:
        lo, hi = lanczos_extremal(a, k=min(32, n), n=n)
        eig_bounds = widen_eig_bounds(lo, hi)
    eps = jnp.asarray(epsilon, dtype=b.dtype)
    return _chebyshev_loop(
        a, b, x0, eps, float(eig_bounds[0]), float(eig_bounds[1]),
        maxiter, int(check_every), record_residuals,
    )


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _chebyshev_loop(a, b, x0, eps, lmin, lmax, maxiter, check_every, record):
    return chebyshev_core(
        matvec_fn(a), dot, b, x0, eps, lmin, lmax, maxiter, check_every, record
    )


def chebyshev_core(
    matvec, dotfn, b, x0, eps, lmin: float, lmax: float,
    maxiter: int, check_every: int, record: bool,
) -> SolveResult:
    """Algorithm core (matvec/dotfn-parameterised like solvers/cg.py's) —
    the inner ``check_every``-step recurrence performs no reductions."""
    dtype = b.dtype
    theta = jnp.asarray((lmax + lmin) / 2.0, dtype)
    delta = jnp.asarray((lmax - lmin) / 2.0, dtype)
    eps2 = eps * eps

    r0 = b - matvec(x0)
    rr0 = dotfn(r0, r0)
    n_checks = -(-maxiter // check_every)
    trace = (
        jnp.full((n_checks + 1,), jnp.nan, dtype).at[0].set(jnp.sqrt(rr0))
        if record
        else None
    )

    def inner(_, carry):
        x, r, d, rho = carry
        # x update then fresh residual via one SpMV (no reductions)
        x = x + d
        r = b - matvec(x)
        new_rho = 1.0 / (2.0 / (delta / theta) - rho)
        d = new_rho * rho * d + (2.0 * new_rho / delta) * r
        return (x, r, d, new_rho)

    def cond(carry):
        _, _, _, _, k, status, _ = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, d, rho, k, status, trace = carry
        # honor the iteration cap exactly: the final chunk may be partial
        # (dynamic trip count — fori_loop lowers it to a while)
        steps = jnp.minimum(check_every, maxiter - k)
        (x, r, d, rho) = jax.lax.fori_loop(0, steps, inner, (x, r, d, rho))
        rr = dotfn(r, r)  # the ONLY reduction, every check_every steps
        diverged = ~jnp.isfinite(rr)
        converged = rr < eps2
        status = jnp.where(
            diverged,
            SolverStatus.DIVERGED,
            jnp.where(converged, SolverStatus.SUCCESS, RUNNING),
        ).astype(jnp.int32)
        if trace is not None:
            trace = trace.at[k // check_every + 1].set(jnp.sqrt(rr))
        return x, r, d, rho, k + steps, status, trace

    d0 = r0 / theta
    rho0 = delta / theta
    init_status = jnp.where(rr0 < eps2, SolverStatus.SUCCESS, RUNNING).astype(
        jnp.int32
    )
    carry = (x0, r0, d0, rho0, jnp.int32(0), init_status, trace)
    x, r, _, _, k, status, trace = jax.lax.while_loop(cond, body, carry)
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)
    rr = dotfn(r, r)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=trace,
    )
