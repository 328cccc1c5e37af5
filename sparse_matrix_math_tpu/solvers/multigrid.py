"""Geometric multigrid for 2-D/3-D Poisson-class grids (5/7-point).

The reference tops out at Krylov + one-level preconditioners; on a
machine whose SpMV runs at the HBM roofline, no one-level
preconditioner can buy back its own apply cost (measured —
docs/BENCH_NOTES.md).  The operator-aware answer is multigrid: O(1)
V-cycles, each a handful of stencil applies, instead of O(sqrt(kappa))
Krylov iterations.  This module implements classical geometric MG for
the dimensionless 5-point Laplacian family that `utils.generate
.poisson_2d` produces (diag 4, neighbors -1, homogeneous Dirichlet) —
the benchmark system class:

* vectors live GRID-SHAPED ((ny, nx) or (nz, ny, nx)): every operator —
  the 2d+1-point stencil apply, per-axis linear prolongation,
  full-weighting restriction — is a few shifted adds XLA fuses into
  bandwidth-bound elementwise code.  No gather, no Pallas needed;
* smoothing: weighted Jacobi (omega = 4/5, the classical optimum for
  the model problem);
* coarse grids: rediscretised 2d+1-point operators (entries stay
  (2d, -1) in the h^2-scaled convention, so the restricted residual
  carries the standard factor-4 level scaling via R = P^T per axis
  pair);
* coarsest level: exact dense solve with a precomputed inverse;
* `PoissonMultigrid.solve` runs V-cycles in a jitted while_loop with
  the usual SolveResult statuses; `.apply(r)` is one V-cycle — a
  symmetric positive operation usable as a CG preconditioner.

Numerical contract (tests/test_multigrid.py): residual contraction
>= 4x per V-cycle on the model family, mesh-size independent.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import RUNNING, SolveResult, SolverStatus

__all__ = ["PoissonMultigrid"]

# <= this many points per side -> exact dense solve; measured 2-D
# optimum is 31 (stopping at ~44 costs more in the dense coarse matmul
# than the saved small-grid level).  3-D stops earlier: the dense
# inverse is cubic in side length.
_COARSEST = {2: 31, 3: 12}


def _stencil_apply(x: jnp.ndarray) -> jnp.ndarray:
    """y = A x for the dimensionless 2d+1-point Laplacian on a
    grid-shaped x (homogeneous Dirichlet outside the grid).  Written as
    padded shifts — one fused elementwise expression — rather than
    .at[].add updates, which lower to separate dynamic-update ops."""
    d = x.ndim
    p = jnp.pad(x, 1)
    mid = tuple(slice(1, -1) for _ in range(d))
    y = (2.0 * d) * x
    for ax in range(d):
        lo = tuple(
            slice(0, -2) if a == ax else slice(1, -1) for a in range(d)
        )
        hi = tuple(
            slice(2, None) if a == ax else slice(1, -1) for a in range(d)
        )
        y = y - p[lo] - p[hi]
    return y


def _sl(x: jnp.ndarray, axis: int, start: int, limit: int, stride: int):
    """Strided slice along one axis — a single lax.slice, NO transpose.
    (moveaxis-based transfers cost a full transpose per call; profiled
    on hardware, the V-cycle was op-bound on exactly those.)"""
    starts = [0] * x.ndim
    limits = list(x.shape)
    strides = [1] * x.ndim
    starts[axis], limits[axis], strides[axis] = start, limit, stride
    return jax.lax.slice(x, starts, limits, strides)


def _pad_axis(x: jnp.ndarray, axis: int, lo: int, hi: int):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads)


def _prolong_1d(c: jnp.ndarray, nf: int, axis: int) -> jnp.ndarray:
    """Bilinear interpolation along ``axis``: coarse node j sits at fine
    index 2j+1; even fine indices average their coarse neighbors
    (Dirichlet zeros beyond the ends).  Built transpose-free: the even
    and odd fine sequences interleave via stack+reshape."""
    nc = c.shape[axis]
    cpad = _pad_axis(c, axis, 1, 1)
    n_even = (nf + 1) // 2  # fine indices 0, 2, 4, ...
    even = 0.5 * (
        _sl(cpad, axis, 0, n_even, 1) + _sl(cpad, axis, 1, n_even + 1, 1)
    )
    odd = c if nc == n_even else _pad_axis(c, axis, 0, n_even - nc)
    pair = jnp.stack([even, odd], axis=axis + 1)
    shape = list(c.shape)
    shape[axis] = 2 * n_even
    out = pair.reshape(shape)
    return _sl(out, axis, 0, nf, 1)


def _restrict_1d(f: jnp.ndarray, nc: int, axis: int) -> jnp.ndarray:
    """Adjoint of :func:`_prolong_1d` (full weighting, level-scaling
    included): rc[j] = f[2j+1] + 0.5 f[2j] + 0.5 f[2j+2]."""
    fpad = _pad_axis(f, axis, 0, 2)
    center = _sl(f, axis, 1, 2 * nc, 2)
    left = _sl(fpad, axis, 0, 2 * nc, 2)
    right = _sl(fpad, axis, 2, 2 * nc + 2, 2)
    return center + 0.5 * (left + right)


def _coarse_dims(n: int) -> int:
    return n // 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoissonMultigrid:
    """Geometric V-cycle solver/preconditioner for `poisson_2d(nx, ny)`.

    ``coarse_inv`` is the dense inverse of the coarsest-level operator.
    The grid hierarchy is static (baked into the jitted cycle).
    """

    coarse_inv: jnp.ndarray
    dims: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    nu1: int = dataclasses.field(metadata=dict(static=True), default=2)
    nu2: int = dataclasses.field(metadata=dict(static=True), default=2)
    omega: float = dataclasses.field(metadata=dict(static=True), default=0.8)

    @classmethod
    def for_grid(
        cls, nx: int, ny: Optional[int] = None, nz: Optional[int] = None, *,
        nu1: int = 2, nu2: int = 2, omega: float = 0.8,
        dtype=jnp.float32,
    ) -> "PoissonMultigrid":
        """Build the hierarchy for an ``nx x ny`` (2-D) or
        ``nx x ny x nz`` (3-D) interior grid, matching the row-major
        node ordering of ``poisson_2d`` / ``poisson_3d``."""
        ny = nx if ny is None else ny
        if nz is None:
            dims = [(int(ny), int(nx))]
        else:
            dims = [(int(nz), int(ny), int(nx))]
        d = len(dims[0])
        coarsest = _COARSEST[d]
        # keep coarsening while the grid is large on ANY measure: the
        # per-side cap handles isotropic grids; the product cap keeps
        # anisotropic grids (e.g. 4096 x 16) from leaving a huge
        # "coarsest" level whose dense inverse would be O(n^2) memory
        while (
            min(dims[-1]) > coarsest or int(np.prod(dims[-1])) > 2048
        ) and min(dims[-1]) > 2:
            dims.append(tuple(_coarse_dims(m) for m in dims[-1]))
        cdims = dims[-1]
        # dense coarsest operator (dimensionless 2d+1-point stencil)
        n = int(np.prod(cdims))
        a = np.zeros((n, n))
        strides = [int(np.prod(cdims[k + 1:])) for k in range(d)]
        idx = np.arange(n)
        coords = [(idx // strides[k]) % cdims[k] for k in range(d)]
        a[idx, idx] = 2.0 * d
        for k in range(d):
            lo = coords[k] > 0
            a[idx[lo], idx[lo] - strides[k]] = -1.0
            hi = coords[k] < cdims[k] - 1
            a[idx[hi], idx[hi] + strides[k]] = -1.0
        inv = np.linalg.inv(a)
        return cls(
            coarse_inv=jnp.asarray(inv, dtype),
            dims=tuple(dims),
            nu1=int(nu1), nu2=int(nu2), omega=float(omega),
        )

    # -- cycle ---------------------------------------------------------------

    def _smooth(self, x, b, steps: int):
        w = self.omega / (2.0 * len(self.dims[0]))
        for _ in range(steps):
            x = x + w * (b - _stencil_apply(x))
        return x

    def _vcycle(self, b, level: int):
        """One V-cycle for A e = b from a zero initial guess."""
        if level == len(self.dims) - 1:
            flat = self.coarse_inv @ b.reshape(-1).astype(self.coarse_inv.dtype)
            return flat.reshape(b.shape).astype(b.dtype)
        x = self._smooth(jnp.zeros_like(b), b, self.nu1)
        r = b - _stencil_apply(x)
        rc = r
        for ax, m in enumerate(self.dims[level + 1]):
            rc = _restrict_1d(rc, m, ax)
        # level scaling: the dimensionless (h^2-folded) operator needs the
        # restricted residual scaled by (2h/h)^2 = 4; per-axis P^T carries
        # 2^d, so correct by 2^(2-d) (identity in 2-D, 1/2 in 3-D)
        d = len(self.dims[0])
        if d != 2:
            rc = rc * (2.0 ** (2 - d))
        ec = self._vcycle(rc, level + 1)
        up = ec
        for ax, m in enumerate(self.dims[level]):
            up = _prolong_1d(up, m, ax)
        x = x + up
        return self._smooth(x, b, self.nu2)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """One V-cycle as a linear operator z ~= A^{-1} r (flat in/out:
        usable directly as a CG preconditioner apply)."""
        return self._vcycle(r.reshape(self.dims[0]), 0).reshape(-1)

    def solve(
        self,
        b: jnp.ndarray,
        x0: Optional[jnp.ndarray] = None,
        max_iterations: int = 100,
        epsilon: float = 1e-8,
    ) -> SolveResult:
        """Stationary V-cycle iteration to ||r|| <= epsilon.

        The stationary iteration contracts ~4-10x per cycle on the
        classical vertex-centred hierarchies (ODD sides, e.g. 2^k - 1);
        on even sides the rediscretised coarse boundary geometry is
        inconsistent and the iteration can AMPLIFY — that is detected
        (residual growth beyond 100x the initial) and reported as
        DIVERGED.  For arbitrary grid sizes use the V-cycle as a CG
        preconditioner (``cg(a, b, preconditioner=mg)``), which is
        robust to the inconsistency and stays at O(10) iterations.
        """
        bg = b.reshape(self.dims[0])
        x0g = jnp.zeros_like(bg) if x0 is None else x0.reshape(self.dims[0])
        eps = jnp.asarray(epsilon, b.dtype)
        res = _mg_solve_jit(self, bg, x0g, eps, int(max_iterations))
        return dataclasses.replace(res, x=res.x.reshape(-1))


@partial(jax.jit, static_argnums=(4,))
def _mg_solve_jit(mg: PoissonMultigrid, b, x0, eps, maxiter: int) -> SolveResult:
    eps2 = eps * eps

    r0 = b - _stencil_apply(x0)
    rr0 = jnp.sum(r0 * r0)
    # amplification guard: the stationary cycle diverges on inconsistent
    # (even-side) hierarchies — catch runaway growth early
    rr_cap = 1e4 * rr0 + jnp.asarray(1.0, rr0.dtype)

    def cond(carry):
        _, _, _, k, status = carry
        return (status == RUNNING) & (k < maxiter)

    def body(carry):
        x, r, _, k, status = carry
        x = x + mg._vcycle(r, 0)
        r = b - _stencil_apply(x)
        rr = jnp.sum(r * r)
        status = jnp.where(
            ~jnp.isfinite(rr) | (rr > rr_cap),
            SolverStatus.DIVERGED,
            jnp.where(rr <= eps2, SolverStatus.SUCCESS, RUNNING),
        ).astype(jnp.int32)
        return x, r, rr, k + 1, status

    init_status = jnp.where(rr0 <= eps2, SolverStatus.SUCCESS, RUNNING).astype(
        jnp.int32
    )
    x, _, rr, k, status = jax.lax.while_loop(
        cond, body, (x0, r0, rr0, jnp.int32(0), init_status)
    )
    status = jnp.where(status == RUNNING, SolverStatus.MAX_ITERATIONS_REACHED, status)
    return SolveResult(
        x=x,
        status=status.astype(jnp.int32),
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        residual_trace=None,
    )
