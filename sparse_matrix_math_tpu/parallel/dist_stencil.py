"""Distributed matrix-free grid stencils — zero matrix traffic on a mesh.

The multi-chip twin of formats/stencil.py:GridStencilMatrix, mirroring
parallel/dist_dia.py's row partition and O(B) neighbor-halo exchange:
each shard owns a contiguous block of the flattened grid vector and NO
matrix data at all (the coefficients are a replicated (npoints,) array;
the boundary-cut pattern is recomputed per shard from global index
arithmetic — iota + integer div/mod, zero memory traffic).

The local apply keeps dist_dia's interior/boundary overlap split: the
interior term reads only the shard's own block, so XLA schedules it
while the two ppermutes are in flight.  Collective volume per SpMV is
the same 2 x B as the DIA path; the saving is the per-shard
(npoints, B) diagonal-block read the DIA path streams every matvec.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..formats.stencil import GridStencilMatrix, _strides
from ..solvers.types import SolveResult, resolve_max_iterations
from .dist import _CORES, _psum_dot, distribute_vector
from .mesh import ROW_AXIS, make_mesh, put_sharded, resolve_mesh

__all__ = [
    "DistStencil", "distribute_stencil", "dist_stencil_spmv",
    "dist_stencil_solve",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistStencil:
    """Row-block-partitioned grid stencil (no per-shard matrix data).

    Field conventions (block_rows/padded_rows/axis/shape) duck-type
    DistDIA's so ``distribute_vector``/``collect`` work unchanged.
    """

    coeffs: jnp.ndarray  # (npoints,) — replicated
    doffs: Tuple[Tuple[int, ...], ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    dims: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def padded_rows(self) -> int:
        return self.n_shards * self.block_rows

    @property
    def dtype(self):
        return self.coeffs.dtype


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flat_offsets(doffs, dims):
    s = _strides(dims)
    return tuple(
        sum(c * st for c, st in zip(off, s)) for off in doffs
    )


def distribute_stencil(
    st: GridStencilMatrix,
    mesh: Optional[jax.sharding.Mesh] = None,
    *,
    axis: str = ROW_AXIS,
) -> DistStencil:
    """Row-partition a grid stencil over ``mesh``.

    Requires every |flat offset| <= block (the dist_dia banded
    precondition for the one-neighbor halo) — always true for practical
    grids at practical shard counts.
    """
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.shape[axis]
    n_rows, _ = st.shape
    block = max(_round_up(int(math.ceil(n_rows / n_dev)), 8), 8)
    span = max(
        (abs(o) for o in _flat_offsets(st.doffs, st.dims)), default=0
    )
    if span > block:
        raise ValueError(
            f"stencil flat offset {span} exceeds the row block {block}; "
            "use distribute_csr in allgather mode"
        )
    return DistStencil(
        # replicated over the mesh (not a bare device array) so the
        # solve-time default mesh can be derived from the operand
        # (mesh.resolve_mesh) even in matrix-free layouts
        coeffs=put_sharded(np.asarray(st.coeffs), mesh, P()),
        doffs=st.doffs,
        dims=st.dims,
        shape=st.shape,
        block_rows=int(block),
        n_shards=int(n_dev),
        nnz=int(st.nnz),
        axis=axis,
    )


def _local_stencil_spmv(
    coeffs, x_local, *, doffs, dims, axis: str, block_rows: int
):
    """Per-shard matrix-free stencil SpMV with interior/boundary overlap.

    Identical window structure to dist_dia._local_dia_spmv, but the
    per-row coefficient masks are RECOMPUTED from global index
    arithmetic instead of read from stored diagonal blocks: for stencil
    point (c, comp) at flat offset ``off``, row g contributes
    ``c * x[g + off]`` iff every grid coordinate of g stays on-grid
    after adding ``comp``.
    """
    n_dev = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    left = jax.lax.ppermute(x_local, axis, fwd)   # block d-1 arrives
    right = jax.lax.ppermute(x_local, axis, bwd)  # block d+1 arrives

    B = block_rows
    p = jax.lax.axis_index(axis)
    gi = p.astype(jnp.int32) * B + jnp.arange(B, dtype=jnp.int32)
    n_rows = 1
    for d in dims:
        n_rows *= d
    strides = _strides(dims)
    flat_offs = _flat_offsets(doffs, dims)

    dtype = jnp.result_type(coeffs.dtype, x_local.dtype)
    y_int = jnp.zeros((B,), dtype)
    y_bnd = jnp.zeros((B,), dtype)
    i = jnp.arange(B)
    zeros = jnp.zeros((B,), x_local.dtype)
    for k, (comp, off) in enumerate(zip(doffs, flat_offs)):
        # grid mask from GLOBAL coordinates (also kills the padded tail:
        # rows past n_rows decode to out-of-range coordinates on axis 0)
        mask = gi < n_rows
        for ax in range(len(dims)):
            coord = (gi // strides[ax]) % dims[ax] if ax else gi // strides[0]
            v = coord + comp[ax]
            mask = mask & (v >= 0) & (v < dims[ax])
        c = coeffs[k]
        xin = jnp.roll(x_local, -off) if off else x_local
        inside = (i + off >= 0) & (i + off < B)
        y_int = y_int + c * jnp.where(mask & inside, xin, zeros)
        if off < 0:
            xb = jnp.roll(left, -off)
            y_bnd = y_bnd + c * jnp.where(mask & (i + off < 0), xb, zeros)
        elif off > 0:
            xb = jnp.roll(right, -off)
            y_bnd = y_bnd + c * jnp.where(mask & (i + off >= B), xb, zeros)
    return y_int + y_bnd


def dist_stencil_spmv(a: DistStencil, x: jnp.ndarray, mesh: jax.sharding.Mesh):
    """y = A @ x with a row-partitioned matrix-free stencil."""
    fn = _dist_stencil_spmv_jit(
        mesh, a.axis, a.block_rows, a.doffs, a.dims
    )
    return fn(a.coeffs, x)


@lru_cache(maxsize=None)
def _dist_stencil_spmv_jit(mesh, axis: str, block_rows: int, doffs, dims):
    def inner(coeffs, x_local):
        return _local_stencil_spmv(
            coeffs, x_local, doffs=doffs, dims=dims, axis=axis,
            block_rows=block_rows,
        )

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(mapped)


def dist_stencil_solve(
    a: DistStencil,
    b,
    x0=None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    solver: str = "cg",
    mesh: Optional[jax.sharding.Mesh] = None,
    record_residuals: bool = False,
) -> SolveResult:
    """Distributed Krylov solve on the matrix-free stencil path (same
    cores and conventions as dist_dia_solve)."""
    if solver not in ("cg", "bicg_symmetric", "cgs", "bicgstab"):
        raise ValueError(
            "dist_stencil_solve supports cg/bicg_symmetric/cgs/bicgstab, "
            f"got {solver!r}"
        )
    mesh = resolve_mesh(
        mesh, a.coeffs, n_shards=a.n_shards, axis=a.axis
    )

    b_arr = np.asarray(b) if not isinstance(b, jnp.ndarray) else b
    if b_arr.shape[0] != a.padded_rows:
        b_arr = distribute_vector(b_arr, a, mesh)
    if x0 is None:
        x0_arr = jnp.zeros_like(b_arr)
    else:
        x0_arr = np.asarray(x0) if not isinstance(x0, jnp.ndarray) else x0
        if x0_arr.shape[0] != a.padded_rows:
            x0_arr = distribute_vector(x0_arr, a, mesh)

    maxiter = resolve_max_iterations(max_iterations, a.shape[0])
    eps = jnp.asarray(epsilon, dtype=b_arr.dtype)
    fn = _dist_stencil_solve_jit(
        mesh, a.axis, a.block_rows, a.doffs, a.dims, solver, maxiter,
        bool(record_residuals),
    )
    return fn(a.coeffs, b_arr, x0_arr, eps)


@lru_cache(maxsize=None)
def _dist_stencil_solve_jit(
    mesh, axis: str, block_rows: int, doffs, dims, solver: str,
    maxiter: int, record: bool,
):
    core = _CORES[solver]

    def inner(coeffs, b_local, x0_local, eps):
        def matvec(v):
            return _local_stencil_spmv(
                coeffs, v, doffs=doffs, dims=dims, axis=axis,
                block_rows=block_rows,
            )

        dotfn = _psum_dot(axis)
        if solver == "bicgstab":  # its core carries a preconditioner slot
            return core(
                matvec, lambda v: v, dotfn, b_local, x0_local, eps, maxiter,
                record,
            )
        return core(matvec, dotfn, b_local, x0_local, eps, maxiter, record)

    out_specs = SolveResult(
        x=P(axis),
        status=P(),
        iterations=P(),
        residual_norm=P(),
        residual_trace=P() if record else None,
        floor_hit=P() if solver in (
            "cg", "bicgstab", "bicg_symmetric", "cgs"
        ) else None,
    )
    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=out_specs,
    )
    return jax.jit(mapped)
