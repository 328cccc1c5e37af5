"""Distributed emulated-f64: the 1e-8 contract across a device mesh.

Single-chip, the f64 accuracy bar (reference templated ``double``,
include/sparse_matrix_math.h:2316; 1e-8 tolerances
test/include/test_common.h:30-38) is carried by double-word f32
(ops/df32.py) and made cheap by iterative refinement
(solvers/ir_df64.py).  This module scales both across the 1-D row mesh:

* ``DistDfDia`` row-partitions the (hi, lo) diagonal planes exactly like
  the f32 ``DistDIA`` (parallel/dist_dia.py) — every shard owns a
  contiguous row block; the halo is the O(B) neighbor-window ppermute.
  The double-word SpMV ships BOTH x words in the same two ppermutes
  (stacked (2, B) payloads — collective COUNT identical to f32, volume
  2x), and splits interior/boundary terms so XLA overlaps the interior
  double-word FMA chain with the in-flight halo.
* Double-word reductions stay exact across shards: a plain f32 ``psum``
  of per-shard partials would re-introduce 2^-24 error exactly where the
  emulation spends its effort.  Instead each shard computes its local
  compensated (hi, lo) partial (``df_dot``'s pairwise tree), the P pairs
  are ``all_gather``-ed (P tiny), and every shard tree-sums them in
  double-word — bitwise-identical on every shard, error ~log2(n)*2^-47.
* ``dist_cg_ir_df64`` / ``dist_bicgstab_ir_df64`` run the SAME
  refinement loop as the single-chip solvers (solvers/ir_df64.py:
  ``ir_df_core`` — the outer df true residual judges convergence, the
  inner f32 correction solves use the overlapped f32 stencil SpMV and
  psum dots), inside one ``shard_map``-ed jit: zero host syncs, the
  collective pattern of a distributed f32 CG plus one df SpMV + one
  (2,)-scalar all_gather per refinement round.

The reference has no distributed story at all (SURVEY §2.3: TBB shared
memory only); this is the blueprint's "f64 contract at scale" axis.
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

from ..ops.df32 import (
    DfDiaMatrix,
    _df_pairwise_reduce,
    _fast_two_sum,
    df_add,
    df_from_host,
    df_norm2,
    df_sub,
    two_prod,
)
from ..solvers.df64 import DfSolveResult
from ..solvers.ir_df64 import ir_df_core
from ..solvers.types import resolve_max_iterations
from .dist import _psum_dot
from .dist_dia import _local_dia_spmv
from .mesh import ROW_AXIS, gather_to_host, make_mesh, resolve_mesh, put_sharded

__all__ = [
    "DistDfDia",
    "distribute_df_dia",
    "dist_df_dia_spmv",
    "dist_cg_ir_df64",
    "dist_bicgstab_ir_df64",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistDfDia:
    """Row-block-partitioned double-word DIA matrix.

    ``diags_hi``/``diags_lo`` are (P, ndiags, B) shard-major row blocks
    of each diagonal's (hi, lo) planes (rows beyond n zero-padded), the
    leading axis sharded over the 1-D row mesh — the same layout
    contract as ``DistDIA`` with the value planes doubled.
    """

    diags_hi: jnp.ndarray
    diags_lo: jnp.ndarray
    offsets: Tuple[int, ...] = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return int(self.diags_hi.shape[0])

    @property
    def padded_rows(self) -> int:
        return self.n_shards * self.block_rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def distribute_df_dia(
    dfa: DfDiaMatrix,
    mesh: Optional[jax.sharding.Mesh] = None,
    *,
    axis: str = ROW_AXIS,
) -> DistDfDia:
    """Partition a DfDiaMatrix into equal row blocks over ``mesh``
    (same banded precondition as distribute_dia: max |offset| <= B)."""
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.shape[axis]
    n_rows, n_cols = dfa.shape
    if n_rows != n_cols:
        raise ValueError(
            f"distribute_df_dia supports square systems only, got {dfa.shape}"
        )
    block = max(_round_up(int(math.ceil(n_rows / n_dev)), 8), 8)
    span = max(max(abs(o) for o in dfa.offsets), 0) if dfa.offsets else 0
    if span > block:
        raise ValueError(
            f"diagonal offset {span} exceeds the row block {block}; "
            "the neighbor-window halo cannot cover it"
        )

    def blockify(d):
        d = np.asarray(d)
        d = np.pad(d, ((0, 0), (0, n_dev * block - n_rows)))
        return d.reshape(d.shape[0], n_dev, block).transpose(1, 0, 2)

    return DistDfDia(
        diags_hi=put_sharded(blockify(dfa.diags_hi), mesh, P(axis, None, None)),
        diags_lo=put_sharded(blockify(dfa.diags_lo), mesh, P(axis, None, None)),
        offsets=tuple(int(o) for o in dfa.offsets),
        shape=(int(n_rows), int(n_cols)),
        block_rows=int(block),
        nnz=dfa.nnz,
        axis=axis,
    )


def _local_df_dia_spmv(
    dhi, dlo, xh, xl, *, offsets, axis: str, block_rows: int
):
    """Per-shard double-word stencil SpMV with interior/boundary overlap.

    Mirrors parallel/dist_dia.py:_local_dia_spmv with double-word
    products: per diagonal, ``two_prod`` of the hi parts plus the f32
    cross terms, accumulated in double-word; interior (own-block reads)
    and boundary (halo reads) accumulate separately so the interior
    chain carries no dependency on the in-flight ppermutes.
    """
    n_dev = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    both = jnp.stack([xh, xl])  # one payload: both words per direction
    left = jax.lax.ppermute(both, axis, fwd)
    right = jax.lax.ppermute(both, axis, bwd)

    B = block_rows
    i = jnp.arange(B)
    zero = jnp.zeros((B,), jnp.float32)
    y_int = (zero, zero)
    y_bnd = (zero, zero)

    def acc(y, a_hi, a_lo, wh, wl):
        p, e = two_prod(a_hi, wh)
        e = e + (a_hi * wl + a_lo * wh)
        return df_add(y, _fast_two_sum(p, e))

    for d, off in enumerate(offsets):
        a_hi, a_lo = dhi[d], dlo[d]
        inside = (i + off >= 0) & (i + off < B)
        wh = jnp.where(inside, jnp.roll(xh, -off) if off else xh, zero)
        wl = jnp.where(inside, jnp.roll(xl, -off) if off else xl, zero)
        y_int = acc(y_int, a_hi, a_lo, wh, wl)
        if off < 0:
            m = i + off < 0
            y_bnd = acc(
                y_bnd, jnp.where(m, a_hi, zero), jnp.where(m, a_lo, zero),
                jnp.where(m, jnp.roll(left[0], -off), zero),
                jnp.where(m, jnp.roll(left[1], -off), zero),
            )
        elif off > 0:
            m = i + off >= B
            y_bnd = acc(
                y_bnd, jnp.where(m, a_hi, zero), jnp.where(m, a_lo, zero),
                jnp.where(m, jnp.roll(right[0], -off), zero),
                jnp.where(m, jnp.roll(right[1], -off), zero),
            )
    return df_add(y_int, y_bnd)


def _df_allreduce(s, axis: str):
    """Exact double-word all-reduce of a per-shard (hi, lo) scalar pair:
    all_gather the P pairs, tree-sum them in double-word on every shard
    (bitwise-identical result everywhere).  A plain psum would round the
    cross-shard sum back to 2^-24."""
    parts = jax.lax.all_gather(jnp.stack([s[0], s[1]]), axis)  # (P, 2)
    return _df_pairwise_reduce(parts[:, 0], parts[:, 1])


def dist_df_dia_spmv(a: DistDfDia, x_df, mesh: jax.sharding.Mesh):
    """y = A @ x, double-word in and out, over the row mesh (x_df is a
    sharded padded (hi, lo) pair)."""
    fn = _dist_df_spmv_jit(mesh, a.axis, a.block_rows, a.offsets)
    return fn(a.diags_hi, a.diags_lo, x_df[0], x_df[1])


@lru_cache(maxsize=None)
def _dist_df_spmv_jit(mesh, axis: str, block_rows: int, offsets):
    def inner(dhi, dlo, xh, xl):
        return _local_df_dia_spmv(
            dhi[0], dlo[0], xh, xl,
            offsets=offsets, axis=axis, block_rows=block_rows,
        )

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    return jax.jit(mapped)


def _distribute_df_vector(v, a: DistDfDia, mesh) -> Tuple:
    """Host f64 (or (hi, lo) pair) -> padded sharded (hi, lo) pair."""
    if isinstance(v, tuple) and len(v) == 2:
        hi, lo = np.asarray(v[0], np.float32), np.asarray(v[1], np.float32)
    else:
        v = np.asarray(v, np.float64)
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
    pad = a.padded_rows - hi.shape[0]
    if pad:
        hi = np.concatenate([hi, np.zeros(pad, np.float32)])
        lo = np.concatenate([lo, np.zeros(pad, np.float32)])
    return (
        put_sharded(hi, mesh, P(a.axis)),
        put_sharded(lo, mesh, P(a.axis)),
    )


def _dist_ir_df64(
    inner_kind: str,
    a: DistDfDia,
    b,
    x0=None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    inner_rho: float = 1e-2,
    max_outer: int = 60,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> DfSolveResult:
    mesh = resolve_mesh(
        mesh, a.diags_hi, n_shards=a.n_shards, axis=a.axis
    )
    if not float(epsilon) ** 2 > 0.0 or float(epsilon) < 2e-19:
        raise ValueError(
            "epsilon must satisfy eps^2 > f32 tiny (eps >= ~2e-19); "
            f"got {epsilon!r}"
        )
    b_df = _distribute_df_vector(b, a, mesh)
    x0_df = (
        (jnp.zeros_like(b_df[0]), jnp.zeros_like(b_df[1]))
        if x0 is None
        else _distribute_df_vector(x0, a, mesh)
    )
    maxiter = resolve_max_iterations(max_iterations, a.shape[0])
    fn = _dist_ir_jit(
        mesh, a.axis, a.block_rows, a.offsets, maxiter, int(max_outer),
        inner_kind,
    )
    x_hi, x_lo, rn2, total, outer, status = fn(
        a.diags_hi, a.diags_lo, b_df[0], b_df[1], x0_df[0], x0_df[1],
        jnp.float32(float(epsilon) ** 2), jnp.float32(float(inner_rho) ** 2),
    )
    n = a.shape[0]
    return DfSolveResult(
        x_hi=jnp.asarray(gather_to_host(x_hi)[:n]),
        x_lo=jnp.asarray(gather_to_host(x_lo)[:n]),
        status=status, iterations=total, residual_norm2=rn2,
        outer_rounds=outer,
    )


@lru_cache(maxsize=None)
def _dist_ir_jit(
    mesh, axis: str, block_rows: int, offsets,
    maxiter: int, max_outer: int, inner_kind: str,
):
    def inner(dhi, dlo, bh, bl, xh, xl, eps2, rho2):
        dhi_l, dlo_l = dhi[0], dlo[0]
        dotfn = _psum_dot(axis)

        def matvec32(v):
            return _local_dia_spmv(
                dhi_l, v, offsets=offsets, axis=axis, block_rows=block_rows
            )

        def true_residual(x_df):
            ax = _local_df_dia_spmv(
                dhi_l, dlo_l, x_df[0], x_df[1],
                offsets=offsets, axis=axis, block_rows=block_rows,
            )
            r = df_sub((bh, bl), ax)
            rn2 = _df_allreduce(df_norm2(r), axis)
            return r, rn2[0]

        ident = lambda v: v  # noqa: E731
        return ir_df_core(
            true_residual, matvec32, None, dotfn, ident, ident,
            (bh, bl), (xh, xl), eps2, rho2, maxiter, max_outer, inner_kind,
        )

    # check_vma=False: the scalar outputs (rn2, status, counters) derive
    # from all_gather-ed (hi, lo) pairs tree-summed IDENTICALLY on every
    # shard (_df_allreduce) — replicated by construction, but the static
    # inference only tracks psum-derived replication
    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(axis, None, None), P(axis, None, None),
            P(axis), P(axis), P(axis), P(axis), P(), P(),
        ),
        out_specs=(P(axis), P(axis), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def dist_cg_ir_df64(a: DistDfDia, b, x0=None, max_iterations: int = -1,
                    epsilon: float = 1e-8, *, inner_rho: float = 1e-2,
                    max_outer: int = 60,
                    mesh: Optional[jax.sharding.Mesh] = None) -> DfSolveResult:
    """Distributed :func:`~sparse_matrix_math_tpu.cg_ir_df64` (SPD
    systems): f32 inner CG over the row mesh (overlapped stencil SpMV +
    psum dots) refined by the exact double-word true residual.  Same
    accuracy contract as the single-chip solver at any shard count."""
    return _dist_ir_df64(
        "cg", a, b, x0, max_iterations, epsilon,
        inner_rho=inner_rho, max_outer=max_outer, mesh=mesh,
    )


def dist_bicgstab_ir_df64(a: DistDfDia, b, x0=None,
                          max_iterations: int = -1,
                          epsilon: float = 1e-8, *,
                          inner_rho: float = 1e-2, max_outer: int = 60,
                          mesh: Optional[jax.sharding.Mesh] = None,
                          ) -> DfSolveResult:
    """Distributed :func:`~sparse_matrix_math_tpu.bicgstab_ir_df64`
    (general square systems) — the nonsymmetric refinement over the row
    mesh."""
    return _dist_ir_df64(
        "bicgstab", a, b, x0, max_iterations, epsilon,
        inner_rho=inner_rho, max_outer=max_outer, mesh=mesh,
    )
