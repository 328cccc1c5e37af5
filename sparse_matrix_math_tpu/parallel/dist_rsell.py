"""Distributed R-SELL — the zero-locality fast path over the row mesh.

parallel/dist_wsell.py distributes the general-pattern W-SELL kernel but
requires the neighbor-window (banded) halo property; long-range patterns
previously fell back to ``distribute_csr(mode="allgather")`` whose local
kernel is the slow XLA gather+segment-sum.  This module closes that
gap: the routed multi-pass chain (formats/rsell.py, the kernel built
for exactly those patterns) running INSIDE ``shard_map``:

* rows partition into per-device blocks (multiples of the 1024-row
  slab); every shard builds its OWN routed chain over its row block
  with FULL-width columns (B, P*B) — routing is a per-row-block
  transformation, so no cross-shard layout coupling exists;
* the communication is one ``all_gather`` of x per SpMV (for a
  zero-locality pattern every device genuinely reads everywhere — the
  same volume DistCSR's allgather mode pays, but the local compute is
  the Pallas chain instead of the XLA serial gather);
* one GLOBAL mixed-radix plan (and leaf width) is pinned for all
  shards, so every chain has the same pass count; per-pass planes pad
  to the shard maximum and stack (P, ...) — pad vregs carry vals=0 and
  contribute nothing.

Reference analogue: the TBB row-parallel SpMV
(include/sparse_matrix_math.h:1493-1497) is pattern-agnostic; this is
its scale-out equivalent for the pattern class where neither DIA nor
W-SELL shards apply.
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

from ..formats.csr import CSRMatrix, _csr_from_sorted_host
from ..formats.rsell import _plan_digits, routed_from_csr
from ..formats.wsell import SLAB, WSellMatrix, _round_up, chunk_for
from ..solvers.types import SolveResult, resolve_max_iterations
from .dist import _CORES, _psum_dot, distribute_vector
from .dist_wsell import _mesh_interpret
from .mesh import ROW_AXIS, make_mesh, resolve_mesh, put_sharded

__all__ = [
    "DistRouted", "distribute_routed", "dist_routed_spmv",
    "dist_routed_solve",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistRouted:
    """Row-block-partitioned routed (R-SELL) matrix.

    ``passes`` holds per-pass stacked planes (vals, meta, base) of shape
    (P, Vmax_i*8, 128) / (P, Vmax_i); ``final_*`` the stacked final
    W-SELL planes.  Static chain geometry (per-pass x_rows, window_f,
    final slab/x_rows counts) is shared by construction.
    """

    passes: Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], ...]
    final_vals: jnp.ndarray   # (P, V*8, 128)
    final_meta: jnp.ndarray   # (P, V*8, 128) int32
    final_base: jnp.ndarray   # (P, V) int32
    final_slab: jnp.ndarray   # (P, V) int32
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    pass_x_rows: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True)
    )
    window_f: int = dataclasses.field(metadata=dict(static=True))
    final_n_slabs: int = dataclasses.field(metadata=dict(static=True))
    final_x_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    slot_ratio: float = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    # forced-uniform final-pass bounded-reduction width (formats/wsell.py)
    final_nway: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return int(self.final_vals.shape[0])

    @property
    def padded_rows(self) -> int:
        return self.n_shards * self.block_rows

    @property
    def dtype(self):
        return self.final_vals.dtype


def distribute_routed(
    csr: CSRMatrix,
    mesh: Optional[jax.sharding.Mesh] = None,
    *,
    axis: str = ROW_AXIS,
    window_f: int = 16,
    max_slot_ratio: float = 16.0,
) -> DistRouted:
    """Partition a CSR matrix into per-shard routed chains over ``mesh``.

    Pattern-agnostic (no halo precondition); the padding cap applies to
    the GLOBAL slot total like distribute_wsell's."""
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.shape[axis]
    n_rows, n_cols = csr.shape
    if n_rows != n_cols:
        raise ValueError(
            f"distribute_routed supports square systems only, got {csr.shape}"
        )
    block = max(_round_up(int(math.ceil(n_rows / n_dev)), SLAB), SLAB)
    padded_cols = n_dev * block  # == the all_gathered x length

    r = np.asarray(csr.row_ids, dtype=np.int64)
    c = np.asarray(csr.indices, dtype=np.int64)
    v = np.asarray(csr.data)

    # one global chain plan: same leaf width and mixed-radix digits for
    # every shard => same pass count, stackable planes
    n_slabs_local = block // SLAB
    span = 8 * window_f * 128
    per_slab = max(csr.nnz / max(n_rows // SLAB, 1), 1.0)
    leaf_slabs = min(
        max(int(0.6 * span / (per_slab * 1.35)), 1), n_slabs_local
    )
    n_leaves = -(-n_slabs_local // leaf_slabs)
    digits = tuple(_plan_digits(
        padded_cols, max(csr.nnz // n_dev, 1), n_leaves, window_f
    ))

    shard_of = r // block
    locals_ = []
    for d in range(n_dev):
        sel = shard_of == d
        local = _csr_from_sorted_host(
            r[sel] - d * block, c[sel], v[sel], (block, padded_cols)
        )
        locals_.append(routed_from_csr(
            local, window_f=window_f, max_slot_ratio=float("inf"),
            leaf_slabs=leaf_slabs, _digits=digits,
            # one kernel compilation serves every shard: force a uniform
            # final-pass nway (per-shard auto-bail would diverge)
            final_nway=4, _final_nway_min_gain=0.0,
        ))

    k = len(locals_[0].passes)
    assert all(len(m.passes) == k for m in locals_), \
        "global digit plan must give every shard the same pass count"
    total_slots = sum(
        sum(p.out_len for p in m.passes) + m.final.n_vregs * SLAB
        for m in locals_
    )
    global_ratio = total_slots / max(csr.nnz, 1)
    if global_ratio > max_slot_ratio:
        raise ValueError(
            f"R-SELL routing pads too high for this pattern: "
            f"{global_ratio:.1f} slots/nnz (> {max_slot_ratio})"
        )

    def shard(arr_np, dims):
        return put_sharded(arr_np, mesh, P(axis, *([None] * dims)))

    def pad_stack(arrs, vmax, pad_value):
        outs = []
        for a in arrs:
            a = np.asarray(a)
            pad = vmax - (a.shape[0] if a.ndim == 1 else a.shape[0] // 8)
            if a.ndim == 1:
                a = np.concatenate([a, np.full(pad, pad_value, a.dtype)])
            else:
                a = np.concatenate(
                    [a, np.full((pad * 8, a.shape[1]), pad_value, a.dtype)]
                )
            outs.append(a)
        st = np.stack(outs)
        return shard(st, st.ndim - 1)

    # per-pass stacks; x_rows of pass i+1 covers the PADDED pass-i output
    stacked = []
    pass_x_rows = []
    table_rows = _round_up(padded_cols // 128, 8 * window_f)
    wrows = 8 * window_f
    for i in range(k):
        pass_x_rows.append(int(table_rows))
        # pad to a whole number of kernel chunks so the grid stays valid
        vmax = max(m.passes[i].n_vregs for m in locals_)
        vmax = _round_up(vmax, chunk_for(vmax, window_f))
        stacked.append((
            pad_stack([m.passes[i].vals for m in locals_], vmax, 0),
            pad_stack([m.passes[i].meta for m in locals_], vmax, 0),
            pad_stack([m.passes[i].base for m in locals_], vmax, 0),
        ))
        table_rows = _round_up(vmax * 8, wrows)

    fmax = max(m.final.n_vregs for m in locals_)
    fmax = _round_up(fmax, chunk_for(fmax, window_f))
    final_n_slabs = locals_[0].final.n_slabs
    final_x_rows = int(table_rows)

    return DistRouted(
        passes=tuple(stacked),
        final_vals=pad_stack([m.final.vals for m in locals_], fmax, 0),
        final_meta=pad_stack([m.final.meta for m in locals_], fmax, 0),
        final_base=pad_stack([m.final.base for m in locals_], fmax, 0),
        final_slab=pad_stack(
            [m.final.slab for m in locals_], fmax, final_n_slabs - 1
        ),
        shape=(int(n_rows), int(n_cols)),
        block_rows=int(block),
        pass_x_rows=tuple(pass_x_rows),
        window_f=int(window_f),
        final_n_slabs=int(final_n_slabs),
        final_x_rows=final_x_rows,
        nnz=csr.nnz,
        slot_ratio=float(global_ratio),
        axis=axis,
        final_nway=4,
    )


def _local_routed_spmv(
    passes, fvals, fmeta, fbase, fslab, x_local, *,
    axis: str, block_rows: int, pass_x_rows, window_f: int,
    final_n_slabs: int, final_x_rows: int, ratio, interpret: bool,
    final_nway: int = 1,
):
    """Per-shard body: all_gather x, run the chain, final W-SELL."""
    from ..ops.pallas_rsell import stream_gather
    from ..ops.pallas_wsell import wsell_spmv

    t = jax.lax.all_gather(x_local, axis, tiled=True)
    for (vals, meta, base), x_rows in zip(passes, pass_x_rows):
        t = stream_gather(
            base, meta, vals, t,
            x_rows=x_rows, window_f=window_f, interpret=interpret,
        )
    local = WSellMatrix(
        vals=fvals, meta=fmeta, base=fbase, slab=fslab,
        shape=(block_rows, t.shape[0]),
        nnz=0, n_slabs=final_n_slabs, x_rows=final_x_rows,
        slot_ratio=ratio, window_f=window_f, nway=final_nway,
    )
    return wsell_spmv(local, t, interpret=interpret)


def dist_routed_spmv(a: DistRouted, x: jnp.ndarray, mesh: jax.sharding.Mesh):
    """y = A @ x with row-sharded routed A and padded sharded x."""
    fn = _dist_routed_spmv_jit(
        mesh, a.axis, a.block_rows, a.pass_x_rows, a.window_f,
        a.final_n_slabs, a.final_x_rows, a.slot_ratio, len(a.passes),
        a.final_nway,
    )
    return fn(
        a.passes, a.final_vals, a.final_meta, a.final_base, a.final_slab, x
    )


@lru_cache(maxsize=None)
def _dist_routed_spmv_jit(
    mesh, axis, block_rows, pass_x_rows, window_f,
    final_n_slabs, final_x_rows, ratio, n_passes: int, final_nway: int = 1,
):
    interpret = _mesh_interpret(mesh)

    def inner(passes, fvals, fmeta, fbase, fslab, x_local):
        return _local_routed_spmv(
            tuple((v[0], m[0], b[0]) for v, m, b in passes),
            fvals[0], fmeta[0], fbase[0], fslab[0], x_local,
            axis=axis, block_rows=block_rows, pass_x_rows=pass_x_rows,
            window_f=window_f, final_n_slabs=final_n_slabs,
            final_x_rows=final_x_rows, ratio=ratio, interpret=interpret,
            final_nway=final_nway,
        )

    in_specs = (
        tuple((P(axis, None, None), P(axis, None, None), P(axis, None))
              for _ in range(n_passes)),
        P(axis, None, None), P(axis, None, None),
        P(axis, None), P(axis, None), P(axis),
    )
    mapped = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def dist_routed_solve(
    a: DistRouted,
    b,
    x0=None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    solver: str = "bicgstab",
    mesh: Optional[jax.sharding.Mesh] = None,
    record_residuals: bool = False,
    restart: int = 32,
) -> SolveResult:
    """Distributed Krylov solve on the routed zero-locality fast path
    (same cores as dist_solve; psum dots, all_gather halo)."""
    if solver not in ("cg", "bicg_symmetric", "cgs", "bicgstab", "gmres"):
        raise ValueError(
            "dist_routed_solve supports cg/bicg_symmetric/cgs/bicgstab/"
            f"gmres, got {solver!r}"
        )
    mesh = resolve_mesh(
        mesh, a.final_vals, n_shards=a.n_shards, axis=a.axis
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
    gmres_m = min(max(int(restart), 1), a.shape[0])
    fn = _dist_routed_solve_jit(
        mesh, a.axis, a.block_rows, a.pass_x_rows, a.window_f,
        a.final_n_slabs, a.final_x_rows, a.slot_ratio, len(a.passes),
        solver, maxiter, bool(record_residuals), gmres_m, a.final_nway,
    )
    return fn(
        a.passes, a.final_vals, a.final_meta, a.final_base, a.final_slab,
        b_arr, x0_arr, eps,
    )


@lru_cache(maxsize=None)
def _dist_routed_solve_jit(
    mesh, axis, block_rows, pass_x_rows, window_f,
    final_n_slabs, final_x_rows, ratio, n_passes: int,
    solver: str, maxiter: int, record: bool, gmres_m: int = 32,
    final_nway: int = 1,
):
    core = _CORES[solver]
    interpret = _mesh_interpret(mesh)

    def inner(passes, fvals, fmeta, fbase, fslab, b_local, x0_local, eps):
        local_passes = tuple((v[0], m[0], b[0]) for v, m, b in passes)
        arrs = (fvals[0], fmeta[0], fbase[0], fslab[0])

        def matvec(v):
            return _local_routed_spmv(
                local_passes, *arrs, v,
                axis=axis, block_rows=block_rows, pass_x_rows=pass_x_rows,
                window_f=window_f, final_n_slabs=final_n_slabs,
                final_x_rows=final_x_rows, ratio=ratio, interpret=interpret,
                final_nway=final_nway,
            )

        dotfn = _psum_dot(axis)
        if solver == "bicgstab":
            return core(
                matvec, lambda v: v, dotfn, b_local, x0_local, eps,
                maxiter, record,
            )
        if solver == "gmres":
            return core(
                matvec, lambda v: v, dotfn,
                lambda V, w: jax.lax.psum(V @ w, axis),
                b_local, x0_local, eps, gmres_m, maxiter, record,
            )
        return core(matvec, dotfn, b_local, x0_local, eps, maxiter, record)

    in_specs = (
        tuple((P(axis, None, None), P(axis, None, None), P(axis, None))
              for _ in range(n_passes)),
        P(axis, None, None), P(axis, None, None),
        P(axis, None), P(axis, None),
        P(axis), P(axis), P(),
    )
    out_specs = SolveResult(
        x=P(axis),
        status=P(),
        iterations=P(),
        residual_norm=P(),
        residual_trace=P() if record else None,
        # cg/pcg/bicgstab/bicg_symmetric/cgs cores report the
        # precision-floor latch (solvers/types.py:floor_hit); the other
        # cores leave it None
        floor_hit=P() if solver in (
            "cg", "bicgstab", "bicg_symmetric", "cgs"
        ) else None,
    )
    mapped = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)
