"""Distributed W-SELL — the GENERAL-pattern fast path over the row mesh.

parallel/dist.py distributes CSR via gather+segment-sum (correct for any
pattern, slow on TPU); parallel/dist_dia.py distributes the stencil
kernel.  This module closes the remaining gap: the W-SELL Pallas kernel
(ops/pallas_wsell.py — the ≥10x-CPU general-pattern path) running
INSIDE ``shard_map``:

* rows partition into per-device blocks (multiples of the 1024-row
  W-SELL slab);
* the halo is the O(B) neighbor-window exchange: every shard's columns
  must fall inside [(d-1)B, (d+2)B) — the same banded precondition as
  DistCSR's halo mode.  Columns are rewritten window-local, so each
  shard's W-SELL matrix is an ordinary (B, 3B) instance whose x table
  is the ppermuted [left | own | right] window;
* per-shard W-SELL builds are padded to a common vreg count and stacked
  (P, ...) so one shard_map covers every device; dots psum as usual.

Patterns that escape the neighbor window (long-range couplings) should
use ``distribute_csr(mode="allgather")`` instead.
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
from ..formats.wsell import SLAB, WSellMatrix, _round_up, wsell_from_csr
from ..solvers.types import SolveResult, resolve_max_iterations
from .dist import _CORES, _psum_dot, distribute_vector
from .mesh import ROW_AXIS, make_mesh, resolve_mesh, put_sharded

__all__ = ["DistWSell", "distribute_wsell", "dist_wsell_spmv", "dist_wsell_solve"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistWSell:
    """Row-block-partitioned W-SELL matrix (see module docstring)."""

    vals: jnp.ndarray   # (P, V*8, 128)
    meta: jnp.ndarray   # (P, V*8, 128) int32
    base: jnp.ndarray   # (P, V) int32
    slab: jnp.ndarray   # (P, V) int32
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    block_rows: int = dataclasses.field(metadata=dict(static=True))
    n_slabs: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    slot_ratio: float = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    # uniform bounded-reduction width across shards (formats/wsell.py)
    nway: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def n_shards(self) -> int:
        return int(self.vals.shape[0])

    @property
    def padded_rows(self) -> int:
        return self.n_shards * self.block_rows

    @property
    def dtype(self):
        return self.vals.dtype


def distribute_wsell(
    csr: CSRMatrix,
    mesh: Optional[jax.sharding.Mesh] = None,
    *,
    axis: str = ROW_AXIS,
    max_slot_ratio: float = 8.0,
) -> DistWSell:
    """Partition a CSR matrix into per-shard W-SELL blocks over ``mesh``.

    Requires the neighbor-window (banded) halo property; raises
    ValueError otherwise (fall back to distribute_csr allgather mode).
    """
    mesh = mesh if mesh is not None else make_mesh()
    n_dev = mesh.shape[axis]
    n_rows, n_cols = csr.shape
    if n_rows != n_cols:
        raise ValueError(
            f"distribute_wsell supports square systems only, got {csr.shape}"
        )
    block = max(_round_up(int(math.ceil(n_rows / n_dev)), SLAB), SLAB)

    r = np.asarray(csr.row_ids, dtype=np.int64)
    c = np.asarray(csr.indices, dtype=np.int64)
    v = np.asarray(csr.data)
    shard_of = r // block
    if r.size and not bool(
        np.all((c >= (shard_of - 1) * block) & (c < (shard_of + 2) * block))
    ):
        raise ValueError(
            "matrix columns escape the neighbor window; use "
            "distribute_csr(mode='allgather') for long-range patterns"
        )

    locals_ = []
    for d in range(n_dev):
        sel = shard_of == d
        rl = r[sel] - d * block
        cl = c[sel] - (d - 1) * block  # window-local in [0, 3B)
        local = _csr_from_sorted_host(rl, cl, v[sel], (block, 3 * block))
        # per-shard caps are meaningless (boundary/empty shards hold few
        # nnz by construction) — the padding cap applies GLOBALLY below.
        # nway must be UNIFORM across shards (one kernel compilation), so
        # the per-shard auto-bail is disabled (nway_min_gain=0)
        locals_.append(wsell_from_csr(
            local, max_slot_ratio=float("inf"), nway=4, nway_min_gain=0.0,
        ))

    total_slots = sum(w.vals.shape[0] * 128 for w in locals_)
    global_ratio = total_slots / max(csr.nnz, 1)
    if global_ratio > max_slot_ratio:
        raise ValueError(
            f"W-SELL padding too high for this pattern: {global_ratio:.1f} "
            f"slots/nnz (> {max_slot_ratio}) — use distribute_csr instead"
        )

    vmax = max(w.n_vregs for w in locals_)
    n_slabs = locals_[0].n_slabs
    x_rows = locals_[0].x_rows

    def pad_stack(get, pad_value, dtype):
        outs = []
        for w in locals_:
            arr = np.asarray(get(w))
            pad = vmax - (arr.shape[0] if arr.ndim == 1 else arr.shape[0] // 8)
            if arr.ndim == 1:
                arr = np.concatenate(
                    [arr, np.full(pad, pad_value, arr.dtype)]
                )
            else:
                arr = np.concatenate(
                    [arr, np.full((pad * 8, arr.shape[1]), pad_value, arr.dtype)]
                )
            outs.append(arr)
        return put_sharded(
            np.asarray(np.stack(outs), dtype), mesh,
            P(axis, *([None] * np.asarray(outs[0]).ndim)),
        )

    return DistWSell(
        vals=pad_stack(lambda w: w.vals, 0, locals_[0].dtype),
        meta=pad_stack(lambda w: w.meta, 0, jnp.int32),
        base=pad_stack(lambda w: w.base, 0, jnp.int32),
        slab=pad_stack(lambda w: w.slab, n_slabs - 1, jnp.int32),
        shape=(int(n_rows), int(n_cols)),
        block_rows=int(block),
        n_slabs=int(n_slabs),
        x_rows=int(x_rows),
        nnz=csr.nnz,
        slot_ratio=float(global_ratio),
        axis=axis,
        nway=4,
    )


def _mesh_interpret(mesh: jax.sharding.Mesh) -> bool:
    """Pallas interpret mode iff the MESH devices aren't TPUs.

    ``jax.default_backend()`` is the wrong predicate here: with the TPU
    plugin initialised it says "tpu" even when the shard_map runs on a
    forced-host CPU mesh (the driver's multichip dryrun)."""
    return mesh.devices.flat[0].platform != "tpu"


def _local_wsell_spmv(
    vals, meta, base, slab, x_local, *,
    axis: str, block_rows: int, n_slabs: int, x_rows: int, shape, ratio,
    interpret: bool, nway: int = 1,
):
    """Per-shard body: neighbor-window ppermute + local W-SELL kernel."""
    n_dev = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    left = jax.lax.ppermute(x_local, axis, fwd)
    right = jax.lax.ppermute(x_local, axis, bwd)
    xg = jnp.concatenate([left, x_local, right])

    from ..ops.pallas_wsell import wsell_spmv

    local = WSellMatrix(
        vals=vals, meta=meta, base=base, slab=slab,
        shape=(block_rows, 3 * block_rows),
        nnz=0, n_slabs=n_slabs, x_rows=x_rows, slot_ratio=ratio,
        nway=nway,
    )
    # wsell_spmv returns exactly shape[0] == block_rows rows here
    return wsell_spmv(local, xg, interpret=interpret)


def dist_wsell_spmv(a: DistWSell, x: jnp.ndarray, mesh: jax.sharding.Mesh):
    """y = A @ x with row-sharded W-SELL A and padded sharded x."""
    fn = _dist_wsell_spmv_jit(
        mesh, a.axis, a.block_rows, a.n_slabs, a.x_rows, a.shape,
        a.slot_ratio, a.nway,
    )
    return fn(a.vals, a.meta, a.base, a.slab, x)


@lru_cache(maxsize=None)
def _dist_wsell_spmv_jit(mesh, axis, block_rows, n_slabs, x_rows, shape,
                         ratio, nway=1):
    interpret = _mesh_interpret(mesh)

    def inner(vals, meta, base, slab, x_local):
        return _local_wsell_spmv(
            vals[0], meta[0], base[0], slab[0], x_local,
            axis=axis, block_rows=block_rows, n_slabs=n_slabs,
            x_rows=x_rows, shape=shape, ratio=ratio, interpret=interpret,
            nway=nway,
        )

    # check_vma=False: the pallas_call inside the body produces outputs
    # without varying-mesh-axis metadata, which the strict checker rejects
    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None),
                  P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def dist_wsell_solve(
    a: DistWSell,
    b,
    x0=None,
    max_iterations: int = -1,
    epsilon: float = 1e-8,
    *,
    solver: str = "cg",
    mesh: Optional[jax.sharding.Mesh] = None,
    record_residuals: bool = False,
    restart: int = 32,
) -> SolveResult:
    """Distributed Krylov solve on the general-pattern W-SELL fast path
    (same cores as dist_solve; psum dots, neighbor-window halo)."""
    if solver not in ("cg", "bicg_symmetric", "cgs", "bicgstab", "gmres"):
        raise ValueError(
            "dist_wsell_solve supports cg/bicg_symmetric/cgs/bicgstab/"
            f"gmres, got {solver!r}"
        )
    mesh = resolve_mesh(
        mesh, a.vals, n_shards=a.n_shards, axis=a.axis
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
    fn = _dist_wsell_solve_jit(
        mesh, a.axis, a.block_rows, a.n_slabs, a.x_rows, a.shape,
        a.slot_ratio, solver, maxiter, bool(record_residuals), gmres_m,
        a.nway,
    )
    return fn(a.vals, a.meta, a.base, a.slab, b_arr, x0_arr, eps)


@lru_cache(maxsize=None)
def _dist_wsell_solve_jit(
    mesh, axis, block_rows, n_slabs, x_rows, shape, ratio,
    solver: str, maxiter: int, record: bool, gmres_m: int = 32, nway: int = 1,
):
    core = _CORES[solver]
    interpret = _mesh_interpret(mesh)

    def inner(vals, meta, base, slab, b_local, x0_local, eps):
        arrs = (vals[0], meta[0], base[0], slab[0])

        def matvec(v):
            return _local_wsell_spmv(
                *arrs, v, axis=axis, block_rows=block_rows,
                n_slabs=n_slabs, x_rows=x_rows, shape=shape, ratio=ratio,
                interpret=interpret, nway=nway,
            )

        dotfn = _psum_dot(axis)
        if solver == "bicgstab":
            return core(
                matvec, lambda v: v, dotfn, b_local, x0_local, eps, maxiter,
                record,
            )
        if solver == "gmres":
            return core(
                matvec, lambda v: v, dotfn,
                lambda V, w: jax.lax.psum(V @ w, axis),
                b_local, x0_local, eps, gmres_m, maxiter, record,
            )
        return core(matvec, dotfn, b_local, x0_local, eps, maxiter, record)

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
        inner,
        mesh=mesh,
        in_specs=(
            P(axis, None, None), P(axis, None, None),
            P(axis, None), P(axis, None),
            P(axis), P(axis), P(),
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)
