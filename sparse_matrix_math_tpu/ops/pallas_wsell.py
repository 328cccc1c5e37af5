"""Pallas TPU kernel for the W-SELL general sparse format.

The general-matrix analogue of the reference's ``rMultOp`` row loop
(include/sparse_matrix_math.h:1458-1515), built from the per-vreg
primitives Mosaic actually supports (see formats/wsell.py): dynamic
sublane slices of the VMEM-resident x table, per-vreg sublane select,
per-row axis-1 lane routing — no scatter, no serial gather loop.

Kernel architecture (chosen by on-device ablation, round 2):

* grid = slot-stream chunks (256 vregs); Pallas auto-pipelines the
  meta/vals block streams HBM→VMEM;
* per chunk, a short ``fori_loop`` only FILLS the per-vreg x windows
  into a tall buffer (one dynamic 8-sublane slice each) and a second
  one ACCUMULATES per-vreg products into the VMEM-resident y — all the
  arithmetic (bit unpack, window sublane select, lane routing,
  multiply) runs vectorised over the whole (2048, 128) tall tile, which
  cut the per-vreg cost from ~210 ns (per-vreg loop body) to ~136 ns;
* the window sublane select is 8 broadcast-compare-selects (the tall
  equivalent of the (8,128) ``take_along_axis(axis=0)``, which Mosaic
  only supports at one-vreg table height);
* the builder's static-target layout makes the reduction the identity:
  each products vreg IS its slab contribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.wsell import (
    CHUNK_VREGS,
    LANE,
    WSellMatrix,
    chunk_for as _chunk_for,
)

__all__ = ["wsell_spmv", "wsell_spmm", "CHUNK_VREGS"]


def _gather_products(wbuf, meta_ref, vals_ref, chunk: int, f: int,
                     nway: int = 1):
    """Shared select pipeline: window-stack sublane select (8F tall
    broadcast-compare-selects) + per-row lane routing + multiply; for
    bounded-reduction layouts (``nway`` > 1, formats/wsell.py) the
    products are then routed to their target sublanes with (nway-1)
    masked group-rotations — collisions are additions, so the slab
    accumulate after this stays a plain add."""
    wr = 8 * f
    R = chunk * 8
    sw_bits = max(3, (wr - 1).bit_length())
    meta = meta_ref[:]
    w = wbuf[:]
    sw = meta & ((1 << sw_bits) - 1)
    g0 = jnp.zeros((R, LANE), w.dtype)
    w3 = w.reshape(chunk, wr, LANE)
    for s in range(wr):
        bs = jax.lax.broadcast_in_dim(
            w3[:, s, :], (chunk, 8, LANE), (0, 2)
        ).reshape(R, LANE)
        g0 = jnp.where(sw == s, bs, g0)
    lsrc = (meta >> sw_bits) & (LANE - 1)
    g1 = jnp.take_along_axis(g0, lsrc, axis=1)
    prod = vals_ref[:] * g1
    if nway == 1:
        return prod
    # one-hot shift routing: slot at vreg position p with SHIFT s lands
    # at y sublane (p + s) % 8.  Shifts are multiples of 8/nway; the
    # group-rotation is two static slices + concat per shift (int masks —
    # i1 vregs cannot concat through Mosaic)
    shift = (meta >> (sw_bits + 7)) & 7
    v3 = prod.reshape(chunk, 8, LANE)
    s3 = shift.reshape(chunk, 8, LANE)
    out = jnp.where(s3 == 0, v3, jnp.zeros_like(v3))
    step = 8 // nway
    for j in range(1, nway):
        s = j * step
        masked = jnp.where(s3 == s, v3, jnp.zeros_like(v3))
        out = out + jnp.concatenate(
            [masked[:, 8 - s:, :], masked[:, : 8 - s, :]], axis=1
        )
    return out.reshape(R, LANE)


def _wsell_kernel(
    base_ref, slab_ref, x_ref, meta_ref, vals_ref, y_ref, wbuf, pbuf,
    *, chunk: int, f: int, nway: int,
):
    ch = pl.program_id(0)
    wr = 8 * f

    @pl.when(ch == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    def fill(u, _):
        v = ch * chunk + u
        wbuf[pl.ds(u * wr, wr), :] = x_ref[pl.ds(base_ref[v], wr), :]
        return _

    jax.lax.fori_loop(0, chunk, fill, None)

    # static-target layout: the products vreg IS the slab contribution
    pbuf[:, :] = _gather_products(wbuf, meta_ref, vals_ref, chunk, f, nway)

    def acc(u, _):
        v = ch * chunk + u
        yo = slab_ref[v] * 8
        y_ref[pl.ds(yo, 8), :] = y_ref[pl.ds(yo, 8), :] + pbuf[pl.ds(u * 8, 8), :]
        return _

    jax.lax.fori_loop(0, chunk, acc, None)


def _wsell_kernel_hbm(
    base_ref, slab_ref, x_hbm, meta_ref, vals_ref, y_ref, wbuf, pbuf, sems,
    *, chunk: int, f: int, nway: int,
):
    """HBM-table variant of :func:`_wsell_kernel`: windows DMA from the
    HBM-resident x table (all chunk copies in flight before the first
    wait).  Needed when x exceeds VMEM residency — e.g. the routed
    chain's final pass reads a 100+ MB stream at benchmark scale."""
    ch = pl.program_id(0)
    wr = 8 * f

    @pl.when(ch == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)

    def copy(u):
        v = ch * chunk + u
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(base_ref[v], wr), :],
            wbuf.at[pl.ds(u * wr, wr), :],
            sems.at[u],
        )

    def start(u, _):
        copy(u).start()
        return _

    jax.lax.fori_loop(0, chunk, start, None)

    def wait(u, _):
        copy(u).wait()
        return _

    jax.lax.fori_loop(0, chunk, wait, None)

    pbuf[:, :] = _gather_products(wbuf, meta_ref, vals_ref, chunk, f, nway)

    def acc(u, _):
        v = ch * chunk + u
        yo = slab_ref[v] * 8
        y_ref[pl.ds(yo, 8), :] = y_ref[pl.ds(yo, 8), :] + pbuf[pl.ds(u * 8, 8), :]
        return _

    jax.lax.fori_loop(0, chunk, acc, None)


def _wsell_spmm_kernel(
    base_ref, slab_ref, x_ref, meta_ref, vals_ref, y_ref, wbuf, pbuf,
    *, chunk: int, k: int, f: int, nway: int,
):
    """Multi-RHS variant: the slot stream (meta/vals) is loaded ONCE per
    chunk and replayed over the k x tables — SpMM pays the A-stream
    bandwidth once instead of k times (the k-call formulation's cost).
    The per-RHS pipeline is identical to :func:`_wsell_kernel`."""
    ch = pl.program_id(0)
    wr = 8 * f

    @pl.when(ch == 0)
    def _():
        y_ref[:, :, :] = jnp.zeros_like(y_ref)

    for j in range(k):  # static unroll over RHS

        def fill(u, _, j=j):
            v = ch * chunk + u
            wbuf[pl.ds(u * wr, wr), :] = x_ref[j, pl.ds(base_ref[v], wr), :]
            return _

        jax.lax.fori_loop(0, chunk, fill, None)

        pbuf[:, :] = _gather_products(wbuf, meta_ref, vals_ref, chunk, f, nway)

        def acc(u, _, j=j):
            v = ch * chunk + u
            yo = slab_ref[v] * 8
            y_ref[j, pl.ds(yo, 8), :] = (
                y_ref[j, pl.ds(yo, 8), :] + pbuf[pl.ds(u * 8, 8), :]
            )
            return _

        jax.lax.fori_loop(0, chunk, acc, None)


# x tables beyond this stay in HBM with per-window DMA
_VMEM_TABLE_BYTES = 64 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret", "force_hbm"))
def wsell_spmv(
    a: WSellMatrix, x: jnp.ndarray, *,
    interpret: bool = False, force_hbm: bool = False,
):
    """y = A @ x for a W-SELL matrix (single-vector x).

    x tables beyond ``_VMEM_TABLE_BYTES`` (or ``force_hbm``, for tests)
    run the HBM-streamed window-DMA kernel — the routed chain's final
    pass reads streams far beyond VMEM at benchmark scale."""
    n_rows, n_cols = a.shape
    dtype = jnp.result_type(a.dtype, x.dtype)
    xt = jnp.pad(x.astype(dtype), (0, a.x_rows * LANE - n_cols)).reshape(
        a.x_rows, LANE
    )
    # the builder chunk-aligns the vreg count (formats/wsell.py), so the
    # O(nnz) planes stream as-is — no per-call padding copies
    n_vregs = a.n_vregs
    f = a.window_f
    chunk = _chunk_for(n_vregs, f)
    assert n_vregs % chunk == 0, "builder must chunk-align the vreg count"
    n_chunks = n_vregs // chunk
    meta = a.meta
    vals = a.vals if a.vals.dtype == dtype else a.vals.astype(dtype)
    base, slab = a.base, a.slab
    hbm = force_hbm or (
        a.x_rows * LANE * xt.dtype.itemsize > _VMEM_TABLE_BYTES
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY) if hbm else pl.BlockSpec(
                (a.x_rows, LANE), lambda c, b, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((chunk * 8, LANE), lambda c, b, s: (c, 0)),
            pl.BlockSpec((chunk * 8, LANE), lambda c, b, s: (c, 0)),
        ],
        out_specs=pl.BlockSpec(
            (a.n_slabs * 8, LANE), lambda c, b, s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=(
            [pltpu.VMEM((chunk * 8 * f, LANE), dtype),
             pltpu.VMEM((chunk * 8, LANE), dtype),
             pltpu.SemaphoreType.DMA((chunk,))]
            if hbm else
            [pltpu.VMEM((chunk * 8 * f, LANE), dtype),
             pltpu.VMEM((chunk * 8, LANE), dtype)]
        ),
    )
    kernel = (
        functools.partial(_wsell_kernel_hbm, chunk=chunk, f=f, nway=a.nway)
        if hbm else functools.partial(_wsell_kernel, chunk=chunk, f=f, nway=a.nway)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((a.n_slabs * 8, LANE), dtype),
        grid_spec=grid_spec,
        # x table (VMEM path) + y accumulator are VMEM-resident by
        # design; the default 16 MB scoped limit rejects
        # multi-million-row systems
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(base, slab, xt, meta, vals)
    return out.reshape(-1)[:n_rows]


def _spmm_rhs_per_call(a: WSellMatrix) -> int:
    """How many RHS fit one kernel call: the k x tables and k y
    accumulators are VMEM-resident, so cap their combined footprint at
    ~72 MB (leaving room for the streamed chunk blocks)."""
    per_rhs = (a.x_rows + a.n_slabs * 8) * LANE * 4
    return max(1, min(8, (72 * 1024 * 1024) // per_rhs))


@functools.partial(jax.jit, static_argnames=("interpret",))
def wsell_spmm(a: WSellMatrix, xs: jnp.ndarray, *, interpret: bool = False):
    """Y = A @ X for a W-SELL matrix and multi-column X (n_cols, k).

    One kernel call serves up to :func:`_spmm_rhs_per_call` columns: the
    slot stream (the O(nnz) meta/vals planes) is read once per chunk and
    replayed across columns.  Measured on hardware (17.5M-nnz jittered
    Laplacian): dispatch-bound eager calls win up to ~1.8x at k=4 (one
    launch instead of k); inside jitted scan loops the kernel is roughly
    neutral (0.8-1.13x) because it is bound by the per-column gather
    compute, not the A stream.  Larger k tiles over multiple calls.
    Feeds 2-D ``rmult``; kernel body shares the :func:`_wsell_kernel`
    pipeline (reference SpMM analogue: rMultOp applied per column,
    /root/reference/include/sparse_matrix_math.h:1458-1515)."""
    n_rows, n_cols = a.shape
    if xs.ndim != 2:
        raise ValueError(f"wsell_spmm needs (n, k) input, got {xs.shape}")
    k_total = xs.shape[1]
    dtype = jnp.result_type(a.dtype, xs.dtype)
    n_vregs = a.n_vregs
    f = a.window_f
    chunk = _chunk_for(n_vregs, f)
    assert n_vregs % chunk == 0, "builder must chunk-align the vreg count"
    n_chunks = n_vregs // chunk
    meta = a.meta
    vals = a.vals if a.vals.dtype == dtype else a.vals.astype(dtype)
    base, slab = a.base, a.slab

    k_call = min(_spmm_rhs_per_call(a), k_total)
    cols = []
    for j0 in range(0, k_total, k_call):
        k = min(k_call, k_total - j0)
        xt = jnp.pad(
            xs[:, j0: j0 + k].T.astype(dtype),
            ((0, 0), (0, a.x_rows * LANE - n_cols)),
        ).reshape(k, a.x_rows, LANE)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (k, a.x_rows, LANE), lambda c, b, s: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((chunk * 8, LANE), lambda c, b, s: (c, 0)),
                pl.BlockSpec((chunk * 8, LANE), lambda c, b, s: (c, 0)),
            ],
            out_specs=pl.BlockSpec(
                (k, a.n_slabs * 8, LANE), lambda c, b, s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((chunk * 8 * f, LANE), dtype),
                pltpu.VMEM((chunk * 8, LANE), dtype),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_wsell_spmm_kernel, chunk=chunk, k=k, f=f, nway=a.nway),
            out_shape=jax.ShapeDtypeStruct(
                (k, a.n_slabs * 8, LANE), dtype
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(base, slab, xt, meta, vals)
        cols.append(out.reshape(k, -1)[:, :n_rows])
    return jnp.concatenate(cols, axis=0).T
