"""Pallas TPU kernel for the W-SELL general sparse format.

The general-matrix analogue of the reference's ``rMultOp`` row loop
(include/sparse_matrix_math.h:1458-1515), built from the per-vreg
primitives Mosaic actually supports (see formats/wsell.py): dynamic
sublane slice of the VMEM-resident x table, axis-0 sublane select,
axis-1 lane routing, masked row-sums — no scatter, no general gather.

Architecture (same shape as the round-1 streamed DIA kernel, which
reached ~50 GNNZ/s): ONE pallas grid pass whose step count is the DMA
chunk count, not the vreg count — per-grid-step overhead (~0.5 us/step
measured) would otherwise dominate.  Within a step, a ``fori_loop``
walks the chunk's slot vregs; the slot/meta streams are double-buffered
HBM→VMEM DMAs; ``x`` and the y accumulator stay VMEM-resident for the
whole pass, so the only O(nnz) HBM traffic is the 8-byte slot stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.wsell import _LSRC_SHIFT, _SW_BITS, _TGT_SHIFT, LANE, WSellMatrix

__all__ = ["wsell_spmv", "CHUNK_VREGS"]

CHUNK_VREGS = 64  # vregs per DMA chunk (64 * 8KB = 512 KB per buffer slot)


def _wsell_kernel(
    # scalar prefetch
    base_ref, slab_ref,
    # inputs
    x_ref, meta_hbm, vals_hbm,
    # output
    y_ref,
    # scratch
    meta_buf, vals_buf, sems,
    *, n_chunks: int, n_vregs: int,
):
    ch = pl.program_id(0)
    rows_per_chunk = CHUNK_VREGS * 8

    def start_copy(slot, chunk):
        off = chunk * rows_per_chunk
        m = pltpu.make_async_copy(
            meta_hbm.at[pl.ds(off, rows_per_chunk), :],
            meta_buf.at[slot], sems.at[slot, 0],
        )
        v = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(off, rows_per_chunk), :],
            vals_buf.at[slot], sems.at[slot, 1],
        )
        m.start()
        v.start()
        return m, v

    def wait_copy(slot, chunk):
        off = chunk * rows_per_chunk
        pltpu.make_async_copy(
            meta_hbm.at[pl.ds(off, rows_per_chunk), :],
            meta_buf.at[slot], sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(off, rows_per_chunk), :],
            vals_buf.at[slot], sems.at[slot, 1],
        ).wait()

    @pl.when(ch == 0)
    def _():
        y_ref[:, :] = jnp.zeros_like(y_ref)
        start_copy(0, 0)

    @pl.when(ch + 1 < n_chunks)
    def _():
        start_copy((ch + 1) % 2, ch + 1)

    wait_copy(ch % 2, ch)
    slot = ch % 2

    def body(u, _):
        v = ch * CHUNK_VREGS + u

        @pl.when(v < n_vregs)
        def _():
            meta = meta_buf[slot, pl.ds(u * 8, 8), :]
            w8 = x_ref[pl.ds(base_ref[v], 8), :]
            sw = meta & _SW_BITS
            g0 = jnp.take_along_axis(w8, sw, axis=0)
            lsrc = (meta >> _LSRC_SHIFT) & (LANE - 1)
            g1 = jnp.take_along_axis(g0, lsrc, axis=1)
            # static-target layout (formats/wsell.py): vreg position i
            # holds only rows targeting y sublane i, so the products vreg
            # IS the slab contribution — the reduction is the identity
            p = vals_buf[slot, pl.ds(u * 8, 8), :] * g1
            yoff = slab_ref[v] * 8
            y_ref[pl.ds(yoff, 8), :] = y_ref[pl.ds(yoff, 8), :] + p

        return _

    jax.lax.fori_loop(0, CHUNK_VREGS, body, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def wsell_spmv(a: WSellMatrix, x: jnp.ndarray, *, interpret: bool = False):
    """y = A @ x for a W-SELL matrix (single-vector x)."""
    n_rows, n_cols = a.shape
    dtype = jnp.result_type(a.dtype, x.dtype)
    xt = jnp.pad(x.astype(dtype), (0, a.x_rows * LANE - n_cols)).reshape(
        a.x_rows, LANE
    )
    n_vregs = a.n_vregs
    n_chunks = -(-n_vregs // CHUNK_VREGS)
    rows_pad = n_chunks * CHUNK_VREGS * 8
    meta = jnp.pad(a.meta, ((0, rows_pad - n_vregs * 8), (0, 0)))
    vals = jnp.pad(
        a.vals.astype(dtype), ((0, rows_pad - n_vregs * 8), (0, 0))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (a.x_rows, LANE), lambda c, b, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (a.n_slabs * 8, LANE), lambda c, b, s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_VREGS * 8, LANE), jnp.int32),
            pltpu.VMEM((2, CHUNK_VREGS * 8, LANE), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _wsell_kernel, n_chunks=n_chunks, n_vregs=n_vregs
        ),
        out_shape=jax.ShapeDtypeStruct((a.n_slabs * 8, LANE), dtype),
        grid_spec=grid_spec,
        # x table + y accumulator are VMEM-resident by design; the default
        # 16 MB scoped limit rejects multi-million-row systems
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(a.base, a.slab, xt, meta, vals)
    return out.reshape(-1)[:n_rows]
