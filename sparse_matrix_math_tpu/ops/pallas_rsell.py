"""Stream-gather Pallas kernel for the routed (R-SELL) format.

A routing pass reads a value table (the x vector, or the previous pass's
output stream) and emits a NEW stream whose slots are the table values
rearranged/duplicated into the pass's bucket order (formats/rsell.py).
It is the W-SELL gather pipeline (ops/pallas_wsell.py) minus the
slab-accumulate: every vreg writes its OWN 1024-slot block of the output
stream, so there is no read-modify-write, no resident y, and the output
streams out through per-chunk Pallas blocks.

Reference analogue: none — the reference's CSR row loop
(include/sparse_matrix_math.h:1458-1515) walks any pattern serially; the
routed chain is how a TPU reaches zero-locality patterns that defeat
single-window W-SELL (the round-2 "entropy wall", docs/BENCH_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.wsell import LANE, chunk_for
from .pallas_wsell import _gather_products

__all__ = ["stream_gather"]


def _stream_kernel(base_ref, x_ref, meta_ref, vals_ref, o_ref, wbuf,
                   *, chunk: int, f: int):
    ch = pl.program_id(0)
    wr = 8 * f

    def fill(u, _):
        v = ch * chunk + u
        wbuf[pl.ds(u * wr, wr), :] = x_ref[pl.ds(base_ref[v], wr), :]
        return _

    jax.lax.fori_loop(0, chunk, fill, None)

    o_ref[:, :] = _gather_products(wbuf, meta_ref, vals_ref, chunk, f)


def _stream_kernel_hbm(base_ref, x_hbm, meta_ref, vals_ref, o_ref, wbuf,
                       sems, *, chunk: int, f: int):
    """HBM-table variant: the value table stays in HBM and each vreg's
    8F-row window DMAs into the scratch (all chunk copies issued before
    the first wait, so the DMA engine overlaps them).  Used when the
    table exceeds VMEM residency — the routed chain's intermediate
    streams reach 100+ MB at the 12M-nnz benchmark scale."""
    ch = pl.program_id(0)
    wr = 8 * f

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

    o_ref[:, :] = _gather_products(wbuf, meta_ref, vals_ref, chunk, f)


# tables beyond this stay in HBM with per-window DMA (the VMEM-resident
# fast path needs table + chunk blocks + scratch to fit ~110 MB)
_VMEM_TABLE_BYTES = 64 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("x_rows", "window_f", "interpret", "force_hbm"),
)
def stream_gather(
    base: jnp.ndarray,
    meta: jnp.ndarray,
    vals: jnp.ndarray,
    table: jnp.ndarray,
    *,
    x_rows: int,
    window_f: int,
    interpret: bool = False,
    force_hbm: bool = False,
) -> jnp.ndarray:
    """Run one routing pass: gather ``table`` values into stream order.

    ``table`` is a flat value vector (padded to ``x_rows * 128``);
    returns the (n_vregs * 1024,) output stream.  ``vals`` carries 1.0
    at real slots (0 padding), or matrix values when a pass folds the
    elementwise multiply.  Tables beyond ``_VMEM_TABLE_BYTES`` (or with
    ``force_hbm``, for tests) run the HBM-streamed window-DMA variant.
    """
    n_vregs = int(base.shape[0])
    f = window_f
    chunk = chunk_for(n_vregs, f)
    assert n_vregs % chunk == 0, "packer must chunk-align the vreg count"
    n_chunks = n_vregs // chunk
    dtype = vals.dtype
    xt = jnp.pad(table.astype(dtype), (0, x_rows * LANE - table.shape[0]))
    xt = xt.reshape(x_rows, LANE)
    hbm = force_hbm or (x_rows * LANE * xt.dtype.itemsize > _VMEM_TABLE_BYTES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY) if hbm else pl.BlockSpec(
                (x_rows, LANE), lambda c, b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((chunk * 8, LANE), lambda c, b: (c, 0)),
            pl.BlockSpec((chunk * 8, LANE), lambda c, b: (c, 0)),
        ],
        out_specs=pl.BlockSpec((chunk * 8, LANE), lambda c, b: (c, 0)),
        scratch_shapes=(
            [pltpu.VMEM((chunk * 8 * f, LANE), dtype),
             pltpu.SemaphoreType.DMA((chunk,))]
            if hbm else [pltpu.VMEM((chunk * 8 * f, LANE), dtype)]
        ),
    )
    kernel = (
        functools.partial(_stream_kernel_hbm, chunk=chunk, f=f)
        if hbm else functools.partial(_stream_kernel, chunk=chunk, f=f)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_vregs * 8, LANE), dtype),
        grid_spec=grid_spec,
        # VMEM path: the value table is resident; meta/vals stream
        # through per-chunk blocks.  HBM path: only windows + blocks.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(base, xt, meta, vals)
    return out.reshape(-1)
