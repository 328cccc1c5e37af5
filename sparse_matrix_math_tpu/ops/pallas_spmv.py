"""Pallas TPU SpMV kernels.

The reference's SpMV is a scalar FMA loop over ragged CSR rows
(reference include/sparse_matrix_math.h:1478-1491).  On TPU the hot
formats get hand-scheduled Pallas kernels (SURVEY §7 step 6):

* ``dia_spmv`` — stencil/DIA matrices.  The XLA fallback
  (ops/spmv.py:_rmult_dia) reads one shifted HBM stream of ``x`` per
  diagonal (ndiags × n traffic); this kernel keeps the whole ``x`` in
  VMEM and reads it ONCE, so HBM traffic per row is just the diagonal
  values + y write — ~(ndiags+2)·4 bytes/row instead of (2·ndiags+1)·4.
* ``ell_spmv`` — general padded-row (ELL) matrices: row-tile grid, whole
  ``x`` resident in VMEM, per-slot vector gather + FMA accumulate.

Both kernels require ``x`` to fit in VMEM (~16 MB/core ⇒ n ≲ 3M f32):
above that the callers in ops/spmv.py use the XLA paths.  Kernels are
checked against the XLA paths in tests (interpret mode on CPU, real
kernels on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.dia import DIAMatrix
from ..formats.ell import ELLMatrix

__all__ = ["dia_spmv", "ell_spmv", "fits_in_vmem"]

_LANE = 128
_VMEM_X_LIMIT = 12 * 1024 * 1024  # leave headroom below the ~16 MB/core VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_in_vmem(n: int, dtype) -> bool:
    """Whether a length-n multiplicand can stay VMEM-resident."""
    return n * jnp.dtype(dtype).itemsize <= _VMEM_X_LIMIT


# -- DIA stencil kernel -------------------------------------------------------


def _dia_kernel(xp_ref, diags_ref, out_ref, *, shifts, rows_blk):
    """One row tile of the 2-D-layout stencil SpMV.

    Everything is 2-D (Mosaic on this stack rejects 1-D memory ops):
    the flat padded x lives as ``xp_ref`` (M, 128); a flat shift by
    ``off`` decomposes into a *dynamic sublane slice* (off // 128 rows)
    plus a *static lane rotation* (off % 128), implemented as two static
    lane slices concatenated — no gather, no unaligned access.
    """
    i = pl.program_id(0)
    acc = None
    for d, (s8, r) in enumerate(shifts):
        w = xp_ref[pl.ds(i * rows_blk + s8, rows_blk + 1), :]
        if r == 0:
            shifted = w[:-1, :]
        else:
            shifted = jnp.concatenate([w[:-1, r:], w[1:, :r]], axis=1)
        term = diags_ref[d, :, :] * shifted
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "shape", "interpret"))
def _dia_spmv_call(diags, x, *, offsets, shape, interpret=False):
    n_rows, n_cols = shape
    dtype = jnp.result_type(diags.dtype, x.dtype)
    ndiags = len(offsets)

    rows_blk = 512                      # 512 sublanes x 128 lanes = 64k elems
    block = rows_blk * _LANE
    n_pad = _round_up(n_rows, block)
    grid = n_pad // block

    # left pad aligns every shift to non-negative; keep it lane-aligned so
    # shift decomposition stays static:  flat index base + off + lpad.
    lpad = _round_up(max(-min(offsets), 0), _LANE)
    xp_len = lpad + n_pad + _round_up(max(max(offsets), 0), _LANE) + _LANE
    xp = jnp.pad(x.astype(dtype), (lpad, xp_len - lpad - n_cols))
    # one extra sublane row so the (rows_blk + 1)-row window never overruns
    xp2 = jnp.pad(xp.reshape(-1, _LANE), ((0, 1), (0, 0)))

    diags_p = jnp.pad(diags.astype(dtype), ((0, 0), (0, n_pad - n_rows)))
    diags3 = diags_p.reshape(ndiags, -1, _LANE)

    shifts = tuple(
        ((lpad + off) // _LANE, (lpad + off) % _LANE) for off in offsets
    )

    out = pl.pallas_call(
        functools.partial(_dia_kernel, shifts=shifts, rows_blk=rows_blk),
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(xp2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ndiags, rows_blk, _LANE), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((rows_blk, _LANE), lambda i: (i, 0)),
        interpret=interpret,
    )(xp2, diags3)
    return out.reshape(-1)[:n_rows]


def dia_spmv(a: DIAMatrix, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x for a DIA matrix via the Pallas stencil kernel."""
    return _dia_spmv_call(
        a.diags, x, offsets=a.offsets, shape=a.shape, interpret=interpret
    )


# -- ELL gather kernel --------------------------------------------------------


def _ell_kernel(x_ref, vals_ref, cols_ref, out_ref):
    """One row tile: out = sum_k vals[:, k] * x[cols[:, k]] (vector gather
    per slot — the TPU analogue of the reference's per-row FMA loop,
    h:1478-1491)."""
    k_slots = vals_ref.shape[1]
    x = x_ref[:]
    acc = vals_ref[:, 0] * jnp.take(x, cols_ref[:, 0], axis=0)
    for k in range(1, k_slots):
        acc = acc + vals_ref[:, k] * jnp.take(x, cols_ref[:, k], axis=0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def _ell_spmv_call(vals, cols, x, *, shape, interpret=False):
    n_rows, n_cols = shape
    rows_padded, k_slots = vals.shape
    dtype = jnp.result_type(vals.dtype, x.dtype)
    block = min(_round_up(rows_padded, _LANE), 16 * 1024)
    n_pad = _round_up(rows_padded, block)
    grid = n_pad // block

    vals_p = jnp.pad(vals.astype(dtype), ((0, n_pad - rows_padded), (0, 0)))
    cols_p = jnp.pad(cols, ((0, n_pad - rows_padded), (0, 0)))
    x_p = jnp.pad(x.astype(dtype), (0, _round_up(n_cols, _LANE) - n_cols))

    out = pl.pallas_call(
        _ell_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad,), dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(x_p.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k_slots), lambda i: (i, 0)),
            pl.BlockSpec((block, k_slots), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,)),
        interpret=interpret,
    )(x_p, vals_p, cols_p)
    return out[: n_rows]


def ell_spmv(a: ELLMatrix, x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """y = A @ x for an ELL matrix via the Pallas gather kernel."""
    return _ell_spmv_call(
        a.vals, a.cols, x, shape=a.shape, interpret=interpret
    )
