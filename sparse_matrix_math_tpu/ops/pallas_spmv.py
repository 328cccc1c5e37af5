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

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.dia import DIAMatrix
from ..formats.ell import ELLMatrix

__all__ = ["dia_spmv", "ell_spmv", "fits_in_vmem"]

_LANE = 128
# Empirically validated on TPU v5e: a 36 MB f32 multiplicand stays resident
# and the kernel runs at the device bandwidth ceiling (v5e VMEM > the
# textbook 16 MB/core figure).
_VMEM_X_LIMIT = 40 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_in_vmem(n: int, dtype) -> bool:
    """Whether a length-n multiplicand can stay VMEM-resident."""
    return n * jnp.dtype(dtype).itemsize <= _VMEM_X_LIMIT


def default_rows_blk(ndiags: int) -> int:
    """Largest 8-aligned row block whose double-buffered f32 diagonal
    slab (2 x ndiags x rows_blk x 128 x 4B) stays within ~12 MB of the
    16 MB scoped-VMEM budget — room must remain for the x window, the
    output tile, and semaphores.  512 for narrow stencils (<= 22
    diagonals — the measured sweet spot for the 5/7/9-point families);
    halves as the stencil widens (27-point 3-D -> 256).  A fixed 512
    block at 27 diagonals double-buffers 2 x 6.9 MB and dies at compile
    time with a scoped-VMEM stack overflow.

    Deliberately dtype-agnostic: bf16 slabs FIT a 512 block at 27
    diagonals but run SLOWER there than at the f32-sized 256 (measured
    round 5: 395 vs ~190 us/iter inside the refinement inner on the
    27-point/128^3 system) — size for f32 regardless of storage."""
    rb = 512
    while rb > 64 and 2 * ndiags * rb * _LANE * 4 > 12 * 2**20:
        rb //= 2
    return rb


# -- DIA stencil kernel -------------------------------------------------------



def _lane_shifted(w, r: int, rows_blk: int):
    """Rotate a (rows_blk + 1, 128) window left by ``r`` lanes in flat
    order: lanes j < 128-r come from row i rotated, lanes j >= 128-r from
    row i+1 (pltpu.roll requires a POSITIVE shift on this stack, so
    left-rotate r == right-rotate 128-r).  Shared by all DIA-family
    kernels — the index math lives only here.  The shift is pinned to
    int32: under jax_enable_x64 a bare Python int becomes an i64
    constant, which tpu.dynamic_rotate rejects."""
    if r == 0:
        return w[:-1, :]
    rolled = pltpu.roll(w, np.int32(_LANE - r), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, _LANE), dimension=1)
    return jnp.where(lane < _LANE - r, rolled[:-1, :], rolled[1:, :])

def _dia_kernel(xp_ref, diags_ref, out_ref, *, shifts, rows_blk):
    """One row tile of the 2-D-layout stencil SpMV.

    Everything is 2-D (Mosaic on this stack rejects 1-D memory ops):
    the flat padded x lives as ``xp_ref`` (M, 128); a flat shift by
    ``off`` decomposes into a *dynamic sublane slice* (off // 128 rows)
    plus a *static lane rotation* (off % 128) via ``pltpu.roll`` and a
    lane-predicated select between adjacent sublane rows — no gather,
    no unaligned access.
    """
    i = pl.program_id(0)
    acc = None
    for d, (s8, r) in enumerate(shifts):
        w = xp_ref[pl.ds(i * rows_blk + s8, rows_blk + 1), :]
        term = diags_ref[d, :, :] * _lane_shifted(w, r, rows_blk)
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "shape", "interpret"))
def _dia_spmv_call(diags, x, *, offsets, shape, interpret=False):
    n_rows, n_cols = shape
    dtype = jnp.result_type(diags.dtype, x.dtype)
    ndiags = len(offsets)

    rows_blk = default_rows_blk(ndiags)
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


# -- padded-layout DIA path (zero per-iteration layout work) ------------------
#
# The plain dia_spmv pads/reshapes x on every call — fine for one-shot
# SpMVs, but inside a Krylov loop those are extra kernel launches per
# iteration.  PaddedDIA keeps every solver vector in the kernel's native
# 2-D layout (lblk zero blocks | n | right pad, viewed (rows, 128)), so the
# whole iteration is kernel-minimal: solvers run their cores directly on
# padded carries (padding stays exactly zero through SpMV/axpy/dot).


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedDIA:
    """DIA matrix pre-laid-out for the padded-domain Pallas kernel."""

    diags3: jnp.ndarray  # (ndiags, total_rows, 128) — xp-layout aligned
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    n_total: int = dataclasses.field(metadata=dict(static=True))  # layout elems
    lblk: int = dataclasses.field(metadata=dict(static=True))     # leading pad blocks
    nblk: int = dataclasses.field(metadata=dict(static=True))     # data blocks
    rows_blk: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.diags3.dtype

    def to_padded(self, x: jnp.ndarray) -> jnp.ndarray:
        """Lift a length-n vector into the padded 2-D layout."""
        lead = self.lblk * self.rows_blk * _LANE
        out = jnp.zeros((self.n_total,), x.dtype)
        out = jax.lax.dynamic_update_slice(out, x, (lead,))
        return out.reshape(-1, _LANE)

    def from_padded(self, xp: jnp.ndarray) -> jnp.ndarray:
        """Extract the logical vector from the padded layout."""
        lead = self.lblk * self.rows_blk * _LANE
        return jax.lax.slice(xp.reshape(-1), (lead,), (lead + self.shape[0],))


def _dia_layout_params(offsets, shape, rows_blk: int):
    """Static layout geometry: (lblk, nblk, rblk, total elems).

    At least one leading guard block is ALWAYS allocated (even for
    matrices with no sub-diagonal): downstream kernels — notably the
    fused SGS sweeps (ops/pallas_trisweep.py) — rely on the first rows
    of the layout being zero-padding so that clamped window bases at the
    array edge only ever misalign guard rows.
    """
    n_rows, n_cols = shape
    blk = rows_blk * _LANE
    lblk = max((-min(offsets) + blk - 1) // blk, 1)
    nblk = (max(n_rows, n_cols) + blk - 1) // blk
    # trailing blocks must cover the largest read: base + off + window
    max_off = max(max(offsets), 0)
    rblk = (max_off + blk - 1) // blk + 1
    total = (lblk + nblk + rblk) * blk
    return lblk, nblk, rblk, total


def pad_dia(a: DIAMatrix, rows_blk: int = None, geometry_offsets=None) -> PaddedDIA:
    """One-time layout transform for :class:`PaddedDIA`.

    Works both host-side (concrete arrays) and under a jit trace (the pad
    is a jnp op; the geometry is static from shapes).

    ``geometry_offsets``: compute the layout geometry from this offset
    superset instead of ``a.offsets`` — used to lay a sub-matrix (e.g. the
    strict lower factor of an SGS preconditioner) into the SAME padded
    layout as the full matrix, so solver vectors are shared between them.
    """
    n_rows, _ = a.shape
    geo = a.offsets if geometry_offsets is None else tuple(geometry_offsets)
    if geometry_offsets is not None and not set(a.offsets) <= set(geo):
        raise ValueError("geometry_offsets must be a superset of a.offsets")
    if rows_blk is None:
        # size for the GEOMETRY's diagonal count: matrices sharing one
        # layout (full A + its strict factors) must agree on rows_blk,
        # and the widest of them bounds the kernel slab
        rows_blk = default_rows_blk(len(geo))
    lblk, nblk, rblk, total = _dia_layout_params(geo, a.shape, rows_blk)
    blk = rows_blk * _LANE
    lead = lblk * blk
    d3 = jnp.pad(a.diags, ((0, 0), (lead, total - lead - n_rows)))
    return PaddedDIA(
        diags3=d3.reshape(a.diags.shape[0], -1, _LANE),
        offsets=a.offsets,
        shape=a.shape,
        nnz=a.nnz,
        n_total=total,
        lblk=lblk,
        nblk=nblk,
        rows_blk=rows_blk,
    )


def _dia_padded_kernel(xp_ref, diags_ref, out_ref, *, shifts, rows_blk, lblk):
    """Padded-domain tile: identical math to _dia_kernel, but the grid
    covers pad blocks too (their diagonal values are zero, so they emit
    zeros; leading pad blocks skip the read to avoid negative bases)."""
    j = pl.program_id(0)
    xp_rows = xp_ref.shape[0]

    def compute():
        acc = None
        for d, (s8, r) in enumerate(shifts):
            # clamp the window into bounds: out-of-range bases only occur
            # for pad blocks whose diagonal values are zero (the product
            # discards whatever was read) — but the READ itself must stay
            # in bounds or the hardware faults (interpret mode clamps,
            # the real device does not).
            base = jnp.clip(j * rows_blk + s8, 0, xp_rows - rows_blk - 1)
            w = xp_ref[pl.ds(base, rows_blk + 1), :]
            term = diags_ref[d, :, :] * _lane_shifted(w, r, rows_blk)
            acc = term if acc is None else acc + term
        return acc

    if lblk > 0:
        out_ref[:, :] = jnp.where(j >= lblk, compute(), 0.0)
    else:
        out_ref[:, :] = compute()


def _dia_streamed_kernel(
    xp_hbm, diags_ref, out_ref, scratch, sems,
    *, rel_shifts, rows_blk, win_rows, min_s8, n_grid,
):
    """Streaming variant: x stays in HBM; each grid step DMAs its
    (rows_blk + span + 1)-row window into a double-buffered VMEM scratch,
    prefetching the next window while computing the current one — the
    large-n path where x exceeds VMEM residency."""
    j = pl.program_id(0)
    xrows = xp_hbm.shape[0]

    def window_copy(slot, jj):
        base = jnp.clip(jj * rows_blk + min_s8, 0, xrows - win_rows)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(base, win_rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(j + 1 < n_grid)
    def _():
        window_copy((j + 1) % 2, j + 1).start()

    window_copy(j % 2, j).wait()
    slot = j % 2

    acc = None
    for d, (rs8, r) in enumerate(rel_shifts):
        w = scratch[slot, pl.ds(rs8, rows_blk + 1), :]
        term = diags_ref[d, :, :] * _lane_shifted(w, r, rows_blk)
        acc = term if acc is None else acc + term
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def dia_spmv_streamed(a: PaddedDIA, xp: jnp.ndarray, *, interpret: bool = False):
    """y = A @ x in the padded layout with HBM-resident x (any n)."""
    rows_blk = a.rows_blk
    total_blocks = a.n_total // (rows_blk * _LANE)

    shifts = tuple((off // _LANE, off % _LANE) for off in a.offsets)
    min_s8 = min(s8 for s8, _ in shifts)
    max_s8 = max(s8 for s8, _ in shifts)
    rel_shifts = tuple((s8 - min_s8, r) for s8, r in shifts)
    win_rows = rows_blk + (max_s8 - min_s8) + 1

    out = pl.pallas_call(
        functools.partial(
            _dia_streamed_kernel,
            rel_shifts=rel_shifts, rows_blk=rows_blk, win_rows=win_rows,
            min_s8=min_s8, n_grid=total_blocks,
        ),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),  # see padded note
        grid=(total_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (a.diags3.shape[0], rows_blk, _LANE), lambda j: (0, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, _LANE), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a.diags3)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def dia_spmv_padded(a: PaddedDIA, xp: jnp.ndarray, *, interpret: bool = False):
    """y = A @ x entirely in the padded 2-D layout (no per-call reshaping)."""
    rows_blk = a.rows_blk
    # grid covers the FULL layout including pad blocks: unwritten out
    # blocks would be undefined memory, and pad blocks emit exact zeros
    # (their diagonal values are zero).
    grid = a.n_total // (rows_blk * _LANE)

    # shifts relative to the padded layout: flat base j*blk + off
    shifts = tuple((off // _LANE, off % _LANE) for off in a.offsets)
    # negative off -> negative s8 handled via floor division plus the
    # leading pad guard in the kernel (j >= lblk ensures base >= 0).

    out = pl.pallas_call(
        functools.partial(
            _dia_padded_kernel, shifts=shifts, rows_blk=rows_blk, lblk=a.lblk
        ),
        # output follows the multiplicand's dtype: bf16 diagonal storage
        # (PaddedDIA from DIAMatrix.astype(bf16)) still accumulates f32
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(xp.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (a.diags3.shape[0], rows_blk, _LANE), lambda j: (0, j, 0)
            ),
        ],
        out_specs=pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
        interpret=interpret,
    )(xp, a.diags3)
    return out


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
    """y = A @ x for an ELL matrix via the Pallas gather kernel.

    Current Mosaic stacks reject in-kernel 1-D gathers ("Only 2D gather
    is supported"), so on a real TPU this transparently falls back to
    the XLA gather formulation (ops/spmv.py) — same result, compiled
    path.  The HARDWARE answer to general-pattern gathers is the W-SELL
    format (formats/wsell.py + ops/pallas_wsell.py), which restructures
    the same computation around the 2-D gather forms Mosaic does support
    and runs ~40-70x faster than this fallback on chip — convert with
    ``wsell_from_csr`` for repeated SpMVs on general patterns.  The
    Pallas ELL kernel remains exercised in interpret mode and activates
    automatically on stacks that gain 1-D gather support.
    """
    if not interpret and jax.default_backend() == "tpu":
        from .spmv import _rmult_ell

        return _rmult_ell(a, x)
    return _ell_spmv_call(
        a.vals, a.cols, x, shape=a.shape, interpret=interpret
    )


# -- double-word (emulated f64) padded DIA path -------------------------------
#
# DfDiaMatrix's XLA SpMV (ops/df32.py) reads every diagonal as a shifted
# slice; XLA pays a cross-lane relayout per unaligned offset (measured
# 1.9x on the bench stencil — docs/DESIGN.md §16 scaling note).  This
# kernel is the f32 padded kernel with double-word arithmetic: the same
# sublane-slice + lane-rotation window reads for BOTH (hi, lo) x planes,
# Dekker two_prod of the hi parts + f32 cross terms, double-word
# accumulation across diagonals.  The error-free transforms are exact
# under Mosaic on TPU (probed: 65536/65536 products bit-exact vs f64 —
# same guarantee as XLA:TPU, docs/DESIGN.md §16).


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedDfDia:
    """Double-word DIA pre-laid-out for the padded Pallas kernel (the
    (hi, lo)-plane twin of :class:`PaddedDIA`; same layout geometry)."""

    diags3_hi: jnp.ndarray  # (ndiags, total_rows, 128)
    diags3_lo: jnp.ndarray
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    n_total: int = dataclasses.field(metadata=dict(static=True))
    lblk: int = dataclasses.field(metadata=dict(static=True))
    nblk: int = dataclasses.field(metadata=dict(static=True))
    rows_blk: int = dataclasses.field(metadata=dict(static=True))

    def to_padded(self, x: jnp.ndarray) -> jnp.ndarray:
        lead = self.lblk * self.rows_blk * _LANE
        out = jnp.zeros((self.n_total,), x.dtype)
        out = jax.lax.dynamic_update_slice(out, x, (lead,))
        return out.reshape(-1, _LANE)

    def from_padded(self, xp: jnp.ndarray) -> jnp.ndarray:
        lead = self.lblk * self.rows_blk * _LANE
        return jax.lax.slice(xp.reshape(-1), (lead,), (lead + self.shape[0],))


def pad_dia_df(dfa, rows_blk: int = None) -> PaddedDfDia:
    """One-time layout transform DfDiaMatrix -> PaddedDfDia."""
    n_rows, _ = dfa.shape
    if rows_blk is None:
        # the df kernel double-buffers BOTH word slabs (hi + lo)
        rows_blk = default_rows_blk(2 * len(dfa.offsets))
    lblk, nblk, rblk, total = _dia_layout_params(
        dfa.offsets, dfa.shape, rows_blk
    )
    lead = lblk * rows_blk * _LANE

    def lay(d):
        d = jnp.pad(d, ((0, 0), (lead, total - lead - n_rows)))
        return d.reshape(d.shape[0], -1, _LANE)

    return PaddedDfDia(
        diags3_hi=lay(dfa.diags_hi),
        diags3_lo=lay(dfa.diags_lo),
        offsets=dfa.offsets,
        shape=dfa.shape,
        nnz=dfa.nnz,
        n_total=total,
        lblk=lblk,
        nblk=nblk,
        rows_blk=rows_blk,
    )


def _dia_padded_df_kernel(
    xh_ref, xl_ref, dhi_ref, dlo_ref, yh_ref, yl_ref,
    *, shifts, rows_blk, lblk,
):
    from .df32 import _fast_two_sum, df_add, two_prod

    j = pl.program_id(0)
    xrows = xh_ref.shape[0]

    def compute():
        acc = (
            jnp.zeros((rows_blk, _LANE), jnp.float32),
            jnp.zeros((rows_blk, _LANE), jnp.float32),
        )
        for d, (s8, r) in enumerate(shifts):
            base = jnp.clip(j * rows_blk + s8, 0, xrows - rows_blk - 1)
            wh = _lane_shifted(xh_ref[pl.ds(base, rows_blk + 1), :], r, rows_blk)
            wl = _lane_shifted(xl_ref[pl.ds(base, rows_blk + 1), :], r, rows_blk)
            a_hi = dhi_ref[d, :, :]
            a_lo = dlo_ref[d, :, :]
            p, e = two_prod(a_hi, wh)
            e = e + (a_hi * wl + a_lo * wh)
            acc = df_add(acc, _fast_two_sum(p, e))
        return acc

    if lblk > 0:
        h, low = compute()
        keep = j >= lblk
        yh_ref[:, :] = jnp.where(keep, h, 0.0)
        yl_ref[:, :] = jnp.where(keep, low, 0.0)
    else:
        h, low = compute()
        yh_ref[:, :] = h
        yl_ref[:, :] = low


@functools.partial(jax.jit, static_argnames=("interpret",))
def dia_spmv_padded_df(
    a: PaddedDfDia, xhp: jnp.ndarray, xlp: jnp.ndarray,
    *, interpret: bool = False,
):
    """(yh, yl) = A @ (xh, xl) entirely in the padded 2-D layout."""
    rows_blk = a.rows_blk
    grid = a.n_total // (rows_blk * _LANE)
    shifts = tuple((off // _LANE, off % _LANE) for off in a.offsets)
    nd = a.diags3_hi.shape[0]

    return pl.pallas_call(
        functools.partial(
            _dia_padded_df_kernel,
            shifts=shifts, rows_blk=rows_blk, lblk=a.lblk,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xhp.shape, jnp.float32),
            jax.ShapeDtypeStruct(xhp.shape, jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(xhp.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(xlp.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, rows_blk, _LANE), lambda j: (0, j, 0)),
            pl.BlockSpec((nd, rows_blk, _LANE), lambda j: (0, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
            pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
        ),
        interpret=interpret,
    )(xhp, xlp, a.diags3_hi, a.diags3_lo)


def _dia_streamed_df_kernel(
    xh_hbm, xl_hbm, dhi_ref, dlo_ref, yh_ref, yl_ref, sh, sl, sems,
    *, rel_shifts, rows_blk, win_rows, min_s8, n_grid,
):
    """Streaming double-word variant: both x planes stay in HBM; each
    grid step DMAs its window pair into double-buffered VMEM scratch
    (prefetching the next while computing), so residency never exceeds
    two window pairs regardless of n — the same pipeline as
    _dia_streamed_kernel with double-word accumulation."""
    from .df32 import _fast_two_sum, df_add, two_prod

    j = pl.program_id(0)
    xrows = xh_hbm.shape[0]

    def copies(slot, jj):
        base = jnp.clip(jj * rows_blk + min_s8, 0, xrows - win_rows)
        return (
            pltpu.make_async_copy(
                xh_hbm.at[pl.ds(base, win_rows), :], sh.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                xl_hbm.at[pl.ds(base, win_rows), :], sl.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < n_grid)
    def _():
        for c in copies((j + 1) % 2, j + 1):
            c.start()

    for c in copies(j % 2, j):
        c.wait()
    slot = j % 2

    acc = (
        jnp.zeros((rows_blk, _LANE), jnp.float32),
        jnp.zeros((rows_blk, _LANE), jnp.float32),
    )
    for d, (rs8, r) in enumerate(rel_shifts):
        wh = _lane_shifted(sh[slot, pl.ds(rs8, rows_blk + 1), :], r, rows_blk)
        wl = _lane_shifted(sl[slot, pl.ds(rs8, rows_blk + 1), :], r, rows_blk)
        a_hi = dhi_ref[d, :, :]
        a_lo = dlo_ref[d, :, :]
        p, e = two_prod(a_hi, wh)
        e = e + (a_hi * wl + a_lo * wh)
        acc = df_add(acc, _fast_two_sum(p, e))
    yh_ref[:, :] = acc[0]
    yl_ref[:, :] = acc[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dia_spmv_streamed_df(
    a: PaddedDfDia, xhp: jnp.ndarray, xlp: jnp.ndarray,
    *, interpret: bool = False,
):
    """(yh, yl) = A @ (xh, xl), padded layout, HBM-resident x (any n)."""
    rows_blk = a.rows_blk
    total_blocks = a.n_total // (rows_blk * _LANE)
    shifts = tuple((off // _LANE, off % _LANE) for off in a.offsets)
    min_s8 = min(s8 for s8, _ in shifts)
    max_s8 = max(s8 for s8, _ in shifts)
    rel_shifts = tuple((s8 - min_s8, r) for s8, r in shifts)
    win_rows = rows_blk + (max_s8 - min_s8) + 1
    nd = a.diags3_hi.shape[0]

    return pl.pallas_call(
        functools.partial(
            _dia_streamed_df_kernel,
            rel_shifts=rel_shifts, rows_blk=rows_blk, win_rows=win_rows,
            min_s8=min_s8, n_grid=total_blocks,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xhp.shape, jnp.float32),
            jax.ShapeDtypeStruct(xhp.shape, jnp.float32),
        ),
        grid=(total_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((nd, rows_blk, _LANE), lambda j: (0, j, 0)),
            pl.BlockSpec((nd, rows_blk, _LANE), lambda j: (0, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
            pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, _LANE), jnp.float32),
            pltpu.VMEM((2, win_rows, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xhp, xlp, a.diags3_hi, a.diags3_lo)


# resident-mode budget for the double-word kernel: BOTH x planes live in
# VMEM next to the diagonal blocks and outputs; the scoped-vmem limit is
# 16M, the measured non-x working set ~5M (the n=2M attempt OOMed at
# 23M/16M) — stream past this
_DF_RESIDENT_X_BYTES = 10 * 1024 * 1024
