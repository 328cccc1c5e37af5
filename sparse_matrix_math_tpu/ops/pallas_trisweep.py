"""Fused SGS apply for padded-DIA factors — one kernel per apply.

The compositional padded SGS apply (precond/padded_sgs.py) issues one
Pallas call per Jacobi sweep per factor; each call re-stages its VMEM
working set, so a sweeps=4 apply costs ~6 kernel launches of mostly
staging traffic.  This kernel fuses the WHOLE apply —

    forward:  x_0 = r / d;   x_{s+1} = (r - L x_s) / d
    scale:    rhs2 = d * x_{k-1}
    backward: y_0 = rhs2 / d; y_{s+1} = (rhs2 - U y_s) / d

— into one grid pass using *halo-deepened* windows: each 512-row output
block loads its inputs widened by margin >= sweeps x (offset reach) rows
and runs every sweep locally in a VMEM scratch; the overlap
recomputation (2·margin/512) buys the elimination of all cross-sweep
kernel boundaries.  Operands stream HBM→VMEM with double-buffered DMA
(the ops/pallas_spmv.py streamed-DIA pattern), so the kernel works at
any n with a small VMEM footprint.

Correctness at the array edges relies on the padded layout's guard
blocks (PaddedDIA lblk/rblk) exactly like ``_dia_padded_kernel``:
clamped window bases only misalign pad-block rows, whose diagonal values
and inv-diagonal entries are zero, and sweep-edge contamination never
reaches the written center (margin covers the dependency cone).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spmv import _LANE, _lane_shifted

__all__ = ["sgs_apply_fused"]


def _align8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _pick_block(tot_rows: int) -> int:
    """Largest block (rows) dividing the padded layout: fewer grid steps
    amortise the per-block DMA issue/wait overhead (7 copies per step)."""
    for blk in (4096, 2048, 1024, 512):
        if tot_rows % blk == 0:
            return blk
    return 512


def _make_kernel(
    *, l_shifts, u_shifts, nd_l: int, nd_u: int, sweeps: int,
    win: int, margin: int, m0: int, upd: int, n_grid: int, rows_blk: int,
    use_mid: bool = True,
):
    """Fused sweep-pair kernel.  ``use_mid=True`` is the SGS shape
    (shared inverse diagonal, middle D-scale); ``use_mid=False`` is the
    LU/Cholesky factor-pair shape (per-direction inverse diagonals, the
    forward result feeds the backward solve directly)."""
    def term(buf_getter, shifts, nd, x_buf):
        """sum_d diag_w[d] * shifted(x) over the update region."""
        acc = None
        for d in range(nd):
            s8, rot = shifts[d]
            w = x_buf[m0 + s8 : m0 + s8 + upd + 1, :]
            t = buf_getter(d)[m0 : m0 + upd, :] * _lane_shifted(w, rot, upd)
            acc = t if acc is None else acc + t
        return acc

    n_vec = 4 if use_mid else 3  # r, invd_l[, invd_u | mid] streams

    def kernel(*refs):
        if use_mid:
            (r_hbm, invd_hbm, dscale_hbm, ld_hbm, ud_hbm, out_ref,
             r_buf, invd_buf, dscale_buf, ld_buf, ud_buf, x_buf, sems) = refs
            invdu_hbm, invdu_buf = invd_hbm, invd_buf  # shared diagonal
        else:
            (r_hbm, invd_hbm, invdu_hbm, ld_hbm, ud_hbm, out_ref,
             r_buf, invd_buf, invdu_buf, ld_buf, ud_buf, x_buf, sems) = refs
            dscale_hbm = dscale_buf = None
        j = pl.program_id(0)
        xrows = r_hbm.shape[0]

        def copies(slot, jj):
            base = jnp.clip(jj * rows_blk - margin, 0, xrows - win)
            out = [
                pltpu.make_async_copy(
                    r_hbm.at[pl.ds(base, win), :], r_buf.at[slot],
                    sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    invd_hbm.at[pl.ds(base, win), :], invd_buf.at[slot],
                    sems.at[slot, 1],
                ),
            ]
            if use_mid:
                out.append(pltpu.make_async_copy(
                    dscale_hbm.at[pl.ds(base, win), :], dscale_buf.at[slot],
                    sems.at[slot, 2],
                ))
            else:
                out.append(pltpu.make_async_copy(
                    invdu_hbm.at[pl.ds(base, win), :], invdu_buf.at[slot],
                    sems.at[slot, 2],
                ))
            for d in range(nd_l):
                out.append(pltpu.make_async_copy(
                    ld_hbm.at[d, pl.ds(base, win), :], ld_buf.at[slot, d],
                    sems.at[slot, 3 + d],
                ))
            for d in range(nd_u):
                out.append(pltpu.make_async_copy(
                    ud_hbm.at[d, pl.ds(base, win), :], ud_buf.at[slot, d],
                    sems.at[slot, 3 + nd_l + d],
                ))
            return out

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

        invd_l = invd_buf[slot]
        invd_u = invd_l if use_mid else invdu_buf[slot]

        # forward sweeps in the x scratch; rows outside the update region
        # go stale — the margin keeps the contamination cone away from
        # the written center rows
        x_buf[:, :] = r_buf[slot] * invd_l
        for _ in range(sweeps - 1):
            acc = term(lambda d: ld_buf[slot, d], l_shifts, nd_l, x_buf)
            x_buf[m0 : m0 + upd, :] = (
                r_buf[slot, m0 : m0 + upd, :] - acc
            ) * invd_l[m0 : m0 + upd, :]
        # rhs2 overwrites the r buffer slot (no longer needed): the SGS
        # middle D-scale, or the forward result directly for factor pairs
        if use_mid:
            r_buf[slot, :, :] = dscale_buf[slot] * x_buf[:, :]
        else:
            r_buf[slot, :, :] = x_buf[:, :]
        x_buf[:, :] = r_buf[slot] * invd_u
        for _ in range(sweeps - 1):
            acc = term(lambda d: ud_buf[slot, d], u_shifts, nd_u, x_buf)
            x_buf[m0 : m0 + upd, :] = (
                r_buf[slot, m0 : m0 + upd, :] - acc
            ) * invd_u[m0 : m0 + upd, :]

        base = jnp.clip(j * rows_blk - margin, 0, xrows - win)
        off = j * rows_blk - base  # center start inside the window
        out_ref[:, :] = x_buf[pl.ds(off, rows_blk), :]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def sgs_apply_fused(psgs, r_padded: jnp.ndarray, *, interpret: bool = False):
    """z = M^{-1} r for a PaddedSGS, fused into one Pallas grid pass.

    ``r_padded``/result live in the padded 2-D layout (PaddedDIA).
    """
    pL, pU = psgs.p_lower, psgs.p_upper
    if pL is None and pU is None:
        return r_padded * psgs.inv_diag_p
    tot_rows = r_padded.shape[0]
    rows_blk = _pick_block(tot_rows)
    n_grid = tot_rows // rows_blk
    dtype = r_padded.dtype

    def shifts_of(p):
        if p is None:
            return ((0, 0),)
        return tuple((off // _LANE, off % _LANE) for off in p.offsets)

    l_shifts = shifts_of(pL)
    u_shifts = shifts_of(pU)
    all_s8 = [abs(s) for s, _ in l_shifts + u_shifts]
    reach = max(all_s8) + 1
    m0 = _align8(reach + 1)
    margin = _align8(m0 + (psgs.sweeps - 1) * reach + 8)
    win = rows_blk + 2 * margin
    upd = win - 2 * m0
    if tot_rows < win:
        # matrix smaller than one halo-deep window: the compositional
        # apply is cheap at this size and avoids degenerate windows
        return psgs.apply_padded(r_padded, resident=True, interpret=interpret)
    if psgs.lead // _LANE < m0:
        # the correctness argument requires the first m0 window rows to
        # be layout guard rows (zero diags/inv-diag); with extreme
        # offsets the lead padding may not cover them — fall back
        return psgs.apply_padded(r_padded, resident=True, interpret=interpret)

    ld = pL.diags3 if pL is not None else jnp.zeros((1, tot_rows, _LANE), dtype)
    ud = pU.diags3 if pU is not None else jnp.zeros((1, tot_rows, _LANE), dtype)
    nd_l, nd_u = ld.shape[0], ud.shape[0]

    kernel = _make_kernel(
        l_shifts=l_shifts, u_shifts=u_shifts, nd_l=nd_l, nd_u=nd_u,
        sweeps=psgs.sweeps, win=win, margin=margin, m0=m0, upd=upd,
        n_grid=n_grid, rows_blk=rows_blk,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tot_rows, _LANE), dtype),
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win, _LANE), dtype),
            pltpu.VMEM((2, win, _LANE), dtype),
            pltpu.VMEM((2, win, _LANE), dtype),
            pltpu.VMEM((2, nd_l, win, _LANE), dtype),
            pltpu.VMEM((2, nd_u, win, _LANE), dtype),
            pltpu.VMEM((win, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2, 3 + nd_l + nd_u)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        r_padded,
        psgs.inv_diag_p.astype(dtype),
        psgs.diag_p.astype(dtype),
        ld.astype(dtype),
        ud.astype(dtype),
    )
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def tri_pair_apply_fused(pair, r_padded: jnp.ndarray, *, interpret: bool = False):
    """z = (L U)^{-1} r for a PaddedTriPair (IC0: U = L^T; ILU0: unit-L,
    U) — forward then backward Jacobi sweeps fused into one grid pass
    (same halo-deep architecture as :func:`sgs_apply_fused`)."""
    pL, pU = pair.p_lower, pair.p_upper
    tot_rows = r_padded.shape[0]
    rows_blk = _pick_block(tot_rows)
    n_grid = tot_rows // rows_blk
    dtype = r_padded.dtype

    def shifts_of(p):
        if p is None:
            return ((0, 0),)
        return tuple((off // _LANE, off % _LANE) for off in p.offsets)

    l_shifts = shifts_of(pL)
    u_shifts = shifts_of(pU)
    all_s8 = [abs(s) for s, _ in l_shifts + u_shifts]
    reach = max(all_s8) + 1
    m0 = _align8(reach + 1)
    margin = _align8(m0 + (pair.sweeps - 1) * reach + 8)
    win = rows_blk + 2 * margin
    upd = win - 2 * m0
    if tot_rows < win or pair.lead // _LANE < m0:
        return pair.apply_padded_compositional(r_padded, interpret=interpret)

    ld = pL.diags3 if pL is not None else jnp.zeros((1, tot_rows, _LANE), dtype)
    ud = pU.diags3 if pU is not None else jnp.zeros((1, tot_rows, _LANE), dtype)
    nd_l, nd_u = ld.shape[0], ud.shape[0]

    kernel = _make_kernel(
        l_shifts=l_shifts, u_shifts=u_shifts, nd_l=nd_l, nd_u=nd_u,
        sweeps=pair.sweeps, win=win, margin=margin, m0=m0, upd=upd,
        n_grid=n_grid, rows_blk=rows_blk, use_mid=False,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tot_rows, _LANE), dtype),
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec((rows_blk, _LANE), lambda j: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win, _LANE), dtype),
            pltpu.VMEM((2, win, _LANE), dtype),
            pltpu.VMEM((2, win, _LANE), dtype),
            pltpu.VMEM((2, nd_l, win, _LANE), dtype),
            pltpu.VMEM((2, nd_u, win, _LANE), dtype),
            pltpu.VMEM((win, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2, 3 + nd_l + nd_u)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        r_padded,
        pair.inv_diag_l_p.astype(dtype),
        pair.inv_diag_u_p.astype(dtype),
        ld.astype(dtype),
        ud.astype(dtype),
    )
    return out
