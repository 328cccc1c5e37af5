"""W-SELL: windowed sliced-ELL — the TPU-native GENERAL sparse format.

The reference's one compute format is CSR walked by a scalar FMA row loop
(include/sparse_matrix_math.h:1458-1515) — pattern-agnostic, ~0.5 GNNZ/s
per CPU core.  A faithful CSR translation on TPU is gather-bound: XLA
lowers per-element gathers to a serial loop (~0.06 GNNZ/s at 10M nnz,
measured) because the TPU VPU has no general gather hardware.  What the
VPU *does* have (via Mosaic) is:

* ``dynamic_gather`` along sublanes of ONE vreg: ``take_along_axis(w8,
  idx, axis=0)`` with an (8, 128) table — select among 8 sublanes per
  lane;
* ``dynamic_gather`` along lanes: ``take_along_axis(z, idx, axis=1)`` —
  arbitrary per-row lane routing of an (R, 128) value;
* dynamic sublane slices of a VMEM-resident array.

W-SELL restructures SpMV so those three ops are sufficient:

1. ``x`` lives VMEM-resident as an ``(x_rows, 128)`` table (row = c//128,
   lane = c%128).
2. nnz are grouped into **jobs** = (row-slab of 1024 rows x one aligned
   1024-column window).  A job's slots occupy whole (8, 128) vregs; every
   vreg carries the job's window base (scalar-prefetched), so the kernel
   reads its 8-sublane x window with ONE dynamic slice.
3. Within a slot vreg, a slot for entry (r, c, v) sits at **lane r%128**
   (scatter-aligned).  The gather runs in two supported steps: axis-0
   select by the 3-bit sublane index stored per SOURCE lane, then axis-1
   routing from source lane c%128 to slot lane r%128.
4. Slot rows are placed by the STATIC-TARGET rule — a row holding rows
   of target sublane t sits at vreg position t — so each products vreg
   IS its (8, 128) y-slab contribution: the reduction is the identity,
   no scatter at all.  Consecutive vregs of the same slab accumulate
   into the VMEM-resident y.

Build-time constraints (per slot row: distinct source lanes unless the
column is identical; one slot per lane) are satisfied by a vectorised
greedy colouring with conflict-repair rounds; the resulting padding is
reported as ``slot_ratio`` (slots / nnz).  Diagonal-structured matrices
colour perfectly (each diagonal becomes one slot row — W-SELL degenerates
to DIA); random-within-window patterns pad by the max residue
multiplicity (~10-40%).  Matrices whose (slab, window) tiles are mostly
empty (uniform random at low density) pad badly — ``try_wsell_from_csr``
refuses above ``max_slot_ratio`` and callers keep the XLA path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .csr import CSRMatrix

__all__ = ["WSellMatrix", "wsell_from_csr", "try_wsell_from_csr"]

SLAB = 1024      # rows per output slab (8 sublanes x 128 lanes)
LANE = 128
WIN = 1024       # aligned column window (8 x-table sublane rows)

# meta bit layout (per slot-grid position), parameterised by the per-vreg
# window count F (``window_f``):
#   low bits   SW    sublane-in-window-stack of the column read through
#                    THIS lane — 0..8F-1 (3 + ceil(log2 F) bits)
#   next 7     LSRC  source lane (c % 128) of the slot AT this lane
# (the target sublane is implicit in the static-target layout: vreg
# position i holds only rows targeting y sublane i).  F = 1 reproduces the
# round-2 layout bit for bit (SW in bits 0-2, LSRC from bit 3).
_SW_BITS, _LSRC_SHIFT = 7, 3  # F = 1 constants (compat)


def _lsrc_shift(window_f: int) -> int:
    """Bit position of LSRC in the packed meta for an F-window matrix."""
    return max(3, (8 * window_f - 1).bit_length())

# vregs per kernel grid step; the builder pads the vreg count so the
# kernel's blocked streams need no per-call padding (ops/pallas_wsell.py)
CHUNK_VREGS = 256


def chunk_for(n_vregs: int, window_f: int) -> int:
    """Vregs per kernel grid step for an F-window matrix: scale the
    round-2 chunk down by the window factor (the kernel's wbuf scratch
    holds chunk*8F rows).  The builder pads the vreg count to a multiple
    of this so SpMV calls stream the planes as-is."""
    c = max(CHUNK_VREGS >> max(0, (window_f - 1).bit_length()), 1)
    return n_vregs if n_vregs <= c else c


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WSellMatrix:
    """Windowed sliced-ELL matrix (see module docstring for layout)."""

    vals: jnp.ndarray   # (V*8, 128) slot values (0 in padding)
    meta: jnp.ndarray   # (V*8, 128) int32 packed SW|LSRC
    base: jnp.ndarray   # (V,) int32 x-table sublane base per vreg
    slab: jnp.ndarray   # (V,) int32 nondecreasing output slab per vreg
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    n_slabs: int = dataclasses.field(metadata=dict(static=True))
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    slot_ratio: float = dataclasses.field(metadata=dict(static=True))
    # windows per vreg: each vreg reads ONE contiguous 8F-row x slice and
    # selects among its 8F sublanes (F = 1 is the round-2 format)
    window_f: int = dataclasses.field(default=1, metadata=dict(static=True))
    # bounded-reduction width (round 3, VERDICT r2 weak #3): how many
    # target sublanes a vreg position may serve.  1 = the round-2
    # static-target layout (position == target, zero reduction ops).
    # N > 1 stores a per-slot 3-bit SHIFT above LSRC in the meta and the
    # kernel routes products with (N-1) masked sublane rotations summed
    # into the slab — collisions are additions, so row placement is
    # unconstrained within each position group and the static-target
    # bucket imbalance (measured 1.89x padding on the 17.5M jittered
    # Laplacian) shrinks to the group-sum bound (docs/BENCH_NOTES.md).
    nway: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_vregs(self) -> int:
        return int(self.base.shape[0])

    def rmult(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import spmv as _spmv

        return _spmv.rmult(self, x)

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.rmult(x)

    def to_dense(self) -> jnp.ndarray:
        """Densify by probing columns (test/debug sizes only)."""
        n_rows, n_cols = self.shape
        eye = jnp.eye(n_cols, dtype=self.dtype)
        cols = [self.rmult(eye[:, j]) for j in range(n_cols)]
        return jnp.stack(cols, axis=1)


def _pack_keys(keys: Tuple[np.ndarray, ...], bits: Tuple[int, ...]) -> np.ndarray:
    """Pack multiple non-negative int keys into one int64 sort key (a
    single argsort is several times faster than np.lexsort at 10M+ nnz)."""
    out = keys[0].astype(np.int64)
    for k, b in zip(keys[1:], bits[1:]):
        out = (out << b) | k.astype(np.int64)
    return out


def _group_rank(key: np.ndarray) -> np.ndarray:
    """Occurrence index of each element within its key group (vectorised)."""
    n = key.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    change = np.zeros(n, bool)
    change[0] = True
    change[1:] = ks[1:] != ks[:-1]
    idx = np.arange(n)
    start = np.maximum.accumulate(np.where(change, idx, 0))
    rank = idx - start
    out = np.empty(n, np.int64)
    out[order] = rank
    return out


def _distinct_rank(key: np.ndarray, val: np.ndarray, val_bits: int = 3) -> np.ndarray:
    """Rank of ``val`` among the DISTINCT values within each key group
    (equal values share a rank).  ``val`` must fit ``val_bits`` (the
    callers use the 3-bit window sublane — distinct columns within a
    (job, t, source-lane) group differ exactly in it)."""
    n = val.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    order = np.argsort((key << val_bits) | val.astype(np.int64), kind="stable")
    ks = key[order]
    change = np.zeros(n, bool)
    change[0] = True
    change[1:] = ks[1:] != ks[:-1]
    vs = val[order]
    newval = change.copy()
    newval[1:] |= vs[1:] != vs[:-1]
    idx = np.arange(n)
    start = np.maximum.accumulate(np.where(change, idx, 0))
    cs = np.cumsum(newval)
    rank = cs - cs[start]  # 0 at group start (newval[start] is True)
    out = np.empty(n, np.int64)
    out[order] = rank
    return out


def _repair_conflicts(
    row, job, t_of, lane_out, lsrc, sw3, max_repair_rounds: int,
    sw_bits: int = 3,
):
    """Bump-repair rounds for the NumPy colouring fallback: resolve slots
    landing on the same (job, t, row, lane) or violating the one-window-
    sublane-per-source-lane rule (see wsell_from_csr)."""
    _ROW_BITS = 14  # repair bumps stay far below 2^14 rows
    for _ in range(max_repair_rounds):
        # conflict A: two slots at the same (job, t, row, lane)
        dup_a = _group_rank(
            _pack_keys((job, t_of, row, lane_out), (0, 3, _ROW_BITS, 7))
        )
        # conflict B: same (job, t, row, source lane) but different column
        dup_b = _distinct_rank(
            _pack_keys((job, t_of, row, lsrc), (0, 3, _ROW_BITS, 7)), sw3,
            val_bits=sw_bits,
        )
        conflict = (dup_a > 0) | (dup_b > 0)
        if not conflict.any():
            return row
        row[conflict] += np.maximum(dup_a, dup_b)[conflict]
        if row.max() >= (1 << _ROW_BITS):
            raise ValueError(
                "W-SELL colouring blew past the row budget "
                "(pattern too adversarial)"
            )
    raise ValueError(
        "W-SELL colouring did not converge "
        f"(pattern too adversarial after {max_repair_rounds} rounds)"
    )


def _window_jobs(slab_of: np.ndarray, xrow: np.ndarray, x_rows: int,
                 window_f: int = 1):
    """Group nnz into (slab, aligned 8F-x-row window stack) jobs.

    Returns (job id per nnz [dense, slab-sorted], window base per job,
    slab per job).
    """
    n = slab_of.shape[0]
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy()
    # ALIGNED 8F-x-row windows: job = (slab, xrow // 8F).  An unaligned
    # greedy grouping was tried and measured WORSE (round-2 notes): it
    # splits band clusters at data-dependent boundaries that concentrate
    # rows into single target sublanes (heavy static-target padding) and
    # destabilises the colouring repair on near-diagonal patterns.
    wrows = 8 * window_f
    wdim = np.int64((x_rows + wrows - 1) // wrows + 1)
    aligned = slab_of * wdim + xrow // wrows
    key_span = int(slab_of.max() + 1) * int(wdim)
    if key_span <= max(4 * n, 1 << 26):
        # O(nnz) flag-based unique: the (slab, window) key space is small
        # relative to nnz, so a dense presence map beats the sort-based
        # np.unique by ~50x at 10M+ nnz
        flags = np.zeros(key_span, bool)
        flags[aligned] = True
        ujobs = np.flatnonzero(flags)
        pos = np.cumsum(flags, dtype=np.int64) - 1
        jinv = pos[aligned]
    else:
        ujobs, jinv = np.unique(aligned, return_inverse=True)
        jinv = jinv.astype(np.int64)
    base = np.minimum((ujobs % wdim) * wrows, x_rows - wrows)
    return (
        jinv,
        base.astype(np.int64),
        (ujobs // wdim).astype(np.int64),
    )


def wsell_from_csr(
    csr: CSRMatrix,
    *,
    max_slot_ratio: float = 8.0,
    max_repair_rounds: int = 200,
    window_f: int = 1,
    nway: int = 1,
    nway_min_gain: float = 0.1,
) -> WSellMatrix:
    """Host-side layout transform CSR -> W-SELL.

    Raises ValueError when the pattern pads worse than ``max_slot_ratio``
    slots per nnz (tile-sparse patterns W-SELL cannot serve well).
    ``window_f`` widens each vreg's x window to F aligned 8-row slices
    (the kernel then selects among 8F sublanes) — wider windows trade
    select ops for tile density on scattered patterns.  ``nway``
    (1/2/4/8) bounds how many target sublanes a vreg position may serve
    (see WSellMatrix.nway) — wider nway trades (nway-1) masked sublane
    rotations per vreg for less static-target padding.
    """
    # host-side row ids from indptr: np.asarray(csr.row_ids) would
    # materialise a device computation (measured ~10s+ at 17.5M nnz on
    # the CPU backend); np.repeat over the host indptr is ~100ms
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    n_rows, n_cols = csr.shape
    r = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr))
    c = np.asarray(csr.indices, dtype=np.int64)
    v = np.asarray(csr.data)
    return _wsell_from_coo(
        r, c, v, (int(n_rows), int(n_cols)), int(csr.nnz),
        max_slot_ratio=max_slot_ratio,
        max_repair_rounds=max_repair_rounds,
        window_f=window_f,
        nway=nway,
        nway_min_gain=nway_min_gain,
    )


def _wsell_from_coo(
    r: np.ndarray,
    c: np.ndarray,
    v: np.ndarray,
    shape: Tuple[int, int],
    nnz: int,
    *,
    max_slot_ratio: float = 8.0,
    max_repair_rounds: int = 200,
    window_f: int = 1,
    nway: int = 1,
    nway_min_gain: float = 0.1,
) -> WSellMatrix:
    """Core W-SELL layout builder over host COO arrays (row-sorted rows
    not required; ``wsell_from_csr`` and the routed-format builder both
    feed this).  ``nway_min_gain`` is the vreg-reduction fraction below
    which an nway>1 request auto-bails to the rotation-free nway=1
    layout; pass 0.0 to force the requested nway (the distributed
    builder needs uniform nway across shards)."""
    if window_f < 1 or window_f > 16:
        raise ValueError(f"window_f must be in [1, 16], got {window_f}")
    if nway not in (1, 2, 4, 8):
        raise ValueError(f"nway must be 1, 2, 4 or 8, got {nway}")
    n_rows, n_cols = shape
    wrows = 8 * window_f
    n_slabs = max(-(-n_rows // SLAB), 1)
    # pad the x table to a whole number of 8F-row window stacks so the
    # aligned job bases never clamp (a clamped base would shift window
    # contents against the precomputed sw meta)
    x_rows = max(_round_up(-(-n_cols // LANE), wrows), wrows)

    sw_bits = max(3, (wrows - 1).bit_length())
    plan = None
    if r.size:
        # fully fused native layout plan: window-job mapping + first-fit
        # slot-row colouring + per-job row counts in one call — skips
        # materialising the per-nnz int64 field arrays entirely
        from ..native import wsell_plan_native

        plan = wsell_plan_native(r, c, n_rows, x_rows, window_f)
    if plan is not None:
        job, row, job_rows, job_base, job_slab = plan  # row: int32 colour
        n_jobs = job_base.shape[0]
    else:
        slab_of = r // SLAB
        t_of = (r % SLAB) // LANE
        lane_out = r % LANE
        lsrc = c % LANE
        xrow = c // LANE
        job, job_base, job_slab = _window_jobs(
            slab_of, xrow, x_rows, window_f
        )
        n_jobs = job_base.shape[0]

        # -- slot-row colouring ------------------------------------------------
        # distinct columns within a (job, t, source-lane) group differ
        # exactly in the window-stack sublane (one aligned 8F-x-row
        # window stack per job)
        sw3 = ((c // LANE) % wrows).astype(np.int64)
        row = None
        if r.size:
            # native first-fit colourer: one pass, satisfies both
            # constraints by construction, and packs at least as tightly
            # as the rank+repair fallback below (~10x faster at 10M+ nnz)
            from ..native import wsell_color_native

            row_native = wsell_color_native(
                job, t_of, lane_out, lsrc, sw3, n_jobs
            )
            if row_native is not None:
                row = row_native.astype(np.int64)
        if row is None:
            # NumPy fallback: over-approximate with independent ranks,
            # then repair residual conflicts.
            # rank1: same (job, matrix row) slots must occupy distinct
            # slot rows
            rank1 = _group_rank(_pack_keys((job, r), (0, 27)))
            # rank2: within (job, t, source lane), distinct columns must
            # occupy distinct slot rows (equal columns share the SW
            # entry -> same row ok)
            key_jtl = _pack_keys((job, t_of, lsrc), (0, 3, 7))
            rank2 = _distinct_rank(key_jtl, sw3, val_bits=sw_bits)
            row = np.maximum(rank1, rank2)
            if r.size:
                row = _repair_conflicts(
                    row, job, t_of, lane_out, lsrc, sw3, max_repair_rounds,
                    sw_bits=sw_bits,
                )

        # -- per-job row layout --------------------------------------------------
        # STATIC-TARGET layout: vreg position i holds ONLY rows of target
        # sublane t == i, so the kernel's reduction is the identity (the
        # products vreg IS the slab contribution) — zero reduction ops.  A
        # job needs K = max_t rows_t vregs; bucket t's k-th row sits at
        # (vreg k, position t).  Cost: unbalanced buckets pad (slot_ratio
        # reports it); balanced patterns (stencils, meshes) pad ~nothing.
        job_rows = np.zeros(n_jobs, np.int64)  # = 8 * K(job)
        if r.size:
            # K(job) = max over t of rows_t — one row per (vreg, t) slot
            np.maximum.at(job_rows, job, (row + 1) * 8)

    # -- bounded-reduction placement (nway > 1) --------------------------------
    # With per-slot shift routing, collisions in the slab accumulate are
    # ADDITIONS, so coloured rows place freely within their position
    # group: group g (of 8/nway groups) owns positions {g + j*8/nway}
    # and serves the nway targets with the same residue.  A job then
    # needs max_g ceil(rows_in_group / nway) vregs instead of
    # max_t rows_t — measured on the 17.5M jittered Laplacian this cuts
    # slot_ratio 4.00 -> 2.99 (nway=2) / 2.61 (4) / 2.35 (8).
    row_in_job_nway = None
    shift_of = None
    if nway > 1 and r.size:
        row = np.asarray(row, dtype=np.int64)
        t_all = ((r % SLAB) // LANE).astype(np.int64)
        rt = np.zeros((n_jobs, 8), np.int64)
        np.maximum.at(rt, (job, t_all), row + 1)
        gsz = 8 // nway  # number of groups == positions per group stride
        offs = np.zeros((n_jobs, 8), np.int64)
        job_rows = np.zeros(n_jobs, np.int64)
        for g in range(gsz):
            cum = np.zeros(n_jobs, np.int64)
            for i in range(nway):
                t = g + i * gsz
                offs[:, t] = cum
                cum = cum + rt[:, t]
            job_rows = np.maximum(job_rows, -(-cum // nway) * 8)
        job_rows = np.maximum(job_rows, 8)
        # auto-bail when the imbalance win doesn't pay for the kernel's
        # (nway-1) rotations: ~5% per rotation measured, so demand at
        # least a 10% vreg reduction (nway_min_gain) before switching
        k1 = np.maximum(rt.max(axis=1), 1)
        if job_rows.sum() > (1.0 - nway_min_gain) * 8 * k1.sum():
            nway = 1
            job_rows = k1 * 8
        else:
            m_in_group = offs[job, t_all] + row
            p_of = (t_all % gsz) + (m_in_group % nway) * gsz
            shift_of = ((t_all - p_of) % 8).astype(np.int32)
            row_in_job_nway = (m_in_group // nway) * 8 + p_of

    kv = np.maximum(job_rows // 8, 1)  # vregs per job (K)

    # dummy jobs keep every slab's output block written (Pallas output
    # blocks are undefined unless some vreg writes them)
    have = np.zeros(n_slabs, bool)
    have[job_slab] = True
    dummy_slabs = np.nonzero(~have)[0]
    all_slab = np.concatenate([job_slab, dummy_slabs])
    all_base = np.concatenate([job_base, np.zeros(dummy_slabs.shape[0], np.int64)])
    all_kv = np.concatenate([kv, np.ones(dummy_slabs.shape[0], np.int64)])
    order_jobs = np.argsort(all_slab, kind="stable")
    all_slab, all_base, all_kv = (
        all_slab[order_jobs], all_base[order_jobs], all_kv[order_jobs]
    )
    vreg_start = np.cumsum(all_kv) - all_kv
    n_vregs = int(all_kv.sum())
    # chunk-align the vreg count at BUILD time so SpMV calls stream the
    # planes as-is (no per-call pad/copy of O(nnz) arrays)
    chunk_unit = chunk_for(n_vregs, window_f)
    if n_vregs > chunk_unit:
        n_vregs_padded = -(-n_vregs // chunk_unit) * chunk_unit
    else:
        n_vregs_padded = n_vregs

    # map each nnz's (real) job to its position in the final job order
    job_pos = np.empty(all_slab.shape[0], np.int64)
    job_pos[order_jobs] = np.arange(all_slab.shape[0])
    vreg_start_of_job = vreg_start[job_pos[:n_jobs]]

    total_rows = n_vregs_padded * 8
    vals_plane = np.zeros((total_rows, LANE), dtype=v.dtype)

    # per-vreg window base (already clamped into the padded x table);
    # chunk-pad vregs carry zero values and point at the last slab
    pad_v = n_vregs_padded - n_vregs
    base_vreg = np.concatenate([
        np.repeat(all_base.astype(np.int32), all_kv),
        np.zeros(pad_v, np.int32),
    ])
    slab_vreg = np.concatenate([
        np.repeat(all_slab.astype(np.int32), all_kv),
        np.full(pad_v, n_slabs - 1, np.int32),
    ])

    meta = None
    if plan is not None and r.size and nway == 1:
        # fused native scatter of both planes (validates the window
        # sublane range like the NumPy path's invariant check)
        from ..native import wsell_emit_native

        meta_plane = np.zeros((total_rows, LANE), np.int32)
        if wsell_emit_native(
            _lsrc_shift(window_f), wrows, r, c, v, job, row,
            vreg_start_of_job, base_vreg, vals_plane, meta_plane,
        ):
            meta = meta_plane
    if meta is None:
        if plan is not None:
            # plan succeeded but the emit dtype is unsupported (or the
            # nway placement remaps rows) — derive the per-nnz fields
            # the NumPy scatter needs
            t_of = (r % SLAB) // LANE
            lane_out = r % LANE
            lsrc = c % LANE
        if r.size:
            if row_in_job_nway is not None:
                row_in_job = row_in_job_nway
            else:
                row_in_job = row.astype(np.int64) * 8 + t_of
            row_global = vreg_start_of_job[job] * 8 + row_in_job
        else:
            row_global = np.zeros(0, np.int64)
        vals_plane[row_global, lane_out] = v
        lsrc_plane = np.zeros((total_rows, LANE), np.int32)
        lsrc_plane[row_global, lane_out] = lsrc.astype(np.int32)
        sw_plane = np.zeros((total_rows, LANE), np.int32)
        if r.size:
            sw = (
                c // LANE - base_vreg[row_global // 8].astype(np.int64)
            ).astype(np.int32)
            if sw.min(initial=0) < 0 or sw.max(initial=0) > wrows - 1:
                raise AssertionError(
                    f"window base math violated sw in [0, {wrows})"
                )
            sw_plane[row_global, lsrc] = sw
        meta = (
            sw_plane | (lsrc_plane << _lsrc_shift(window_f))
        ).astype(np.int32)
        if shift_of is not None:
            shift_plane = np.zeros((total_rows, LANE), np.int32)
            shift_plane[row_global, lane_out] = shift_of
            meta = meta | (
                shift_plane << (_lsrc_shift(window_f) + 7)
            ).astype(np.int32)

    slot_ratio = float(total_rows * LANE / max(nnz, 1))
    if slot_ratio > max_slot_ratio:
        raise ValueError(
            f"W-SELL padding too high for this pattern: {slot_ratio:.1f} "
            f"slots/nnz (> {max_slot_ratio}) — keep the CSR/ELL path"
        )

    return WSellMatrix(
        vals=jnp.asarray(vals_plane),
        meta=jnp.asarray(meta),
        base=jnp.asarray(base_vreg),
        slab=jnp.asarray(slab_vreg),
        shape=(int(n_rows), int(n_cols)),
        nnz=int(nnz),
        n_slabs=int(n_slabs),
        x_rows=int(x_rows),
        slot_ratio=slot_ratio,
        window_f=int(window_f),
        nway=int(nway),
    )


def try_wsell_from_csr(
    csr: CSRMatrix, *, max_slot_ratio: float = 8.0, nway: int = 4
) -> Optional[WSellMatrix]:
    """wsell_from_csr, or None when the pattern pads beyond the ratio cap
    (mirrors formats/dia.py:try_dia_from_csr's contract).

    The solver-facing default is ``nway=4``: on the 17.5M-nnz jittered
    Laplacian it cuts slot_ratio 4.01 -> 2.62 for 3 masked rotations per
    vreg, measured 15.8 vs 11.5 GNNZ/s (+37%; nway=8 saves more slots
    but the extra rotations eat the gain — docs/BENCH_NOTES.md round 3).
    Patterns that already pack near the colouring bound (stencils) lose
    nothing: the rotations only run when the layout stores shifts."""
    try:
        return wsell_from_csr(csr, max_slot_ratio=max_slot_ratio, nway=nway)
    except ValueError:
        return None
