"""R-SELL: the routed sliced-ELL format for zero-locality patterns.

W-SELL (formats/wsell.py) serves any pattern whose (row-slab x
column-window) tiles are reasonably dense.  The adversarial limit —
uniform-random columns at low density, the round-2 "entropy wall"
(docs/BENCH_NOTES.md) — has ~3 nnz per 1024x1024 tile under ANY row or
column permutation, so every windowed layout pads by ~E (the bucket
fan-out) and the XLA gather fallback runs at ~0.06 GNNZ/s, below one CPU
core of the reference's pattern-agnostic row loop
(include/sparse_matrix_math.h:1458-1515).

R-SELL reaches such patterns by ROUTING: instead of gathering x[c]
directly (21+ bits of address entropy per access), the SpMV runs a chain
of K+1 Pallas gather passes, each paying only the ~10 bits a TPU vreg
gather can amortise:

  stream_0 = x
  stream_i = gather(stream_{i-1})   # routing pass: refine bucket digit i
  y        = W-SELL(final, stream_K)  # multiply by values + slab-accumulate

Each routing pass emits the matrix entries' source values reordered by
one more digit of their DESTINATION row (mixed-radix over row slabs),
keeping elements sorted by CURRENT position within each bucket — so
every output vreg's 1024 sources span one CONTIGUOUS aligned 8F-row
window stack of the input (one dynamic slice + the multi-window W-SELL
select, ops/pallas_rsell.py).  All routing indices are computed at build
time; the runtime is pure streaming.

The element→slot assignment per pass must satisfy the same per-vreg
constraints as W-SELL: one element per (row, out-lane); one window row
per (row, source-lane).  A closed-form packer (distinct-rank rows +
coprime-stride lane scatter, _pack_pass) satisfies both and keeps the
NEXT pass's per-lane histograms flat; the native smm_stream_pack_cf
computes the identical layout in linear time (the NumPy version is the
fallback and the executable specification).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..native import sort_perm_native, stream_level_native
from .csr import CSRMatrix
from .wsell import (
    LANE,
    SLAB,
    WSellMatrix,
    _distinct_rank,
    _group_rank,
    _pack_keys,
    _wsell_from_coo,
    chunk_for,
)

__all__ = ["RoutedMatrix", "routed_from_csr", "try_routed_from_csr"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StreamPass:
    """One routing pass: planes for ops/pallas_rsell.py:stream_gather."""

    vals: jnp.ndarray   # (V*8, 128) 1.0 at real slots, 0 padding
    meta: jnp.ndarray   # (V*8, 128) int32 packed SW|LSRC (W-SELL layout)
    base: jnp.ndarray   # (V,) int32 window-stack base row into the input
    x_rows: int = dataclasses.field(metadata=dict(static=True))
    window_f: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_vregs(self) -> int:
        return int(self.base.shape[0])

    @property
    def out_len(self) -> int:
        return self.n_vregs * SLAB


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RoutedMatrix:
    """Routed sliced-ELL sparse matrix (see module docstring)."""

    passes: Tuple[StreamPass, ...]
    final: WSellMatrix
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    # total slots moved per SpMV / nnz (routing streams + final layout)
    slot_ratio: float = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.final.dtype

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# stream-pass packer
# ---------------------------------------------------------------------------

def _pack_pass(group, sigma, lam, nd, pos, wrows):
    """Closed-form optimal packing of one routing pass.

    Within a (bucket, window stack) group, element (sigma, lam) gets

      row  = rank of its sigma among the DISTINCT sigmas at its source
             lane lam (duplicated sources share the rank),
      lane = stride-scattered rank within the (group, row), counted in
             (next-digit, position) order:  (rank*67 + row*53) % 128.

    Both kernel constraints hold by construction: each (row, source
    lane) carries exactly one window row (the sw claim), and the stride
    67 (coprime to 128) makes ranks a lane bijection per row.  Row count
    per group = max per-source-lane distinct-sigma count — the bipartite
    optimum.  The scatter is load-bearing for the CHAIN: a next-level
    bucket's elements occupy a CONSECUTIVE rank range per row, so the
    coprime stride spreads them evenly over all 128 lanes (with the
    row-rotation decorrelating rows) — the next pass then sees a FLAT
    per-source-lane histogram and packs at ~count/128 rows instead of
    paying a Poisson max (or, worse, a lane-band concentration).

    Rows hold at most 128 elements automatically (one per source lane)
    unless duplicated sources share a rank; the overflow loop re-ranks
    the excess into fresh rows.

    The native packer (smm_stream_pack_cf) computes the identical
    layout in linear time (streaming distinct-rank + per-group counting
    sorts); this NumPy version is the fallback and the executable
    specification.

    Returns (row_in_group, out_lane, rows_per_group)."""
    from ..native import stream_pack_cf_native

    if group.size:
        packed = stream_pack_cf_native(group, sigma, lam, nd, wrows)
        if packed is not None:
            return packed
    n_groups = int(group[-1]) + 1 if group.size else 0
    key_gl = _pack_keys((group, lam), (0, 7))
    row = _distinct_rank(key_gl, sigma, val_bits=7)
    out_lane = np.zeros_like(row)
    rows_per_group = np.zeros(n_groups, np.int64)
    live = np.ones(row.shape[0], bool)
    for _ in range(64):
        # lane = rank within (group, row) in (next-digit, pos) order
        order = np.argsort(
            _pack_keys((group, row, nd, pos), (0, 10, 7, 26)),
            kind="stable",
        )
        kr = _pack_keys((group, row), (0, 10))
        lane_sorted = _group_rank(kr[order])
        rank = np.empty_like(lane_sorted)
        rank[order] = lane_sorted
        fits = rank < LANE
        lane = (rank * 67 + (row + group) * 53) % LANE
        out_lane = np.where(live & fits, lane, out_lane)
        done = live & fits
        if rows_per_group.size:
            np.maximum.at(rows_per_group, group[done], row[done] + 1)
        live = live & ~fits
        if not live.any():
            break
        # overflow (duplicate-heavy rows): re-rank the excess into rows
        # past the group's current maximum
        base = rows_per_group[group[live]]
        sub = _distinct_rank(key_gl[live], sigma[live], val_bits=7)
        row = row.copy()
        row[live] = base + sub
    else:
        raise ValueError("R-SELL packer did not converge (duplicate flood)")
    return row, out_lane, rows_per_group


def _build_stream_pass(pos, bucket, nd, table_len, window_f, dtype,
                       grouped=None):
    """Lay out one routing pass (slot values are always 1.0 — a routing
    pass only moves data; the final W-SELL pass multiplies).

    pos:     current position of each element in the input table (sorted
             ascending within each bucket; bucket-major order overall)
    bucket:  dense nondecreasing bucket id per element
    nd:      next-level refinement digit per element (lane-run ordering)
    grouped: optional precomputed (group, sigma, lam, group_stack) from
             the fused level driver (smm_stream_level) — skips the
             grouping phase here
    Returns (StreamPass, new position per element).

    The per-element phases (grouping, packing, plane emission) run in
    the native library when available (smm_stream_group /
    smm_stream_pack_cf / smm_stream_emit); the NumPy expressions below
    are the fallback and the executable specification.
    """
    from ..native import stream_emit_native, stream_group_native

    wrows = 8 * window_f
    if grouped is None and pos.size:
        grouped = stream_group_native(wrows, bucket, pos)
        if grouped is not None:
            grouped = grouped[:4]
    if grouped is not None:
        group, sigma, lam, group_stack = grouped
    else:
        xrow = pos // LANE
        lam = pos % LANE
        stack = xrow // wrows
        # dense group id per (bucket, window stack) — inputs are sorted
        # by (bucket, pos) so the pair key is nondecreasing
        key = bucket * ((-(-table_len // LANE)) // wrows + 2) + stack
        new_group = np.zeros(key.shape[0], bool)
        if key.size:
            new_group[0] = True
            new_group[1:] = key[1:] != key[:-1]
        group = np.cumsum(new_group) - 1
        sigma = xrow - stack * wrows
        n_groups = int(group[-1]) + 1 if group.size else 0
        group_stack = np.zeros(n_groups, np.int64)
        if group.size:
            group_stack[group] = stack

    row_in_group, out_lane, rows_per_group = _pack_pass(
        group, sigma, lam, nd, pos, wrows
    )

    # per-group vreg-aligned row offsets
    rows_padded = _round_up(np.maximum(rows_per_group, 1), 8)
    row_off = np.cumsum(rows_padded) - rows_padded
    total_rows = int(rows_padded.sum()) if rows_padded.size else 8
    n_vregs = max(total_rows // 8, 1)
    chunk_unit = chunk_for(n_vregs, window_f)
    n_vregs_padded = _round_up(n_vregs, chunk_unit)
    total_rows_padded = n_vregs_padded * 8

    sw_bits = max(3, (wrows - 1).bit_length())
    vals_plane = np.zeros((total_rows_padded, LANE), dtype=dtype)
    meta = np.zeros((total_rows_padded, LANE), np.int32)
    out_pos = None
    if group.size:
        out_pos = stream_emit_native(
            sw_bits, group, row_off, row_in_group, out_lane, lam, sigma,
            vals_plane, meta,
        )
    if out_pos is None:
        row_global = row_off[group] + row_in_group if group.size else group
        out_pos = row_global * LANE + out_lane
        sw_plane = np.zeros((total_rows_padded, LANE), np.int32)
        lsrc_plane = np.zeros((total_rows_padded, LANE), np.int32)
        if group.size:
            vals_plane[row_global, out_lane] = 1.0
            lsrc_plane[row_global, out_lane] = lam.astype(np.int32)
            sw_plane[row_global, lam] = sigma.astype(np.int32)
        meta = (sw_plane | (lsrc_plane << sw_bits)).astype(np.int32)

    # per-vreg window-stack base rows; the table pads to a whole number
    # of stacks so no base ever needs clamping (which would shift window
    # contents against the precomputed sw meta)
    x_rows = _round_up(max(-(-table_len // LANE), wrows), wrows)
    if rows_padded.size:
        base_rows = np.repeat(group_stack * wrows, rows_padded // 8)
    else:
        base_rows = np.zeros(0, np.int64)
    base = np.zeros(n_vregs_padded, np.int32)
    base[: base_rows.shape[0]] = np.minimum(
        base_rows, max(x_rows - wrows, 0)
    ).astype(np.int32)

    sp = StreamPass(
        vals=jnp.asarray(vals_plane),
        meta=jnp.asarray(meta),
        base=jnp.asarray(base),
        x_rows=int(x_rows),
        window_f=int(window_f),
    )
    return sp, out_pos


# ---------------------------------------------------------------------------
# bucket-tree planner + chain builder
# ---------------------------------------------------------------------------

def _plan_digits(n, nnz, n_leaves, window_f, fill_target=4096):
    """Mixed-radix branching per routing pass.

    The FIRST pass reads x, whose source lanes are c%128 — effectively
    random — so its per-(group, lane) histogram is Poisson and the pack
    pads by max/mean; bigger groups (~``fill_target`` elements, per-lane
    mean 32) keep that under ~1.7x.  LATER passes read the previous
    stream, whose lane runs the packer balanced deliberately — their
    fan-out is limited only by the window span (E*1024*pad <= 8F*128).

    The constants were swept offline on the 1M/2M-row uniform-random
    benchmarks (total slots moved at fixed window_f is the runtime
    proxy): fill_target 4096 + margin 1.6 beat the first-cut
    8192 + 1.25 by 12% fewer slots AND one fewer pass at 2M rows
    (ratio 8.90 / 3 passes vs 10.11 / 4)."""
    span = 8 * window_f * LANE
    digits = []
    remaining = n_leaves
    # first pass: elements per stack = span * nnz / n (duplication!)
    per_stack = span * max(nnz, 1) / max(n, 1)
    e1 = max(int(per_stack / fill_target), 2)
    digits.append(min(e1, remaining))
    remaining = -(-remaining // digits[-1])
    # later passes: span-limited (pad margin ~1.6: a smaller fan-out
    # per pass packs tighter and converges in fewer passes overall)
    e_mid = max(int(span / (1024 * 1.6)), 2)
    while remaining > 1:
        digits.append(min(e_mid, remaining))
        remaining = -(-remaining // digits[-1])
    return digits


def routed_from_csr(
    csr: CSRMatrix,
    *,
    window_f: int = 16,
    max_slot_ratio: float = 16.0,
    leaf_slabs: Optional[int] = None,
    _digits: Optional[Tuple[int, ...]] = None,
    final_nway: int = 4,
    _final_nway_min_gain: float = 0.1,
) -> RoutedMatrix:
    """Build the routed chain for an arbitrary-pattern CSR matrix.

    ``window_f`` sets the per-vreg window-stack width for every pass
    (span = 1024*F positions).  ``leaf_slabs`` overrides how many
    1024-row output slabs form one leaf bucket (default: as many as keep
    the final pass's windows within one leaf segment).  ``_digits``
    overrides the mixed-radix plan — the distributed builder
    (parallel/dist_rsell.py) pins one global plan so every shard's chain
    has the same pass count and can stack under ``shard_map``."""
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    n_rows, n_cols = csr.shape
    nnz = int(csr.nnz)
    r = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr))
    c = np.asarray(csr.indices, dtype=np.int64)
    v = np.asarray(csr.data)
    dtype = v.dtype

    n_slabs = max(-(-n_rows // SLAB), 1)
    span = 8 * window_f * LANE
    if leaf_slabs is None:
        # final pass: a slab's sources spread over its whole leaf
        # segment (~nnz/slab * pad); keep that within ~60% of the span
        per_slab = max(nnz / n_slabs, 1.0)
        leaf_slabs = max(int(0.6 * span / (per_slab * 1.35)), 1)
    n_leaves = -(-n_slabs // leaf_slabs)
    leaf = np.minimum(r // SLAB // leaf_slabs, n_leaves - 1)

    digits = (
        list(_digits) if _digits is not None
        else _plan_digits(n_cols, nnz, n_leaves, window_f)
    )

    # mixed-radix digit path of each element's leaf id
    weights = []
    w = 1
    for d in reversed(digits):
        weights.append(w)
        w *= d
    weights = weights[::-1]

    passes = []
    pos = c.copy()
    prefix = np.zeros(nnz, np.int64)
    table_len = int(n_cols)
    order = np.arange(nnz, dtype=np.int64)
    slab_in_leaf = ((r // SLAB) % max(leaf_slabs, 1)).astype(np.int64)
    total_slots = 0
    prefix_card = 1  # number of distinct prefix values after the update
    for level, (d, wt) in enumerate(zip(digits, weights)):
        if level + 1 < len(digits):
            d_next, wt_next = digits[level + 1], weights[level + 1]
        else:
            d_next, wt_next = 1, -1
        prefix_card *= d
        # fused native level driver: prefix update + stable (prefix, pos)
        # sort of all carried arrays + nd + grouping in one call.
        # TIGHT key width: pos < table_len, so the radix sort runs
        # ceil(key_bits/11) passes — the old fixed pos_bits=38 forced
        # 4-5 passes where 3 suffice (measured ~1.8 s/level at 12M nnz,
        # the largest single cost of the routed build)
        pos_bits = max(int(table_len - 1).bit_length(), 1)
        key_bits = pos_bits + max(int(prefix_card - 1).bit_length(), 1)
        fused = None
        if nnz and key_bits <= 64:
            fused = stream_level_native(
                8 * window_f, d, wt, d_next, wt_next, pos_bits, key_bits,
                prefix, pos, order, leaf, slab_in_leaf,
            )
        if fused is not None:
            nd, group, sigma, lam, group_stack = fused
            sp, pos = _build_stream_pass(
                pos, prefix, nd, table_len, window_f, dtype,
                grouped=(group, sigma, lam, group_stack),
            )
        else:
            digit = (leaf // wt) % d
            prefix = prefix * d + digit
            sort_key = _pack_keys((prefix, pos), (0, 38))
            perm = sort_perm_native(sort_key) if nnz else None
            if perm is None:
                perm = np.argsort(sort_key, kind="stable")
            prefix, pos, order, leaf, slab_in_leaf = (
                prefix[perm], pos[perm], order[perm], leaf[perm],
                slab_in_leaf[perm],
            )
            # The NEXT-level digit orders each slot row's lanes
            # (contiguous lane runs per next bucket), keeping the next
            # pass's per-lane histograms flat — see _pack_pass.
            if level + 1 < len(digits):
                nd = (leaf // weights[level + 1]) % digits[level + 1]
            else:
                nd = slab_in_leaf
            sp, pos = _build_stream_pass(
                pos, prefix, nd, table_len, window_f, dtype
            )
        passes.append(sp)
        table_len = sp.out_len
        total_slots += sp.out_len

    # final pass: true W-SELL over (row, stream position) with the
    # matrix values — slab windows stay inside one leaf segment
    inv = np.empty(nnz, np.int64)
    inv[order] = np.arange(nnz)
    final = _wsell_from_coo(
        r, pos[inv], v, (int(n_rows), int(table_len)), nnz,
        max_slot_ratio=1e9,
        window_f=window_f,
        # bounded-reduction offered (formats/wsell.py); measured on the
        # uniform-random 12M-nnz chain the builder auto-bails to nway=1
        # (the routed stream fills buckets evenly — the chain is bound
        # by its routing passes, not the final multiply), but leaf
        # patterns with residual imbalance get the cut for free.  The
        # distributed builder pins a forced uniform value (min_gain=0)
        # so every shard reconstructs with one static nway.
        nway=final_nway,
        nway_min_gain=_final_nway_min_gain,
    )
    total_slots += final.n_vregs * SLAB
    slot_ratio = float(total_slots / max(nnz, 1))
    if slot_ratio > max_slot_ratio:
        raise ValueError(
            f"R-SELL routing pads too high for this pattern: "
            f"{slot_ratio:.1f} slots/nnz (> {max_slot_ratio})"
        )
    return RoutedMatrix(
        passes=tuple(passes),
        final=final,
        shape=(int(n_rows), int(n_cols)),
        nnz=nnz,
        slot_ratio=slot_ratio,
    )


def try_routed_from_csr(
    csr: CSRMatrix, *, max_slot_ratio: float = 16.0, **kwargs
) -> Optional[RoutedMatrix]:
    """routed_from_csr, or None when the chain would pad beyond the cap
    (mirrors try_wsell_from_csr's contract)."""
    try:
        return routed_from_csr(
            csr, max_slot_ratio=max_slot_ratio, **kwargs
        )
    except ValueError:
        return None
