from .csr import CSRMatrix, csr_from_coo, csr_from_dense, csr_from_triplet
from .dia import DIAMatrix, dia_from_csr, try_dia_from_csr
from .ell import ELLMatrix, ell_from_csr
from .hyb import HYBMatrix, hyb_from_csr
from .rsell import RoutedMatrix, routed_from_csr, try_routed_from_csr
from .wsell import WSellMatrix, try_wsell_from_csr, wsell_from_csr
from .reorder import (
    ReorderedMatrix,
    permute_csr,
    rcm_permutation,
    reorder_to_wsell,
)
from .triplet import COOArrays, TripletMatrix, coo_from_arrays


def best_format(csr, *, max_slot_ratio: float = 8.0, allow_reorder: bool = True):
    """Pick the fastest TPU layout for a CSR matrix's pattern.

    Selection order mirrors the measured kernel hierarchy
    (docs/BENCH_NOTES.md):

    1. DIA — diagonal-structured patterns (stencils): the Pallas padded
       kernels run in-solver at HBM bandwidth;
    2. W-SELL — general patterns with window locality (banded-broken,
       mesh-like, reservoir-class): the two-step-gather kernel,
       >= 10x the reference CPU core;
    3. RCM + W-SELL — scattered patterns whose bandwidth a reverse
       Cuthill-McKee renumbering reduces (shuffled meshes, arbitrary
       node numberings); solvers hoist the permutation out of their
       loops (formats/reorder.py).  Skipped with ``allow_reorder=False``
       or for rectangular matrices;
    4. R-SELL — zero-tile-locality patterns at scale (uniform-random
       class): the routed multi-pass chain (formats/rsell.py), engaged
       only when the matrix is large enough that the XLA segment-sum
       path is hopeless and no windowed layout fits;
    5. CSR itself — small matrices (the dense-MXU rescue) and anything
       the routed chain cannot pack.

    The returned object plugs into every solver/``rmult`` call site.
    """
    dia = try_dia_from_csr(csr)
    if dia is not None:
        return dia
    ws = try_wsell_from_csr(csr, max_slot_ratio=max_slot_ratio)
    if ws is not None and ws.slot_ratio <= 3.0:
        # tight enough that a renumbering can't buy much
        return ws
    if allow_reorder and csr.shape[0] == csr.shape[1]:
        ro = reorder_to_wsell(csr, max_slot_ratio=max_slot_ratio)
        if ro is not None and (
            ws is None or ro.inner.slot_ratio < 0.7 * ws.slot_ratio
        ):
            # the kernel cost is proportional to slot_ratio and the
            # permutation is hoisted out of solver loops, so a clearly
            # lower reordered ratio wins; otherwise keep the raw layout
            # (no permutation plumbing at all)
            return ro
    if ws is not None:
        return ws
    # zero-locality at scale: below ~2048 rows the dense-MXU CSR rescue
    # wins outright; above it the XLA gather path is ~0.06 GNNZ/s, so a
    # routed chain at any sane ratio beats it
    if csr.shape[0] > 2048 and csr.nnz >= 100_000:
        ra = try_routed_from_csr(csr, max_slot_ratio=12.0)
        if ra is not None:
            return ra
    return csr
