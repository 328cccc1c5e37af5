from .csr import CSRMatrix, csr_from_coo, csr_from_dense, csr_from_triplet
from .dia import DIAMatrix, dia_from_csr, try_dia_from_csr
from .ell import ELLMatrix, ell_from_csr
from .hyb import HYBMatrix, hyb_from_csr
from .wsell import WSellMatrix, try_wsell_from_csr, wsell_from_csr
from .triplet import COOArrays, TripletMatrix, coo_from_arrays


def best_format(csr, *, max_slot_ratio: float = 8.0):
    """Pick the fastest TPU layout for a CSR matrix's pattern.

    Selection order mirrors the measured kernel hierarchy
    (docs/BENCH_NOTES.md):

    1. DIA — diagonal-structured patterns (stencils): the Pallas padded
       kernels run in-solver at HBM bandwidth;
    2. W-SELL — general patterns with window locality (banded-broken,
       mesh-like, reservoir-class): the two-step-gather kernel,
       >= 10x the reference CPU core;
    3. CSR itself — tile-sparse patterns W-SELL refuses (the XLA
       segment-sum path, plus the dense-MXU rescue at small n).

    The returned object plugs into every solver/``rmult`` call site.
    """
    dia = try_dia_from_csr(csr)
    if dia is not None:
        return dia
    ws = try_wsell_from_csr(csr, max_slot_ratio=max_slot_ratio)
    if ws is not None:
        return ws
    return csr
