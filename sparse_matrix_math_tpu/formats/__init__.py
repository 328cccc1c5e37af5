from .csr import CSRMatrix, csr_from_coo, csr_from_dense, csr_from_triplet
from .dia import DIAMatrix, dia_from_csr, try_dia_from_csr
from .ell import ELLMatrix, ell_from_csr
from .hyb import HYBMatrix, hyb_from_csr
from .wsell import WSellMatrix, try_wsell_from_csr, wsell_from_csr
from .triplet import COOArrays, TripletMatrix, coo_from_arrays
