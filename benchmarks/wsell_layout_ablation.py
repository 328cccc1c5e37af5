"""Host-side W-SELL layout ablation for the round-4 densification lever
(VERDICT r3 item 4): how much slot_ratio do wider windows (window_f) and
wider bounded reduction (nway) buy on the 17.5M-nnz jittered Laplacian,
and how much of the remaining gap is per-job ceil-to-vreg quantization
(the "cross-job row merging" headroom)?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")  # host-side layout work only
import numpy as np

from sparse_matrix_math_tpu.utils.generate import laplace_3d_jittered
from sparse_matrix_math_tpu.formats.wsell import wsell_from_csr

ua = laplace_3d_jittered(113, dtype=np.float32, symmetric=True, shift=0.25)
print(f"n={ua.shape[0]} nnz={ua.nnz}", flush=True)

for window_f in (1, 2, 4):
    for nway in (1, 4, 8):
        t0 = time.time()
        try:
            ws = wsell_from_csr(
                ua, nway=nway, window_f=window_f, nway_min_gain=0.0,
                max_slot_ratio=16.0,
            )
            print(
                f"F={window_f} nway={nway}: slot_ratio={ws.slot_ratio:.3f} "
                f"vregs={ws.n_vregs} build={time.time()-t0:.1f}s",
                flush=True,
            )
        except Exception as e:
            print(f"F={window_f} nway={nway}: FAILED {e!r}", flush=True)
