"""On-chip W-SELL configuration sweep (VERDICT r3 item 4).

The host-side ablation (wsell_layout_ablation.py) showed wider windows
stack with bounded reduction on the 17.5M-nnz jittered Laplacian:

  F=1 nway=4 : slot_ratio 2.620  (round-3 production default)
  F=2 nway=4 : 2.365   F=4 nway=4 : 2.234   F=4 nway=8 : 2.133

(the colouring bound is 2.11).  Wider F costs extra window-select
stages in the kernel, wider nway extra rotation stages — this measures
the end-to-end GNNZ/s of each candidate on hardware to pick the
production default (target: >=18 GNNZ/s, ~70-75%% of the HBM roofline).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from sparse_matrix_math_tpu.formats.wsell import wsell_from_csr
from sparse_matrix_math_tpu.utils.generate import laplace_3d_jittered

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _time_spmv_loop  # marginal-slope, scalar-readback timing


def main():
    ua = laplace_3d_jittered(113, dtype=np.float32, symmetric=True, shift=0.25)
    nnz = ua.nnz
    x = jnp.ones((ua.shape[1],), jnp.float32)
    print(f"n={ua.shape[0]} nnz={nnz}", flush=True)

    for window_f, nway in ((1, 4), (2, 4), (4, 4), (4, 8), (2, 8)):
        try:
            t0 = time.time()
            ws = wsell_from_csr(
                ua, nway=nway, window_f=window_f, nway_min_gain=0.0,
                max_slot_ratio=16.0,
            )
            build = time.time() - t0
            sec = _time_spmv_loop(ws, x, 20)
            print(
                f"F={window_f} nway={nway}: slot_ratio={ws.slot_ratio:.3f} "
                f"spmv={sec*1e3:.3f} ms  {nnz/sec/1e9:.2f} GNNZ/s "
                f"(build {build:.0f}s)",
                flush=True,
            )
            del ws
        except Exception as e:
            print(f"F={window_f} nway={nway}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
