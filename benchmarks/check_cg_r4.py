"""Quick check: in-solver CG rate with the round-4 nested core on the
bench system (target: >= 110 GNNZ/s, VERDICT r3 item 1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from sparse_matrix_math_tpu import cg, bicgstab
from sparse_matrix_math_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.utils.generate import poisson_2d


def main():
    a = poisson_2d(1414, dtype=np.float32)
    nnz = a.nnz
    dia = try_dia_from_csr(a)
    x = jnp.ones((a.shape[0],), jnp.float32)
    b = rmult(dia, x)

    def timed(solver, **kw):
        res = solver(dia, b, max_iterations=6000, epsilon=1e-4, **kw)
        float(res.residual_norm)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = solver(dia, b, max_iterations=6000, epsilon=1e-4, **kw)
            float(res.residual_norm)
            times.append(time.perf_counter() - t0)
        return res, sorted(times)[1]

    res, wall = timed(cg)
    iters = int(res.iterations)
    print(
        f"cg: status={int(res.status)} iters={iters} "
        f"res={float(res.residual_norm):.3e} wall={wall:.3f}s "
        f"floor_hit={bool(res.floor_hit)} "
        f"in_solver_gnnz={iters * nnz / wall / 1e9:.1f}",
        flush=True,
    )

    from sparse_matrix_math_tpu.precond import PaddedSGS

    pre = PaddedSGS.from_dia(dia, sweeps=4)
    res, wall = timed(bicgstab, preconditioner=pre)
    iters = int(res.iterations)
    work = iters * (2 * nnz + 2 * (pre.sweeps - 1) * (nnz - a.shape[0]))
    print(
        f"bicgstab+sgs4: status={int(res.status)} iters={iters} "
        f"res={float(res.residual_norm):.3e} wall={wall:.3f}s "
        f"floor_hit={bool(res.floor_hit)} "
        f"in_solver_gnnz={work / wall / 1e9:.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
