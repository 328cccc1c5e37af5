"""Nonsymmetric general-pattern PCG economics at scale (VERDICT r3 #7).

The round-3 W-SELL strict-sweep apply was proven for SGS on SPD systems;
this measures ILU(0) through the same strict W-SELL layouts on a >=1M-row
UNSTRUCTURED NONSYMMETRIC system — sherman1_tiled (block-diagonal
sherman1 copies with random column jitter, utils/generate.py), the
"oil reservoir at benchmark scale" class the reference's own
nonsymmetric coverage (sherman1, test/cpp/bicgstab.cpp) comes from.
Jittered values hit a data-dependent zero ILU0 pivot; since round 5 the
factorisation escalates through diagonal shifts
(ILU0Preconditioner.from_matrix pivot_shift='auto'), so the benchmark
runs the honest jittered system by default (--no-jitter restores the
round-4 curated variant).

Measured: plain vs ILU0-preconditioned BiCGStab and GMRES(32), f32, on
the W-SELL operator; results recorded in docs/BENCH_NOTES.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin shadows the env var; pin explicitly for CPU smokes
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sparse_matrix_math_tpu import bicgstab, gmres
from sparse_matrix_math_tpu.formats.wsell import try_wsell_from_csr
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.precond.preconditioners import ILU0Preconditioner
from sparse_matrix_math_tpu.utils.generate import sherman1_tiled

COPIES = 1100  # 1.1M rows


def timed(solver, op, b, eps, pre=None, maxiter=4000, reps=2):
    kw = {} if pre is None else {"preconditioner": pre}
    res = solver(op, b, max_iterations=maxiter, epsilon=eps, **kw)
    float(res.residual_norm)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        res = solver(op, b, max_iterations=maxiter, epsilon=eps, **kw)
        float(res.residual_norm)
        best = min(best, time.perf_counter() - t0)
    return res, best


def main(jitter=True, copies=COPIES):
    t0 = time.time()
    a = sherman1_tiled(copies, dtype=np.float32, jitter=jitter)
    print(f"matrix: n={a.shape[0]} nnz={a.nnz} build={time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    ws = try_wsell_from_csr(a, nway=4)
    op = ws if ws is not None else a
    print(f"wsell: slot_ratio={getattr(ws, 'slot_ratio', None)} "
          f"build={time.time()-t0:.1f}s", flush=True)

    x1 = jnp.ones((a.shape[0],), jnp.float32)
    b = rmult(op, x1)
    nb = float(jnp.linalg.norm(b))

    t0 = time.time()
    ilu = ILU0Preconditioner.from_matrix(a, sweeps=3)
    print(f"ilu0: factor+layout build={time.time()-t0:.1f}s "
          f"shift={ilu.shift:.3e} "
          f"L_wsell={ilu.lower.wsell is not None} "
          f"U_wsell={ilu.upper.wsell is not None}", flush=True)
    ilu6 = ILU0Preconditioner.from_matrix(a, sweeps=6)

    nnz = a.nnz
    for rel in (1e-4, 3e-6):
        eps = rel * nb
        print(f"-- relative tol {rel:.0e} (eps={eps:.3e})", flush=True)
        for name, solver, pre in (
            ("bicgstab_plain", bicgstab, None),
            ("bicgstab_ilu0s3", bicgstab, ilu),
            ("bicgstab_ilu0s6", bicgstab, ilu6),
            ("gmres32_plain", gmres, None),
            ("gmres32_ilu0s3", gmres, ilu),
            ("gmres32_ilu0s6", gmres, ilu6),
        ):
            try:
                res, wall = timed(solver, op, b, eps, pre)
                tr = float(jnp.linalg.norm(b - rmult(op, res.x)))
                print(
                    f"{name:18s} status={int(res.status)} "
                    f"iters={int(res.iterations)} true_rel="
                    f"{tr/nb:.2e} wall={wall:.3f}s",
                    flush=True,
                )
            except Exception as e:
                print(f"{name:18s} FAILED {e!r}", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-jitter", action="store_true",
                    help="round-4 curated variant (values on sherman1's "
                         "exact pattern)")
    ap.add_argument("--copies", type=int, default=COPIES,
                    help="sherman1 tile count (1100 = 1.1M rows)")
    args = ap.parse_args()
    main(jitter=not args.no_jitter, copies=args.copies)
