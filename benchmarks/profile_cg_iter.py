"""Decompose the CG per-iteration cost on the bench system (VERDICT r3 item 1).

BENCH_r03: in-solver CG 164 us/iter vs 62.8 us standalone padded-DIA SpMV.
Hypotheses for the ~100 us/iter gap:
  (a) plain HBM traffic of the dots/axpys (unavoidable at this fusion level),
  (b) the per-iteration verify `lax.cond` blocking fusion,
  (c) the trace/carry machinery.

Methodology (bench.py's, exactly): scalar readback to force completion
(block_until_ready returns early on the tunneled runtime) and marginal
two-point slope (k vs 4k iterations) so the fixed ~28 ms dispatch+sync
round trip cancels.

Variants (all on the padded layout, identical matvec):
  spmv_only   : fori_loop of ap = 0.25 * matvec(p) only           -> floor
  pure_cg     : textbook recurrence (1 SpMV, 2 dots, 3 axpys), fori_loop
  pure_while  : same but while_loop with convergence predicate
  current     : cg_core as shipped (per-iter verify lax.cond)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparse_matrix_math_tpu.utils.generate import poisson_2d
from sparse_matrix_math_tpu.formats.dia import try_dia_from_csr
from sparse_matrix_math_tpu.ops.spmv import rmult
from sparse_matrix_math_tpu.ops.pallas_spmv import (
    pad_dia, dia_spmv_padded, dia_spmv_streamed, fits_in_vmem,
)

NX = 1414
K = 500  # slope points K and 4K


def build():
    a = poisson_2d(NX, dtype=np.float32)
    dia = try_dia_from_csr(a)
    pdia = pad_dia(dia)
    n = a.shape[0]
    b = rmult(dia, jnp.ones((n,), jnp.float32))
    return dia, pdia, b


def marginal(fn, *args):
    """Per-iteration device seconds: fn(k, *args) runs k iterations and
    returns something with a readable scalar; slope between K and 4K."""
    def timed(k):
        kj = jnp.int32(k)
        float(jnp.asarray(fn(kj, *args)).reshape(-1)[0])  # warm + force
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(jnp.asarray(fn(kj, *args)).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(4 * K) - timed(K), 1e-9) / (3 * K)


def main():
    dia, pdia, b = build()
    n = b.shape[0]
    resident = fits_in_vmem(pdia.n_total, b.dtype)
    mv = (dia_spmv_padded if resident else dia_spmv_streamed)

    def matvec(v):
        return mv(pdia, v)

    bp = pdia.to_padded(b)
    xp0 = jnp.zeros_like(bp)
    eps = jnp.float32(1e-30)  # never converges: fixed trip counts
    nnz = dia.nnz
    print(f"n={n} nnz={nnz} resident={resident}", flush=True)

    # --- spmv only ---
    @jax.jit
    def spmv_loop(k, p):
        def body(i, p):
            return matvec(p) * jnp.float32(0.25)
        return jax.lax.fori_loop(0, k, body, p)

    t = marginal(spmv_loop, bp)
    print(f"spmv_only : {t*1e6:8.1f} us/iter  ({nnz/t/1e9:6.1f} GNNZ/s)", flush=True)

    # --- pure textbook CG, fixed iteration count ---
    @jax.jit
    def pure_cg(k, bp, x0):
        r = bp - matvec(x0)
        rr = jnp.sum(r * r)

        def body(i, carry):
            x, r, p, rr = carry
            ap = matvec(p)
            pap = jnp.sum(ap * p)
            alpha = rr / pap
            x = x + alpha * p
            r = r - alpha * ap
            new_rr = jnp.sum(r * r)
            beta = new_rr / rr
            p = r + beta * p
            return x, r, p, new_rr

        x, r, p, rr = jax.lax.fori_loop(0, k, body, (x0, r, r, rr))
        return rr

    t = marginal(pure_cg, bp, xp0)
    print(f"pure_cg   : {t*1e6:8.1f} us/iter  (in-solver {nnz/t/1e9:6.1f} GNNZ/s)", flush=True)

    # --- pure CG while_loop with convergence predicate (no verify cond) ---
    @jax.jit
    def pure_cg_while(k, bp, x0):
        r = bp - matvec(x0)
        rr = jnp.sum(r * r)
        eps2 = eps * eps

        def cond(c):
            return (c[3] >= eps2) & (c[4] < k)

        def body(c):
            x, r, p, rr, i = c
            ap = matvec(p)
            pap = jnp.sum(ap * p)
            alpha = rr / pap
            x = x + alpha * p
            r = r - alpha * ap
            new_rr = jnp.sum(r * r)
            beta = new_rr / rr
            p = r + beta * p
            return x, r, p, new_rr, i + 1

        out = jax.lax.while_loop(cond, body, (x0, r, r, rr, jnp.int32(0)))
        return out[3]

    t = marginal(pure_cg_while, bp, xp0)
    print(f"pure_while: {t*1e6:8.1f} us/iter  (in-solver {nnz/t/1e9:6.1f} GNNZ/s)", flush=True)

    # --- current shipped core (verify cond per iteration) ---
    from sparse_matrix_math_tpu.solvers.cg import cg_core

    @jax.jit
    def current(k, bp, x0):
        res = cg_core(matvec, lambda u, v: jnp.sum(u * v), bp, x0, eps, 40000, False)
        # k-dependence: cap via eps trick not possible; instead run the
        # shipped core with maxiter=k by re-jitting — handled below.
        return res.residual_norm

    # cg_core takes maxiter statically; emulate the slope with two
    # static compiles
    def current_k(k):
        @jax.jit
        def run(bp, x0):
            res = cg_core(
                matvec, lambda u, v: jnp.sum(u * v), bp, x0, eps, int(k), False
            )
            return res.residual_norm

        float(run(bp, xp0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(bp, xp0))
            best = min(best, time.perf_counter() - t0)
        return best

    t = max(current_k(4 * K) - current_k(K), 1e-9) / (3 * K)
    print(f"current   : {t*1e6:8.1f} us/iter  (in-solver {nnz/t/1e9:6.1f} GNNZ/s)", flush=True)


if __name__ == "__main__":
    main()
