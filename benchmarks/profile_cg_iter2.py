"""Round 2 of the CG iteration decomposition — artifact-free variants.

profile_cg_iter.py round 1 results (marginal slope, scalar readback):
  spmv_only(0.25 scale) 62.1us | pure_cg 42.3us | pure_while 42.1us |
  current(shipped core) 107.6us
But pure_cg/pure_while returned only rr, so XLA's while-loop simplifier
dead-code-eliminated the x update (24MB/iter saved); and the spmv loop's
0.25 rescale adds an unfused elementwise pass over the Pallas output.
These variants keep everything live and measure the bare kernel.
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
K = 500


def build():
    a = poisson_2d(NX, dtype=np.float32)
    dia = try_dia_from_csr(a)
    pdia = pad_dia(dia)
    n = a.shape[0]
    b = rmult(dia, jnp.ones((n,), jnp.float32))
    return dia, pdia, b


def marginal(fn, *args):
    def timed(k):
        kj = jnp.int32(k)
        float(jnp.asarray(fn(kj, *args)).reshape(-1)[0])
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
    nnz = dia.nnz
    print(f"n={n} nnz={nnz} resident={resident}", flush=True)

    # --- bare spmv: no rescale; normalise by rr to stop blow-up ---
    # using rsqrt(sum sq) keeps values bounded at the cost of one extra
    # reduction+scale — report both raw (inf blowup, timing-valid) and
    # normalised.
    @jax.jit
    def spmv_raw(k, p):
        def body(i, p):
            return matvec(p)
        out = jax.lax.fori_loop(0, k, body, p)
        return jnp.sum(out[:1, :1])

    t = marginal(spmv_raw, bp)
    print(f"spmv_raw   : {t*1e6:8.1f} us/iter  ({nnz/t/1e9:6.1f} GNNZ/s)", flush=True)

    # --- pure textbook CG with ALL carries live ---
    @jax.jit
    def pure_cg_live(k, bp, x0):
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
        return rr + jnp.sum(x[:1, :1]) + jnp.sum(r[:1, :1]) + jnp.sum(p[:1, :1])

    t = marginal(pure_cg_live, bp, xp0)
    print(f"pure_live  : {t*1e6:8.1f} us/iter  (in-solver {nnz/t/1e9:6.1f} GNNZ/s)", flush=True)

    # --- nested: inner pure while (live), outer verify/restart ---
    eps = jnp.float32(1e-30)

    @jax.jit
    def nested(k, bp, x0):
        eps2 = eps * eps

        def inner(x, r, p, rr, budget):
            def cond(c):
                return (c[3] >= eps2) & (c[4] < budget)

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

            return jax.lax.while_loop(
                cond, body, (x, r, p, rr, jnp.int32(0))
            )

        r0 = bp - matvec(x0)
        rr0 = jnp.sum(r0 * r0)

        def outer_cond(c):
            x, total, done, rounds = c
            return (~done) & (rounds < 8) & (total < k)

        def outer_body(c):
            x, total, done, rounds = c
            rt = bp - matvec(x)
            rrt = jnp.sum(rt * rt)
            x, r, p, rr, used = inner(x, rt, rt, rrt, k - total)
            rt2 = bp - matvec(x)
            t_rr = jnp.sum(rt2 * rt2)
            return x, total + used, t_rr < eps2, rounds + 1

        x, total, done, rounds = jax.lax.while_loop(
            outer_cond, outer_body,
            (x0, jnp.int32(0), rr0 < eps2, jnp.int32(0)),
        )
        return jnp.sum(x[:1, :1]) + total

    t = marginal(nested, bp, xp0)
    print(f"nested     : {t*1e6:8.1f} us/iter  (in-solver {nnz/t/1e9:6.1f} GNNZ/s)", flush=True)

    # --- fused single-pass variants to see where the floor is ---
    # axpy-pair + rr in one XLA pass vs separate
    @jax.jit
    def vec_ops_only(k, x, p, r, ap):
        def body(i, c):
            x, r = c
            alpha = jnp.float32(0.5)
            x2 = x + alpha * p
            r2 = r - alpha * ap
            return x2, r2
        x, r = jax.lax.fori_loop(0, k, body, (x, r))
        return jnp.sum(x[:1, :1]) + jnp.sum(r[:1, :1])

    t = marginal(vec_ops_only, bp, bp, bp, bp)
    print(f"axpy_pair  : {t*1e6:8.1f} us/iter  (2 axpys only)", flush=True)

    @jax.jit
    def dots_only(k, p, ap):
        def body(i, s):
            return s + jnp.sum(ap * p) + jnp.sum(p * p)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    t = marginal(dots_only, bp, bp)
    print(f"two_dots   : {t*1e6:8.1f} us/iter  (2 dots only)", flush=True)


if __name__ == "__main__":
    main()
