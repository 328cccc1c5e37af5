"""HBM-regime accounting for the 3-D 100M-nnz stencil CG (VERDICT r4 #2).

At n=14.35M (243^3, f32) every vector is 57.4 MB — nothing fits VMEM, so
an iteration's cost is its HBM traffic.  This script measures the
primitive passes (stencil apply, axpy, dot, fused pairs) by the same
marginal two-point method bench.py uses, then the composed CG iteration,
and prints the traffic model next to the measurements so the gap (if
any) is attributable.

Run on the TPU:  python benchmarks/profile_3d_hbm.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M3 = 243
N = M3 ** 3
VEC_MB = N * 4 / 1e6


def marginal(fn, state, iters, scale=3):
    """Device seconds per op: marginal cost between iters and 4*iters
    repetitions inside one jitted fori_loop (sync floor cancels)."""

    @jax.jit
    def loop(s, k):
        return jax.lax.fori_loop(0, k, lambda i, t: fn(t), s)

    def timed(k):
        out = loop(state, jnp.int32(k))
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = loop(state, jnp.int32(k))
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(4 * iters) - timed(iters), 1e-9) / (3 * iters)


def main():
    from sparse_matrix_math_tpu import GridStencilMatrix

    st = GridStencilMatrix(
        coeffs=jnp.asarray([6.0, -1, -1, -1, -1, -1, -1], jnp.float32),
        doffs=((0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0),
               (0, 1, 0), (0, 0, -1), (0, 0, 1)),
        dims=(M3, M3, M3), shape=(N, N), nnz=7 * N,
    )
    key = jax.random.PRNGKey(0)
    xg = jax.random.normal(key, (M3, M3, M3), jnp.float32)
    print(f"n={N} ({VEC_MB:.1f} MB/vector)")

    # 1. bare stencil apply (expected: read x + write y = 2 passes)
    t = marginal(lambda g: st.apply_grid(g) * 0.25, xg, 20)
    print(f"stencil apply:        {t*1e3:8.4f} ms  "
          f"({2*VEC_MB/1e3/t:6.0f} GB/s at 2 passes)")

    # 2. axpy x + 0.5*y (read 2 + write 1 = 3 passes)
    def axpy(s):
        x, y = s
        return (x + jnp.float32(0.5) * y, y)

    t = marginal(axpy, (xg, xg + 1.0), 20)
    print(f"axpy:                 {t*1e3:8.4f} ms  "
          f"({3*VEC_MB/1e3/t:6.0f} GB/s at 3 passes)")

    # 3. dot (read 2 = 2 passes; result scalar)
    def dotstep(s):
        x, acc = s
        return (x, acc + jnp.sum(x * x) * 1e-9)

    t = marginal(dotstep, (xg, jnp.float32(0.0)), 20)
    print(f"dot:                  {t*1e3:8.4f} ms  "
          f"({2*VEC_MB/1e3/t:6.0f} GB/s at 2 passes)")

    # 4. stencil + fused pap dot (read p, write ap, dot reads both in
    #    the same pass if fused: ~2 passes)
    def mv_dot(s):
        p, acc = s
        ap = st.apply_grid(p)
        return (p * jnp.float32(0.999) + ap * 1e-6,
                acc + jnp.sum(ap * p) * 1e-9)

    t = marginal(mv_dot, (xg, jnp.float32(0.0)), 20)
    print(f"stencil+pap(+p upd):  {t*1e3:8.4f} ms  "
          f"({5*VEC_MB/1e3/t:6.0f} GB/s at 5 passes)")

    # 5. full CG iteration body (the cg_core inner shape)
    def cg_iter(s):
        x, r, p, rr = s
        ap = st.apply_grid(p)
        pap = jnp.sum(ap * p)
        alpha = rr / pap
        x = x + alpha * p
        r = r - alpha * ap
        new_rr = jnp.sum(r * r)
        beta = new_rr / rr
        p = r + beta * p
        return x, r, p, new_rr

    s0 = (xg, xg + 0.5, xg - 0.25, jnp.float32(1.0))
    t = marginal(cg_iter, s0, 20)
    gnnz = 7 * N / t / 1e9
    print(f"CG iteration:         {t*1e3:8.4f} ms  = {gnnz:6.1f} GNNZ/s "
          f"({11*VEC_MB/1e3/t:6.0f} GB/s at 11 passes)")

    # 6. restructured: p-update folded into the matvec step
    #    (ap = A(r + beta p) with p_new written in the same pass)
    def cg_iter_fused(s):
        x, r, p, rr, beta = s
        pn = r + beta * p
        ap = st.apply_grid(pn)
        pap = jnp.sum(ap * pn)
        alpha = rr / pap
        x = x + alpha * pn
        r = r - alpha * ap
        new_rr = jnp.sum(r * r)
        return x, r, pn, new_rr, new_rr / rr

    t = marginal(cg_iter_fused, s0 + (jnp.float32(0.5),), 20)
    gnnz = 7 * N / t / 1e9
    print(f"CG iter (p-in-mv):    {t*1e3:8.4f} ms  = {gnnz:6.1f} GNNZ/s")

    # 7. Chronopoulos-Gear single-reduction shape
    def cg_iter_chrono(s):
        x, r, w, p, q, rr, rw = s
        alpha = rr / (rw - rr * 0.0)  # placeholder scalar algebra
        beta = jnp.float32(0.1)
        p = r + beta * p
        q = w + beta * q
        x = x + alpha * p
        r = r - alpha * q
        w = st.apply_grid(r)
        new_rr = jnp.sum(r * r)
        new_rw = jnp.sum(r * w)
        return x, r, w, p, q, new_rr, new_rw

    s7 = (xg, xg + 0.5, xg - 0.1, xg - 0.25, xg + 0.1,
          jnp.float32(1.0), jnp.float32(1.0))
    t = marginal(cg_iter_chrono, s7, 20)
    gnnz = 7 * N / t / 1e9
    print(f"CG iter (chrono):     {t*1e3:8.4f} ms  = {gnnz:6.1f} GNNZ/s")


if __name__ == "__main__":
    main()
