"""Bandwidth-reducing reordering: the on-ramp to the W-SELL fast path.

W-SELL (formats/wsell.py) serves any pattern whose nonzeros cluster into
(1024-row slab x 1024-column window) tiles; scattered patterns — shuffled
meshes, arbitrarily-numbered graphs, permuted banded systems — pad beyond
its ratio cap and fall back to the slow XLA CSR path (~0.06 GNNZ/s on
TPU).  The classical cure is a symmetric BANDWIDTH-REDUCING permutation:
reverse Cuthill-McKee (RCM) renumbers the rows/columns by breadth-first
levels so the permuted matrix is banded — which W-SELL colours nearly
perfectly.  The reference has no analogue (its scalar CSR loop is
pattern-indifferent, h:1458-1515); on TPU the permutation IS the
difference between the gather-bound path and the Pallas kernel.

Pipeline (`reorder_to_wsell`):

1. ``rcm_permutation`` — RCM on the symmetrised pattern (SciPy's
   csgraph implementation when available, else a pure-NumPy BFS);
2. ``permute_csr`` — host-side A' = A[p, :][:, p];
3. W-SELL layout of A'; refuses (returns None) if the permuted pattern
   STILL pads beyond the cap (pattern genuinely tile-sparse, e.g.
   uniform random at very low density).

The result is wrapped in :class:`ReorderedMatrix`, which acts as the
ORIGINAL operator A everywhere (``rmult`` routes x through the
permutation: y = (A' x[p])[p^-1]).  Per-call that costs two vector
gathers; the solver entry points hoist them OUT of the iteration loop
(solve A' x' = b[p] once, un-permute x at the end) via
:func:`reorder_hoisted` — zero per-iteration overhead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .csr import CSRMatrix, csr_from_coo
from .triplet import COOArrays
from .wsell import try_wsell_from_csr

__all__ = [
    "ReorderedMatrix",
    "rcm_permutation",
    "permute_csr",
    "reorder_to_wsell",
]


def _rcm_numpy(indptr: np.ndarray, indices: np.ndarray, n: int) -> np.ndarray:
    """Pure-NumPy RCM on a symmetric adjacency (CSR indptr/indices):
    BFS from a minimum-degree start per component, neighbors visited in
    degree order, final order reversed."""
    degree = np.diff(indptr)
    visited = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    pos = 0
    # process components in order of their minimum-degree seed
    seeds = np.argsort(degree, kind="stable")
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        head, pos = pos, pos + 1
        while head < pos:
            u = order[head]
            head += 1
            nbrs = indices[indptr[u]: indptr[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)  # unique also sorts; stable tie-break
                nbrs = nbrs[np.argsort(degree[nbrs], kind="stable")]
                visited[nbrs] = True
                order[pos: pos + nbrs.size] = nbrs
                pos += nbrs.size
    return order[::-1].copy()


def rcm_permutation(csr: CSRMatrix) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a square matrix's pattern.

    Returns ``perm`` (int64) such that ``A[perm, :][:, perm]`` has
    (near-)minimal bandwidth.  The pattern is symmetrised first (RCM is
    a graph algorithm; for structurally nonsymmetric A the permuted
    matrix is still correct, just ordered by A + A^T's graph).
    """
    n_rows, n_cols = csr.shape
    if n_rows != n_cols:
        raise ValueError("rcm_permutation needs a square matrix")
    r = np.asarray(csr.row_ids, dtype=np.int64)
    c = np.asarray(csr.indices, dtype=np.int64)
    # symmetrise the pattern: edges both ways, dedup, drop self-loops
    rs = np.concatenate([r, c])
    cs = np.concatenate([c, r])
    keep = rs != cs
    rs, cs = rs[keep], cs[keep]
    key = rs * n_rows + cs
    key = np.unique(key)
    rs, cs = key // n_rows, key % n_rows
    indptr = np.zeros(n_rows + 1, np.int64)
    np.cumsum(np.bincount(rs, minlength=n_rows), out=indptr[1:])
    try:
        from scipy.sparse import csr_matrix as _sp_csr
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        g = _sp_csr(
            (np.ones(cs.shape[0], np.int8), cs.astype(np.int32), indptr),
            shape=(n_rows, n_rows),
        )
        return np.asarray(
            reverse_cuthill_mckee(g, symmetric_mode=True), dtype=np.int64
        )
    except ImportError:
        return _rcm_numpy(indptr, cs, n_rows)


def permute_csr(csr: CSRMatrix, perm: np.ndarray) -> CSRMatrix:
    """Host-side symmetric permutation: returns A' with
    ``A'[i, j] = A[perm[i], perm[j]]``."""
    perm = np.asarray(perm, dtype=np.int64)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(perm.shape[0])
    r = iperm[np.asarray(csr.row_ids, dtype=np.int64)]
    c = iperm[np.asarray(csr.indices, dtype=np.int64)]
    return csr_from_coo(
        COOArrays(
            rows=r, cols=c, vals=np.asarray(csr.data), shape=csr.shape
        ),
        needs_sort=True,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReorderedMatrix:
    """A sparse operator stored in a bandwidth-reduced ordering.

    Acts as the ORIGINAL matrix A: ``rmult(x)`` routes the vector
    through the permutation (two gathers per call).  Solvers hoist the
    permutation outside their iteration loop instead — see
    :func:`reorder_hoisted`.

    ``inner`` is the fast-format operator for A' = A[perm][:, perm]
    (typically a WSellMatrix); ``inner_csr`` keeps the permuted CSR for
    preconditioner factorisations in the permuted domain.
    """

    inner: object
    inner_csr: Optional[CSRMatrix]
    perm: jnp.ndarray    # (n,) int32: new index i holds old index perm[i]
    iperm: jnp.ndarray   # (n,) int32: inverse permutation
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.inner.dtype

    def to_permuted(self, x: jnp.ndarray) -> jnp.ndarray:
        """Vector old-order -> permuted order (x' = x[perm])."""
        return x[self.perm]

    def from_permuted(self, xp: jnp.ndarray) -> jnp.ndarray:
        """Vector permuted order -> old order."""
        return xp[self.iperm]

    def rmult(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import spmv as _spmv

        return _spmv.rmult(self, x)

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.rmult(x)

    def to_dense(self) -> jnp.ndarray:
        inner_dense = self.inner.to_dense()
        return inner_dense[self.iperm][:, self.iperm]


def reorder_to_wsell(
    csr: CSRMatrix, *, max_slot_ratio: float = 8.0
) -> Optional[ReorderedMatrix]:
    """RCM-permute ``csr`` and lay the result out as W-SELL.

    Returns None when even the permuted pattern pads beyond the cap —
    the pattern is genuinely tile-sparse and the XLA CSR path remains
    the right answer.
    """
    perm = rcm_permutation(csr)
    permuted = permute_csr(csr, perm)
    ws = try_wsell_from_csr(permuted, max_slot_ratio=max_slot_ratio)
    if ws is None:
        return None
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(perm.shape[0])
    return ReorderedMatrix(
        inner=ws,
        inner_csr=permuted,
        perm=jnp.asarray(perm.astype(np.int32)),
        iperm=jnp.asarray(iperm.astype(np.int32)),
        shape=csr.shape,
        nnz=int(csr.nnz),
    )


def reorder_hoisted(solver_fn):
    """Wrap a solver entry ``f(a, b, x0=None, **kw) -> SolveResult`` so a
    ReorderedMatrix is solved ENTIRELY in the permuted domain: permute b
    (and x0) once, run the fast-format solve, un-permute x once — zero
    per-iteration permutation cost.  Residual norms, iteration counts
    and statuses are permutation-invariant and pass through unchanged.
    """
    import functools

    @functools.wraps(solver_fn)
    def wrapped(a, b, x0=None, *args, **kwargs):
        if isinstance(a, CSRMatrix):
            # default-path safety: large CSR on TPU auto-routes to a
            # fast layout (formats/__init__.py:auto_route_for_solve)
            from . import auto_route_for_solve

            a = auto_route_for_solve(
                a, has_preconditioner=kwargs.get("preconditioner") is not None
            )
        if not isinstance(a, ReorderedMatrix):
            return solver_fn(a, b, x0, *args, **kwargs)
        bp = a.to_permuted(jnp.asarray(b))
        x0p = None if x0 is None else a.to_permuted(jnp.asarray(x0))
        res = solver_fn(a.inner, bp, x0p, *args, **kwargs)
        return dataclasses.replace(res, x=a.from_permuted(res.x))

    return wrapped
