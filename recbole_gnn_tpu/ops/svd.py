"""Randomized low-rank SVD — replacement for torch.svd_lowrank.

Used by LightGCL's SVD-guided contrastive branch (reference:
recbole_gnn/model/general_recommender/lightgcl.py:58-63).  Implements
Halko et al. randomized range-finding with power iterations: all dense
matmuls (MXU-friendly), one small exact SVD on the (q+p)-sized core.

Operates on a sparse matrix given as a matvec closure so the (m×n)
interaction matrix is never densified.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def randomized_svd(rng: jax.Array,
                   matvec: Callable[[jax.Array], jax.Array],
                   rmatvec: Callable[[jax.Array], jax.Array],
                   m: int, n: int, q: int,
                   n_oversample: int = 8, n_power_iter: int = 2
                   ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-q SVD of an (m, n) operator A given A@X and Aᵀ@Y closures.

    Returns (U (m,q), s (q,), V (n,q)) with A ≈ U diag(s) Vᵀ.

    Runs under ``jax.default_matmul_precision('highest')`` — the default
    reduced-precision matmul path (bf16-class on TPU) destroys the
    small singular directions this factorization exists to capture.
    """
    with jax.default_matmul_precision("highest"):
        return _randomized_svd_impl(rng, matvec, rmatvec, m, n, q,
                                    n_oversample, n_power_iter)


def _randomized_svd_impl(rng, matvec, rmatvec, m, n, q,
                         n_oversample, n_power_iter):
    r = q + n_oversample

    def orth(x):
        # SVD-based orthonormalization: stays orthonormal even when the
        # sketch is rank-deficient (QR's Householder tail degrades there)
        u_, _, _ = jnp.linalg.svd(x, full_matrices=False)
        return u_

    omega = jax.random.normal(rng, (n, r), dtype=jnp.float32)
    y = matvec(omega)                       # (m, r)
    for _ in range(n_power_iter):
        y = orth(y)
        z = rmatvec(y)                      # (n, r)
        z = orth(z)
        y = matvec(z)
    qmat = orth(y)                          # (m, r) orthonormal range basis
    b = rmatvec(qmat).T                     # (r, n) = Qᵀ A
    u_small, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.dot(qmat, u_small, preferred_element_type=jnp.float32)
    return u[:, :q], s[:q], vt[:q].T


def randomized_svd_sparse(rng: jax.Array, src: jax.Array, dst: jax.Array,
                          weight: jax.Array, m: int, n: int, q: int,
                          **kw) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-q SVD of a sparse (m, n) COO matrix (rows=src∈[0,m), cols=dst∈[0,n))."""

    def matvec(x):      # A @ x : (n, r) -> (m, r)
        return jax.ops.segment_sum(x[dst] * weight[:, None], src,
                                   num_segments=m)

    def rmatvec(y):     # Aᵀ @ y : (m, r) -> (n, r)
        return jax.ops.segment_sum(y[src] * weight[:, None], dst,
                                   num_segments=n)

    return randomized_svd(rng, matvec, rmatvec, m, n, q, **kw)
