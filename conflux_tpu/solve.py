"""Right-hand-side solves from computed factors.

The reference stops at the factorization (its validation reconstructs
‖PA−LU‖ rather than solving); these helpers complete the user-facing story:
factor once with `lu_factor`/`pdgetrf`/`cholesky`, then solve systems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@jax.jit
def lu_solve(F: jnp.ndarray, perm: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given (F, perm) from lu_factor (A[perm] = L U).

    b: [n] or [n, k]."""
    n = F.shape[1]
    squeeze = b.ndim == 1
    B = b[:, None] if squeeze else b
    PB = B[perm]
    Y = jsl.solve_triangular(jnp.tril(F[:n], -1) + jnp.eye(n, dtype=F.dtype),
                             PB, lower=True, unit_diagonal=True)
    X = jsl.solve_triangular(jnp.triu(F[:n]), Y, lower=False)
    return X[:, 0] if squeeze else X


@jax.jit
def cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given the lower Cholesky factor L (A = L L^T)."""
    squeeze = b.ndim == 1
    B = b[:, None] if squeeze else b
    Y = jsl.solve_triangular(L, B, lower=True)
    X = jsl.solve_triangular(L.T, Y, lower=False)
    return X[:, 0] if squeeze else X
