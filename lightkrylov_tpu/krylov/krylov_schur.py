"""Krylov-Schur restart: compress an Arnoldi factorization onto a selected
invariant-subspace approximation.

TPU-native counterpart of ``krylov_schur`` (reference:
src/Krylov/BaseKrylov.fypp:714-837): Schur-decompose the Hessenberg, let a
*global* user selector flag eigenvalues to keep, reorder the Schur form
(``ordschur``), compress the basis with a tall-skinny GEMM
``X' = X Z[:, :n]`` (BaseKrylov.fypp:821 — ``linear_combination``) and
rebuild the Hessenberg with the coupling row
``b = H[kdim, kdim-1] * Z[kdim-1, :n]`` placed at row ``n``
(BaseKrylov.fypp:782-834).

This runs *eagerly* between jitted Arnoldi sweeps: the Schur step is a host
callback anyway (no non-Hermitian Schur lowering on TPU), and the restart
size ``n`` must be concrete for the driver.  The only O(N) work — the basis
compression — is a single jitted on-device GEMM; everything else is k x k
host arithmetic.

After compression the extended factorization reads
``A X[:, :n] = X[:, :n+1] H[:n+1, :n]`` with ``H[:n, :n]`` (quasi-)triangular
and the spike row at index ``n``; Arnoldi continuation from
``kstart = n + 1`` restores the Hessenberg-plus-spike structure whose dense
eigensolve yields the restarted Ritz values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import vectors
from ..utils import linalg

__all__ = ["krylov_schur", "median_selector"]


def median_selector(eigvals):
    """Default restart selector: keep eigenvalues with modulus above the
    median (reference: the median-of-|lambda| selector used by eigs,
    IterativeSolvers.fypp:1099-1100,1137-1142)."""
    mods = np.abs(eigvals)
    return mods > np.median(mods)


@jax.jit
def _compress_basis(X, Z):
    """On-device compression: X'[:, j] = sum_i Z[i, j] X[:, i] over the
    leading kdim columns (tall-skinny GEMM, BaseKrylov.fypp:821)."""
    kdim = Z.shape[0]
    X_lead = jax.tree.map(lambda l: l[:kdim], X)
    return vectors.linear_combination(X_lead, Z)


def krylov_schur(X, H, select=None):
    """Compress the factorization ``(X, H)`` (full kdim columns + residual
    column) onto the ``n`` selected Ritz directions.

    Returns ``(X, H, n)`` with the same static buffer shapes — columns
    ``> n`` zeroed, residual vector moved to column ``n`` — ready for an
    Arnoldi continuation from ``kstart = n + 1``
    (reference: BaseKrylov.fypp:714-837).
    """
    if select is None:
        select = median_selector
    kdim = H.shape[1]
    Hk = H[:kdim, :kdim]
    Tn, Zn, n = linalg.schur_select(Hk, select)  # eager host LAPACK
    # Degenerate selections would stall the restart loop: clamp to [1, kdim-1].
    n = max(1, min(n, kdim - 1))
    beta = linalg.to_host(H[kdim, kdim - 1])  # axon-safe complex D2H

    # Host-side k x k assembly of the new extended Hessenberg.
    H_new = np.zeros(H.shape, dtype=Tn.dtype)
    H_new[:n, :n] = Tn[:n, :n]
    H_new[n, :n] = beta * Zn[kdim - 1, :n]

    # Device-side basis compression with the masked rotation.
    Zm = np.zeros_like(Zn)
    Zm[:, :n] = Zn[:, :n]
    Xc = _compress_basis(X, jnp.asarray(Zm))

    Xres = vectors.get_column(X, kdim)
    X_new = jax.tree.map(
        lambda c, full: jnp.concatenate([c, jnp.zeros_like(full[:1])], axis=0),
        Xc, X,
    )
    X_new = vectors.set_column(X_new, n, Xres)
    return X_new, jnp.asarray(H_new), n
