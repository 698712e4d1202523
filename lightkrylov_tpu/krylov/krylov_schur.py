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
from ..utils.hessenberg import francis_filter

__all__ = ["iram_restart", "krylov_schur", "median_selector"]


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


@jax.jit
def iram_restart(X, H, n_target):
    """Fully on-device restart via the exact-shift IRAM filter
    (:func:`~lightkrylov_tpu.utils.hessenberg.francis_filter`) — the
    device-mode replacement for :func:`krylov_schur`'s host
    ``schur``/``ordschur`` step when the selection is the default
    keep-``n_target``-largest-by-modulus (the reference's median selector
    intent, IterativeSolvers.fypp:1099-1100).

    Applies the filter sweeps to ``H``, compresses the basis with the
    accumulated ``Z[:, :n]`` (tall-skinny GEMM), and forms the new
    residual by the standard IRAM update
    ``f = Hf[n, n-1] (X Z)[:, n] + beta Z[kdim-1, n-1] x_res``.  Unlike
    the Krylov-Schur arrow form, the result is a PURE Arnoldi
    factorization: ``H'`` is Hessenberg with a single coupling
    ``H'[n, n-1] = ||f||``.

    Returns ``(X', H', n, ok)`` with ``n`` a device scalar (usable
    directly as ``kstart = n + 1`` for the next jitted sweep — no host
    round-trip) and ``ok`` the filter eigensolve's convergence flag
    (``False`` only means the shifts aimed poorly; the factorization
    stays exact either way).
    """
    kdim = H.shape[1]
    Hk = H[:kdim, :kdim]
    Hf, Z, n, ok = francis_filter(Hk, n_target)
    idx = jnp.arange(kdim)
    beta = H[kdim, kdim - 1]
    nm1 = jnp.maximum(n - 1, 0)

    # compress columns 0..n (column n feeds the residual update)
    Zc = jnp.where(idx[None, :] <= n, Z, 0.0)
    X_lead = jax.tree.map(lambda l: l[:kdim], X)
    Xc = vectors.linear_combination(X_lead, Zc)
    v_next = vectors.get_column(Xc, n)
    x_res = vectors.get_column(X, kdim)
    c1 = Hf[n, nm1]
    c2 = beta * Z[kdim - 1, nm1]
    f = jax.tree.map(lambda a, b: c1 * a.astype(Hf.dtype) + c2 * b,
                     v_next, x_res)
    bn = vectors.norm(f)
    inv = jnp.where(bn > 0, 1.0 / jnp.where(bn == 0, 1.0, bn), 0.0)
    v_new = vectors.scal(inv.astype(Hf.dtype), f)

    # new basis: kept block, residual direction at column n, zeros beyond
    # (buffer invariant: unfilled columns exactly zero)
    Xc = jax.tree.map(
        lambda l: jnp.where((idx < n).reshape((kdim,) + (1,) * (l.ndim - 1)),
                            l, 0.0),
        Xc)
    X_new = jax.tree.map(
        lambda c, full: jnp.concatenate([c, jnp.zeros_like(full[:1])],
                                        axis=0), Xc, X)
    X_new = vectors.set_column(X_new, n, v_new)

    mask = (idx[:, None] < n) & (idx[None, :] < n)
    H_new = jnp.zeros_like(H)
    H_new = H_new.at[:kdim, :kdim].set(jnp.where(mask, Hf, 0.0))
    H_new = H_new.at[n, nm1].set(bn.astype(Hf.dtype))
    return X_new, H_new, n, ok


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
