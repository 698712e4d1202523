"""Hermitian eigenvalue solver: Lanczos + dense eigh.

TPU-native counterpart of ``eighs``
(reference: src/IterativeSolvers/EIGHS/eighs.fypp): incremental Lanczos with
full re-orthogonalization plus a dense ``eigh`` of the projected tridiagonal
each check (eighs.fypp:79-101), Ritz residuals ``|beta * v_last|`` (:91-92),
**no restart** (the reference notes restart as WIP,
IterativeSolvers.fypp:743-746), descending sort and Ritz-vector
reconstruction (:107-123).

On TPU the dense tridiagonal eigensolve runs fully on-device
(``jnp.linalg.eigh`` lowers to XLA on TPU) — no host callback on this path.
``check_every = 0`` (default) runs the whole jitted Lanczos sweep then
checks once; ``check_every = 1`` reproduces the reference's per-step checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants, vectors
from ..krylov.lanczos import initialize_lanczos, lanczos
from ..linops import aslinop
from .eigs import _reconstruct
from ..utils.logger import log_warning
from ..utils.options import EigsOptions, SolverMetadata

__all__ = ["eighs"]


def eighs(A, nev: int, x0=None, kdim: int | None = None,
          tolerance: float | None = None, options: EigsOptions | None = None,
          key=None, check_every: int | None = None):
    """Leading eigenpairs of a symmetric/Hermitian operator ->
    ``(eigvals, eigvecs, residuals, info, metadata)``; eigvals real,
    sorted descending (reference: ``eighs``, eighs.fypp:28-123)."""
    A = aslinop(A)
    opts = options or EigsOptions()
    if kdim is None:
        kdim = opts.kdim or 4 * nev
    if x0 is None:
        raise ValueError("eighs requires x0 (a template/seed vector)")
    if key is None:
        key = jax.random.PRNGKey(0)
    dt = vectors.dtype_of(x0)
    rdt = constants.real_dtype_of(dt)
    tol = tolerance if tolerance is not None else constants.rtol(rdt)
    stride = kdim if not check_every else check_every

    seed = x0
    if float(vectors.norm(seed)) == 0.0:
        seed = vectors.rand_like(key, x0)
    X, T = initialize_lanczos(seed, kdim)

    niter = 0
    k = 1
    res_history = []
    invariant = False
    while k <= kdim:
        kend = min(kdim, k + stride - 1)
        X, T, linfo = lanczos(A, X, T, kstart=k, kend=kend)
        linfo = int(linfo)
        k_eff = linfo if linfo > 0 else kend
        niter += k_eff - (k - 1)

        Th = np.asarray(jax.device_get(T))
        # Symmetrize the projected block (CGS2 fills tiny asymmetric noise).
        Tk = Th[:k_eff, :k_eff]
        Tk = (Tk + Tk.conj().T) / 2
        w, V = np.linalg.eigh(Tk)
        beta = abs(Th[k_eff, k_eff - 1])
        r = beta * np.abs(V[-1, :])
        if linfo > 0:
            r = np.zeros_like(r)
            invariant = True
        order = np.argsort(-w)  # descending eigenvalue (:107)
        w, V, r = w[order], V[:, order], r[order]
        n_conv = int(np.sum(r < tol))
        res_history.append(r[: min(nev, len(r))].copy())
        evals, evecs, res, k_final = w, V, r, k_eff
        if n_conv >= nev or invariant:
            break
        k = kend + 1

    converged = n_conv >= nev or invariant
    if not converged:
        log_warning(f"eighs: only {n_conv}/{nev} pairs converged (no restart — "
                    "increase kdim)", "solvers", "eighs")

    nev_out = min(nev, len(evals))
    coeffs = np.zeros((kdim, nev_out), dtype=np.dtype(dt))
    coeffs[:k_final, :] = evecs[:, :nev_out]
    X_lead = jax.tree.map(lambda l: l[:kdim], X)
    ritz_vecs = _reconstruct(X_lead, jnp.asarray(coeffs))

    info = n_conv if converged else -n_conv
    meta = SolverMetadata(
        converged=converged, n_iter=niter, n_inner=niter, info=info,
        residuals=np.concatenate(res_history) if res_history else np.zeros(0),
    )
    return (
        jnp.asarray(evals[:nev_out].astype(rdt)),
        ritz_vecs,
        jnp.asarray(res[:nev_out].astype(rdt)),
        info,
        meta,
    )
