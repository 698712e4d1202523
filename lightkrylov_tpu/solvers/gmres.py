"""GMRES and flexible GMRES with restarts and right preconditioning.

TPU-native counterpart of ``src/IterativeSolvers/GMRES/gmres.fypp`` and
``fgmres.fypp``: restarted GMRES(kdim) whose inner loop is an Arnoldi sweep
with CGS2 (gmres.fypp:153-196), incremental Givens-rotation least squares
with the rhs recursion ``e[k+1] = -s * e[k]`` (:177-182), residual estimate
``|e[k+1]|``, right preconditioning applied to each Krylov vector before the
matvec (:155), solution by triangular solve + ``linear_combination`` +
preconditioner (:199-202), and a true-residual recompute per outer cycle
(:204-214).  FGMRES stores the preconditioned directions ``Z`` and builds
the update from them, allowing iteration-varying preconditioners
(fgmres.fypp:158-207).  Defaults kdim=30, maxiter=10 restarts
(IterativeSolvers.fypp:141-151); ``info = ±n_iter`` (gmres.fypp:233-239).

The entire solver — inner Arnoldi sweep, Givens recursion, restart loop —
is one jitted ``lax.while_loop`` nest: zero host synchronisation until the
solution is returned.  All small dense work (rotations, k x k triangular
solve) stays on-chip; the hot path is the operator matvec plus one batched
CGS2 reduction per iteration (a single fused all-reduce on a sharded mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants, vectors
from ..krylov.gram_schmidt import double_gram_schmidt_step
from ..linops import IdentityOperator, Preconditioner, aslinop
from ..utils import linalg
from ..utils.logger import check_info
from ..utils.options import GMRESOptions, SolverMetadata
from ..utils.timer import count_applications, timed_fn

__all__ = ["gmres", "fgmres"]


@partial(jax.jit, static_argnames=("kdim", "maxiter", "transpose", "flexible", "sanity_check"))
def _gmres_impl(A, b, x0, M, tol, kdim, maxiter, transpose, flexible, sanity_check):
    dt = vectors.dtype_of(b)
    rdt = constants.real_dtype_of(dt)

    def matvec(v):
        return A.rmatvec(v) if transpose else A.matvec(v)

    res_hist0 = jnp.zeros((maxiter * kdim,), rdt)

    def inner_cond(carry):
        V, Z, R, c, s, e, k, res, hist, nin = carry
        return (k < kdim) & (res >= tol)

    def inner_body(carry):
        V, Z, R, c, s, e, k, res, hist, nin = carry
        vk = vectors.get_column(V, k)
        # right preconditioner (gmres.fypp:155); iteration-aware interface
        # per the reference's abstract_precond (IterativeSolvers.fypp:80-95)
        if isinstance(M, Preconditioner):
            z = M.apply(vk, iteration=k, current_residual=res,
                        target_residual=tol)
        else:
            z = M.matvec(vk)
        if flexible:
            Z = vectors.set_column(Z, k, z)
        w = matvec(z)
        # CGS2 with active-prefix reads: columns 0..k are filled, so only
        # chunks intersecting [0, k+1) stream from HBM (exact by the
        # zero-column buffer invariant)
        w, proj = double_gram_schmidt_step(w, V, k=k + 1)
        beta = vectors.norm(w)
        h_col = proj.astype(dt).at[k + 1].set(beta.astype(dt))
        safe = jnp.where(beta == 0, 1.0, beta)
        V = vectors.set_column(
            V, k + 1, vectors.scal(jnp.where(beta > 0, 1.0 / safe, 0.0).astype(rdt), w)
        )
        # Givens least-squares update (gmres.fypp:177-182)
        h_col, c, s = linalg.apply_givens_rotation(h_col, c, s, k)
        R = R.at[:, k].set(h_col[:-1])
        ck, sk = c[k], s[k]
        e = e.at[k + 1].set(-sk * e[k])
        e = e.at[k].set(ck.astype(dt) * e[k])
        res = jnp.abs(e[k + 1])
        hist = hist.at[nin].set(res.astype(rdt))
        return V, Z, R, c, s, e, k + 1, res, hist, nin + 1

    def outer_cond(carry):
        x, outer, res, hist, nin, n_iter = carry
        return (outer < maxiter) & (res >= tol)

    def outer_body(carry):
        x, outer, res, hist, nin, n_iter = carry
        r = vectors.axpby(1.0, b, -1.0, matvec(x))  # r0 = b - A x (:134-143)
        beta = vectors.norm(r)
        V = vectors.zeros_basis(b, kdim + 1)
        safe = jnp.where(beta == 0, 1.0, beta)
        V = vectors.set_column(V, 0, vectors.scal((1.0 / safe).astype(rdt), r))
        # Z (preconditioned directions) is only needed by FGMRES; carrying
        # the unused (kdim+1)-column buffer through the while_loop when not
        # flexible risks a pass-through copy per iteration (1.2 GB at the
        # 10M-DoF scale) — use a scalar placeholder instead (static choice).
        Z = vectors.zero_basis_like(V) if flexible else jnp.zeros((), dt)
        R = jnp.zeros((kdim, kdim), dt)
        c = jnp.zeros((kdim,), rdt)
        s = jnp.zeros((kdim,), dt)
        e = jnp.zeros((kdim + 1,), dt).at[0].set(beta.astype(dt))

        V, Z, R, c, s, e, k, res_in, hist, nin = jax.lax.while_loop(
            inner_cond, inner_body,
            (V, Z, R, c, s, e, jnp.zeros((), jnp.int32), beta.astype(rdt), hist, nin),
        )

        # Back-substitution on the rotated Hessenberg (gmres.fypp:199-202):
        # unfilled diagonal entries are replaced by 1 (their rhs is 0).
        idx = jnp.arange(kdim)
        diag_fix = jnp.where(idx >= k, jnp.ones((), dt), jnp.zeros((), dt))
        Rk = R + jnp.diag(diag_fix)
        rhs = jnp.where(idx < k, e[:kdim], jnp.zeros((), dt))
        y = linalg.solve_triangular(Rk, rhs)
        basis = Z if flexible else V
        lead = jax.tree.map(lambda l: l[:kdim], basis)
        dx = vectors.linear_combination(lead, y)
        if not flexible:
            dx = M.matvec(dx)  # right-preconditioned correction (:201-202)
        x = vectors.add(x, dx)

        if sanity_check:
            true_res = vectors.norm(vectors.axpby(1.0, b, -1.0, matvec(x)))
            res_out = true_res.astype(rdt)  # (:204-214)
        else:
            res_out = res_in
        return x, outer + 1, res_out, hist, nin, n_iter + k

    x, outer, res, hist, nin, n_iter = jax.lax.while_loop(
        outer_cond, outer_body,
        (x0, jnp.zeros((), jnp.int32), jnp.asarray(np.inf, rdt), res_hist0,
         jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
    )
    return x, res, hist, nin, n_iter, outer


def _solve(A, b, x0, rtol, atol, preconditioner, options, transpose, flexible, meta_name):
    A = aslinop(A)
    dt = vectors.dtype_of(b)
    rdt = constants.real_dtype_of(dt)
    if rtol is None:
        rtol = constants.rtol(rdt)
    if atol is None:
        atol = constants.atol(rdt)
    opts = options or GMRESOptions()
    M = aslinop(preconditioner) if preconditioner is not None else IdentityOperator()
    if x0 is None:
        x0 = vectors.zero_like(b)
    # tol stays ON DEVICE (norm is jitted): no host sync before the solve
    tol = (atol + rtol * vectors.norm(b)).astype(rdt)

    x, res, hist, nin, n_iter, outer = _gmres_impl(
        A, b, x0, M, tol, opts.kdim, opts.maxiter, transpose, flexible,
        opts.sanity_check,
    )
    # ONE batched device_get for all metadata: each separate float()/int()
    # is a host sync, and on the axon relay those cost 10-50 ms each — the
    # round-3 "gmres_shell_split" probe measured 176 ms of shell overhead
    # per call from exactly these fetches (vs 233 ms of device compute).
    res, hist, nin, n_iter, outer, tol = jax.device_get(
        (res, hist, nin, n_iter, outer, tol))
    res = float(res)
    nin = int(nin)
    converged = res < float(tol)
    info = int(n_iter) if converged else -int(n_iter)
    # Execution-accurate operator accounting (reference: apply_matvec
    # wrappers, AbstractLinops.fypp:390-424): each outer cycle does one r0
    # matvec (+ one sanity matvec), each inner iteration one matvec.
    n_mv = int(n_iter) + int(outer) * (1 + int(bool(opts.sanity_check)))
    count_applications(A, n_mv, "rmatvec" if transpose else "matvec")
    if not isinstance(M, IdentityOperator):
        count_applications(M, int(n_iter) + (0 if flexible else int(outer)),
                           "matvec")
    check_info(info, meta_name, "solvers", meta_name)
    meta = SolverMetadata(
        converged=converged,
        n_iter=int(outer),
        n_inner=nin,
        info=info,
        residuals=np.asarray(hist)[:nin],
    )
    if opts.if_print_metadata:
        meta.print()
    return x, info, meta


@timed_fn("gmres", "IterativeSolvers")
def gmres(A, b, x0=None, rtol=None, atol=None, preconditioner=None,
          options: GMRESOptions | None = None, transpose: bool = False):
    """Restarted GMRES(kdim) for ``A x = b`` -> ``(x, info, metadata)``
    (reference: ``gmres``, gmres.fypp:65-258; options
    IterativeSolvers.fypp:141-151).

    ``info = n_inner`` if converged else ``-n_inner``
    (gmres.fypp:233-239).  Arrays are accepted for ``A`` and wrapped in a
    :class:`DenseOperator` (the reference's dense convenience wrapper,
    gmres.fypp:260-271).
    """
    return _solve(A, b, x0, rtol, atol, preconditioner, options, transpose,
                  flexible=False, meta_name="gmres")


@timed_fn("fgmres", "IterativeSolvers")
def fgmres(A, b, x0=None, rtol=None, atol=None, preconditioner=None,
           options: GMRESOptions | None = None, transpose: bool = False):
    """Flexible GMRES: stores preconditioned directions so the
    preconditioner may vary per iteration
    (reference: fgmres.fypp:158-207)."""
    return _solve(A, b, x0, rtol, atol, preconditioner, options, transpose,
                  flexible=True, meta_name="fgmres")
