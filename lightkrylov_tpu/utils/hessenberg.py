"""On-device real-Hessenberg eigensolve (jitted Francis double-shift QR).

The projected k x k problem in ``eigs`` is non-Hermitian; LAPACK GEEV has no
TPU lowering, so the host round-trip per convergence check (10-50 ms on the
axon relay) was the one remaining off-device step of the eigs inner loop
(VERDICT r3 item 8; SURVEY.md §7 lists on-device non-Hermitian dense work as
the acknowledged hard part).  This module removes it for *real* Hessenberg
matrices — the common case: every real-operator eigenproblem, including the
realified complex configs the axon runtime forces
(reference call site: ``eig`` of ``H(:k,:k)`` each Arnoldi step,
src/IterativeSolvers/IterativeSolvers.fypp:1065; LAPACK-convention ``eig``
wrapper at src/Utilities/Utils.fypp:128-165).

Structure mirrors LAPACK's own split, re-expressed as fixed-shape jitted
loops (no data-dependent Python control flow):

- :func:`hessenberg_eigvals` — ``dhseqr``-style eigenvalues-only Francis
  double-shift QR with deflation, 2x2-block acceptance, and exceptional
  shifts.  All arithmetic is REAL (complex pairs live in accepted 2x2
  diagonal blocks) — nothing here requires a complex dtype, which is what
  makes it legal on the axon runtime (no complex arithmetic compiles there
  at all, CLAUDE.md).
- :func:`hessenberg_eigvecs` — ``dhsein``-style eigenvectors by one step of
  inverse iteration: for each eigenvalue the realified ``2n x 2n`` system
  ``[[H - wr I, wi I], [-wi I, H - wr I]]`` is solved against a fixed
  right-hand side (batched LU over all eigenvalues at once).
- :func:`hessenberg_ritz` — the fused driver product: eigenvalues, Ritz
  residuals ``|beta| * |last eigvec component|`` (reference:
  IterativeSolvers.fypp:1069-1083), modulus-descending order and the
  device-side converged count, from the *extended* Hessenberg buffer with a
  dynamic active size ``k_eff`` (one compilation serves every sweep).

The active problem is embedded in the static ``(n, n)`` buffer by zeroing
the inactive block and planting well-separated dummy diagonal entries
(magnitude ``> 2 ||H||``) — already-deflated 1x1 blocks the QR iteration
never touches, masked out of residuals/ordering afterwards.
"""

from __future__ import annotations

from functools import partial, wraps

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["francis_filter", "hessenberg_eigvals", "hessenberg_eigvecs",
           "hessenberg_ritz"]


def _full_precision(fn):
    """Trace the wrapped body under full-f32 matmul precision.

    TPU f32 matmuls default to bf16-pass arithmetic; an iterative
    similarity transform (hundreds of Householder/Givens applications)
    amplifies that into O(1) spectral error AND stalls deflation — the
    round-4 chip probe ("hessenberg", results_tpu.json) measured eigenvalue
    relerr 0.64 and 20x slowdown before this guard.  The matmuls here are
    all small (3 x n); HIGHEST precision is free."""

    @wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)

    return wrapped


def _householder3(x, y, z):
    """3-element Householder ``P = I - 2 v v^T / (v^T v)`` annihilating
    ``(y, z)`` in ``(x, y, z)``; identity when the vector already is
    ``(x, 0, 0)`` (guarded divisions — this runs masked inside the chase)."""
    dt = x.dtype
    s = jnp.sqrt(x * x + y * y + z * z)
    alpha = -jnp.where(x >= 0, s, -s)
    v0 = x - alpha
    vnorm2 = v0 * v0 + y * y + z * z
    safe = vnorm2 > 0
    inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
    v = jnp.stack([v0, y, z])
    P = jnp.eye(3, dtype=dt) - inv * jnp.outer(v, v)
    return P


def _chase(H, lo, hi, s, t, Z=None):
    """One Francis double-implicit-shift bulge chase on window ``[lo, hi]``
    (0-indexed, inclusive; size >= 3) with shift sum ``s`` / product ``t``
    (Golub & Van Loan Alg. 7.5.1-7.5.2).  ``lo``/``hi`` are traced scalars;
    the chase runs over the full static position range, masked to the
    window.  Row/column updates apply to full slices — entries outside the
    window in the touched rows/cols are exactly zero by the Hessenberg +
    deflation structure, so full-slice application is the correct global
    similarity.

    With ``Z`` (an ``n x n`` matrix), the accumulated right transform is
    also returned (``Z <- Z Q`` for ``H <- Q^T H Q``) — needed by the
    IRAM filter restart, which compresses the Krylov basis with ``Z``.
    Returns ``H`` alone when ``Z is None``, else ``(H, Z)``."""
    n = H.shape[0]
    with_z = Z is not None
    if n < 3:  # a size-3 window cannot exist; branch is traced regardless
        return (H, Z) if with_z else H
    if not with_z:
        Z = jnp.zeros((0, n), H.dtype)  # static empty: updates are no-ops

    def cond(c):
        # exactly the active positions [lo, hi-2] — no masked iterations
        # (a fori over the full static range with a lax.cond per position
        # wastes most steps once deflation shrinks the windows)
        return c[2] <= hi - 2

    def step(c):
        H, Z, p = c
        # first position: implicit first column of (H - aI)(H - bI) e1;
        # later positions: the bulge column p-1
        h00 = H[lo, lo]
        h01 = H[lo, lo + 1]
        h10 = H[lo + 1, lo]
        h11 = H[lo + 1, lo + 1]
        h21 = H[lo + 2, lo + 1]
        x0 = h00 * h00 + h01 * h10 - s * h00 + t
        y0 = h10 * (h00 + h11 - s)
        z0 = h10 * h21
        pm1 = jnp.maximum(p - 1, 0)
        first = p == lo
        x = jnp.where(first, x0, H[p, pm1])
        y = jnp.where(first, y0, H[p + 1, pm1])
        z = jnp.where(first, z0, H[p + 2, pm1])
        P = _householder3(x, y, z)
        rows = jax.lax.dynamic_slice(H, (p, jnp.int32(0)), (3, n))
        H2 = jax.lax.dynamic_update_slice(H, P @ rows, (p, jnp.int32(0)))
        cols = jax.lax.dynamic_slice(H2, (jnp.int32(0), p), (n, 3))
        H2 = jax.lax.dynamic_update_slice(H2, cols @ P, (jnp.int32(0), p))
        zc = jax.lax.dynamic_slice(Z, (jnp.int32(0), p),
                                   (Z.shape[0], 3))
        Z2 = jax.lax.dynamic_update_slice(Z, zc @ P, (jnp.int32(0), p))
        # annihilated bulge entries: exactly zero (standard practice —
        # roundoff residue here would masquerade as a coupling)
        H2 = jnp.where(first, H2,
                       H2.at[p + 1, pm1].set(0.0).at[p + 2, pm1].set(0.0))
        return H2, Z2, p + 1

    # clamp the bulge position so the (3, n) slices stay in range even if
    # a caller passes a degenerate window
    p0 = jnp.clip(jnp.asarray(lo, jnp.int32), 0, n - 3)
    H, Z, _ = jax.lax.while_loop(cond, step, (H, Z, p0))

    # final Givens on rows/cols (hi-1, hi) zeroing H[hi, hi-2]
    x = H[hi - 1, hi - 2]
    y = H[hi, hi - 2]
    r = jnp.sqrt(x * x + y * y)
    safe = r > 0
    c = jnp.where(safe, x / jnp.where(safe, r, 1.0), 1.0)
    sn = jnp.where(safe, y / jnp.where(safe, r, 1.0), 0.0)
    G = jnp.stack([jnp.stack([c, sn]), jnp.stack([-sn, c])])
    rows = jax.lax.dynamic_slice(H, (hi - 1, jnp.int32(0)), (2, n))
    H = jax.lax.dynamic_update_slice(H, G @ rows, (hi - 1, jnp.int32(0)))
    cols = jax.lax.dynamic_slice(H, (jnp.int32(0), hi - 1), (n, 2))
    H = jax.lax.dynamic_update_slice(H, cols @ G.T, (jnp.int32(0), hi - 1))
    zc = jax.lax.dynamic_slice(Z, (jnp.int32(0), hi - 1), (Z.shape[0], 2))
    Z = jax.lax.dynamic_update_slice(Z, zc @ G.T, (jnp.int32(0), hi - 1))
    H = H.at[hi, hi - 2].set(0.0)
    return (H, Z) if with_z else H


def _embed(H, k_eff):
    """Zero the inactive block of the static buffer and plant separated
    dummy diagonal entries there (pre-deflated 1x1 blocks)."""
    n = H.shape[0]
    idx = jnp.arange(n)
    active = idx < k_eff
    Hm = jnp.where(active[:, None] & active[None, :], H, 0.0)
    norm = jnp.max(jnp.abs(Hm)) + 1.0
    dummy = norm * (2.0 + idx.astype(H.dtype) / n)
    diag = jnp.where(active, jnp.diagonal(Hm), dummy)
    return Hm.at[idx, idx].set(diag), active


def _to_hessenberg(H, Z=None):
    """Householder similarity reduction to upper Hessenberg form (GEHRD
    analogue), fully vectorized per column.

    Needed because the projected matrix is only Hessenberg on the FIRST
    sweep — after a Krylov-Schur restart it is quasi-triangular with a full
    ``b`` row appended (the Krylov-Schur form, BaseKrylov.fypp:782-834),
    which the Francis chase's structural assumptions do not cover.
    Similarity only for the eigensolve path — eigenvectors are later
    computed from the *original* matrix by inverse iteration, so no
    back-transform is required there.  With ``Z``, the accumulated right
    transform is also returned (``(H, Z)``), for callers that transform a
    basis (the IRAM filter restart)."""
    n = H.shape[0]
    with_z = Z is not None
    if n < 3:
        return (H, Z) if with_z else H
    dt = H.dtype
    rows = jnp.arange(n)
    if not with_z:
        Z = jnp.zeros((0, n), dt)  # static empty: updates are no-ops

    def step(j, HZ):
        H, Z = HZ
        col = H[:, j]
        below = rows > j
        x = jnp.where(below, col, 0.0)
        s = jnp.sqrt(jnp.sum(x * x))
        x0 = H[j + 1, j]
        alpha = -jnp.where(x0 >= 0, s, -s)
        u = x - alpha * (rows == j + 1).astype(dt)
        un2 = jnp.sum(u * u)
        safe = un2 > 0
        inv = jnp.where(safe, 2.0 / jnp.where(safe, un2, 1.0), 0.0)
        H = H - inv * jnp.outer(u, u @ H)
        H = H - inv * jnp.outer(H @ u, u)
        Z = Z - inv * jnp.outer(Z @ u, u)
        # annihilated entries: exactly zero (roundoff residue would read
        # as couplings downstream)
        keep = ~below | (rows == j + 1)
        H = H.at[:, j].set(jnp.where(keep, H[:, j], 0.0))
        return H, Z

    H, Z = jax.lax.fori_loop(0, n - 2, step, (H, Z))
    return (H, Z) if with_z else H


def _schur_core(H):
    """Iterate Francis sweeps to quasi-triangular form.  Returns
    ``(H, accepted, ok)`` — ``accepted[i]`` marks a terminal 2x2 diagonal
    block coupling rows ``(i, i+1)``; ``ok`` is False only if the sweep
    budget (30 n, LAPACK's) ran out."""
    n = H.shape[0]
    dt = H.dtype
    if n < 2:  # already triangular
        return H, jnp.zeros((0,), bool), jnp.asarray(True)
    eps = jnp.asarray(np.finfo(np.dtype(dt)).eps, dt)
    ii = jnp.arange(n - 1, dtype=jnp.int32)
    max_sweeps = 30 * n

    def deflate(H):
        d = jnp.abs(jnp.diagonal(H))
        sub = H[ii + 1, ii]
        # LAPACK dlahqr-style test, with the zero-diagonal safeguard (a
        # zero neighbour-sum must not make the threshold vanish)
        tst = d[:-1] + d[1:]
        tst = jnp.where(tst == 0, jnp.max(jnp.abs(H)), tst)
        small = jnp.abs(sub) <= eps * tst
        return H.at[ii + 1, ii].set(jnp.where(small, 0.0, sub))

    def open_mask(H, accepted):
        return (H[ii + 1, ii] != 0) & ~accepted

    def cond(carry):
        H, accepted, last_hi, stall, sweeps = carry
        return jnp.any(open_mask(H, accepted)) & (sweeps < max_sweeps)

    def body(carry):
        H, accepted, last_hi, stall, sweeps = carry
        H = deflate(H)
        op = open_mask(H, accepted)
        any_open = jnp.any(op)
        # bottom of the active window: largest open coupling
        hi_c = jnp.max(jnp.where(op, ii, jnp.int32(-1)))
        hi = (hi_c + 1).astype(jnp.int32)
        # top: just below the nearest zero coupling above
        zero_below = (H[ii + 1, ii] == 0) & (ii < hi_c)
        lo = jnp.max(jnp.where(zero_below, ii + 1, 0))
        stall = jnp.where(hi == last_hi, stall + 1, 0)

        def accept(H_acc):
            H, accepted = H_acc
            return H, accepted.at[jnp.maximum(hi_c, 0)].set(True)

        def sweep(H_acc):
            H, accepted = H_acc
            # trailing 2x2 Wilkinson double shift; exceptional every 10
            # stalled sweeps (LAPACK dlahqr-style backstop)
            a11 = H[hi - 1, hi - 1]
            a12 = H[hi - 1, hi]
            a21 = H[hi, hi - 1]
            a22 = H[hi, hi]
            s = a11 + a22
            t = a11 * a22 - a12 * a21
            exc = (stall > 0) & (stall % 10 == 0)
            sexc = jnp.abs(a21) + jnp.abs(H[hi - 1, jnp.maximum(hi - 2, 0)])
            wexc = a22 + 0.75 * sexc
            s = jnp.where(exc, 2.0 * wexc, s)
            t = jnp.where(exc, wexc * wexc, t)
            return _chase(H, lo, hi, s, t), accepted

        H, accepted = jax.lax.cond(
            any_open & (hi - lo >= 2), sweep,
            lambda H_acc: jax.lax.cond(any_open, accept,
                                       lambda ha: ha, H_acc),
            (H, accepted))
        return H, accepted, hi, stall, sweeps + 1

    accepted0 = jnp.zeros(max(n - 1, 1), bool)[: n - 1]
    H, accepted, _, _, sweeps = jax.lax.while_loop(
        cond, body,
        (H, accepted0, jnp.int32(-1), jnp.int32(0), jnp.int32(0)))
    ok = ~jnp.any(open_mask(H, accepted))
    return H, accepted, ok


def _extract_eigvals(H, accepted):
    """Eigenvalues from the quasi-triangular form: diagonal entries for 1x1
    blocks, quadratic formula on accepted 2x2 blocks (complex pairs carried
    as separate real/imag arrays — no complex dtype)."""
    n = H.shape[0]
    d = jnp.diagonal(H)
    pad = jnp.zeros((1,), H.dtype)
    pair_start = jnp.concatenate([accepted, pad.astype(bool)])
    pair_second = jnp.concatenate([pad.astype(bool), accepted])
    a = d
    b = jnp.concatenate([jnp.diagonal(H, 1), pad])   # H[i, i+1]
    c = jnp.concatenate([jnp.diagonal(H, -1), pad])  # H[i+1, i]
    dd = jnp.concatenate([d[1:], pad])               # H[i+1, i+1]
    m = 0.5 * (a + dd)
    disc = 0.25 * (a - dd) ** 2 + b * c
    sq = jnp.sqrt(jnp.abs(disc))
    real_pair = disc >= 0
    wr1 = jnp.where(real_pair, m + sq, m)
    wr2 = jnp.where(real_pair, m - sq, m)
    wi1 = jnp.where(real_pair, 0.0, sq)
    # assign: pair start gets (wr1, +wi1); the row below gets (wr2, -wi1)
    wr2s = jnp.concatenate([pad, wr2[:-1]])
    wi2s = jnp.concatenate([pad, wi1[:-1]])
    wr = jnp.where(pair_start, wr1, jnp.where(pair_second, wr2s, d))
    wi = jnp.where(pair_start, wi1, jnp.where(pair_second, -wi2s, 0.0))
    return wr, wi


@partial(jax.jit, static_argnames=())
@_full_precision
def hessenberg_eigvals(H, k_eff=None):
    """Eigenvalues of a real upper-Hessenberg matrix, fully on device.

    Returns ``(wr, wi, ok)``: real/imag parts (position-aligned with the
    buffer; entries at index ``>= k_eff`` are inactive dummies reported as
    ``0``) and a convergence flag.  ``k_eff`` may be a traced scalar; it
    defaults to the full buffer.
    """
    H = jnp.asarray(H)
    if jnp.issubdtype(H.dtype, jnp.complexfloating):
        raise TypeError("hessenberg_eigvals is real-only; complex projected "
                        "problems take the host LAPACK path")
    n = H.shape[0]
    k_eff = jnp.asarray(n if k_eff is None else k_eff, jnp.int32)
    Hm, active = _embed(H, k_eff)
    Hm = _to_hessenberg(Hm)
    T, accepted, ok = _schur_core(Hm)
    wr, wi = _extract_eigvals(T, accepted)
    wr = jnp.where(active, wr, 0.0)
    wi = jnp.where(active, wi, 0.0)
    return wr, wi, ok


@partial(jax.jit, static_argnames=())
@_full_precision
def francis_filter(H_sq, n_target):
    """Exact-shift IRAM filter for a Krylov restart, fully on device.

    Applies ``(kdim - n) / 2`` Francis double-shift sweeps to the square
    Hessenberg ``H_sq``, with the shifts taken pairwise from the
    smallest-modulus eigenvalues (the unwanted part of the spectrum —
    equivalent in intent to the reference's median-of-|lambda| Krylov-Schur
    selector, IterativeSolvers.fypp:1099-1100,1137-1142, but via the
    implicitly-restarted-Arnoldi filter-polynomial route, which needs no
    Schur reordering and keeps ``H`` purely Hessenberg).  ``n_target`` may
    be traced; it is adjusted so no complex-conjugate pair straddles the
    kept/unwanted boundary and so the unwanted count is even, then clamped
    to ``[1, kdim - 2]``.

    Returns ``(Hf, Z, n, ok)``: the filtered Hessenberg, the accumulated
    orthogonal transform (``Hf = Z^T H Z``), the adjusted keep count, and
    the eigensolve convergence flag.  The caller compresses the basis with
    ``Z[:, :n]`` and forms the new residual from column ``n`` of ``Z`` and
    the old residual vector (the standard IRAM update).
    """
    kdim = H_sq.shape[0]
    dt = H_sq.dtype
    Zh = jnp.eye(kdim, dtype=dt)
    # STRICT Hessenberg contract: the single-residual IRAM truncation
    # needs e_k^T Z supported on the last p+1 columns, which holds only
    # when every applied transform is a (banded) chase on a Hessenberg
    # matrix.  Reducing an ARROW input (host Krylov-Schur form) first
    # would densify Z's last row and silently break the truncated
    # factorization — on arrow input we apply NO sweeps (a pure
    # truncation of the factorization, which is always exact) and report
    # ``ok = False`` so the caller can filter another way.
    hess_in = jnp.all(jnp.abs(jnp.tril(H_sq, -2)) == 0)
    wr, wi, ok = hessenberg_eigvals(H_sq)
    mod = wr * wr + wi * wi
    # descending modulus; ties broken so conjugate pairs sit adjacent
    order = jnp.lexsort((wi, wr, -mod))

    def straddles(n):
        # does the kept/unwanted boundary split a conjugate pair?
        a = order[jnp.clip(n - 1, 0, kdim - 1)]
        b = order[jnp.clip(n, 0, kdim - 1)]
        return (wi[a] != 0) & (wr[a] == wr[b]) & (wi[a] == -wi[b])

    # adjust n to a FIXED POINT: each +1 can create a new straddle or odd
    # parity at the boundary (the one-shot check let a pair straddle and
    # produced a mixed — hence inexact — shift pair, whose failed
    # deflation filled the sub-Hessenberg and broke the truncation)
    def adj_cond(n):
        odd = (kdim - n) % 2 == 1
        return (straddles(n) | odd) & (n < kdim - 2)

    n = jax.lax.while_loop(adj_cond, lambda n: n + 1,
                           jnp.asarray(n_target, jnp.int32))
    n = jnp.clip(n, 1, kdim - 2).astype(jnp.int32)
    # apply NO shifts (exact pure truncation) on an unresolvable straddle
    # at the clamp (pathological) or a non-Hessenberg (arrow) input
    pure = ~straddles(n) & hess_in

    # shift application order: complex pairs first, then reals — EVERY
    # consecutive pair is then a true conjugate pair or two reals, so all
    # shifts are exact eigenvalues and each sweep genuinely deflates its
    # pair at the window bottom (mandatory: chasing past an un-deflated
    # coupling fills the sub-Hessenberg and invalidates the truncation)
    rank = jnp.zeros(kdim, jnp.int32).at[order].set(
        jnp.arange(kdim, dtype=jnp.int32))
    is_real = (wi == 0)
    key = jnp.where(rank >= n,
                    is_real.astype(jnp.int32) * kdim + rank,
                    3 * kdim + rank)  # wanted pushed past every unwanted
    shift_order = jnp.argsort(key)

    eps = jnp.asarray(np.finfo(np.dtype(dt)).eps, dt)
    ii = jnp.arange(kdim - 1, dtype=jnp.int32)

    def sweep(j, HZ):
        Hc, Zc = HZ
        # explicit deflation (dlahqr-style threshold), then chase ONLY the
        # top-connected block: each exact double shift deflates its pair
        # at the window bottom, and the next sweep must stop at the first
        # LIVE coupling boundary.  Chasing past an un-deflated coupling
        # (the blind shrink-by-2 did, whenever f32 shift error ~ kappa*eps
        # left a pair un-deflated on a non-normal spectrum) fills the
        # sub-Hessenberg and silently corrupts the truncation — caught by
        # the GL flagship's kappa-budget anchors.
        d = jnp.abs(jnp.diagonal(Hc))
        sub = Hc[ii + 1, ii]
        tst = d[:-1] + d[1:]
        tst = jnp.where(tst == 0, jnp.max(jnp.abs(Hc)), tst)
        sub = jnp.where(jnp.abs(sub) <= eps * tst, 0.0, sub)
        Hc = Hc.at[ii + 1, ii].set(sub)
        hi = jnp.min(jnp.where(sub == 0, ii, jnp.int32(kdim - 1)))
        active = ((2 * j + 1) < (kdim - n)) & pure & (hi >= 2)
        ia = shift_order[jnp.clip(2 * j, 0, kdim - 1)]
        ib = shift_order[jnp.clip(2 * j + 1, 0, kdim - 1)]
        s = wr[ia] + wr[ib]
        t = wr[ia] * wr[ib] - wi[ia] * wi[ib]
        return jax.lax.cond(
            active,
            lambda hz: _chase(hz[0], jnp.int32(0), hi, s, t, Z=hz[1]),
            lambda hz: hz, (Hc, Zc))

    Hf, Z = jax.lax.fori_loop(0, kdim // 2, sweep, (H_sq, Zh))
    return Hf, Z, n, ok & pure


def _eigvec_rhs(n, dt):
    """Fixed deterministic right-hand side for inverse iteration (dhsein
    uses a unit vector; a dense incommensurate pattern avoids accidental
    orthogonality to the null direction)."""
    i = jnp.arange(2 * n, dtype=dt)
    b = jnp.sin(1.7 * i + 0.3) + 0.25
    return b / jnp.linalg.norm(b)


@partial(jax.jit, static_argnames=())
@_full_precision
def hessenberg_eigvecs(H, wr, wi, k_eff=None):
    """Eigenvectors by one inverse-iteration solve per eigenvalue
    (LAPACK ``dhsein``'s method), batched over all eigenvalues.

    For eigenvalue ``wr[j] + i wi[j]`` the realified ``2n x 2n`` system
    ``[[H - wr I, wi I], [-wi I, H - wr I]] x = b`` is solved with a tiny
    diagonal regularization (``ulp * ||H||`` — the LU must not hit an exact
    zero pivot); duplicate eigenvalues are separated by ``ulp``-scale
    perturbations exactly as dhsein does.  Returns ``(Vr, Vi)`` with
    columns normalized, rows ``>= k_eff`` zeroed.
    """
    H = jnp.asarray(H)
    n = H.shape[0]
    dt = H.dtype
    k_eff = jnp.asarray(n if k_eff is None else k_eff, jnp.int32)
    Hm, active = _embed(H, k_eff)
    eps = np.finfo(np.dtype(dt)).eps
    norm = jnp.max(jnp.abs(Hm)) + 1.0
    eps3 = eps * norm

    # separate duplicates: shift each eigenvalue by (number of earlier
    # near-identical eigenvalues) * 4 ulp ||H|| (dhsein's cluster rule)
    sep = 4.0 * eps3
    close = (jnp.abs(wr[None, :] - wr[:, None])
             + jnp.abs(wi[None, :] - wi[:, None])) <= sep
    earlier = jnp.tril(close, k=-1)
    wr = wr + earlier.sum(axis=1).astype(dt) * sep

    eye = jnp.eye(n, dtype=dt)
    b = _eigvec_rhs(n, dt)

    def solve_one(wrj, wij):
        A = Hm - wrj * eye
        M = jnp.block([[A, wij * eye], [-wij * eye, A]])
        M = M + eps3 * jnp.eye(2 * n, dtype=dt)
        x = jnp.linalg.solve(M, b)
        xr, xi = x[:n], x[n:]
        mask = active.astype(dt)
        xr, xi = xr * mask, xi * mask
        nrm = jnp.sqrt(jnp.sum(xr * xr + xi * xi))
        inv = jnp.where(nrm > 0, 1.0 / jnp.where(nrm > 0, nrm, 1.0), 0.0)
        return xr * inv, xi * inv

    Vr, Vi = jax.vmap(solve_one, out_axes=1)(wr, wi)
    return Vr, Vi


@jax.jit
@_full_precision
def hessenberg_ritz(H_ext, k_eff, tol):
    """Device-side Ritz analysis of the extended Hessenberg buffer: the
    full projected eigensolve + residuals + convergence count of one eigs
    check, with no host round-trip.

    ``H_ext`` is the ``(kdim+1, kdim)`` Arnoldi buffer, ``k_eff`` the
    (traced) active size.  Returns ``(wr, wi, res, Vr, Vi, n_conv, ok)``
    in modulus-descending order (matching the host path's
    ``argsort(-|w|)``); inactive slots carry ``res = +inf`` so they can
    never count as converged.  Residuals are the reference's
    ``|beta| * |last eigvec component|`` (IterativeSolvers.fypp:1069-1083)
    with ``beta = H_ext[k_eff, k_eff-1]``.
    """
    H_ext = jnp.asarray(H_ext)
    kdim = H_ext.shape[1]
    H = H_ext[:kdim, :kdim]
    k_eff = jnp.asarray(k_eff, jnp.int32)
    wr, wi, ok = hessenberg_eigvals(H, k_eff)
    Vr, Vi = hessenberg_eigvecs(H, wr, wi, k_eff)
    km1 = jnp.maximum(k_eff - 1, 0)
    beta = jnp.abs(H_ext[k_eff, km1])
    last = jnp.sqrt(Vr[km1, :] ** 2 + Vi[km1, :] ** 2)
    active = jnp.arange(kdim) < k_eff
    res = jnp.where(active & ok, beta * last, jnp.inf)
    order = jnp.argsort(-(wr * wr + wi * wi))
    wr, wi, res = wr[order], wi[order], res[order]
    Vr, Vi = Vr[:, order], Vi[:, order]
    n_conv = jnp.sum(jnp.where(jnp.isfinite(res), res < tol, False))
    return wr, wi, res, Vr, Vi, n_conv.astype(jnp.int32), ok
