"""Block Arnoldi device path: fused block sweeps, block Ritz residuals,
block Krylov-Schur restarts, and the ``eigs(blksize=p)`` driver
(reference: block Arnoldi, arnoldi.fypp:34-73 — the reference's eigs
itself is blksize-1, IterativeSolvers.fypp:1030, so the block DRIVER here
is beyond-reference capability)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import lightkrylov_tpu as lk
from lightkrylov_tpu import vectors
from lightkrylov_tpu.krylov.arnoldi import (arnoldi_block,
                                            arnoldi_block_step,
                                            initialize_arnoldi_block)
from lightkrylov_tpu.models import TridiagToeplitz, toeplitz_eigvals
from lightkrylov_tpu.utils.hessenberg import hessenberg_ritz


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _dense_op(rng, n):
    Am = rng.standard_normal((n, n))
    return Am, lk.DenseOperator(jnp.asarray(Am))


def _spiral_op(rng, n):
    """Real matrix with a KNOWN well-separated complex spectrum: an
    orthogonal conjugation of 2x2 rotation-scaling blocks with geometric
    radii (restarted-Krylov convergence is then fast, so driver tests
    probe the restart machinery rather than a clustering-limited rate)."""
    assert n % 2 == 0
    D = np.zeros((n, n))
    w = []
    for j in range(n // 2):
        r = 2.5 * 0.85 ** j
        th = 0.3 + 2.1 * j
        a, b = r * np.cos(th), r * np.sin(th)
        D[2 * j, 2 * j] = D[2 * j + 1, 2 * j + 1] = a
        D[2 * j, 2 * j + 1] = b
        D[2 * j + 1, 2 * j] = -b
        w += [a + 1j * b, a - 1j * b]
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Am = Q @ D @ Q.T
    return Am, lk.DenseOperator(jnp.asarray(Am))


def test_initialize_arnoldi_block(rng):
    n, kdim, p = 40, 12, 3
    x0 = jnp.asarray(rng.standard_normal(n))
    X, H = initialize_arnoldi_block(x0, kdim, p,
                                    key=vectors.default_key(3))
    Xh = np.asarray(X)
    assert Xh.shape[0] == kdim + p and H.shape == (kdim + p, kdim)
    # column 0 spans x0 exactly
    x0n = np.asarray(x0) / np.linalg.norm(np.asarray(x0))
    assert np.linalg.norm(Xh[0] - x0n) < 1e-12
    # seed block orthonormal, remaining columns exactly zero
    G = Xh[:p] @ Xh[:p].T
    assert np.linalg.norm(G - np.eye(p)) < 1e-12
    assert np.all(Xh[p:] == 0) and np.all(np.asarray(H) == 0)


def test_block_step_matches_block_sweep(rng):
    n, kdim, p = 48, 12, 2
    _, op = _dense_op(rng, n)
    x0 = jnp.asarray(rng.standard_normal(n))
    key = vectors.default_key(5)
    X0, H0 = initialize_arnoldi_block(x0, kdim, p, key=key)
    Xs, Hs, info = arnoldi_block(op, X0, H0, p)
    assert int(info) == 0
    Xq, Hq = X0, H0
    for b in range(kdim // p):
        Xq, Hq, res = arnoldi_block_step(op, Xq, Hq, b * p, p)
        assert float(res) > 0
    assert np.allclose(np.asarray(Xs), np.asarray(Xq), atol=1e-13)
    assert np.allclose(np.asarray(Hs), np.asarray(Hq), atol=1e-13)


def test_block_factorization_identity(rng):
    n, kdim, p = 48, 12, 3
    Am, op = _dense_op(rng, n)
    x0 = jnp.asarray(rng.standard_normal(n))
    X0, H0 = initialize_arnoldi_block(x0, kdim, p,
                                      key=vectors.default_key(1))
    X, H, info = arnoldi_block(op, X0, H0, p)
    assert int(info) == 0
    Xh, Hh = np.asarray(X), np.asarray(H)
    r = np.linalg.norm(Am @ Xh[:kdim].T - Xh[: kdim + p].T @ Hh)
    assert r < 1e-11 * np.abs(Hh).max()
    G = Xh[: kdim + p] @ Xh[: kdim + p].T
    assert np.linalg.norm(G - np.eye(kdim + p)) < 1e-11


def test_hessenberg_ritz_block_residuals(rng):
    """Device block Ritz residuals equal the numpy formula
    ``||B y_last_p||`` on a real block Arnoldi buffer."""
    n, kdim, p = 48, 12, 2
    _, op = _dense_op(rng, n)
    x0 = jnp.asarray(rng.standard_normal(n))
    X0, H0 = initialize_arnoldi_block(x0, kdim, p,
                                      key=vectors.default_key(2))
    X, H, _ = arnoldi_block(op, X0, H0, p)
    wr, wi, res, Vr, Vi, n_conv, ok = hessenberg_ritz(
        H, kdim, 1e-8, None, p=p)
    assert bool(ok)
    Hh = np.asarray(H)
    w_ref, V_ref = np.linalg.eig(Hh[:kdim, :kdim])
    B = Hh[kdim:kdim + p, kdim - p:kdim]
    r_ref = np.linalg.norm(B @ V_ref[-p:, :], axis=0)
    order = np.argsort(-np.abs(w_ref))
    w_ref, r_ref = w_ref[order], r_ref[order]
    w_dev = np.asarray(wr) + 1j * np.asarray(wi)
    assert np.max(np.abs(np.sort_complex(w_dev)
                         - np.sort_complex(w_ref))) < 1e-10
    assert np.max(np.abs(np.asarray(res) - r_ref)) < 1e-9


@pytest.mark.parametrize("p", [2, 3])
def test_krylov_schur_device_block_restart(p, rng):
    """Block device restart: compression lands on a block multiple, the
    extended factorization identity and orthonormality stay exact, and
    the kept Ritz values are the selected ones."""
    from lightkrylov_tpu.krylov.krylov_schur import krylov_schur_device

    n, kdim = 60, 12
    Am, op = _dense_op(rng, n)
    x0 = jnp.asarray(rng.standard_normal(n))
    X0, H0 = initialize_arnoldi_block(x0, kdim, p,
                                      key=vectors.default_key(4))
    X, H, _ = arnoldi_block(op, X0, H0, p)
    Hh = np.asarray(H)
    w = np.linalg.eigvals(Hh[:kdim, :kdim])
    wsorted = w[np.argsort(-np.abs(w))]
    mask = np.abs(wsorted) > np.median(np.abs(wsorted))
    Xn, Hn, nk, ok = krylov_schur_device(
        X, H, jnp.asarray(wsorted.real), jnp.asarray(wsorted.imag),
        jnp.asarray(mask), p=p)
    nk = int(nk)
    assert bool(ok)
    assert 1 <= nk <= kdim - p  # exact selected count, room to continue
    Xh, Hnh = np.asarray(Xn), np.asarray(Hn)
    r = np.linalg.norm(Am @ Xh[:nk].T - Xh[: nk + p].T @ Hnh[: nk + p, :nk])
    assert r < 1e-10 * np.abs(Hh).max()
    G = Xh[: nk + p] @ Xh[: nk + p].T
    assert np.linalg.norm(G - np.eye(nk + p)) < 1e-10
    assert np.all(Xh[nk + p:] == 0) and np.all(Hnh[:, nk:] == 0)
    # block-boundary alignment may round the keep count up (extra values
    # kept) or down (trailing selected values dropped — recovered on the
    # next sweep); the kept set must be exactly the leading Ritz values of
    # the reordered form: all kept values come from spec(H), and the
    # number of selected-but-dropped values is exactly max(0, n_sel - nk)
    w_kept = np.linalg.eigvals(Hnh[:nk, :nk])
    d_all = np.abs(w_kept[:, None] - w[None, :])
    assert np.max(np.min(d_all, axis=1)) < 1e-9 * max(1.0, np.abs(w).max())
    w_sel = wsorted[mask]
    d = np.abs(w_kept[:, None] - w_sel[None, :])
    dropped = int(np.sum(np.min(d, axis=0)
                         > 1e-9 * max(1.0, np.abs(w).max())))
    assert dropped == max(0, len(w_sel) - nk)


def test_eigs_blksize2_matches_dense_no_restart(rng):
    n, nev = 96, 4
    Am, op = _dense_op(rng, n)
    x0 = jnp.asarray(rng.standard_normal(n))
    evals, evecs, res, info, meta = lk.eigs(
        op, nev, x0=x0, kdim=32, tolerance=1e-9, blksize=2,
        options=lk.EigsOptions(projected="device"))
    assert info > 0 and meta.converged
    w_ref = np.linalg.eigvals(Am)
    w_ref = w_ref[np.argsort(-np.abs(w_ref))][:nev]
    assert np.max(np.abs(np.sort_complex(np.asarray(evals))
                         - np.sort_complex(w_ref))) < 1e-7
    # returned Ritz vectors are true eigenvectors to the residual level
    V = np.asarray(jax.device_get(
        jax.tree.map(lambda l: l, evecs))) if not isinstance(evecs, tuple) \
        else None
    for j in range(nev):
        v = np.asarray(jax.device_get(vectors.get_column(evecs, j)))
        lam = np.asarray(evals)[j]
        assert (np.linalg.norm(Am @ v - lam * v)
                / max(np.linalg.norm(v), 1e-30)) < 1e-6


def test_eigs_blksize2_with_restarts_complex_spectrum(rng):
    """Small kdim forces device block Krylov-Schur restarts on a fully
    complex spectrum, so the restart must keep exact counts around
    conjugate pairs and the offset-aligned continuation must stay an
    exact factorization across many cycles."""
    N, nev = 64, 4
    Am, op = _spiral_op(rng, N)
    w_all = np.linalg.eigvals(Am)
    exact = w_all[np.argsort(-np.abs(w_all))][:nev]
    x0 = jnp.asarray(rng.standard_normal(N))
    evals, evecs, res, info, meta = lk.eigs(
        op, nev, x0=x0, kdim=10, tolerance=1e-9, blksize=2,
        options=lk.EigsOptions(projected="device", maxiter=30))
    assert info > 0 and meta.converged
    assert meta.n_iter > 10  # at least one restart actually happened
    assert np.max(np.abs(np.sort_complex(np.asarray(evals))
                         - np.sort_complex(exact))) < 1e-7


def test_eigs_blksize_matches_blksize1(rng):
    # nev=4 keeps the leading set pair-aligned: this spectrum is purely
    # conjugate pairs with equal-modulus halves, so an odd nev returns an
    # arbitrary half of the boundary pair (legitimately different between
    # runs)
    N, nev = 96, 4
    op = TridiagToeplitz(N, 2.0, -1.0, 1.0, dtype=jnp.float64)
    x0 = jnp.asarray(rng.standard_normal(N))
    w1, _, _, info1, _ = lk.eigs(op, nev, x0=x0, kdim=36, tolerance=1e-9,
                                 options=lk.EigsOptions(projected="device",
                                                        maxiter=40))
    w2, _, _, info2, _ = lk.eigs(op, nev, x0=x0, kdim=36, tolerance=1e-9,
                                 blksize=3,
                                 options=lk.EigsOptions(projected="device",
                                                        maxiter=40))
    assert info1 > 0 and info2 > 0
    # multiset match (sort_complex ties on ~1e-10 real-part noise here)
    d = np.abs(np.asarray(w1)[:, None] - np.asarray(w2)[None, :])
    assert np.max(np.min(d, axis=0)) < 1e-7
    assert np.max(np.min(d, axis=1)) < 1e-7


def test_eigs_block_guards(rng):
    N = 16
    op = TridiagToeplitz(N, 2.0, -1.0, 1.0, dtype=jnp.float64)
    x0c = jnp.asarray(rng.standard_normal(N)).astype(jnp.complex128)
    with pytest.raises(TypeError):
        lk.eigs(op, 2, x0=x0c, blksize=2)
    x0 = jnp.asarray(rng.standard_normal(N))
    with pytest.raises(NotImplementedError):
        lk.eigs(op, 2, x0=x0, blksize=2,
                options=lk.EigsOptions(checkpoint_every=1,
                                       checkpoint_path="/tmp/x.npz"))


def test_eigs_block_explicit_restart_fallback(rng, monkeypatch):
    """A rejected device Schur restart (ok=False) makes the next cycle
    restart explicitly (reseed from the leading Ritz direction) — the
    driver still converges."""
    import importlib

    eigs_mod = importlib.import_module("lightkrylov_tpu.solvers.eigs")
    orig = eigs_mod.krylov_schur_device
    calls = {"n": 0}

    def flaky_ks(X, H, wr, wi, mask, p=1, k_eff=None):
        Xn, Hn, nk, ok = orig(X, H, wr, wi, mask, p=p, k_eff=k_eff)
        calls["n"] += 1
        if calls["n"] == 1:
            return Xn, Hn, nk, jnp.asarray(False)
        return Xn, Hn, nk, ok

    monkeypatch.setattr(eigs_mod, "krylov_schur_device", flaky_ks)
    N, nev = 64, 4
    Am, op = _spiral_op(rng, N)
    w_all = np.linalg.eigvals(Am)
    exact = w_all[np.argsort(-np.abs(w_all))][:nev]
    x0 = jnp.asarray(rng.standard_normal(N))
    evals, _, _, info, _ = lk.eigs(
        op, nev, x0=x0, kdim=10, tolerance=1e-9, blksize=2,
        options=lk.EigsOptions(projected="device", maxiter=40))
    assert calls["n"] >= 1
    assert info > 0
    assert np.max(np.abs(np.sort_complex(np.asarray(evals))
                         - np.sort_complex(exact))) < 1e-7
