"""Linear solver tests — solve-and-verify + preconditioned Poisson
(reference model: test/TestIterativeSolvers.fypp:520-725 random-system
gmres/fgmres/cg checks; test/TestSpecialMatrices.f90:29-159 block-Jacobi
PCG on 2D Poisson)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lightkrylov_tpu as lk
from lightkrylov_tpu.models import (
    BlockJacobiPoisson,
    ConvectionDiffusion2D,
    Poisson2D,
)

N = 64


def _rand(dtype, rng, shape):
    A = rng.standard_normal(shape)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        A = A + 1j * rng.standard_normal(shape)
    return A.astype(dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _tol(dtype):
    return lk.rtol(dtype)


def test_gmres_random_system(dtype, rng):
    """||Ax - b|| below tol on a well-conditioned random system
    (reference: TestIterativeSolvers.fypp:520-614)."""
    A = _rand(dtype, rng, (N, N)) + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))
    x, info, meta = lk.gmres(jnp.asarray(A), jnp.asarray(b))
    assert meta.converged and info > 0
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_gmres_restarted(dtype_dp, rng):
    """Convergence across restarts with small kdim."""
    dtype = dtype_dp
    A = _rand(dtype, rng, (N, N)) + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))
    opts = lk.GMRESOptions(kdim=4, maxiter=50)
    x, info, meta = lk.gmres(jnp.asarray(A), jnp.asarray(b), options=opts)
    assert meta.converged
    assert meta.n_iter > 1  # actually restarted
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_gmres_transpose(dtype_dp, rng):
    """transpose=True solves A^H x = b (reference: gmres transpose flag)."""
    dtype = dtype_dp
    A = _rand(dtype, rng, (N, N)) + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))
    x, info, meta = lk.gmres(jnp.asarray(A), jnp.asarray(b), transpose=True)
    assert meta.converged
    res = np.linalg.norm(A.conj().T @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_gmres_preconditioned(rng):
    """Right-preconditioned GMRES converges faster than plain."""
    dtype = np.float64
    D = np.diag(np.linspace(1, 500, N)).astype(dtype)
    A = D + 0.5 * _rand(dtype, rng, (N, N))
    b = _rand(dtype, rng, (N,))
    M = lk.DiagonalOperator(jnp.asarray(1.0 / np.diag(D)))
    opts = lk.GMRESOptions(kdim=25, maxiter=40)
    _, _, meta_plain = lk.gmres(jnp.asarray(A), jnp.asarray(b), options=opts)
    x, _, meta_prec = lk.gmres(jnp.asarray(A), jnp.asarray(b),
                               preconditioner=M, options=opts)
    assert meta_prec.converged
    assert meta_prec.n_inner <= meta_plain.n_inner
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_fgmres_random_system(dtype_dp, rng):
    """(reference: fgmres.fypp solve-and-verify)."""
    dtype = dtype_dp
    A = _rand(dtype, rng, (N, N)) + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))
    x, info, meta = lk.fgmres(jnp.asarray(A), jnp.asarray(b))
    assert meta.converged
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_cg_spd_system(dtype, rng):
    """CG on a random SPD/HPD system (reference:
    TestIterativeSolvers.fypp:616-725)."""
    M_ = _rand(dtype, rng, (N, N))
    A = M_ @ M_.conj().T + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))
    x, info, meta = lk.cg(lk.DenseOperator(jnp.asarray(A), is_hermitian=True),
                          jnp.asarray(b))
    assert meta.converged and info > 0
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_pcg_poisson_block_jacobi():
    """Preconditioned CG on the 2D Poisson operator with block-Jacobi
    (tridiagonal-solve) preconditioner, to ||b|| * rtol_dp
    (reference: test/TestSpecialMatrices.f90:20-159 — 16x8 grid)."""
    op = Poisson2D(16, 8)
    M = BlockJacobiPoisson(op)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((8, 16)))
    x, info, meta = lk.cg(op, b, preconditioner=M,
                          options=lk.CGOptions(maxiter=200))
    assert meta.converged
    res = float(lk.norm(lk.sub(op.matvec(x), b))) / float(lk.norm(b))
    assert res < lk.rtol(np.float64)
    # preconditioning must reduce iteration count vs plain CG
    _, _, meta_plain = lk.cg(op, b, options=lk.CGOptions(maxiter=200))
    assert meta.n_iter < meta_plain.n_iter


def test_cg_poisson_128_to_1e10():
    """BASELINE config 1: CG on the 128x128 5-point Laplacian to 1e-10."""
    op = Poisson2D(128)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal((128, 128)))
    x, info, meta = lk.cg(op, b, rtol=0.0, atol=1e-10 * float(lk.norm(b)),
                          preconditioner=BlockJacobiPoisson(op),
                          options=lk.CGOptions(maxiter=2000))
    assert meta.converged
    res = float(lk.norm(lk.sub(op.matvec(x), b))) / float(lk.norm(b))
    assert res < 1e-10


def test_gmres_convdiff(dtype_dp):
    """BASELINE config 2: restarted GMRES on the nonsymmetric
    convection-diffusion operator."""
    if np.issubdtype(np.dtype(dtype_dp), np.complexfloating):
        pytest.skip("real-operator config")
    op = ConvectionDiffusion2D(32, 32, eps=1e-2)
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal((32, 32)))
    x, info, meta = lk.gmres(op, b, options=lk.GMRESOptions(kdim=30, maxiter=200))
    assert meta.converged
    res = float(lk.norm(lk.sub(op.matvec(x), b))) / float(lk.norm(b))
    assert res < lk.rtol(np.float64)


def test_gmres_convdiff_single_precision():
    """Same operator in f32 (BASELINE config 2: 'single + double')."""
    op = ConvectionDiffusion2D(24, 24, eps=5e-2, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal((24, 24)).astype(np.float32))
    x, info, meta = lk.gmres(op, b, options=lk.GMRESOptions(kdim=30, maxiter=100))
    assert meta.converged
    res = float(lk.norm(lk.sub(op.matvec(x), b))) / float(lk.norm(b))
    assert res < 10 * lk.rtol(np.float32)


def test_iteration_aware_preconditioner(rng):
    """Preconditioner.apply receives (iteration, residuals)
    (reference: abstract_precond, IterativeSolvers.fypp:80-95)."""
    import jax

    dtype = np.float64
    D = np.diag(np.linspace(1, 100, N)).astype(dtype)
    A = D + 0.1 * _rand(dtype, rng, (N, N))
    b = _rand(dtype, rng, (N,))

    class JacobiWithInfo(lk.Preconditioner):
        _children = ("dinv",)
        _static = ()

        def __init__(self, dinv):
            self.dinv = dinv

        def apply(self, v, iteration=0, current_residual=0.0,
                  target_residual=0.0):
            # damp the preconditioner early in the cycle (exercises the
            # traced iteration argument inside the jitted solver)
            damp = jnp.where(iteration < 2, 0.5, 1.0)
            return damp * self.dinv * v

    M = JacobiWithInfo(jnp.asarray(1.0 / np.diag(D)))
    x, info, meta = lk.gmres(jnp.asarray(A), jnp.asarray(b), preconditioner=M,
                             options=lk.GMRESOptions(kdim=30, maxiter=20))
    assert meta.converged
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_cg_preconditioner_iteration_context(rng):
    """CG routes Preconditioner.apply through the iteration-aware interface
    (reference: abstract_precond_*%apply(vec, [iter, current_residual,
    target_residual]), IterativeSolvers.fypp:80-95 — the interface of
    *every* preconditioned solver, not just GMRES).

    The preconditioner poisons its output with NaN unless a nonzero
    target_residual was supplied: convergence therefore proves CG passed
    the context instead of falling back to plain ``matvec`` (whose default
    arguments would leave target_residual at 0)."""
    dtype = np.float64
    M_ = _rand(dtype, rng, (N, N))
    A = M_ @ M_.conj().T + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))

    class ContextRequiredJacobi(lk.Preconditioner):
        _children = ("dinv",)
        _static = ()

        def __init__(self, dinv):
            self.dinv = dinv

        def apply(self, v, iteration=0, current_residual=0.0,
                  target_residual=0.0):
            poison = jnp.where(target_residual > 0, 1.0, jnp.nan)
            return poison * self.dinv * v

    M = ContextRequiredJacobi(jnp.asarray(1.0 / np.diag(A)))
    x, info, meta = lk.cg(lk.DenseOperator(jnp.asarray(A), is_hermitian=True),
                          jnp.asarray(b), preconditioner=M)
    assert meta.converged and info > 0
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)


def test_fgmres_iteration_varying_preconditioner(rng):
    """FGMRES's distinguishing feature: a per-iteration *varying*
    preconditioner is legal because the preconditioned directions Z are
    stored and the update is built from them (reference:
    fgmres.fypp:158-207).  Here M_k genuinely changes direction with the
    inner iteration index (damped Jacobi plus an iteration-dependent
    circular shift), so Z differs from V by more than a scaling — plain
    right-GMRES's fixed-M update formula does not apply."""
    dtype = np.float64
    D = np.diag(np.linspace(1, 200, N)).astype(dtype)
    A = D + 0.5 * _rand(dtype, rng, (N, N))
    b = _rand(dtype, rng, (N,))
    x_oracle = np.linalg.solve(A, b)

    class VaryingPrecond(lk.Preconditioner):
        _children = ("dinv",)
        _static = ()

        def __init__(self, dinv):
            self.dinv = dinv

        def apply(self, v, iteration=0, current_residual=0.0,
                  target_residual=0.0):
            z = self.dinv * v
            # iteration-dependent direction change: Z != V materially
            return z + 0.2 * jnp.roll(z, iteration + 1)

    M = VaryingPrecond(jnp.asarray(1.0 / np.diag(D)))
    opts = lk.GMRESOptions(kdim=40, maxiter=10)
    x, info, meta = lk.fgmres(jnp.asarray(A), jnp.asarray(b),
                              preconditioner=M, options=opts)
    assert meta.converged and info > 0
    res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert res < 10 * _tol(dtype)
    assert np.allclose(np.asarray(x), x_oracle, atol=1e-6)
    # Plain right-GMRES applies M once to the *accumulated* correction
    # (gmres.fypp:201-202), which is wrong for a varying M: its first
    # restart cycle must end with a (true-residual) estimate worse than
    # FGMRES achieves at the same inner-iteration budget.
    xg, _, meta_g = lk.gmres(jnp.asarray(A), jnp.asarray(b),
                             preconditioner=M,
                             options=lk.GMRESOptions(kdim=40, maxiter=1))
    res_g = np.linalg.norm(A @ np.asarray(xg) - b) / np.linalg.norm(b)
    xf, _, _ = lk.fgmres(jnp.asarray(A), jnp.asarray(b), preconditioner=M,
                         options=lk.GMRESOptions(kdim=40, maxiter=1))
    res_f = np.linalg.norm(A @ np.asarray(xf) - b) / np.linalg.norm(b)
    assert res_f < res_g


def test_gmres_large_kdim_prefix_path():
    """kdim >= MIN_PREFIX_COLS engages active-prefix chunked CGS2 inside
    the jitted GMRES core; result must match the monolithic path (the
    exactness contract of innerprod_prefix under the zero-column buffer
    invariant)."""
    from lightkrylov_tpu.krylov import gram_schmidt

    n = 96
    rng = np.random.default_rng(5)
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    op = lk.DenseOperator(jnp.asarray(A))
    b = jnp.asarray(rng.standard_normal(n))
    assert 64 >= gram_schmidt.MIN_PREFIX_COLS
    x1, info1, _ = lk.gmres(op, b, rtol=1e-12,
                            options=lk.GMRESOptions(kdim=64, maxiter=2))
    # force the monolithic path for comparison
    old = gram_schmidt.DEFAULT_CHUNK
    gram_schmidt.DEFAULT_CHUNK = None
    try:
        jax.clear_caches()
        x2, info2, _ = lk.gmres(op, b, rtol=1e-12,
                                options=lk.GMRESOptions(kdim=64, maxiter=2))
    finally:
        gram_schmidt.DEFAULT_CHUNK = old
        jax.clear_caches()
    r1 = np.linalg.norm(A @ np.asarray(x1) - np.asarray(b))
    r2 = np.linalg.norm(A @ np.asarray(x2) - np.asarray(b))
    assert r1 < 1e-8 and r2 < 1e-8
    assert np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-10)


def test_gmres_dcgs2_matches_cgs2(dtype, rng):
    """DCGS2 (delayed, one-reduce, two-stream CGS2) vs classical CGS2
    across all four scalar flavors: same solution, same convergence, and
    inner-iteration counts within the one-step lag of the delayed residual
    — an orthogonality-loss proxy (loss would inflate GMRES iterations)."""
    A = _rand(dtype, rng, (N, N)) + N * np.eye(N, dtype=dtype)
    b = _rand(dtype, rng, (N,))
    xs, metas = {}, {}
    for orth in ("cgs2", "dcgs2"):
        x, info, meta = lk.gmres(
            jnp.asarray(A), jnp.asarray(b),
            options=lk.GMRESOptions(kdim=20, maxiter=20, orthogonalization=orth))
        assert meta.converged, f"{orth} did not converge"
        res = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
        assert res < 10 * _tol(dtype), f"{orth}: {res}"
        xs[orth], metas[orth] = np.asarray(x), meta
    assert np.allclose(xs["dcgs2"], xs["cgs2"], atol=100 * _tol(dtype))
    assert abs(metas["dcgs2"].n_inner - metas["cgs2"].n_inner) <= 2


def test_gmres_dcgs2_illconditioned_f32():
    """Large-norm operator in f32: the gamma-rescaled delayed scheme must
    not overflow (the raw delayed scheme compounds ||A||^k into the stored
    direction) and must match the CGS2 iteration count closely."""
    rng_ = np.random.default_rng(77)
    n = 96
    A = (100.0 * rng_.standard_normal((n, n)) / np.sqrt(n)
         + 100.0 * np.eye(n)).astype(np.float32)
    b = rng_.standard_normal(n).astype(np.float32)
    out = {}
    for orth in ("cgs2", "dcgs2"):
        x, info, meta = lk.gmres(
            jnp.asarray(A), jnp.asarray(b), rtol=1e-5,
            options=lk.GMRESOptions(kdim=30, maxiter=30, orthogonalization=orth))
        assert meta.converged, f"{orth} failed"
        out[orth] = meta.n_inner
    assert abs(out["dcgs2"] - out["cgs2"]) <= 3
