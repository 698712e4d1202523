"""kexpm oracle tests and Newton-Krylov end-to-end
(reference model: test/TestExpmlib.fypp:42-230 kexpm vs dense expm;
test/TestNewtonKrylov.fypp:46-109 Newton on Roessler from the origin
converges to the analytical fixed point, with and without bisection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

import lightkrylov_tpu as lk
from lightkrylov_tpu import vectors
from lightkrylov_tpu.models import roessler_fixed_points, fixed_point_system, upo_system

N = 128


def _rand(dtype, rng, shape):
    A = rng.standard_normal(shape)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        A = A + 1j * rng.standard_normal(shape)
    return A.astype(dtype)


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def test_kexpm_vs_dense(dtype, rng):
    """c = exp(tau A) b vs scipy dense expm
    (reference: TestExpmlib.fypp:42-230)."""
    dtype_np = np.dtype(dtype)
    A = (_rand(dtype, rng, (N, N)) / np.sqrt(N)).astype(dtype)
    b = _rand(dtype, rng, (N,))
    tau = 0.7
    tol = lk.rtol(dtype) * 1e-2 if dtype_np.itemsize > 8 or dtype_np == np.float64 else lk.rtol(dtype)
    c, info = lk.kexpm(jnp.asarray(A), jnp.asarray(b), tau, tol=tol, kdim=80)
    assert info > 0 or info == -2
    exact = sla.expm(tau * A) @ b
    err = np.linalg.norm(np.asarray(c) - exact) / np.linalg.norm(exact)
    assert err < 100 * lk.rtol(dtype)


def test_kexpm_invariant_subspace(rng):
    """Breakdown -> exact result, info = -2 (reference: ExpmLib.fypp:200-204)."""
    A = np.zeros((N, N))
    A[:3, :3] = rng.standard_normal((3, 3))
    b = np.zeros(N)
    b[:3] = rng.standard_normal(3)
    c, info = lk.kexpm(jnp.asarray(A), jnp.asarray(b), 1.0, tol=1e-12, kdim=30)
    assert info == -2
    exact = sla.expm(A) @ b
    assert np.linalg.norm(np.asarray(c) - exact) / np.linalg.norm(exact) < 1e-10


def test_krylov_exptA_matches_kexpm(dtype_dp, rng):
    """(reference: krylov_exptA wrapper, ExpmLib.fypp:365-392)."""
    dtype = dtype_dp
    A = (_rand(dtype, rng, (N, N)) / np.sqrt(N)).astype(dtype)
    b = _rand(dtype, rng, (N,))
    c = lk.krylov_exptA(jnp.asarray(A), jnp.asarray(b), 0.3, kdim=60)
    exact = sla.expm(0.3 * A) @ b
    assert np.linalg.norm(np.asarray(c) - exact) / np.linalg.norm(exact) < 1e-9


def test_exponential_propagator_operator(rng):
    """ExponentialPropagator as a LinearOperator: exp(tau A) action and its
    adjoint exp(tau A^H) (reference: abstract_exptA_linop)."""
    dtype = np.float64
    A = (_rand(dtype, rng, (N, N)) / np.sqrt(N)).astype(dtype)
    P = lk.ExponentialPropagator(jnp.asarray(A), 0.5, kdim=60)
    x = _rand(dtype, rng, (N,))
    assert np.allclose(np.asarray(P.matvec(jnp.asarray(x))),
                       sla.expm(0.5 * A) @ x, rtol=1e-8, atol=1e-9)
    assert np.allclose(np.asarray(P.rmatvec(jnp.asarray(x))),
                       sla.expm(0.5 * A.T) @ x, rtol=1e-8, atol=1e-9)


# -- Newton-Krylov -----------------------------------------------------------

def test_newton_roessler_fixed_point():
    """Newton from near the origin converges to the analytical fixed point
    (reference: TestNewtonKrylov.fypp:46-109)."""
    sys = fixed_point_system()
    fp_minus, _ = roessler_fixed_points()
    X0 = jnp.asarray(np.array([0.0, -1.0, 0.1]))
    X, info, meta = lk.newton(sys, X0, rtol=0.0, atol=1e-12)
    assert meta.converged and info > 0
    assert np.allclose(np.asarray(X), fp_minus, atol=1e-9)


def test_newton_roessler_with_bisection():
    """Same, with the golden-section bisection line search enabled
    (reference: TestNewtonKrylov.fypp second variant)."""
    sys = fixed_point_system()
    fp_minus, _ = roessler_fixed_points()
    X0 = jnp.asarray(np.array([0.0, -1.0, 0.1]))
    opts = lk.NewtonOptions(ifbisect=True, maxstep_bisection=5)
    X, info, meta = lk.newton(sys, X0, rtol=0.0, atol=1e-12, options=opts)
    assert meta.converged
    assert np.allclose(np.asarray(X), fp_minus, atol=1e-9)


def test_newton_schedulers():
    """constant_tol vs dynamic_tol schedulers both converge
    (reference: NewtonKrylov.fypp:534-598)."""
    sys = fixed_point_system()
    fp_minus, _ = roessler_fixed_points()
    X0 = jnp.asarray(np.array([0.0, -1.0, 0.1]))
    for sched in (lk.constant_tol, lk.dynamic_tol):
        X, info, meta = lk.newton(sys, X0, rtol=0.0, atol=1e-12, scheduler=sched)
        assert meta.converged
        assert np.allclose(np.asarray(X), fp_minus, atol=1e-8)


@pytest.mark.slow
def test_newton_roessler_upo():
    """BASELINE config 5: unstable periodic orbit of the Roessler system via
    Newton-Krylov shooting (reference: example/roessler/main.f90:103).

    Seed near the known period-1 UPO (T ~ 5.88); verify that the converged
    orbit closes: ||flow_T(X) - X|| ~ 0 with T > 0."""
    from lightkrylov_tpu.models import flow

    sys = upo_system(n_steps=2000)
    X0 = {"pos": jnp.asarray(np.array([5.0, -2.0, 0.02])),
          "T": jnp.asarray(6.0)}
    opts = lk.NewtonOptions(maxiter=60)
    gopts = lk.GMRESOptions(kdim=4, maxiter=10)
    X, info, meta = lk.newton(sys, X0, rtol=0.0, atol=1e-10, options=opts,
                              linear_solver_options=gopts)
    assert meta.converged, f"residuals: {meta.residuals}"
    T = float(X["T"])
    assert T > 1.0
    closure = flow(X["pos"], X["T"], 2000) - X["pos"]
    assert float(jnp.linalg.norm(closure)) < 1e-8
