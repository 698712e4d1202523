"""Vector and basis algebra tests
(reference test model: test/TestVectors.fypp — vector-space axiom property
tests on random data, plus basis utility checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lightkrylov_tpu as lk
from lightkrylov_tpu import vectors

N = 128  # reference fixture size (TestUtils.fypp:18 ``test_size = 128``)


def _template(dtype, pytree=False):
    if pytree:
        return {"a": jnp.zeros((N,), dtype), "b": jnp.zeros((4, 8), dtype)}
    return jnp.zeros((N,), dtype)


@pytest.mark.parametrize("pytree", [False, True], ids=["array", "pytree"])
def test_vector_axioms(key, dtype, pytree):
    """8 vector-space axioms on random data
    (reference: AbstractVectors.fypp:733-927)."""
    lk.verify_vector_axioms(key, _template(dtype, pytree), n_trials=100)


def test_dot_conjugate_linearity(key, dtype):
    x = vectors.rand_like(key, _template(dtype))
    y = vectors.rand_like(jax.random.fold_in(key, 1), _template(dtype))
    ref = np.vdot(np.asarray(x), np.asarray(y))
    assert np.allclose(lk.dot(x, y), ref, rtol=1e-5)
    # norm^2 == dot(x, x), real
    n2 = float(lk.norm(x)) ** 2
    assert np.allclose(n2, np.real(np.vdot(np.asarray(x), np.asarray(x))), rtol=1e-5)


def test_innerprod_matches_dense(key, dtype):
    """innerprod(X, y) = X^H y and innerprod(X, Y) = X^H Y
    (reference: AbstractVectors.fypp:659-695)."""
    k, m = 5, 3
    X = vectors.rand_basis(key, vectors.zeros_basis(_template(dtype), k))
    Y = vectors.rand_basis(jax.random.fold_in(key, 7), vectors.zeros_basis(_template(dtype), m))
    y = vectors.get_column(Y, 0)
    Xm = np.asarray(jax.tree_util.tree_leaves(X)[0])
    ref_v = Xm.conj() @ np.asarray(y)
    assert np.allclose(vectors.innerprod(X, y), ref_v, rtol=1e-5)
    ref_m = Xm.conj() @ np.asarray(jax.tree_util.tree_leaves(Y)[0]).T
    assert np.allclose(vectors.innerprod(X, Y), ref_m, rtol=1e-5)


def test_linear_combination(key, dtype):
    """y = X v and Y = X B (reference: AbstractVectors.fypp:571-643)."""
    k, m = 6, 2
    X = vectors.rand_basis(key, vectors.zeros_basis(_template(dtype), k))
    Xm = np.asarray(jax.tree_util.tree_leaves(X)[0])
    v = np.linspace(1, 2, k).astype(dtype)
    out = vectors.linear_combination(X, jnp.asarray(v))
    assert np.allclose(np.asarray(out), v @ Xm, rtol=1e-5)
    B = np.random.default_rng(0).standard_normal((k, m)).astype(dtype)
    out2 = vectors.linear_combination(X, jnp.asarray(B))
    assert np.allclose(np.asarray(jax.tree_util.tree_leaves(out2)[0]), B.T @ Xm, rtol=1e-5)


def test_gram_hermitian(key, dtype):
    X = vectors.rand_basis(key, vectors.zeros_basis(_template(dtype, True), 4))
    G = np.asarray(vectors.gram(X))
    assert np.allclose(G, G.conj().T, rtol=1e-5)


def test_stack_unstack_roundtrip(key, dtype):
    vs = [vectors.rand_like(jax.random.fold_in(key, i), _template(dtype, True)) for i in range(3)]
    X = vectors.stack(vs)
    assert vectors.basis_size(X) == 3
    back = vectors.unstack(X)
    for a, b in zip(vs, back):
        assert float(vectors.norm(vectors.sub(a, b))) == 0.0


def test_get_size(dtype):
    assert lk.get_size(_template(dtype, True)) == N + 32
