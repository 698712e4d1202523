"""Classical Gram-Schmidt with re-orthogonalization (CGS2).

TPU-native counterpart of ``src/Krylov/gram_schmidt.fypp``: classical GS
projection of a vector (or block) against an orthonormal basis —
``proj = innerprod(X, y); y -= X proj`` (gram_schmidt.fypp:141-146,187-192) —
and ``double_gram_schmidt_step`` = two passes with coefficients summed
(CGS2, gram_schmidt.fypp:38-49,85-97).

The TPU design point (SURVEY.md §2 item 3): the k inner products of one pass
are batched into a *single* reshaped matmul via :func:`vectors.innerprod`,
so on a sharded mesh each CGS pass costs exactly one fused all-reduce —
the "low-synch" property the reference obtains only implicitly through
its abstract ``innerprod``.

Buffer convention: the basis ``X`` is a fixed-size stacked buffer whose
unfilled columns are exactly zero; projections against the full buffer are
then algebraically exact without masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants, vectors

__all__ = [
    "orthogonalize_against_basis",
    "double_gram_schmidt_step",
]

#: Chunk width for active-prefix projections (see
#: :func:`vectors.innerprod_prefix`): callers that pass the filled column
#: count ``k`` read only ~k (not kdim) columns per CGS pass.  Set to None to
#: force full-buffer reads — one fused all-reduce per pass instead of one
#: per live chunk, the better trade on latency-bound multi-host meshes.
DEFAULT_CHUNK: int | None = 8

#: Prefix chunking only engages for buffers of at least this many columns:
#: each chunk costs an HLO conditional whose scheduling overhead on TPU
#: (~0.1 ms class) outweighs the skipped traffic for small buffers — at
#: kdim=30 the monolithic GMRES cycle measured 402 ms vs 509 ms chunked
#: AFTER the VPU rank-k update fix (results_tpu.json probe "cgs_cost"),
#: while for kdim >= ~64 the saved traffic dominates the fixed cond cost.
MIN_PREFIX_COLS: int = 48


def orthogonalize_against_basis(y, X, k=None, chunk=None):
    """Single CGS pass: project ``y`` (vector or stacked block) against the
    basis buffer ``X`` and subtract.

    Returns ``(y_orth, proj)`` where ``proj = X^H y`` has shape ``(m,)`` for a
    vector or ``(m, p)`` for a block (reference:
    gram_schmidt.fypp:141-146,187-192).

    ``k`` (optional, may be traced): number of filled buffer columns; when
    given, only basis chunks intersecting ``[0, k)`` are streamed from HBM
    (exact by the zero-column buffer invariant) — the reference's
    ``X(:k)`` growing projection without dynamic shapes.
    """
    if chunk is None:
        chunk = DEFAULT_CHUNK
    if k is None or chunk is None or \
            vectors.basis_size(X) < MIN_PREFIX_COLS:
        proj = vectors.innerprod(X, y)
        correction = vectors.linear_combination(X, proj)
    else:
        proj = vectors.innerprod_prefix(X, y, k, chunk)
        correction = vectors.linear_combination_prefix(X, proj, k, chunk)
    y_orth = vectors.axpby(1.0, y, -1.0, correction) if proj.ndim == 1 else \
        vectors.axpby_basis(1.0, y, -1.0, correction)
    return y_orth, proj


def double_gram_schmidt_step(y, X, return_info: bool = False, k=None,
                             chunk=None):
    """CGS2: two projection passes, coefficients summed
    (reference: ``double_gram_schmidt_step``, gram_schmidt.fypp:38-49,85-97).

    Two passes of classical Gram-Schmidt restore orthogonality to machine
    precision ("twice is enough"), while keeping each pass a single batched
    reduction — the TPU-friendly alternative to modified Gram-Schmidt's k
    sequential dots.

    Returns ``(y_orth, proj)`` with ``proj`` the summed coefficients.  With
    ``return_info=True`` a third element is appended: the 1-based index of
    the first projected column that vanished (norm below the dtype's atol),
    0 when none did — the reference's zero-vector flag
    (gram_schmidt.fypp:127,171-173), which covers a zero column *inside* a
    block projection that single-vector β-checks by callers would miss.
    The info value is a traced int32 scalar, usable inside jitted loops.

    ``k``/``chunk``: active-prefix projection — see
    :func:`orthogonalize_against_basis`.
    """
    y1, p1 = orthogonalize_against_basis(y, X, k=k, chunk=chunk)
    y2, p2 = orthogonalize_against_basis(y1, X, k=k, chunk=chunk)
    if not return_info:
        return y2, p1 + p2
    tol = constants.atol(constants.real_dtype_of(vectors.dtype_of(y2)))
    if p1.ndim == 1:  # single vector
        vanished = vectors.norm(y2) < tol
        info = jnp.where(vanished, 1, 0).astype(jnp.int32)
    else:  # stacked block: flag the first vanished column
        norms = jnp.sqrt(jnp.real(jnp.diagonal(vectors.gram(y2))))
        small = norms < tol
        first = jnp.argmax(small).astype(jnp.int32)
        info = jnp.where(jnp.any(small), first + 1, 0).astype(jnp.int32)
    return y2, p1 + p2, info
