"""Pallas TPU kernel: blocked-ELL sparse matrix-vector product.

The general sparse-operator tier (SURVEY.md §2 "[TPU-native] SpMV";
BASELINE: ">= 80% of roofline SpMV nnz/s per chip").  TPUs have no gather
hardware, so the CSR formats of CPU/GPU land poorly; the TPU-native layout
is **Block-ELL**: the matrix is cut into (bm x bn) dense blocks aligned to
the VPU/MXU tile (8 x 128 for f32), each block-row stores a fixed number K
of blocks (padded with explicit zero blocks), giving a fully static,
gather-free kernel:

* ``data``: (nbr, K, bm, bn) block values — streamed once from HBM through
  Pallas' automatic double-buffered pipeline (this stream is the roofline).
* ``cols``: (nbr, K) block-column indices — scalar-prefetched so the x
  slices are formed with dynamic VMEM slicing, not gathers.
* ``x``: resident in VMEM (one copy, reused by every block-row).

SpMV is bandwidth-bound: speed-of-light is streaming ``data`` at HBM
bandwidth; per block the kernel does one (bm x bn) @ (bn) product on
VPU/MXU while the next block is in flight.

Zero-padding blocks point at column 0 with zero values, so no masking
arithmetic is needed.  PDE operators (stencils) have bounded row degree,
making the K-padding overhead small; `bell_from_scipy` reports the fill
ratio.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...linops import LinearOperator

__all__ = ["BellMatrix", "bell_from_scipy", "bell_spmv", "BellOperator"]


class BellMatrix:
    """Host-side container for a Block-ELL matrix (device arrays)."""

    def __init__(self, data, cols, shape, nnz: int):
        self.data = data      # (nbr, K, bm, bn)
        self.cols = cols      # (nbr, K) int32
        self.shape = shape    # (m, n) logical (possibly unpadded) shape
        self.nnz = nnz        # true scalar nonzeros (for nnz/s accounting)

    @property
    def bm(self):
        return self.data.shape[2]

    @property
    def bn(self):
        return self.data.shape[3]

    @property
    def K(self):
        return self.data.shape[1]


def bell_from_scipy(A, bm: int = 8, bn: int = 128, dtype=np.float32) -> BellMatrix:
    """Convert a scipy sparse matrix to Block-ELL (host-side assembly)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    A.sum_duplicates()
    m, n = A.shape
    m_p = -(-m // bm) * bm
    n_p = -(-n // bn) * bn
    nbr = m_p // bm
    nbc = n_p // bn

    # Native C++ assembler for real dtypes (identical layout contract);
    # numpy fallback below otherwise.
    if np.dtype(dtype) in (np.float32, np.float64):
        from ... import native

        if native.available():
            data, cols, K = native.bell_assemble(A, bm, bn, dtype)
            mat = BellMatrix(jnp.asarray(data), jnp.asarray(cols), (m, n), A.nnz)
            mat.fill_ratio = A.nnz / data.size if data.size else 1.0
            return mat

    coo = A.tocoo()
    br = coo.row.astype(np.int64) // bm
    bc = coo.col.astype(np.int64) // bn
    bid = br * nbc + bc
    uniq, inv = np.unique(bid, return_inverse=True)
    ubr = (uniq // nbc).astype(np.int64)
    ubc = (uniq % nbc).astype(np.int64)
    # uniq is sorted by (block-row, block-col): the slot of each unique
    # block is its rank within its block-row.
    row_start = np.searchsorted(ubr, np.arange(nbr))
    slot_of_uniq = np.arange(len(uniq)) - row_start[ubr]
    K = max(int(slot_of_uniq.max()) + 1, 1) if len(uniq) else 1

    data = np.zeros((nbr, K, bm, bn), dtype)
    cols = np.zeros((nbr, K), np.int32)
    cols[ubr, slot_of_uniq] = ubc.astype(np.int32)
    data[br, slot_of_uniq[inv], coo.row % bm, coo.col % bn] = coo.data.astype(dtype)
    fill = A.nnz / data.size if data.size else 1.0
    mat = BellMatrix(jnp.asarray(data), jnp.asarray(cols), (m, n), A.nnz)
    mat.fill_ratio = fill
    return mat


def _spmv_kernel(cols_ref, data_ref, x_ref, y_ref, *, K, bm, bn, R):
    # Each grid step handles R block-rows so the output block is
    # (R, bm) = (8, 8)-aligned (TPU tiling requires the trailing block dims
    # to be multiples of (8, 128) or span the full axis).  ``cols`` arrives
    # as a per-step (R, K) SMEM block — scalar-prefetching the whole cols
    # array overflows SMEM beyond a few thousand block-rows.
    #
    # ``x_ref`` is (nbc, bm, bn): block-column c of x replicated across the
    # bm sublanes.  Dynamic indexing then only touches the *untiled* leading
    # axis (whole (8,128) tiles) — Mosaic cannot prove alignment of a
    # sub-tile dynamic offset into a flat x (vector.load wants the 1-D
    # offset to be a multiple of 1024).
    #
    # The K-loop accumulates a full (bm, bn) tile and the cross-lane
    # reduction happens ONCE per block-row, after the loop: a per-block
    # ``sum(blk*xk, axis=1)`` costs ~log2(bn) VPU shuffle steps per block
    # and made the kernel compute-bound (measured 533 GB/s vs the 700 GB/s
    # Pallas-copy stream on v5e); with one multiply-add per block the VPU
    # keeps ahead of the HBM stream of ``data`` (the roofline).
    for r in range(R):  # static
        acc = jnp.zeros((bm, bn), data_ref.dtype)
        for k in range(K):  # static unrolled block loop
            c = cols_ref[r, k]
            xk = x_ref[c]           # (bm, bn), rows identical
            blk = data_ref[r, k]    # (bm, bn)
            acc = acc + blk * xk
        y_ref[r, :] = jnp.sum(acc, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "rows_per_step"))
def bell_spmv(data, cols, x_padded, interpret: bool = False,
              rows_per_step: int = 32):
    """``y = A x`` for a Block-ELL matrix; ``x_padded`` is the (n_p,) dense
    vector (zero-padded to the block grid).

    ``rows_per_step`` (R) = block-rows per grid step: larger R means bigger
    contiguous DMA blocks (R·K·bm·bn·itemsize) and fewer grid steps; must
    be a multiple of 8 for output-tile alignment.  The v5e sweep (PERF.md
    §3) picks the default."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbr, K, bm, bn = data.shape
    R = max(8, rows_per_step - rows_per_step % 8)
    nbr0 = nbr
    if nbr % R:  # pad block-rows; padding blocks point at col 0 with zeros
        pad = R - nbr % R
        data = jnp.concatenate(
            [data, jnp.zeros((pad,) + data.shape[1:], data.dtype)], axis=0)
        cols = jnp.concatenate(
            [cols, jnp.zeros((pad, K), cols.dtype)], axis=0)
        nbr += pad
    # Replicate each bn-slice of x across bm sublanes: (nbc, bm, bn), so the
    # kernel's dynamic block-column gather is whole-tile indexing (see
    # _spmv_kernel).  Costs one extra bm*x-sized HBM stream, negligible next
    # to ``data`` (K blocks per block-row).
    nbc = x_padded.shape[0] // bn
    x_rep = jnp.broadcast_to(
        x_padded.reshape(nbc, 1, bn), (nbc, bm, bn))
    kernel = functools.partial(_spmv_kernel, K=K, bm=bm, bn=bn, R=R)
    y = pl.pallas_call(
        kernel,
        grid=(nbr // R,),
        in_specs=[
            # per-step block-column indices in SMEM (R*K int32 = tiny)
            pl.BlockSpec((R, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, K, bm, bn), lambda i: (i, 0, 0, 0)),
            # x resident in VMEM: one copy reused by every block-row
            # (direct dynamic slicing; ANY/HBM refs would need manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, bm), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nbr, bm), data.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * K * bm * bn,
            bytes_accessed=data.size * data.dtype.itemsize,
            transcendentals=0,
        ),
    )(cols, data, x_rep)
    return y[:nbr0].reshape(-1)  # drop internal R-padding rows


class BellOperator(LinearOperator):
    """LinearOperator over a Block-ELL matrix (square; rank-1 array state).

    ``rmatvec`` uses the autodiff transpose of the kernel-free XLA fallback
    unless the matrix is marked symmetric.
    """

    _children = ("data", "cols")
    _static = ("shape", "nnz", "is_hermitian", "interpret", "rows_per_step")

    def __init__(self, bell: BellMatrix, is_hermitian: bool = False,
                 interpret: bool = False, rows_per_step: int = 32):
        self.data = bell.data
        self.cols = bell.cols
        self.shape = bell.shape
        self.nnz = bell.nnz
        self.is_hermitian = is_hermitian
        self.interpret = interpret
        self.rows_per_step = rows_per_step

    def template(self):
        return jnp.zeros((self.shape[1],), self.data.dtype)

    def matvec(self, x):
        nbr, K, bm, bn = self.data.shape
        n_p = (-(-self.shape[1] // bn)) * bn
        x_p = jnp.pad(x, (0, n_p - x.shape[0])) if n_p != x.shape[0] else x
        y = bell_spmv(self.data, self.cols, x_p, interpret=self.interpret,
                      rows_per_step=self.rows_per_step)
        return y[: self.shape[0]]

    def rmatvec(self, y):
        if self.is_hermitian:
            return self.matvec(y)
        # dense-block transpose path: y^H A = (A^T y); assemble via einsum
        # over the block structure (XLA segment-sum fallback — the kernel
        # tier is optimized for the forward product).
        nbr, K, bm, bn = self.data.shape
        n_p = (-(-self.shape[1] // bn)) * bn
        yb = jnp.pad(y, (0, nbr * bm - y.shape[0])).reshape(nbr, 1, bm)
        contrib = jnp.einsum("rkms,rum->rks", self.data.conj(), yb)  # (nbr,K,bn)
        out = jnp.zeros((n_p // bn, bn), self.data.dtype)
        out = out.at[self.cols.reshape(-1)].add(contrib.reshape(-1, bn))
        return out.reshape(-1)[: self.shape[1]]
