"""Row-partitioned Block-ELL SpMV over a 1D device mesh.

The general-sparse half of SURVEY.md §2 parallelism item 2 ("row/block-
partitioned CSR/BSR SpMV ... with halo exchange over ICI"): block-rows of
the Block-ELL matrix (see :mod:`lightkrylov_tpu.ops.pallas.spmv`) are
partitioned over the mesh; the input vector is row-partitioned the same
way, all-gathered over ICI inside ``shard_map`` (a general sparse matrix
has unbounded column reach, so the "halo" is the full vector — for
bounded-bandwidth operators use the stencil operators, whose halo is one
row), and each device runs the Pallas Block-ELL kernel on its local block
rows.  The output rows come out naturally partitioned, so Krylov solvers
compose without any resharding.

The reference delegates all of this to user MPI code
(paper/paper.md:97-101); this layer is the framework-owned replacement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..linops import LinearOperator
from ..ops.pallas.spmv import BellMatrix, bell_spmv
from .mesh import distribute

__all__ = ["ShardedBellOperator"]


def _bell_shard(data, cols, x_local, *, axis, n_logical, interpret):
    """Per-shard body: all-gather x over ICI, run the local Block-ELL
    kernel on this shard's block-rows (column indices stay GLOBAL — the
    gathered x covers the full column space)."""
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)
    bn = data.shape[3]
    n_p = -(-n_logical // bn) * bn
    if n_p != x_full.shape[0]:
        x_full = jnp.pad(x_full, (0, n_p - x_full.shape[0]))
    return bell_spmv(data, cols, x_full, interpret=interpret)


class ShardedBellOperator(LinearOperator):
    """Square Block-ELL operator with block-rows partitioned over a 1D mesh.

    Built from a host-side :class:`BellMatrix` whose global shape is
    square and whose row count divides evenly over the mesh (pad the
    block-row count to a multiple of ``8 * mesh size`` at assembly time).
    The state vector is the global ``(n,)`` array row-partitioned over the
    mesh; ``matvec`` is one ``all_gather`` + the local Pallas kernel.
    """

    _children = ("data", "cols")
    _static = ("shape", "nnz", "is_hermitian", "interpret", "mesh", "axis")

    def __init__(self, bell: BellMatrix, *, mesh: Mesh,
                 is_hermitian: bool = False, interpret: bool = False):
        m, n = bell.shape
        nbr, K, bm, bn = bell.data.shape
        nd = mesh.devices.size
        if m != n:
            raise ValueError(f"ShardedBellOperator requires a square operator, got {bell.shape}")
        if nbr % (8 * nd):
            raise ValueError(
                f"block-row count {nbr} must divide over {nd} devices in "
                f"multiples of 8 (the kernel's row-tile); pad at assembly")
        if m != nbr * bm or n % bn or n % nd:
            raise ValueError(
                "ShardedBellOperator requires the logical shape to equal the "
                "block grid (pad the matrix to multiples of the block size "
                "at assembly time)")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.shape = bell.shape
        self.nnz = bell.nnz
        self.is_hermitian = is_hermitian
        self.interpret = interpret
        self.data = distribute(bell.data, mesh, P(self.axis, None, None, None))
        self.cols = distribute(bell.cols, mesh, P(self.axis, None))

    def template(self):
        x = jnp.zeros((self.shape[1],), self.data.dtype)
        return distribute(x, self.mesh, P(self.axis))

    def matvec(self, x):
        nbr, K, bm, bn = self.data.shape
        body = partial(_bell_shard, axis=self.axis, n_logical=self.shape[1],
                       interpret=self.interpret)
        mv = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(self.axis, None, None, None), P(self.axis, None),
                      P(self.axis)),
            out_specs=P(self.axis),
            check_vma=False,  # pallas_call has no varying-mesh-axes metadata
        )
        y = mv(self.data, self.cols, x)
        return y[: self.shape[0]] if y.shape[0] != self.shape[0] else y

    def rmatvec(self, y):
        if self.is_hermitian:
            return self.matvec(y)
        # A^H y: each shard owns block-ROWS of A, i.e. block-columns of A^H;
        # local transpose contributions are scattered into the full output
        # and summed over shards with one psum, then re-partitioned.
        nbr, K, bm, bn = self.data.shape
        n_p = -(-self.shape[1] // bn) * bn

        def body(data, cols, y_local):
            contrib = jnp.einsum("rkms,rum->rks",
                                 data.conj(), y_local.reshape(-1, 1, bm))
            out = jnp.zeros((n_p // bn, bn), data.dtype)
            out = out.at[cols.reshape(-1)].add(contrib.reshape(-1, bn))
            out = jax.lax.psum(out.reshape(-1), self.axis)
            # keep my row slice of the summed result (output partitioned)
            nd = jax.lax.axis_size(self.axis)
            idx = jax.lax.axis_index(self.axis)
            chunk = n_p // nd
            return jax.lax.dynamic_slice(out, (idx * chunk,), (chunk,))

        mv = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(self.axis, None, None, None), P(self.axis, None),
                      P(self.axis)),
            out_specs=P(self.axis),
        )
        x = mv(self.data, self.cols, y)
        return x[: self.shape[1]] if x.shape[0] != self.shape[1] else x
