"""Pallas TPU kernel: 5-point Laplacian stencil matvec.

The native-kernel tier of the operator layer (SURVEY.md §2: "[TPU-native]
matvec = Pallas SpMV/stencil"; BASELINE north star).  The stencil is
memory-bound: speed-of-light is one HBM read of ``u`` plus one write of the
output (~8 bytes/point in f32).  The kernel tiles the grid into row blocks:
each grid step DMAs its (tile + 2)-row window — one-row halos included —
from HBM into VMEM, computes the full stencil on the VPU with *static*
slices, and writes the tile-row result, so every input element is read once
(plus one halo row per tile boundary).

Window layout is fixed: interior rows live at window[1 : tile+1]; halo rows
at window[0] and window[tile+1] are zeroed at the global boundaries, which
realises the homogeneous Dirichlet condition with no masking arithmetic.

``interpret=True`` runs the same kernel through the Pallas interpreter for
bit-level parity tests on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...linops import LinearOperator

__all__ = ["stencil_matvec", "PallasPoisson2D"]


def _kernel(u_hbm, out_ref, *, tile, nx, nprog, ihx2, ihy2):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    row0 = i * tile

    def body(window, sem):
        first = i == 0
        last = i == nprog - 1

        # Halo-row zeroing at the global boundaries (Dirichlet).
        @pl.when(first)
        def _():
            window[0:1, :] = jnp.zeros((1, nx), window.dtype)

        @pl.when(last)
        def _():
            window[tile + 1:tile + 2, :] = jnp.zeros((1, nx), window.dtype)

        # DMA the valid window rows.  ``nprog`` is static, so impossible
        # branches (whose slices would exceed the array) are never traced.
        if nprog == 1:
            cp = pltpu.make_async_copy(
                u_hbm.at[pl.ds(0, tile), :], window.at[pl.ds(1, tile), :], sem)
            cp.start(); cp.wait()
        else:
            @pl.when(first)
            def _():
                cp = pltpu.make_async_copy(
                    u_hbm.at[pl.ds(0, tile + 1), :], window.at[pl.ds(1, tile + 1), :], sem)
                cp.start(); cp.wait()

            @pl.when(last)
            def _():
                cp = pltpu.make_async_copy(
                    u_hbm.at[pl.ds(row0 - 1, tile + 1), :], window.at[pl.ds(0, tile + 1), :], sem)
                cp.start(); cp.wait()

            @pl.when(jnp.logical_not(first) & jnp.logical_not(last))
            def _():
                cp = pltpu.make_async_copy(
                    u_hbm.at[pl.ds(row0 - 1, tile + 2), :], window, sem)
                cp.start(); cp.wait()

        # Stencil with static slices (VPU shifts; no dynamic indexing).
        u = window[1:tile + 1, :]
        left = jnp.pad(u, ((0, 0), (1, 0)))[:, :-1]
        right = jnp.pad(u, ((0, 0), (0, 1)))[:, 1:]
        down = window[0:tile, :]          # u_{j-1}
        up = window[2:tile + 2, :]        # u_{j+1}
        out_ref[:, :] = (
            (2.0 * (ihx2 + ihy2)) * u
            - ihx2 * (left + right)
            - ihy2 * (down + up)
        )

    pl.run_scoped(
        body,
        window=pltpu.VMEM((tile + 2, nx), u_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("ihx2", "ihy2", "tile", "interpret"))
def stencil_matvec(u, *, ihx2: float, ihy2: float, tile: int = 256,
                   interpret: bool = False):
    """5-point ``-Delta`` matvec via the Pallas kernel.

    ``u``: (ny, nx) interior grid.  Rows are zero-padded so ``tile`` divides
    ny (padded rows are zero, hence Dirichlet-safe).  ``interpret=True``
    for CPU testing.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = u.shape
    tile = min(tile, ny)
    pad = (-ny) % tile
    u_p = jnp.pad(u, ((0, pad), (0, 0))) if pad else u
    ny_p = ny + pad

    kernel = functools.partial(_kernel, tile=tile, nx=nx, nprog=ny_p // tile,
                               ihx2=ihx2, ihy2=ihy2)
    out = pl.pallas_call(
        kernel,
        grid=(ny_p // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile, nx), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ny_p, nx), u.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * ny_p * nx,
            bytes_accessed=2 * ny_p * nx * u.dtype.itemsize,
            transcendentals=0,
        ),
    )(u_p)
    return out[:ny] if pad else out


class PallasPoisson2D(LinearOperator):
    """Drop-in Pallas-kernel variant of
    :class:`lightkrylov_tpu.models.Poisson2D` (same grid/spacing/SPD)."""

    _children = ()
    _static = ("nx", "ny", "dtype_", "tile", "interpret")

    is_hermitian = True

    def __init__(self, nx: int, ny: int | None = None, dtype=jnp.float32,
                 tile: int = 256, interpret: bool = False):
        self.nx = nx
        self.ny = ny if ny is not None else nx
        self.dtype_ = np.dtype(dtype)
        self.tile = tile
        self.interpret = interpret

    @property
    def hx(self):
        return 1.0 / (self.nx + 1)

    @property
    def hy(self):
        return 1.0 / (self.ny + 1)

    def template(self):
        return jnp.zeros((self.ny, self.nx), self.dtype_)

    def matvec(self, u):
        return stencil_matvec(
            u, ihx2=1.0 / self.hx**2, ihy2=1.0 / self.hy**2,
            tile=self.tile, interpret=self.interpret,
        )

    def rmatvec(self, u):
        return self.matvec(u)
