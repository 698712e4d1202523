"""Pallas TPU kernel: 5-point Laplacian stencil matvec.

The native-kernel tier of the operator layer (SURVEY.md §2: "[TPU-native]
matvec = Pallas SpMV/stencil"; BASELINE north star).  The stencil is
memory-bound: speed-of-light is one HBM read of ``u`` plus one write of the
output (~8 bytes/point in f32); the XLA pad-based formulation materialises
padded temporaries and moves several times more HBM traffic, which is the
gap this kernel closes.

Tiling: each grid step owns ``tile`` rows.  The VMEM window has
``tile + 16`` rows — an 8-row halo band on each side — so **every DMA
source/destination offset is a multiple of 8** (the f32 sublane tile), a
hard requirement of the Mosaic compiler (a (tile+2)-row window with
offset-1 destinations crashes it).  Three DMAs per step (main block + two
halo bands; boundary bands zeroed under ``pl.when``, realising the
homogeneous Dirichlet condition); the y-neighbours are then *static*
row-shifted slices of the window and the x-neighbours in-tile column
shifts, all on the VPU.

Pipelining: the TPU grid is sequential, so the kernel **double-buffers**
its input window across grid steps — at step ``i`` it first launches the
DMAs for step ``i+1`` into the other buffer, then waits only on its own
copies and computes while the prefetch streams in.  Output blocks are
pipelined by Pallas itself (``out_specs``), so HBM reads, VPU compute and
HBM writes of consecutive tiles all overlap.

``interpret=True`` runs the same kernel through the Pallas interpreter for
bit-level parity tests on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...linops import LinearOperator

__all__ = ["stencil_matvec", "stencil_matvec_2d", "PallasPoisson2D",
           "effective_tile"]

HALO = 8  # halo band rows = the f32 sublane tile; keeps every DMA aligned
LANE = 128  # lane tile: x-halo band width of the 2D-grid kernel


#: Conservative default VMEM budget: safe on every TPU generation.  v5e/v6e
#: have 128 MiB of VMEM — pass a larger ``vmem_budget`` there (the round-2
#: tile sweep on v5e showed bigger tiles cut the halo re-read overhead;
#: see benchmarks/PERF.md).
DEFAULT_VMEM_BUDGET = 14 * 2**20


def effective_tile(ny: int, nx: int, dtype, tile: int,
                   vmem_budget: int = DEFAULT_VMEM_BUDGET) -> int:
    """The tile size :func:`stencil_matvec` actually runs with.

    The VMEM budget is computed with ``nx`` rounded **up** to the 128-lane
    tile (Mosaic pads the lane dimension, so a logical nx=130 occupies 256
    lanes of VMEM — ADVICE.md round 1).  Raises ``ValueError`` when even the
    minimal tile cannot fit, instead of knowingly exceeding the budget and
    letting Mosaic OOM.
    """
    nx_eff = -(-nx // 128) * 128
    itemsize = np.dtype(dtype).itemsize
    tmax = (vmem_budget // (itemsize * nx_eff) - 4 * HALO) // 4
    if tmax < HALO:
        raise ValueError(
            f"stencil_matvec: nx={nx} too wide for the {vmem_budget >> 20} "
            f"MiB VMEM budget (max tile {tmax} < minimum {HALO}); shard the "
            "x-dimension or reduce nx")
    tile = min(tile, max(ny, HALO), tmax)
    tile -= tile % HALO  # keep every DMA offset 8-aligned
    return max(tile, HALO)


def _kernel(u_hbm, out_ref, w, sems, *, tile, nx, nprog, ihx2, ihy2):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    two = jnp.int32(2)  # literal 2 would promote to int64 under x64 mode
    slot = jax.lax.rem(i, two)

    # The three DMAs for grid step j into buffer `slot`.  tile % HALO == 0,
    # so every offset is HALO-aligned; Mosaic needs the explicit multiple_of
    # hints to prove the tiled memref slices legal.
    def main_copy(j, s):
        row0 = pl.multiple_of(j * tile, HALO)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(row0, tile), :],
            w.at[s, pl.ds(HALO, tile), :], sems.at[s, 0])

    def above_copy(j, s):  # u[row0-8 : row0] -> w[s, 0:8]   (only j > 0)
        row0 = pl.multiple_of(j * tile, HALO)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(row0 - HALO, HALO), HALO), :],
            w.at[s, pl.ds(0, HALO), :], sems.at[s, 1])

    def below_copy(j, s):  # u[row0+tile : +8] -> w[s, tile+8:tile+16]
        row0 = pl.multiple_of(j * tile, HALO)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(row0 + tile, HALO), HALO), :],
            w.at[s, pl.ds(tile + HALO, HALO), :], sems.at[s, 2])

    def start(j, s):
        main_copy(j, s).start()

        @pl.when(j > 0)
        def _():
            above_copy(j, s).start()

        @pl.when(j < nprog - 1)
        def _():
            below_copy(j, s).start()

    # Step 0 has nothing in flight yet: launch its own copies.
    @pl.when(i == 0)
    def _():
        start(i, slot)

    # Prefetch step i+1 into the other buffer *before* waiting, so the DMA
    # engine streams the next tile while the VPU computes this one.
    @pl.when(i + 1 < nprog)
    def _():
        start(i + 1, jax.lax.rem(i + 1, two))

    main_copy(i, slot).wait()

    @pl.when(i > 0)
    def _():
        above_copy(i, slot).wait()

    @pl.when(i < nprog - 1)
    def _():
        below_copy(i, slot).wait()

    # Boundary halo bands were never DMA'd: zero them (homogeneous
    # Dirichlet).  The buffer slots of the first/last steps are static.
    @pl.when(i == 0)
    def _():
        w[0, 0:HALO, :] = jnp.zeros((HALO, nx), w.dtype)

    last_slot = (nprog - 1) % 2

    @pl.when(i == nprog - 1)
    def _():
        w[last_slot, tile + HALO:tile + 2 * HALO, :] = (
            jnp.zeros((HALO, nx), w.dtype))

    # Stencil with static slices (VPU shifts; no dynamic indexing).
    u = w[slot, HALO:tile + HALO, :]
    left = jnp.pad(u, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(u, ((0, 0), (0, 1)))[:, 1:]
    down = w[slot, HALO - 1:tile + HALO - 1, :]   # u_{j-1}
    up = w[slot, HALO + 1:tile + HALO + 1, :]     # u_{j+1}
    out_ref[:, :] = (
        (2.0 * (ihx2 + ihy2)) * u
        - ihx2 * (left + right)
        - ihy2 * (down + up)
    )


@functools.partial(jax.jit, static_argnames=("ihx2", "ihy2", "tile",
                                             "interpret", "vmem_budget"))
def stencil_matvec(u, *, ihx2: float, ihy2: float, tile: int = 256,
                   interpret: bool = False,
                   vmem_budget: int = DEFAULT_VMEM_BUDGET):
    """5-point ``-Delta`` matvec via the Pallas kernel.

    ``u``: (ny, nx) interior grid.  Rows are zero-padded so ``tile`` divides
    ny (padded rows are zero, hence Dirichlet-safe).  ``interpret=True``
    for CPU testing.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = u.shape
    # VMEM budget: 2 double-buffered input windows of (tile+16, nx) plus
    # Pallas' own double-buffered (tile, nx) output blocks must fit in the
    # budget: (4*tile + 32) * nx * itemsize <= budget (nx rounded up to the
    # 128-lane tile — see effective_tile).
    tile = effective_tile(ny, nx, u.dtype, tile, vmem_budget)
    pad = (-ny) % tile
    u_p = jnp.pad(u, ((0, pad), (0, 0))) if pad else u
    ny_p = ny + pad

    kernel = functools.partial(_kernel, tile=tile, nx=nx, nprog=ny_p // tile,
                               ihx2=ihx2, ihy2=ihy2)
    extra = {}
    if not interpret:
        # ALWAYS size the scoped-VMEM limit to the kernel's actual
        # footprint (scratch windows + Pallas' double-buffered out blocks)
        # plus margin: the terminal's compile environment enforces a 16 MiB
        # default scoped limit, and the footprint at wide nx slightly
        # exceeds the (4*tile+32)*nx budget model (round 4: tile=176 at
        # nx=5120 allocates 16.04 MiB and was rejected under the default).
        nx_eff = -(-nx // 128) * 128
        need = (2 * (tile + 2 * HALO) + 2 * tile) * nx_eff * u.dtype.itemsize
        # Mosaic's real scoped footprint runs ~1.5 windows past this model
        # (21.05 MiB observed vs 14.7 modeled at nx=4096/tile=216), so give
        # 2x headroom — the limit only gates compilation, not allocation.
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(max(2 * need,
                                     vmem_budget + (2 << 20)), 128 << 20))
    out = pl.pallas_call(
        kernel,
        grid=(ny_p // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile, nx), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ny_p, nx), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile + 2 * HALO, nx), u.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * ny_p * nx,
            bytes_accessed=2 * ny_p * nx * u.dtype.itemsize,
            transcendentals=0,
        ),
        **extra,
    )(u_p)
    return out[:ny] if pad else out


def _kernel2d(u_hbm, out_ref, w, sems, *, ty, tx, gy, gx, ihx2, ihy2):
    """2D-grid stencil kernel: each step owns a (ty, tx) block, the VMEM
    window is (ty + 16, tx + 256) — width decoupled from nx, so arbitrarily
    wide grids compile with a bounded Mosaic working set (VERDICT r2 item 2:
    the full-row window at nx = 8192 never compiled through the relay).

    Five DMAs per step (main block, two 8-row y-halo bands, two 128-lane
    x-halo bands; boundary bands zeroed — homogeneous Dirichlet), double-
    buffered across the *linearized* grid step exactly like :func:`_kernel`.
    The x-neighbour reads are one-lane-shifted VMEM slices spanning into the
    halo bands (lane rotations on the VPU)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    two = jnp.int32(2)
    step = i * gx + j
    nsteps = gy * gx
    slot = jax.lax.rem(step, two)

    def mk(ii, jj, s, idx):
        row0 = pl.multiple_of(ii * ty, HALO)
        col0 = pl.multiple_of(jj * tx, LANE)
        if idx == 0:    # main block
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(row0, ty), pl.ds(col0, tx)],
                w.at[s, pl.ds(HALO, ty), pl.ds(LANE, tx)], sems.at[s, 0])
        if idx == 1:    # above band (ii > 0)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(row0 - HALO, HALO), HALO),
                         pl.ds(col0, tx)],
                w.at[s, pl.ds(0, HALO), pl.ds(LANE, tx)], sems.at[s, 1])
        if idx == 2:    # below band (ii < gy-1)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(row0 + ty, HALO), HALO),
                         pl.ds(col0, tx)],
                w.at[s, pl.ds(ty + HALO, HALO), pl.ds(LANE, tx)],
                sems.at[s, 2])
        if idx == 3:    # left band (jj > 0)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(row0, ty),
                         pl.ds(pl.multiple_of(col0 - LANE, LANE), LANE)],
                w.at[s, pl.ds(HALO, ty), pl.ds(0, LANE)], sems.at[s, 3])
        # idx == 4: right band (jj < gx-1)
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(row0, ty),
                     pl.ds(pl.multiple_of(col0 + tx, LANE), LANE)],
            w.at[s, pl.ds(HALO, ty), pl.ds(LANE + tx, LANE)], sems.at[s, 4])

    def start(ii, jj, s):
        mk(ii, jj, s, 0).start()

        @pl.when(ii > 0)
        def _():
            mk(ii, jj, s, 1).start()

        @pl.when(ii < gy - 1)
        def _():
            mk(ii, jj, s, 2).start()

        @pl.when(jj > 0)
        def _():
            mk(ii, jj, s, 3).start()

        @pl.when(jj < gx - 1)
        def _():
            mk(ii, jj, s, 4).start()

    @pl.when(step == 0)
    def _():
        start(i, j, slot)

    # prefetch the next linearized step into the other buffer
    @pl.when(step + 1 < nsteps)
    def _():
        nstep = step + 1
        ni = jax.lax.div(nstep, jnp.int32(gx))
        nj = jax.lax.rem(nstep, jnp.int32(gx))
        start(ni, nj, jax.lax.rem(nstep, two))

    mk(i, j, slot, 0).wait()

    @pl.when(i > 0)
    def _():
        mk(i, j, slot, 1).wait()

    @pl.when(i < gy - 1)
    def _():
        mk(i, j, slot, 2).wait()

    @pl.when(j > 0)
    def _():
        mk(i, j, slot, 3).wait()

    @pl.when(j < gx - 1)
    def _():
        mk(i, j, slot, 4).wait()

    # Boundary bands that were never DMA'd: zero (homogeneous Dirichlet).
    @pl.when(i == 0)
    def _():
        w[slot, 0:HALO, LANE:LANE + tx] = jnp.zeros((HALO, tx), w.dtype)

    @pl.when(i == gy - 1)
    def _():
        w[slot, ty + HALO:ty + 2 * HALO, LANE:LANE + tx] = (
            jnp.zeros((HALO, tx), w.dtype))

    @pl.when(j == 0)
    def _():
        w[slot, HALO:ty + HALO, 0:LANE] = jnp.zeros((ty, LANE), w.dtype)

    @pl.when(j == gx - 1)
    def _():
        w[slot, HALO:ty + HALO, LANE + tx:2 * LANE + tx] = (
            jnp.zeros((ty, LANE), w.dtype))

    # Stencil: static slices; the x-neighbours shift one lane into the halo.
    u = w[slot, HALO:ty + HALO, LANE:LANE + tx]
    left = w[slot, HALO:ty + HALO, LANE - 1:LANE - 1 + tx]
    right = w[slot, HALO:ty + HALO, LANE + 1:LANE + 1 + tx]
    down = w[slot, HALO - 1:ty + HALO - 1, LANE:LANE + tx]
    up = w[slot, HALO + 1:ty + HALO + 1, LANE:LANE + tx]
    out_ref[:, :] = (
        (2.0 * (ihx2 + ihy2)) * u
        - ihx2 * (left + right)
        - ihy2 * (down + up)
    )


@functools.partial(jax.jit, static_argnames=("ihx2", "ihy2", "tile_y",
                                             "tile_x", "interpret"))
def stencil_matvec_2d(u, *, ihx2: float, ihy2: float, tile_y: int = 256,
                      tile_x: int = 1024, interpret: bool = False):
    """5-point ``-Delta`` matvec via the 2D-grid Pallas kernel.

    Unlike :func:`stencil_matvec` (whose VMEM window spans the full row),
    the working set here is ``O(tile_y * tile_x)`` regardless of ``nx`` —
    the variant for very wide grids (nx = 8192 and beyond).  ``u`` is
    zero-padded so the tiles divide the grid (Dirichlet-safe).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = u.shape
    ty = max(HALO, min(tile_y, -(-ny // HALO) * HALO) // HALO * HALO)
    tx = max(LANE, min(tile_x, -(-nx // LANE) * LANE) // LANE * LANE)
    pad_y = (-ny) % ty
    pad_x = (-nx) % tx
    if pad_y or pad_x:
        u_p = jnp.pad(u, ((0, pad_y), (0, pad_x)))
    else:
        u_p = u
    ny_p, nx_p = ny + pad_y, nx + pad_x
    gy, gx = ny_p // ty, nx_p // tx

    kernel = functools.partial(_kernel2d, ty=ty, tx=tx, gy=gy, gx=gx,
                               ihx2=ihx2, ihy2=ihy2)
    out = pl.pallas_call(
        kernel,
        grid=(gy, gx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ty, tx), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((ny_p, nx_p), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ty + 2 * HALO, tx + 2 * LANE), u.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * ny_p * nx_p,
            bytes_accessed=2 * ny_p * nx_p * u.dtype.itemsize,
            transcendentals=0,
        ),
    )(u_p)
    return out[:ny, :nx] if (pad_y or pad_x) else out


#: Measured warm-regime crossover on TPU v5e (bench.py / tpu_drive.py;
#: round-4 sweep): while ONE array fits v5e's 128 MiB VMEM, XLA's
#: cross-iteration fusion beats the HBM-streaming Pallas kernel (3072^2:
#: 1051 vs 737 Gnnz/s; 4096^2: 435 vs 208; 5120^2 = 105 MB: 439 vs 205);
#: beyond it the Pallas pipeline wins (6144^2 = 151 MB: 133 vs 106;
#: 8192^2: XLA stencil formulations top out at 171 GB/s effective vs
#: Pallas 330 GB/s — PERF.md sections 5.4 and 8).  Value = bytes of ONE
#: array = the VMEM size; bench.py re-validates the choice each run.
WARM_XLA_WINS_MAX_BYTES: int = 128 * 1024 * 1024


def auto_poisson2d(nx: int, ny: int | None = None, dtype=jnp.float32,
                   regime: str = "warm", **kw):
    """Return the faster Poisson-stencil operator for this shape/regime —
    the library-default dispatch VERDICT r3 asked for (weak #2): callers
    get whichever backend the measured crossover favors instead of a
    hardcoded kernel.

    ``regime="warm"`` (iterative solvers: the state vector stays on
    device and is revisited every iteration — the common case) selects
    the XLA formulation below :data:`WARM_XLA_WINS_MAX_BYTES` per array
    and the Pallas kernel above it.  ``regime="cold"`` (single pass over
    fresh data, e.g. one matvec on a freshly-loaded field) always selects
    the Pallas kernel, which wins whenever the operand actually streams
    from HBM (528 Gnnz/s vs 131 cold at 3072^2, results_tpu.json).
    """
    ny_ = ny if ny is not None else nx
    nbytes = ny_ * nx * np.dtype(dtype).itemsize
    if regime == "warm" and nbytes < WARM_XLA_WINS_MAX_BYTES:
        from ...models.poisson import Poisson2D

        return Poisson2D(nx, ny, dtype=dtype)
    return PallasPoisson2D(nx, ny, dtype=dtype, **kw)


class PallasPoisson2D(LinearOperator):
    """Drop-in Pallas-kernel variant of
    :class:`lightkrylov_tpu.models.Poisson2D` (same grid/spacing/SPD)."""

    _children = ()
    _static = ("nx", "ny", "dtype_", "tile", "interpret", "vmem_budget",
               "tile_x")

    is_hermitian = True

    def __init__(self, nx: int, ny: int | None = None, dtype=jnp.float32,
                 tile: int = 256, interpret: bool = False,
                 vmem_budget: int = DEFAULT_VMEM_BUDGET,
                 tile_x: int | None = None):
        self.nx = nx
        self.ny = ny if ny is not None else nx
        self.dtype_ = np.dtype(dtype)
        self.tile = tile
        self.interpret = interpret
        self.vmem_budget = vmem_budget
        #: When set, use the 2D-grid kernel (:func:`stencil_matvec_2d`) with
        #: x-tiles of this width — the VMEM window is then independent of nx.
        self.tile_x = tile_x

    @property
    def hx(self):
        return 1.0 / (self.nx + 1)

    @property
    def hy(self):
        return 1.0 / (self.ny + 1)

    @property
    def tile_effective(self) -> int:
        """Tile the kernel actually runs with after the VMEM-budget clamp
        (ADVICE.md round 1: sweeps must label the effective tile)."""
        return effective_tile(self.ny, self.nx, self.dtype_, self.tile,
                              self.vmem_budget)

    def template(self):
        return jnp.zeros((self.ny, self.nx), self.dtype_)

    def matvec(self, u):
        if self.tile_x is not None:
            return stencil_matvec_2d(
                u, ihx2=1.0 / self.hx**2, ihy2=1.0 / self.hy**2,
                tile_y=self.tile, tile_x=self.tile_x,
                interpret=self.interpret,
            )
        return stencil_matvec(
            u, ihx2=1.0 / self.hx**2, ihy2=1.0 / self.hy**2,
            tile=self.tile, interpret=self.interpret,
            vmem_budget=self.vmem_budget,
        )

    def rmatvec(self, u):
        return self.matvec(u)
