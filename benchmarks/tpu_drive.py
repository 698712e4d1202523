"""TPU hardware drive: Pallas kernel correctness + stencil tile sweep.

Run on the real chip (axon relay):

    PYTHONPATH=.:/root/.axon_site timeout 3000 python benchmarks/tpu_drive.py

One process does everything (startup through the relay costs ~200 s):
  1. Pallas stencil matvec vs XLA stencil — correctness on hardware.
  2. Block-ELL SpMV kernel vs dense oracle — correctness on hardware.
  3. Stencil tile-size sweep at bench scale (3072^2) — prints nnz/s per tile.
  4. Measured HBM streaming bandwidth for the roofline denominator.

Every step prints a flushed line so a wedged relay is visible immediately.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timed_loop(make_step, x, iters=256):
    """Differential timing: loops of ``iters`` and ``2*iters`` steps,
    per-iteration = (t2-t1)/iters — the ~30 ms axon per-dispatch overhead
    (which dwarfs sub-ms kernels) cancels exactly."""
    import jax

    def make(n):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(0, n, lambda i, w: make_step(w), v)
        return loop

    loop1, loop2 = make(iters), make(2 * iters)
    jax.block_until_ready(loop1(x))
    jax.block_until_ready(loop2(x))
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop1(x))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(loop2(x))
        t2 = min(t2, time.perf_counter() - t0)
    return max(t2 - t1, 1e-9) / iters


def timed_loop_op(op, x, iters=64):
    """Like timed_loop but passes the (pytree-registered) operator as a jit
    ARGUMENT — closing over a large Bell matrix would embed its blocks as an
    HLO constant (the axon relay rejects >~0.5 GB request bodies)."""
    import jax

    def make(n):
        @jax.jit
        def loop(op, v):
            return jax.lax.fori_loop(0, n, lambda i, w: op.matvec(w), v)
        return loop

    loop1, loop2 = make(iters), make(2 * iters)
    jax.block_until_ready(loop1(op, x))
    jax.block_until_ready(loop2(op, x))
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(loop1(op, x))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(loop2(op, x))
        t2 = min(t2, time.perf_counter() - t0)
    return max(t2 - t1, 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp

    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.ops.pallas import PallasPoisson2D
    from lightkrylov_tpu.ops.pallas.spmv import BellMatrix, BellOperator

    log("backend:", jax.default_backend(), jax.devices())

    # ---- 1. stencil correctness at a modest size -------------------------
    n = 512
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    ref_op = Poisson2D(n, dtype=jnp.float32)
    ref = jax.jit(ref_op.matvec)(u)
    jax.block_until_ready(ref)
    log("XLA stencil reference computed")

    pal_op = PallasPoisson2D(n, dtype=jnp.float32, tile=256)
    out = jax.jit(pal_op.matvec)(u)
    jax.block_until_ready(out)
    err = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    log(f"stencil pallas vs xla rel err = {err:.3e}")
    assert err < 1e-6, "stencil kernel wrong on TPU"

    # ---- 2. Block-ELL SpMV correctness ------------------------------------
    bm, bn, nbr, nbc, width = 8, 128, 64, 64, 4
    rng = np.random.default_rng(1)
    cols = np.zeros((nbr, width), np.int32)
    for i in range(nbr):
        cols[i] = np.sort(rng.choice(nbc, width, replace=False))
    blocks = rng.standard_normal((nbr, width, bm, bn)).astype(np.float32)
    m, ncol = nbr * bm, nbc * bn
    bell = BellMatrix(jnp.asarray(blocks), jnp.asarray(cols), (m, ncol),
                      nnz=blocks.size)
    op = BellOperator(bell)
    x = jnp.asarray(rng.standard_normal(ncol).astype(np.float32))
    y = jax.jit(op.matvec)(x)
    jax.block_until_ready(y)
    dense = np.zeros((m, ncol), np.float32)
    for i in range(nbr):
        for k in range(width):
            j = cols[i, k]
            dense[i * bm:(i + 1) * bm, j * bn:(j + 1) * bn] += blocks[i, k]
    yref = dense @ np.asarray(x)
    err = float(np.linalg.norm(np.asarray(y) - yref) / np.linalg.norm(yref))
    log(f"block-ELL pallas vs dense rel err = {err:.3e}")
    assert err < 1e-5, "block-ELL kernel wrong on TPU"

    # ---- 3. HBM streaming bandwidth ---------------------------------------
    big = jnp.zeros((4096, 4096), jnp.float32)
    t_stream = timed_loop(lambda a: a + 1.0, big)
    bw = 2 * big.size * 4 / t_stream
    log(f"HBM streaming bandwidth = {bw / 1e9:.1f} GB/s")

    # ---- 4. stencil tile sweep at bench scale ------------------------------
    nb = 3072
    ub = jnp.asarray(
        np.random.default_rng(2).standard_normal((nb, nb)).astype(np.float32))
    nnz = 5 * nb * nb - 4 * nb
    xla_op = Poisson2D(nb, dtype=jnp.float32)
    t = timed_loop(xla_op.matvec, ub)
    log(f"XLA stencil {nb}x{nb}: {nnz / t / 1e9:.2f} Gnnz/s "
        f"({2 * nb * nb * 4 / t / 1e9:.1f} GB/s effective)")
    for tile in (64, 128, 192, 256):
        op = PallasPoisson2D(nb, dtype=jnp.float32, tile=tile)
        try:
            t = timed_loop(op.matvec, ub)
        except Exception as e:  # noqa: BLE001
            log(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        frac = (nnz / t) / (bw / (8.0 / 5.0))
        log(f"tile={tile}: {nnz / t / 1e9:.2f} Gnnz/s  "
            f"roofline frac={frac:.3f}")

    # ---- 5. Block-ELL SpMV throughput at scale ----------------------------
    # ~0.54 GB of block data: unambiguously HBM-bound.  Square operator
    # (nbr*bm == nbc*bn) so the matvec can be chained inside fori_loop.
    nbr_l, width_l, nbc_l = 16384, 8, 1024
    rng = np.random.default_rng(3)
    cols_l = rng.integers(0, nbc_l, size=(nbr_l, width_l)).astype(np.int32)
    blocks_l = rng.standard_normal((nbr_l, width_l, bm, bn)).astype(np.float32)
    bell_l = BellMatrix(jnp.asarray(blocks_l), jnp.asarray(cols_l),
                        (nbr_l * bm, nbc_l * bn), nnz=blocks_l.size)
    op_l = BellOperator(bell_l)
    xl = jnp.asarray(rng.standard_normal(nbc_l * bn).astype(np.float32))
    t = timed_loop_op(op_l, xl)
    gb = blocks_l.size * 4 / 1e9
    log(f"block-ELL {nbr_l}x{nbc_l} blocks w={width_l}: "
        f"{blocks_l.size / t / 1e9:.2f} Gnnz/s ({gb / t:.1f} GB/s streamed)")

    log("DONE")


if __name__ == "__main__":
    main()
