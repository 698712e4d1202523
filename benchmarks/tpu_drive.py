"""TPU hardware drive: Pallas kernel correctness + stencil tile sweep.

Run on the real chip (axon relay):

    PYTHONPATH=.:/root/.axon_site timeout 3000 python benchmarks/tpu_drive.py

One process does everything (startup through the relay costs ~200 s):
  1. Pallas stencil matvec vs XLA stencil — correctness on hardware.
  2. Block-ELL SpMV kernel vs dense oracle — correctness on hardware.
  3. Measured HBM streaming bandwidth, cross-checked vs the datasheet.
  4. Stencil tile-size sweep at bench scale (3072^2) — nnz/s per tile,
     labeled with the *effective* (VMEM-clamped) tile.
  5. Block-ELL SpMV throughput at the 0.5 GB scale.

Results are appended to ``benchmarks/results_tpu.json`` so every hardware
number the repo claims is reproducible from a committed artifact.

Every step prints a flushed line so a wedged relay is visible immediately.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import timed_loop, datasheet_bw  # robust differential timing


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def timed_loop_op(op, x, min_diff=0.25):
    """Like bench.timed_loop but passes the (pytree-registered) operator as
    a jit ARGUMENT — closing over a large Bell matrix would embed its blocks
    as an HLO constant (the axon relay rejects >~0.5 GB request bodies)."""
    import jax

    def make(n):
        @jax.jit
        def loop(op, v):
            return jax.lax.fori_loop(0, n, lambda i, w: op.matvec(w), v)
        return loop

    pilot = make(64)
    jax.block_until_ready(pilot(op, x))
    t0 = time.perf_counter()
    jax.block_until_ready(pilot(op, x))
    per_est = (time.perf_counter() - t0) / 64

    for attempt in range(3):
        iters = max(64, int(min_diff / max(per_est, 1e-9)) + 1)
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
        diff = t2 - t1
        if diff >= 0.2 * t2 and diff > 0:
            return diff / iters, {"iters": iters, "valid": True}
        per_est = max(per_est / 4, diff / iters if diff > 0 else per_est / 4)
        min_diff *= 2
    return diff / iters, {"iters": iters, "valid": False}


def main():
    import jax
    import jax.numpy as jnp

    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.ops.pallas import PallasPoisson2D
    from lightkrylov_tpu.ops.pallas.spmv import BellMatrix, BellOperator

    results = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
               "backend": jax.default_backend(),
               "device_kind": jax.devices()[0].device_kind}
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
    results["stencil_rel_err"] = err

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
    results["bell_rel_err"] = err

    # ---- 3. HBM streaming bandwidth vs datasheet ---------------------------
    big = jnp.zeros((4096, 4096), jnp.float32)
    t_stream, sdiag = timed_loop(lambda a: a + 1.0, big)
    bw_meas = 2 * big.size * 4 / t_stream
    bw_sheet = datasheet_bw(results["device_kind"])
    log(f"HBM stream: measured {bw_meas / 1e9:.1f} GB/s "
        f"(valid={sdiag['valid']}, iters={sdiag['iters']}); datasheet "
        f"{(bw_sheet or 0) / 1e9:.0f} GB/s")
    results["bw_measured_GBs"] = round(bw_meas / 1e9, 1)
    results["bw_measured_valid"] = sdiag["valid"]
    results["bw_datasheet_GBs"] = (bw_sheet or 0) / 1e9
    bw_roof = bw_sheet or bw_meas

    # ---- 4. stencil tile sweep at bench scale ------------------------------
    nb = 3072
    ub = jnp.asarray(
        np.random.default_rng(2).standard_normal((nb, nb)).astype(np.float32))
    nnz = 5 * nb * nb - 4 * nb
    xla_op = Poisson2D(nb, dtype=jnp.float32)
    t, _ = timed_loop(xla_op.matvec, ub)
    log(f"XLA stencil {nb}x{nb}: {nnz / t / 1e9:.2f} Gnnz/s "
        f"({2 * nb * nb * 4 / t / 1e9:.1f} GB/s effective)")
    results["xla_stencil_Gnnzs"] = round(nnz / t / 1e9, 1)
    results["tile_sweep"] = []
    for tile in (64, 128, 192, 256, 288, 512):
        op = PallasPoisson2D(nb, dtype=jnp.float32, tile=tile)
        eff = op.tile_effective
        try:
            t, d = timed_loop(op.matvec, ub)
        except Exception as e:  # noqa: BLE001
            log(f"tile={tile} (eff {eff}): FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        frac = (nnz / t) / (bw_roof / (8.0 / 5.0))
        log(f"tile={tile} (eff {eff}): {nnz / t / 1e9:.2f} Gnnz/s  "
            f"roofline frac={frac:.3f} valid={d['valid']}")
        results["tile_sweep"].append(
            {"tile": tile, "tile_effective": eff,
             "Gnnzs": round(nnz / t / 1e9, 2),
             "roofline_frac": round(frac, 4), "valid": d["valid"]})

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
    t, d = timed_loop_op(op_l, xl)
    gb = blocks_l.size * 4 / 1e9
    # Bytes/nnz for Block-ELL: blocks (4 B) + cols (4/ (bm*bn)) + x gather +
    # y write are dominated by the 4 B/nnz block stream.
    frac = (gb / t) / (bw_roof / 1e9)
    log(f"block-ELL {nbr_l}x{nbc_l} blocks w={width_l}: "
        f"{blocks_l.size / t / 1e9:.2f} Gnnz/s ({gb / t:.1f} GB/s streamed, "
        f"roofline frac={frac:.3f}, valid={d['valid']})")
    results["bell_Gnnzs"] = round(blocks_l.size / t / 1e9, 2)
    results["bell_GBs"] = round(gb / t, 1)
    results["bell_roofline_frac"] = round(frac, 4)
    results["bell_valid"] = d["valid"]

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(results) + "\n")
    log("DONE; results appended to", out_path)


if __name__ == "__main__":
    main()
