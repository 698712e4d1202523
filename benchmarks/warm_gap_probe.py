"""Root-cause probe for the warm-regime stencil gap (VERDICT r4 weak #6):
XLA 1026 vs Pallas 713 Gnnz/s at 3072^2 when tiles are warm.

Hypothesis under test: in the warm (back-to-back matvec) regime at sizes
below VMEM, BOTH backends run VMEM-resident — the measured throughput
implies memory traffic above the physical HBM datasheet bandwidth, so the
bound is VPU/VMEM, not HBM streaming.  The residual Pallas loss is then
per-grid-step machinery (DMA issue + semaphore waits + double-buffer
rotation are pure overhead when the "DMA" is VMEM->VMEM), which a tile
sweep should amortize: throughput must RISE with tile size (fewer grid
steps), the opposite of the HBM-bound regime where tile size only needs to
cover DMA latency.

Emits one JSON line (probe = "warm_gap") to results_tpu.json:
  - implied GB/s for both backends at 3072^2 warm vs the 819 GB/s datasheet
  - Pallas tile sweep {128, 256, 512} at a raised VMEM budget
  - per-grid-step overhead fit: t(tile) = a + b * nsteps
"""

import json
import os
import sys
import time

os.environ["LIGHTKRYLOV_NO_DEVICE_COMPLEX"] = "1"
sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import timed_loop, datasheet_bw
    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.ops.pallas import PallasPoisson2D
    from lightkrylov_tpu.ops.pallas.stencil import stencil_matvec

    kind = jax.devices()[0].device_kind
    bw_sheet = datasheet_bw(kind) or 819e9
    log("device:", kind, "datasheet", bw_sheet / 1e9, "GB/s")
    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "warm_gap",
           "device_kind": kind, "datasheet_gbps": bw_sheet / 1e9}

    n = 3072
    nnz = 5 * n * n - 4 * n
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready(u)
    _ = jax.device_get(u[:1, :8])  # D2H warmup
    log("warmup done")

    # --- the two contenders, warm (chained in one jitted fori_loop) ------
    op_x = Poisson2D(n, dtype=jnp.float32)
    t_x, d_x = timed_loop(op_x.matvec, u)
    gx = nnz / t_x / 1e9
    # minimum possible traffic: read u once + write y once = 8 B/point
    bw_x = 2 * n * n * 4 / t_x
    log(f"XLA warm: {gx:.0f} Gnnz/s -> implied {bw_x/1e9:.0f} GB/s "
        f"(datasheet {bw_sheet/1e9:.0f}; valid={d_x['valid']})")
    res["xla"] = {"gnnz": round(gx, 1), "implied_gbps": round(bw_x / 1e9),
                  "valid": d_x["valid"]}

    op_p = PallasPoisson2D(n, dtype=jnp.float32, tile=256)
    t_p, d_p = timed_loop(op_p.matvec, u)
    gp = nnz / t_p / 1e9
    bw_p = 2 * n * n * 4 / t_p
    log(f"Pallas warm (tile 256): {gp:.0f} Gnnz/s -> implied "
        f"{bw_p/1e9:.0f} GB/s (valid={d_p['valid']})")
    res["pallas_t256"] = {"gnnz": round(gp, 1),
                          "implied_gbps": round(bw_p / 1e9),
                          "valid": d_p["valid"]}
    res["vmem_resident"] = bool(bw_x > 1.1 * bw_sheet)

    # --- tile sweep at a raised VMEM budget ------------------------------
    sweep = {}
    for tile in (64, 128, 256, 512):
        budget = (4 * tile + 32) * n * 4 + (2 << 20)
        try:
            def mv(v, _t=tile, _b=budget):
                return stencil_matvec(v, ihx2=float(1.0 / op_p.hx ** 2),
                                      ihy2=float(1.0 / op_p.hy ** 2),
                                      tile=_t, vmem_budget=_b)

            t, d = timed_loop(mv, u)
            g = nnz / t / 1e9
            nsteps = -(-n // tile)
            sweep[tile] = {"gnnz": round(g, 1), "t_us": round(t * 1e6, 1),
                           "nsteps": nsteps, "valid": d["valid"]}
            log(f"tile {tile}: {g:.0f} Gnnz/s ({t*1e6:.0f} us, "
                f"{nsteps} grid steps, valid={d['valid']})")
        except Exception as e:  # noqa: BLE001
            sweep[tile] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            log(f"tile {tile}: FAILED {type(e).__name__}")
    res["tile_sweep"] = sweep

    # per-grid-step overhead fit t = a + b * nsteps over the valid points
    pts = [(v["nsteps"], v["t_us"]) for v in sweep.values()
           if isinstance(v, dict) and v.get("valid")]
    if len(pts) >= 2:
        ns = np.array([p[0] for p in pts], float)
        ts = np.array([p[1] for p in pts], float)
        A = np.vstack([np.ones_like(ns), ns]).T
        (a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
        res["fit"] = {"base_us": round(float(a), 1),
                      "per_grid_step_us": round(float(b), 2)}
        log(f"fit: t = {a:.1f} us + {b:.2f} us/grid-step")

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
