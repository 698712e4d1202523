"""HBM-bound stencil tile/VMEM sweep at 8192^2 (268 MB, >> 128 MiB VMEM).

Round-2 finding (see PERF.md): at the old bench size 3072^2 the whole
chained-matvec working set (38 MB in + 38 MB out) fits in the v5e's
128 MiB VMEM, so measured "bandwidth" exceeded physical HBM — the bench
must use a grid too large to cache.  This sweep measures the Pallas stencil
at 8192^2 across (tile, vmem_budget) pairs against the fusion-proof Pallas
copy roofline at the same size.

Appends one JSON line to benchmarks/results_tpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import timed_loop, datasheet_bw


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    from lightkrylov_tpu.ops.pallas import PallasPoisson2D

    kind = jax.devices()[0].device_kind
    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "stencil_sweep_8192",
           "device_kind": kind}
    log("device:", kind)

    # health gate (see roofline_probe)
    a = jnp.ones((2048, 2048), jnp.float32)
    s = float(jax.device_get(jnp.sum(a @ a)))
    if abs(s - 2048.0**3) > 1e-3 * 2048.0**3:
        raise SystemExit(f"DEVICE SICK: matmul returned {s}")
    log("health gate ok")

    N = 8192
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    nnz = 5 * N * N - 4 * N

    # fusion-proof HBM stream roofline at the same footprint.  Mosaic's
    # scoped-VMEM limit defaults to 16 MiB — raise it explicitly, the copy
    # double-buffers 4 blocks (in+out x 2).
    from jax.experimental.pallas import tpu as pltpu

    def _copy_kernel(x_ref, y_ref):
        y_ref[:, :] = x_ref[:, :]

    def make_copy(rows):
        @jax.jit
        def pallas_copy(x):
            return pl.pallas_call(
                _copy_kernel,
                grid=(N // rows,),
                in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((rows, N), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(rows * N * 4 * 4 + (2 << 20),
                                         128 << 20)),
            )(x)
        return pallas_copy

    bw_copy = 0.0
    res["copy_sweep"] = []
    for rows in (128, 256, 512):
        t, d = timed_loop(make_copy(rows), u)
        bw = 2 * N * N * 4 / t
        log(f"pallas copy 8192^2 rows={rows}: {bw/1e9:.1f} GB/s "
            f"(valid={d['valid']})")
        res["copy_sweep"].append({"rows": rows, "GBs": round(bw / 1e9, 1),
                                  "valid": d["valid"]})
        bw_copy = max(bw_copy, bw)
    res["pallas_copy_GBs"] = round(bw_copy / 1e9, 1)
    sheet = datasheet_bw(kind) or bw_copy

    # XLA reference points at the same HBM-bound size
    from lightkrylov_tpu.models import Poisson2D

    nnz8 = nnz
    t, d = timed_loop(lambda a: jax.lax.optimization_barrier(a + 1.0), u)
    log(f"XLA a+1.0 barrier 8192^2: {2*N*N*4/t/1e9:.1f} GB/s (valid={d['valid']})")
    res["xla_stream_barrier_GBs"] = round(2 * N * N * 4 / t / 1e9, 1)
    xop = Poisson2D(N, dtype=jnp.float32)
    t, d = timed_loop(lambda v: jax.lax.optimization_barrier(xop.matvec(v)), u)
    log(f"XLA stencil 8192^2: {nnz8/t/1e9:.2f} Gnnz/s "
        f"({2*N*N*4/t/1e9:.1f} GB/s eff, valid={d['valid']})")
    res["xla_stencil_Gnnzs"] = round(nnz8 / t / 1e9, 2)

    res["sweep"] = []
    for tile, budget_mib in ((104, 14), (256, 36), (512, 68), (736, 96)):
        op = PallasPoisson2D(N, dtype=jnp.float32, tile=tile,
                             vmem_budget=budget_mib * 2**20)
        eff = op.tile_effective
        try:
            t, d = timed_loop(op.matvec, u)
        except Exception as e:  # noqa: BLE001
            log(f"tile={tile}@{budget_mib}MiB (eff {eff}): FAILED "
                f"{type(e).__name__}: {str(e)[:160]}")
            res["sweep"].append({"tile": tile, "budget_MiB": budget_mib,
                                 "tile_effective": eff, "error": str(e)[:160]})
            continue
        g = nnz / t / 1e9
        ebw = 2 * N * N * 4 / t / 1e9
        log(f"tile={tile}@{budget_mib}MiB (eff {eff}): {g:.2f} Gnnz/s "
            f"eff_bw={ebw:.1f} GB/s  vs_copy={ebw*1e9/bw_copy:.3f} "
            f"vs_datasheet={ebw*1e9/sheet:.3f} valid={d['valid']}")
        res["sweep"].append({
            "tile": tile, "budget_MiB": budget_mib, "tile_effective": eff,
            "Gnnzs": round(g, 2), "eff_GBs": round(ebw, 1),
            "frac_of_copy": round(ebw * 1e9 / bw_copy, 4),
            "frac_of_datasheet": round(ebw * 1e9 / sheet, 4),
            "valid": d["valid"]})

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
