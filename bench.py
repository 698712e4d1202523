#!/usr/bin/env python
"""Headline benchmark: 5-point Poisson SpMV (stencil matvec) throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The BASELINE target is ">= 80% of roofline SpMV nnz/s per chip"
(BASELINE.md).  The 5-point stencil matvec is the SpMV of the partitioned
Poisson configs; it is memory-bound, so the roofline is the measured HBM
streaming bandwidth divided by the bytes moved per nonzero
(read u + write y = 8 B per point / 5 nnz per point = 1.6 B/nnz).
``vs_baseline`` = achieved / (0.8 * roofline): >= 1.0 beats the target.

Runs the Pallas kernel on the TPU when available (falling back to the XLA
stencil, then to CPU, so the driver always gets a line).
"""

import json
import sys
import time

import numpy as np


def best_time(fn, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.ops.pallas import PallasPoisson2D

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # Grid: ~10M DoF on TPU (BASELINE config 5 scale), smaller on CPU.
    n = 3072 if on_tpu else 512
    ny = nx = n
    nnz = 5 * ny * nx - 2 * (nx + ny)  # true stencil nonzeros

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    jax.block_until_ready(u)
    _ = jax.device_get(u[:1, :8])  # D2H warmup (first transfer is slow on axon)

    # Measured streaming bandwidth: y = x + 1 reads+writes 2 * size bytes.
    big = jnp.zeros((4096, 4096), jnp.float32)
    stream = jax.jit(lambda a: a + 1.0)
    t_stream = best_time(lambda: stream(big), iters=10)
    bw = 2 * big.size * 4 / t_stream  # bytes/s

    # Stencil matvec: Pallas kernel on TPU, XLA fallback elsewhere/on error.
    used = "pallas"
    try:
        op = PallasPoisson2D(nx, ny, dtype=jnp.float32, tile=256,
                             interpret=not on_tpu)
        if not on_tpu:
            raise RuntimeError("interpret mode too slow for timing")
        mv = jax.jit(op.matvec)
        t = best_time(lambda: mv(u))
    except Exception:
        used = "xla"
        op = Poisson2D(nx, ny, dtype=jnp.float32)
        mv = jax.jit(op.matvec)
        t = best_time(lambda: mv(u))

    nnz_per_s = nnz / t
    bytes_per_nnz = 8.0 / 5.0  # read u + write y per point, 5 nnz per point
    roofline = bw / bytes_per_nnz
    target = 0.8 * roofline
    result = {
        "metric": f"poisson_spmv_{used}_{backend}_{n}x{n}",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / target, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
