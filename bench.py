#!/usr/bin/env python
"""Headline benchmark: 5-point Poisson SpMV (stencil matvec) throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The BASELINE target is ">= 80% of roofline SpMV nnz/s per chip"
(BASELINE.md).  The 5-point stencil matvec is the SpMV of the partitioned
Poisson configs; it is memory-bound, so the roofline is the measured HBM
streaming bandwidth divided by the bytes moved per nonzero
(read u + write y = 8 B per point / 5 nnz per point = 1.6 B/nnz).
``vs_baseline`` = achieved / (0.8 * roofline): >= 1.0 beats the target.

Methodology: all timing uses K matvecs chained inside ONE jitted
``fori_loop`` — per-dispatch overhead through the axon relay is ~30 ms,
which would otherwise swamp sub-millisecond kernels.  Tries the Pallas
kernel, falls back to the XLA stencil, then CPU, so the driver always gets
a line.
"""

import json
import sys
import time


def timed_loop(make_step, x, iters=256):
    """Per-iteration time of a jitted chained loop, differential method.

    Times loops of ``iters`` and ``2*iters`` steps and returns
    ``(t2 - t1) / iters``: the constant per-dispatch cost (~30 ms through
    the axon relay — larger than the kernel itself!) cancels exactly.
    """
    import jax

    def make(n):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(0, n, lambda i, w: make_step(w), v)
        return loop

    loop1, loop2 = make(iters), make(2 * iters)
    jax.block_until_ready(loop1(x))  # compile + warm
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.ops.pallas import PallasPoisson2D

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # ~10M DoF on TPU (BASELINE config 5 scale; > VMEM so genuinely
    # HBM-bound), smaller on CPU.
    n = 3072 if on_tpu else 512
    ny = nx = n
    nnz = 5 * ny * nx - 2 * (nx + ny)  # true stencil nonzeros

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    jax.block_until_ready(u)
    _ = jax.device_get(u[:1, :8])  # D2H warmup (first transfer is slow on axon)

    # Measured streaming bandwidth (chained in-jit adds): 2*size bytes/iter.
    big = jnp.zeros((4096, 4096), jnp.float32)
    t_stream = timed_loop(lambda a: a + 1.0, big)
    bw = 2 * big.size * 4 / t_stream  # bytes/s

    used = "pallas"
    try:
        op = PallasPoisson2D(nx, ny, dtype=jnp.float32, tile=256,
                             interpret=not on_tpu)
        if not on_tpu:
            raise RuntimeError("interpret mode too slow for timing")
        t = timed_loop(op.matvec, u)
    except Exception:
        used = "xla"
        op = Poisson2D(nx, ny, dtype=jnp.float32)
        t = timed_loop(op.matvec, u)

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
