"""Roofline probe: establish the PHYSICAL bandwidth/compute envelope.

Round-1 postmortem (VERDICT item 1a): every chained-loop measurement that
XLA can see through is suspect — ``w = w + 1.0`` chained N times collapses
into one fused pass (apparent 5.6 TB/s on a v5e whose datasheet HBM is
819 GB/s), and the XLA pad-stencil chain can fuse consecutive stencil
applications.  This probe measures with constructs XLA cannot fold:

  1. Pallas copy kernel (pure DMA, opaque to fusion)  -> achievable HBM BW.
  2. Pallas read-reduce kernel                        -> read-only BW.
  3. ``optimization_barrier`` variants of the XLA loops -> honest XLA numbers
     + quantifies how much round 1's numbers were inflated by fusion.
  4. Chained 4096^2 matmuls (bf16 and f32)            -> MXU peak, which
     identifies the real silicon behind the axon "TPU v5 lite" label
     (v5e: 197 bf16 TFLOP/s; v4: 275; v5p: 459; v6e: 918).
  5. Loop-length linearity check on the Pallas copy   -> validates the
     differential timing itself.

Appends one JSON line to benchmarks/results_tpu.json.
"""

import functools
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

    kind = jax.devices()[0].device_kind
    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "roofline",
           "device_kind": kind}
    log("device:", kind, "datasheet HBM:", datasheet_bw(kind))

    # Health gate: a sick relay session "executes" instantly and returns
    # garbage (seen round 2: negative differential times + UNAVAILABLE
    # kernel-fault later).  Verify a real matmul result AND that its wall
    # time is physically plausible before measuring anything.
    a = jnp.ones((2048, 2048), jnp.float32)
    t0 = time.perf_counter()
    s = float(jax.device_get(jnp.sum(a @ a)))
    t_health = time.perf_counter() - t0
    if abs(s - 2048.0**3) > 1e-3 * 2048.0**3:
        raise SystemExit(f"DEVICE SICK: matmul returned {s}, expected 2048^3")
    log(f"health gate ok ({t_health:.2f}s incl. compile)")

    N = 4096
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    nbytes = w.size * 4

    # -- 1. Pallas copy: read + write one full array per iteration ---------
    def _copy_kernel(x_ref, y_ref):
        y_ref[:, :] = x_ref[:, :]

    rows = 128  # (128, 4096) f32 blocks = 2 MiB; in+out double buffers 8 MiB

    @jax.jit
    def pallas_copy(x):
        return pl.pallas_call(
            _copy_kernel,
            grid=(N // rows,),
            in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
        )(x)

    t, d = timed_loop(pallas_copy, w)
    bw_copy = 2 * nbytes / t
    log(f"pallas copy: {bw_copy/1e9:.1f} GB/s (valid={d['valid']}, iters={d['iters']})")
    res["pallas_copy_GBs"] = round(bw_copy / 1e9, 1)
    res["pallas_copy_valid"] = d["valid"]

    # linearity: time K and 4K explicitly
    def make(n):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(0, n, lambda i, u: pallas_copy(u), v)
        return loop

    k = max(64, d["iters"] // 2)
    ts = {}
    for mult in (1, 2, 4):
        ln = make(k * mult)
        jax.block_until_ready(ln(w))
        t0 = time.perf_counter()
        jax.block_until_ready(ln(w))
        ts[mult] = time.perf_counter() - t0
    lin = (ts[4] - ts[2]) / (ts[2] - ts[1]) if ts[2] > ts[1] else float("nan")
    log(f"linearity t(k)/t(2k)/t(4k) = {ts[1]:.3f}/{ts[2]:.3f}/{ts[4]:.3f} s "
        f"(slope ratio {lin:.3f}, expect ~2.0)")
    res["linearity_ratio"] = round(lin, 3)

    # -- 2. Pallas read-reduce: read-only bandwidth -------------------------
    def _reduce_kernel(x_ref, y_ref, *, rows, n):
        @pl.when(pl.program_id(0) == 0)
        def _():
            y_ref[:, :] = jnp.zeros_like(y_ref)
        part = x_ref[:, :].reshape(rows // 8, 8, n // 128, 128)
        y_ref[:, :] += jnp.sum(part, axis=(0, 2))

    @jax.jit
    def pallas_reduce(x):
        s = pl.pallas_call(
            functools.partial(_reduce_kernel, rows=rows, n=N),
            grid=(N // rows,),
            in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), x.dtype),
        )(x)
        # fold the scalar back in so the chain carries a data dependency
        return x + s[0, 0] * 1e-30

    t, d = timed_loop(pallas_reduce, w)
    # traffic: read N*N + (write+read N*N for the +s update, XLA side)
    bw_red = 3 * nbytes / t
    log(f"pallas read-reduce(+xla update): {bw_red/1e9:.1f} GB/s assuming 3 streams "
        f"(valid={d['valid']})")
    res["pallas_reduce3_GBs"] = round(bw_red / 1e9, 1)

    # -- 3. optimization_barrier'ed XLA loops --------------------------------
    def stream_bar(a):
        return jax.lax.optimization_barrier(a + 1.0)

    t, d = timed_loop(stream_bar, w)
    bw_sb = 2 * nbytes / t
    log(f"XLA a+1.0 with barrier: {bw_sb/1e9:.1f} GB/s (valid={d['valid']})")
    res["xla_stream_barrier_GBs"] = round(bw_sb / 1e9, 1)

    t, d = timed_loop(lambda a: a + 1.0, w)
    bw_nb = 2 * nbytes / t
    log(f"XLA a+1.0 NO barrier: {bw_nb/1e9:.1f} GB/s apparent (fusion check)")
    res["xla_stream_nobarrier_GBs"] = round(bw_nb / 1e9, 1)

    from lightkrylov_tpu.models import Poisson2D
    nb = 3072
    ub = jnp.asarray(rng.standard_normal((nb, nb)).astype(np.float32))
    xop = Poisson2D(nb, dtype=jnp.float32)
    nnz = 5 * nb * nb - 4 * nb

    t, d = timed_loop(lambda v: jax.lax.optimization_barrier(xop.matvec(v)), ub)
    log(f"XLA stencil with barrier: {nnz/t/1e9:.2f} Gnnz/s "
        f"({2*nb*nb*4/t/1e9:.1f} GB/s effective, valid={d['valid']})")
    res["xla_stencil_barrier_Gnnzs"] = round(nnz / t / 1e9, 2)

    from lightkrylov_tpu.ops.pallas import PallasPoisson2D
    pop = PallasPoisson2D(nb, dtype=jnp.float32, tile=256)
    t, d = timed_loop(lambda v: jax.lax.optimization_barrier(pop.matvec(v)), ub)
    log(f"pallas stencil with barrier: {nnz/t/1e9:.2f} Gnnz/s "
        f"({2*nb*nb*4/t/1e9:.1f} GB/s effective, valid={d['valid']})")
    res["pallas_stencil_barrier_Gnnzs"] = round(nnz / t / 1e9, 2)

    # -- 4. MXU peak ---------------------------------------------------------
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        a = jnp.asarray(rng.standard_normal((N, N)), dt)

        def mm(x, a=a, dt=dt):
            y = jax.lax.dot_general(
                a, x, (((1,), (0,)), ((), ())),
                preferred_element_type=dt)
            return jax.lax.optimization_barrier(y)

        t, d = timed_loop(mm, a)
        tf = 2 * N**3 / t / 1e12
        log(f"matmul {name} {N}^3: {tf:.1f} TFLOP/s (valid={d['valid']})")
        res[f"matmul_{name}_TFLOPs"] = round(tf, 1)

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
