#!/usr/bin/env python
"""Headline benchmark: 5-point Poisson SpMV (stencil matvec) throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The BASELINE target is ">= 80% of roofline SpMV nnz/s per chip"
(BASELINE.md).  The 5-point stencil matvec is the SpMV of the partitioned
Poisson configs; it is memory-bound, so the roofline is HBM bandwidth
divided by the bytes moved per nonzero (read u + write y = 8 B per point /
5 nnz per point = 1.6 B/nnz).  ``vs_baseline`` = achieved / (0.8*roofline):
>= 1.0 beats the target.

Roofline denominator (fixed in round 2): the **datasheet HBM bandwidth of
the detected chip** (e.g. TPU v5e = 819 GB/s), cross-checked against a
measured streaming bandwidth.  Round 1 used a measured `a + 1.0` proxy
whose differential timing was invalid through the axon relay (it reported
~5.6 TB/s, 6.8x the physical v5e HBM) and scored 0.254 against a
physically impossible target.  See benchmarks/PERF.md for the analysis.

Timing methodology: all timing chains K matvecs inside ONE jitted
``fori_loop`` — per-dispatch overhead through the axon relay is ~30 ms,
which would otherwise swamp sub-millisecond kernels.  The differential
(t(2K) - t(K)) / K cancels the constant dispatch cost; K is grown until
the difference itself is >= ~0.25 s so relay jitter is < a few percent,
and a measurement is declared invalid (never clamped) if the difference
is not a dominant fraction of the longer run.
"""

import json
import sys
import time

#: Datasheet HBM bandwidth per chip (bytes/s).  Keys are matched as
#: prefixes of ``jax.devices()[0].device_kind``.  Sources: Google Cloud TPU
#: system-architecture documentation (v4: 1228 GB/s, v5e: 819 GB/s,
#: v5p: 2765 GB/s, v6e/Trillium: 1640 GB/s).
DATASHEET_HBM = {
    "TPU v6 lite": 1.640e12,
    "TPU v6": 1.640e12,
    "TPU v5 lite": 0.819e12,
    "TPU v5p": 2.765e12,
    "TPU v5": 2.765e12,
    "TPU v4": 1.228e12,
    "TPU v3": 0.900e12,
    "TPU v2": 0.700e12,
}


def datasheet_bw(device_kind: str):
    for k, v in DATASHEET_HBM.items():
        if device_kind.startswith(k):
            return v
    return None


def timed_loop(make_step, x, min_diff=0.25, iters0=64, repeats=3):
    """Per-iteration time of a jitted chained loop, differential method.

    Times loops of ``K`` and ``2K`` steps and returns
    ``((t2 - t1) / K, diagnostics)``: the constant per-dispatch cost
    (~30 ms through the axon relay) cancels exactly.  ``K`` is first
    estimated from a pilot run so that ``t2 - t1 >= min_diff`` seconds,
    making relay jitter a < few-percent effect.  If the measured
    difference is not at least 20% of ``t2`` the measurement is flagged
    invalid (ADVICE.md: never clamp a non-positive difference into a
    spuriously huge throughput).
    """
    import jax

    def make(n):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(0, n, lambda i, w: make_step(w), v)
        return loop

    # Pilot: estimate per-iteration cost (includes dispatch overhead, so it
    # over-estimates => chosen K is, if anything, larger than needed).
    pilot = make(iters0)
    jax.block_until_ready(pilot(x))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(pilot(x))
    per_est = (time.perf_counter() - t0) / iters0

    for attempt in range(3):
        iters = max(iters0, int(min_diff / max(per_est, 1e-9)) + 1)
        loop1, loop2 = make(iters), make(2 * iters)
        jax.block_until_ready(loop1(x))
        jax.block_until_ready(loop2(x))
        t1 = t2 = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(loop1(x))
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(loop2(x))
            t2 = min(t2, time.perf_counter() - t0)
        diff = t2 - t1
        if diff >= 0.2 * t2 and diff > 0:
            return diff / iters, {"iters": iters, "t1": t1, "t2": t2,
                                  "valid": True, "attempt": attempt}
        # Invalid: loop time still dominated by overhead/jitter -> grow K.
        per_est = max(per_est / 4, diff / iters if diff > 0 else per_est / 4)
        min_diff *= 2
    return diff / iters, {"iters": iters, "t1": t1, "t2": t2,
                          "valid": False, "attempt": attempt}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, "/root/repo")
    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.ops.pallas import PallasPoisson2D

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    kind = jax.devices()[0].device_kind

    # ~10M DoF on TPU (BASELINE config 5 scale), smaller on CPU.  NOTE: the
    # 75 MB working set FITS v5e's 128 MB VMEM, so back-to-back matvecs here
    # run in the VMEM-assisted regime (eff_bw can exceed physical HBM BW —
    # see benchmarks/PERF.md §2); the genuinely HBM-bound operating point is
    # characterized separately in the in-solver and 8192² probes.
    n = 3072 if on_tpu else 512
    ny = nx = n
    nnz = 5 * ny * nx - 2 * (nx + ny)  # true stencil nonzeros

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    jax.block_until_ready(u)
    _ = jax.device_get(u[:1, :8])  # D2H warmup (first transfer is slow on axon)

    # Measured streaming bandwidth (chained in-jit adds, 2*size bytes/iter)
    # as a cross-check of the datasheet number.
    big = jnp.zeros((4096, 4096), jnp.float32)
    t_stream, sdiag = timed_loop(lambda a: a + 1.0, big)
    bw_meas = 2 * big.size * 4 / t_stream

    bw_sheet = datasheet_bw(kind)
    if bw_sheet is not None:
        bw = bw_sheet
        bw_src = "datasheet"
        if sdiag["valid"] and bw_meas > 1.2 * bw_sheet:
            print(f"# WARNING stream measurement {bw_meas/1e9:.0f} GB/s "
                  f"exceeds datasheet {bw_sheet/1e9:.0f} GB/s for {kind}: "
                  "timing invalid", file=sys.stderr)
    elif sdiag["valid"]:
        bw, bw_src = bw_meas, "measured"
    else:
        print(json.dumps({"metric": "poisson_spmv_invalid_timing",
                          "value": 0.0, "unit": "Gnnz/s", "vs_baseline": 0.0}))
        return

    # Measure BOTH operator implementations and report the faster one: at
    # the 10M-DoF bench scale the working set fits v5e VMEM, where XLA's
    # cross-iteration fusion beats an HBM-streaming Pallas kernel (see
    # benchmarks/PERF.md §2); on larger-than-VMEM problems the Pallas
    # kernel wins.  Both are the framework's own operator layer.
    candidates = {}
    try:
        op_p = PallasPoisson2D(nx, ny, dtype=jnp.float32, tile=256,
                               interpret=not on_tpu)
        if not on_tpu:
            raise RuntimeError("interpret mode too slow for timing")
        t_p, d_p = timed_loop(op_p.matvec, u)
        if d_p["valid"]:
            candidates["pallas"] = (t_p, d_p, op_p)
    except Exception as e:
        print(f"# pallas kernel skipped: {type(e).__name__}", file=sys.stderr)
    op_x = Poisson2D(nx, ny, dtype=jnp.float32)
    t_x, d_x = timed_loop(op_x.matvec, u)
    if d_x["valid"]:
        candidates["xla"] = (t_x, d_x, op_x)
    if not candidates:
        print(json.dumps({"metric": "poisson_spmv_invalid_timing",
                          "value": 0.0, "unit": "Gnnz/s", "vs_baseline": 0.0}))
        return
    for name, (tc, _, _op) in candidates.items():
        print(f"# warm {name}: {nnz / tc / 1e9:.1f} Gnnz/s", file=sys.stderr)
    used, (t, kdiag, op_used) = min(candidates.items(),
                                    key=lambda kv: kv[1][0])
    # The library-default dispatch must serve the same backend the
    # measurement just picked (VERDICT r3 weak #2: the headline must never
    # report a kernel faster than what auto_poisson2d hands users).
    from lightkrylov_tpu.ops.pallas import auto_poisson2d

    auto_used = ("pallas" if isinstance(auto_poisson2d(
        nx, ny, jnp.float32, regime="warm"), PallasPoisson2D) else "xla")
    print(f"# auto_poisson2d(warm) serves: {auto_used} "
          f"(measured winner: {used}; agree={auto_used == used})",
          file=sys.stderr)
    if len(candidates) == 2 and auto_used != used:
        print("# WARNING: auto dispatch disagrees with measured winner — "
              "re-pin WARM_XLA_WINS_MAX_BYTES", file=sys.stderr)

    bytes_per_nnz = 8.0 / 5.0  # read u + write y per point, 5 nnz per point
    roofline = bw / bytes_per_nnz
    target = 0.8 * roofline

    # Headline metric: the COLD-INPUT regime (each matvec input drawn from
    # a rotating 31-column basis, 1.2 GB at bench scale — cannot be
    # VMEM-resident), i.e. the memory pattern a Krylov solver actually has.
    # The warm back-to-back number at this scale runs VMEM-assisted and
    # can exceed physical HBM bandwidth (round-2 VERDICT weak #1); the
    # cold number is a true roofline statement.
    regime = "warm"
    if on_tpu:
        try:
            Xsrc = jnp.asarray(
                rng.standard_normal((31, ny, nx)).astype(np.float32))
            jax.block_until_ready(Xsrc)

            def cold_step(carry):
                i, s, Xc = carry
                v = jax.lax.dynamic_index_in_dim(
                    Xc, jax.lax.rem(i, jnp.int32(31)), keepdims=False)
                wv = op_used.matvec(v)
                return i + 1, s + jnp.sum(wv), Xc

            t_cold, d_cold = timed_loop(
                cold_step, (jnp.int32(0), jnp.float32(0), Xsrc))
            if d_cold["valid"]:
                t, kdiag, regime = t_cold, d_cold, "cold"
        except Exception as e:  # noqa: BLE001
            print(f"# cold-regime loop skipped: {type(e).__name__}",
                  file=sys.stderr)

    nnz_per_s = nnz / t
    print(f"# chip={kind} bw={bw/1e9:.0f} GB/s ({bw_src}; measured "
          f"{bw_meas/1e9:.0f} GB/s valid={sdiag['valid']}) kernel={used} "
          f"regime={regime} t={t*1e6:.1f} us/matvec "
          f"eff_bw={nnz_per_s*bytes_per_nnz/1e9:.0f} "
          f"GB/s iters={kdiag['iters']}", file=sys.stderr)
    result = {
        "metric": f"poisson_spmv_{regime}_{used}_{backend}_{n}x{n}",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / target, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
