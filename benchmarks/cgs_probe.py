"""CGS2 reduction cost breakdown on the chip (round-3 GMRES-cycle gap).

The GMRES(30) cycle at 3072² runs at 0.18 of its HBM-traffic model
(hbm_probe "solver" section) while the matvec alone runs at ~1.0 of
datasheet bandwidth in the same cold regime — so the basis reductions
(innerprod + linear_combination, ~97% of modeled traffic) must be running
far below bandwidth.  This probe times each candidate culprit standalone:

  1. innerprod(X, w): (31, n²)-matmul-reduction at HIGHEST vs DEFAULT
     precision (HIGHEST = 6-pass f32 on the MXU; if its lowering re-reads
     operands per pass, traffic is 3-6x the model).
  2. linear_combination(X, proj): the rank-31 update, same comparison.
  3. double_gram_schmidt_step with k=31 (prefix path, all chunks live) vs
     k=None (monolithic full-buffer path).
  4. One GMRES(30) cycle with gram_schmidt.DEFAULT_CHUNK = None vs 8 —
     does prefix chunking help or hurt end-to-end on the chip?

Appends one JSON line (probe = "cgs_cost") to benchmarks/results_tpu.json.
"""

import json
import os
import sys
import time

os.environ["LIGHTKRYLOV_NO_DEVICE_COMPLEX"] = "1"
sys.path.insert(0, "/root/repo")

import numpy as np

from bench import timed_loop, datasheet_bw


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import lightkrylov_tpu as lk
    from lightkrylov_tpu import vectors
    from lightkrylov_tpu.krylov import gram_schmidt
    from lightkrylov_tpu.models import Poisson2D

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "cgs_cost",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())
    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")
    bw = datasheet_bw(res["device_kind"]) or 0.819e12

    n = 3072
    S = n * n * 4
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((31, n, n)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready((X, w))

    # ---- 1+2: innerprod / linear_combination at each precision ----------
    def time_op(name, fn, traffic_bytes):
        # carry the big operands through the loop state so nothing is
        # embedded as an HLO constant; vary the vector so nothing hoists
        def step(carry):
            Xc, v, acc = carry
            out = fn(Xc, v)
            if isinstance(out, tuple):
                out = out[0]
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.real(l)) for l in leaves)
            return Xc, v * 0.999 + 0.001 * acc, s
        t, d = timed_loop(step, (X, w, jnp.float32(0)))
        gbs = traffic_bytes / t / 1e9
        frac = traffic_bytes / t / bw
        log(f"  {name}: {t*1e3:.2f} ms  -> {gbs:.0f} GB/s (frac {frac:.3f},"
            f" valid={d['valid']})")
        return {"name": name, "ms": round(t * 1e3, 3),
                "GBs": round(gbs, 1), "frac_of_bw": round(frac, 4),
                "valid": d["valid"]}

    P_HI = jax.lax.Precision.HIGHEST
    P_DEF = jax.lax.Precision.DEFAULT

    def ip(prec):
        def f(Xc, v):
            return jnp.matmul(Xc.reshape(31, -1), v.reshape(-1),
                              precision=prec)
        return f

    def lc(prec):
        proj = jnp.asarray(rng.standard_normal(31).astype(np.float32))
        def f(Xc, v):
            # rank-31 combination; v folded in so the loop can't hoist
            return jnp.matmul(proj + v[0, :31], Xc.reshape(31, -1),
                              precision=prec).reshape(n, n)
        return f

    res["ops"] = []
    res["ops"].append(time_op("innerprod_highest", ip(P_HI), 31 * S))
    res["ops"].append(time_op("innerprod_default", ip(P_DEF), 31 * S))
    res["ops"].append(time_op("lincomb_highest", lc(P_HI), 31 * S + S))
    res["ops"].append(time_op("lincomb_default", lc(P_DEF), 31 * S + S))

    # ---- 3: full CGS2 step, prefix (all live) vs monolithic -------------
    def dgs_prefix(Xc, v):
        return gram_schmidt.double_gram_schmidt_step(v, Xc, k=31)

    def dgs_full(Xc, v):
        return gram_schmidt.double_gram_schmidt_step(v, Xc)

    # 2 passes x (read X for innerprod + read X for lincomb) + small
    dgs_traffic = 4 * 31 * S
    def wrap(fn):
        def f(Xc, v):
            y, proj = fn(Xc, v)
            return y
        return f
    res["ops"].append(time_op("dgs2_prefix_k31", wrap(dgs_prefix), dgs_traffic))
    res["ops"].append(time_op("dgs2_monolithic", wrap(dgs_full), dgs_traffic))

    # ---- 4: GMRES cycle, chunked vs monolithic CGS ----------------------
    op = Poisson2D(n, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    res["gmres"] = []
    for chunk in (8, None):
        gram_schmidt.DEFAULT_CHUNK = chunk
        jax.clear_caches()

        def cycle(v):
            x, _, _ = lk.gmres(op, v, rtol=0.0, atol=0.0,
                               options=lk.GMRESOptions(kdim=30, maxiter=1))
            return x
        t0 = time.time()
        jax.block_until_ready(cycle(b))
        t_first = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(cycle(b))
            times.append(time.perf_counter() - t0)
        log(f"  gmres cycle chunk={chunk}: {min(times)*1e3:.0f} ms "
            f"(compile {t_first:.1f}s)")
        res["gmres"].append({"chunk": chunk, "cycle_s": round(min(times), 4)})
    gram_schmidt.DEFAULT_CHUNK = 8

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
