"""DCGS2 vs CGS2 GMRES(30) cycle at 3072^2 on the real chip (f32).

Round-3 closing: CGS2 cycle 0.264 s wall / 233 ms device = 0.73 of the
4-read CGS2 traffic floor (171 ms).  DCGS2 halves the basis streams
(one fused reduce + one fused rank-2 update); target cycle <= ~180 ms
(VERDICT r3 item 2).
"""
import os, sys, time, json
os.environ["LIGHTKRYLOV_NO_DEVICE_COMPLEX"] = "1"
import jax, jax.numpy as jnp, numpy as np
import lightkrylov_tpu as lk
from lightkrylov_tpu.models import Poisson2D

def main():
    t0 = time.time()
    jax.device_get(jnp.zeros((8,), jnp.float32))
    print(f"warmup {time.time()-t0:.1f}s", flush=True)
    n = 3072
    op = Poisson2D(n, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    out = {}
    import lightkrylov_tpu.solvers.gmres as G
    cases = [("cgs2", None), ("dcgs2", None), ("dcgs2", 8), ("dcgs2", 16)]
    for orth, ck in cases:
        G.DCGS2_CHUNK = ck
        jax.clear_caches()
        label = orth if ck is None else f"{orth}_chunk{ck}"
        def cycle(v):
            x, _, _ = lk.gmres(op, v, rtol=0.0, atol=0.0,
                               options=lk.GMRESOptions(kdim=30, maxiter=1,
                                                       orthogonalization=orth))
            return x
        t0 = time.time()
        x1 = cycle(b); jax.block_until_ready(x1)
        tc = time.time() - t0
        times = []
        for _ in range(5):
            t1 = time.perf_counter()
            jax.block_until_ready(cycle(b))
            times.append(time.perf_counter() - t1)
        res = float(jnp.linalg.norm(op.matvec(x1) - b) / jnp.linalg.norm(b))
        out[label] = {"cycle_s": min(times), "all": [round(t,4) for t in times],
                     "compile_s": round(tc,1), "relres_after_1cycle": res}
        print(label, json.dumps(out[label]), flush=True)
    best = min((v["cycle_s"], k) for k, v in out.items() if k != "cgs2")
    print("BEST", best[1], "SPEEDUP", out["cgs2"]["cycle_s"]/best[0], flush=True)
    json.dump(out, open("/tmp/dcgs2_tpu.json","w"), indent=1)

if __name__ == "__main__":
    main()
