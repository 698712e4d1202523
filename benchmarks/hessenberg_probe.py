"""TPU probe: on-device Hessenberg eigensolve (utils/hessenberg.py).

Validates on the axon chip:
1. that the jitted Francis QR + batched LU inverse iteration compile and
   run at all (LU support on this runtime was unverified), and
2. the wall-clock effect on a restart-heavy eigs: fused device projected
   path (one sync per cycle) vs host LAPACK per check.

Appends a "hessenberg" entry to results_tpu.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("LIGHTKRYLOV_NO_DEVICE_COMPLEX", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import lightkrylov_tpu as lk
from lightkrylov_tpu import vectors
from lightkrylov_tpu.models import TridiagToeplitz, toeplitz_eigvals
from lightkrylov_tpu.utils.hessenberg import hessenberg_eigvals, hessenberg_ritz

OUT = os.path.join(os.path.dirname(__file__), "results_tpu.json")


def log(msg):
    print(msg, flush=True)


def main():
    t0 = time.time()
    entry = {"probe": "hessenberg", "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    log(f"devices: {jax.devices()}")
    jax.device_get(jnp.ones((8,), jnp.float32))
    log(f"warmup D2H done at {time.time()-t0:.1f}s")

    # ---- 1. kernel correctness on chip (f32) ----------------------------
    rng = np.random.default_rng(5)
    n = 40
    H = np.triu(rng.standard_normal((n, n)).astype(np.float32), -1)
    wr, wi, ok = hessenberg_eigvals(jnp.asarray(H))
    wr_h, wi_h, ok_h = jax.device_get((wr, wi, ok))
    w = np.sort_complex(wr_h + 1j * wi_h)
    w_ref = np.sort_complex(np.linalg.eigvals(H.astype(np.float64)))
    eig_err = float(np.max(np.abs(w - w_ref)) / np.abs(w_ref).max())
    log(f"eigvals ok={bool(ok_h)} relerr={eig_err:.2e}  ({time.time()-t0:.1f}s)")
    entry["eigvals_ok"] = bool(ok_h)
    entry["eigvals_relerr"] = eig_err

    # ---- 2. full ritz incl. batched LU inverse iteration ---------------
    kdim = 40
    He = np.zeros((kdim + 1, kdim), np.float32)
    He[:, :] = np.triu(rng.standard_normal((kdim + 1, kdim)), -1)
    out = hessenberg_ritz(jnp.asarray(He), kdim, 1e-4)
    wr, wi, res, Vr, Vi, n_conv, ok = jax.device_get(out)
    w_d = np.sort_complex(wr + 1j * wi)
    w_h, V_h = np.linalg.eig(He[:kdim, :kdim].astype(np.float64))
    r_h = abs(He[kdim, kdim - 1]) * np.abs(V_h[-1, :])
    ritz_werr = float(np.max(np.abs(w_d - np.sort_complex(w_h)))
                      / np.abs(w_h).max())
    ritz_rerr = float(np.max(np.abs(np.sort(res) - np.sort(r_h))))
    log(f"ritz ok={bool(ok)} werr={ritz_werr:.2e} rerr={ritz_rerr:.2e} "
        f"nconv={int(n_conv)}/{int(np.sum(r_h < 1e-4))}  ({time.time()-t0:.1f}s)")
    entry["ritz_ok"] = bool(ok)
    entry["ritz_werr"] = ritz_werr
    entry["ritz_rerr"] = ritz_rerr

    # ---- 3. eigs wall-clock: device fused vs host per-check -------------
    N, nev, kdim = 256, 4, 16  # kdim=4*nev, restart-heavy at this N
    op = TridiagToeplitz(N, 2.0, -1.0, dtype=jnp.float32)
    exact = toeplitz_eigvals(N, 2.0, -1.0, -1.0)
    x0 = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    timings = {}
    for mode in ("device", "host"):
        for rep in range(2):  # rep 0 = compile, rep 1 = warm
            ts = time.time()
            evals, evecs, res, info, meta = lk.eigs(
                op, nev, x0=x0, kdim=kdim, tolerance=1e-4,
                options=lk.EigsOptions(projected=mode, maxiter=60))
            dt = time.time() - ts
        err = float(max(np.min(np.abs(exact - l)) for l in np.asarray(evals)))
        timings[mode] = dt
        log(f"eigs[{mode}] warm {dt:.3f}s conv={meta.converged} "
            f"niter={meta.n_iter} eigerr={err:.2e}  ({time.time()-t0:.1f}s)")
        entry[f"eigs_{mode}_s"] = round(dt, 4)
        entry[f"eigs_{mode}_niter"] = int(meta.n_iter)
        entry[f"eigs_{mode}_err"] = err
    entry["speedup"] = round(timings["host"] / timings["device"], 3)
    log(f"device speedup over host: {entry['speedup']}x")

    # ---- 4. eighs: fused on-device Lanczos sweep ------------------------
    N, nev, kdim = 256, 6, 32
    a_, b_ = 4.0, -1.0
    oph = TridiagToeplitz(N, a_, b_, dtype=jnp.float32)
    exacth = np.sort(toeplitz_eigvals(N, a_, b_, b_).real)[::-1]
    x0h = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    for mode in ("device", "host"):
        for rep in range(2):
            ts = time.time()
            evals, evecs, eres, einfo, emeta = lk.eighs(
                oph, nev, x0=x0h, kdim=kdim, tolerance=1e-4,
                options=lk.EigsOptions(projected=mode, maxiter=80))
            dt = time.time() - ts
        err = float(np.max(np.abs(np.asarray(evals) - exacth[:nev])
                           / np.abs(exacth[:nev])))
        log(f"eighs[{mode}] warm {dt:.3f}s conv={emeta.converged} "
            f"niter={emeta.n_iter} err={err:.2e}  ({time.time()-t0:.1f}s)")
        entry[f"eighs_{mode}_s"] = round(dt, 4)
        entry[f"eighs_{mode}_err"] = err
    entry["eighs_speedup"] = round(entry["eighs_host_s"]
                                   / entry["eighs_device_s"], 3)

    # ---- 5. svds: fused on-device Golub-Kahan sweep ---------------------
    m, n2 = 256, 192
    Am = rng.standard_normal((m, n2)).astype(np.float32)
    ops = lk.DenseOperator(jnp.asarray(Am))
    sref = np.linalg.svd(Am.astype(np.float64), compute_uv=False)
    u0s = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    vts = jnp.zeros(n2, jnp.float32)
    for mode in ("device", "host"):
        for rep in range(2):
            ts = time.time()
            Us, Ss, Vs, sres, sinfo, smeta = lk.svds(
                ops, 5, u0=u0s, v_template=vts, kdim=20, tolerance=1e-4,
                options=lk.SVDSOptions(projected=mode, maxiter=40))
            dt = time.time() - ts
        serr = float(np.max(np.abs(np.asarray(Ss) - sref[:5]) / sref[:5]))
        log(f"svds[{mode}] warm {dt:.3f}s conv={smeta.converged} "
            f"serr={serr:.2e}  ({time.time()-t0:.1f}s)")
        entry[f"svds_{mode}_s"] = round(dt, 4)
        entry[f"svds_{mode}_err"] = serr
    entry["svds_speedup"] = round(entry["svds_host_s"]
                                  / entry["svds_device_s"], 3)

    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
