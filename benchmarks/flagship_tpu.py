"""Flagship BASELINE configs on the real TPU chip (VERDICT r1 item 5).

Runs, in ONE process (relay startup is expensive):
  1. Ginzburg-Landau eigs at nx=512, tau=0.01, nev=8, kdim=16 — the
     reference's flagship example config
     (example/ginzburg_landau/main.f90:20-27,68) — via the REALIFIED
     operator (GinzburgLandauReal, f32, nev/kdim doubled because the
     realified spectrum carries each complex eigenvalue with its
     conjugate).  The axon TPU runtime cannot compile ANY computation with
     complex buffers (probe "axon_complex" in results_tpu.json: eager,
     jitted, complex-carry loops and real->complex outputs all
     UNIMPLEMENTED), so c64 is impossible on this chip in any formulation;
     realification is exact (R(A) spectrum = spec(A) U conj(spec(A))) and
     costs the same FLOPs.  Validated against the committed f64 CPU
     spectrum (gl_direct_spectrum.npy) and the analytic branch spectrum.
  2. Roessler UPO Newton-Krylov shooting in f32 (config 5; reference seed
     example/roessler/main.f90:87-88, T* = 5.88108845).
  3. PCG on Poisson 128^2 with block-Jacobi (config 1).
  4. The 1-chip 10M-DoF point: one GMRES(30) cycle on the 3072^2 Poisson
     operator — the single-chip baseline for future weak-scaling runs.

Appends one JSON line to benchmarks/results_tpu.json.  No f64 on TPU: runs
use f32 and record the achieved accuracy against the f64 anchors — the
f32 floor is the documented gap to BASELINE's 1e-10 (BASELINE.md note).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import timed_loop


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import lightkrylov_tpu as lk
    from lightkrylov_tpu.models import (
        GinzburgLandauReal, GLPropagator, gl_analytic_eigvals,
        Poisson2D, BlockJacobiPoisson, upo_system, flow)
    from lightkrylov_tpu.utils.options import CGOptions

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "flagship",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())

    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")

    # ---- 1. GL eigs nx=512, tau=0.01, nev=8(x2), kdim=16(x2), realified ---
    nx, tau, nev, kdim = 512, 0.01, 8, 16
    gl = GinzburgLandauReal(nx=nx, dtype=jnp.float32)
    prop = GLPropagator(gl, tau=tau, n_steps=10)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, nx)).astype(np.float32))
    t0 = time.time()
    evals, evecs, resid, info, meta = lk.eigs(
        prop, 2 * nev, x0=x0, kdim=2 * kdim, tolerance=1e-6,
        options=lk.EigsOptions(maxiter=200))
    t_gl = time.time() - t0
    # map propagator eigenvalues to generator eigenvalues: log(mu)/tau
    lam_A = np.log(np.asarray(evals).astype(np.complex128)) / tau
    ref = np.load("/root/repo/gl_direct_spectrum.npy")
    lam_ref = ref[:, 0] + 1j * ref[:, 1]
    # realified spectrum = ref U conj(ref)
    lam_both = np.concatenate([lam_ref, np.conj(lam_ref)])
    err_ref = max(np.min(np.abs(l - lam_both)) for l in lam_A)
    ana = gl_analytic_eigvals(nev)
    ana_both = np.concatenate([ana, np.conj(ana)])
    err_ana = max(np.min(np.abs(l - ana_both)) for l in lam_A)
    log(f"GL eigs nx=512 realified f32: info={info} {t_gl:.0f}s; max dev vs "
        f"f64 CPU spectrum {err_ref:.2e}, vs analytic branch {err_ana:.2e}")
    res["gl512"] = {"info": int(info), "seconds": round(t_gl, 1),
                    "formulation": "realified-f32",
                    "max_dev_vs_f64_spectrum": float(err_ref),
                    "max_dev_vs_analytic": float(err_ana),
                    "eigvals_re": [float(l.real) for l in lam_A],
                    "eigvals_im": [float(l.imag) for l in lam_A]}
    assert err_ref < 5e-3, "GL spectrum off the f64 anchors beyond f32 floor"

    # ---- 2. Roessler UPO shooting (f32) -----------------------------------
    sys_ = upo_system(n_steps=3000)
    X0 = {"pos": jnp.asarray(np.array([0.0, 6.1, 1.3], np.float32)),
          "T": jnp.asarray(np.float32(6.0))}
    t0 = time.time()
    X, ninfo, nmeta = lk.newton(
        sys_, X0, rtol=0.0, atol=3e-5,
        options=lk.NewtonOptions(maxiter=60),
        linear_solver_options=lk.GMRESOptions(kdim=4, maxiter=10))
    t_upo = time.time() - t0
    T = float(X["T"])
    closure = float(jnp.linalg.norm(flow(X["pos"], X["T"], 3000) - X["pos"]))
    log(f"Roessler UPO f32: info={ninfo} {t_upo:.0f}s T={T:.6f} "
        f"(ref 5.88108845) closure={closure:.2e}")
    res["roessler_upo"] = {"info": int(ninfo), "seconds": round(t_upo, 1),
                           "T": T, "T_err": abs(T - 5.88108845),
                           "closure": closure}
    assert abs(T - 5.88108845) < 5e-3, "UPO period off the reference anchor"

    # ---- 3. PCG Poisson 128^2 (config 1) ----------------------------------
    op = Poisson2D(128, dtype=jnp.float32)
    M = BlockJacobiPoisson(op)
    b = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    t0 = time.time()
    x, cinfo, cmeta = lk.cg(op, b, preconditioner=M, rtol=1e-4,
                            options=CGOptions(maxiter=600))
    t_cg = time.time() - t0
    relres = float(jnp.linalg.norm(op.matvec(x) - b) / jnp.linalg.norm(b))
    log(f"PCG Poisson 128^2: info={cinfo} {t_cg:.0f}s relres={relres:.2e}")
    res["pcg_poisson128"] = {"info": int(cinfo), "seconds": round(t_cg, 1),
                             "relres": relres}
    assert relres < 1e-3

    # ---- 4. 1-chip 10M-DoF GMRES cycle (weak-scaling baseline point) ------
    n = 3072
    op10 = Poisson2D(n, dtype=jnp.float32)
    b10 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    def gmres_cycle(v):
        x, _, _ = lk.gmres(op10, v, rtol=0.0, atol=0.0,
                           options=lk.GMRESOptions(kdim=30, maxiter=1))
        return x

    t0 = time.time()
    x1 = gmres_cycle(b10)
    jax.block_until_ready(x1)
    t_compile_and_run = time.time() - t0
    t0 = time.time()
    x1 = gmres_cycle(b10)
    jax.block_until_ready(x1)
    t_cycle = time.time() - t0
    log(f"GMRES(30) one cycle @ 3072^2 (9.4M DoF, f32): {t_cycle:.3f}s "
        f"(first incl. compile {t_compile_and_run:.1f}s)")
    res["gmres_3072_cycle_s"] = round(t_cycle, 4)

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
