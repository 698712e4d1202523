"""Flagship BASELINE configs on the real TPU chip (VERDICT r1 item 5).

Runs, in ONE process (relay startup is expensive), each stage isolated so
one failure never loses the others' data:
  1. Ginzburg-Landau eigs at nx=512, tau=0.01, nev=8, kdim=16 — the
     reference's flagship example config
     (example/ginzburg_landau/main.f90:20-27,68) — via the REALIFIED
     operator (GinzburgLandauReal, f32, nev/kdim doubled because the
     realified spectrum carries each complex eigenvalue with its
     conjugate).  The axon TPU runtime cannot compile ANY computation with
     complex buffers (probe "axon_complex" in results_tpu.json), so c64 is
     impossible on this chip in any formulation; realification is exact
     (R(A) spectrum = spec(A) U conj(spec(A))) and costs the same FLOPs.
     Validation: Rayleigh-quotient eigenvalues from the converged Ritz
     vectors, asserted by (a) true eigen-residual (backward error) and
     (b) per-anchor deviation within each anchor's kappa budget — the CGL
     operator is severely non-normal (see the gl_stage comment and
     BASELINE.md "Non-normality note").
  2. Roessler UPO Newton-Krylov shooting in f32 (config 5; reference seed
     example/roessler/main.f90:87-88, T* = 5.88108845).
  3. PCG on Poisson 128^2 with block-Jacobi (config 1).
  4. The 1-chip 10M-DoF point: one GMRES(30) cycle on the 3072^2 Poisson
     operator — the single-chip baseline for future weak-scaling runs.

Appends one JSON line to benchmarks/results_tpu.json (ALWAYS — failed
stages carry an "error" field).  No f64 on TPU: runs use f32 and record
the achieved accuracy against the f64 anchors — the f32 floor is the
documented gap to BASELINE's 1e-10 (BASELINE.md note).
"""

import json
import os
import sys
import time
import traceback

# axon: a single device-side complex op poisons the whole process (even
# subsequent real H2D fails) — force host-side complex assembly everywhere.
os.environ["LIGHTKRYLOV_NO_DEVICE_COMPLEX"] = "1"

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def stage(res, name, fn):
    """Run one benchmark stage; record its result or its failure."""
    t0 = time.time()
    try:
        out = fn()
        out["seconds"] = round(time.time() - t0, 1)
        res[name] = out
        log(f"stage {name}: ok ({out['seconds']}s)")
    except Exception as e:  # noqa: BLE001
        res[name] = {"error": f"{type(e).__name__}: {str(e)[:400]}",
                     "seconds": round(time.time() - t0, 1)}
        log(f"stage {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        traceback.print_exc()


def main():
    import jax
    import jax.numpy as jnp

    import lightkrylov_tpu as lk
    from lightkrylov_tpu.models import (
        GinzburgLandauReal, GLPropagator,
        Poisson2D, BlockJacobiPoisson, upo_system, flow)
    from lightkrylov_tpu.utils.options import CGOptions, SVDSOptions

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "flagship",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())

    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")
    rng = np.random.default_rng(0)

    # ---- 1. GL eigs nx=512, tau=0.01, nev=8(x2), kdim=16(x2), realified ---
    # Validation policy (round-3 analysis): the CGL operator is SEVERELY
    # non-normal — the committed f64 anchors carry eigenvalue condition
    # numbers kappa = 33 .. 9.2e5 (4th column of gl_direct_spectrum.npy),
    # so eigenvalue agreement between any two backward-stable computations
    # is bounded by kappa * (backward error), NOT by machine epsilon.  The
    # valid accuracy claims are therefore:
    #   (a) true relative eigen-residual ||A v - lam v|| / ||v|| < 5e-3
    #       (backward error; CPU f32 calibration: 9e-4), and
    #   (b) per-anchor eigenvalue deviation < max(2e-3, 5e-5 * kappa_i)
    #       capped at 0.5 — chip-calibrated dev/kappa <= 3e-5 (CPU f32:
    #       <= 1e-5), both ~30x TIGHTER than the theoretical bound
    #       kappa * backward_error = kappa * 1.6e-3.
    # Eigenvalues are recovered by Rayleigh quotients of the converged Ritz
    # vectors through the GENERATOR matvec (exact for true eigenpairs, and
    # how the f64 anchors were produced) rather than log(mu)/tau.
    def gl_stage():
        nx, tau, nev, kdim = 512, 0.01, 8, 16
        gl = GinzburgLandauReal(nx=nx, dtype=jnp.float32)
        prop = GLPropagator(gl, tau=tau, n_steps=10)
        x0 = jnp.asarray(rng.standard_normal((2, nx)).astype(np.float32))
        # 5e-6: ~4x above the f32 device-path residual floor (~1.2e-6 for
        # the last pair at kdim=40), so the converged count cannot flap on
        # run-to-run f32 jitter (r4 recorded n_conv in {14, 15, 16} at the
        # old 2e-6); the solver's final f64 host recheck backstops any
        # remaining straddle.  The stopping tol is not the validation
        # metric — backward error vs kappa-budgeted anchors is asserted
        # below either way.
        tol = 5e-6
        # kdim = 2.5x the realified 2*nev: the conjugate-pair structure of
        # the realified spectrum halves the effective subspace margin, so
        # the literal 2x doubling of the reference's kdim=16 left the last
        # pair unconverged (15/16 in 250 s); 40 converges 16/16 in 43 s
        # (chip sweep, results_tpu.json probe "gl_kdim_sweep").
        def solve():
            return lk.eigs(prop, 2 * nev, x0=x0, kdim=40, tolerance=tol,
                           options=lk.EigsOptions(maxiter=200))

        t0 = time.perf_counter()
        evals, evecs, resid, info, meta = solve()
        t_first = time.perf_counter() - t0
        # warm solve-only timing (VERDICT r4 weak #3: headline numbers must
        # come from a recorded artifact): second solve reuses every
        # compiled executable
        t0 = time.perf_counter()
        evals, evecs, resid, info, meta = solve()
        t_warm = time.perf_counter() - t0
        resid = np.asarray(resid)
        conv = resid < tol
        n_conv = int(conv.sum())
        # host-side Rayleigh quotients + true residuals on the generator:
        # the complex Ritz vectors live on host already (axon _reconstruct
        # fallback); R(A) acts on re/im parts separately.  Validation runs
        # over the CONVERGED pairs only — an unconverged straggler is
        # reported, not scored.
        Vc = np.asarray(jax.tree_util.tree_leaves(evecs)[0])
        mv = jax.jit(gl.matvec)
        lam_rq, true_res = [], []
        for i in range(Vc.shape[0]):
            v = Vc[i]
            Av = (np.asarray(mv(jnp.asarray(v.real.astype(np.float32))))
                  + 1j * np.asarray(
                      mv(jnp.asarray(v.imag.astype(np.float32)))))
            lam = np.vdot(v, Av) / np.vdot(v, v)
            lam_rq.append(lam)
            true_res.append(float(np.linalg.norm(Av - lam * v)
                                  / np.linalg.norm(v)))
        lam_all = np.array(lam_rq)
        res_all = list(true_res)
        lam_rq = lam_all[conv] if conv.any() else lam_all
        true_res = [r for r, c in zip(true_res, conv) if c] or true_res
        ref = np.load("/root/repo/gl_direct_spectrum.npy")
        per_anchor, budgets = [], []
        for k in range(ref.shape[0]):
            w = ref[k, 0] + 1j * ref[k, 1]
            kappa = ref[k, 3]
            d = float(min(np.abs(lam_rq - w).min(),
                          np.abs(lam_rq - np.conj(w)).min()))
            per_anchor.append(d)
            budgets.append(min(0.5, max(2e-3, 5e-5 * kappa)))
        max_res = max(true_res)
        log(f"GL eigs nx=512 realified f32: info={info} conv={n_conv}/16 "
            f"solve_warm {t_warm:.1f}s (first incl. compile {t_first:.1f}s); "
            f"max true eigen-residual {max_res:.2e}; anchor devs "
            f"{['%.1e' % d for d in per_anchor]}")
        out = {"info": int(info), "formulation": "realified-f32",
               "n_conv": n_conv,
               "solve_warm_s": round(t_warm, 2),
               "solve_first_incl_compile_s": round(t_first, 2),
               "n_matvecs": int(meta.n_iter),
               "max_true_eigen_residual": max_res,
               "true_eigen_residuals_converged": true_res,
               "true_eigen_residuals_all": res_all,
               "per_anchor_dev": per_anchor,
               "per_anchor_budget_kappa": budgets,
               "eigvals_re": [float(l.real) for l in lam_all],
               "eigvals_im": [float(l.imag) for l in lam_all],
               "converged_mask": [bool(c) for c in conv],
               "ritz_residuals": [float(r) for r in resid]}
        # tightened from >= 12 (VERDICT r4 item 1): with the margin-based
        # tolerance + final f64 recheck, full convergence is the invariant
        assert info > 0, f"eigs reported non-convergence: info={info}"
        assert n_conv >= 16, f"only {n_conv}/16 realified pairs converged"
        assert max_res < 5e-3, \
            f"true eigen-residual beyond the f32 floor: {max_res:.2e}"
        for k, (d, b) in enumerate(zip(per_anchor, budgets)):
            assert d < b, (f"anchor {k} dev {d:.2e} exceeds kappa budget "
                           f"{b:.2e}")
        return out

    stage(res, "gl512", gl_stage)

    # ---- 2. Roessler UPO shooting (f32) -----------------------------------
    def upo_stage():
        sys_ = upo_system(n_steps=3000)
        X0 = {"pos": jnp.asarray(np.array([0.0, 6.1, 1.3], np.float32)),
              "T": jnp.asarray(np.float32(6.0))}
        X, ninfo, nmeta = lk.newton(
            sys_, X0, rtol=0.0, atol=3e-5,
            options=lk.NewtonOptions(maxiter=60),
            linear_solver_options=lk.GMRESOptions(kdim=4, maxiter=10))
        T = float(X["T"])
        closure = float(jnp.linalg.norm(
            flow(X["pos"], X["T"], 3000) - X["pos"]))
        log(f"Roessler UPO f32: info={ninfo} T={T:.6f} "
            f"(ref 5.88108845) closure={closure:.2e}")
        out = {"info": int(ninfo), "T": T, "T_err": abs(T - 5.88108845),
               "closure": closure}
        assert abs(T - 5.88108845) < 5e-3, "UPO period off the anchor"
        return out

    stage(res, "roessler_upo", upo_stage)

    # ---- 3. PCG Poisson 128^2 (config 1) ----------------------------------
    def pcg_stage():
        op = Poisson2D(128, dtype=jnp.float32)
        M = BlockJacobiPoisson(op)
        b = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
        x, cinfo, cmeta = lk.cg(op, b, preconditioner=M, rtol=1e-4,
                                options=CGOptions(maxiter=600))
        relres = float(jnp.linalg.norm(op.matvec(x) - b)
                       / jnp.linalg.norm(b))
        log(f"PCG Poisson 128^2: info={cinfo} relres={relres:.2e}")
        out = {"info": int(cinfo), "relres": relres}
        assert relres < 1e-3
        return out

    stage(res, "pcg_poisson128", pcg_stage)

    # ---- 4. 1-chip 10M-DoF GMRES cycle (weak-scaling baseline point) ------
    def gmres_stage():
        n = 3072
        op10 = Poisson2D(n, dtype=jnp.float32)
        b10 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

        def gmres_cycle(v):
            x, _, _ = lk.gmres(op10, v, rtol=0.0, atol=0.0,
                               options=lk.GMRESOptions(kdim=30, maxiter=1))
            return x

        t0 = time.time()
        jax.block_until_ready(gmres_cycle(b10))
        t_compile_and_run = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(gmres_cycle(b10))
            times.append(time.perf_counter() - t0)
        t_cycle = min(times)
        log(f"GMRES(30) one cycle @ 3072^2 (9.4M DoF, f32): {t_cycle:.3f}s "
            f"(first incl. compile {t_compile_and_run:.1f}s)")
        return {"cycle_s": round(t_cycle, 4),
                "first_incl_compile_s": round(t_compile_and_run, 1)}

    stage(res, "gmres_3072", gmres_stage)

    # ---- 5. GMRES on convection-diffusion (config 2, f32 on chip) ---------
    def convdiff_stage():
        from lightkrylov_tpu.models import ConvectionDiffusion2D

        cd = ConvectionDiffusion2D(96, dtype=jnp.float32)
        bcd = jnp.asarray(rng.standard_normal((96, 96)).astype(np.float32))
        x, ginfo, _ = lk.gmres(cd, bcd, rtol=1e-5,
                               options=lk.GMRESOptions(kdim=30, maxiter=40))
        relres = float(jnp.linalg.norm(cd.matvec(x) - bcd)
                       / jnp.linalg.norm(bcd))
        log(f"GMRES convdiff 96^2 f32: info={ginfo} relres={relres:.2e}")
        out = {"info": int(ginfo), "relres": relres}
        assert relres < 1e-4
        return out

    stage(res, "gmres_convdiff", convdiff_stage)

    # ---- 6. svds + kexpm (config 4, f32 on chip) --------------------------
    def svd_expm_stage():
        import scipy.linalg as sla

        # svds on the nonsymmetric convection-diffusion operator vs the
        # dense SVD oracle (small enough for an exact host check)
        from lightkrylov_tpu.models import ConvectionDiffusion2D

        m = 48
        cd = ConvectionDiffusion2D(m, dtype=jnp.float32)
        u0 = jnp.ones((m, m), jnp.float32)
        # r4 recorded info flapping in {-3, -1, +4}.  Root cause (measured
        # on CPU, identical residual trajectories f32/f64 and host/device):
        # the operator's top singular values are clustered within 0.3%
        # (191.91, 191.70, 191.63, 191.43, ...), so the thick-restarted
        # Golub-Kahan at kdim=20 needs 21 cycles to push all 4 residuals
        # under 5e-3 — exactly ONE past the default maxiter=20; run-to-run
        # compile jitter around that boundary produced the flap.  kdim=30
        # converges in 12 cycles; maxiter=40 leaves a >3x cycle margin,
        # and the solver's final f64 host recheck backstops any residual
        # straddle.  Accuracy is asserted vs the dense oracle either way.
        U, S, V, sres, sinfo, _ = lk.svds(
            cd, 4, u0=u0, kdim=30, tolerance=5e-3,
            options=SVDSOptions(maxiter=40))
        Ad = np.asarray(cd.dense()) if hasattr(cd, "dense") else None
        if Ad is not None:
            s_ref = np.linalg.svd(Ad, compute_uv=False)[:4]
            s_err = float(np.abs(np.asarray(S) - s_ref).max()
                          / np.abs(s_ref).max())
        else:
            s_err = -1.0
        # kexpm vs dense expm on a small dense operator
        rngl = np.random.default_rng(7)
        Am = (rngl.standard_normal((96, 96)) * 0.25).astype(np.float32)
        opd = lk.DenseOperator(jnp.asarray(Am))
        v = jnp.asarray(rngl.standard_normal(96).astype(np.float32))
        c, kinfo = lk.kexpm(opd, v, tau=0.8, tol=1e-6)
        ref = sla.expm(0.8 * Am.astype(np.float64)) @ np.asarray(v)
        k_err = float(np.linalg.norm(np.asarray(c) - ref)
                      / np.linalg.norm(ref))
        log(f"svds convdiff 48^2: info={sinfo} sig rel err={s_err:.2e}; "
            f"kexpm vs dense expm rel err={k_err:.2e} (info={kinfo})")
        out = {"svds_info": int(sinfo), "svds_sigma_relerr": s_err,
               "kexpm_relerr": k_err, "kexpm_info": int(kinfo)}
        # VERDICT r4 item 1: a flapping convergence flag is a fail — the
        # library verdict itself must be positive, not just the accuracy
        assert sinfo > 0, f"svds reported non-convergence: info={sinfo}"
        assert s_err < 1e-3 and k_err < 1e-4
        return out

    stage(res, "svds_kexpm", svd_expm_stage)

    # ---- 7. 1-chip 10M-DoF eighs sweep (eigs side of the weak-scaling
    #         baseline; one fixed 32-step Lanczos cycle) -------------------
    def eighs_stage():
        n = 3072
        opp = Poisson2D(n, dtype=jnp.float32)
        x0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
        t0 = time.time()
        evals, evecs, eres, einfo, _ = lk.eighs(
            opp, 4, x0=x0, kdim=32, tolerance=0.0,
            options=lk.EigsOptions(maxiter=1))
        t_first = time.time() - t0
        t0 = time.perf_counter()
        evals, evecs, eres, einfo, _ = lk.eighs(
            opp, 4, x0=x0, kdim=32, tolerance=0.0,
            options=lk.EigsOptions(maxiter=1))
        t_sweep = time.perf_counter() - t0
        # analytic leading eigenvalue of the (scaled) 5-point Laplacian
        h = 1.0 / (n + 1)
        lam_max = (2.0 / h**2) * (2.0 - np.cos(np.pi * n * h)
                                  - np.cos(np.pi * n * h))
        rel = float(abs(np.asarray(evals)[0] - lam_max) / lam_max)
        log(f"eighs sweep @ 3072^2: {t_sweep:.3f}s (first {t_first:.1f}s); "
            f"lam_1 rel dev vs analytic {rel:.2e}")
        return {"sweep_s": round(t_sweep, 3),
                "first_incl_compile_s": round(t_first, 1),
                "lam1_rel_dev": rel}

    stage(res, "eighs_3072", eighs_stage)

    # ---- 8. Roessler OTD modes at the fixed point (f32) -------------------
    # Reference anchor: instantaneous reduced-operator eigenvalue real
    # parts = 0.097000856 (x2) at the r=2 OTD subspace
    # (example/roessler/roessler_OTD.f90:31).
    def otd_stage():
        from lightkrylov_tpu.models import otd_evolve, roessler_rhs
        from lightkrylov_tpu.models.roessler import roessler_fixed_points

        fp_minus, _ = roessler_fixed_points()
        U0 = jnp.asarray(np.linalg.qr(
            rng.standard_normal((3, 2)))[0].astype(np.float32))
        x, U, Lr, lyap = otd_evolve(
            roessler_rhs, jnp.asarray(np.asarray(fp_minus, np.float32)),
            U0, 50.0, 20000)
        w = np.linalg.eigvals(np.asarray(jax.device_get(Lr)))
        dev = float(np.abs(np.sort(w.real) - 0.097000856).max())
        log(f"OTD fixed point f32: eig real parts "
            f"{np.sort(w.real)} (anchor 0.097000856, dev {dev:.2e})")
        out = {"eig_real": [float(v) for v in np.sort(w.real)],
               "anchor_dev": dev}
        assert dev < 1e-5, "OTD eigenvalues off the reference anchor"
        return out

    stage(res, "roessler_otd", otd_stage)

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    failed = [k for k, v in res.items()
              if isinstance(v, dict) and "error" in v]
    log("DONE; failed stages:", failed or "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
