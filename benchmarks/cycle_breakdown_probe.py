"""Attribute the GMRES(30)@3072² cycle time to its components.

After the VPU rank-k fix the cycle is 402 ms while the sum of its parts
measured standalone is ~220 ms (matvec 90 us + dgs2 6.5 ms + updates per
iteration).  This probe times solver-shaped sub-loops to locate the gap:

  1. full GMRES(30) cycle                       (reference point)
  2. cycle with IdentityOperator                (cycle minus matvec work)
  3. while_loop of {dgs2 + normalize + set_column} over the same
     (31, 3072, 3072) carry buffer              (the CGS core, solver-shaped)
  4. same as 3 without set_column               (is the buffer update
     forcing a carry copy?)
  5. while_loop of the Givens/least-squares small ops alone
     (scalar-chain cost at kdim=30)

Appends one JSON line (probe = "cycle_breakdown") to results_tpu.json.
"""

import json
import os
import sys
import time

os.environ["LIGHTKRYLOV_NO_DEVICE_COMPLEX"] = "1"
sys.path.insert(0, "/root/repo")

import numpy as np

from bench import timed_loop


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import lightkrylov_tpu as lk
    from lightkrylov_tpu import vectors
    from lightkrylov_tpu.krylov.gram_schmidt import double_gram_schmidt_step
    from lightkrylov_tpu.models import Poisson2D
    from lightkrylov_tpu.utils import linalg

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
           "probe": "cycle_breakdown",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())
    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")

    n, kdim = 3072, 30
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready(b)

    def time_call(name, fn, *args):
        jax.block_until_ready(fn(*args))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        log(f"  {name}: {ms:.0f} ms")
        res[name] = round(ms, 1)
        return ms

    # 1. full cycle
    op = Poisson2D(n, dtype=jnp.float32)

    def cycle(v, _op):
        x, _, _ = lk.gmres(_op, v, rtol=0.0, atol=0.0,
                           options=lk.GMRESOptions(kdim=kdim, maxiter=1))
        return x

    time_call("full_cycle_ms", lambda v: cycle(v, op), b)

    # 2. identity operator (no matvec work; everything else identical)
    time_call("identity_cycle_ms",
              lambda v: cycle(v, lk.IdentityOperator()), b)

    # 3/4. solver-shaped CGS core: dgs2 + normalize (+ set_column)
    V0 = jnp.zeros((kdim + 1, n, n), jnp.float32)
    V0 = V0.at[0].set(b / jnp.linalg.norm(b))

    def make_core(with_set):
        @jax.jit
        def core(V):
            def body(carry):
                V, k = carry
                w = vectors.get_column(V, k)
                w, proj = double_gram_schmidt_step(w, V)
                beta = vectors.norm(w)
                w = vectors.scal(1.0 / jnp.where(beta == 0, 1.0, beta), w)
                if with_set:
                    V = vectors.set_column(V, k + 1, w)
                else:
                    # fold w into the carry without a column write
                    V = V.at[0].mul(1.0 + 0.0 * w[0, 0])
                return V, k + 1

            V, _ = jax.lax.while_loop(lambda c: c[1] < kdim, body,
                                      (V, jnp.int32(0)))
            return V

        return core

    time_call("cgs_core_with_set_ms", make_core(True), V0)
    time_call("cgs_core_no_set_ms", make_core(False), V0)

    # 5. Givens/least-squares scalar chain alone (no big arrays)
    @jax.jit
    def givens_chain(e0):
        dt = jnp.float32
        R = jnp.zeros((kdim, kdim), dt)
        c = jnp.zeros((kdim,), dt)
        s = jnp.zeros((kdim,), dt)
        e = jnp.zeros((kdim + 1,), dt).at[0].set(e0)

        def body(carry):
            R, c, s, e, k = carry
            h_col = jnp.sin(jnp.arange(kdim + 1, dtype=dt) + e[0])
            h_col, c, s = linalg.apply_givens_rotation(h_col, c, s, k)
            R = R.at[:, k].set(h_col[:-1])
            e = e.at[k + 1].set(-s[k] * e[k])
            e = e.at[k].set(c[k] * e[k])
            return R, c, s, e, k + 1

        R, c, s, e, _ = jax.lax.while_loop(
            lambda c_: c_[4] < kdim, body,
            (R, c, s, e, jnp.int32(0)))
        return e

    time_call("givens_chain_ms", givens_chain, jnp.float32(1.0))

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
