"""Does manual (double-buffered) OUTPUT DMA break the 330 GB/s Pallas cap?

copy_shape probe: every pallas_call configuration streaming a >=256 MB
array caps at ~330 GB/s — half of XLA's 665 GB/s fused-elementwise rate on
the same array — suggesting the managed out_specs pipeline does not
overlap output writes with input reads at this scale.  This probe builds a
copy kernel where BOTH directions are manual async DMAs, double-buffered
across grid steps:

    step i: prefetch in-block i+1 | wait in(i) | copy to out-buffer |
            start out-DMA(i) | (reuse guard: wait out(i-2)) |
            last step: drain all out-DMAs

and compares against the managed-output baseline at 8192² f32.  If the
manual version reaches ~600 GB/s, the stencil kernels should adopt the
same output path for the beyond-VMEM regime.

Appends one JSON line (probe = "manual_out") to results_tpu.json.
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
    from jax.experimental.pallas import tpu as pltpu

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "manual_out",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())
    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")
    bw_sheet = (datasheet_bw(res["device_kind"]) or 0.819e12) / 1e9

    n = 8192
    rows = 64  # (64, 8192) f32 = 2 MB blocks
    nprog = n // rows

    def _managed_kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...]

    @jax.jit
    def managed_copy(x):
        return pl.pallas_call(
            _managed_kernel,
            grid=(nprog,),
            in_specs=[pl.BlockSpec((rows, n), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
        )(x)

    def _manual_kernel(x_hbm, y_hbm, ib, ob, sin, sout):
        i = pl.program_id(0)
        two = jnp.int32(2)
        slot = jax.lax.rem(i, two)

        def in_copy(j, s):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(pl.multiple_of(j * rows, rows), rows), :],
                ib.at[s], sin.at[s])

        def out_copy(j, s):
            return pltpu.make_async_copy(
                ob.at[s],
                y_hbm.at[pl.ds(pl.multiple_of(j * rows, rows), rows), :],
                sout.at[s])

        @pl.when(i == 0)
        def _():
            in_copy(i, slot).start()

        @pl.when(i + 1 < nprog)
        def _():
            in_copy(i + 1, jax.lax.rem(i + 1, two)).start()

        in_copy(i, slot).wait()

        # reuse guard: the out-buffer slot we are about to overwrite was
        # dispatched at step i-2; wait for that DMA before writing
        @pl.when(i >= 2)
        def _():
            out_copy(i - 2, slot).wait()

        ob[slot] = ib[slot][...]
        out_copy(i, slot).start()

        # drain on the final steps
        @pl.when(i == nprog - 1)
        def _():
            @pl.when(nprog >= 2)
            def _():
                out_copy(i - 1, jax.lax.rem(i - 1, two)).wait()
            out_copy(i, slot).wait()

    @jax.jit
    def manual_copy(x):
        return pl.pallas_call(
            _manual_kernel,
            grid=(nprog,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, rows, n), jnp.float32),
                pltpu.VMEM((2, rows, n), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready(x)

    for name, fn in (("managed", managed_copy), ("manual", manual_copy)):
        try:
            y = fn(x)
            jax.block_until_ready(y)
            win = np.asarray(jax.device_get(
                jax.jit(lambda r: r[5000:5008, 1000:1032])(y)))
            ref = np.asarray(jax.device_get(
                jax.jit(lambda r: r[5000:5008, 1000:1032])(x)))
            assert np.array_equal(win, ref), "copy parity"
            t, d = timed_loop(fn, x)
            gbs = 2 * x.size * 4 / t / 1e9
            log(f"  {name}: {gbs:.0f} GB/s ({gbs/bw_sheet:.2f} of datasheet,"
                f" valid={d['valid']})")
            res[name + "_GBs"] = round(gbs, 1)
            res[name + "_valid"] = d["valid"]
        except Exception as e:  # noqa: BLE001
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            res[name + "_failed"] = f"{type(e).__name__}: {str(e)[:300]}"

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
