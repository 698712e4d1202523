"""Third attack on the >=256 MB ~330 GB/s Pallas streaming cap (VERDICT r3
item 3): N-deep (2/3/4) manual double-direction DMA buffering x DMA block
size sweep on a pure 8192^2 f32 copy.  If no (depth, rows) combination
beats the cap, the r3 conclusion — a platform DMA-streaming property of
this part/relay, not a pipelining gap — stands pinned.

Appends probe "deep_buffer" to results_tpu.json.
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

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "deep_buffer",
           "device_kind": jax.devices()[0].device_kind, "cases": []}
    bw_sheet = (datasheet_bw(res["device_kind"]) or 0.819e12) / 1e9
    n = 8192
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready(x)

    def make_copy(depth, rows):
        nprog = n // rows

        def kern(x_hbm, y_hbm, ib, ob, sin, sout):
            i = pl.program_id(0)
            d = jnp.int32(depth)
            slot = jax.lax.rem(i, d)

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
                # prime the pipeline: current block + depth-1 ahead
                for j in range(depth):
                    if j < nprog:
                        in_copy(jnp.int32(j), jnp.int32(j)).start()

            @pl.when((i + depth - 1 < nprog) & (i > 0))
            def _():
                in_copy(i + depth - 1, jax.lax.rem(i + depth - 1, d)).start()

            in_copy(i, slot).wait()

            @pl.when(i >= depth)
            def _():
                out_copy(i - depth, slot).wait()

            ob[slot] = ib[slot][...]
            out_copy(i, slot).start()

            @pl.when(i == nprog - 1)
            def _():
                # outstanding out-DMAs at the end: blocks i-depth+1 .. i
                # (the reuse guard waited everything older) — wait ALL of
                # them or the kernel exits with a leaked DMA semaphore
                for off in range(depth - 1, -1, -1):
                    if nprog > off:
                        out_copy(i - off, jax.lax.rem(i - off + d, d)).wait()

        @jax.jit
        def copy(x):
            return pl.pallas_call(
                kern,
                grid=(nprog,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((depth, rows, n), jnp.float32),
                    pltpu.VMEM((depth, rows, n), jnp.float32),
                    pltpu.SemaphoreType.DMA((depth,)),
                    pltpu.SemaphoreType.DMA((depth,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=min(4 * depth * rows * n * 4, 128 << 20)),
            )(x)
        return copy

    for depth in (2, 3, 4):
        for rows in (64, 128, 256):
            if 2 * depth * rows * n * 4 > 100 << 20:
                continue
            try:
                fn = make_copy(depth, rows)
                y = fn(x)
                jax.block_until_ready(y)
                win = np.asarray(jax.device_get(
                    jax.jit(lambda r: r[5000:5008, 1000:1032])(y)))
                ref = np.asarray(jax.device_get(
                    jax.jit(lambda r: r[5000:5008, 1000:1032])(x)))
                assert np.array_equal(win, ref), "copy parity"
                t, d = timed_loop(fn, x)
                gbs = 2 * x.size * 4 / t / 1e9
                log(f"depth={depth} rows={rows}: {gbs:.0f} GB/s "
                    f"({gbs/bw_sheet:.2f} of datasheet, valid={d['valid']})")
                res["cases"].append({"depth": depth, "rows": rows,
                                     "GBs": round(gbs, 1),
                                     "valid": d["valid"]})
            except Exception as e:  # noqa: BLE001
                log(f"depth={depth} rows={rows}: FAILED "
                    f"{type(e).__name__}: {str(e)[:150]}")
                res["cases"].append({"depth": depth, "rows": rows,
                                     "failed": type(e).__name__})

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
