"""Wide-array HBM copy bandwidth vs logical shape and block shape.

Round-3 finding: the Pallas stencil kernels cap at ~330 GB/s on
8192-wide f32 arrays while the same kernels (and a plain Pallas copy)
reach ~700 GB/s at 3072/4096 width — even though a row-strip copy of a
row-major array is CONTIGUOUS memory either way.  This probe isolates the
variable: the same 256 MB / 512 MB of data copied under different logical
shapes and Pallas block shapes, plus XLA's own copy (reshape-free) as a
control.  If some block/shape combination restores ~700 GB/s on the
8192-wide layout, the stencil kernels' DMA granularity should adopt it.

Appends one JSON line (probe = "copy_shape") to results_tpu.json.
"""

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

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "copy_shape",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())
    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")
    bw_sheet = (datasheet_bw(res["device_kind"]) or 0.819e12) / 1e9

    def _copy_kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...]

    def pallas_copy(shape, block):
        ny, nx = shape
        by, bx = block
        gy, gx = ny // by, nx // bx

        @jax.jit
        def f(x):
            if gx == 1:
                return pl.pallas_call(
                    _copy_kernel,
                    grid=(gy,),
                    in_specs=[pl.BlockSpec((by, nx), lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((by, nx), lambda i: (i, 0)),
                    out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
                )(x)
            return pl.pallas_call(
                _copy_kernel,
                grid=(gy, gx),
                in_specs=[pl.BlockSpec((by, bx), lambda i, j: (i, j))],
                out_specs=pl.BlockSpec((by, bx), lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
            )(x)
        return f

    rng = np.random.default_rng(0)
    res["cases"] = []

    # Same 256 MB payload in three logical shapes; plus the 512 MB 8192².
    CASES = [
        # (label, shape, block)
        ("8192x8192_rows256", (8192, 8192), (256, 8192)),
        ("8192x8192_rows64", (8192, 8192), (64, 8192)),
        ("8192x8192_blk256x1024", (8192, 8192), (256, 1024)),
        ("8192x8192_blk1024x256", (8192, 8192), (1024, 256)),
        ("8192x8192_blk64x2048", (8192, 8192), (64, 2048)),
        ("4096x4096_rows128", (4096, 4096), (128, 4096)),       # 700 anchor
        ("4096x16384_rows128", (4096, 16384), (128, 16384)),    # 256 MB wide
        ("16384x4096_rows256", (16384, 4096), (256, 4096)),     # 256 MB tall
        ("65536x1024_rows1024", (65536, 1024), (1024, 1024)),   # 256 MB slim
        ("8192x8192_reshaped_32768x2048", (32768, 2048), (512, 2048)),
    ]
    for label, shape, block in CASES:
        try:
            x = jnp.asarray(
                rng.standard_normal(shape).astype(np.float32))
            jax.block_until_ready(x)
            t, d = timed_loop(pallas_copy(shape, block), x)
            gbs = 2 * x.size * 4 / t / 1e9
            log(f"  {label}: {gbs:.0f} GB/s ({gbs/bw_sheet:.2f} of "
                f"datasheet, valid={d['valid']})")
            res["cases"].append({"label": label, "GBs": round(gbs, 1),
                                 "frac": round(gbs / bw_sheet, 3),
                                 "valid": d["valid"]})
            del x
        except Exception as e:  # noqa: BLE001
            log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:160]}")
            res["cases"].append({"label": label,
                                 "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    # control: XLA elementwise stream on the 8192² array
    x = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))
    t, d = timed_loop(lambda a: a + 1.0, x)
    gbs = 2 * x.size * 4 / t / 1e9
    log(f"  xla_add_8192: {gbs:.0f} GB/s (valid={d['valid']})")
    res["cases"].append({"label": "xla_add_8192", "GBs": round(gbs, 1),
                         "frac": round(gbs / bw_sheet, 3),
                         "valid": d["valid"]})

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
