"""XLA stencil formulation shoot-out at 8192² (beyond-VMEM regime).

copy_shape probe conclusion: Pallas block pipelines cap at ~330 GB/s on
>=256 MB arrays (input and output DMA apparently not overlapped — exactly
half of what XLA's fused elementwise achieves on the same array, 665
GB/s).  The fastest possible beyond-VMEM stencil is therefore a
SINGLE-PASS fused XLA formulation; the current pad-based form reaches
only 170 GB/s because the four padded temporaries materialize.  This
probe times candidate formulations (each parity-checked against the
pad-based oracle first):

  1. pad-based (current Poisson2D)
  2. concatenate-based shifts (pad expressed as concat of zeros rows/cols)
  3. interior-slice accumulate: out built by .at[].add on shifted interior
     windows (scatter-fusion candidate)
  4. jnp.roll + boundary mask (roll lowers to two slices + concat)
  5. lax.conv_general_dilated with a 3x3 cross kernel (MXU path)
  6. separable: horizontal tridiagonal pass + vertical add in one
     expression

All at n=8192 f32, cold-chained (the timing loop carries the output into
the next input, but at 256 MB nothing fits VMEM so the chain is honest).
Appends one JSON line (probe = "stencil_form") to results_tpu.json.
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
    from jax import lax

    res = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"), "probe": "stencil_form",
           "device_kind": jax.devices()[0].device_kind}
    log("backend:", jax.default_backend(), jax.devices())
    a = jnp.ones((1024, 1024), jnp.float32)
    assert abs(float(jax.device_get(jnp.sum(a @ a))) - 1024.0**3) < 1e6
    log("health gate ok")
    bw_sheet = (datasheet_bw(res["device_kind"]) or 0.819e12)

    n = 8192
    ihx2 = ihy2 = float((n + 1) ** 2)
    c0 = 2.0 * (ihx2 + ihy2)
    nnz = 5 * n * n - 4 * n
    roof = bw_sheet * 5 / 8

    def pad_form(u):
        un = jnp.pad(u, ((0, 0), (1, 1)))
        left, right = un[:, :-2], un[:, 2:]
        um = jnp.pad(u, ((1, 1), (0, 0)))
        down, up = um[:-2, :], um[2:, :]
        return c0 * u - ihx2 * (left + right) - ihy2 * (down + up)

    zcol = None  # built lazily on device

    def concat_form(u):
        zc = jnp.zeros((n, 1), u.dtype)
        zr = jnp.zeros((1, n), u.dtype)
        left = jnp.concatenate([zc, u[:, :-1]], axis=1)
        right = jnp.concatenate([u[:, 1:], zc], axis=1)
        down = jnp.concatenate([zr, u[:-1, :]], axis=0)
        up = jnp.concatenate([u[1:, :], zr], axis=0)
        return c0 * u - ihx2 * (left + right) - ihy2 * (down + up)

    def slice_add_form(u):
        out = c0 * u
        out = out.at[:, 1:].add(-ihx2 * u[:, :-1])
        out = out.at[:, :-1].add(-ihx2 * u[:, 1:])
        out = out.at[1:, :].add(-ihy2 * u[:-1, :])
        out = out.at[:-1, :].add(-ihy2 * u[1:, :])
        return out

    def roll_form(u):
        left = jnp.roll(u, 1, axis=1).at[:, 0].set(0.0)
        right = jnp.roll(u, -1, axis=1).at[:, -1].set(0.0)
        down = jnp.roll(u, 1, axis=0).at[0, :].set(0.0)
        up = jnp.roll(u, -1, axis=0).at[-1, :].set(0.0)
        return c0 * u - ihx2 * (left + right) - ihy2 * (down + up)

    kern = np.zeros((3, 3), np.float32)
    kern[1, 1] = c0
    kern[1, 0] = kern[1, 2] = -ihx2
    kern[0, 1] = kern[2, 1] = -ihy2

    def conv_form(u):
        x = u[None, None]
        k = jnp.asarray(kern)[None, None]
        y = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)))
        return y[0, 0]

    def separable_form(u):
        zc = jnp.zeros((n, 1), u.dtype)
        zr = jnp.zeros((1, n), u.dtype)
        horiz = c0 * u \
            - ihx2 * jnp.concatenate([zc, u[:, :-1]], axis=1) \
            - ihx2 * jnp.concatenate([u[:, 1:], zc], axis=1)
        return horiz \
            - ihy2 * jnp.concatenate([zr, u[:-1, :]], axis=0) \
            - ihy2 * jnp.concatenate([u[1:, :], zr], axis=0)

    forms = {"pad": pad_form, "concat": concat_form,
             "slice_add": slice_add_form, "roll": roll_form,
             "conv": conv_form, "separable": separable_form}

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    jax.block_until_ready(u)

    # parity vs pad oracle on a slice (fetch only a small window)
    ref = jax.jit(pad_form)(u)
    jax.block_until_ready(ref)
    ref_win = np.asarray(jax.device_get(jax.jit(lambda r: r[100:108, 200:232])(ref)))

    res["forms"] = []
    for name, fn in forms.items():
        try:
            out = jax.jit(fn)(u)
            jax.block_until_ready(out)
            win = np.asarray(jax.device_get(
                jax.jit(lambda r: r[100:108, 200:232])(out)))
            err = float(np.abs(win - ref_win).max() / np.abs(ref_win).max())
            assert err < 1e-5, f"parity {err}"
            t, d = timed_loop(fn, u)
            gnnzs = nnz / t / 1e9
            eff = 2 * n * n * 4 / t / 1e9
            log(f"  {name}: {gnnzs:.0f} Gnnz/s ({eff:.0f} GB/s eff, "
                f"{gnnzs/(roof/1e9):.2f} of roofline, valid={d['valid']})")
            res["forms"].append({"name": name, "Gnnzs": round(gnnzs, 1),
                                 "eff_GBs": round(eff, 1),
                                 "roofline_frac": round(gnnzs / (roof / 1e9), 4),
                                 "valid": d["valid"]})
        except Exception as e:  # noqa: BLE001
            log(f"  {name}: FAILED {type(e).__name__}: {str(e)[:150]}")
            res["forms"].append({"name": name,
                                 "failed": f"{type(e).__name__}: {str(e)[:200]}"})

    out_path = os.path.join(os.path.dirname(__file__), "results_tpu.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(res) + "\n")
    log("DONE")


if __name__ == "__main__":
    main()
