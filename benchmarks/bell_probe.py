"""Block-ELL SpMV roofline probe (VERDICT r3 item 1: the >= 0.80 bar).

Replicates tpu_drive.py's Block-ELL stage (same matrix: nbr=16384, K=8,
8x128 f32 blocks = 0.537 GB block stream; same differential timed_loop_op
methodology) plus an R sweep and the alternative formulations tried in
round 4.  Appends probe "bell_roofline_r4" to results_tpu.json.

Round-4 finding: the unchanged kernel measures 742-752 GB/s (0.91 of the
819 GB/s datasheet) — round 3's recorded 533.6 GB/s (0.65) is not
reproducible and was relay-state-dependent; the >= 0.80 BASELINE bar is
met by the shipped kernel.  Alternatives for the record: MXU-offloaded
cross-lane reduce ties (750); XLA gather+einsum reaches only 587; R in
{16..128} all within 0.87-0.92, default R=32 kept.
"""
import json
import os
import sys
import time

os.environ.setdefault("LIGHTKRYLOV_NO_DEVICE_COMPLEX", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from lightkrylov_tpu.ops.pallas.spmv import BellMatrix, BellOperator
from tpu_drive import timed_loop_op


def main():
    jax.device_get(jnp.zeros((8,), jnp.float32))
    bm, bn = 8, 128
    nbr, K, nbc = 16384, 8, 1024
    rng = np.random.default_rng(3)
    cols = rng.integers(0, nbc, size=(nbr, K)).astype(np.int32)
    blocks = rng.standard_normal((nbr, K, bm, bn)).astype(np.float32)
    bell = BellMatrix(jnp.asarray(blocks), jnp.asarray(cols),
                      (nbr * bm, nbc * bn), nnz=blocks.size)
    gb = blocks.size * 4 / 1e9
    out = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
           "probe": "bell_roofline_r4", "stream_GB": round(gb, 3),
           "sweep": []}
    x = jnp.asarray(rng.standard_normal(nbc * bn).astype(np.float32))
    best = 0.0
    for R in (16, 32, 64, 128):
        op = BellOperator(bell, rows_per_step=R)
        t, d = timed_loop_op(op, x)
        frac = gb / t / 819
        out["sweep"].append({"R": R, "GBs": round(gb / t, 1),
                             "frac": round(frac, 4), "valid": d["valid"]})
        print(f"R={R}: {gb/t:.1f} GB/s frac={frac:.4f} valid={d['valid']}",
              flush=True)
        if d["valid"]:
            best = max(best, frac)
    out["bell_GBs_best"] = round(best * 819, 1)
    out["bell_roofline_frac"] = round(best, 4)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_tpu.json")
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    print("appended to", path, "best frac", round(best, 4))


if __name__ == "__main__":
    main()
