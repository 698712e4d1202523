"""TRUE 2-process weak-scaling measurement over gloo collectives
(VERDICT r2 item 3: the only real-collective scaling measurement this
single-chip environment permits).

Fixed work per process (rows_per_proc x nx Poisson rows), 1 vs 2 OS
processes joined by ``jax.distributed`` + gloo.  Every process is pinned
to its OWN physical core (taskset) — including the 1-process baseline —
so each process has identical compute resources and the efficiency ratio
isolates communication + synchronization overhead, not core sharing (the
round-2 virtual-mesh numbers were CPU-sharing artifacts and are labeled
as such in WEAK_SCALING.md).

Writes one JSON line (probe = "weak_scaling_2proc") to
benchmarks/results_mp.json and prints the efficiency table.

Run: python benchmarks/weak_scaling_mp.py  [--rows 768] [--nx 1024]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CHILD = os.path.join(HERE, "_ws_child.py")
REPO = os.path.dirname(HERE)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_job(nproc: int, rows: int, nx: int, solver: str, timeout=1800):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH",
                        "JAX_NUM_CPU_DEVICES")}
    env["PYTHONPATH"] = REPO
    port = free_port()
    procs = []
    for pid in range(nproc):
        cmd = ["taskset", "-c", str(pid % os.cpu_count()), sys.executable,
               CHILD, str(pid), str(nproc), str(port), str(rows), str(nx),
               solver]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, env=env,
                                      text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"nproc={nproc} process {pid} failed:\n{out}")
    for out in outs:
        for line in out.splitlines():
            if line.startswith("WS-RESULT "):
                return json.loads(line[len("WS-RESULT "):])
    raise RuntimeError(f"no WS-RESULT line:\n{outs[0]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=768)
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--solvers", default="gmres,eighs")
    args = ap.parse_args()

    results = {"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
               "probe": "weak_scaling_2proc", "pinning": "1 core/process",
               "rows_per_proc": args.rows, "nx": args.nx, "jobs": []}
    for solver in args.solvers.split(","):
        # interleave 1p/2p/1p/2p so slow machine-state drift (thermal,
        # competing daemons) hits both sides of the ratio equally; take the
        # best of each side (each side is itself a best-of-WS_REPEATS).
        r1 = run_job(1, args.rows, args.nx, solver)
        r2 = run_job(2, args.rows, args.nx, solver)
        r1b = run_job(1, args.rows, args.nx, solver)
        r2b = run_job(2, args.rows, args.nx, solver)
        t1 = min(r1["time_s"], r1b["time_s"])
        t2 = min(r2["time_s"], r2b["time_s"])
        eff = t1 / t2
        print(f"{solver}: 1 proc {r1['dof']/1e6:6.2f}M DoF {t1:.3f}s | "
              f"2 proc {r2['dof']/1e6:6.2f}M DoF {t2:.3f}s  "
              f"weak-eff = {eff:.1%}", flush=True)
        results["jobs"].append({"solver": solver, "t1_s": t1, "t2_s": t2,
                                "efficiency": round(eff, 4),
                                "r1": r1, "r2": r2, "r1b": r1b, "r2b": r2b})

    out_path = os.path.join(HERE, "results_mp.json")
    with open(out_path, "a") as f:
        f.write(json.dumps(results) + "\n")
    print("appended to", out_path)


if __name__ == "__main__":
    main()
