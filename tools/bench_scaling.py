"""Cap-scaling sweep of the headline cycle: N in {256, 512, 1024, 2048}.

For each training-set size N this measures (a) OUR TPU-native cycle
(bench.run_tpu_cycle: production fit + fused WIP sweep) in this process and
(b) the reference-pattern serial CPU cycle (bench.run_baseline_cpu) in a
fresh subprocess, then prints one JSON line per N. GP training-set size is
the reference's scale axis (SURVEY.md section 5 "long-context analog"), so
this is the scaling-curve evidence behind the single-N headline number.

Usage: python tools/bench_scaling.py [N ...]    (default 256 512 1024 2048)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def baseline_subprocess(n: int) -> dict:
    code = (f"import bench; bench.N_TRAIN={n}; import json; "
            "dt, fit = bench.run_baseline_cpu(); "
            "print('RES ' + json.dumps({'cycle_s': dt, 'fit_s': fit}))")
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=3000,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("RES "):
            return json.loads(line[4:])
    raise RuntimeError(f"baseline subprocess failed:\n{out.stderr[-1500:]}")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048]
    rows = []
    for n in sizes:
        bench.N_TRAIN = n
        ours = bench.run_tpu_cycle()
        base = baseline_subprocess(n)
        row = {"N": n, "tpu_cycle_s": round(ours, 4),
               "cpu_cycle_s": round(base["cycle_s"], 3),
               "cpu_fit_s": round(base["fit_s"], 3),
               "speedup": round(base["cycle_s"] / ours, 1),
               "speedup_vs_4rank": round(
                   (base["fit_s"] / 4 + base["cycle_s"] - base["fit_s"])
                   / ours, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"scaling": rows}))


if __name__ == "__main__":
    main()
