"""Probe-gated bench launcher: wait for a quiet memory bus, then run
``bench.py --scaling`` (or a full bench) once and write its JSON line.

The host shares a memory bus with invisible co-tenants (BASELINE.md:
guest CPU metrics read idle while a 50 MB memcpy measures 0.01-1.4
GB/s vs a healthy 10-20). The extraction kernel is memory-bound, so
scaling-efficiency measurements are only meaningful in quiet windows.
This wrapper probes every --interval seconds and launches when
--consecutive probes all read >= --gb-s (double-probe gate, round-3
run E's recipe).

Usage:
    python tools/probe_gated_bench.py --scaling --out /tmp/scaling.json
    python tools/probe_gated_bench.py --full --out /tmp/bench.json \
        --gb-s 3.0 --max-wait 3600
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

REPO = "/root/repo"


def memcpy_gb_s(budget_sec: float = 1.5) -> float:
    a = np.empty(50 * 1024 * 1024 // 8)
    a[:] = 1.0
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < budget_sec:
        _ = a.copy()
        n += 1
    dt = time.perf_counter() - t0
    return n * 50 * 2 / 1024 / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--gb-s", type=float, default=4.0)
    ap.add_argument("--interval", type=float, default=120.0)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("--max-wait", type=float, default=7200.0,
                    help="launch anyway after this many seconds")
    args = ap.parse_args()

    t0 = time.time()
    streak = 0
    probes = []
    while True:
        bw = memcpy_gb_s()
        probes.append(round(bw, 3))
        streak = streak + 1 if bw >= args.gb_s else 0
        waited = time.time() - t0
        print(f"[probe] {bw:.2f} GB/s (streak {streak}/"
              f"{args.consecutive}, waited {waited:.0f}s)", flush=True)
        if streak >= args.consecutive:
            break
        if waited > args.max_wait:
            print("[probe] max-wait reached; launching on a loaded bus "
                  "(record will say so)", flush=True)
            break
        time.sleep(args.interval)

    cmd = [sys.executable, "bench.py"]
    if args.scaling:
        cmd.append("--scaling")
    print(f"[launch] {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    line = ""
    for ln in (r.stdout or "").splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    if not line:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        return 1
    rec = json.loads(line)
    rec["probe_history_gb_s"] = probes[-10:]
    rec["probe_gate_gb_s"] = args.gb_s
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
