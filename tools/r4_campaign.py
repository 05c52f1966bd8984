"""Resumable TPU measurement campaign for the round-4 queue.

The axon relay oscillates (NOTES_r4 "Tunnel log"); healthy windows are
precious and ONE TPU process may run at a time (CLAUDE.md). This runner
executes the queued measurements in priority order, each in a bounded
subprocess, re-probing the tunnel between phases and checkpointing every
result to work_dirs/r4_campaign/<name>.json so an interrupted campaign
resumes where it left off (delete a result file to force a re-run).

Stage A (default): fast recaptures + profiles the perf work feeds on
  bench_rotated  python bench.py --rotated           (HEAD recapture)
  bench_phase1   python bench.py                     (+ warms the driver cache)
  bench_phase2   python bench.py --phase2            (stale-number recapture)
  rsweep_*       rotated B/scan operating-point re-sweep at HEAD
  rbisect        tools/profile_rbisect.py            (rotated step split)
  bisect8        tools/profile_bisect8.py            (HBB step split)

Stage B (--loops): the 3000-step 256px closed loops, both trainers,
  --assert-no-collapse (incl. the cls_pool_coverage gate).

Run:  python tools/r4_campaign.py [--loops] [--only NAME[,NAME..]]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "work_dirs", "r4_campaign")
PY = sys.executable


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tunnel_ok() -> bool:
    r = subprocess.run(
        [PY, "-c",
         "from point_teacher_tpu.utils.tunnel import tunnel_healthy;"
         "import sys; sys.exit(0 if tunnel_healthy() else 1)"],
        cwd=ROOT, timeout=420,
    )
    return r.returncode == 0


def run_phase(name: str, cmd: list[str], timeout: int) -> dict:
    res_path = os.path.join(OUT, f"{name}.json")
    if os.path.exists(res_path):
        with open(res_path) as f:
            prev = json.load(f)
        if prev.get("ok"):
            log(f"{name}: cached ok, skipping")
            return prev
    log(f"{name}: RUN {' '.join(cmd)} (timeout {timeout}s)")
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
        out, rc = p.stdout, p.returncode
        err = p.stderr[-4000:]
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err, rc = "TIMEOUT", 124
    wall = time.time() - t0
    # grab the last parseable JSON line if any (bench contract); keep
    # scanning past brace-prefixed noise that fails to parse
    parsed = None
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                break
            except ValueError:
                continue
    ok = rc == 0 and not (isinstance(parsed, dict) and parsed.get("error"))
    rec = {"name": name, "cmd": cmd, "rc": rc, "ok": ok, "wall_s": round(wall, 1),
           "parsed": parsed, "stdout_tail": out[-6000:], "stderr_tail": err}
    with open(res_path, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"{name}: rc={rc} ok={ok} wall={wall:.0f}s parsed={parsed}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", action="store_true", help="run stage B closed loops")
    ap.add_argument("--only", default=None, help="comma list of phase names")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    phases = [
        ("bench_rotated", [PY, "bench.py", "--rotated"], 2400),
        ("bench_phase1", [PY, "bench.py"], 2400),
        ("bench_phase2", [PY, "bench.py", "--phase2"], 2400),
        ("rsweep_b4s16", [PY, "bench.py", "--rotated", "--scan", "16"], 2400),
        ("rsweep_b8s8", [PY, "bench.py", "--rotated", "--batch", "8"], 2400),
        ("rbisect", [PY, "tools/profile_rbisect.py"], 3600),
        ("bisect8", [PY, "tools/profile_bisect8.py"], 3600),
        ("rdense", [PY, "tools/profile_dense.py", "--rotated",
                    "--img", "1200", "--batch", "12"], 3600),
        ("rgather", [PY, "tools/profile_gather.py"], 1800),
    ]
    loops = [
        ("loop_hbb", [PY, "tools/sanity_train.py", "--trainer", "point_teacher",
                      "--steps", "3000", "--img", "256", "--batch", "4", "--gt", "4",
                      "--frozen-stages", "0", "--burn-in-frac", "0.2",
                      "--eval-interval", "300", "--assert-no-collapse"], 7200),
        ("loop_rot", [PY, "tools/sanity_train.py", "--trainer", "rotated",
                      "--steps", "3000", "--img", "256", "--batch", "4", "--gt", "4",
                      "--frozen-stages", "0", "--burn-in-frac", "0.2",
                      "--eval-interval", "300", "--assert-no-collapse"], 7200),
    ]
    todo = loops if args.loops else phases
    if args.only:
        names = set(args.only.split(","))
        known = {p[0] for p in phases + loops}
        unknown = names - known
        if unknown:
            sys.exit(f"unknown phase name(s): {sorted(unknown)}; "
                     f"known: {sorted(known)}")
        todo = [p for p in phases + loops if p[0] in names]

    results = []
    for name, cmd, timeout in todo:
        if not args.skip_probe:
            log("probing tunnel ...")
            healthy = False
            for attempt in range(3):
                try:
                    healthy = tunnel_ok()
                except subprocess.TimeoutExpired:
                    healthy = False
                if healthy:
                    break
                log(f"tunnel sick (attempt {attempt + 1}/3); sleeping 300s")
                time.sleep(300)
            if not healthy:
                log(f"tunnel stayed sick; stopping before {name} "
                    f"(resume later: results so far are checkpointed)")
                sys.exit(2)
        results.append(run_phase(name, cmd, timeout))

    log("campaign stage complete")
    # summary table
    for fn in sorted(os.listdir(OUT)):
        if fn.endswith(".json"):
            with open(os.path.join(OUT, fn)) as f:
                r = json.load(f)
            log(f"  {r['name']}: ok={r['ok']} wall={r['wall_s']}s parsed={r.get('parsed')}")
    # contract with the retry-loop wrapper: non-zero while any requested
    # phase is still not-ok, so the wrapper keeps re-launching (run_phase
    # re-runs cached not-ok phases)
    if any(not r.get("ok") for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
