"""Resumable TPU measurement campaign for the round-5 queue.

Same mechanism as tools/r4_campaign.py (bounded subprocesses, tunnel probe
between phases, one checkpointed JSON per phase in work_dirs/r5_campaign/),
with the round-5 priority order:

1. bench_phase1        HEAD recapture — validates the shared-window MIL pool
2. loop_rot_lr12       rotated 3000-step closed loop WITH the reference's
                       step-lr schedule (the collapse-fix candidate),
                       collapse gate tightened to 0.7*peak
3. loop_rot_const      control at HEAD: constant lr (r4 protocol) — proves
                       schedule causality for the phase-2 decay
4. bench_rotated       rotated perf at HEAD
5. profile_mil/bisect8 HBB MIL split at HEAD (the 142 ms attack)
6. loop_rot_noaug      constant lr + identity strong-aug (aug-bias A/B)
7. loop_rot_ungrouped  constant lr + per-roi exact pool (coverage A/B)
8. loop_hbb_lr12       HBB twin under the schedule + 0.7 gate
9. rbisect             rotated step split (profiler fixed this round)
10. rsweep_b8s4/b6s8   rotated batch sweep around the B=8 HTTP-500 point
11. bench_phase2       phase-2 recapture
12. loop6k_*           6000-step decay characterization (both trainers)

Run:  python tools/r5_campaign.py [--only NAME[,NAME..]] [--skip-probe]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "work_dirs", "r5_campaign")
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


def run_phase(name: str, cmd: list, timeout: int) -> dict:
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
           "parsed": parsed, "stdout_tail": out[-8000:], "stderr_tail": err}
    with open(res_path, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"{name}: rc={rc} ok={ok} wall={wall:.0f}s parsed={parsed}")
    return rec


def _loop(trainer, *extra, gate=True):
    """Closed-loop sanity run. gate=False for causality CONTROLS that are
    EXPECTED to collapse (e.g. constant-lr reproductions of the r4 failure):
    they must exit 0 on completion so the retry wrapper doesn't re-run them
    forever; the trajectory lands in --metrics-out either way."""
    base = [PY, "tools/sanity_train.py", "--trainer", trainer,
            "--steps", "3000", "--img", "256", "--batch", "4", "--gt", "4",
            "--frozen-stages", "0", "--burn-in-frac", "0.2",
            "--eval-interval", "300"]
    if gate:
        base.append("--assert-no-collapse")
    return base + list(extra)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma list of phase names")
    ap.add_argument("--skip-probe", action="store_true")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    mo = os.path.join(OUT, "m_")  # metrics-out prefix
    # r5 mid-campaign restructure (NOTES_r5 "phase-2 decay"): loop_rot_lr12's
    # trajectory REFUTED the lr-schedule hypothesis (teacher AP kept decaying
    # at lr/10; pseudo boxes contract monotonically) and EXONERATED the
    # grouped pool (coverage 1.0 through the whole decay; the r4 0.444 was an
    # early-burn-in random-tower transient). New leading mechanism: uniform-
    # fill harness objects make a slightly-smaller crop the best-scoring
    # class sample, so selection + score-weighted averaging carry a shrink
    # bias the TS loop compounds. The noaug/ungrouped controls are dropped
    # (their questions are answered by the trajectory); the decisive A/Bs are
    # ring objects (boundary-discriminative, the real-photo regime) and
    # >=1.0-only extensive ratios (no smaller member to select).
    phases = [
        ("bench_phase1", [PY, "bench.py"], 2400),
        ("loop_rot_lr12", _loop("rotated", "--lr-epochs", "12",
                                "--metrics-out", mo + "rot_lr12.jsonl",
                                gate=False), 7200),
        ("bench_rotated", [PY, "bench.py", "--rotated"], 2400),
        ("rbisect", [PY, "tools/profile_rbisect.py"], 3600),
        # post-optimization recapture (neg-fold + window 24, r5 commit d1217ba)
        ("bench_p1_v2", [PY, "bench.py"], 2400),
        ("bisect8_v2", [PY, "tools/profile_bisect8.py"], 3600),
        # post reg-tower-fusion recapture (phase-1 only change)
        ("bench_p1_v3", [PY, "bench.py"], 2400),
        ("rsweep_b8s4", [PY, "bench.py", "--rotated", "--batch", "8",
                         "--scan", "4"], 2400),
        ("rsweep_b6s8", [PY, "bench.py", "--rotated", "--batch", "6"], 2400),
        # sub-split of rbisect's 138 ms rotated-MIL item
        ("profile_rmil", [PY, "tools/profile_rmil.py"], 2400),
        # fusion reverted (v3 26.29 < v2 27.14): confirm the unfused number
        ("bench_p1_v4", [PY, "bench.py"], 2400),
        # 8-min learnability probe: can the box-supervised stack learn ring
        # objects at all? (two blind 45-min TS ring loops failed with AP~0 —
        # decide the harness-data question cheaply before the next attempt)
        ("probe_fcos_ring", [PY, "tools/sanity_train.py", "--trainer", "fcos",
                             "--steps", "800", "--img", "256", "--batch", "4",
                             "--gt", "4", "--frozen-stages", "0",
                             "--objects", "ring", "--eval-interval", "200"],
         2400),
        ("bench_phase2", [PY, "bench.py", "--phase2"], 2400),
        # exploratory (gate=False): the first ring attempt EXPLODED the other
        # way (pwh 16->108, m_rot_ring.jsonl) — the walk is unstable in both
        # directions without the reference's basin-shaping hyperparameters
        ("loop_rot_ring2", _loop("rotated", "--lr-epochs", "12",
                                 "--objects", "ring",
                                 "--top-k", "3", "--gen-neg", "200",
                                 "--metrics-out", mo + "rot_ring2.jsonl",
                                 gate=False), 9600),
        ("loop_hbb_ring", _loop("point_teacher", "--lr-epochs", "12",
                                "--objects", "ring",
                                "--top-k", "1", "--gen-neg", "200",
                                "--metrics-out", mo + "hbb_ring.jsonl",
                                gate=False), 9600),
        ("profile_mil", [PY, "tools/profile_mil.py", "--batch", "8"], 2400),
        ("bisect8", [PY, "tools/profile_bisect8.py"], 3600),
        ("loop_rot_noshrink", _loop("rotated", "--lr-epochs", "12",
                                    "--ext-ratios", "1.0,1.2",
                                    "--metrics-out", mo + "rot_noshrink.jsonl",
                                    gate=False), 7200),
        ("loop_rot_const", _loop("rotated", "--lr-epochs", "0",
                                 "--metrics-out", mo + "rot_const.jsonl",
                                 gate=False), 7200),
        ("loop6k_rot", [PY, "tools/sanity_train.py", "--trainer", "rotated",
                        "--steps", "6000", "--img", "256", "--batch", "4",
                        "--gt", "4", "--frozen-stages", "0",
                        "--burn-in-frac", "0.1", "--eval-interval", "300",
                        "--objects", "ring",
                        "--assert-no-collapse", "--collapse-ratio", "0.7",
                        "--lr-epochs", "12",
                        "--metrics-out", mo + "rot_6k.jsonl"], 14000),
        ("loop6k_hbb", [PY, "tools/sanity_train.py", "--trainer",
                        "point_teacher", "--steps", "6000", "--img", "256",
                        "--batch", "4", "--gt", "4", "--frozen-stages", "0",
                        "--burn-in-frac", "0.1", "--eval-interval", "300",
                        "--objects", "ring",
                        "--assert-no-collapse", "--collapse-ratio", "0.7",
                        "--lr-epochs", "12",
                        "--metrics-out", mo + "hbb_6k.jsonl"], 14000),
    ]
    todo = phases
    if args.only:
        names = set(args.only.split(","))
        known = {p[0] for p in phases}
        unknown = names - known
        if unknown:
            sys.exit(f"unknown phase name(s): {sorted(unknown)}; "
                     f"known: {sorted(known)}")
        todo = [p for p in phases if p[0] in names]

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
    for fn in sorted(os.listdir(OUT)):
        if fn.endswith(".json"):
            with open(os.path.join(OUT, fn)) as f:
                r = json.load(f)
            log(f"  {r['name']}: ok={r['ok']} wall={r['wall_s']}s parsed={r.get('parsed')}")
    if any(not r.get("ok") for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
