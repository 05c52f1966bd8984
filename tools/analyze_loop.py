"""Summarize a sanity_train --metrics-out jsonl trajectory.

Prints an eval-step table (teacher/student AP) with windowed means of the
drift diagnostics (coarse_bboxes_iou, pseudo box size, cls_pool_coverage)
around each eval point, plus peak/final collapse numbers — the NOTES_r5
decay-characterization format. Compare runs side by side:

  python tools/analyze_loop.py work_dirs/r5_campaign/m_rot_lr12.jsonl \
      work_dirs/r5_campaign/m_rot_const.jsonl
"""
from __future__ import annotations

import json
import sys


def load(path):
    train, evals = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            (evals if rec.get("kind") == "eval" else train).append(rec)
    return train, evals


def window_mean(train, step, key, width=300):
    vals = [r[key] for r in train
            if key in r and step - width <= r["step"] <= step]
    return sum(vals) / len(vals) if vals else float("nan")


def coverage_at(rec):
    covs = [v for k, v in rec.items() if k.endswith("cls_pool_coverage")]
    return min(covs) if covs else float("nan")


def summarize(path):
    train, evals = load(path)
    print(f"\n=== {path} ===")
    if not evals:
        print("no eval records")
        return
    print(f"{'step':>6} {'phase':>8} {'t_AP':>7} {'s_AP':>7} "
          f"{'coarse_iou':>10} {'p_wh':>7} {'p_maxwh':>8} {'min_cov':>8} {'lr?':>9}")
    min_cov_all = 1.0
    for r in train:
        covs = [v for k, v in r.items() if k.endswith("cls_pool_coverage")]
        if covs:
            min_cov_all = min(min_cov_all, min(covs))
    peak, final = -1.0, float("nan")
    phase2 = [e for e in evals if e.get("phase") == "phase-2"]
    for e in evals:
        s = e["step"]
        cov = min((coverage_at(r) for r in train
                   if s - 300 <= r["step"] <= s), default=float("nan"))
        print(f"{s:>6} {e.get('phase', ''):>8} {e['teacher_ap']:>7.3f} "
              f"{e['student_ap']:>7.3f} "
              f"{window_mean(train, s, 'coarse_bboxes_iou'):>10.3f} "
              f"{window_mean(train, s, 'pseudo_mean_wh'):>7.2f} "
              f"{window_mean(train, s, 'pseudo_max_wh'):>8.1f} "
              f"{cov:>8.3f} "
              f"{window_mean(train, s, 'lr', width=20):>9.2g}")
    if phase2:
        peak = max(e["teacher_ap"] for e in phase2)
        final = phase2[-1]["teacher_ap"]
        ratio = final / peak if peak > 0 else float("nan")
        print(f"phase-2 teacher AP: peak={peak:.4f} final={final:.4f} "
              f"final/peak={ratio:.3f} "
              f"({'COLLAPSED' if peak > 0.05 and ratio < 0.7 else 'stable'} "
              f"at the 0.7 gate)")
    print(f"min cls_pool_coverage over run: {min_cov_all:.4f}")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    for path in sys.argv[1:]:
        summarize(path)


if __name__ == "__main__":
    main()
