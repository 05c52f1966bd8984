"""Training-log analysis.

Capability target: HBB_TOD/tools/analysis_tools/analyze_logs.py — summarize /
plot loss curves from the json-lines training log written by
point_teacher_tpu.utils.logging.TrainLogger.
"""
import argparse
import json


def load_log(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def cmd_plot(args):
    recs = load_log(args.json_log)
    keys = args.keys or ["total_loss"]
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; printing values instead")
        for k in keys:
            vals = [(r["iter"], r.get(k)) for r in recs if k in r]
            print(k, vals[:20], "...")
        return
    for k in keys:
        xs = [r["iter"] for r in recs if k in r]
        ys = [r[k] for r in recs if k in r]
        plt.plot(xs, ys, label=k)
    plt.xlabel("iter")
    plt.legend()
    out = args.out or "losses.png"
    plt.savefig(out)
    print(f"saved {out}")


def cmd_cal_train_time(args):
    recs = load_log(args.json_log)
    times = [r["time"] for r in recs if "time" in r]
    if not times:
        # derive from iter gaps if no explicit time field
        print(f"{len(recs)} log records; no time field")
        return
    import numpy as np
    print(f"average iter time: {np.mean(times):.4f}s, slowest {max(times):.4f}s, "
          f"fastest {min(times):.4f}s")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="task", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("json_log")
    p1.add_argument("--keys", nargs="*")
    p1.add_argument("--out")
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("json_log")
    args = ap.parse_args()
    if args.task == "plot_curve":
        cmd_plot(args)
    else:
        cmd_cal_train_time(args)


if __name__ == "__main__":
    main()
