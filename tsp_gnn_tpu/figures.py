"""Figure generation from evaluation-sweep JSONL — the reference's paper
figures [SURVEY §2.1 C9, §3.3]: accuracy-vs-deviation (sigmoid curve around
the training deviation), size-generalization decay, tmax extrapolation.

Usage:
  python -m tsp_gnn_tpu.evaluate --checkpoint ... --out sweeps.jsonl
  python -m tsp_gnn_tpu.figures sweeps.jsonl --out-dir figures/
"""
from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def load_rows(path: str):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def make_figures(rows, out_dir: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    by_sweep = defaultdict(list)
    for r in rows:
        by_sweep[r.get("sweep")].append(r)
    written = []

    def plot(xs, ys, xlabel, title, fname, xlog=False, sems=None):
        fig, ax = plt.subplots(figsize=(5, 3.5))
        if sems is not None and any(s is not None for s in sems):
            # multi-set protocol rows carry a standard error of the mean —
            # render it [VERDICT r3 weak #6]
            err = [s if s is not None else 0.0 for s in sems]
            ax.errorbar(xs, ys, yerr=err, marker="o", capsize=3)
        else:
            ax.plot(xs, ys, marker="o")
        ax.axhline(0.5, color="gray", lw=0.8, ls="--", label="chance")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("decision accuracy")
        ax.set_ylim(0.4, 1.02)
        ax.set_title(title)
        ax.legend()
        fig.tight_layout()
        path = os.path.join(out_dir, fname)
        fig.savefig(path, dpi=150)
        plt.close(fig)
        written.append(path)

    if by_sweep.get("deviation"):
        rs = sorted(by_sweep["deviation"], key=lambda r: r["deviation"])
        plot([r["deviation"] * 100 for r in rs],
             [r["accuracy"] for r in rs],
             "cost deviation (%)", "Accuracy vs deviation",
             "accuracy_vs_deviation.png", sems=[r.get("sem") for r in rs])
    if by_sweep.get("size"):
        rs = sorted(by_sweep["size"], key=lambda r: r["n"])
        plot([r["n"] for r in rs], [r["accuracy"] for r in rs],
             "test instance size n", "Size generalization",
             "size_generalization.png", sems=[r.get("sem") for r in rs])
    if by_sweep.get("tmax"):
        rs = sorted(by_sweep["tmax"], key=lambda r: r["tmax"])
        plot([r["tmax"] for r in rs], [r["accuracy"] for r in rs],
             "message-passing iterations (test)", "tmax extrapolation",
             "tmax_extrapolation.png", sems=[r.get("sem") for r in rs])
    return written


def make_training_curve(metrics_path: str, out_dir: str,
                        title: str = "Training curve"):
    """Loss/accuracy-vs-epoch figure from a run's metrics.jsonl, with
    vertical markers where the curriculum deviation changes (the lift-off
    recipe: train at a larger deviation, anneal down)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    rows = [r for r in load_rows(metrics_path) if r.get("event") == "epoch"]
    if not rows:
        return []
    rows.sort(key=lambda r: r["epoch"])
    ep = [r["epoch"] for r in rows]
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(6, 5), sharex=True)
    ax1.plot(ep, [r["train_loss"] for r in rows], label="train loss")
    if "eval_loss" in rows[0]:
        ax1.plot(ep, [r.get("eval_loss") for r in rows], label="eval loss")
    ax1.axhline(0.6931, color="gray", lw=0.8, ls="--", label="ln 2 (chance)")
    ax1.set_ylabel("loss")
    ax1.legend(fontsize=8)
    ax2.plot(ep, [r["train_acc"] for r in rows], label="train acc")
    if "eval_acc" in rows[0]:
        ax2.plot(ep, [r.get("eval_acc") for r in rows], label="eval acc")
    ax2.axhline(0.5, color="gray", lw=0.8, ls="--")
    ax2.set_ylabel("decision accuracy")
    ax2.set_xlabel("epoch")
    ax2.set_ylim(0.4, 1.02)
    ax2.legend(fontsize=8)
    # deviation-phase boundaries
    prev = None
    for r in rows:
        dev = r.get("cur_deviation")
        if dev is not None and dev != prev:
            if prev is not None:
                for ax in (ax1, ax2):
                    ax.axvline(r["epoch"], color="tab:red", lw=0.8, ls=":")
                ax2.text(r["epoch"], 0.42, f" dev={dev:g}", fontsize=7,
                         color="tab:red")
            prev = dev
    ax1.set_title(title)
    fig.tight_layout()
    path = os.path.join(out_dir, "training_curve.png")
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return [path]


def main(argv=None):
    p = argparse.ArgumentParser(description="Render sweep figures")
    p.add_argument("sweeps", help="JSONL from tsp_gnn_tpu.evaluate --out, "
                                  "or a run's metrics.jsonl with "
                                  "--training-curve")
    p.add_argument("--out-dir", default="figures")
    p.add_argument("--training-curve", action="store_true",
                   help="render loss/acc-vs-epoch from a metrics.jsonl "
                        "(marks curriculum deviation changes)")
    p.add_argument("--title", default="Training curve")
    args = p.parse_args(argv)
    if args.training_curve:
        written = make_training_curve(args.sweeps, args.out_dir, args.title)
    else:
        written = make_figures(load_rows(args.sweeps), args.out_dir)
    for w in written:
        print(w)


if __name__ == "__main__":
    main()
