"""End-of-round evaluation: best checkpoint -> all three sweeps + figures +
EVAL.md summary.  Run on the TPU once training has released it.

  python scripts/final_eval.py --log-dir /root/runs/n40_a --out-dir results/
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--out-dir", default="results")
    p.add_argument("--instances", type=int, default=256)
    p.add_argument("--preset", default="n40")
    args = p.parse_args()

    from tsp_gnn_tpu import evaluate, figures
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.utils import checkpoint as ck

    best = ck.find_best_checkpoint(args.log_dir)
    assert best, f"no checkpoint under {args.log_dir}"
    state = ck.load_checkpoint(best)
    params = state["params"]
    cfg = get_config(args.preset)
    os.makedirs(args.out_dir, exist_ok=True)
    print(f"evaluating {best} (epoch {state['epoch']})", flush=True)

    rows = []
    rows += evaluate.deviation_sweep(
        params, cfg, [0.0, 0.01, 0.02, 0.03, 0.05, 0.10],
        n_instances=args.instances)
    print("deviation sweep done", flush=True)
    # n=40-only accuracy at 2% (the [B:L5] headline)
    import numpy as np
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    rng = np.random.default_rng(20260817)
    insts40 = [generator.generate_instance(rng, 40)
               for _ in range(args.instances)]
    b40 = make_dense_batch(insts40, 0.02, 40)
    acc40 = evaluate._accuracy(params, b40, cfg)
    rows.append({"sweep": "headline", "n": 40, "deviation": 0.02,
                 "accuracy": acc40, "instances": args.instances})
    print(f"n=40 @2%: {acc40:.4f}", flush=True)
    rows += evaluate.size_generalization_sweep(
        params, cfg, [40, 50, 60, 70, 80], n_instances=args.instances // 4,
        tmax=50)
    print("size sweep done", flush=True)
    rows += evaluate.tmax_sweep(params, cfg, [8, 16, 32, 48, 64],
                                n_instances=args.instances // 4)
    print("tmax sweep done", flush=True)

    sweeps_path = os.path.join(args.out_dir, "sweeps.jsonl")
    with open(sweeps_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    written = figures.make_figures(rows, os.path.join(args.out_dir,
                                                      "figures"))
    with open(os.path.join(args.out_dir, "EVAL.md"), "w") as f:
        f.write(f"# Evaluation — {best} (epoch {state['epoch']})\n\n")
        f.write("| sweep | x | accuracy |\n|---|---|---|\n")
        for r in rows:
            x = r.get("deviation", r.get("n", r.get("tmax")))
            f.write(f"| {r['sweep']} | {x} | {r['accuracy']:.4f} |\n")
        f.write(f"\nfigures: {', '.join(written)}\n")
    print("wrote", sweeps_path, flush=True)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
