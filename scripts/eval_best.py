"""End-of-session headline eval on the best continuation checkpoint.

Uses ONLY shapes whose programs are already in the compile cache (256
instances, pad_n=40 dense forward): the deviation sweep + a 4x256-instance
headline (disjoint seeds) for a tighter n=40 @2% number.  The size/tmax
sweeps need new shapes (fresh compiles — 10+ min each on the degraded
08-20 compile service) and are NOT re-run here; EVAL.md keeps the round-2
epoch-447 sweep results for those.

  timeout 1800 python scripts/eval_best.py --log-dir runs/n40_cont
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", default="runs/n40_cont")
    p.add_argument("--checkpoint", default=None,
                   help="evaluate this checkpoint instead of the "
                        "metrics-best one under --log-dir")
    p.add_argument("--out", default="results/eval_best_r2.jsonl")
    p.add_argument("--instances", type=int, default=256)
    p.add_argument("--headline-batches", type=int, default=4)
    p.add_argument("--skip-deviation", action="store_true")
    args = p.parse_args()

    import numpy as np

    from tsp_gnn_tpu import evaluate
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.utils import checkpoint as ck
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    best = args.checkpoint or ck.find_best_checkpoint(args.log_dir)
    assert best, f"no checkpoint under {args.log_dir}"
    state = ck.load_checkpoint(best)
    params = state["params"]
    cfg = get_config("n40")
    rows = [{"event": "checkpoint", "path": best,
             "epoch": int(state["epoch"])}]
    print(f"evaluating {best} (epoch {state['epoch']})", flush=True)

    if not args.skip_deviation:
        rows += evaluate.deviation_sweep(
            params, cfg, [0.0, 0.01, 0.02, 0.03, 0.05, 0.10],
            n_instances=args.instances)
        print("deviation sweep done", flush=True)

    # headline: n=40 @ 2% over headline_batches disjoint 256-instance sets
    accs = []
    for k in range(args.headline_batches):
        rng = np.random.default_rng(20260817 + k)
        insts = [generator.generate_instance(rng, 40)
                 for _ in range(args.instances)]
        b = make_dense_batch(insts, 0.02, 40)
        acc = evaluate._accuracy(params, b, cfg)
        accs.append(acc)
        print(f"headline batch {k}: {acc:.4f}", flush=True)
    mean = float(np.mean(accs))
    sem = float(np.std(accs) / np.sqrt(len(accs)))
    rows.append({"sweep": "headline", "n": 40, "deviation": 0.02,
                 "accuracy": mean, "sem": sem,
                 "problems": 2 * args.instances * args.headline_batches,
                 "per_batch": accs})
    print(f"HEADLINE n=40 @2%: {mean:.4f} +/- {sem:.4f} "
          f"({2 * args.instances * args.headline_batches} problems)",
          flush=True)

    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
