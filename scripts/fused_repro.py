"""Minimal on-TPU repro for the fused-rollout Mosaic failures.

Captures the FULL compiler error (tpu_perf.py truncates to 200 chars) for
both dtypes at small shapes, so the offending op can be identified.

  timeout 1200 python scripts/fused_repro.py
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import fused_rollout, layout

    cfg = get_config("n40")
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(rng, 20, "two_opt", 1)
             for _ in range(8)]
    g = layout.build_uniform_block_graph(insts, 0.02, 40)
    batch = {k: jax.numpy.asarray(v)
             for k, v in tsp_sparse.block_batch_arrays(g).items()}
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)

    from tsp_gnn_tpu import train as tr
    for name, cast in [("bf16", tr._cast_bf16), ("f32", lambda t: t)]:
        p, b = cast(params), cast(batch)
        try:
            out = jax.jit(lambda pp, bb: fused_rollout.forward_fused(
                pp, bb, cfg.model, group=4, v_pad=g.v_pad, m_pad=g.m_pad,
                tmax=2))(p, b)
            print(f"=== {name}: OK, logits[:4] =",
                  np.asarray(out[:4]), flush=True)
        except Exception:
            print(f"=== {name}: FAILED ===", flush=True)
            traceback.print_exc()
            print("=== end ===", flush=True)


if __name__ == "__main__":
    main()
