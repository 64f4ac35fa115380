"""Bisect the fused-backward Mosaic compile failure (HTTP 500 at flagship
shapes, results/r4_perf.jsonl fusedbwd stage).

Escalates (tmax, instances, group) from tiny to flagship and records which
programs the tunnel compile service accepts, separating:
  * fwd_traj: the trajectory-saving forward kernel alone
  * full:     value_and_grad through the custom_vjp (fwd + bwd kernels)

  timeout 3600 env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/fused_bwd_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "results/fused_bwd_probe.jsonl"


def emit(**kv):
    print(json.dumps(kv), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(kv) + "\n")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.models import tsp, tsp_sparse
    from tsp_gnn_tpu.ops import layout, rollout_grad
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    assert jax.devices()[0].platform != "cpu"
    base = get_config("n40")
    rng = np.random.default_rng(0)
    only = os.environ.get("PROBE_CASES", "")
    cases = [
        # (tag, tmax, n_insts, pad_n, group, bf16, bwd_f32)
        ("tiny_t4_i8_g2", 4, 8, 20, 2, False, False),
        ("small_t8_i32_g2", 8, 32, 40, 2, False, False),
        ("mid_t32_i32_g2", 32, 32, 40, 2, False, False),
        ("flag_t32_i128_g1", 32, 128, 40, 1, False, False),
        ("flag_t32_i128_g2", 32, 128, 40, 2, False, False),
        ("small_bf16", 8, 32, 40, 2, True, False),
        ("flag_bf16_g2", 32, 128, 40, 2, True, False),
        ("flag_bf16_g2_bwdf32", 32, 128, 40, 2, True, True),
    ]
    if only:
        cases = [c for c in cases if c[0] in only.split(",")]
    for tag, tmax, n_insts, pad_n, group, bf16, bwd_f32 in cases:
        cfg = dataclasses.replace(base.model, tmax=tmax)
        insts = [generator.generate_instance(
            rng, int(rng.integers(max(10, pad_n // 2), pad_n + 1)),
            "two_opt", 1) for _ in range(n_insts)]
        g = layout.build_uniform_block_graph(insts, 0.02, pad_n)
        batch = {k: jnp.asarray(v)
                 for k, v in tsp_sparse.block_batch_arrays(g).items()}
        params = tsp.tsp_init(jax.random.PRNGKey(0), cfg)
        labels = batch["labels"].astype(jnp.float32)
        if bf16:
            from tsp_gnn_tpu.train import _cast_bf16
            batch = _cast_bf16(batch)
            params_in = _cast_bf16(params)
        else:
            params_in = params
        params = params_in

        def logits_fn(p, cfg=cfg, g=g, batch=batch, group=group,
                      bwd_f32=bwd_f32):
            return rollout_grad.forward_fused_train(
                p, batch, cfg, v_pad=g.v_pad, m_pad=g.m_pad, group=group,
                bwd_f32=bwd_f32, interpret=False)

        # 1) forward(traj) alone
        try:
            t0 = time.perf_counter()
            out = jax.jit(logits_fn)(params)
            jax.block_until_ready(out)
            emit(case=tag, mode="fwd_traj", ok=True,
                 s=round(time.perf_counter() - t0, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, mode="fwd_traj",
                 error=f"{type(e).__name__}: {e}"[:250])
            continue
        # 2) full grad
        try:
            def loss(p):
                lo = logits_fn(p).astype(jnp.float32)
                return jnp.mean(jnp.maximum(lo, 0) - lo * labels
                                + jnp.log1p(jnp.exp(-jnp.abs(lo))))
            t0 = time.perf_counter()
            gr = jax.jit(jax.grad(loss))(params)
            jax.block_until_ready(gr)
            emit(case=tag, mode="full_grad", ok=True,
                 s=round(time.perf_counter() - t0, 1))
        except Exception as e:  # noqa: BLE001
            emit(case=tag, mode="full_grad",
                 error=f"{type(e).__name__}: {e}"[:250])


if __name__ == "__main__":
    main()
