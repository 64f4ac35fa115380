"""Training-step variant sweep — the profile-equivalent stage breakdown
[VERDICT r2 #1a/#1c].

Times, within ONE session (comparable era), the flagship n40 workload under:
  * forward-only vs full fwd+bwd+Adam  -> backward share;
  * remat on/off                       -> cost of the extra remat forward;
  * f32 vs bf16                        -> dtype sensitivity per stage;
  * batch 64 / 128 / 256 instances     -> dispatch/amortisation scaling.

Writes JSONL to results/step_sweep_r3.jsonl.  Every timing is a TRUE host
sync (np.asarray of a dependent leaf).  Run solo on the chip:

  timeout 7200 env PYTHONPATH=/root/repo python scripts/step_sweep.py
"""
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tsp_gnn_tpu import train as tr
    from tsp_gnn_tpu.config import get_config
    from tsp_gnn_tpu.data import generator
    from tsp_gnn_tpu.data.loader import make_dense_batch
    from tsp_gnn_tpu.models import tsp
    from tsp_gnn_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()
    out = open("results/step_sweep_r3.jsonl", "a")

    def emit(**kw):
        print(json.dumps(kw), flush=True)
        out.write(json.dumps(kw) + "\n")
        out.flush()

    base = get_config("n40")
    rng = np.random.default_rng(0)
    insts256 = [generator.generate_instance(
        rng, int(rng.integers(20, 41)), "two_opt", 1) for _ in range(256)]

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0])

    chunk = 8
    budget = float(os.environ.get("STEP_SWEEP_BUDGET_S", "420"))

    for batch_size in (64, 128, 256):
        batch = make_dense_batch(insts256[:batch_size], 0.02, 40)
        edges = int(batch["n_edges"].sum()) * base.model.tmax
        for bf16 in (False, True):
            for remat in (True, False):
                cfg = base.replace(
                    model=dataclasses.replace(base.model, remat=remat),
                    data=dataclasses.replace(base.data,
                                             batch_size=batch_size),
                    train=dataclasses.replace(base.train, bf16=bf16))
                tag = (f"b{batch_size}_{'bf16' if bf16 else 'f32'}"
                       f"_{'remat' if remat else 'noremat'}")
                # ---- full train step (chunked dispatch) ----
                try:
                    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
                    opt_state = tr.make_optimizer(cfg).init(params)
                    stacked = tr.device_batch(
                        {k: np.stack([v] * chunk) for k, v in batch.items()})
                    t0 = time.perf_counter()
                    params, opt_state, _ = tr.train_chunk(
                        params, opt_state, stacked, cfg)
                    sync(params)
                    warm = time.perf_counter() - t0
                    iters = 3 if warm < budget else 1
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        params, opt_state, _ = tr.train_chunk(
                            params, opt_state, stacked, cfg)
                        sync(params)
                    dt = (time.perf_counter() - t0) / iters / chunk
                    emit(kind="full_step", variant=tag, ms=dt * 1e3,
                         edges_per_s=edges / dt, warmup_s=round(warm, 1),
                         cache_hit=warm < 30)
                except Exception as e:  # noqa: BLE001
                    emit(kind="full_step", variant=tag, error=str(e)[:200])
                if remat:
                    continue  # forward-only is remat-independent
                # ---- forward-only (200-roundtrip chain amortises tunnel) --
                try:
                    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
                    jb = tr.device_batch(batch)

                    @functools.partial(jax.jit, static_argnames=("c",))
                    def fwd_chain(p, b, c):
                        def body(x, _):
                            # carry-dependent param scale defeats XLA's
                            # loop-invariant hoisting of the whole forward
                            ps = jax.tree.map(lambda w: w * (1 + x * 1e-20),
                                              p)
                            if c.train.bf16:
                                l, _ = tr._model_loss(tr._cast_bf16(ps),
                                                      tr._cast_bf16(b), c)
                            else:
                                l, _ = tr._model_loss(ps, b, c)
                            return x + l, None
                        s, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                            length=8)
                        return s
                    t0 = time.perf_counter()
                    r = fwd_chain(params, jb, cfg)
                    sync(r)
                    warm = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    iters = 3
                    for _ in range(iters):
                        r = fwd_chain(params, jb, cfg)
                        sync(r)
                    dt = (time.perf_counter() - t0) / iters / 8
                    emit(kind="forward_only", variant=tag, ms=dt * 1e3,
                         edges_per_s=edges / dt, warmup_s=round(warm, 1))
                except Exception as e:  # noqa: BLE001
                    emit(kind="forward_only", variant=tag,
                         error=str(e)[:200])

    # ---- scan-unroll probe: best-candidate shapes only ----
    for batch_size, bf16, remat, unroll in ((128, True, True, 4),
                                            (128, True, False, 4)):
        batch = make_dense_batch(insts256[:batch_size], 0.02, 40)
        edges = int(batch["n_edges"].sum()) * base.model.tmax
        cfg = base.replace(
            model=dataclasses.replace(base.model, remat=remat,
                                      scan_unroll=unroll),
            data=dataclasses.replace(base.data, batch_size=batch_size),
            train=dataclasses.replace(base.train, bf16=bf16))
        tag = (f"b{batch_size}_{'bf16' if bf16 else 'f32'}"
               f"_{'remat' if remat else 'noremat'}_unroll{unroll}")
        try:
            params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
            opt_state = tr.make_optimizer(cfg).init(params)
            stacked = tr.device_batch(
                {k: np.stack([v] * chunk) for k, v in batch.items()})
            t0 = time.perf_counter()
            params, opt_state, _ = tr.train_chunk(params, opt_state,
                                                  stacked, cfg)
            sync(params)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                params, opt_state, _ = tr.train_chunk(params, opt_state,
                                                      stacked, cfg)
                sync(params)
            dt = (time.perf_counter() - t0) / iters / chunk
            emit(kind="full_step", variant=tag, ms=dt * 1e3,
                 edges_per_s=edges / dt, warmup_s=round(warm, 1))
        except Exception as e:  # noqa: BLE001
            emit(kind="full_step", variant=tag, error=str(e)[:200])
    out.close()


if __name__ == "__main__":
    main()
