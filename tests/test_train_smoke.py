"""End-to-end smoke test = PR1 config [B:L7] (SURVEY §4.5): train a small
model for a few steps on CPU; loss must decrease and accuracy must beat
chance on held-out data.  Also covers checkpoint save/resume."""
import dataclasses
import os

import jax
import jax.flatten_util
import numpy as np
import pytest

from tsp_gnn_tpu import train as tr
from tsp_gnn_tpu.config import get_config
from tsp_gnn_tpu.data import generator
from tsp_gnn_tpu.data.loader import make_dense_batch
from tsp_gnn_tpu.models import tsp
from tsp_gnn_tpu.utils import checkpoint as ckpt


def small_cfg():
    cfg = get_config("pr1")
    # shrink for CI speed: d=32, tmax=8, n=10; dev=0.3 lifts off in ~1 epoch
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, d=32, tmax=8),
        data=dataclasses.replace(cfg.data, n_min=10, n_max=10, pad_n=10,
                                 batch_size=32, deviation=0.30),
        train=dataclasses.replace(cfg.train, lr=1e-3, batches_per_epoch=16),
    )
    return cfg


def test_loss_decreases_and_beats_chance(tmp_path):
    cfg = small_cfg()
    out = tr.train(cfg, epochs=3, seed=0, log_dir=str(tmp_path),
                   eval_instances=32)
    m = out["metrics"]
    assert np.isfinite(m["train_loss"])
    assert m["train_loss"] < 0.67, f"loss did not decrease: {m['train_loss']}"
    # at 30% deviation a couple of epochs must separate YES/NO clearly
    assert m["eval_acc"] > 0.7, f"eval acc {m['eval_acc']} not above chance"
    # metrics file written
    assert os.path.exists(tmp_path / "metrics.jsonl")


def test_checkpoint_resume(tmp_path):
    cfg = small_cfg()
    tr.train(cfg, epochs=2, seed=1, log_dir=str(tmp_path), eval_instances=8)
    latest = ckpt.latest_checkpoint(str(tmp_path / "checkpoints"))
    assert latest and latest.endswith("ckpt_1.npz")
    # resume continues to epoch 3 without re-running 0..1
    out = tr.train(cfg, epochs=3, seed=1, log_dir=str(tmp_path),
                   eval_instances=8)
    assert out["metrics"]["epoch"] == 2
    state = ckpt.load_checkpoint(
        ckpt.latest_checkpoint(str(tmp_path / "checkpoints")))
    assert state["epoch"] == 2


def test_checkpoint_pruning(tmp_path):
    """keep_checkpoints=2 retains the 2 newest epochs plus the best-eval
    epoch; pruning also respects the recovered best across a resume."""
    cfg = small_cfg()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                keep_checkpoints=2))
    tr.train(cfg, epochs=4, seed=2, log_dir=str(tmp_path), eval_instances=8)
    cdir = tmp_path / "checkpoints"
    kept = sorted(os.listdir(cdir))
    assert len(kept) <= 3, kept           # 2 newest + possibly older best
    assert "ckpt_3.npz" in kept
    best = ckpt.find_best_checkpoint(str(tmp_path))
    assert best is not None and os.path.exists(best)
    # resume two more epochs: pruning continues, best still present
    tr.train(cfg, epochs=6, seed=2, log_dir=str(tmp_path), eval_instances=8)
    kept = sorted(os.listdir(cdir))
    assert len(kept) <= 3, kept
    assert "ckpt_5.npz" in kept
    best = ckpt.find_best_checkpoint(str(tmp_path))
    assert best is not None and os.path.exists(best)


def test_prune_checkpoints_unit(tmp_path):
    for e in range(6):
        (tmp_path / f"ckpt_{e}.pkl").write_bytes(b"x")
    removed = ckpt.prune_checkpoints(str(tmp_path), keep_last=2,
                                     keep_epochs=(1,))
    assert removed == 3
    assert sorted(os.listdir(tmp_path)) == ["ckpt_1.pkl", "ckpt_4.pkl",
                                            "ckpt_5.pkl"]
    # keep_last=0 keeps everything
    assert ckpt.prune_checkpoints(str(tmp_path), keep_last=0) == 0


def test_train_step_jit_stable():
    """Two train steps with the same donated buffers run without error and
    change the params."""
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(rng, 12) for _ in range(4)]
    batch = tr.device_batch(make_dense_batch(insts, 0.1, 12))
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt_state = tr.make_optimizer(cfg).init(params)
    p0 = np.asarray(params["v_init"]).copy()
    params, opt_state, m1 = tr.train_step(params, opt_state, batch, cfg)
    params, opt_state, m2 = tr.train_step(params, opt_state, batch, cfg)
    assert np.isfinite(float(m2["loss"]))
    assert not np.allclose(np.asarray(params["v_init"]), p0)


def test_accum_step_equals_big_batch():
    """K accumulated micro-batches == ONE optimizer step on the union batch
    (BASELINE configs[3] semantics via compile-safe shapes) [VERDICT r2 #3]."""
    cfg = small_cfg()
    rng = np.random.default_rng(3)
    d = cfg.data
    insts = [generator.generate_instance(rng, d.n_min)
             for _ in range(2 * d.batch_size)]
    big = make_dense_batch(insts, d.deviation, d.pad_n)
    micro = [make_dense_batch(insts[:d.batch_size], d.deviation, d.pad_n),
             make_dense_batch(insts[d.batch_size:], d.deviation, d.pad_n)]
    stacked = {k: np.stack([m[k] for m in micro]) for k in micro[0]}

    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    opt = tr.make_optimizer(cfg)

    p_big, _, m_big = tr.train_step(
        jax.tree.map(np.copy, params), opt.init(params),
        tr.device_batch(big), cfg)
    p_acc, _, m_acc = tr.train_accum_step(
        jax.tree.map(np.copy, params), opt.init(params),
        tr.device_batch({k: v for k, v in stacked.items()}), cfg)

    fb, _ = jax.flatten_util.ravel_pytree(p_big)
    fa, _ = jax.flatten_util.ravel_pytree(p_acc)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(float(m_acc["loss"]), float(m_big["loss"]),
                               rtol=1e-5)


def test_train_with_accum_runs(tmp_path):
    """train() dispatches accumulated steps (one optimizer step per accum
    group) and still learns at easy deviation."""
    cfg = small_cfg()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum=4))
    out = tr.train(cfg, epochs=2, seed=0, log_dir=str(tmp_path),
                   eval_instances=16)
    assert np.isfinite(out["metrics"]["train_loss"])
    # 16 micro-batches/epoch at accum 4 -> 4 optimizer steps per epoch
    assert out["metrics"]["step"] == 8


def test_finite_generated_stream_restarts(tmp_path, monkeypatch):
    """A generated (non-file) stream that exhausts mid-epoch restarts via
    fresh_stream instead of raising NameError [VERDICT r3 weak #4]."""
    import itertools
    cfg = small_cfg()
    real = tr.batch_stream

    def finite_stream(cfg_, seed, curriculum=None, epoch=0):
        return itertools.islice(real(cfg_, seed, curriculum, epoch), 3)

    monkeypatch.setattr(tr, "batch_stream", finite_stream)
    out = tr.train(cfg, epochs=1, seed=3, log_dir=str(tmp_path),
                   eval_instances=8)
    assert np.isfinite(out["metrics"]["train_loss"])


def test_nan_halt_event(tmp_path, monkeypatch):
    """A poisoned batch must trigger the NaN sanitizer: a `nan_halt` metrics
    event plus a fail-stop FloatingPointError [SURVEY §5, VERDICT r3 #6]."""
    import json
    cfg = small_cfg()
    real = tr.batch_stream

    def poisoned(cfg_, seed, curriculum=None, epoch=0):
        for b in real(cfg_, seed, curriculum, epoch):
            b = dict(b)
            b["W"] = np.full_like(b["W"], np.nan)
            yield b

    monkeypatch.setattr(tr, "batch_stream", poisoned)
    with pytest.raises(FloatingPointError):
        tr.train(cfg, epochs=1, seed=4, log_dir=str(tmp_path),
                 eval_instances=8)
    rows = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert any(r.get("event") == "nan_halt" for r in rows)


def test_pad_invariance():
    """Dense-path logits must not depend on pad_n — the size-bucketed
    batching contract: the same instances padded to 12 vs 20 vertices give
    the same logits (masked padding is inert end to end)."""
    import jax.numpy as jnp
    cfg = get_config("pr1")
    mcfg = dataclasses.replace(cfg.model, d=16, tmax=4)
    rng = np.random.default_rng(0)
    insts = [generator.generate_instance(rng, 12, "two_opt", 1)
             for _ in range(3)]
    params = tsp.tsp_init(jax.random.PRNGKey(0), mcfg)
    logits = []
    for pad in (12, 20):
        b = make_dense_batch(insts, 0.02, pad)
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        logits.append(np.asarray(tsp.forward(params, jb, mcfg)))
    np.testing.assert_allclose(logits[0], logits[1], rtol=1e-5, atol=1e-6)


def test_bucketize_unit():
    insts = [{"n": n} for n in (8, 12, 9, 10, 11, 12, 8, 10)]
    got = list(tr.bucketize(iter(insts), 2, (10, 12)))
    # batches fill per bucket in arrival order; the trailing incomplete
    # buckets (one 12, one 10) stay pending
    assert [(pad, [i["n"] for i in b]) for pad, b in got] == [
        (10, [8, 9]), (12, [12, 11]), (10, [10, 8])]


def test_bucketed_training_runs(tmp_path):
    """Bucketed batches (mixed shapes) train through the shape-grouped
    chunk dispatch; loss stays finite and metrics are written."""
    cfg = small_cfg()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, n_min=8, n_max=12, pad_n=12,
                                 bucket_pads=(10, 12), batch_size=8),
        train=dataclasses.replace(cfg.train, batches_per_epoch=8),
    )
    out = tr.train(cfg, epochs=2, seed=0, log_dir=str(tmp_path),
                   eval_instances=8, chunk=2)
    assert np.isfinite(out["metrics"]["train_loss"])
    assert os.path.exists(tmp_path / "metrics.jsonl")


def test_n40_preset_buckets_cover_range():
    """The flagship preset's default bucket set must tile its n range:
    largest bucket >= n_max (bucketize asserts per instance) and every n
    in [n_min, n_max] maps to some bucket with pad >= n."""
    from tsp_gnn_tpu.config import get_config
    cfg = get_config("n40")
    pads = cfg.data.bucket_pads
    assert pads == tuple(sorted(pads))
    assert pads[-1] >= cfg.data.n_max
    for n in range(cfg.data.n_min, cfg.data.n_max + 1):
        assert any(p >= n for p in pads)


def test_bucketize_preserves_instances():
    """Every instance ends up in exactly one batch of its bucket (modulo
    trailing incomplete batches), padded to the smallest sufficient pad."""
    insts = [{"n": n} for n in (20, 37, 24, 25, 40, 33, 28, 34)]
    out = list(tr.bucketize(iter(insts), 2, (24, 28, 34, 40)))
    seen = []
    for pad, chunk in out:
        assert len(chunk) == 2
        for inst in chunk:
            assert inst["n"] <= pad
            # smallest sufficient bucket
            assert all(p < inst["n"] for p in (24, 28, 34, 40) if p < pad)
            seen.append(inst["n"])
    assert sorted(seen) == [20, 24, 25, 28, 33, 34, 37, 40]
