"""Evaluation sweeps + figures: structure, forward-path agreement, render."""
import dataclasses
import json

import jax
import numpy as np
import pytest

from tsp_gnn_tpu import evaluate, figures
from tsp_gnn_tpu.config import get_config
from tsp_gnn_tpu.models import tsp


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("pr1")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, d=16, tmax=4),
                      data=dataclasses.replace(cfg.data, n_min=9, n_max=11,
                                               pad_n=11))
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    return cfg, params


def test_deviation_sweep_structure(setup):
    cfg, params = setup
    rows = evaluate.deviation_sweep(params, cfg, [0.0, 0.3], n_instances=6)
    assert [r["deviation"] for r in rows] == [0.0, 0.3]
    assert all(0 <= r["accuracy"] <= 1 for r in rows)


@pytest.mark.parametrize("forward", ["sparse", "fused"])
def test_forward_paths_agree_with_dense(setup, forward):
    cfg, params = setup
    dense = evaluate.deviation_sweep(params, cfg, [0.3], n_instances=6,
                                     forward="dense")
    other = evaluate.deviation_sweep(params, cfg, [0.3], n_instances=6,
                                     forward=forward)
    assert dense[0]["accuracy"] == pytest.approx(other[0]["accuracy"])


def test_size_and_tmax_sweeps(setup):
    cfg, params = setup
    rows = evaluate.size_generalization_sweep(params, cfg, [9, 12],
                                              n_instances=4)
    assert [r["n"] for r in rows] == [9, 12]
    rows = evaluate.tmax_sweep(params, cfg, [2, 4], n_instances=4)
    assert [r["tmax"] for r in rows] == [2, 4]


def test_figures_render(tmp_path):
    rows = ([{"sweep": "deviation", "deviation": d, "accuracy": a}
             for d, a in [(0.0, 0.5), (0.02, 0.8), (0.1, 0.95)]]
            + [{"sweep": "size", "n": n, "accuracy": a}
               for n, a in [(20, 0.8), (40, 0.7)]]
            + [{"sweep": "tmax", "tmax": t, "accuracy": a}
               for t, a in [(16, 0.7), (32, 0.8)]])
    p = tmp_path / "sweeps.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    written = figures.make_figures(figures.load_rows(str(p)),
                                   str(tmp_path / "figs"))
    assert len(written) == 3
    import os
    assert all(os.path.getsize(w) > 1000 for w in written)


def test_multiset_aggregation(setup):
    """multiset wraps a sweep over disjoint sets -> mean/sem per point
    [VERDICT r2 #8]."""
    cfg, params = setup
    rows = evaluate.multiset(
        lambda seed, **kw: evaluate.deviation_sweep(params, cfg, seed=seed,
                                                    **kw),
        3, 11, deviations=[0.0, 0.3], n_instances=4)
    assert len(rows) == 2
    for r in rows:
        assert r["sets"] == 3 and len(r["set_accuracies"]) == 3
        assert abs(np.mean(r["set_accuracies"]) - r["accuracy"]) < 1e-9
        assert r["sem"] >= 0


@pytest.mark.parametrize("sweep", ["size", "tmax"])
def test_sparse_forward_in_size_tmax_sweeps(setup, sweep):
    """--forward sparse is plumbed through the size/tmax sweeps (the
    published protocol exercises the scaling path) [VERDICT r2 #8]."""
    cfg, params = setup
    if sweep == "size":
        dense = evaluate.size_generalization_sweep(
            params, cfg, [11], n_instances=4, tmax=3)
        sparse = evaluate.size_generalization_sweep(
            params, cfg, [11], n_instances=4, tmax=3, forward="sparse")
    else:
        dense = evaluate.tmax_sweep(params, cfg, [3], n_instances=4)
        sparse = evaluate.tmax_sweep(params, cfg, [3], n_instances=4,
                                     forward="sparse")
    assert sparse[0]["forward"] == "sparse"
    # same instances (same seed) -> identical accuracy across layouts
    assert abs(dense[0]["accuracy"] - sparse[0]["accuracy"]) < 1e-6


def test_cli_on_npz_checkpoint(tmp_path):
    """evaluate.main drives the v2 (.npz) checkpoint format end-to-end:
    template-free restore must hand forward() a working params tree."""
    from tsp_gnn_tpu.utils import checkpoint as ckpt

    cfg = get_config("pr1")
    params = tsp.tsp_init(jax.random.PRNGKey(0), cfg.model)
    path = str(tmp_path / "ckpt_0.npz")
    ckpt.save_checkpoint(path, {"params": params, "epoch": 0})
    out = str(tmp_path / "sweeps.jsonl")
    evaluate.main(["--checkpoint", path, "--preset", "pr1",
                   "--sweep", "deviation", "--instances", "4",
                   "--out", out])
    rows = [json.loads(l) for l in open(out) if l.strip()]
    assert rows and all(0.0 <= r["accuracy"] <= 1.0 for r in rows)


def test_training_curve_figure(tmp_path):
    rows = [{"event": "epoch", "epoch": e, "train_loss": 0.7 - 0.01 * e,
             "train_acc": 0.5 + 0.01 * e, "eval_loss": 0.7 - 0.01 * e,
             "eval_acc": 0.5 + 0.01 * e,
             "cur_deviation": 0.1 if e < 5 else 0.05}
            for e in range(10)]
    mpath = tmp_path / "metrics.jsonl"
    mpath.write_text("\n".join(json.dumps(r) for r in rows))
    written = figures.make_training_curve(str(mpath), str(tmp_path))
    import os
    assert written and os.path.exists(written[0])
