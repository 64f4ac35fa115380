"""Utils: prefetcher semantics, fd redirector, metrics logger, system info."""
import json
import os
import time

import numpy as np
import pytest

from tsp_gnn_tpu.data.pipeline import prefetch
from tsp_gnn_tpu.utils.metrics import MetricsLogger
from tsp_gnn_tpu.utils.redirect import capture_fd, redirect_fd
from tsp_gnn_tpu.utils.system import memory_usage, timestamp


def test_prefetch_order_and_exhaustion():
    out = list(prefetch(iter(range(20)), depth=3))
    assert out == list(range(20))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")
    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)
        next(it)


def test_prefetch_overlaps_producer():
    """Producer works while consumer sleeps: total < serial time."""
    def gen():
        for _ in range(4):
            time.sleep(0.05)
            yield 1
    t0 = time.time()
    for _ in prefetch(gen(), depth=2):
        time.sleep(0.05)
    assert time.time() - t0 < 0.38  # serial would be ~0.4


def test_redirect_fd_silences_c_level(tmp_path, capfd):
    with redirect_fd(1, os.devnull):
        os.write(1, b"should not appear\n")
    out, _ = capfd.readouterr()
    assert "should not appear" not in out


def test_capture_fd():
    with capture_fd(1) as get:
        os.write(1, b"captured!")
    assert "captured!" in get()


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path, mirror_stdout=False)
    lg.log(step=1, loss=0.5)
    lg.log(step=2, loss=np.float32(0.25))
    lg.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["step"] == 1 and rows[1]["loss"] == 0.25
    assert "wall_s" in rows[0]


def test_system_helpers():
    assert len(timestamp()) == 19
    mu = memory_usage()
    assert mu["peak_rss_mb"] > 0


def test_run_with_restart_retries_then_succeeds():
    from tsp_gnn_tpu.parallel.launcher import run_with_restart
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert run_with_restart(flaky, max_restarts=3, backoff_s=0.01) == "ok"
    assert calls["n"] == 3


def test_run_with_restart_gives_up():
    from tsp_gnn_tpu.parallel.launcher import run_with_restart
    import pytest as _pytest

    def always_fails():
        raise RuntimeError("permanent")

    with _pytest.raises(RuntimeError, match="permanent"):
        run_with_restart(always_fails, max_restarts=2, backoff_s=0.01)


def test_launcher_initialize_single_process():
    from tsp_gnn_tpu.parallel.launcher import initialize
    topo = initialize()
    assert topo["process_count"] == 1
    assert topo["local_devices"] >= 1


def test_find_best_checkpoint(tmp_path):
    from tsp_gnn_tpu.utils.checkpoint import find_best_checkpoint, save_checkpoint
    log = tmp_path / "run"
    (log / "checkpoints").mkdir(parents=True)
    for e in (0, 1, 2):
        save_checkpoint(str(log / "checkpoints" / f"ckpt_{e}.pkl"),
                        {"epoch": e})
    rows = [{"event": "epoch", "epoch": 0, "eval_acc": 0.6},
            {"event": "epoch", "epoch": 1, "eval_acc": 0.9},
            {"event": "epoch", "epoch": 2, "eval_acc": 0.7}]
    import json as _json
    (log / "metrics.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows))
    assert find_best_checkpoint(str(log)).endswith("ckpt_1.pkl")


def test_launcher_single_host_hostnames_env(monkeypatch):
    """Cloud TPU VMs set TPU_WORKER_HOSTNAMES even on single-host slices;
    its mere presence must not trigger jax.distributed.initialize() after
    the backend is live (the round-1 in-suite failure)."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    from tsp_gnn_tpu.parallel.launcher import initialize
    topo = initialize()
    assert topo["process_count"] == 1


def test_launcher_ordering_error(monkeypatch):
    """A genuinely multi-host env var set AFTER backend init must raise the
    clear ordering error, not abort deep inside jax.distributed."""
    import jax
    jax.devices()  # ensure a backend exists
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    from tsp_gnn_tpu.parallel.launcher import initialize
    with pytest.raises(RuntimeError, match="before any JAX backend"):
        initialize()


def test_launcher_auto_init_subprocess():
    """Fresh interpreter: initialize() before any backend touch succeeds
    with single-host auto-detection, then jax comes up normally."""
    import subprocess
    import sys
    code = (
        "from tsp_gnn_tpu.parallel import launcher\n"
        "t = launcher.initialize()\n"
        "assert t['process_count'] == 1, t\n"
        "import jax\n"
        "assert jax.device_count() >= 1\n"
        "print('LAUNCHER_OK')\n"
    )
    env = dict(os.environ, TPU_WORKER_HOSTNAMES="localhost",
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=180, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert "LAUNCHER_OK" in r.stdout, r.stderr[-2000:]


# ------------------------- checkpoint format v2 (round 4: no pickle saves)

def test_checkpoint_npz_template_roundtrip(tmp_path):
    """Template restore rebuilds optax NamedTuple states usable by update."""
    import jax
    import jax.numpy as jnp
    import optax
    from tsp_gnn_tpu.utils import checkpoint as ckpt

    params = {"w": jnp.ones((4, 4)), "layers": [
        {"k": jnp.arange(3.0)}, {"k": jnp.zeros(2)}]}
    opt = optax.adam(1e-3)
    opt_state = opt.update(jax.tree.map(jnp.ones_like, params),
                           opt.init(params), params)[1]
    state = {"params": params, "opt_state": opt_state, "epoch": 7,
             "step": 900, "seed": 3,
             "curriculum": {"cur_n_min": 20, "cur_n_max": 40,
                            "cur_deviation": 0.02}}
    path = str(tmp_path / "ckpt_7.npz")
    ckpt.save_checkpoint(path, state)
    # the file is a zip archive, not a pickle
    assert open(path, "rb").read(2) == b"PK"
    like = {"params": params, "opt_state": opt.init(params), "epoch": 0,
            "step": 0, "seed": 0,
            "curriculum": {"cur_n_min": 0, "cur_n_max": 0,
                           "cur_deviation": 0.0}}
    got = ckpt.load_checkpoint(path, like=like)
    assert int(got["epoch"]) == 7 and int(got["step"]) == 900
    # restored opt_state is structurally an optax state again
    chex_tree = jax.tree.map(np.asarray, got["opt_state"])
    assert type(chex_tree) is type(opt_state)
    upd, _ = opt.update(jax.tree.map(jnp.ones_like, params),
                        jax.tree.map(jnp.asarray, got["opt_state"]), params)
    assert np.isfinite(np.asarray(jax.tree.leaves(upd)[0])).all()
    # restored curriculum values survive
    assert float(got["curriculum"]["cur_deviation"]) == 0.02


def test_checkpoint_npz_generic_restore(tmp_path):
    """Template-free restore (evaluate.py path) rebuilds dicts and lists."""
    import jax.numpy as jnp
    from tsp_gnn_tpu.utils import checkpoint as ckpt

    params = {"mlp": [{"W": jnp.ones((2, 2)), "b": jnp.zeros(2)},
                      {"W": jnp.full((2, 2), 3.0), "b": jnp.ones(2)}],
              "v_init": jnp.arange(4.0)}
    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(path, {"params": params, "epoch": 1})
    got = ckpt.load_checkpoint(path)
    assert isinstance(got["params"], dict)
    assert isinstance(got["params"]["mlp"], list) and len(
        got["params"]["mlp"]) == 2
    np.testing.assert_array_equal(got["params"]["mlp"][1]["W"],
                                  np.full((2, 2), 3.0))
    np.testing.assert_array_equal(got["params"]["v_init"], np.arange(4.0))


def test_checkpoint_pickle_backcompat(tmp_path):
    """Pre-round-4 pickle checkpoints still load (with or without like)."""
    import pickle
    from tsp_gnn_tpu.utils import checkpoint as ckpt

    state = {"params": {"w": np.ones(3)}, "epoch": 4}
    path = str(tmp_path / "ckpt_4.pkl")
    with open(path, "wb") as f:
        pickle.dump(state, f)
    got = ckpt.load_checkpoint(path, like={"params": {"w": 0}, "epoch": 0})
    assert got["epoch"] == 4
    np.testing.assert_array_equal(got["params"]["w"], np.ones(3))


def test_checkpoint_mixed_extensions(tmp_path):
    """latest/prune see .pkl (old) and .npz (new) in one directory."""
    from tsp_gnn_tpu.utils import checkpoint as ckpt

    for e, ext in ((0, "pkl"), (1, "pkl"), (2, "npz"), (3, "npz")):
        (tmp_path / f"ckpt_{e}.{ext}").write_bytes(b"x")
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("ckpt_3.npz")
    removed = ckpt.prune_checkpoints(str(tmp_path), keep_last=2,
                                     keep_epochs=(0,))
    assert removed == 1                    # epoch 1 pruned, 0 kept, 2-3 kept
    assert sorted(os.listdir(tmp_path)) == ["ckpt_0.pkl", "ckpt_2.npz",
                                            "ckpt_3.npz"]


def test_checkpoint_template_mismatch_raises(tmp_path):
    from tsp_gnn_tpu.utils import checkpoint as ckpt

    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(path, {"a": np.ones(2)})
    with pytest.raises(KeyError):
        ckpt.load_checkpoint(path, like={"b": np.ones(2)})
