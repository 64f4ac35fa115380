"""Checkpoint / resume.

Parity target: the reference's util.py save_weights/load_weights
(tf.train.Saver per epoch) [SURVEY §5 "Checkpoint"].  TPU-native build:
orbax-backed save of (params, opt_state, step, data key, curriculum state);
msgpack-free fallback via numpy .npz when orbax is unavailable.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any]) -> str:
    """state: arbitrary pytree dict (params, opt_state, step, rng, ...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(state), f, protocol=4)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint_orbax(path: str, state: Dict[str, Any]) -> str:
    """Orbax backend — sharded/multi-host-safe saves (each host writes its
    shards; pickle stays the default for single-host runs)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint_orbax(path: str, like: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like) if like is not None else ckptr.restore(path)


def find_best_checkpoint(log_dir: str, metric: str = "eval_acc",
                         prefix: str = "ckpt_") -> Optional[str]:
    """Pick the checkpoint of the best-`metric` epoch from metrics.jsonl
    (falls back to the latest when metrics are missing)."""
    import json
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(metrics_path):
        return latest_checkpoint(ckpt_dir, prefix)
    best_epoch, best_val = None, -float("inf")
    with open(metrics_path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("event") == "epoch" and metric in row:
                path = os.path.join(ckpt_dir,
                                    f"{prefix}{int(row['epoch'])}.pkl")
                if row[metric] >= best_val and os.path.exists(path):
                    best_epoch, best_val = int(row["epoch"]), row[metric]
    if best_epoch is None:
        return latest_checkpoint(ckpt_dir, prefix)
    return os.path.join(ckpt_dir, f"{prefix}{best_epoch}.pkl")


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    cands = [f for f in os.listdir(directory)
             if f.startswith(prefix) and f.endswith(".pkl")]
    if not cands:
        return None
    step = lambda f: int(f[len(prefix):-4])
    return os.path.join(directory, max(cands, key=step))


def prune_checkpoints(directory: str, keep_last: int,
                      keep_epochs: Tuple[int, ...] = (),
                      prefix: str = "ckpt_") -> int:
    """Delete all but the `keep_last` newest checkpoints (by epoch number)
    and any epoch listed in `keep_epochs` (e.g. the best-eval epoch).
    Returns the number of files removed.  keep_last <= 0 keeps everything
    (the reference's Saver kept every epoch [SURVEY §5 Checkpoint])."""
    if keep_last <= 0 or not os.path.isdir(directory):
        return 0
    step = lambda f: int(f[len(prefix):-4])
    cands = sorted((f for f in os.listdir(directory)
                    if f.startswith(prefix) and f.endswith(".pkl")), key=step)
    keep = set(int(e) for e in keep_epochs)
    keep.update(step(f) for f in cands[-keep_last:])
    removed = 0
    for f in cands:
        if step(f) not in keep:
            os.unlink(os.path.join(directory, f))
            removed += 1
    return removed
