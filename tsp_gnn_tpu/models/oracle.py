"""NumPy oracle: slow, obviously-correct re-derivation of the reference model.

The reference mount is empty (SURVEY.md §0), so the BASELINE.json contract
"reference-matching per-layer embeddings (allclose)" is implemented against
THIS module: a dependency-free NumPy transcription of the published equations
(AAAI-19 decision-TSP, SURVEY §2.3/§2.4), written deliberately differently
from the JAX path (explicit Python loops, per-instance block-diagonal
assembly, no vectorised batching) so the two implementations cross-check.

It consumes the exact same parameter pytree as `models/tsp.py` (converted to
NumPy), runs unpadded per-instance graphs, and returns per-iteration
embeddings for every type — the allclose surface.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def _act(name: str):
    if name == "relu":
        return lambda x: np.maximum(x, 0.0)
    if name == "tanh":
        return np.tanh
    raise ValueError(name)


def _sigmoid(x):
    return 0.5 * (np.tanh(0.5 * x) + 1.0)


def np_mlp(params: Sequence[dict], x: np.ndarray, hidden_act="relu") -> np.ndarray:
    act = _act(hidden_act)
    for i, layer in enumerate(params):
        x = x @ np.asarray(layer["w"]) + np.asarray(layer["b"])
        if i < len(params) - 1:
            x = act(x)
    return x


def np_layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray,
                  eps: float = 1e-12) -> np.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(g) + np.asarray(b)


def np_lstm_step(params: dict, inputs: np.ndarray, c: np.ndarray,
                 h: np.ndarray, activation="relu", forget_bias=1.0,
                 ln_eps=1e-12) -> Tuple[np.ndarray, np.ndarray]:
    """TF1 LayerNormBasicLSTMCell semantics (see models/cells.py docstring)."""
    act = _act(activation)
    z = np.concatenate([inputs, h], axis=-1) @ np.asarray(params["kernel"])
    hdim = h.shape[-1]
    gates = [z[..., k * hdim:(k + 1) * hdim] for k in range(4)]
    names = ["i", "j", "f", "o"]
    normed = {}
    for name, gate in zip(names, gates):
        ln = params[f"ln_{name}"]
        normed[name] = np_layer_norm(gate, ln["g"], ln["b"], ln_eps)
    new_c = (c * _sigmoid(normed["f"] + forget_bias)
             + _sigmoid(normed["i"]) * act(normed["j"]))
    lnc = params["ln_c"]
    ln_new_c = np_layer_norm(new_c, lnc["g"], lnc["b"], ln_eps)
    new_h = act(ln_new_c) * _sigmoid(normed["o"])
    return new_c, new_h


def np_incidence(n: int) -> np.ndarray:
    """[m, n] incidence of K_n; independent derivation (nested loops)."""
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)]
    ev = np.zeros((len(edges), n))
    for e, (u, v) in enumerate(edges):
        ev[e, u] = 1.0
        ev[e, v] = 1.0
    return ev


def oracle_forward(
    params,
    instances: List[Dict[str, np.ndarray]],
    tmax: int,
    cell_activation: str = "relu",
    msg_activation: str = "relu",
    feed_wc_each_step: bool = False,
    edge_gating: bool = False,
    forget_bias: float = 1.0,
    ln_eps: float = 1e-12,
    dtype=np.float64,
):
    """Run the decision-TSP network per instance (no padding, no batching).

    instances: list of {"n": int, "W": [m], "C": [m]} in canonical edge order.
    Returns (logits [B], trajectory: list over t of {"V": [h...], "E": [h...]}
    where each entry is a list of per-instance h arrays).
    """
    to = lambda a: np.asarray(a, dtype)
    params = _tree_cast(params, dtype)
    gnn = params["gnn"]
    logits = []
    traj = [{"V": [], "E": []} for _ in range(tmax)]
    for inst in instances:
        n = int(inst["n"])
        W = to(inst["W"]).reshape(-1, 1)
        C = to(inst["C"]).reshape(-1, 1)
        m = W.shape[0]
        EV = np_incidence(n).astype(dtype)
        d = np.asarray(params["v_init"]).shape[0]
        h_v = np.tile(to(params["v_init"])[None, :], (n, 1))
        c_v = np.zeros((n, d), dtype)
        # e_init and vote MLPs use relu hidden layers unconditionally in
        # the fast paths (mlp_apply default); msg_activation applies only to
        # the message MLPs.
        h_e = np_mlp(params["e_init"], np.concatenate([W, C], axis=1))
        c_e = np.zeros((m, d), dtype)
        for t in range(tmax):
            # messages computed from the PREVIOUS iteration's h (Jacobi)
            msg_v = np_mlp(gnn["msgs"]["V_msg_E"], h_v, msg_activation)
            msg_e = np_mlp(gnn["msgs"]["E_msg_V"], h_e, msg_activation)
            agg_e = EV @ msg_v          # E <- sum of endpoint vertex messages
            agg_v = EV.T @ msg_e        # V <- sum over incident edges
            e_cols = [agg_e]
            if feed_wc_each_step:
                e_cols += [W, C]
            if edge_gating:
                # SDDMM gate: per-edge <h_src, h_tgt> from PREVIOUS h_v
                edges = [(u, v) for u in range(n) for v in range(u + 1, n)]
                gate = np.asarray([h_v[u] @ h_v[v] for u, v in edges],
                                  dtype).reshape(-1, 1)
                e_cols.append(gate)
            e_in = (np.concatenate(e_cols, axis=1) if len(e_cols) > 1
                    else agg_e)
            c_v, h_v = np_lstm_step(gnn["cells"]["V"], agg_v, c_v, h_v,
                                    cell_activation, forget_bias, ln_eps)
            c_e, h_e = np_lstm_step(gnn["cells"]["E"], e_in, c_e, h_e,
                                    cell_activation, forget_bias, ln_eps)
            traj[t]["V"].append(h_v.copy())
            traj[t]["E"].append(h_e.copy())
        votes = np_mlp(params["vote"], h_e)[:, 0]
        logits.append(votes.mean())
    return np.asarray(logits), traj


def _tree_cast(tree, dtype):
    if isinstance(tree, dict):
        return {k: _tree_cast(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_tree_cast(v, dtype) for v in tree)
    return np.asarray(tree, dtype)
