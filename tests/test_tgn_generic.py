"""The typed-GNN engine is generic (reference graphnn.py was a library used
by several models in the machine-reasoning-ufrgs org): build a 3-type
heterogeneous spec unlike decision-TSP and check mechanics + oracle parity
of a hand-computed iteration."""
import jax
import jax.numpy as jnp
import numpy as np

from tsp_gnn_tpu.models import cells, mlp
from tsp_gnn_tpu.models.tgn import TGNSpec, tgn_init, tgn_run, tgn_step


def _spec():
    # clause/literal/var tri-partite graph (NeuroSAT-ish shape)
    return TGNSpec(
        var={"C": 8, "L": 6, "V": 4},
        mat={"CL": ("C", "L"), "LV": ("L", "V"), "Wc": ("C", 1)},
        msg={"L2C": ("L", "C"), "C2L": ("C", "L"), "V2L": ("V", "L"),
             "L2V": ("L", "V")},
        loop={
            "C": ({"mat": "CL", "msg": "L2C", "var": "L"},
                  {"mat": "Wc"}),
            "L": ({"mat": "CL", "msg": "C2L", "var": "C", "transpose": True},
                  {"mat": "LV", "msg": "V2L", "var": "V"}),
            "V": ({"mat": "LV", "msg": "L2V", "var": "L", "transpose": True},),
        },
        mlp_depth=2,
    )


def test_cell_input_dims():
    spec = _spec()
    assert spec.cell_input_dim("C") == 8 + 1      # msg (target dim) + raw col
    assert spec.cell_input_dim("L") == 6 + 6
    assert spec.cell_input_dim("V") == 4


def test_generic_engine_runs_and_matches_manual_step():
    spec = _spec()
    key = jax.random.PRNGKey(0)
    params = tgn_init(key, spec)
    B, nC, nL, nV = 2, 5, 7, 3
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    CL = (jax.random.uniform(k1, (B, nC, nL)) > 0.5).astype(jnp.float32)
    LV = (jax.random.uniform(k2, (B, nL, nV)) > 0.5).astype(jnp.float32)
    Wc = jax.random.normal(k3, (B, nC, 1))
    states = {
        "C": (jnp.zeros((B, nC, 8)), jax.random.normal(k4, (B, nC, 8))),
        "L": (jnp.zeros((B, nL, 6)), jax.random.normal(k5, (B, nL, 6))),
        "V": (jnp.zeros((B, nV, 4)), jnp.ones((B, nV, 4))),
    }
    mats = {"CL": CL, "LV": LV, "Wc": Wc}
    new = tgn_step(params, spec, mats, states)
    for t, d in spec.var.items():
        assert new[t][1].shape == states[t][1].shape

    # manual recomputation of the C update (Jacobi: uses OLD h_L)
    msg_l2c = mlp.mlp_apply(params["msgs"]["L2C"], states["L"][1])
    agg = jnp.einsum("bcl,bld->bcd", CL, msg_l2c)
    cell_in = jnp.concatenate([agg, Wc], -1)
    _, (want_c, want_h) = cells.lstm_apply(
        params["cells"]["C"], cell_in, states["C"])
    np.testing.assert_allclose(np.asarray(new["C"][1]), np.asarray(want_h),
                               rtol=1e-5, atol=1e-6)

    # multi-iteration run terminates and stays finite
    final, traj = tgn_run(params, spec, mats, states, tmax=7,
                          return_trajectory=True)
    assert traj["C"].shape == (7, B, nC, 8)
    assert np.isfinite(np.asarray(final["L"][1])).all()
