from tsp_gnn_tpu.models import cells, mlp, oracle, tgn, tsp  # noqa: F401
