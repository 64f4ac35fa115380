from tsp_gnn_tpu.utils import checkpoint, metrics, redirect  # noqa: F401
