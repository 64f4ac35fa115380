from tsp_gnn_tpu.data import fileio, generator, loader, solver  # noqa: F401
