"""Device mesh construction: axes (data, graph).

data  — instance-level data parallelism (block-diagonal batches are
        embarrassingly parallel across instances, SURVEY §2.2).
graph — edge-partition of large instances with halo exchange (the sequence-
        parallel analogue, SURVEY §5 "Long-context").
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        assert len(devices) % graph == 0
        data = len(devices) // graph
    assert data * graph <= len(devices), (
        f"mesh {data}x{graph} needs {data * graph} devices, "
        f"have {len(devices)}")
    devs = np.asarray(devices[:data * graph]).reshape(data, graph)
    return Mesh(devs, ("data", "graph"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Dense batches shard the leading (problem) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
