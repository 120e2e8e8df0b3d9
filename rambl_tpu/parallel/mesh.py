"""Device mesh helpers (SURVEY.md section 3.5 init stack)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed():
    """Multi-host init; no-op single-process. Call before device queries."""
    if jax.process_count() > 1:  # pragma: no cover - needs real cluster
        return
    try:
        import os

        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
    except Exception:
        pass


def data_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the data axis (all visible devices by default)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (DATA_AXIS,), devices=np.asarray(devices))


def shard_spec(batch_dims: int = 1) -> P:
    """PartitionSpec sharding dim 0 over 'data', rest replicated."""
    return P(DATA_AXIS, *([None] * (batch_dims - 1))) if batch_dims else P()


def put_sharded(x, mesh: Mesh):
    """device_put with dim-0 'data' sharding."""
    spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def put_replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
