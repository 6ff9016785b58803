"""Device-mesh utilities (SURVEY.md §2.13/§5.8).

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate params, scatter batch). The TPU-native equivalent is an ICI mesh
with sharding annotations: params replicated (or later sharded), batch split
over the ``data`` axis, gradients all-reduced by XLA-inserted ``psum`` over
ICI. A second ``spatial`` axis supports the conv analogue of sequence/context
parallelism for large-image inference (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharding", "P"]


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    spatial: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices (data {data} x spatial {spatial}) but "
            f"only {len(devices)} are visible — shrink the shard counts or "
            "add devices (CPU: XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    devices = devices[:n]
    data = data or (n // spatial)
    if data < 1 or data * spatial != n:
        raise ValueError(f"data({data}) x spatial({spatial}) != devices({n})")
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the ``data`` mesh axis."""
    return NamedSharding(mesh, P(axis))
