"""Device-mesh construction helpers.

The reference's execution substrate is a CPU thread pool with optional core
pinning (multi_thread_executor.h:126-167). The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the factor axis: correspondences/factors are
partitioned across devices and the tiny (H, g, cost) partials are reduced
with ``psum`` over ICI (SURVEY section 2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

FACTOR_AXIS = "factors"


def make_factor_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    """1-D mesh over the factor (data) axis.

    This plays the role of ``MultiThreadExecutor(num_threads)``
    (multi_thread_executor.h:51-56): instead of spawning worker threads we
    lay devices out on a named axis and let XLA place the collectives.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return jax.sharding.Mesh(np.asarray(devices), (FACTOR_AXIS,))


def factor_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Sharding that splits axis 0 (the factor axis) across the mesh."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(FACTOR_AXIS)
    )
