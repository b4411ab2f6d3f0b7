"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY section 2.8: its only
"communication" is std::future hand-off between threads). The TPU-native
scale-out story is:

  1. every host calls :func:`initialize` (jax.distributed under the hood;
     coordinator/process env-vars follow the standard JAX/TPU conventions
     and are auto-discovered on Cloud TPU pods);
  2. build one global factor mesh over ALL devices
     (:func:`make_global_factor_mesh`);
  3. hand the mesh to any solver/registrar — the factor axis shards
     across every chip, the (H, g, cost) psum rides ICI within a slice
     and DCN across hosts, and the LM control flow stays replicated.

Nothing else in the framework is multi-host-aware by design: the mesh IS
the abstraction (the scaling-book recipe — pick a mesh, annotate
shardings, let XLA place collectives).

Failure handling: :func:`initialize` retries transient coordinator
connection errors (the standard JAX multi-host race at pod bring-up);
there is no elastic recovery, matching the reference's none (SURVEY
section 5).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from .mesh import FACTOR_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    retries: int = 3,
    retry_delay_s: float = 5.0,
) -> None:
    """jax.distributed.initialize with retry; no-ops when single-process.

    All arguments default to auto-discovery (JAX_COORDINATOR_ADDRESS /
    cloud TPU metadata). Call once per host before any device use.
    """
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if num_processes == 1:
        return
    last = None
    for attempt in range(retries):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            return
        except (RuntimeError, ValueError) as e:  # pragma: no cover - multi-host only
            last = e
            time.sleep(retry_delay_s * (attempt + 1))
    raise RuntimeError(f"jax.distributed.initialize failed after {retries} tries: {last}")


def make_global_factor_mesh() -> jax.sharding.Mesh:
    """1-D factor mesh over every device of every host."""
    return jax.sharding.Mesh(np.asarray(jax.devices()), (FACTOR_AXIS,))


def process_info() -> dict:
    """Host/process placement summary for logs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
