"""Device mesh and sharding helpers (GSPMD data parallelism).

The TPU-native replacement for the reference's process-per-GPU NCCL stack
(`codes/utils/dist_utils.py`, DDP wrapping in `base_model.py:130-136`):
a single-controller ``jax.sharding.Mesh`` with one ``dp`` axis. Training
batches are sharded over ``dp``; parameters are replicated. Because losses,
BatchNorm statistics and the adaptive-discriminator vote are all means over
the (globally sharded) batch, XLA inserts the psums over ICI automatically —
there is no explicit collective code to maintain.

Multi-host execution uses ``jax.distributed.initialize`` (call
``maybe_init_distributed`` before device queries) and the same mesh spanning
all processes' devices.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "get_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "maybe_init_distributed",
]


def maybe_init_distributed():
    """Initialise multi-host JAX if a coordinator address is configured.

    Must run before ANY backend query (`jax.devices()`, `jax.process_count()`,
    ...) — those initialise the local backend and poison multi-host setup.
    Reference analogue: `codes/utils/base_utils.py:51-75` + `dist_utils.py`
    (NCCL process-group formation at launch). Coordinates via the standard
    JAX env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or the platform's auto-detection.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:  # already initialised (idempotent call)
        if "already" not in str(e).lower():
            raise


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
