"""Device mesh construction and sharding helpers.

The reference has no distributed story at all (SURVEY.md §2.7: single
process, single GPU, no collectives); the TPU rebuild makes data parallelism
first-class: a 1-D ``Mesh("data")`` over the slice, batches sharded on the
leading axis, parameters replicated, gradients reduced with ``psum`` over
ICI.  The same code runs on a 1-chip dev box (1x1 mesh), an 8-device virtual
CPU mesh (tests), and a v5e-16 slice (BASELINE config 5) unchanged.

Multi-host: call :func:`maybe_initialize_distributed` first; the mesh then
spans all processes' devices and batch sharding is per-host automatic via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed() -> None:
    """jax.distributed init for multi-host slices, guarded behind env flags
    (no-op on single-host; SURVEY.md §7 step 8)."""
    if os.environ.get("XDET_MULTIHOST", "0") == "1":
        jax.distributed.initialize()


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        assert len(devices) >= num_devices, (
            f"need {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded on the leading axis.

    Single-host: a straight ``device_put`` with the batch sharding.
    Multi-host (``jax.process_count() > 1``): each host holds only its local
    slice of the global batch; ``make_array_from_process_local_data``
    assembles the logical global array without any cross-host copy (data
    stays on the host that loaded it — DCN only carries gradients).
    """
    sharding = batch_sharded(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, state):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), state)
