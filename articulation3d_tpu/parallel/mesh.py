"""Device mesh + sharding: the TPU-native replacement for detectron2 DDP.

The reference parallelizes with one-process-per-GPU NCCL data parallelism
(`tools/train_net.py:107-117`, d2 `launch`).  Here the whole program is SPMD:
a 1-D ``jax.sharding.Mesh`` over the ``data`` axis shards the batch (frames
for video inference, images for training) while parameters and optimizer
state are replicated; XLA inserts the gradient ``psum`` over ICI
automatically when the jitted train step's outputs are required replicated.

The model is small (~50M params) so data parallelism is the whole story, as
in the reference (SURVEY.md §2.3: no TP/PP/SP/EP anywhere).  Multi-host runs
extend the same mesh over DCN via `jax.distributed.initialize` — no code
changes here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data",
                   axis: int = 0) -> NamedSharding:
    """Shard axis `axis` (default the leading batch axis) over the mesh."""
    return NamedSharding(mesh, P(*([None] * axis), axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any],
                axis_name: str = "data", axis: int = 0) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along axis `axis`.

    axis=0 for a single step's batch; axis=1 for the (k, B, ...) stacked
    batches consumed by the k-step fused dispatch (`make_multi_step`),
    where the scan axis stays unsharded and the per-step batch axis shards.
    """
    sh = batch_sharding(mesh, axis_name, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh.

    Stages through host memory first: direct device->replicated transfers of
    large many-leaf trees deadlock the CPU PJRT client's transfer path on
    single-core hosts with virtual devices (observed: whole-TrainState
    replication never completing while its sub-trees replicate in seconds),
    and host->replicated puts are fast on every backend.  This runs once per
    (re)start, not in the step path.
    """
    sh = replicated(mesh)
    host = jax.device_get(tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), host)


def pad_to_multiple(batch: Dict[str, np.ndarray], multiple: int
                    ) -> tuple[Dict[str, np.ndarray], int]:
    """Pad the leading axis of every array to a multiple of the mesh size.

    Returns (padded batch, original length) so callers can trim outputs.
    Video clips rarely divide the device count evenly; padding with repeats
    of the last frame keeps shapes static across steps.
    """
    n = next(iter(batch.values())).shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    out = {}
    for k, v in batch.items():
        pad = np.repeat(v[-1:], rem, axis=0)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, n
