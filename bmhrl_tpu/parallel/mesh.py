"""Device mesh + sharding rules.

The reference's entire distributed story is single-process
``torch.nn.DataParallel`` (ref: scripts/train_rl_captioning_module.py:95-99).
TPU-native equivalent: a (data, model) ``jax.sharding.Mesh``; batches shard on
``data``, params replicate (with the large FFN/vocab projections optionally
sharded on ``model``), and XLA inserts the ICI all-reduces inside the compiled
step. Works identically on one chip (1x1 mesh), a pod slice, or a virtual
CPU mesh for tests.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS, MODEL_AXIS = "data", "model"


def make_mesh(mesh_shape=(0, 1), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    d, m = mesh_shape
    if d <= 0:
        d = max(1, len(devices) // max(1, m))
    use = np.asarray(devices[: d * m]).reshape(d, m)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim on the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put array fields with the batch dim sharded on `data`;
    non-array fields (strings, ints) pass through for host use. Accepts
    numpy arrays AND jax.Arrays (e.g. batches the Prefetcher already
    staged to a single device): device_put re-shards to the mesh layout
    either way (a no-op when the sharding already matches)."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and v.ndim >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def replicate_tree(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def param_sharding_rules(mesh: Mesh, params) -> Any:
    """NamedShardings for the captioner params: large FFN kernels and the
    vocab projection shard on `model` when the axis has >1 device; everything
    else replicates. Applied via jax.device_put / jit out_shardings."""
    m_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if m_size > 1 and hasattr(leaf, "ndim") and leaf.ndim == 2:
            names = [getattr(p, "key", "") for p in path]
            joined = "/".join(str(n) for n in names)
            # vocab projection + FFN kernels: shard the wide output dim
            if ("projection" in joined and "kernel" in joined) or (
                    "fc1" in joined and "kernel" in joined):
                return NamedSharding(mesh, P(None, MODEL_AXIS))
            if "fc2" in joined and "kernel" in joined:
                return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
