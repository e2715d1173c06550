"""Mesh construction and sharding rules.

This module is the TPU-native replacement for the reference's entire
distributed stack — mp.spawn + torch.distributed NCCL process groups +
DistributedDataParallel + DistributedSampler (train_resnet.py:125-196,240;
SURVEY.md §2.9).  One SPMD program, one `jax.sharding.Mesh`:

- axis **'data'**: data parallelism.  The global batch is sharded over it;
  gradient all-reduce is inserted by XLA (riding ICI in-slice) because the
  loss is a mean over the global batch — the explicit DDP machinery
  disappears.
- axis **'model'**: optional tensor parallelism for the classifier.  The AAM
  / softmax class weight is (n_spk, emb_dim); at VoxCeleb scale (7.3k
  speakers) replication is fine, but the rules here shard the class dimension
  so 100k+-speaker heads scale (the opportunity SURVEY §2.9 flags at
  model.py:470).  Logits then come out sharded over classes; softmax
  cross-entropy reduces with a psum XLA inserts automatically.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and feed
each host its own scp shard (pkr_tpu.data shards by jax.process_index()) —
no rendezvous URLs, no per-GPU process spawn.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis.  The model axis, when >1, is
    laid out innermost so classifier all-reduces ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_map_compat(f, *, mesh: Mesh, in_specs, out_specs):
    """jax.shard_map across jax versions (the replication-check kwarg was
    renamed check_rep → check_vma and the symbol moved out of
    jax.experimental); single home for the shim so a future rename is a
    one-line fix."""
    try:  # jax >= 0.8
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm

        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(path: str, shape, model_size: int = 1) -> P:
    """PartitionSpec for one parameter.

    Classifier weights shard their class dimension over 'model' — but only
    when the class count divides the axis (NamedSharding requires it; a
    7325-speaker head on a 2-way model axis falls back to replication, which
    is exactly the regime make_flash_aam_sharded's replicated-weight path
    handles).  Everything else (convs, BN, fc1) is replicated — the conv
    trunk is small (~6M params) and data parallelism is the right regime.
    """
    def fits(dim):
        return model_size > 1 and shape[dim] % model_size == 0

    if "aam_weight" in path and fits(0):
        return P("model", None)  # (n_spk, emb)
    if path.endswith("last/kernel") and fits(1):
        return P(None, "model")  # dense kernel (in, n_spk)
    if path.endswith("last/bias") and fits(0):
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply param_sharding_rules over a pytree and device_put accordingly."""
    model_size = mesh.shape.get("model", 1)

    def spec_for(path_entries, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_entries)
        return param_sharding_rules(path, leaf.shape, model_size)

    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, spec_for(p, l)), params)
    return jax.device_put(params, specs), specs
