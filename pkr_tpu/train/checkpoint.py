"""Checkpointing: Orbax save/restore + best-pointer + PyTorch importer.

Covers the reference's checkpoint story (SURVEY §5): per-epoch state dumps
with a 'best' copy on cv improvement (train_resnet.py:281-289,382-385),
resume (epoch/optimizer/metric restored — :209-229), and warm-start from a
*PyTorch* checkpoint with name-tolerant loading (loadParameters,
model.py:415-432) so models trained by the reference stack can be imported
for parity testing and fine-tuning.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp

from pkr_tpu.train.state import TrainState


_ASYNC_CKPTR = None
_COMMIT_THREAD = None
_EPILOGUE_ERROR = None


def _ckptr():
    """Process-wide AsyncCheckpointer (SURVEY §5: saves must not block the
    step loop).  Array data is snapshotted synchronously (device_get below),
    serialization + disk IO run on a background thread; Orbax commits via
    tmp-dir + rename so readers never see partial checkpoints."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed (including its
    'latest' marker + pruning epilogue).  Re-raises an epilogue failure
    (disk full mid-best-copy, ...) that happened on the commit thread —
    otherwise a failed marker write would be invisible and resume would
    silently restart from an older epoch."""
    global _EPILOGUE_ERROR
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    if _COMMIT_THREAD is not None:
        _COMMIT_THREAD.join()
    if _EPILOGUE_ERROR is not None:
        err, _EPILOGUE_ERROR = _EPILOGUE_ERROR, None
        raise err


def _parse_ckpt_name(d: str) -> Optional[Tuple[int, int]]:
    """'ckpt_<epoch>[.v<k>]' → (epoch, k) for ordering, else None."""
    if not d.startswith("ckpt_"):
        return None
    base, _, ver = d[5:].partition(".v")
    if not base.isdigit() or (ver and not ver.isdigit()):
        return None
    return int(base), int(ver) if ver else 0


def _resolve_target(path: str, which: str) -> Optional[str]:
    """'latest' → the marker's directory; 'best' → best; else ckpt_<which>.

    The marker stores the checkpoint DIRECTORY NAME (legacy markers with a
    bare epoch number still resolve)."""
    if which == "latest":
        marker = os.path.join(path, "latest")
        if not os.path.exists(marker):
            return None
        name = open(marker).read().strip()
        if name.isdigit():  # legacy marker format
            name = f"ckpt_{name}"
        return os.path.join(path, name)
    if which == "best":
        return os.path.join(path, "best")
    # explicit epoch: resolve the NEWEST version of that epoch (step-saves
    # create ckpt_<e>.v<k>, and pruning may have removed the plain dir)
    try:
        entries = [(key, d) for d in os.listdir(path)
                   if (key := _parse_ckpt_name(d)) is not None
                   and key[0] == int(which)]
    except (OSError, ValueError):
        entries = []
    if entries:
        return os.path.join(path, max(entries)[1])
    return os.path.join(path, f"ckpt_{which}")


def save_checkpoint(path: str, state: TrainState, is_best: bool = False,
                    keep_last: int = 0, sync: bool = False) -> None:
    """Save to <path>/ckpt_<epoch>; copy to <path>/best when is_best
    (model_best.pth.tar semantics, train_resnet.py:384-385).  keep_last > 0
    prunes older ckpt_* dirs, retaining the newest N (plus 'best').

    Asynchronous with wait-on-next-save semantics: this call returns once
    the state is snapshotted off the devices; the disk write overlaps
    subsequent training steps.  A new save (or any restore) first waits for
    the previous one.  The 'latest' marker and keep_last pruning run on a
    completion thread strictly AFTER the Orbax commit, and a committed
    checkpoint is NEVER deleted before its replacement commits — re-saves
    of the same epoch (mid-epoch step-saves, a resumed epoch) go to a
    versioned 'ckpt_<e>.v<k>' dir, so a preemption at ANY point leaves the
    marker pointing at an intact checkpoint.  is_best waits (the best copy
    needs the committed files); sync=True forces a full wait."""
    global _COMMIT_THREAD
    import threading

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    epoch = int(state.epoch)
    name = f"ckpt_{epoch}"
    ck = _ckptr()
    wait_for_checkpoints()  # at most one save (+epilogue) in flight
    if os.path.exists(os.path.join(path, name)):
        k = 1
        while os.path.exists(os.path.join(path, f"ckpt_{epoch}.v{k}")):
            k += 1
        name = f"ckpt_{epoch}.v{k}"
    target = os.path.join(path, name)
    # Multi-process: EVERY process must call save (Orbax's commit is a
    # cross-process barrier — a rank-0-only call deadlocks) and the state
    # is passed as global jax arrays so each process writes its shards;
    # host-local leaves (the epoch/step counters the loop re-creates each
    # epoch) are promoted to globally-replicated arrays first, since Orbax
    # refuses to serialize host-local arrays multi-host.
    # Single-process: snapshot to host numpy so the device buffers are
    # free to advance while the disk write runs.
    multi = jax.process_count() > 1
    if multi:
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, PartitionSpec as P

        gmesh = Mesh(np.asarray(jax.devices()), ("_all",))

        def to_global(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a proper global (mesh-placed) array
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), gmesh, P())

        payload = jax.tree.map(to_global, state)
    else:
        payload = jax.device_get(state)
    ck.save(target, payload)
    rank0 = jax.process_index() == 0

    def epilogue():
        global _EPILOGUE_ERROR
        try:
            ck.wait_until_finished()  # Orbax tmp-dir rename has happened
            if rank0:  # marker/best/prune are rank-0 filesystem actions
                with open(os.path.join(path, "latest"), "w") as f:
                    f.write(name)
                if is_best:
                    best = os.path.join(path, "best")
                    if os.path.exists(best):
                        shutil.rmtree(best)
                    shutil.copytree(target, best)
                if keep_last > 0:
                    entries = [(key, d) for d in os.listdir(path)
                               if (key := _parse_ckpt_name(d)) is not None]
                    for _, old in sorted(entries, reverse=True)[keep_last:]:
                        if old != name:  # never the just-committed target
                            shutil.rmtree(os.path.join(path, old),
                                          ignore_errors=True)
        except Exception as exc:  # surfaced by the next wait_for_checkpoints
            _EPILOGUE_ERROR = exc
        if multi:
            # other ranks must not race ahead (restore 'best', probe the
            # next versioned name) while rank 0 is still mutating the dir
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt-epilogue-{name}")

    if is_best or sync or multi:
        # multi: the commit barrier needs all processes — run inline so no
        # process races ahead into the next collective while others save
        epilogue()
        _COMMIT_THREAD = None
        if _EPILOGUE_ERROR is not None:
            wait_for_checkpoints()  # re-raise
    else:
        _COMMIT_THREAD = threading.Thread(target=epilogue, daemon=True)
        _COMMIT_THREAD.start()


def restore_checkpoint(path: str, template: TrainState,
                       which: str = "latest") -> Optional[TrainState]:
    """Restore 'latest', 'best', or an explicit epoch number."""
    wait_for_checkpoints()  # an in-flight async save may be the target
    path = os.path.abspath(path)
    target = _resolve_target(path, which)
    if target is None or not os.path.exists(target):
        return None
    restored = _ckptr().restore(target, item=jax.device_get(template))
    return jax.tree.map(lambda t, r: np.asarray(r).astype(np.asarray(t).dtype)
                        if hasattr(t, "dtype") else r, template, restored)


# ---------------------------------------------------------------------------
# PyTorch → Flax importer
# ---------------------------------------------------------------------------


def _torch_name_to_flax(name: str) -> Optional[Tuple[Tuple[str, ...], str, str]]:
    """Map a reference state-dict key to (flax path, leaf, collection).

    Reference naming (model.py): res.conv1/res.bn1 stem; res.layerL.J.convK /
    .bnK / .downsample.{0,1}; fc1; bn1 (head); last (softmax Dense or
    AAMLayer weight).  Ours (speaker_model.py/resnet.py): _trunk/stem/...,
    _trunk/layer{L}_{J}/ConvBN_{K-1}/..., fc1, bn1, last or aam_weight.
    """
    parts = name.split(".")
    if parts[0] == "module":
        parts = parts[1:]

    def bn_leaf(leaf):
        return {"weight": ("scale", "params"), "bias": ("bias", "params"),
                "running_mean": ("mean", "batch_stats"),
                "running_var": ("var", "batch_stats")}.get(leaf)

    if parts[0] == "res":
        if parts[1] == "conv1" and parts[2] == "weight":
            return ("_trunk", "stem", "Conv_0"), "kernel", "params"
        if parts[1] == "bn1":
            m = bn_leaf(parts[2])
            if m:
                return ("_trunk", "stem", "BatchNorm_0"), m[0], m[1]
        if parts[1].startswith("layer"):
            L, J = int(parts[1][5:]), int(parts[2])
            block = f"layer{L}_{J}"
            sub = parts[3]
            if sub in ("conv1", "conv2", "conv3") and parts[4] == "weight":
                return ("_trunk", block, f"ConvBN_{int(sub[-1]) - 1}", "Conv_0"), "kernel", "params"
            if sub in ("bn1", "bn2", "bn3"):
                m = bn_leaf(parts[4])
                if m:
                    return ("_trunk", block, f"ConvBN_{int(sub[-1]) - 1}", "BatchNorm_0"), m[0], m[1]
            if sub == "downsample":
                if parts[4] == "0" and parts[5] == "weight":
                    return ("_trunk", block, "downsample", "Conv_0"), "kernel", "params"
                if parts[4] == "1":
                    m = bn_leaf(parts[5])
                    if m:
                        return ("_trunk", block, "downsample", "BatchNorm_0"), m[0], m[1]
            if sub == "se":  # SELayer fc.0 / fc.2 (model.py:21-26)
                if parts[4] == "fc" and parts[6] == "weight":
                    idx = {"0": "Dense_0", "2": "Dense_1"}.get(parts[5])
                    if idx:
                        return ("_trunk", block, "SEGate_0", idx), "kernel", "params"
        return None
    if parts[0] == "fc1":
        return ("fc1",), {"weight": "kernel", "bias": "bias"}[parts[1]], "params"
    if parts[0] == "bn1":
        m = bn_leaf(parts[1])
        if m:
            return ("bn1",), m[0], m[1]
        return None
    if parts[0] == "last" and len(parts) > 1:
        if parts[1] == "weight":
            return ("last",), "kernel", "params"  # caller retargets for AAM
        if parts[1] == "bias":
            return ("last",), "bias", "params"
    return None


def import_torch_checkpoint(state_dict: Dict[str, Any], variables: Dict[str, Any],
                            verbose: bool = True) -> Dict[str, Any]:
    """Copy reference-model weights into a flax variables dict
    ({'params': ..., 'batch_stats': ...}), name-tolerantly: unknown names and
    shape mismatches are skipped with a message (loadParameters semantics,
    model.py:415-432).  `state_dict` values may be torch tensors or numpy.

    Returns a NEW variables dict.
    """
    import copy

    out = copy.deepcopy(jax.device_get(variables))
    has_aam = "aam_weight" in out.get("params", {})
    n_loaded = 0
    for name, value in state_dict.items():
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        try:
            mapped = _torch_name_to_flax(name)
        except (KeyError, ValueError, IndexError):
            mapped = None  # malformed/unknown key shapes: skip, don't abort
        if mapped is None:
            if verbose and not name.endswith("num_batches_tracked"):
                print(f"{name} is not in the model.")
            continue
        path, leaf, coll = mapped
        if path == ("last",) and leaf == "kernel" and has_aam:
            path, leaf = ("aam_weight",), None  # AAM weight stays (n_spk, emb)
        elif leaf == "kernel":
            arr = arr.transpose(2, 3, 1, 0) if arr.ndim == 4 else arr.T
        node = out.get(coll, {})
        try:
            for p in path[:-1] if leaf is None else path:
                node = node[p]
            key = path[-1] if leaf is None else leaf
            tgt = node[key]
        except KeyError:
            if verbose:
                print(f"{name} is not in the model.")
            continue
        if tuple(np.shape(tgt)) != arr.shape:
            if verbose:
                print(f"Wrong parameter length: {name}, model: {np.shape(tgt)}, "
                      f"loaded: {arr.shape}")
            continue
        node[key] = arr.astype(np.asarray(tgt).dtype)
        n_loaded += 1
    if verbose:
        print(f"imported {n_loaded}/{len(state_dict)} tensors")
    return out


def load_pretrained_variables(path: str, variables: Dict[str, Any],
                              which: str = "best", verbose: bool = True
                              ) -> Dict[str, Any]:
    """Name-tolerant warm start from one of OUR checkpoints (the
    loadParameters role for cross-head init, e.g. AAM from a softmax model —
    run_aam_v2.sh:82): leaves whose path exists in `variables` with a
    matching shape are copied; everything else is skipped with a message.

    A strict `restore_checkpoint` would reject the structure mismatch (the
    softmax head has bn1/last, the AAM head has aam_weight)."""
    wait_for_checkpoints()
    path = os.path.abspath(path)
    if which == "latest":
        target = _resolve_target(path, "latest")
        if target is None:
            return variables
    else:
        target = os.path.join(path, which)  # 'best' or an arbitrary name
        if not os.path.exists(target):
            target = _resolve_target(path, which)  # epoch-number resolution
        if target is None or not os.path.exists(target):
            target = _resolve_target(path, "latest")  # fall back to latest
            if target is None:
                return variables
    raw = _ckptr().restore(target)  # raw pytree (nested dicts)

    import copy

    out = copy.deepcopy(jax.device_get(variables))
    n_loaded = 0
    n_skipped = 0

    def walk(src, dst, prefix):
        nonlocal n_loaded, n_skipped
        if isinstance(src, dict) and isinstance(dst, dict):
            for k, v in src.items():
                if k in dst:
                    if isinstance(v, dict):
                        walk(v, dst[k], prefix + (k,))
                    else:
                        arr = np.asarray(v)
                        tgt = np.asarray(dst[k])
                        if arr.shape == tgt.shape:
                            dst[k] = arr.astype(tgt.dtype)
                            n_loaded += 1
                        else:
                            n_skipped += 1
                            if verbose:
                                print(f"Wrong parameter length: {'/'.join(prefix + (k,))}, "
                                      f"model: {tgt.shape}, loaded: {arr.shape}")
                else:
                    n_skipped += 1
                    if verbose:
                        print(f"{'/'.join(prefix + (k,))} is not in the model.")

    for coll in ("params", "batch_stats"):
        if coll in out and isinstance(raw, dict) and coll in raw:
            walk(raw[coll], out[coll], (coll,))
    if verbose:
        print(f"warm start: loaded {n_loaded} tensors, skipped {n_skipped}")
    return out
