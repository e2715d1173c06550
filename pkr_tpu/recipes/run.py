"""Stage-gated recipe driver.

The Python CLI that replaces the reference's bash recipe stack
(run.sh / run_aam_v2.sh / feature_pre.sh / test.sh — SURVEY §2.1): one
process, numbered stages, a single typed Config, resumable at any stage via
--stage / --stop-stage, artifacts laid out Kaldi-style under --exp-dir so the
outputs remain interoperable (feats.scp/ark, vad.scp, utt2spkid, text
embedding arks, score files, eer/minDCF files).

Stages:
  0  prepare data dir (expects wav.scp/utt2spk under --data-dir, e.g. from
     pkr_tpu.recipes.voxceleb builders)
  1  features: wav → fbank (+VAD +sliding CMVN +voiced-selection) →
     compressed ark/scp          [replaces feature_pre.sh stages 1+4]
  2  filter ≥min-frames, train/cv split, utt2spkid, num_spk
                                  [feature_pre.sh stage 5]
  3  train                        [run_aam_v2.sh stages 7-8]
  4  extract embeddings           [run_aam_v2.sh stage 9 / decode.py]
  5  backend stats: global mean, speaker means, cohort top-k
                                  [run_aam_v2.sh stages 10-11]
  6  score + EER/minDCF           [test.sh]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np


def _stage_range(args):
    return range(args.stage, args.stop_stage + 1)


class _ShardedFeatWriter:
    """N encoder workers, each owning its own feats/vad ark+scp pair — the
    reference's per-nj `raw_fbank_$name.JOB.{ark,scp}` layout
    (local/make_fbank.sh:118-126) realized as threads inside the one device
    process (a TPU chip is single-process-owned, so the nj fan-out moves to
    the host-side CM encode, which is numpy-vectorized and releases the
    GIL).  Utterances are assigned round-robin in drain order; close()
    concatenates the shard scps into feats.scp / vad.scp."""

    def __init__(self, out_dir: str, n_workers: int):
        import queue
        import threading

        from pkr_tpu.io import write_ark_scp

        self.out_dir = out_dir
        self.n = n_workers
        self._queues = [queue.Queue(maxsize=128) for _ in range(n_workers)]
        self._writers = [
            (write_ark_scp(os.path.join(out_dir, f"feats.{i}.ark"),
                           os.path.join(out_dir, f"feats.{i}.scp"),
                           compress=True),
             write_ark_scp(os.path.join(out_dir, f"vad.{i}.ark"),
                           os.path.join(out_dir, f"vad.{i}.scp")))
            for i in range(n_workers)]
        self._errors: List[BaseException] = []
        self._threads = [
            threading.Thread(target=self._run, args=(i,), daemon=True)
            for i in range(n_workers)]
        for t in self._threads:
            t.start()
        self._next = 0

    def _run(self, i: int) -> None:
        fw, vw = self._writers[i]
        while True:
            item = self._queues[i].get()
            if item is None:
                return
            try:
                utt, feat, vad = item
                fw.write(utt, feat)
                vw.write(utt, vad)
            except BaseException as e:  # surfaced by close()
                self._errors.append(e)
                return

    def write(self, utt: str, feat, vad) -> None:
        import queue

        # bounded put + error re-check: a dead worker's queue stays full, so
        # a plain put() would deadlock the whole stage behind it
        while True:
            if self._errors:
                raise self._errors[0]
            try:
                self._queues[self._next].put((utt, feat, vad), timeout=5.0)
                break
            except queue.Full:
                continue
        self._next = (self._next + 1) % self.n

    def close(self) -> None:
        import queue

        # bounded sentinel delivery: a worker that died on error leaves its
        # queue full — only keep trying while the thread is actually alive,
        # else close() would hang exactly like the write() case
        for q, t in zip(self._queues, self._threads):
            while t.is_alive():
                try:
                    q.put(None, timeout=2.0)
                    break
                except queue.Full:
                    continue
        for t in self._threads:
            t.join(timeout=600.0)
        # a join that timed out leaves a worker mid-write: closing/merging
        # under it would emit a truncated ark that LOOKS complete — fail
        # loudly instead
        stuck = sum(t.is_alive() for t in self._threads)
        if stuck:
            raise RuntimeError(
                f"{stuck} encode worker(s) still running after 600s join — "
                "refusing to merge possibly-truncated shard arks")
        for fw, vw in self._writers:
            fw.close()
            vw.close()
        if self._errors:
            raise self._errors[0]
        for name in ("feats", "vad"):
            with open(os.path.join(self.out_dir, f"{name}.scp"), "w") as out:
                for i in range(self.n):
                    shard = os.path.join(self.out_dir, f"{name}.{i}.scp")
                    out.write(open(shard).read())
                    os.remove(shard)

    def abort(self) -> None:
        """Best-effort shutdown for the error path: wake workers, join
        briefly, close file handles — no scp merge, no error re-raise (the
        caller already has its own exception in flight)."""
        import queue

        for q, t in zip(self._queues, self._threads):
            if t.is_alive():
                try:
                    q.put_nowait(None)
                except queue.Full:
                    pass
        for t in self._threads:
            t.join(timeout=5.0)
        for fw, vw in self._writers:
            try:
                fw.close()
                vw.close()
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if not exc[0]:
            self.close()
        else:
            self.abort()


def run_features(data_dir: str, out_dir: str, batch: int = 32,
                 quantum_sec: float = 2.0, dither: float = 1.0,
                 apply_vad: bool = True, seed: int = 0,
                 pools=None, n_jobs: int = 4, frontend=None,
                 encode_workers: int = 1) -> None:
    """Batched on-device feature extraction over a data dir's wav.scp.

    `frontend` (a pkr_tpu.frontend.FrontendConfig) carries the FULL feature
    configuration — mel bins, freq range, VAD thresholds, CMVN window …
    (conf/fbank.conf + conf/vad.conf roles); without it, defaults with the
    given `dither` apply.  Honors declarative augmentation tables when
    present (utt2speed applied at decode, utt2aug mixed on device via
    `pools`, an recipes.augment_dir.AugmentPools).  Wav decode runs on an
    n_jobs thread pool (the nj-way fan-out role of make_fbank.sh's run.pl
    jobs — ffmpeg/sox pipe entries are subprocess-bound, so threads overlap
    them even on one core); augmentation and device work stay on the main
    thread for deterministic RNG use.

    Buckets run through a one-deep pipeline: the device computes bucket k
    while the host pulls bucket k−1's results and CM-encodes the arks —
    profiling (r4) showed the stage-1 wall was this serialized
    dispatch→D2H→encode cycle, not wav decode (0.7 ms/utt vectorized).
    batch=32 amortizes the per-dispatch latency of remote-attached chips
    (this dev tunnel; PCIe hosts care less)."""
    import jax
    import jax.numpy as jnp

    from pkr_tpu.frontend import FrontendConfig, wav_to_train_feats
    from pkr_tpu.frontend.features import FbankConfig, num_frames
    from pkr_tpu.io import DataDir, write_ark_scp
    from pkr_tpu.io.wav import read_wav

    import dataclasses

    dd = DataDir.load(data_dir)
    utt2aug = dd.get("utt2aug")
    if pools is None and any(k != "none" for k in utt2aug.values()):
        print(f"WARNING: {data_dir} has utt2aug entries but no augmentation "
              "pools were given — the augmented-named copies will get CLEAN "
              "features (exact duplicates of their source utterances)")
    utt2speed = dd.get("utt2speed")
    utt2warp = dd.get("utt2warp")  # per-utterance VTLN (make_fbank.sh:74-80)
    if frontend is not None:
        cfg = dataclasses.replace(
            frontend, fbank=dataclasses.replace(frontend.fbank, dither=dither))
    else:
        cfg = FrontendConfig(fbank=FbankConfig(dither=dither))
    fb = cfg.fbank
    cfg_by_warp = {}

    def cfg_for(warp: float):
        if warp not in cfg_by_warp:
            cfg_by_warp[warp] = (cfg if warp == 1.0 else dataclasses.replace(
                cfg, fbank=dataclasses.replace(fb, vtln_warp=warp)))
        return cfg_by_warp[warp]

    key = jax.random.key(seed)
    os.makedirs(out_dir, exist_ok=True)

    # group utterances into duration buckets for static shapes
    entries = sorted(dd["wav.scp"].items())
    quantum = int(quantum_sec * fb.sample_frequency)

    import contextlib

    buckets: Dict[int, List[Tuple[str, np.ndarray]]] = {}
    utt2nf = {}
    with contextlib.ExitStack() as stack:
        if encode_workers > 1:
            sink = stack.enter_context(
                _ShardedFeatWriter(out_dir, encode_workers))
            emit = sink.write
        else:
            fw = stack.enter_context(
                write_ark_scp(os.path.join(out_dir, "feats.ark"),
                              os.path.join(out_dir, "feats.scp"),
                              compress=True))
            vw = stack.enter_context(
                write_ark_scp(os.path.join(out_dir, "vad.ark"),
                              os.path.join(out_dir, "vad.scp")))

            def emit(utt, feat, vad):
                fw.write(utt, feat)
                vw.write(utt, vad)

        def flush(bucket_key, items):
            nonlocal key
            L, warp = bucket_key
            B = len(items)
            # pad tail buckets to the full batch (zero rows, length 0,
            # dropped at write-out): one compiled program per (L, warp)
            # instead of one per ragged leftover size — each extra shape
            # costs a full XLA compile through the remote-compile tunnel
            Bp = batch if B < batch else B
            wavs = np.zeros((Bp, L), np.float32)
            lens = np.zeros((Bp,), np.int32)
            for b, (utt, w) in enumerate(items):
                wavs[b, : len(w)] = w
                lens[b] = len(w)
            if pools is not None and utt2aug:
                # batched on-device mixing: ONE dispatch per bucket (the
                # reference runs a wav-reverberate pipe per utterance)
                kinds = ([utt2aug.get(utt, "none") for utt, _ in items]
                         + ["none"] * (Bp - B))
                if any(k != "none" for k in kinds):
                    # device_out: the augmented batch feeds the frontend
                    # directly, no host round trip over the transfer link
                    wavs = pools.augmenter(wavs, lens, kinds=kinds,
                                           device_out=True)
            key, sub = jax.random.split(key)
            feats, mask, vad = wav_to_train_feats(
                jnp.asarray(wavs), jnp.asarray(lens), sub, cfg_for(warp),
                apply_vad=apply_vad)
            # pipeline: enqueue this bucket's (async) device results and
            # write out the PREVIOUS bucket while the chip works on this one
            pending.append((items, np.asarray(lens[:B]), feats, mask, vad))
            if len(pending) > 1:
                drain_one()

        def drain_one():
            items, lens, feats, mask, vad = pending.pop(0)
            feats, mask, vad = map(np.asarray, (feats, mask, vad))
            for b, (utt, w) in enumerate(items):
                n = int(mask[b].sum())
                nf = int(num_frames(int(lens[b]), fb))
                emit(utt, feats[b, :n], vad[b, :nf].astype(np.float32))
                utt2nf[utt] = n

        pending: List[tuple] = []

        def decode(entry):
            utt, rx = entry
            wav, rate = read_wav(rx)
            assert rate == fb.sample_frequency, (utt, rate)
            speed = float(utt2speed.get(utt, "1.0")) if utt2speed else 1.0
            if speed != 1.0:
                from pkr_tpu.data.augment import speed_perturb

                wav = speed_perturb(wav, speed)
            return utt, wav

        if n_jobs > 1 and len(entries) > 1:
            from multiprocessing.pool import ThreadPool

            pool = ThreadPool(n_jobs)
            decoded = pool.imap(decode, entries)  # ordered: determinism
        else:
            pool = None
            decoded = map(decode, entries)

        for utt, wav in decoded:
            L = int(np.ceil(max(len(wav), quantum) / quantum) * quantum)
            warp = float(utt2warp.get(utt, "1.0")) if utt2warp else 1.0
            bkey = (L, warp)
            buckets.setdefault(bkey, []).append((utt, wav))
            if len(buckets[bkey]) == batch:
                flush(bkey, buckets.pop(bkey))
        for bkey in sorted(buckets):
            flush(bkey, buckets[bkey])
        while pending:
            drain_one()
        if pool is not None:
            pool.close()
            pool.join()

    with open(os.path.join(out_dir, "utt2num_frames"), "w") as f:
        for utt in sorted(utt2nf):
            f.write(f"{utt} {utt2nf[utt]}\n")

    if pools is not None and getattr(pools, "_rotate_rows", 0):
        # pool-rotation observability (the shard-diversity contract): a
        # nonzero wait count means a slow disk kept shards live past
        # rotate_rows — visible here instead of silently degrading
        rec = {"pool_rotations_done": pools.rotations_done,
               "pool_rotation_wait_batches": pools.rotation_wait_batches,
               "pool_rotation_errors": pools.rotation_errors}
        with open(os.path.join(out_dir, "stage1_metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        if pools.rotation_wait_batches:
            print(f"  pool rotation: {pools.rotations_done} swaps, "
                  f"{pools.rotation_wait_batches} batches ran with a due "
                  "rotation waiting on prefetch")


def run_split(feat_dir: str, data_dir: str, min_frames: int,
              cv_fraction: float, seed: int) -> int:
    from pkr_tpu.io import DataDir

    dd = DataDir.load(data_dir, names=("utt2spk",))
    for name in ("feats.scp", "vad.scp", "utt2num_frames"):
        fd = DataDir.load(feat_dir, names=(name,))
        if name in fd:
            dd.tables[name] = fd[name]
    dd = dd.fix().filter_min_frames(min_frames)
    if dd.num_utts == 0:
        raise RuntimeError(
            f"no utterances survived the >={min_frames}-frame filter in "
            f"{feat_dir} — lower data.min_frames or use longer audio")
    dd, num_spk = dd.assign_spk_ids()
    train, cv = dd.train_cv_split(cv_fraction, seed)
    train.save(os.path.join(feat_dir, "train"))
    cv.save(os.path.join(feat_dir, "cv"))
    with open(os.path.join(feat_dir, "num_spk"), "w") as f:
        f.write(str(num_spk))
    return num_spk


def build_model(cfg_model, num_spk: int):
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel

    return SpeakerModel(spk_num=num_spk, feat_dim=cfg_model.feat_dim,
                        pooling=cfg_model.pooling, loss=cfg_model.loss,
                        m=cfg_model.margin, s=cfg_model.scale,
                        trunk=cfg_model.trunk, emb_dim=cfg_model.emb_dim)


class _TileToBatch:
    """Sampler wrapper: cycles a too-small split's indices up to one full
    mesh-divisible batch (see the cv-loader comment in run_train)."""

    def __init__(self, sampler, batch: int):
        self._sampler, self._batch = sampler, batch

    def __len__(self):
        return max(len(self._sampler), self._batch)

    def epoch_indices(self, epoch, seed, process_index=0, process_count=1):
        import numpy as _np

        idx = self._sampler.epoch_indices(epoch, seed, process_index,
                                          process_count)
        if 0 < len(idx) < self._batch:
            idx = _np.resize(_np.asarray(idx), self._batch)
        return idx


def run_train(cfg, feat_dir: str, exp_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from pkr_tpu.data import (BalancedRepetitionSampler, FeatureSource,
                              SpeakerBalancedSampler, TrainLoader)
    from pkr_tpu.parallel import make_mesh
    from pkr_tpu.train import (create_train_state, restore_checkpoint,
                               save_checkpoint, train_and_validate)
    from pkr_tpu.train.checkpoint import import_torch_checkpoint
    from pkr_tpu.utils.logging import ProgressLogger

    os.makedirs(exp_dir, exist_ok=True)
    num_spk = int(open(os.path.join(feat_dir, "num_spk")).read())
    model = build_model(cfg.model, num_spk)
    mesh = make_mesh(n_model=cfg.train.model_parallel)
    n_data = mesh.devices.shape[0]

    def make_loader(split):
        scp = os.path.join(feat_dir, split, "feats.scp")
        src = FeatureSource(scp)
        u2id = {u: int(v) for u, v in
                (l.split() for l in open(os.path.join(feat_dir, split, "utt2spkid")))}
        labels = [u2id[u] for u in src.utts]
        sampler_cls = (SpeakerBalancedSampler if cfg.train.dataset == "v2"
                       else BalancedRepetitionSampler)
        sampler = sampler_cls(src.utts, labels)
        chunk = (cfg.train.chunk_size[0] if len(cfg.train.chunk_size) == 1
                 else tuple(cfg.train.chunk_size))
        # a cv split smaller than the batch would silently validate nothing;
        # the batch must stay divisible by the mesh's data axis
        batch = min(cfg.train.batch_size, len(sampler))
        batch = max(n_data, batch // n_data * n_data)
        # cfg.train.batch_size is the GLOBAL batch (the reference's 1024
        # spans 8 GPUs): each host's loader yields its 1/P share and the
        # train loop assembles the global batch across processes
        batch = max(1, batch // jax.process_count())
        if split == "cv" and len(sampler) // jax.process_count() < batch:
            # fewer cv utts than the mesh-divisible minimum (e.g. 5 utts on
            # an 8-chip mesh): tile indices up to one full batch — a few
            # double-counted utterances beat zero validation batches (which
            # would pin acc1 at 0 and never write the 'best' checkpoint)
            sampler = _TileToBatch(sampler, batch)
        if cfg.train.device_cache and split == "train" and isinstance(chunk, int):
            from pkr_tpu.data import DeviceCacheLoader, DeviceFeatureCache

            assert jax.process_count() == 1, (
                "device_cache is a single-host loop (the cache lives in "
                "THIS host's device HBM); use the host loader multi-host")
            cache = DeviceFeatureCache.from_scp(scp, u2id)
            print(f"device cache: {cache.nbytes / 1e6:.1f} MB in HBM "
                  f"({len(src)} utterances)")
            return DeviceCacheLoader(cache, sampler, batch, chunk,
                                     seed=cfg.train.seed)
        # per-host loader shard: the train loop's put() assembles the
        # global batch across processes (multi-host contract)
        return TrainLoader(src, labels, sampler, batch, chunk,
                           seed=cfg.train.seed,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())

    train_loader, cv_loader = make_loader("train"), make_loader("cv")
    example = jnp.zeros((2, cfg.model.feat_dim, min(cfg.train.chunk_size)))
    state = create_train_state(model, jax.random.key(cfg.train.seed),
                               example, jnp.zeros((2,), jnp.int32),
                               cfg.train.momentum, cfg.train.weight_decay)
    start_epoch = 0
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    if cfg.train.resume:
        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = restored
            start_epoch = int(state.epoch)
    elif cfg.train.pretrained:
        if cfg.train.pretrained.endswith((".pth", ".pth.tar", ".pt")):
            import torch

            sd = torch.load(cfg.train.pretrained, map_location="cpu")
            sd = sd.get("state_dict", sd)
            variables = import_torch_checkpoint(
                sd, {"params": state.params, "batch_stats": state.batch_stats})
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        else:
            from pkr_tpu.train.checkpoint import load_pretrained_variables

            variables = load_pretrained_variables(
                cfg.train.pretrained,
                {"params": state.params, "batch_stats": state.batch_stats})
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])

    if len(mesh.devices.reshape(-1)) > 1:
        # lay the params out per the mesh rules (classifier class-sharded
        # over 'model' when present) before the first step
        from pkr_tpu.parallel import shard_params

        params, _ = shard_params(state.params, mesh)
        state = state.replace(params=params)
    logger = ProgressLogger(jsonl_path=os.path.join(exp_dir, "train_metrics.jsonl"))

    def on_epoch_end(state, epoch, metrics):
        # every process calls save (Orbax's distributed save coordinates;
        # a rank-0-only call would hang in the commit barrier); only rank
        # 0 touches the marker/best/prune filesystem state inside
        save_checkpoint(ckpt_dir, state, is_best=metrics["is_best"],
                        keep_last=cfg.train.keep_last_checkpoints)

    train_and_validate(model, state, train_loader, cv_loader,
                       epochs=cfg.train.epochs, lr0=cfg.train.lr,
                       lr_final=cfg.train.lr_final, momentum=cfg.train.momentum,
                       weight_decay=cfg.train.weight_decay, mesh=mesh,
                       start_epoch=start_epoch, print_freq=cfg.train.print_freq,
                       on_epoch_end=on_epoch_end, logger=logger,
                       flash_aam=cfg.train.flash_aam,
                       profile_dir=cfg.train.profile_dir,
                       profile_steps=cfg.train.profile_steps,
                       save_every_steps=cfg.train.save_every_steps,
                       on_step_save=(lambda st: save_checkpoint(
                           ckpt_dir, st,
                           keep_last=cfg.train.keep_last_checkpoints))
                       if cfg.train.save_every_steps else None)
    from pkr_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # the last save is async; commit before returning


def select_decode_subset(scp: str, n: int, seed: int, out_path: str) -> str:
    """feature_pre.sh:244-246 (`shuf | head -N`): a seeded random N-utterance
    subset of a feats.scp, written as a derived scp.  Used for the backend
    cohort extraction so mean/LDA/PLDA/S-norm stats don't require a full
    multi-million-utterance forward pass."""
    lines = open(scp).read().splitlines()
    if n <= 0 or n >= len(lines):
        # No-op subset: still (re)write out_path with the FULL list so the
        # file's content always reflects THIS run's decision.  Multi-host
        # peers adopt out_path unconditionally after the barrier; leaving a
        # stale subset file from a previous run on disk here would make them
        # silently extract a different utterance list than rank 0.
        keep = range(len(lines))
    else:
        rng = np.random.default_rng(seed)
        keep = sorted(rng.choice(len(lines), n, replace=False))
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        # per-line writes: an empty keep list yields an empty file, not a
        # single blank line that downstream scp parsing would reject
        f.write("".join(f"{lines[i]}\n" for i in keep))
    os.replace(tmp, out_path)
    return out_path


def run_extract(cfg, feat_dir: str, exp_dir: str, scp: str, out_name: str,
                subset: int = 0) -> None:
    import jax

    from pkr_tpu.data import EvalLoader, FeatureSource
    from pkr_tpu.eval.extract import extract_embeddings
    from pkr_tpu.io import write_text_vec_ark
    from pkr_tpu.train import create_train_state, restore_checkpoint

    import jax.numpy as jnp

    num_spk = int(open(os.path.join(feat_dir, "num_spk")).read())
    model = build_model(cfg.model, num_spk)
    example = jnp.zeros((2, cfg.model.feat_dim, 100))
    state = create_train_state(model, jax.random.key(0), example,
                               jnp.zeros((2,), jnp.int32))
    restored = restore_checkpoint(os.path.join(exp_dir, "checkpoints"), state,
                                  which="best")
    if restored is None:
        restored = restore_checkpoint(os.path.join(exp_dir, "checkpoints"), state)
    assert restored is not None, "no checkpoint to extract from"
    variables = {"params": restored.params, "batch_stats": restored.batch_stats}
    if subset:
        sub_path = os.path.join(exp_dir, f"decode_{out_name}.scp")
        # multi-host: only rank 0 writes the subset scp (concurrent 'w'
        # opens on shared storage could hand a peer a torn file), everyone
        # reads it after the barrier.  select_decode_subset ALWAYS writes
        # sub_path (full list on a no-op subset), so the file's existence
        # and content deterministically reflect this run — a peer that
        # can't see it after the barrier fails loudly instead of silently
        # sharding a different utterance list than rank 0.
        if jax.process_index() == 0:
            scp = select_decode_subset(scp, subset, cfg.train.seed, sub_path)
        if jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils

            # freshness contract: mere existence of sub_path is not enough —
            # a previous run's file satisfies os.path.exists instantly and a
            # stale NFS dentry can even serve old CONTENT after rank 0's
            # os.replace.  Rank 0 broadcasts a per-run nonce and writes it
            # to a stamp file AFTER the subset scp; peers wait until they
            # read back exactly this run's nonce, which orders their view
            # of the scp write on close-to-open-consistent storage.
            nonce = int(_np.random.default_rng().integers(1, 2**62))
            nonce = int(multihost_utils.broadcast_one_to_all(
                _np.asarray(nonce, _np.int64)))
            stamp = sub_path + ".stamp"
            if jax.process_index() == 0:
                tmp = stamp + ".tmp"
                with open(tmp, "w") as f:
                    f.write(str(nonce))
                os.replace(tmp, stamp)
            multihost_utils.sync_global_devices(f"decode-subset-{out_name}")
            if jax.process_index() != 0:
                deadline = time.time() + 60.0
                seen = None
                while time.time() < deadline:
                    try:
                        seen = open(stamp).read().strip()
                    except OSError:
                        seen = None
                    if seen == str(nonce):
                        break
                    time.sleep(0.5)  # shared-storage visibility lag
                if seen != str(nonce):
                    raise RuntimeError(
                        f"rank {jax.process_index()}: subset stamp {stamp} "
                        f"did not show this run's nonce within 60s of the "
                        "decode-subset barrier — refusing to risk a stale "
                        "subset scp (hosts would shard different utterance "
                        "lists)")
            scp = sub_path
    src = FeatureSource(scp)
    pi, pc = jax.process_index(), jax.process_count()
    # multi-host: each host extracts ITS utterance shard on its LOCAL
    # devices and writes a per-process ark (the reference's nj-way decode
    # wrote per-job arks the same way; text arks concatenate trivially)
    loader = EvalLoader(src, batch_size=cfg.eval.batch_size,
                        quantum=cfg.eval.bucket_quantum, max_len=cfg.eval.max_len,
                        chunk_size=cfg.eval.chunk_size,
                        long_mode=cfg.eval.long_mode,
                        transport=cfg.eval.transport,
                        process_index=pi, process_count=pc)
    mesh = None
    if jax.local_device_count() > 1:
        from pkr_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=jax.local_device_count(), n_model=1,
                         devices=jax.local_devices())
    if pc > 1:
        # clear a stale single-host ark and shards from a wider old run —
        # the merge loader would otherwise prefer/mix stale embeddings
        if pi == 0:
            import glob as _glob

            stale_paths = [os.path.join(exp_dir, out_name)]
            for p in _glob.glob(os.path.join(exp_dir, f"{out_name}.*")):
                suffix = p.rsplit(".", 1)[1]
                if suffix.isdigit() and int(suffix) >= pc:
                    stale_paths.append(p)
            for stale in stale_paths:
                if os.path.exists(stale):
                    os.unlink(stale)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"extract-clean-{out_name}")
    embs = extract_embeddings(model, variables, loader, mesh=mesh)
    out = out_name if pc == 1 else f"{out_name}.{pi}"
    write_text_vec_ark(os.path.join(exp_dir, out), embs)


def run_score(cfg, exp_dir: str, trials_path: str, enroll_ark: str,
              test_ark: str, cohort_ark: Optional[str] = None,
              cohort_utt2spk: Optional[Dict[str, str]] = None,
              enroll_spk2utt: Optional[Dict[str, List[str]]] = None
              ) -> Dict[str, float]:
    """Backends (test.sh / test2.sh parity): 'cosine', 'snorm' (adaptive
    S-norm over cohort top-k stats), 'plda' (LDA→length-norm→PLDA LLR,
    run.sh:323-351), 'pool' (spk2utt-pooled enrollment means, test2.sh:72-93)."""
    from pkr_tpu.eval.metrics import compute_eer, compute_min_dcf
    from pkr_tpu.eval.scoring import (adaptive_snorm, cohort_topk_stats,
                                      cosine_scores, global_mean,
                                      pooled_speaker_means, read_trials,
                                      write_scores)
    from pkr_tpu.io import load_text_vec_ark

    enroll = load_text_vec_ark(enroll_ark)
    test = load_text_vec_ark(test_ark)
    pairs, labels = read_trials(trials_path)
    mean = None
    cohort_vecs = None
    if cohort_ark:
        cohort_vecs = load_text_vec_ark(cohort_ark)
        mean = global_mean(cohort_vecs)

    backend = cfg.eval.backend
    if backend == "pool":
        assert enroll_spk2utt, "'pool' backend needs an enroll spk2utt"
        enroll = pooled_speaker_means(enroll, enroll_spk2utt)
        backend = "cosine"

    if backend == "plda":
        from pkr_tpu.eval.plda import (compute_lda, length_normalize,
                                       plda_scores, train_plda)

        assert cohort_vecs and cohort_utt2spk, "plda needs cohort ark + utt2spk"
        # run.sh:332 pins --total-covariance-factor=0.0 (pure within-class
        # whitening), not ivector-compute-lda's 0.1 default
        lda = compute_lda(cohort_vecs, cohort_utt2spk, dim=min(
            cfg.eval.lda_dim, len(next(iter(cohort_vecs.values())))),
            total_covariance_factor=0.0)

        def prep(vs):
            # lda.apply already centers on the cohort mean (the
            # ivector-subtract-global-mean step, run.sh:332-340) — passing
            # v - mean here would subtract it twice
            return {k: length_normalize(lda.apply(v)) for k, v in vs.items()}

        model = train_plda(prep(cohort_vecs), cohort_utt2spk)
        scores = plda_scores(model, prep(enroll), prep(test), pairs)
    else:
        scores = cosine_scores(enroll, test, pairs, mean)
        if backend == "snorm":
            from pkr_tpu.eval.scoring import speaker_means

            assert cohort_vecs is not None, "snorm needs a cohort ark"
            # the reference's cohort is PER-SPEAKER means of the training
            # embeddings (compute_mean_byspk → compute_topk_mean_std,
            # run_aam_v2.sh:139-174), not raw utterance vectors
            if cohort_utt2spk:
                cohort = np.stack(list(
                    speaker_means(cohort_vecs, cohort_utt2spk).values()))
            else:
                cohort = np.stack(list(cohort_vecs.values()))
            e_stats = cohort_topk_stats(enroll, cohort, cfg.eval.topk, mean)
            t_stats = cohort_topk_stats(test, cohort, cfg.eval.topk, mean)
            scores = adaptive_snorm(scores, pairs, e_stats, t_stats)
    write_scores(os.path.join(exp_dir, "scores.txt"), pairs, scores)
    if not labels:  # pairs-only trial list: scores written, no metrics
        results = {"n_trials": len(pairs)}
        with open(os.path.join(exp_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        return results
    results = {"eer": compute_eer(scores.tolist(), labels)}
    for p in cfg.eval.p_targets:
        results[f"min_dcf_p{p}"], _ = compute_min_dcf(scores.tolist(), labels, p)
    with open(os.path.join(exp_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def run_backend_stats(cfg, exp_dir: str, data_dir: str) -> None:
    """Write the backend artifacts the reference recipes materialize
    (run_aam_v2.sh:139-174): mean.vec (binary Kaldi vector), per-speaker
    cohort means (text ark), and the cohort top-k mean/std table."""
    from pkr_tpu.eval.scoring import (cohort_topk_stats, global_mean,
                                      speaker_means)
    from pkr_tpu.io import DataDir, load_text_vec_ark, write_text_vec_ark, write_vec_flt

    train = load_text_vec_ark(os.path.join(exp_dir, "train.iv"))
    mean = global_mean(train)
    write_vec_flt(os.path.join(exp_dir, "mean.vec"), mean.astype(np.float32))
    utt2spk = DataDir.load(data_dir, names=("utt2spk",)).get("utt2spk")
    if utt2spk:
        spk_means = speaker_means(train, utt2spk)
        write_text_vec_ark(os.path.join(exp_dir, "spk_xvector.iv"), spk_means)
        cohort = np.stack(list(spk_means.values()))
    else:
        cohort = np.stack(list(train.values()))
    test_path = os.path.join(exp_dir, "test.iv")
    if os.path.exists(test_path):
        test = load_text_vec_ark(test_path)
        stats = cohort_topk_stats(test, cohort, cfg.eval.topk, mean)
        with open(os.path.join(exp_dir, "topk_mean_std"), "w") as f:
            for k, (mu, sd) in stats.items():
                f.write(f"{k} {mu} {sd}\n")


def main(argv=None):
    from pkr_tpu.config import Config

    ap = argparse.ArgumentParser(description="pkr_tpu recipe driver")
    ap.add_argument("--config", type=str, default=None, help="JSON config path")
    ap.add_argument("--preset", type=str, default=None,
                    help="named recipe preset (see pkr_tpu.recipes.presets)")
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--stop-stage", type=int, default=6)
    ap.add_argument("--data-dir", type=str, required=True,
                    help="dir with wav.scp/utt2spk (train corpus)")
    ap.add_argument("--test-data-dir", type=str, default=None)
    ap.add_argument("--trials", type=str, default=None)
    ap.add_argument("--exp-dir", type=str, default="exp/run")
    ap.add_argument("--backend", type=str, default=None,
                    help="override eval backend (cosine|snorm|plda|pool)")
    ap.add_argument("--profile-dir", type=str, default=None,
                    help="capture a jax.profiler trace of ~10 steady-state "
                         "training steps into this dir (stage 3)")
    ap.add_argument("--musan-dir", type=str, default=None,
                    help="MUSAN root for utt2aug augmentation pools")
    ap.add_argument("--rir-dir", type=str, default=None,
                    help="RIRS_NOISES-style root for the utt2aug 'reverb' "
                         "branch (rir_list room sets; run.sh:93-130 role)")
    args = ap.parse_args(argv)

    if args.preset:
        from pkr_tpu.recipes.presets import PRESETS

        cfg = PRESETS[args.preset]()
    elif args.config:
        cfg = Config.from_json(open(args.config).read())
    else:
        cfg = Config()
    if args.backend:
        import dataclasses

        cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
            cfg.eval, backend=args.backend))
    if args.profile_dir:
        import dataclasses

        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, profile_dir=args.profile_dir))
    from pkr_tpu.parallel.distributed import initialize

    initialize()  # launch_hosts/slurm env contract; no-op single host
    os.makedirs(args.exp_dir, exist_ok=True)
    feat_dir = os.path.join(args.exp_dir, "feats")
    test_feat_dir = os.path.join(args.exp_dir, "feats_test")

    pools = None
    if ((args.musan_dir or args.rir_dir) and cfg.data.augment
            and 1 in _stage_range(args)):
        from pkr_tpu.recipes.augment_dir import AugmentPools

        if args.musan_dir:
            from pkr_tpu.recipes.voxceleb import make_musan

            # config SNR grids (DataConfig.snr_*, run.sh:136-144 defaults);
            # full-corpus pools with rotating HBM shards (DataConfig.pool_*)
            pools = AugmentPools.load(make_musan(args.musan_dir),
                                      seed=cfg.train.seed,
                                      snr={"noise": cfg.data.snr_noise,
                                           "music": cfg.data.snr_music,
                                           "babble": cfg.data.snr_babble},
                                      max_len_sec=cfg.data.pool_len_sec,
                                      shard_mb=cfg.data.pool_shard_mb,
                                      rotate_rows=cfg.data.pool_rotate_rows)
        else:
            pools = AugmentPools(seed=cfg.train.seed)
        if args.rir_dir:
            # run.sh:93-130: RIR-only reverberation (speech_rvb_prob 1, no
            # additive noises composed) from the RIRS_NOISES room sets
            pools.attach_rir_set(args.rir_dir)

    import jax

    multi = jax.process_count() > 1
    # stages 0/1/2/5/6 are host-side file work: in a multi-host run rank 0
    # does them once on the shared exp dir; stages 3/4 are collective (all
    # processes participate).  The barrier after each stage keeps ranks in
    # lockstep — without it rank 0 could score a half-written shard set.
    HOST_ONLY = {0, 1, 2, 5, 6}
    for stage in _stage_range(args):
        if multi and stage in HOST_ONLY and jax.process_index() != 0:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"stage-{stage}")
            continue
        if stage == 0:
            from pkr_tpu.io import DataDir

            for d in filter(None, (args.data_dir, args.test_data_dir)):
                dd = DataDir.load(d)
                problems = dd.validate()
                print(f"== stage 0: {d}: {dd.num_utts} utts / "
                      f"{len(dd.spks)} speakers"
                      + (f"  PROBLEMS: {problems}" if problems else "  OK"))
                if problems:
                    raise RuntimeError(f"data dir {d} failed validation: {problems}")
        elif stage == 1:
            print(f"== stage 1: features → {feat_dir}")
            dither = cfg.frontend.fbank.dither
            run_features(args.data_dir, feat_dir, dither=dither, pools=pools,
                         seed=cfg.train.seed, frontend=cfg.frontend,
                         n_jobs=cfg.data.decode_jobs,
                         encode_workers=cfg.data.encode_workers)
            if args.test_data_dir:
                run_features(args.test_data_dir, test_feat_dir, dither=dither,
                             seed=cfg.train.seed, frontend=cfg.frontend,
                             n_jobs=cfg.data.decode_jobs,
                             encode_workers=cfg.data.encode_workers)
        elif stage == 2:
            print("== stage 2: filter/split/labels")
            n = run_split(feat_dir, args.data_dir, cfg.data.min_frames,
                          cfg.data.cv_fraction, cfg.train.seed)
            print(f"num_spk={n}")
        elif stage == 3:
            print("== stage 3: train")
            run_train(cfg, feat_dir, args.exp_dir)
        elif stage == 4:
            print("== stage 4: extract")
            # the train/cohort side honors eval.cohort_subset
            # (feature_pre.sh's 500k decode_train.scp); test stays full
            run_extract(cfg, feat_dir, args.exp_dir,
                        os.path.join(feat_dir, "train", "feats.scp"),
                        "train.iv", subset=cfg.eval.cohort_subset)
            if args.test_data_dir:
                run_extract(cfg, feat_dir, args.exp_dir,
                            os.path.join(test_feat_dir, "feats.scp"), "test.iv")
        elif stage == 5:
            print("== stage 5: backend stats")
            run_backend_stats(cfg, args.exp_dir, args.data_dir)
        elif stage == 6 and args.trials:
            print("== stage 6: score")
            from pkr_tpu.io import DataDir

            cohort_u2s = DataDir.load(args.data_dir, names=("utt2spk",)).get("utt2spk")
            enroll_s2u = None
            if args.test_data_dir:
                tdd = DataDir.load(args.test_data_dir, names=("utt2spk",))
                enroll_s2u = {s: v.split() for s, v in
                              tdd.make_spk2utt().get("spk2utt").items()}
            res = run_score(cfg, args.exp_dir, args.trials,
                            os.path.join(args.exp_dir, "test.iv"),
                            os.path.join(args.exp_dir, "test.iv"),
                            cohort_ark=os.path.join(args.exp_dir, "train.iv"),
                            cohort_utt2spk=cohort_u2s,
                            enroll_spk2utt=enroll_s2u)
            print(json.dumps(res, indent=2))
        if multi and (stage in HOST_ONLY and jax.process_index() == 0
                      or stage not in HOST_ONLY):
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"stage-{stage}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
