"""End-to-end quality parity: pkr_tpu engine vs the reference torch engine.

Trains BOTH engines on the same synthetic corpus with identical initial
weights (via train.checkpoint.import_torch_checkpoint), identical
hyperparameters (SGD momentum 0.9, weight decay 5e-4, per-epoch cosine LR —
train_resnet.py:72-118) and an identical precomputed batch schedule, then
extracts held-out embeddings with each engine's own trained weights, scores
the same cosine trial list, and compares EER / minDCF with bootstrap
confidence intervals.  (VERDICT r2 next-round item 1; the published
reference numbers this mirrors are run.sh:361-363.)

Flagship configuration (--trunk resnet34): the reference's ResNet-34 trunk
(model.py:205-269, hard-coded at :345) + mean+std pooling + AAM head at 512
synthetic speakers, with a 512x1536-pair trial set large and hard enough
that minDCF(p=0.01) sits well below saturation — so BOTH metric columns
carry information (round 2's 32-speaker study had minDCF pinned at ~0.99).

The torch side uses the architecture transcription from
tests/test_torch_import_e2e.py (reference model.py:205-269,334-457) and the
ArcFace trainer math from tests/test_engine_parity.py (model.py:459-501) —
the reference trainer in all but file location.  On this 1-core host the
torch engine runs at ~3-4 ex/s, so the flagship study is sized to ~2h of
torch compute per seed; --pilot skips the torch side entirely (flax-native
init) to validate corpus difficulty / convergence on the TPU in minutes
before committing those hours.

Run:  python tools/parity_e2e.py --trunk resnet34 --seeds 3
Writes PARITY_E2E.md at the repo root and prints the table.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# corpus / training configuration (one place, reported in the output doc)
N_SPK = 512
N_UTT = 8           # per speaker; last N_EVAL held out
N_EVAL = 4
SECONDS = 2.0
RATE = 16000
CROP_T = 100        # training crop (frames)
BATCH = 64
EPOCHS = 5           # AAM fine-tune epochs (phase 2)
EPOCHS_SOFTMAX = 10  # softmax pretrain epochs (phase 1)
LR0 = 0.1
SEED = 0
TRUNK = "resnet34"
NOISE = 500.0       # additive noise floor (peak signal is 3000)
AMP_J = 0.25        # within-speaker harmonic amplitude jitter (1±AMP_J)

# (torch stages, torch base channels) per trunk — must mirror
# pkr_tpu.models.resnet constructors (reference model.py:272-331)
TRUNKS = {"tiny_resnet": ([1, 1, 1, 1], 8), "resnet34": ([3, 4, 6, 3], 32)}


def synth_corpus(root):
    """Hundreds of distinguishable synthetic 'speakers'.  Reuses an already
    materialized corpus dir (same globals) so repeated pilots skip the
    several-minute synthesis on this 1-core host.

    At 512 speakers a pure f0 grid is useless (spacing << jitter), so each
    speaker is a point in a higher-dimensional timbre space: f0 plus a
    12-harmonic amplitude envelope with a spectral tilt.  Within-speaker
    variation (f0 jitter, per-harmonic amplitude jitter, random phase, a
    strong noise floor) keeps the task non-trivial: nearest-neighbour
    speakers in envelope space produce genuine confusions, so EER > 0 and
    the DET curve has a real low-FPR regime for minDCF to probe.
    """
    from pkr_tpu.io.datadir import DataDir
    from pkr_tpu.io.wav import write_wav

    import json

    done = os.path.join(root, ".done")
    # the cache is only valid for the SAME corpus-shaping parameters — a
    # reused --root with different knobs must re-synthesize, not silently
    # serve the stale corpus
    params = dict(seed=SEED, n_spk=N_SPK, n_utt=N_UTT, seconds=SECONDS,
                  noise=NOISE, amp_j=AMP_J)
    if os.path.exists(done):
        cached = json.load(open(done))
        if cached.get("params") == params:
            utt2spk = cached["utt2spk"]
            return sorted(utt2spk), utt2spk
        print(f"corpus cache params changed ({cached.get('params')} -> "
              f"{params}): re-synthesizing {root}", flush=True)
        feat_dir = os.path.join(os.path.dirname(root),
                                os.path.basename(root).replace("data_", "feats_"))
        import shutil

        shutil.rmtree(feat_dir, ignore_errors=True)
    rng = np.random.default_rng(SEED)
    os.makedirs(root, exist_ok=True)
    n = int(SECONDS * RATE)
    t = np.arange(n) / RATE
    utt2spk, wav = {}, {}
    n_harm = 12
    k = np.arange(1, n_harm + 1)
    for i in range(N_SPK):
        f0_s = rng.uniform(90.0, 280.0)
        amps_s = rng.uniform(0.05, 1.0, size=n_harm)
        tilt_s = rng.uniform(-0.6, 0.2)
        env_s = amps_s * (k ** tilt_s)
        for j in range(N_UTT):
            f0 = f0_s * rng.uniform(0.97, 1.03)
            amps = env_s * rng.uniform(1 - AMP_J, 1 + AMP_J, size=n_harm)
            phases = rng.uniform(0, 2 * np.pi, size=n_harm)
            sig = (amps[None, :] * np.sin(
                2 * np.pi * f0 * k[None, :] * t[:, None] + phases)).sum(axis=1)
            sig = 3000 * sig / np.abs(sig).max()
            sig += NOISE * rng.standard_normal(n)
            utt = f"spk{i:03d}-utt{j:02d}"
            path = os.path.join(root, f"{utt}.wav")
            write_wav(path, sig, RATE)
            utt2spk[utt] = f"spk{i:03d}"
            wav[utt] = path
    DataDir({"utt2spk": utt2spk, "wav.scp": wav}).make_spk2utt().save(root)
    with open(done, "w") as f:
        json.dump({"params": params, "utt2spk": utt2spk}, f)
    return sorted(utt2spk), utt2spk


def load_features(data_dir, feat_dir):
    import shutil

    from pkr_tpu.io.kaldi_ark import read_mat_scp
    from pkr_tpu.recipes.run import run_features

    scp = os.path.join(feat_dir, "feats.scp")
    want = set()
    with open(os.path.join(data_dir, "utt2spk")) as f:
        for line in f:
            want.add(line.split()[0])
    if os.path.exists(scp):
        feats = {u: m for u, m in read_mat_scp(scp)}
        if set(feats) >= want:
            return feats
        # A killed/hung extraction leaves a partial ark behind a valid scp;
        # trusting it crashes the schedule builder downstream — recompute.
        print(f"feature cache incomplete ({len(feats)}/{len(want)} utts): "
              f"re-extracting {feat_dir}", flush=True)
        shutil.rmtree(feat_dir)
    run_features(data_dir, feat_dir, batch=32, dither=0.0)
    return {u: m for u, m in read_mat_scp(scp)}


def build_schedule(feats, train_utts, spk_ids, rng, epochs):
    """Identical batches for both engines: (steps, B, 40, CROP_T) crops."""
    steps_per_epoch = max(1, len(train_utts) // BATCH)
    xs, ys = [], []
    for _ in range(epochs):
        order = rng.permutation(len(train_utts))
        for s in range(steps_per_epoch):
            rows, labs = [], []
            for kk in order[s * BATCH:(s + 1) * BATCH]:
                utt = train_utts[kk]
                f = feats[utt]  # (T, 40)
                start = rng.integers(0, max(f.shape[0] - CROP_T, 1))
                rows.append(f[start:start + CROP_T].T)  # (40, CROP_T)
                labs.append(spk_ids[utt])
            xs.append(np.stack(rows).astype(np.float32))
            ys.append(np.asarray(labs, np.int64))
    return np.stack(xs), np.stack(ys), steps_per_epoch


def make_torch_softmax_trainer(n_spk):
    """The reference softmax head: BN+ReLU+Linear on the 256-d embedding
    (model.py:360-363), trained with CE (imagenet_main.py) — module names
    (bn1/last) match the flax SpeakerModel(loss='softmax') so
    import_torch_checkpoint maps the whole state dict."""
    import torch
    import torch.nn as nn

    from test_torch_import_e2e import TSpeakerModel

    stages, base = TRUNKS[TRUNK]

    class TorchSoftmaxTrainer(nn.Module):
        def __init__(self):
            super().__init__()
            self.base = TSpeakerModel(stages, feat_dim=40, base=base)
            self.bn1 = nn.BatchNorm1d(256, momentum=0.1, eps=1e-5)
            self.last = nn.Linear(256, n_spk)

        def forward(self, x, labels):
            h = torch.relu(self.bn1(self.base(x)))
            return nn.functional.cross_entropy(self.last(h), labels)

    return TorchSoftmaxTrainer()


def _torch_run(tm, xs, ys, schedule_lr, tag):
    import torch

    opt = torch.optim.SGD(tm.parameters(), lr=float(schedule_lr[0]),
                          momentum=0.9, weight_decay=5e-4)
    t0 = time.time()
    for i in range(len(xs)):
        for g in opt.param_groups:
            g["lr"] = schedule_lr[i]
        opt.zero_grad()
        loss = tm(torch.from_numpy(xs[i]), torch.from_numpy(ys[i]))
        loss.backward()
        opt.step()
        if (i + 1) % 25 == 0:
            el = time.time() - t0
            print(f"  torch[{tag}] step {i + 1}/{len(xs)} loss "
                  f"{float(loss):.3f} ({el / (i + 1):.1f} s/step, eta "
                  f"{el / (i + 1) * (len(xs) - i - 1) / 60:.0f} min)",
                  flush=True)
    dt = time.time() - t0
    print(f"torch[{tag}]: {len(xs)} steps in {dt:.1f}s, final loss "
          f"{float(loss):.3f}", flush=True)
    return dt


def train_torch_two_phase(xs1, ys1, lr1, xs2, ys2, lr2, n_spk):
    """run_aam_v2.sh stages 7-8: softmax pretrain, then AAM fine-tune
    warm-started from the softmax trunk+fc1 (the head is discarded and the
    AAM weight drawn fresh — model.py loadParameters name-tolerant skip).
    Returns (aam trainer, phase-1 init sd, phase-2 AAM weight init, dt)."""
    import torch

    from test_engine_parity import TorchAAMTrainer

    torch.manual_seed(SEED)
    torch.set_num_threads(os.cpu_count() or 1)
    tm1 = make_torch_softmax_trainer(n_spk).train()
    init_sd = {k: v.clone() for k, v in tm1.state_dict().items()}
    dt = _torch_run(tm1, xs1, ys1, lr1, "softmax")

    tm2 = TorchAAMTrainer(tm1.base, n_spk).train()  # shared trained trunk
    aam_init = tm2.last.detach().clone()
    dt += _torch_run(tm2, xs2, ys2, lr2, "aam")
    return tm2, init_sd, aam_init, dt


def _pkr_model_state(loss, n_spk, init_sd=None):
    """Build a flax model+state for one phase; init_sd (a torch state dict
    with matching names) pins the init for identical-weights parity."""
    import jax
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.checkpoint import import_torch_checkpoint
    from pkr_tpu.train.state import create_train_state

    fm = SpeakerModel(spk_num=n_spk, feat_dim=40, trunk=TRUNK,
                      pooling="mean+std", loss=loss, dtype=jnp.float32)
    variables = fm.init(jax.random.key(SEED), jnp.zeros((1, 40, CROP_T)),
                        jnp.zeros((1,), jnp.int32), train=True)
    if init_sd is not None:
        variables = import_torch_checkpoint(init_sd, variables, verbose=False)
    state = create_train_state(fm, jax.random.key(SEED),
                               jnp.zeros((2, 40, CROP_T)),
                               jnp.zeros((2,), jnp.int32))
    return fm, state.replace(params=variables["params"],
                             batch_stats=variables["batch_stats"])


def _pkr_run(fm, state, xs, ys, schedule_lr, tag):
    import jax.numpy as jnp

    from pkr_tpu.train.loop import make_train_step

    _, step = make_train_step(fm)
    t0 = time.time()
    for i in range(len(xs)):
        state, metrics = step(state, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
                              jnp.asarray(schedule_lr[i], jnp.float32))
    loss = float(metrics["loss"])
    dt = time.time() - t0
    print(f"pkr_tpu[{tag}]: {len(xs)} steps in {dt:.1f}s, final loss "
          f"{loss:.3f}, final acc1 {float(metrics['acc1']):.3f}", flush=True)
    return state, dt


def _warm_start(variables_from, variables_to):
    """Name-intersection copy (reference loadParameters semantics,
    model.py:415-432): trunk+fc1 carry over, the head is re-drawn."""
    def walk(src, dst):
        out = {}
        for k, v in dst.items():
            if k in src and isinstance(v, dict):
                out[k] = walk(src[k], v)
            elif k in src and getattr(src[k], "shape", None) == v.shape:
                out[k] = src[k]
            else:
                out[k] = v
        return out

    return walk(variables_from, variables_to)


def train_pkr_two_phase(xs1, ys1, lr1, xs2, ys2, lr2, n_spk,
                        init_sd=None, aam_init=None):
    """Softmax pretrain then AAM fine-tune with the SAME warm-start rule
    as the torch engine (trained trunk+fc1 carried over, identical fresh
    AAM weight).  init_sd/aam_init=None (pilot) uses flax-native inits."""
    import jax
    import jax.numpy as jnp

    sd = None
    if init_sd is not None:
        sd = {k.replace("base.", ""): v for k, v in init_sd.items()}
    fm1, state1 = _pkr_model_state("softmax", n_spk, sd)
    state1, dt = _pkr_run(fm1, state1, xs1, ys1, lr1, "softmax")

    fm2, state2 = _pkr_model_state("AAM", n_spk)
    params = _warm_start(state1.params, jax.tree.map(lambda x: x,
                                                     state2.params))
    if aam_init is not None:
        import numpy as _np

        params = dict(params)
        params["aam_weight"] = jnp.asarray(_np.asarray(aam_init), jnp.float32)
    bstats = _warm_start(state1.batch_stats,
                         jax.tree.map(lambda x: x, state2.batch_stats))
    state2 = state2.replace(params=params, batch_stats=bstats)
    state2, dt2 = _pkr_run(fm2, state2, xs2, ys2, lr2, "aam")
    return fm2, state2, dt + dt2


def eval_embeddings_torch(tm, feats, utts, batch=64):
    import torch

    tm.base.eval()
    out = {}
    with torch.no_grad():
        for c in range(0, len(utts), batch):
            chunk = utts[c:c + batch]
            x = torch.from_numpy(np.stack(
                [feats[u].T for u in chunk]).astype(np.float32))
            emb = tm.base(x).numpy()
            out.update(zip(chunk, emb))
    return out


def eval_embeddings_pkr(fm, state, feats, utts, batch=256):
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel

    out = {}
    for c in range(0, len(utts), batch):
        chunk = utts[c:c + batch]
        x = jnp.asarray(np.stack([feats[u].T for u in chunk]).astype(np.float32))
        emb = fm.apply({"params": state.params,
                        "batch_stats": state.batch_stats},
                       x, method=SpeakerModel.embed)
        out.update(zip(chunk, np.asarray(emb)))
    return out


def score(embs, eval_utts, utt2spk):
    from pkr_tpu.eval.metrics import compute_eer, compute_min_dcf
    from pkr_tpu.eval.scoring import cosine_scores

    enroll, test = {}, {}
    first_eval = N_UTT - N_EVAL  # first held-out index enrolls the speaker
    for u in eval_utts:
        is_enroll = int(u.split("utt")[1]) == first_eval
        (enroll if is_enroll else test)[u] = embs[u]
    trials, labels = [], []
    for e in enroll:
        for t in test:
            trials.append((e, t))
            labels.append(1 if utt2spk[e] == utt2spk[t] else 0)
    scores = cosine_scores(enroll, test, trials)
    eer = compute_eer(scores.tolist(), labels)
    dcf1, _ = compute_min_dcf(scores.tolist(), labels, p_target=0.01)
    dcf2, _ = compute_min_dcf(scores.tolist(), labels, p_target=0.001)
    return np.asarray(scores), np.asarray(labels), eer, dcf1, dcf2


def bootstrap_metrics(scores, labels, n=500, seed=1):
    """Joint bootstrap CIs for EER and minDCF(0.01) over trial resamples."""
    from pkr_tpu.eval.metrics import compute_eer, compute_min_dcf

    rng = np.random.default_rng(seed)
    eers, dcfs = np.empty(n), np.empty(n)
    m = len(scores)
    for i in range(n):
        idx = rng.integers(0, m, m)
        if labels[idx].min() == labels[idx].max():  # degenerate resample
            idx = np.arange(m)
        s, l = scores[idx].tolist(), labels[idx].tolist()
        eers[i] = compute_eer(s, l)
        dcfs[i], _ = compute_min_dcf(s, l, p_target=0.01)
    return (np.percentile(eers, [2.5, 50, 97.5]),
            np.percentile(dcfs, [2.5, 50, 97.5]))


def _torch_phase_cached(root, xs1, ys1, lr1, xs2, ys2, lr2):
    """train_torch_two_phase behind a per-seed disk cache (param-stamped
    like the corpus cache): the ~55-min torch-CPU half runs at most once
    per seed, surviving pkr-phase crashes (TPU-tunnel outages) and
    enabling --torch-only pre-banking."""
    import torch

    from test_engine_parity import TorchAAMTrainer

    params = dict(seed=SEED, n_spk=N_SPK, n_utt=N_UTT, seconds=SECONDS,
                  noise=NOISE, amp_j=AMP_J, epochs=EPOCHS,
                  epochs_softmax=EPOCHS_SOFTMAX, batch=BATCH, crop=CROP_T,
                  lr=LR0, trunk=TRUNK)
    cache = os.path.join(root, f"torch_s{SEED}.pt")
    if os.path.exists(cache):
        try:
            blob = torch.load(cache, map_location="cpu", weights_only=False)
        except Exception as e:
            print(f"seed {SEED}: torch cache unreadable ({e!r}), retraining",
                  flush=True)
            blob = None
        if blob is not None and blob.get("params") == params:
            tm1 = make_torch_softmax_trainer(N_SPK)
            tm2 = TorchAAMTrainer(tm1.base, N_SPK)
            tm2.load_state_dict(blob["tm_sd"])
            print(f"seed {SEED}: torch phase from cache "
                  f"(orig {blob['t_torch']:.0f}s)", flush=True)
            return tm2, blob["init_sd"], blob["aam_init"], blob["t_torch"]
        if blob is not None:
            print(f"seed {SEED}: torch cache params changed, retraining",
                  flush=True)
    tm, init_sd, aam_init, t_torch = train_torch_two_phase(
        xs1, ys1, lr1, xs2, ys2, lr2, N_SPK)
    tmp = cache + ".tmp"
    torch.save(dict(params=params, tm_sd=tm.state_dict(), init_sd=init_sd,
                    aam_init=aam_init, t_torch=t_torch), tmp)
    os.replace(tmp, cache)
    return tm, init_sd, aam_init, t_torch


def run_once(root, pilot=False, torch_only=False):
    """One full run at the current globals; returns a result row dict
    (seeded by the SEED global: corpus, init and schedule all re-drawn per
    seed, so seeds are independent replicates).  pilot=True trains the
    pkr engine only (no torch) to validate corpus difficulty fast;
    torch_only=True trains/caches the torch half and returns None."""
    data_dir = os.path.join(root, f"data_s{SEED}")
    utts, utt2spk = synth_corpus(data_dir)
    feats = load_features(data_dir, os.path.join(root, f"feats_s{SEED}"))
    spks = sorted({s for s in utt2spk.values()})
    spk_idx = {s: i for i, s in enumerate(spks)}
    spk_ids = {u: spk_idx[s] for u, s in utt2spk.items()}
    train_utts = [u for u in utts if int(u.split("utt")[1]) < N_UTT - N_EVAL]
    eval_utts = [u for u in utts if int(u.split("utt")[1]) >= N_UTT - N_EVAL]

    rng = np.random.default_rng(SEED)

    def cosine_lr(spe, epochs, lr0, lr_final=0.0):
        # per-epoch cosine (train_resnet.py:206 CosineAnnealingLR semantics)
        return np.concatenate([
            np.full(spe, lr_final + 0.5 * (lr0 - lr_final)
                    * (1 + np.cos(np.pi * e / epochs)))
            for e in range(epochs)])

    # two-phase schedule, run_aam_v2.sh stages 7-8: softmax pretrain
    # (imagenet_main.py, cosine eta_min=0) then AAM fine-tune (cosine 0.1→0)
    xs1, ys1, spe = build_schedule(feats, train_utts, spk_ids, rng,
                                   EPOCHS_SOFTMAX)
    xs2, ys2, _ = build_schedule(feats, train_utts, spk_ids, rng, EPOCHS)
    lr1 = cosine_lr(spe, EPOCHS_SOFTMAX, LR0)
    lr2 = cosine_lr(spe, EPOCHS, LR0)
    print(f"seed {SEED}: {len(train_utts)} train / {len(eval_utts)} eval "
          f"utts, {len(xs1)}+{len(xs2)} steps (softmax+AAM)", flush=True)

    if pilot:
        fm, state, t_pkr = train_pkr_two_phase(xs1, ys1, lr1, xs2, ys2, lr2,
                                               N_SPK)
        emb_p = eval_embeddings_pkr(fm, state, feats, eval_utts)
        s_p, l_p, eer_p, dcf1_p, dcf2_p = score(emb_p, eval_utts, utt2spk)
        print(f"PILOT seed {SEED}: EER {eer_p:.4f}  minDCF(.01) {dcf1_p:.4f}"
              f"  minDCF(.001) {dcf2_p:.4f}  ({len(s_p)} trials, "
              f"{int(np.sum(l_p))} target)")
        return dict(seed=SEED, eer_p=eer_p, dcf1_p=dcf1_p, dcf2_p=dcf2_p)

    tm, init_sd, aam_init, t_torch = _torch_phase_cached(
        root, xs1, ys1, lr1, xs2, ys2, lr2)
    if torch_only:
        # CPU-only mode: the torch half is banked in the per-seed cache;
        # a later non-torch-only invocation replays it in seconds and runs
        # the (TPU) pkr half — lets the study make progress while the TPU
        # tunnel is down and keeps the chip's usage to one short window
        print(f"seed {SEED}: torch phase cached ({t_torch:.0f}s), "
              "pkr half deferred", flush=True)
        return None
    fm, state, t_pkr = train_pkr_two_phase(xs1, ys1, lr1, xs2, ys2, lr2,
                                           N_SPK, init_sd, aam_init)

    emb_t = eval_embeddings_torch(tm, feats, eval_utts)
    emb_p = eval_embeddings_pkr(fm, state, feats, eval_utts)
    s_t, l_t, eer_t, dcf1_t, dcf2_t = score(emb_t, eval_utts, utt2spk)
    s_p, l_p, eer_p, dcf1_p, dcf2_p = score(emb_p, eval_utts, utt2spk)
    ci_t, dci_t = bootstrap_metrics(s_t, l_t)
    ci_p, dci_p = bootstrap_metrics(s_p, l_p)
    return dict(seed=SEED, n_trials=len(s_t), n_target=int(np.sum(l_t)),
                eer_t=eer_t, dcf1_t=dcf1_t, dcf2_t=dcf2_t, ci_t=ci_t,
                dci_t=dci_t,
                eer_p=eer_p, dcf1_p=dcf1_p, dcf2_p=dcf2_p, ci_p=ci_p,
                dci_p=dci_p,
                t_torch=t_torch, t_pkr=t_pkr,
                steps=len(xs1) + len(xs2))


def chaos_calibration(root):
    """Same-engine sensitivity curve: rerun the pkr two-phase recipe on one
    seed with every init weight multiplied by (1 + eps*N(0,1)) for a ladder
    of eps, identical schedule otherwise.  Two engines that implement the
    same math with different op lowerings (conv algorithm, reduction order)
    inject relative noise of roughly 1e-7..1e-6 per step, so the eps at
    which EER/minDCF move by the observed per-seed torch-vs-pkr gaps tells
    us whether those gaps are attributable to float-level trajectory
    divergence (PARITY_E2E.md's paired-test rationale, made quantitative)."""
    import jax
    import jax.numpy as jnp

    data_dir = os.path.join(root, f"data_s{SEED}")
    utts, utt2spk = synth_corpus(data_dir)
    feats = load_features(data_dir, os.path.join(root, f"feats_s{SEED}"))
    spks = sorted({s for s in utt2spk.values()})
    spk_idx = {s: i for i, s in enumerate(spks)}
    spk_ids = {u: spk_idx[s] for u, s in utt2spk.items()}
    train_utts = [u for u in utts if int(u.split("utt")[1]) < N_UTT - N_EVAL]
    eval_utts = [u for u in utts if int(u.split("utt")[1]) >= N_UTT - N_EVAL]
    rng = np.random.default_rng(SEED)
    spe = max(1, len(train_utts) // BATCH)
    xs1, ys1, _ = build_schedule(feats, train_utts, spk_ids, rng,
                                 EPOCHS_SOFTMAX)
    xs2, ys2, _ = build_schedule(feats, train_utts, spk_ids, rng, EPOCHS)

    def cos(epochs):
        return np.concatenate([
            np.full(spe, 0.5 * LR0 * (1 + np.cos(np.pi * e / epochs)))
            for e in range(epochs)])

    def jiggle(tree, eps, nrng):
        # Multiplicative Gaussian noise on every weight — the closest
        # same-engine analogue of a different op lowering's rounding noise.
        return jax.tree.map(
            lambda x: x * (1.0 + eps * jnp.asarray(
                nrng.standard_normal(x.shape), x.dtype)), tree)

    rows, emb0 = [], None
    for eps in (0.0, 1e-7, 1e-6, 1e-5, 1e-4):
        tag = f"eps{eps:.0e}" if eps else "baseline"
        fm1, st1 = _pkr_model_state("softmax", N_SPK)
        if eps:
            nrng = np.random.default_rng(12345)  # same noise DIRECTION per eps
            st1 = st1.replace(params=jiggle(st1.params, eps, nrng))
        st1, _ = _pkr_run(fm1, st1, xs1, ys1, cos(EPOCHS_SOFTMAX),
                          f"sm-{tag}")
        fm2, st2 = _pkr_model_state("AAM", N_SPK)
        params = _warm_start(st1.params, jax.tree.map(lambda x: x,
                                                      st2.params))
        bstats = _warm_start(st1.batch_stats,
                             jax.tree.map(lambda x: x, st2.batch_stats))
        st2 = st2.replace(params=params, batch_stats=bstats)
        st2, _ = _pkr_run(fm2, st2, xs2, ys2, cos(EPOCHS), f"aam-{tag}")
        emb = eval_embeddings_pkr(fm2, st2, feats, eval_utts)
        _s, _l, eer, dcf1, dcf2 = score(emb, eval_utts, utt2spk)
        if emb0 is None:
            emb0, demb = emb, 0.0
        else:
            demb = float(np.mean([
                np.max(np.abs(np.asarray(emb[u]) - np.asarray(emb0[u])))
                for u in eval_utts]))
        print(f"chaos[{tag}]: EER {eer:.4f}  minDCF(.01) {dcf1:.4f}  "
              f"minDCF(.001) {dcf2:.4f}  mean-max|demb| {demb:.2e}",
              flush=True)
        rows.append((eps, eer, dcf1, dcf2, demb))
    base = rows[0]
    print(f"CHAOS CALIBRATION seed {SEED} "
          f"(same engine, init x(1+eps*N(0,1)), {len(xs1)+len(xs2)} steps):",
          flush=True)
    for eps, eer, dcf1, dcf2, demb in rows[1:]:
        print(f"  eps={eps:.0e}: |dEER| {abs(eer-base[1]):.4f}  "
              f"|dminDCF(.01)| {abs(dcf1-base[2]):.4f}  "
              f"|dminDCF(.001)| {abs(dcf2-base[3]):.4f}  "
              f"mean-max|demb| {demb:.2e}", flush=True)


def main():
    global SEED, N_SPK, N_UTT, EPOCHS, TRUNK, BATCH, CROP_T, NOISE, AMP_J, LR0, EPOCHS_SOFTMAX

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=1,
                    help="independent replicates (corpus+init+schedule)")
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--spk", type=int, default=N_SPK)
    ap.add_argument("--utt", type=int, default=N_UTT)
    ap.add_argument("--epochs", type=int, default=EPOCHS,
                    help="AAM fine-tune epochs (phase 2)")
    ap.add_argument("--softmax-epochs", type=int,
                    default=EPOCHS_SOFTMAX)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--crop", type=int, default=CROP_T)
    ap.add_argument("--noise", type=float, default=NOISE)
    ap.add_argument("--amp-jitter", type=float, default=AMP_J)
    ap.add_argument("--lr", type=float, default=LR0)
    ap.add_argument("--root", type=str, default=None,
                    help="reusable corpus/feature root (pilots)")
    ap.add_argument("--trunk", type=str, default=TRUNK, choices=sorted(TRUNKS))
    ap.add_argument("--pilot", action="store_true",
                    help="pkr engine only (no torch): fast difficulty check")
    ap.add_argument("--torch-only", action="store_true",
                    help="train+cache the torch half per seed and skip the "
                         "pkr half (no TPU needed); a later normal run "
                         "replays the cache in seconds")
    ap.add_argument("--chaos", action="store_true",
                    help="chaos calibration: run the pkr engine twice on "
                         "one seed, identical except a 1e-7 init "
                         "perturbation — the metric deltas bound what "
                         "trajectory divergence alone produces")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "PARITY_E2E.md"))
    args = ap.parse_args()
    N_SPK, N_UTT, EPOCHS = args.spk, args.utt, args.epochs
    EPOCHS_SOFTMAX = args.softmax_epochs
    TRUNK, BATCH, CROP_T, NOISE = args.trunk, args.batch, args.crop, args.noise
    AMP_J = args.amp_jitter
    LR0 = args.lr

    from pkr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if args.torch_only:
        # --torch-only promises "no TPU needed", but a seed with a cold
        # feature cache goes through run_features (jax): pin jax to CPU so
        # feature extraction works with the TPU tunnel down.  Per-seed
        # features are shared by both engines from the on-disk cache, so
        # which backend extracted them cannot bias the paired comparison.
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tempfile

    root = args.root or tempfile.mkdtemp(prefix="parity_e2e_")
    os.makedirs(root, exist_ok=True)
    import json

    rows_path = os.path.join(root, "parity_rows.jsonl")

    def _load_rows():
        by_seed = {}
        if os.path.exists(rows_path):
            for line in open(rows_path):
                r = json.loads(line)
                for k in ("ci_t", "ci_p", "dci_t", "dci_p"):
                    r[k] = np.asarray(r[k])
                by_seed[r["seed"]] = r  # latest wins
        return [by_seed[k] for k in sorted(by_seed)]

    if args.chaos:
        SEED = args.seed_start
        chaos_calibration(root)
        return
    for s in range(args.seed_start, args.seed_start + args.seeds):
        SEED = s
        row = run_once(root, pilot=args.pilot, torch_only=args.torch_only)
        if row is None:
            continue
        if not args.pilot:
            with open(rows_path, "a") as f:
                f.write(json.dumps(
                    {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                     for k, v in row.items()}) + "\n")
            # merge with any previously persisted seeds (multi-invocation
            # studies append rows; the doc always shows them all)
            _write_doc(_load_rows(), args)
    if args.pilot:
        return


def _write_doc(rows, args):
    r = rows[0]
    t_torch, t_pkr, xs_len = r["t_torch"], r["t_pkr"], r["steps"]

    lines = [
        "# PARITY_E2E — end-to-end quality parity vs the reference torch engine",
        "",
        f"Generated by `tools/parity_e2e.py --trunk {TRUNK} --seeds "
        f"{args.seeds} --spk {N_SPK} --utt {N_UTT} --softmax-epochs "
        f"{EPOCHS_SOFTMAX} --epochs {EPOCHS} "
        f"--batch {BATCH} --crop {CROP_T}` ({len(rows)} seed(s) so far).",
        "Per seed, both engines trained from IDENTICAL initial weights on",
        f"an identical batch schedule: {N_SPK} synthetic speakers x "
        f"{N_UTT - N_EVAL} train utts",
        f"({SECONDS}s each), **{TRUNK}** trunk + mean+std pooling, with the",
        "reference's TWO-PHASE recipe (run_aam_v2.sh stages 7-8): softmax",
        f"pretrain (BN+ReLU+Linear head, {EPOCHS_SOFTMAX} epochs, cosine LR "
        f"{LR0}->0),",
        "then AAM fine-tune (m=0.2, s=30) warm-started from the softmax",
        f"trunk+fc1 with an identical fresh AAM weight, {EPOCHS} epochs.",
        f"SGD momentum 0.9 / wd 5e-4, {xs_len} total steps, batch {BATCH}, "
        f"{CROP_T}-frame",
        "crops.  Held-out trials: 1 enroll + "
        f"{N_EVAL - 1} test utts per speaker, all",
        f"pairs = {r['n_trials']} trials ({r['n_target']} target / "
        f"{r['n_trials'] - r['n_target']} nontarget — enough nontarget mass",
        "that the p=0.01 operating point is measurable, not saturated).",
        "Seeds are independent replicates (fresh corpus, init and schedule).",
        "The torch engine is the reference architecture/trainer math",
        "(tests/test_torch_import_e2e.py, tests/test_engine_parity.py;",
        "reference scripts/model.py:334-501 + train_resnet.py:290-345).",
        "No real VoxCeleb/MUSAN audio exists in this environment (searched",
        "the whole image), so the north-star EER 3.043 / minDCF 0.3129",
        "(run.sh:361-363) cannot be reproduced directly; this study is the",
        "strongest available substitute: same architecture, recipe and",
        "optimizer math on both engines, identical data, at a scale where",
        "both operating points are informative.",
        "",
        "| seed | torch EER [95% CI] | pkr_tpu EER [95% CI] | torch "
        "minDCF.01 [95% CI] | pkr minDCF.01 [95% CI] | minDCF.001 t/p | "
        "CIs overlap |",
        "|---|---|---|---|---|---|---|",
    ]
    overlaps = []
    for r in rows:
        ov_e = (r["ci_t"][0] <= r["ci_p"][2] and r["ci_p"][0] <= r["ci_t"][2])
        ov_d = (r["dci_t"][0] <= r["dci_p"][2]
                and r["dci_p"][0] <= r["dci_t"][2])
        overlaps.append(ov_e and ov_d)
        lines.append(
            f"| {r['seed']} | {r['eer_t']:.4f} [{r['ci_t'][0]:.4f}, "
            f"{r['ci_t'][2]:.4f}] | {r['eer_p']:.4f} [{r['ci_p'][0]:.4f}, "
            f"{r['ci_p'][2]:.4f}] | {r['dcf1_t']:.4f} [{r['dci_t'][0]:.4f}, "
            f"{r['dci_t'][2]:.4f}] | {r['dcf1_p']:.4f} [{r['dci_p'][0]:.4f}, "
            f"{r['dci_p'][2]:.4f}] | {r['dcf2_t']:.4f}/{r['dcf2_p']:.4f} | "
            f"{'yes' if (ov_e and ov_d) else 'NO'} |")
    et = np.asarray([r["eer_t"] for r in rows])
    ep = np.asarray([r["eer_p"] for r in rows])
    dt_ = np.asarray([r["dcf1_t"] for r in rows])
    dp = np.asarray([r["dcf1_p"] for r in rows])
    lines += [
        "",
        f"Wall clock per seed: torch-CPU {t_torch / 60:.1f} min, pkr_tpu "
        f"{t_pkr:.1f}s (same {xs_len} steps).",
        "",
    ]
    if len(rows) > 1:
        spread = max(et.std(ddof=1), ep.std(ddof=1), 1e-9)
        dspread = max(dt_.std(ddof=1), dp.std(ddof=1), 1e-9)
        lines += [
            f"Across {len(rows)} seeds: mean EER torch {et.mean():.4f} "
            f"(sd {et.std(ddof=1):.4f}) vs pkr_tpu {ep.mean():.4f} "
            f"(sd {ep.std(ddof=1):.4f}); engine gap "
            f"{abs(et.mean() - ep.mean()):.4f} = "
            f"{abs(et.mean() - ep.mean()) / spread:.2f}x the seed sd.  "
            f"Mean minDCF(.01) torch {dt_.mean():.4f} (sd "
            f"{dt_.std(ddof=1):.4f}) vs pkr_tpu {dp.mean():.4f} (sd "
            f"{dp.std(ddof=1):.4f}); gap {abs(dt_.mean() - dp.mean()):.4f} = "
            f"{abs(dt_.mean() - dp.mean()) / dspread:.2f}x the seed sd.",
            "",
        ]
    saturated = float(max(dt_.max(), dp.max())) > 0.9
    sat_note = (", and minDCF(p=0.01) is non-saturated (all values < 0.9)"
                if not saturated else
                "; WARNING: a minDCF(.01) value exceeds 0.9 — partially "
                "saturated")
    if all(overlaps):
        verdict = (f"bootstrap CIs overlap on {sum(overlaps)}/{len(rows)} "
                   "seeds for BOTH EER and minDCF(p=0.01)" + sat_note +
                   " — quality parity holds at the flagship configuration.")
    elif len(rows) >= 3:
        # per-seed trial-resampling CIs are NARROWER than engine-trajectory
        # chaos: two engines from identical inits diverge numerically over
        # hundreds of f32 steps (reduction orders, BN stat accumulation), so
        # the distribution-level paired test across seeds is the meaningful
        # one — the same spread two reruns of the reference itself show.
        ge = et - ep
        gd = dt_ - dp
        n = len(rows)
        se_e = ge.std(ddof=1) / np.sqrt(n)
        se_d = gd.std(ddof=1) / np.sqrt(n)
        ok_e = abs(ge.mean()) <= 2.0 * se_e
        ok_d = abs(gd.mean()) <= 2.0 * se_d
        # BASELINE.md's quality target is "within 0.1% absolute" — claim it
        # ONLY when the whole 2·SE interval fits inside ±0.001, never from
        # the point estimate (VERDICT r3 weak #2)
        target = 0.001
        inside = abs(ge.mean()) + 2.0 * se_e <= target
        target_note = (
            f"  The EER-gap interval |{ge.mean():+.4f}| + {2 * se_e:.4f} "
            + (f"fits inside BASELINE.md's 0.1% absolute target — the "
               f"target is met with statistical cover at n={n} seeds."
               if inside else
               f"does not yet fit inside BASELINE.md's 0.1% absolute "
               f"target (needs ≈{int(np.ceil((2 * ge.std(ddof=1) / max(target - abs(ge.mean()), 1e-9)) ** 2))} "
               "seeds at the current spread) — the claim stays at "
               "'indistinguishable from zero at this interval', not "
               "'inside 0.1%'."))
        verdict = (
            f"per-seed CIs overlap on {sum(overlaps)}/{len(rows)} seeds — "
            "trial-resampling CIs are narrower than the engines' numerical "
            "trajectory divergence (identical inits, hundreds of f32 "
            "steps), so the paired cross-seed test is primary: mean EER "
            f"gap (torch − pkr) {ge.mean():+.4f} ± {2 * se_e:.4f} (2·SE), "
            f"mean minDCF gap {gd.mean():+.4f} ± {2 * se_d:.4f}" + sat_note +
            " — "
            + ("neither gap is distinguishable from zero: no systematic "
               "engine advantage; quality parity holds at the "
               "distribution level." if ok_e and ok_d else
               "a gap is statistically nonzero — investigate.")
            + target_note)
    else:
        verdict = (f"CIs overlap on only {sum(overlaps)}/{len(rows)} seeds "
                   "and too few seeds for the paired test — run more seeds.")
    lines += ["**Verdict:** " + verdict, ""]
    doc = "\n".join(lines)
    # hand-written appendix sections (e.g. the chaos calibration) live after
    # the first '## ' heading — carry them across regenerations
    if os.path.exists(args.out):
        old = open(args.out).read()
        idx = old.find("\n## ")
        if idx >= 0:
            doc = doc.rstrip("\n") + "\n" + old[idx:]
    with open(args.out, "w") as f:
        f.write(doc)
    print(doc, flush=True)


if __name__ == "__main__":
    main()
