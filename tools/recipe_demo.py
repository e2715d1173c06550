"""Moderate-scale full-recipe demo on the real chip: every stage, timed.

The run_aam_v2.sh role end to end at a scale past the unit-test smokes:
a disjoint-speaker eval set, a MUSAN/RIR-augmented 2x train corpus
(batched on-device mixing), HBM-resident device-cache training of the
REAL ResNet-34 r-vector, mesh-ready extraction, adaptive S-norm scoring,
EER/minDCF — with per-stage wall clock, so "the whole framework works at
scale on TPU" is a table, not a claim.

Usage: python tools/recipe_demo.py [--train-spk 48] [--epochs 8]
Appends nothing; prints the summary (copy into docs by hand).
"""

import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 16000


def synth_speakers(root, spk_names, n_utt, seconds, seed):
    """Speaker identity = a fixed harmonic-amplitude envelope ("vocal
    tract"); pitch is drawn PER UTTERANCE from a range shared by all
    speakers.  Disjoint-speaker verification is then a real envelope-
    matching task (identity-by-pitch would make unseen test speakers
    unverifiable by construction)."""
    from pkr_tpu.io.datadir import DataDir
    from pkr_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    utt2spk, wav = {}, {}
    n_harm = 12
    for spk in spk_names:
        import zlib

        srng = np.random.default_rng(zlib.crc32(spk.encode()))  # stable
        envelope = srng.uniform(0.05, 1.0, size=n_harm)  # the identity
        for j in range(n_utt):
            n = int(seconds * RATE) + int(rng.integers(0, RATE))
            t = np.arange(n) / RATE
            f0 = rng.uniform(110.0, 220.0)  # shared pitch range
            vib = 1.0 + 0.01 * np.sin(2 * np.pi * rng.uniform(3, 7) * t)
            sig = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t * vib
                                 + rng.uniform(0, 6))
                      for k, a in enumerate(envelope)
                      if f0 * (k + 1) < 7000)
            sig = 3000 * sig / np.abs(sig).max()
            sig += 300 * rng.standard_normal(n)
            utt = f"{spk}-utt{j:03d}"
            path = os.path.join(root, f"{utt}.wav")
            write_wav(path, sig.astype(np.float32), RATE)
            utt2spk[utt] = spk
            wav[utt] = path
    dd = DataDir({"utt2spk": utt2spk, "wav.scp": wav}).make_spk2utt()
    dd.save(root)
    return dd


def build_pools(seed=1):
    from pkr_tpu.recipes.augment_dir import AugmentPools

    rng = np.random.default_rng(seed)

    def pool(k, sec):
        return AugmentPools.from_wavs(
            [rng.normal(0, 1500, int(sec * RATE)).astype(np.float32)
             for _ in range(k)], int(sec * RATE))

    rirs = [np.r_[np.zeros(rng.integers(16, 128), np.float32), 1.0,
                  (rng.normal(0, 0.08, 1200)
                   * np.exp(-np.arange(1200) / 300.0)).astype(np.float32)]
            for _ in range(16)]
    return AugmentPools(noise=pool(24, 5.0), music=pool(24, 6.0),
                        speech=pool(32, 4.0),
                        rirs=AugmentPools.from_wavs(rirs, int(0.12 * RATE)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-spk", type=int, default=48)
    ap.add_argument("--test-spk", type=int, default=16)
    ap.add_argument("--train-utt", type=int, default=24)
    ap.add_argument("--test-utt", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--root", default="/tmp/pkr_recipe_demo")
    args = ap.parse_args()

    import jax

    from pkr_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import dataclasses

    from pkr_tpu.config import Config, EvalConfig, ModelConfig, TrainConfig
    from pkr_tpu.io.datadir import DataDir
    from pkr_tpu.recipes import run as recipe
    from pkr_tpu.recipes.augment_dir import augment_data_dir
    from pkr_tpu.recipes.voxceleb import write_trials

    shutil.rmtree(args.root, ignore_errors=True)
    train_spks = [f"spk{i:03d}" for i in range(args.train_spk)]
    test_spks = [f"spk{i:03d}" for i in
                 range(args.train_spk, args.train_spk + args.test_spk)]
    t0 = time.time()
    train_dd = synth_speakers(os.path.join(args.root, "data/train"),
                              train_spks, args.train_utt, args.seconds, 0)
    test_dd = synth_speakers(os.path.join(args.root, "data/test"),
                             test_spks, args.test_utt, args.seconds, 1)
    # 2x augmented train corpus (run.sh:162-164 composition)
    aug = augment_data_dir(train_dd, seed=0)
    aug_dir = os.path.join(args.root, "data/train_aug")
    aug.save(aug_dir)
    # utt-utt trials (VoxCeleb style): utt000 of each test speaker enrolls,
    # the rest are test sides; full cross
    test_u2s = test_dd["utt2spk"]
    enr = sorted(u for u in test_u2s if u.endswith("utt000"))
    tst = sorted(u for u in test_u2s if not u.endswith("utt000"))
    trials = [(e, t, "target" if test_u2s[e] == test_u2s[t] else "nontarget")
              for e in enr for t in tst]
    trials_path = os.path.join(args.root, "data/test/trials")
    write_trials(trials_path, trials)
    t_prep = time.time() - t0
    n_train = aug.num_utts

    cfg = Config(
        model=ModelConfig(trunk="resnet34", loss="AAM", pooling="mean+std"),
        train=TrainConfig(epochs=args.epochs, batch_size=args.batch, lr=0.1,
                          chunk_size=(200,), seed=0, print_freq=20,
                          device_cache=True),
        eval=EvalConfig(backend="snorm", bucket_quantum=100, max_len=700,
                        batch_size=32, topk=12),
    )

    exp = os.path.join(args.root, "exp")
    feat_dir = os.path.join(exp, "feats")
    test_feat_dir = os.path.join(exp, "feats_test")
    pools = build_pools()

    stages = {}
    t0 = time.time()
    recipe.run_features(aug_dir, feat_dir, pools=pools, seed=0)
    recipe.run_features(os.path.join(args.root, "data/test"), test_feat_dir,
                        seed=0)
    stages["1 features (aug 2x + test)"] = time.time() - t0

    t0 = time.time()
    num_spk = recipe.run_split(feat_dir, aug_dir, min_frames=200,
                               cv_fraction=0.05, seed=0)
    stages["2 split"] = time.time() - t0

    t0 = time.time()
    recipe.run_train(cfg, feat_dir, exp)
    stages["3 train"] = time.time() - t0

    t0 = time.time()
    recipe.run_extract(cfg, feat_dir, exp,
                       os.path.join(feat_dir, "train", "feats.scp"),
                       "train.iv")
    recipe.run_extract(cfg, feat_dir, exp,
                       os.path.join(test_feat_dir, "feats.scp"), "test.iv")
    stages["4 extract"] = time.time() - t0

    t0 = time.time()
    recipe.run_backend_stats(cfg, exp, aug_dir)
    stages["5 backend stats"] = time.time() - t0

    t0 = time.time()
    cohort_u2s = DataDir.load(aug_dir, names=("utt2spk",))["utt2spk"]
    results = recipe.run_score(
        cfg, exp, trials_path, os.path.join(exp, "test.iv"),
        os.path.join(exp, "test.iv"), cohort_ark=os.path.join(exp, "train.iv"),
        cohort_utt2spk=cohort_u2s)
    stages["6 score (snorm)"] = time.time() - t0

    total = t_prep + sum(stages.values())
    print("\n=== recipe_demo summary ===")
    print(f"corpus: {args.train_spk} train spk x {args.train_utt} utts x2 "
          f"augmented = {n_train} train utts ({num_spk} classes), "
          f"{args.test_spk} DISJOINT test spk x {args.test_utt} utts, "
          f"{args.seconds:.0f}-{args.seconds + 1:.0f}s each")
    print(f"model: ResNet-34 r-vector, AAM, device-cache training, "
          f"{args.epochs} epochs batch {args.batch}")
    for k, v in stages.items():
        print(f"  stage {k}: {v:.1f}s")
    print(f"  host prep (wav synth + manifests): {t_prep:.1f}s")
    print(f"  TOTAL: {total:.1f}s")
    print(f"results: {results}")


if __name__ == "__main__":
    main()
