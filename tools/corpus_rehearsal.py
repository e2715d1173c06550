"""Corpus-scale rehearsal: the FULL driver (stages 0-6) at ~100k utterances
/ 2k speakers on one chip, per-stage wall clock + peak HBM recorded.

Exercises, at a scale where they actually matter: full-corpus MUSAN pools
with rotating HBM shards (+ the rotation-wait metric), the RIR-set reverb
branch, the HBM device cache for training, the flash classifier (a second
stage-3 run), and the cohort-subset extraction knob (feature_pre.sh stage 6
role).  The reference runs this shape of job as run.sh stages 0-12 over
nj=30 CPU jobs + 8 GPUs.

Usage: python tools/corpus_rehearsal.py [--spk 2000] [--utt 25] [--out DIR]
Prints a per-stage table; copy into docs/architecture.md by hand.
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 16000


def synth_corpus(root, spk_names, n_utt, seed, sec_lo=3.2, sec_hi=4.2):
    """Harmonic-envelope speaker identities (see tools/recipe_demo.py):
    identity = fixed harmonic amplitudes, pitch drawn per utterance."""
    from pkr_tpu.io.datadir import DataDir
    from pkr_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    utt2spk, wav = {}, {}
    n_harm = 10
    t_max = np.arange(int(sec_hi * RATE)) / RATE
    for si, spk in enumerate(spk_names):
        env = rng.uniform(0.2, 1.0, n_harm)
        env /= env.sum()
        for j in range(n_utt):
            n = int(rng.uniform(sec_lo, sec_hi) * RATE)
            f0 = rng.uniform(95.0, 240.0)
            t = t_max[:n]
            sig = np.zeros(n, np.float32)
            for h in range(n_harm):
                sig += env[h] * np.sin(2 * np.pi * f0 * (h + 1) * t).astype(
                    np.float32)
            sig *= 6000.0
            sig += rng.normal(0, 250.0, n).astype(np.float32)
            u = f"{spk}-u{j:03d}"
            p = os.path.join(root, f"{u}.wav")
            write_wav(p, sig, RATE)
            utt2spk[u] = spk
            wav[u] = p
    dd = DataDir({"utt2spk": utt2spk, "wav.scp": wav}).make_spk2utt()
    return dd


def synth_musan(root, n_noise=120, n_music=60, n_speech=90, sec=8.0, seed=1):
    """MUSAN-layout tree (musan/{noise,music,speech}/sub/*.wav) sized so the
    byte-budgeted pool shards ROTATE during stage 1."""
    from pkr_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(int(sec * RATE)) / RATE
    for kind, k in (("noise", n_noise), ("music", n_music),
                    ("speech", n_speech)):
        d = os.path.join(root, kind, "sub0")
        os.makedirs(d, exist_ok=True)
        for i in range(k):
            if kind == "noise":
                w = rng.normal(0, 1500, len(t))
            elif kind == "music":
                w = 2000 * np.sin(2 * np.pi * rng.uniform(200, 800) * t)
                w += 800 * np.sin(2 * np.pi * rng.uniform(50, 200) * t)
            else:
                w = 1500 * np.sin(2 * np.pi * rng.uniform(90, 250) * t)
                w *= (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
            write_wav(os.path.join(d, f"{kind}{i:04d}.wav"),
                      w.astype(np.float32), RATE)
    return root


def synth_rir_tree(root, seed=2):
    from pkr_tpu.io.wav import write_wav

    rng = np.random.default_rng(seed)
    base = os.path.basename(root.rstrip("/"))
    for room_set, n_rirs, delay in (("smallroom", 8, 40),
                                    ("mediumroom", 8, 160)):
        d = os.path.join(root, "simulated_rirs", room_set)
        lines = []
        for r in range(2):
            os.makedirs(os.path.join(d, f"Room{r:03d}"), exist_ok=True)
            for i in range(n_rirs // 2):
                rel = (f"{base}/simulated_rirs/{room_set}/Room{r:03d}/"
                       f"r{i}.wav")
                rir = np.zeros(1600, np.float32)
                rir[0] = 1.0
                rir[delay + 11 * i + 7 * r] = 0.5
                rir += (0.02 * rng.standard_normal(1600)
                        * np.exp(-np.arange(1600) / 400.0)).astype(np.float32)
                write_wav(os.path.join(root, "..", rel), rir * 8000, RATE)
                lines.append(f"--rir-id {room_set[:2]}{r}{i:03d} "
                             f"--room-id {room_set[:2]}-room{r} {rel}")
        with open(os.path.join(d, "rir_list"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def peak_hbm_gb():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spk", type=int, default=2000)
    ap.add_argument("--utt", type=int, default=25)
    ap.add_argument("--test-spk", type=int, default=200)
    ap.add_argument("--test-utt", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/pkr_rehearsal")
    ap.add_argument("--skip-synth", action="store_true",
                    help="reuse an existing --out corpus")
    ap.add_argument("--resume", action="store_true",
                    help="skip stages already recorded in "
                         "rehearsal_times.json — lets an unattended retry "
                         "continue after a mid-run tunnel failure instead "
                         "of redoing completed device stages")
    ap.add_argument("--synth-only", action="store_true",
                    help="build the corpus and exit before any device work "
                         "(lets synthesis run while the TPU tunnel is busy)")
    args = ap.parse_args()

    from pkr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import dataclasses

    from pkr_tpu.config import Config
    from pkr_tpu.io.datadir import DataDir
    from pkr_tpu.recipes.augment_dir import augment_data_dir
    from pkr_tpu.recipes.run import main as run_main

    root = args.out
    data = os.path.join(root, "data")
    test_data = os.path.join(root, "data_test")
    musan = os.path.join(root, "musan")
    rir = os.path.join(root, "RIRS_NOISES")
    times_path = os.path.join(root, "rehearsal_times.json")
    times = {}
    if args.resume and os.path.exists(times_path):
        times = json.load(open(times_path))
        print(f"resume: {sorted(times)} already done")

    def record(key, dt):
        times[key] = dt
        with open(times_path + ".tmp", "w") as f:
            json.dump(times, f)
        os.replace(times_path + ".tmp", times_path)

    if not args.skip_synth:
        t0 = time.perf_counter()
        spks = [f"s{i:04d}" for i in range(args.spk)]
        dd = synth_corpus(os.path.join(root, "wavs"), spks, args.utt, seed=0)
        # disjoint test speakers
        tspks = [f"t{i:04d}" for i in range(args.test_spk)]
        tdd = synth_corpus(os.path.join(root, "wavs_test"), tspks,
                           args.test_utt, seed=10)
        tdd.save(test_data)
        # 2x corpus: every utterance gets one augmented copy (utt2aug)
        aug = augment_data_dir(dd, seed=0)
        aug.save(data)
        synth_musan(musan)
        synth_rir_tree(rir)
        # trials over the disjoint test set
        tu = sorted(tdd["utt2spk"])
        u2s = tdd["utt2spk"]
        with open(os.path.join(root, "trials"), "w") as f:
            for i, a in enumerate(tu):
                for b in tu[i + 1:]:
                    kind = "target" if u2s[a] == u2s[b] else "nontarget"
                    f.write(f"{a} {b} {kind}\n")
        record("synth", time.perf_counter() - t0)
        n_rows = len(aug["utt2spk"])
        print(f"corpus: {n_rows} train rows ({args.spk} spk), "
              f"{len(tu)} test utts ({args.test_spk} spk)  "
              f"[{times['synth']:.0f}s]")
    if args.synth_only:
        print("synth-only: corpus ready; rerun with --skip-synth for the "
              "device stages")
        return

    cfg = Config(
        model=dataclasses.replace(Config().model, loss="AAM"),
        train=dataclasses.replace(
            Config().train, epochs=args.epochs, batch_size=256,
            device_cache=True, print_freq=100),
        eval=dataclasses.replace(
            Config().eval, backend="snorm", batch_size=64,
            cohort_subset=10000),
        data=dataclasses.replace(
            Config().data, min_frames=150, cv_fraction=0.02,
            pool_shard_mb=8, pool_rotate_rows=2000),
    )
    cfg_path = os.path.join(root, "cfg.json")
    open(cfg_path, "w").write(cfg.to_json())
    exp = os.path.join(root, "exp")

    common = ["--config", cfg_path, "--data-dir", data,
              "--test-data-dir", test_data,
              "--trials", os.path.join(root, "trials"),
              "--exp-dir", exp, "--musan-dir", musan, "--rir-dir", rir]
    for stage in range(7):
        if args.resume and f"stage{stage}" in times:
            print(f"  stage {stage}: done in a previous attempt "
                  f"({times[f'stage{stage}']:.1f}s) — skipped")
            continue
        t0 = time.perf_counter()
        rc = run_main(common + ["--stage", str(stage),
                                "--stop-stage", str(stage)])
        assert rc == 0, (stage, rc)
        record(f"stage{stage}", time.perf_counter() - t0)
        print(f"  stage {stage}: {times[f'stage{stage}']:.1f}s  "
              f"peak_hbm={peak_hbm_gb()}GB")

    # flash-on train rerun (same feats, separate exp)
    exp_f = os.path.join(root, "exp_flash")
    os.makedirs(exp_f, exist_ok=True)
    if not os.path.exists(os.path.join(exp_f, "feats")):
        os.symlink(os.path.join(exp, "feats"), os.path.join(exp_f, "feats"))
    cfg_f = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, flash_aam=True))
    cfgf_path = os.path.join(root, "cfg_flash.json")
    open(cfgf_path, "w").write(cfg_f.to_json())
    if args.resume and "stage3_flash" in times:
        print(f"  stage 3 (flash): done in a previous attempt "
              f"({times['stage3_flash']:.1f}s) — skipped")
    else:
        t0 = time.perf_counter()
        rc = run_main(["--config", cfgf_path, "--data-dir", data,
                       "--exp-dir", exp_f, "--stage", "3",
                       "--stop-stage", "3"])
        assert rc == 0
        record("stage3_flash", time.perf_counter() - t0)
        print(f"  stage 3 (flash): {times['stage3_flash']:.1f}s  "
              f"peak_hbm={peak_hbm_gb()}GB")

    rot = os.path.join(exp, "feats", "stage1_metrics.jsonl")
    rotation = (open(rot).read().strip() if os.path.exists(rot) else "n/a")
    res_path = os.path.join(exp, "results.json")
    results = json.load(open(res_path)) if os.path.exists(res_path) else {}
    summary = {"times_s": {k: round(v, 1) for k, v in times.items()},
               "peak_hbm_gb": peak_hbm_gb(), "rotation": rotation,
               "results": results}
    print(json.dumps(summary, indent=1))
    with open(os.path.join(root, "rehearsal_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
