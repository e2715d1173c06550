"""Large-speaker-count classifier demo (VERDICT r1 stretch item 10).

Drives the REAL train CLI path (recipes.run.run_train — the function
`pkr-run --stage 3` dispatches to) with flash-AAM + the HBM device cache on
the single v5e chip at 7.3k and 500k synthetic speakers, and records the
steady-state step time of each.  Then proves the mesh composition (classifier
tensor-parallel over 'model' + data-parallel flash loss) through the same CLI
path on a virtual 8-device CPU mesh in a subprocess.

The corpus is fake (random CM-compressed features with random labels): the
subject under test is the classifier scaling, not convergence.

Run: python tools/bigspk_demo.py           (ambient TPU)
Appends nothing; prints a markdown table to paste into docs/architecture.md.
"""

from __future__ import annotations

import io
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRAIN, N_CV, FRAMES, FDIM = 768, 64, 220, 40


def make_featdir(root: str, n_spk: int, seed: int = 0) -> str:
    from pkr_tpu.io.kaldi_ark import write_ark_scp

    rng = np.random.default_rng(seed)
    feat_dir = os.path.join(root, f"feats_{n_spk}")
    for split, n in (("train", N_TRAIN), ("cv", N_CV)):
        d = os.path.join(feat_dir, split)
        os.makedirs(d, exist_ok=True)
        labels = rng.integers(0, n_spk, n)
        with write_ark_scp(os.path.join(d, "feats.ark"),
                           os.path.join(d, "feats.scp"), compress=True) as w, \
                open(os.path.join(d, "utt2spkid"), "w") as u:
            for i in range(n):
                utt = f"{split}{i:05d}"
                w.write(utt, rng.standard_normal(
                    (FRAMES, FDIM)).astype(np.float32))
                u.write(f"{utt} {labels[i]}\n")
    with open(os.path.join(feat_dir, "num_spk"), "w") as f:
        f.write(str(n_spk))
    return feat_dir


def run_cli_train(n_spk: int, root: str, epochs: int = 4):
    """The real stage-3 function, flash head + device cache, B=256."""
    from pkr_tpu.config import Config, ModelConfig, TrainConfig
    from pkr_tpu.recipes.run import run_train

    feat_dir = make_featdir(root, n_spk)
    exp_dir = os.path.join(root, f"exp_{n_spk}")
    cfg = Config(
        model=ModelConfig(trunk="resnet34", loss="AAM", pooling="mean+std"),
        train=TrainConfig(epochs=epochs, batch_size=256, chunk_size=(200,),
                          flash_aam=True, device_cache=True, print_freq=3,
                          keep_last_checkpoints=1, seed=0))
    buf = io.StringIO()
    real_write = sys.stdout.write

    def tee(s):
        buf.write(s)
        return real_write(s)

    sys.stdout.write = tee
    t0 = time.time()
    try:
        run_train(cfg, feat_dir, exp_dir)
    finally:
        sys.stdout.write = real_write
    wall = time.time() - t0
    # the loop's time meter: "time <val> (<avg>)" per print_freq window; the
    # LAST window of the run is steady state (first includes compiles)
    vals = re.findall(r"time ([0-9.]+) \(", buf.getvalue())
    if not vals:
        raise RuntimeError("no 'time' meter lines captured — did the train "
                           "loop's progress format change, or print_freq "
                           "exceed the step count?")
    return float(vals[-1]) * 1000, wall


def cpu_mesh_demo() -> str:
    """run_train with model_parallel=2 + flash on a virtual 8-CPU mesh."""
    script = f"""
import sys
sys.path.insert(0, {REPO!r})
import numpy as np
from pkr_tpu.config import Config, ModelConfig, TrainConfig
from pkr_tpu.recipes.run import run_train
sys.path.insert(0, {REPO!r} + "/tools")
from bigspk_demo import make_featdir
import tempfile, os
root = tempfile.mkdtemp()
feat_dir = make_featdir(root, 1024)
cfg = Config(model=ModelConfig(trunk="tiny_resnet", loss="AAM",
                               pooling="mean+std"),
             train=TrainConfig(epochs=1, batch_size=16, chunk_size=(64,),
                               flash_aam=True, model_parallel=2,
                               print_freq=1000, seed=0))
run_train(cfg, feat_dir, os.path.join(root, "exp"))
import jax
print("mesh-train OK devices=", jax.device_count())
"""
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    return [l for l in r.stdout.splitlines() if "mesh-train OK" in l][0]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    def positive(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError(f"speaker count must be >= 1: {v}")
        return n

    ap.add_argument("--speakers", type=positive, nargs="+",
                    default=[7325, 500_000])
    ap.add_argument("--skip-mesh", action="store_true")
    args = ap.parse_args()

    from pkr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    root = tempfile.mkdtemp(prefix="bigspk_")

    rows = []
    for n_spk in args.speakers:
        step_ms, wall = run_cli_train(n_spk, root)
        rows.append((n_spk, step_ms, wall))
        print(f"== {n_spk} speakers: {step_ms:.1f} ms/step "
              f"(wall {wall:.0f}s incl. compile)")
    if not args.skip_mesh:
        print(cpu_mesh_demo())
    print()
    print("| speakers | flash-AAM train step (B=256, CLI, device cache) |")
    print("|---|---|")
    for n_spk, step_ms, _ in rows:
        print(f"| {n_spk:,} | {step_ms:.1f} ms ({256 / step_ms * 1000:.0f} ex/s) |")


if __name__ == "__main__":
    main()
