"""Train-step roofline: is 41% conv-MFU speed-of-light for this trunk?

docs/architecture.md establishes the FORWARD trunk is lane-bound on v5e:
a conv with C output channels can use at most min(C,128)/128 of the MXU's
output lanes, and the recipe trunk (reference scripts/model.py:334-420,
channels 32/64/128/256) spends most of its early-stage FLOPs at 1/4 and
1/2 lane occupancy.  This tool extends that argument to the TRAINING step
(bench.py's train_mfu_pct): it

  1. computes the analytic lane-bound MFU ceiling for fwd+bwd (dgrad's
     output lanes are the layer's INPUT channels; wgrad's are the output
     channels), FLOP-weighted over every conv in resnet34 at the recipe
     crop (B x 40 mels x 200 frames, run_aam_v2.sh:71,98);
  2. measures fwd-only loss vs the full optimizer step on the real chip
     (D2H-synced windows: over this host's TPU tunnel block_until_ready
     returns early, so each window ends in a scalar fetch);
  3. prints one JSON line relating measured MFU to the ceiling.

If step_ms ~= 3x fwd_ms the backward runs at forward efficiency and the
forward per-stage roofline (architecture.md "speed-of-light" section)
transfers to training: the MFU gap to 100% is the architecture's lane
waste, not an implementation loss.

Usage: PYTHONPATH=.:$PYTHONPATH python tools/train_roofline.py [--iters N]
"""

import argparse
import json
import time

import numpy as np

B, F, T = 256, 40, 200
PEAK = 197e12  # v5e bf16 TFLOP/s


def conv_layers():
    """(flops_one_pass, c_in, c_out) for every conv in the recipe resnet34
    trunk at the training crop — stem, 3/4/6/3 blocks of two 3x3 convs,
    plus the 1x1 downsample at each stage transition (models/resnet.py)."""
    layers = []
    h, w = F, T

    def conv(cin, cout, k, h, w):
        layers.append((2.0 * k * k * cin * cout * h * w, cin, cout))

    conv(1, 32, 3, h, w)  # stem
    chans, blocks, strides = [32, 64, 128, 256], [3, 4, 6, 3], [1, 2, 2, 2]
    cin = 32
    for c, nb, s in zip(chans, blocks, strides):
        if s == 2:
            h, w = (h + 1) // 2, (w + 1) // 2
        for b in range(nb):
            conv(cin if b == 0 else c, c, 3, h, w)  # conv1
            conv(c, c, 3, h, w)                     # conv2
            if b == 0 and (s != 1 or cin != c):
                conv(cin, c, 1, h, w)               # downsample
        cin = c
    return layers


def lane_eff(c):
    return min(c, 128) / 128.0


def ceiling_mfu():
    """Lane-bound MFU ceiling for fwd / bwd / train (fwd+bwd).

    Per conv layer with FLOPs f: the forward pass and wgrad both emit
    C_out down the MXU lanes (eff e_out); dgrad emits C_in (eff e_in).
    Each pass costs f FLOPs, so the fastest possible wall is
    f*(2/e_out + 1/e_in) against 3f of useful work."""
    f_tot = e_fwd_t = e_train_t = 0.0
    for f, cin, cout in conv_layers():
        e_out, e_in = lane_eff(cout), lane_eff(max(cin, 1))
        f_tot += f
        e_fwd_t += f / e_out
        e_train_t += f * (2.0 / e_out + 1.0 / e_in)
    return f_tot / e_fwd_t, 3.0 * f_tot / e_train_t, 3.0 * f_tot


def measure(iters, repeats):
    import jax
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=7325, feat_dim=F, pooling="mean+std",
                         loss="AAM", trunk="resnet34")
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, F, T)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 7325, B))
    state = create_train_state(model, jax.random.key(0), feats[:2],
                               labels[:2])
    _, step = make_train_step(model)
    lr = jnp.asarray(0.05, jnp.float32)

    @jax.jit
    def fwd_only(params, batch_stats, feats, labels):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, feats,
            labels=labels, train=True, mutable=["batch_stats"])
        if isinstance(logits, tuple):
            logits = logits[0]
        lab1h = jax.nn.one_hot(labels, model.spk_num)
        return -jnp.mean(jnp.sum(lab1h * jax.nn.log_softmax(logits), -1))

    float(fwd_only(state.params, state.batch_stats, feats, labels))  # warm
    s, m = step(state, feats, labels, lr)
    float(m["loss"])

    def window(kind):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            if kind == "fwd":
                for _ in range(iters):
                    loss = fwd_only(state.params, state.batch_stats, feats,
                                    labels)
                float(loss)  # D2H sync — see module docstring
            else:
                s = state
                for _ in range(iters):
                    s, m = step(s, feats, labels, lr)
                float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        return best

    return window("fwd"), window("step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-measure", action="store_true",
                    help="print only the analytic ceilings")
    args = ap.parse_args()

    ceil_fwd, ceil_train, f_train = ceiling_mfu()
    out = {"ceiling_fwd_mfu_pct": round(100 * ceil_fwd, 1),
           "ceiling_train_mfu_pct": round(100 * ceil_train, 1)}
    if not args.no_measure:
        fwd_ms, step_ms = measure(args.iters, args.repeats)
        mfu = f_train * B / (step_ms / 1e3) / PEAK
        out.update({
            "fwd_ms": round(fwd_ms, 2), "step_ms": round(step_ms, 2),
            "step_over_fwd": round(step_ms / fwd_ms, 2),
            "train_mfu_pct": round(100 * mfu, 1),
            "pct_of_lane_bound_ceiling": round(100 * mfu / ceil_train, 1)})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
