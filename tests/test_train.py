"""Training-engine tests: optimizer parity with torch SGD, LR schedule,
a sharded train step on the 8-device mesh, checkpoint round trip, and the
torch-checkpoint importer."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pkr_tpu.models import SpeakerModel
from pkr_tpu.parallel import make_mesh, batch_sharding
from pkr_tpu.train.state import cosine_epoch_lr, create_train_state, make_optimizer
from pkr_tpu.train.loop import make_train_step, make_eval_step, cross_entropy, topk_correct
from pkr_tpu.train.checkpoint import (import_torch_checkpoint, restore_checkpoint,
                                      save_checkpoint)


def test_cosine_epoch_lr_matches_torch():
    """CosineAnnealingLR(T_max=30, eta_min=lr_final) values at epoch starts
    (train_resnet.py:206)."""
    import math

    lr0, lrf, T = 0.1, 0.001, 30
    sched = cosine_epoch_lr(lr0, T, lrf)
    for epoch in range(T + 1):
        ref = lrf + (lr0 - lrf) * (1 + math.cos(math.pi * epoch / T)) / 2
        assert abs(float(sched(epoch)) - ref) < 1e-7


def test_sgd_matches_torch():
    """optax chain(add_decayed_weights, sgd+momentum) ≡ torch.optim.SGD
    (momentum 0.9, wd 5e-4) over several steps."""
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=0.1, momentum=0.9, weight_decay=5e-4)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = make_optimizer(momentum=0.9, weight_decay=5e-4)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    state.hyperparams["learning_rate"] = jnp.asarray(0.1)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_metrics_helpers():
    logits = jnp.asarray([[5.0, 1.0, 0.0, 0.0, 0.0, 0.0],
                          [0.0, 1.0, 5.0, 2.0, 0.0, 0.0]])
    labels = jnp.asarray([0, 3])
    assert float(topk_correct(logits, labels, 1)) == 1.0
    assert float(topk_correct(logits, labels, 5)) == 2.0
    assert float(cross_entropy(logits, labels)) > 0


@pytest.fixture(scope="module")
def tiny_setup():
    model = SpeakerModel(spk_num=4, feat_dim=8, trunk="tiny_resnet",
                         pooling="mean+std", loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((8, 8, 16)).astype(np.float32)
    labels = np.arange(8) % 4
    state = create_train_state(model, jax.random.key(0),
                               jnp.asarray(feats), jnp.asarray(labels))
    return model, state, feats, labels


def test_train_step_learns(tiny_setup):
    model, state, feats, labels = tiny_setup
    _, step = make_train_step(model)
    losses = []
    for i in range(8):
        state, metrics = step(state, jnp.asarray(feats), jnp.asarray(labels),
                              jnp.asarray(0.05, jnp.float32))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_train_step_sharded_over_mesh(tiny_setup):
    """Same step under a ('data', 'model') mesh with the batch sharded 4-way
    and the AAM classifier sharded 2-way — must match unsharded numerics."""
    model, state0, feats, labels = tiny_setup
    _, step = make_train_step(model)
    s_plain, m_plain = step(state0, jnp.asarray(feats), jnp.asarray(labels),
                            jnp.asarray(0.05, jnp.float32))

    mesh = make_mesh(n_data=4, n_model=2)
    from pkr_tpu.parallel import shard_params

    params, _ = shard_params(state0.params, mesh)
    state = state0.replace(params=params)
    fb = jax.device_put(jnp.asarray(feats), batch_sharding(mesh))
    lb = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
    s_shard, m_shard = step(state, fb, lb, jnp.asarray(0.05, jnp.float32))
    assert abs(float(m_plain["loss"]) - float(m_shard["loss"])) < 1e-4
    np.testing.assert_allclose(
        np.asarray(jax.device_get(s_shard.params["fc1"]["kernel"])),
        np.asarray(s_plain.params["fc1"]["kernel"]), rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    model, state, feats, labels = tiny_setup
    _, step = make_train_step(model)
    state, _ = step(state, jnp.asarray(feats), jnp.asarray(labels),
                    jnp.asarray(0.05, jnp.float32))
    state = state.replace(epoch=jnp.asarray(3, jnp.int32),
                          best_acc1=jnp.asarray(0.5, jnp.float32))
    save_checkpoint(str(tmp_path / "ck"), state, is_best=True)
    restored = restore_checkpoint(str(tmp_path / "ck"), state)
    assert int(restored.epoch) == 3
    assert float(restored.best_acc1) == 0.5
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 jax.device_get(state.params), restored.params)
    best = restore_checkpoint(str(tmp_path / "ck"), state, which="best")
    assert best is not None and int(best.epoch) == 3


def test_import_torch_checkpoint():
    """Round-trip: build a torch-style state dict for the tiny trunk and
    verify tensors land transposed in the right flax slots, with
    shape-mismatch and unknown-name tolerance (model.py:415-432)."""
    model = SpeakerModel(spk_num=4, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 16)), train=False)
    rng = np.random.default_rng(2)

    conv_w = rng.standard_normal((8, 1, 3, 3)).astype(np.float32)  # torch OIHW
    fc1_w = rng.standard_normal(
        np.asarray(variables["params"]["fc1"]["kernel"]).shape[::-1]).astype(np.float32)
    aam_w = rng.standard_normal((4, 256)).astype(np.float32)
    sd = {
        "module.res.conv1.weight": conv_w,
        "res.bn1.weight": np.full(8, 2.0, np.float32),
        "res.bn1.running_mean": np.full(8, 0.25, np.float32),
        "fc1.weight": fc1_w,
        "last.weight": aam_w,
        "res.layer9.0.conv1.weight": conv_w,  # unknown name → skipped
        "res.layer1.0.conv1.weight": rng.standard_normal((7, 7, 3, 3)).astype(np.float32),  # bad shape → skipped
    }
    out = import_torch_checkpoint(sd, variables, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["_trunk"]["stem"]["Conv_0"]["kernel"]),
        conv_w.transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(out["params"]["_trunk"]["stem"]["BatchNorm_0"]["scale"]),
        np.full(8, 2.0, np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["_trunk"]["stem"]["BatchNorm_0"]["mean"]),
        np.full(8, 0.25, np.float32))
    np.testing.assert_array_equal(np.asarray(out["params"]["fc1"]["kernel"]), fc1_w.T)
    np.testing.assert_array_equal(np.asarray(out["params"]["aam_weight"]), aam_w)
    # skipped entries leave the init values in place
    np.testing.assert_array_equal(
        np.asarray(out["params"]["_trunk"]["layer1_0"]["ConvBN_0"]["Conv_0"]["kernel"]),
        np.asarray(variables["params"]["_trunk"]["layer1_0"]["ConvBN_0"]["Conv_0"]["kernel"]))


def test_nan_guard_skips_update(tiny_setup):
    """A batch that produces a non-finite loss must leave params, momentum
    and step-weights untouched (failure detection, SURVEY §5 gap)."""
    model, state, feats, labels = tiny_setup
    _, step = make_train_step(model)
    bad = np.full_like(feats, np.nan)
    new_state, metrics = step(state, jnp.asarray(bad), jnp.asarray(labels),
                              jnp.asarray(0.05, jnp.float32))
    assert not np.isfinite(float(metrics["loss"]))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), jax.device_get(new_state.params),
        jax.device_get(state.params))
    # and a good batch afterwards still works
    s2, m2 = step(new_state, jnp.asarray(feats), jnp.asarray(labels),
                  jnp.asarray(0.05, jnp.float32))
    assert np.isfinite(float(m2["loss"]))


def test_distributed_helpers():
    from pkr_tpu.parallel.distributed import host_info, initialize

    initialize()  # single-host no-op
    idx, count, local = host_info()
    assert idx == 0 and count == 1 and local == 8  # test mesh has 8 cpu devs


def test_warm_start_cross_head(tmp_path):
    """AAM warm-started from a softmax checkpoint: trunk/fc1 load, the
    mismatched head is skipped (run_aam_v2.sh:82 flow with our checkpoints)."""
    from pkr_tpu.train.checkpoint import load_pretrained_variables

    soft = SpeakerModel(spk_num=5, feat_dim=8, trunk="tiny_resnet",
                        pooling="mean+std", loss="softmax", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((4, 8, 16)), jnp.float32)
    y = jnp.asarray(np.arange(4) % 5)
    s_state = create_train_state(soft, jax.random.key(1), x, y)
    s_state = s_state.replace(epoch=jnp.asarray(2, jnp.int32))
    save_checkpoint(str(tmp_path / "soft"), s_state, is_best=True)

    aam = SpeakerModel(spk_num=5, feat_dim=8, trunk="tiny_resnet",
                       pooling="mean+std", loss="AAM", dtype=jnp.float32)
    a_state = create_train_state(aam, jax.random.key(2), x, y)
    variables = load_pretrained_variables(
        str(tmp_path / "soft"),
        {"params": a_state.params, "batch_stats": a_state.batch_stats},
        verbose=False)
    # trunk + fc1 copied from the softmax model
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["fc1"]["kernel"]),
        np.asarray(jax.device_get(s_state.params["fc1"]["kernel"])))
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["_trunk"]["stem"]["Conv_0"]["kernel"]),
        np.asarray(jax.device_get(s_state.params["_trunk"]["stem"]["Conv_0"]["kernel"])))
    # AAM head untouched (softmax ckpt has no aam_weight)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["aam_weight"]),
        np.asarray(jax.device_get(a_state.params["aam_weight"])))
    # and the model still runs with the merged variables
    a_state = a_state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
    _, step = make_train_step(aam)
    _, m = step(a_state, x, y, jnp.asarray(0.05, jnp.float32))
    assert np.isfinite(float(m["loss"]))


def test_train_step_deterministic(tiny_setup):
    """Same state + same batch → bit-identical update (the reproducibility
    the reference only approximated with cudnn.deterministic warnings,
    train_resnet.py:99-107)."""
    model, state, feats, labels = tiny_setup
    _, step = make_train_step(model)
    s1, m1 = step(state, jnp.asarray(feats), jnp.asarray(labels),
                  jnp.asarray(0.05, jnp.float32))
    s2, m2 = step(state, jnp.asarray(feats), jnp.asarray(labels),
                  jnp.asarray(0.05, jnp.float32))
    assert float(m1["loss"]) == float(m2["loss"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_checkpoint_retention(tiny_setup, tmp_path):
    model, state, feats, labels = tiny_setup
    for e in (1, 2, 3, 4):
        s = state.replace(epoch=jnp.asarray(e, jnp.int32))
        save_checkpoint(str(tmp_path / "ck"), s, is_best=(e == 2), keep_last=2)
    from pkr_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # saves are async; commit the last one
    dirs = sorted(os.listdir(tmp_path / "ck"))
    assert "ckpt_3" in dirs and "ckpt_4" in dirs
    assert "ckpt_1" not in dirs and "ckpt_2" not in dirs
    assert "best" in dirs  # the pruned best epoch survives as 'best'
    restored = restore_checkpoint(str(tmp_path / "ck"), state, which="best")
    assert int(restored.epoch) == 2


def test_async_save_overlaps_training_step(tmp_path):
    """save_checkpoint returns before the write commits (async), a training
    step runs during the in-flight save, and the restored state is the one
    snapshotted at save time — not the post-step state."""
    import jax
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint,
                                          wait_for_checkpoints)
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=6, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((4, 8, 16)), jnp.float32)
    labels = jnp.asarray(np.arange(4) % 6)
    state = create_train_state(model, jax.random.key(0), feats, labels)
    _, step = make_train_step(model)
    state, _ = step(state, feats, labels, jnp.asarray(0.05, jnp.float32))
    snap = jax.device_get(state)

    save_checkpoint(str(tmp_path), state)          # returns post-snapshot
    state2, _ = step(state, feats, labels,         # overlaps the save
                     jnp.asarray(0.05, jnp.float32))
    wait_for_checkpoints()
    got = restore_checkpoint(str(tmp_path), state2)
    for a, b in zip(jax.tree.leaves(got.params), jax.tree.leaves(snap.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state differs from the post-save step's params
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(got.params),
                        jax.tree.leaves(state2.params)))


def test_profile_trace_captures_artifact(tmp_path):
    """--profile-dir wiring: a short training run writes a jax.profiler
    trace (SURVEY §5 tracing gap; the function was dead code in round 1)."""
    import glob

    import jax
    import jax.numpy as jnp

    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import train_and_validate
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=4, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    feats = np.stack([rng.standard_normal((8, 16)).astype(np.float32)
                      for _ in range(4)])
    labels = np.arange(4) % 4

    class Loader:
        def epoch(self, e):
            for _ in range(8):
                yield feats, labels

    state = create_train_state(model, jax.random.key(0),
                               jnp.asarray(feats), jnp.asarray(labels))
    train_and_validate(model, state, Loader(), Loader(), epochs=1, lr0=0.01,
                       profile_dir=str(tmp_path / "trace"), profile_steps=2,
                       print_freq=1000)
    artifacts = glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                          recursive=True)
    assert artifacts, list((tmp_path / "trace").rglob("*"))


def test_checkpoint_resave_never_deletes_committed(tiny_setup, tmp_path):
    """Re-saving the same epoch (step-saves, a resumed epoch) must NOT
    delete the committed checkpoint the 'latest' marker points to — the
    re-save goes to a versioned dir and the marker moves only after the
    new commit."""
    import os

    from pkr_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint,
                                          wait_for_checkpoints)

    model, state, feats, labels = tiny_setup
    d = str(tmp_path / "ck")
    save_checkpoint(d, state, sync=True)
    assert open(os.path.join(d, "latest")).read() == "ckpt_0"
    save_checkpoint(d, state, sync=True)  # same epoch again
    assert os.path.isdir(os.path.join(d, "ckpt_0"))      # still intact
    assert os.path.isdir(os.path.join(d, "ckpt_0.v1"))   # the re-save
    assert open(os.path.join(d, "latest")).read() == "ckpt_0.v1"
    assert restore_checkpoint(d, state) is not None
    # keep_last prunes the older version, never the marker target
    save_checkpoint(d, state, keep_last=1, sync=True)
    wait_for_checkpoints()
    assert open(os.path.join(d, "latest")).read() == "ckpt_0.v2"
    assert os.path.isdir(os.path.join(d, "ckpt_0.v2"))
    assert not os.path.isdir(os.path.join(d, "ckpt_0"))
