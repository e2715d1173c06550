"""Model-zoo tests: geometry parity with the reference trunks, AAM margin
math against an independent torch transcription, masked pooling contract."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pkr_tpu.models import SpeakerModel, resnet34
from pkr_tpu.ops.aam import aam_logits, cosine_logits
from pkr_tpu.ops.stats_pool import stats_pool, flatten_pooled


def _resnet34_vars():
    """Shared tiny-input init of the full ResNet-34 (compiles once)."""
    model = resnet34(dtype=jnp.float32)
    x = jnp.zeros((1, 40, 16))
    return model, x, model.init(jax.random.key(0), x, train=False)


def test_resnet34_geometry():
    """Input (B, 40, T) → trunk map (B, 5, (T+7)//8, 256) — the r-vector
    geometry (model.py:246-269: stages 32/64/128/256, strides 1/2/2/2)."""
    model, x, vars_ = _resnet34_vars()
    out = model.apply(vars_, x, train=False)
    assert out.shape == (1, 5, 2, 256)


def test_param_count_matches_torch_resnet34():
    """Conv/BN parameter volume of the trunk must equal the torch reference's
    (same architecture ⇒ same count): computed analytically."""
    _, _, vars_ = _resnet34_vars()
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(vars_["params"]))

    # analytic torch count: stem + 4 stages of BasicBlocks + downsamples
    def bn(c):
        return 2 * c

    count = 9 * 1 * 32 + bn(32)  # stem
    cin = 32
    for stage, (c, n) in enumerate(zip([32, 64, 128, 256], [3, 4, 6, 3])):
        for j in range(n):
            count += 9 * cin * c + bn(c) + 9 * c * c + bn(c)
            if cin != c:
                count += cin * c + bn(c)  # 1x1 downsample
            cin = c
    assert n_params == count


def test_stats_pool_matches_torch_var_mean():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 256, 5, 25)).astype(np.float32)  # torch NCHW
    mean_t = torch.from_numpy(x).mean(dim=3)
    var_t = torch.from_numpy(x).var(dim=3)  # unbiased, like torch.var_mean
    ref = torch.cat([mean_t, torch.sqrt(var_t)], dim=-1)  # (B, C, 2F)
    ref_flat = ref.flatten(1, -1).numpy()

    x_nhwc = np.transpose(x, (0, 2, 3, 1))  # (B, F, T, C)
    pooled = stats_pool(jnp.asarray(x_nhwc), None, "mean+std")
    flat = flatten_pooled(pooled)
    np.testing.assert_allclose(np.asarray(flat), ref_flat, rtol=1e-5, atol=1e-5)


def test_stats_pool_masked_equals_exact():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 30, 8)).astype(np.float32)
    x[:, :, 20:, :] = 99.0  # garbage in padded region
    mask = np.arange(30) < 20
    masked = stats_pool(jnp.asarray(x), jnp.asarray(mask[None]), "mean+std")
    exact = stats_pool(jnp.asarray(x[:, :, :20, :]), None, "mean+std")
    np.testing.assert_allclose(np.asarray(masked), np.asarray(exact), rtol=1e-5, atol=1e-5)


def test_aam_matches_torch_reference_formula():
    """Independent torch transcription of the ArcFace forward
    (model.py:483-499) vs our fused version."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    B, D, C = 16, 32, 11
    m, s = 0.2, 30.0
    emb = rng.standard_normal((B, D)).astype(np.float32)
    w = rng.standard_normal((C, D)).astype(np.float32)
    labels = rng.integers(0, C, B)

    cos = F.linear(F.normalize(torch.from_numpy(emb)), F.normalize(torch.from_numpy(w)))
    sin = torch.sqrt((1.0 - cos.pow(2)).clamp(0, 1))
    phi = cos * math.cos(m) - sin * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = torch.where(cos - th > 0, phi, cos - mm)
    one_hot = torch.zeros_like(cos)
    one_hot.scatter_(1, torch.from_numpy(labels).view(-1, 1), 1)
    ref = ((one_hot * phi) + (1.0 - one_hot) * cos) * s

    got = aam_logits(jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels), m, s)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)
    # eval path = scaled cosine
    got_eval = aam_logits(jnp.asarray(emb), jnp.asarray(w), None, m, s)
    np.testing.assert_allclose(np.asarray(got_eval), (cos * s).numpy(), rtol=1e-5, atol=1e-5)


def test_aam_margin_guard_extreme_cosines():
    """cosθ ≈ ±1 hits the clamp/where guard; gradients must stay finite
    (SURVEY §7: AAM numerics hard part)."""
    w = jnp.eye(4, 8)
    emb = jnp.concatenate([jnp.eye(4, 8) * 5, -jnp.eye(4, 8) * 5])  # cos = ±1
    labels = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])

    def loss(e):
        lg = aam_logits(e, w, labels, 0.2, 30.0)
        return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(8), labels])

    val, grad = jax.value_and_grad(loss)(emb)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


@pytest.mark.parametrize("loss", ["softmax", "AAM", "AAM-v1"])
def test_speaker_model_heads(loss):
    model = SpeakerModel(spk_num=7, feat_dim=40, loss=loss, trunk="tiny_resnet", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 40, 32)), jnp.float32)
    y = jnp.array([1, 4])
    vars_ = model.init(jax.random.key(0), x, y, train=True)
    logits, _ = model.apply(vars_, x, y, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 7)
    emb = model.apply(vars_, x, method=SpeakerModel.embed)
    assert emb.shape == (2, 256)
    assert np.isfinite(np.asarray(logits)).all()


def test_embed_mask_contract():
    """Embedding of an utterance padded inside a longer bucket ≈ embedding at
    its exact length (boundary conv bleed only)."""
    model = SpeakerModel(spk_num=5, feat_dim=40, trunk="tiny_resnet", dtype=jnp.float32)
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((1, 40, 48)).astype(np.float32)
    vars_ = model.init(jax.random.key(0), jnp.zeros((1, 40, 48)), train=False)
    exact = model.apply(vars_, jnp.asarray(feats), method=SpeakerModel.embed)
    padded = np.zeros((1, 40, 72), np.float32)
    padded[:, :, :48] = feats
    mask = (np.arange(72) < 48)[None]
    bucketed = model.apply(vars_, jnp.asarray(padded), jnp.asarray(mask),
                           method=SpeakerModel.embed)
    exact, bucketed = np.asarray(exact), np.asarray(bucketed)
    cos = float((exact * bucketed).sum()
                / (np.linalg.norm(exact) * np.linalg.norm(bucketed)))
    # tiny trunk → 6-frame map, so the single pad-boundary column is a large
    # fraction of the stats; the production-size map (25+ cols) bleeds less
    assert cos > 0.99, cos


def test_densenet_trunk_runs():
    model = SpeakerModel(spk_num=5, feat_dim=40, trunk="densenet62",
                         pooling="mean+std", dtype=jnp.float32)
    x = jnp.zeros((1, 40, 32))
    vars_ = model.init(jax.random.key(0), x, train=False)
    emb = model.apply(vars_, x, method=SpeakerModel.embed)
    assert emb.shape == (1, 256)


def test_extract_long_mode_average_merges():
    """extract_embeddings mean-pools ##k segments into one utt embedding."""
    from pkr_tpu.data.loader import EvalLoader, FeatureSource
    from pkr_tpu.eval.extract import extract_embeddings
    from pkr_tpu.io import kaldi_ark
    import tempfile, os

    rng = np.random.default_rng(6)
    d = tempfile.mkdtemp()
    mats = {"short": rng.standard_normal((40, 8)).astype(np.float32),
            "long": rng.standard_normal((130, 8)).astype(np.float32)}
    with kaldi_ark.write_ark_scp(os.path.join(d, "f.ark"),
                                 os.path.join(d, "f.scp")) as w:
        for k, v in mats.items():
            w.write(k, v)
    model = SpeakerModel(spk_num=3, feat_dim=8, trunk="tiny_resnet",
                         dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 16)), train=False)
    src = FeatureSource(os.path.join(d, "f.scp"))
    loader = EvalLoader(src, batch_size=2, quantum=50, max_len=50,
                        long_mode="average")
    embs = extract_embeddings(model, variables, loader)
    assert set(embs) == {"short", "long"}
    # 'long' = mean of its 3 window embeddings
    def embed_win(mat):
        feats = np.zeros((1, 8, 50), np.float32)
        feats[0, :, :len(mat)] = mat.T
        mask = (np.arange(50) < len(mat))[None]
        return np.asarray(model.apply(variables, jnp.asarray(feats),
                                      jnp.asarray(mask), method=SpeakerModel.embed))[0]
    wins = [embed_win(mats["long"][k * 50:(k + 1) * 50]) for k in range(3)]
    np.testing.assert_allclose(embs["long"], np.mean(wins, axis=0),
                               rtol=1e-5, atol=1e-5)


def test_fbank80_geometry():
    """BASELINE.json's extraction config mentions fbank-80: the fc1 geometry
    (feat+7)//8 = 10 and the frontend's num_mel_bins are both parametric."""
    from pkr_tpu.frontend import FbankConfig, fbank

    cfg = FbankConfig(num_mel_bins=80, dither=0.0)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(8000) * 500,
                      jnp.float32)
    feats, mask = fbank(wav, jnp.asarray(8000), cfg)
    assert feats.shape[-1] == 80
    assert bool(jnp.isfinite(feats).all())

    model = SpeakerModel(spk_num=4, feat_dim=80, trunk="tiny_resnet",
                         pooling="mean+std", dtype=jnp.float32)
    x = jnp.zeros((1, 80, 16))
    vars_ = model.init(jax.random.key(0), x, train=False)
    emb = model.apply(vars_, x, method=SpeakerModel.embed)
    assert emb.shape == (1, 256)
    # fc1 in-dim = (80+7)//8 freq bins * 2 (mean+std) * trunk channels (64)
    assert vars_["params"]["fc1"]["kernel"].shape[0] == 10 * 2 * 64


def test_warmup_buckets():
    from pkr_tpu.eval.extract import warmup_buckets

    model = SpeakerModel(spk_num=3, feat_dim=8, trunk="tiny_resnet",
                         dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 16)), train=False)
    n = warmup_buckets(model, variables, feat_dim=8, batch_size=2,
                       quantum=32, max_len=96)
    assert n == 6  # 3 bucket lengths x 2 transports (f32 + quantized)


def test_extract_sharded_over_mesh():
    """Extraction batches sharded over the 8-device mesh == unsharded, with
    ragged final batches padded to the data axis."""
    from pkr_tpu.data.loader import EvalLoader, FeatureSource
    from pkr_tpu.eval.extract import extract_embeddings
    from pkr_tpu.io import kaldi_ark
    from pkr_tpu.parallel import make_mesh
    import tempfile, os

    rng = np.random.default_rng(11)
    d = tempfile.mkdtemp()
    with kaldi_ark.write_ark_scp(os.path.join(d, "f.ark"),
                                 os.path.join(d, "f.scp")) as w:
        for i in range(11):  # odd count → ragged last batch
            w.write(f"u{i:02d}", rng.standard_normal((30 + 7 * i, 8)).astype(np.float32))
    model = SpeakerModel(spk_num=3, feat_dim=8, trunk="tiny_resnet",
                         dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 16)), train=False)
    src = FeatureSource(os.path.join(d, "f.scp"))
    mk = lambda: EvalLoader(src, batch_size=8, quantum=32, max_len=128)
    plain = extract_embeddings(model, variables, mk())
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = extract_embeddings(model, variables, mk(), mesh=mesh)
    assert set(plain) == set(sharded)
    for k in plain:
        np.testing.assert_allclose(sharded[k], plain[k], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("trunk", ["se_resnet34", "densenet62"])
def test_masked_embedding_invariant_to_bucket_padding(trunk):
    """The same utterance must embed identically whatever bucket it lands
    in: the SE gates' squeeze means (se_*) and the pooled statistics of
    (B, T', C) trunks (densenet*) must exclude padded time columns."""
    import jax

    model = SpeakerModel(spk_num=4, feat_dim=16, trunk=trunk,
                         pooling="mean+std", loss="AAM", dtype=jnp.float32)
    rng = np.random.default_rng(11)
    T = 64
    x = rng.standard_normal((1, 16, T)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x),
                           jnp.zeros((1,), jnp.int32), train=False)

    def emb(pad_to):
        xp = np.zeros((1, 16, pad_to), np.float32)
        xp[:, :, :T] = x
        mask = np.arange(pad_to)[None, :] < T
        return np.asarray(model.apply(
            variables, jnp.asarray(xp), jnp.asarray(mask),
            method=SpeakerModel.embed))

    e64, e96, e160 = emb(64), emb(96), emb(160)
    np.testing.assert_allclose(e96, e64, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(e160, e64, rtol=1e-4, atol=1e-5)


def test_unknown_trunk_raises_value_error():
    import jax

    model = SpeakerModel(spk_num=4, feat_dim=8, trunk="densenet120")
    with pytest.raises(ValueError, match="unknown trunk"):
        model.init(jax.random.key(0), jnp.zeros((1, 8, 16)),
                   jnp.zeros((1,), jnp.int32))


def test_extraction_quantized_transport_matches_f32():
    """EvalLoader transport='auto' on CompressedMatrix arks ships uint8
    codes + percentile tables and dequantizes on device; the VALUES
    entering the stem are bit-identical to the float path (codec test),
    so embeddings must agree to the last-ulp accumulation reordering the
    fused dequantize+conv program introduces (~1e-7 abs here).  A
    mixed ark (one uncompressed entry) must split into per-kind buckets and
    still cover every utterance."""
    import tempfile, os

    from pkr_tpu.data.loader import EvalLoader, FeatureSource
    from pkr_tpu.eval.extract import extract_embeddings
    from pkr_tpu.io import kaldi_ark

    rng = np.random.default_rng(23)
    d = tempfile.mkdtemp()
    with kaldi_ark.write_ark_scp(os.path.join(d, "c.ark"),
                                 os.path.join(d, "c.scp"), compress=True) as w:
        for i in range(9):
            w.write(f"u{i}", (rng.standard_normal((35 + 11 * i, 8)) * 3)
                    .astype(np.float32))
    model = SpeakerModel(spk_num=3, feat_dim=8, trunk="tiny_resnet",
                         dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 8, 16)),
                           train=False)
    mk = lambda t: EvalLoader(FeatureSource(os.path.join(d, "c.scp")),
                              batch_size=4, quantum=32, max_len=96,
                              long_mode="average", transport=t)
    q = extract_embeddings(model, variables, mk("auto"))
    f = extract_embeddings(model, variables, mk("f32"))
    assert set(q) == set(f) == {f"u{i}" for i in range(9)}
    for k in f:
        np.testing.assert_allclose(q[k], f[k], rtol=1e-4, atol=1e-5)

    # quantized batches really were emitted (payload is a (codes, pct) pair)
    kinds = {type(feats) for _, feats, _ in mk("auto")}
    assert tuple in kinds

    # mixed ark: an FM entry rides the f32 bucket stream alongside CM codes
    with kaldi_ark.write_ark_scp(os.path.join(d, "m.ark"),
                                 os.path.join(d, "m.scp")) as w:
        w.write("plain", rng.standard_normal((40, 8)).astype(np.float32))
    lines = open(os.path.join(d, "c.scp")).read() + open(
        os.path.join(d, "m.scp")).read()
    open(os.path.join(d, "mix.scp"), "w").write(lines)
    src = FeatureSource(os.path.join(d, "mix.scp"))
    mixed = extract_embeddings(model, variables, EvalLoader(
        src, batch_size=4, quantum=32, max_len=96, transport="auto"))
    assert "plain" in mixed and len(mixed) == 10
