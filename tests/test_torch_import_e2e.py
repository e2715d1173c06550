"""End-to-end checkpoint-import parity: a torch model with the reference's
exact architecture and state-dict naming (model.py:205-269,334-457) produces
the same embeddings as the flax model after import_torch_checkpoint.

This is the proof that a user can take a model trained by the reference
stack and serve it from this framework (BASELINE.md parity requirement).
The torch module below is an independent transcription of the reference's
architecture spec — layer names must match its state dict, which is the
point of the test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pkr_tpu.models import SpeakerModel  # noqa: E402
from pkr_tpu.train.checkpoint import import_torch_checkpoint  # noqa: E402


class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TResNet(nn.Module):
    """Reference trunk naming: conv1/bn1 stem + layer1..4 Sequentials."""

    def __init__(self, stages, base=32):
        super().__init__()
        self.conv1 = nn.Conv2d(1, base, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(base)
        cin = base
        for i, n in enumerate(stages):
            cout = base * (2 ** i)
            blocks = []
            for j in range(n):
                blocks.append(TBasicBlock(cin, cout, 2 if (i > 0 and j == 0) else 1))
                cin = cout
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = x.view(x.size(0), 1, x.size(1), x.size(2))
        x = torch.relu(self.bn1(self.conv1(x)))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x  # (B, C, F', T')


class TSpeakerModel(nn.Module):
    def __init__(self, stages, feat_dim=8, base=8, emb=256):
        super().__init__()
        self.res = TResNet(stages, base)
        fdim = (feat_dim + 7) // 8
        cout = base * 8
        self.fc1 = nn.Linear(fdim * 2 * cout, emb)

    def forward(self, x):
        f = self.res(x)  # (B, C, F', T')
        mean = f.mean(dim=3)
        std = torch.sqrt(f.var(dim=3))  # unbiased, like torch.var_mean
        pooled = torch.cat([mean, std], dim=-1)  # (B, C, 2F')
        return self.fc1(pooled.flatten(1))


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so use_running_average paths are exercised."""
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(mod.num_features).astype(np.float32) * 0.3))
            mod.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, mod.num_features).astype(np.float32)))
            mod.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.7, 1.3, mod.num_features).astype(np.float32)))
            mod.bias.data.copy_(torch.from_numpy(
                rng.standard_normal(mod.num_features).astype(np.float32) * 0.1))


@pytest.mark.parametrize("stages,trunk", [([1, 1, 1, 1], "tiny_resnet")])
def test_torch_checkpoint_embedding_parity(stages, trunk):
    rng = np.random.default_rng(0)
    tm = TSpeakerModel(stages, feat_dim=8, base=8).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)

    fm = SpeakerModel(spk_num=4, feat_dim=8, trunk=trunk, pooling="mean+std",
                      loss="AAM", dtype=jnp.float32)
    variables = fm.init(jax.random.key(0), jnp.zeros((1, 8, 16)), train=False)
    # attribute names (res.*, fc1.*) already match the reference state dict
    sd = dict(tm.state_dict())
    imported = import_torch_checkpoint(sd, variables, verbose=False)

    x = rng.standard_normal((3, 8, 24)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fm.apply(imported, jnp.asarray(x), method=SpeakerModel.embed))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_torch_resnet34_state_dict_fully_imports():
    """Every tensor of a full reference-shaped ResNet-34 state dict must land
    (no silent drops) when the flax model is the matching resnet34."""
    tm = TSpeakerModel([3, 4, 6, 3], feat_dim=40, base=32).eval()
    fm = SpeakerModel(spk_num=4, feat_dim=40, trunk="resnet34",
                      pooling="mean+std", loss="AAM", dtype=jnp.float32)
    variables = fm.init(jax.random.key(0), jnp.zeros((1, 40, 16)), train=False)
    sd = dict(tm.state_dict())
    n_expect = sum(1 for k in sd if not k.endswith("num_batches_tracked"))

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        imported = import_torch_checkpoint(sd, variables, verbose=True)
    assert f"imported {n_expect}/{len(sd)} tensors" in buf.getvalue(), buf.getvalue()
