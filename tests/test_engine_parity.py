"""Training-engine parity: N optimizer steps of the full pipeline (trunk +
AAM head + CE + SGD/momentum/wd) match torch step for step from identical
weights and identical batches.

This composes every numerics-parity claim (conv padding, BN train-mode
statistics, pooling, margin math, optimizer) into one end-to-end assertion —
the jax engine IS the reference trainer on the same data.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pkr_tpu.models import SpeakerModel  # noqa: E402
from pkr_tpu.train.checkpoint import import_torch_checkpoint  # noqa: E402
from pkr_tpu.train.loop import make_train_step  # noqa: E402
from pkr_tpu.train.state import create_train_state  # noqa: E402

from test_torch_import_e2e import TSpeakerModel  # noqa: E402


class TorchAAMTrainer(torch.nn.Module):
    def __init__(self, base_model, n_spk, m=0.2, s=30.0):
        super().__init__()
        self.base = base_model
        self.last = torch.nn.Parameter(torch.randn(n_spk, 256))
        self.m, self.s = m, s

    def forward(self, x, labels):
        emb = self.base(x)
        cos = F.linear(F.normalize(emb), F.normalize(self.last))
        sin = torch.sqrt((1.0 - cos.pow(2)).clamp(1e-12, 1))
        phi = cos * math.cos(self.m) - sin * math.sin(self.m)
        th, mm = math.cos(math.pi - self.m), math.sin(math.pi - self.m) * self.m
        phi = torch.where(cos - th > 0, phi, cos - mm)
        one_hot = torch.zeros_like(cos)
        one_hot.scatter_(1, labels.view(-1, 1), 1)
        logits = ((one_hot * phi) + (1.0 - one_hot) * cos) * self.s
        return F.cross_entropy(logits, labels)


def test_five_steps_match_torch():
    torch.manual_seed(0)
    n_spk, B, F_dim, T = 6, 8, 8, 16
    tm = TorchAAMTrainer(TSpeakerModel([1, 1, 1, 1], feat_dim=F_dim, base=8),
                         n_spk).train()

    # identical weights: export torch → import into flax
    fm = SpeakerModel(spk_num=n_spk, feat_dim=F_dim, trunk="tiny_resnet",
                      pooling="mean+std", loss="AAM", dtype=jnp.float32)
    variables = fm.init(jax.random.key(0), jnp.zeros((1, F_dim, T)),
                        jnp.zeros((1,), jnp.int32), train=True)
    sd = {k.replace("base.", ""): v for k, v in tm.state_dict().items()}
    sd.pop("last", None)
    sd["last.weight"] = tm.last.detach()
    variables = import_torch_checkpoint(sd, variables, verbose=False)

    state = create_train_state(fm, jax.random.key(0),
                               jnp.zeros((2, F_dim, T)), jnp.zeros((2,), jnp.int32))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    _, jstep = make_train_step(fm)

    opt = torch.optim.SGD(tm.parameters(), lr=0.05, momentum=0.9,
                          weight_decay=5e-4)
    rng = np.random.default_rng(7)
    j_losses, t_losses = [], []
    for step_i in range(5):
        x = rng.standard_normal((B, F_dim, T)).astype(np.float32)
        y = rng.integers(0, n_spk, B)
        # torch step
        opt.zero_grad()
        loss_t = tm(torch.from_numpy(x), torch.from_numpy(y))
        loss_t.backward()
        opt.step()
        t_losses.append(float(loss_t))
        # jax step
        state, metrics = jstep(state, jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(0.05, jnp.float32))
        j_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-4)
    # final parameters agree (spot-check head + stem conv + fc1)
    np.testing.assert_allclose(
        np.asarray(state.params["aam_weight"]), tm.last.detach().numpy(),
        rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.params["fc1"]["kernel"]),
        tm.base.fc1.weight.detach().numpy().T, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.params["_trunk"]["stem"]["Conv_0"]["kernel"]),
        tm.base.res.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=1e-3, atol=1e-5)


class TorchSoftmaxTrainer(torch.nn.Module):
    """The reference softmax head: BN1d + ReLU + Linear (model.py:360-363)."""

    def __init__(self, base_model, n_spk):
        super().__init__()
        self.base = base_model
        self.bn1 = torch.nn.BatchNorm1d(256)
        self.head = torch.nn.Linear(256, n_spk)

    def forward(self, x, labels):
        emb = self.base(x)
        h = torch.relu(self.bn1(emb))
        return F.cross_entropy(self.head(h), labels)


def test_softmax_head_steps_match_torch():
    torch.manual_seed(1)
    n_spk, B, F_dim, T = 5, 8, 8, 16
    tm = TorchSoftmaxTrainer(TSpeakerModel([1, 1, 1, 1], feat_dim=F_dim, base=8),
                             n_spk).train()

    fm = SpeakerModel(spk_num=n_spk, feat_dim=F_dim, trunk="tiny_resnet",
                      pooling="mean+std", loss="softmax", dtype=jnp.float32)
    variables = fm.init(jax.random.key(0), jnp.zeros((1, F_dim, T)),
                        jnp.zeros((1,), jnp.int32), train=True)
    sd = {k.replace("base.", ""): v for k, v in tm.state_dict().items()}
    # head naming: torch 'head.*' → reference 'last.*'; bn1 matches directly
    sd = {("last." + k.split(".", 1)[1] if k.startswith("head.") else k): v
          for k, v in sd.items()}
    variables = import_torch_checkpoint(sd, variables, verbose=False)

    state = create_train_state(fm, jax.random.key(0),
                               jnp.zeros((2, F_dim, T)), jnp.zeros((2,), jnp.int32))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    _, jstep = make_train_step(fm)
    opt = torch.optim.SGD(tm.parameters(), lr=0.05, momentum=0.9,
                          weight_decay=5e-4)
    rng = np.random.default_rng(17)
    j_losses, t_losses = [], []
    for _ in range(4):
        x = rng.standard_normal((B, F_dim, T)).astype(np.float32)
        y = rng.integers(0, n_spk, B)
        opt.zero_grad()
        loss_t = tm(torch.from_numpy(x), torch.from_numpy(y))
        loss_t.backward()
        opt.step()
        t_losses.append(float(loss_t))
        state, metrics = jstep(state, jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(0.05, jnp.float32))
        j_losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(state.params["last"]["kernel"]),
        tm.head.weight.detach().numpy().T, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.params["bn1"]["scale"]),
        tm.bn1.weight.detach().numpy(), rtol=1e-3, atol=1e-5)


class TorchAAMv1Trainer(torch.nn.Module):
    """AAM-v1: BN1d + ReLU before the margin head (model.py:366-369)."""

    def __init__(self, base_model, n_spk, m=0.2, s=30.0):
        super().__init__()
        self.base = base_model
        self.bn1 = torch.nn.BatchNorm1d(256)
        self.w = torch.nn.Parameter(torch.randn(n_spk, 256))
        self.m, self.s = m, s

    def forward(self, x, labels):
        emb = torch.relu(self.bn1(self.base(x)))
        cos = F.linear(F.normalize(emb), F.normalize(self.w))
        sin = torch.sqrt((1.0 - cos.pow(2)).clamp(1e-12, 1))
        phi = cos * math.cos(self.m) - sin * math.sin(self.m)
        th, mm = math.cos(math.pi - self.m), math.sin(math.pi - self.m) * self.m
        phi = torch.where(cos - th > 0, phi, cos - mm)
        one_hot = torch.zeros_like(cos)
        one_hot.scatter_(1, labels.view(-1, 1), 1)
        return F.cross_entropy(((one_hot * phi) + (1.0 - one_hot) * cos) * self.s,
                               labels)


def test_aam_v1_head_steps_match_torch():
    torch.manual_seed(2)
    n_spk, B, F_dim, T = 5, 8, 8, 16
    tm = TorchAAMv1Trainer(TSpeakerModel([1, 1, 1, 1], feat_dim=F_dim, base=8),
                           n_spk).train()
    fm = SpeakerModel(spk_num=n_spk, feat_dim=F_dim, trunk="tiny_resnet",
                      pooling="mean+std", loss="AAM-v1", dtype=jnp.float32)
    variables = fm.init(jax.random.key(0), jnp.zeros((1, F_dim, T)),
                        jnp.zeros((1,), jnp.int32), train=True)
    sd = {k.replace("base.", ""): v for k, v in tm.state_dict().items()}
    sd.pop("w", None)
    sd["last.weight"] = tm.w.detach()
    variables = import_torch_checkpoint(sd, variables, verbose=False)
    state = create_train_state(fm, jax.random.key(0),
                               jnp.zeros((2, F_dim, T)), jnp.zeros((2,), jnp.int32))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    _, jstep = make_train_step(fm)
    opt = torch.optim.SGD(tm.parameters(), lr=0.05, momentum=0.9,
                          weight_decay=5e-4)
    rng = np.random.default_rng(27)
    for _ in range(4):
        x = rng.standard_normal((B, F_dim, T)).astype(np.float32)
        y = rng.integers(0, n_spk, B)
        opt.zero_grad()
        loss_t = tm(torch.from_numpy(x), torch.from_numpy(y))
        loss_t.backward()
        opt.step()
        state, metrics = jstep(state, jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(0.05, jnp.float32))
        assert abs(float(metrics["loss"]) - float(loss_t)) < 3e-4
