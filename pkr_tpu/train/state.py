"""Train state and optimizer.

Optimizer parity with the reference trainer (train_resnet.py:203-206):
SGD, momentum 0.9, weight decay 5e-4 applied to the gradient before the
momentum buffer (torch SGD semantics = optax add_decayed_weights → trace),
cosine-annealed learning rate stepped once per EPOCH from lr0 down to
lr_final (CosineAnnealingLR(T_max=epochs, eta_min=lr_final);
imagenet_main.py uses eta_min=0).

The LR enters through optax.inject_hyperparams so resuming an interrupted
run just sets the epoch — no scheduler object to rebuild
(train_resnet.py:225's last_epoch dance disappears).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax


def cosine_epoch_lr(lr0: float, epochs: int, lr_final: float = 0.0):
    """eta_min + (lr0 - eta_min) * (1 + cos(pi * epoch / T)) / 2."""

    def schedule(epoch):
        frac = jnp.clip(epoch / epochs, 0.0, 1.0)
        return lr_final + (lr0 - lr_final) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # scalar int32
    step: jnp.ndarray  # scalar int32
    best_acc1: jnp.ndarray  # scalar float32


def make_optimizer(momentum: float = 0.9, weight_decay: float = 5e-4):
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate, momentum=momentum),
        ))(learning_rate=0.0)


def create_train_state(model, rng, example_feats, example_labels,
                       momentum: float = 0.9, weight_decay: float = 5e-4) -> TrainState:
    variables = model.init(rng, example_feats, example_labels, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(momentum, weight_decay)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        epoch=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        best_acc1=jnp.zeros((), jnp.float32),
    )
