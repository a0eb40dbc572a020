"""Train state: trainable/frozen parameter partitioning + optax AdamW.

The reference freezes parameters with requires_grad=False and passes
everything to torch AdamW (train.py:351); here the frozen subtree simply
never receives gradients or optimizer state — the TPU-native equivalent.
"""

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def partition_params(params: Dict, mask: Dict):
    """Split a pytree into (trainable, frozen) by a same-structure bool tree.
    Non-selected leaves become None placeholders."""
    trainable = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def combine_params(trainable: Dict, frozen: Dict) -> Dict:
    return jax.tree_util.tree_map(
        lambda t, f: t if t is not None else f,
        trainable, frozen, is_leaf=lambda x: x is None)


def cosine_lr(lr: float, num_steps: int):
    """torch CosineAnnealingLR(T_max=num_steps) equivalent (train.py:357)."""
    return optax.cosine_decay_schedule(init_value=lr, decay_steps=num_steps, alpha=0.0)


def make_optimizer(lr: float, num_steps: int, weight_decay: float = 0.2):
    """AdamW + cosine schedule matching the reference driver
    (train.py:351-357): betas (0.9, 0.999), eps 1e-8, decoupled wd."""
    return optax.adamw(cosine_lr(lr, num_steps), b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)


@jax.tree_util.register_pytree_node_class
@dataclass
class TrainState:
    step: jax.Array
    trainable: Dict
    frozen: Dict
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.trainable, self.frozen, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def params(self) -> Dict:
        return combine_params(self.trainable, self.frozen)


def create_train_state(params: Dict, mask: Dict, optimizer) -> TrainState:
    # place params on device now: numpy leaves (host-side init) would
    # re-transfer through the jit boundary on EVERY step — the frozen
    # subtree in particular is never rebuilt by the step function
    params = jax.tree_util.tree_map(jnp.asarray, params)
    trainable, frozen = partition_params(params, mask)
    opt_state = optimizer.init(trainable)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      frozen=frozen, opt_state=opt_state)
