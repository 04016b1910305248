"""Training state + optimizer construction.

Optimizer parity (reference model.py:250-291): torch Adam with *coupled*
weight decay (L2 added to the gradient before the moment updates) and a
StepLR epoch schedule (lr * gamma^(epoch // step_size)). The schedule is
injected per-step as a plain scalar so changing it never retraces.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.config import OptimizerConfig, SchedulerConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(opt_cfg: OptimizerConfig,
                   gradient_clip_val=None) -> optax.GradientTransformation:
    if opt_cfg.type != "Adam":
        raise NotImplementedError(f"optimizer {opt_cfg.type} not supported")
    chain = []
    if gradient_clip_val:
        # trainer.gradient_clip_val — Lightning clips by GLOBAL norm by
        # default (its gradient_clip_algorithm='norm'); applied before the
        # L2 term and the Adam moments, like Lightning's pre-step hook
        chain.append(optax.clip_by_global_norm(float(gradient_clip_val)))
    if opt_cfg.weight_decay:
        # torch-Adam-style coupled weight decay: L2 term added to gradients
        # *before* the Adam moments (NOT AdamW's decoupled decay)
        chain.append(optax.add_decayed_weights(opt_cfg.weight_decay))
    chain.append(optax.scale_by_adam())
    # lr injected via state scale (see `lr_for_epoch`)
    chain.append(optax.inject_hyperparams(lambda learning_rate: optax.scale(-learning_rate))(
        learning_rate=opt_cfg.lr
    ))
    return optax.chain(*chain)


def lr_for_epoch(opt_cfg: OptimizerConfig, sched_cfg: SchedulerConfig, epoch: int) -> float:
    """StepLR (reference model.py:281-289)."""
    if sched_cfg.type == "StepLR":
        return opt_cfg.lr * sched_cfg.gamma ** (epoch // sched_cfg.step_size)
    if sched_cfg.type == "None":
        return opt_cfg.lr
    raise NotImplementedError(f"scheduler {sched_cfg.type} not supported")


def set_learning_rate(opt_state, lr):
    """Write the injected lr hyperparameter into the optimizer state."""
    # the inject_hyperparams state is the last element of the chain state
    inner = opt_state[-1]
    inner = inner._replace(hyperparams={**inner.hyperparams, "learning_rate": jnp.asarray(lr)})
    return opt_state[:-1] + (inner,)


def create_train_state(variables: Dict[str, Any], tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
