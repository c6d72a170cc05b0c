"""Learner: loss, optimizer and the jitted epoch over the device buffer.

Matches the reference SGD pipeline (train.jl):
* loss = softmax-CE(policy, pi) + MSE(value, z)
         + 0.001 * MSE(feature, final_state)          (train.jl:12-15)
* optimizer = Adam(lr) then decoupled weight decay 1e-4 added to the step
  (Flux `Optimiser(ADAM(lr), WeightDecay(1e-4))`, train.jl:50) - expressed
  as the optax chain scale_by_adam -> scale(lr) -> add_decayed_weights(wd)
  -> scale(-1),
* per epoch: uniform-with-replacement sampling of the buffer, fixed-size
  batches (train.jl:58-95).  The reference stages batches through pinned
  host arrays; here the buffer is device-resident and the whole epoch is
  one jitted ``lax.while_loop`` with a *traced* batch count, so buffer
  growth never triggers recompilation.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .buffer import ReplayBuffer, buffer_size, sample_batch
from .nets.mlp import apply_training


class TrainConfig(NamedTuple):
    batch_size: int = 8192  # --batchsize default (main4IARow.jl:105)
    lr: float = 1e-3  # train.jl:47
    weight_decay: float = 1e-4  # train.jl:50
    feature_weight: float = 1e-3  # train.jl:14
    epochs: int = 1
    max_samples: int = 2_000_000  # train.jl:58


@lru_cache(maxsize=None)
def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(),
        optax.scale(cfg.lr),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale(-1.0),
    )


def loss_fn(params, state, pi_target, z, fstate, feature_weight):
    logits, v, f = apply_training(params, state)
    ce = -jnp.mean(
        jnp.sum(pi_target * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    )
    mse_v = jnp.mean((v - z) ** 2)
    mse_f = jnp.mean((f - fstate) ** 2)
    return ce + mse_v + feature_weight * mse_f


def train_epoch(params, opt_state, buffer: ReplayBuffer, rng, cfg: TrainConfig,
                optimizer=None, axis_name=None):
    """One epoch of SGD over the buffer. Returns (params, opt_state, loss).

    The number of updates is ``max(1, nsamples // batch - 1)`` with
    nsamples = min(max_samples, buffer size), replicating the reference's
    partition loop which stops one batch early (train.jl:76-79).

    Data-parallel path (``axis_name`` set, called under shard_map): each
    device samples its local buffer shard, ``cfg.batch_size`` is the
    *per-device* batch, gradients are pmean'd over the mesh axis and the
    update count derives from the global sample count so every device runs
    the same number of collectives."""
    if optimizer is None:
        optimizer = make_optimizer(cfg)
    local_size = buffer_size(buffer)
    if axis_name is None:
        nsamples = jnp.minimum(local_size, cfg.max_samples)
        global_batch = cfg.batch_size
    else:
        nsamples = jnp.minimum(
            jax.lax.psum(local_size, axis_name), cfg.max_samples
        )
        global_batch = cfg.batch_size * jax.lax.psum(1, axis_name)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    n_updates = jnp.maximum(nsamples // global_batch - 1, 1)

    grad_fn = jax.value_and_grad(loss_fn)

    def cond(st):
        _, _, _, i = st
        return i < n_updates

    def body(st):
        params, opt_state, loss_acc, i = st
        key = jax.random.fold_in(rng, i)
        state, pi, z, fstate = sample_batch(buffer, key, cfg.batch_size)
        loss, grads = grad_fn(params, state, pi, z, fstate, cfg.feature_weight)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_acc + loss, i + 1

    params, opt_state, loss_acc, n = jax.lax.while_loop(
        cond, body, (params, opt_state, jnp.float32(0.0), jnp.int32(0))
    )
    return params, opt_state, loss_acc / jnp.maximum(n, 1).astype(jnp.float32)
