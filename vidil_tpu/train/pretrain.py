"""Video pretraining: jitted triple-loss train step.

Reference: pretrain_video.py:66-124 — warmup then step LR, alpha ramped
over the first 2 epochs, ITA+ITM+LM losses with momentum encoders and
feature queues.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip_pretrain import init_pretrain_params, pretrain_loss
from vidil_tpu.models.blip_retrieval import (
    QueueState,
    dequeue_and_enqueue,
    init_momentum_params,
    init_queue,
    momentum_update,
)


class PretrainState(NamedTuple):
    params: Any
    params_m: Any
    queue: QueueState
    opt_state: Any
    step: jnp.ndarray


def create_pretrain_state(key, vit_cfg: ViTConfig, med_cfg: MedConfig, optimizer,
                          embed_dim: int = 256, queue_size: int = 57600,
                          params=None) -> PretrainState:
    kp, kq = jax.random.split(key)
    if params is None:
        params = init_pretrain_params(kp, vit_cfg, med_cfg, embed_dim)
    params_m = init_momentum_params(params)
    queue = init_queue(kq, embed_dim, queue_size)
    return PretrainState(params, params_m, queue, optimizer.init(params),
                         jnp.zeros((), jnp.int32))


def make_pretrain_step(vit_cfg: ViTConfig, med_cfg: MedConfig, optimizer,
                       momentum: float = 0.995, dtype=None, med_remat: bool = True):
    from vidil_tpu.train.common import training_cfgs

    vit_cfg, med_cfg = training_cfgs(vit_cfg, med_cfg, med_remat)
    def train_step(state: PretrainState, batch, alpha, rng):
        def loss_fn(params):
            ita, itm, lm, aux = pretrain_loss(
                params, state.params_m, state.queue,
                batch["video"], batch["text_ids"], batch["enc_ids"],
                batch["dec_ids"], batch["text_mask"], alpha, rng,
                vit_cfg, med_cfg, dtype=dtype,
            )
            return ita + itm + lm, (ita, itm, lm, aux)

        params_m = momentum_update(state.params, state.params_m, momentum)
        state = state._replace(params_m=params_m)
        (loss, (ita, itm, lm, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params["temp"] = jnp.clip(params["temp"], 0.001, 0.5)
        queue = dequeue_and_enqueue(
            state.queue, aux["video_feat_m"], aux["text_feat_m"],
            jnp.full((aux["video_feat_m"].shape[0],), -100, jnp.int32),
        )
        new_state = PretrainState(params, params_m, queue, opt_state, state.step + 1)
        return new_state, {"loss": loss, "loss_ita": ita, "loss_itm": itm, "loss_lm": lm}

    return train_step
