"""Retrieval fine-tuning: jitted SPMD train step (ITA + ITM).

TPU-first equivalent of the reference training loop (reference:
train_retrieval_video.py:36-81): AdamW, per-epoch cosine LR, alpha ramp
during epoch 0, DDP -> batch sharding over the mesh 'data' axis with
momentum encoders and feature queues as explicit state (no in-place
buffers). The full step — forward, backward, optimizer, momentum update,
queue update — is ONE compiled program.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip_retrieval import (
    QueueState,
    dequeue_and_enqueue,
    init_momentum_params,
    init_queue,
    init_retrieval_params,
    momentum_update,
    retrieval_loss,
)


class RetrievalTrainState(NamedTuple):
    params: Any
    params_m: Any
    queue: QueueState
    opt_state: Any
    step: jnp.ndarray


def create_train_state(key, vit_cfg: ViTConfig, med_cfg: MedConfig, optimizer,
                       embed_dim: int = 256, queue_size: int = 57600,
                       params=None) -> RetrievalTrainState:
    kp, kq = jax.random.split(key)
    if params is None:
        params = init_retrieval_params(kp, vit_cfg, med_cfg, embed_dim)
    if "temp" not in params:
        params["temp"] = jnp.asarray(0.07, jnp.float32)
    params_m = init_momentum_params(params)
    queue = init_queue(kq, embed_dim, queue_size)
    opt_state = optimizer.init(params)
    return RetrievalTrainState(params, params_m, queue, opt_state, jnp.zeros((), jnp.int32))


def make_optimizer(init_lr: float, weight_decay: float = 0.05):
    """AdamW with a runtime-injectable LR (reference per-epoch cosine
    schedule mutates param_groups; we use optax.inject_hyperparams)."""
    return optax.inject_hyperparams(optax.adamw)(learning_rate=init_lr, weight_decay=weight_decay)


def make_retrieval_train_step(vit_cfg: ViTConfig, med_cfg: MedConfig, optimizer,
                              momentum: float = 0.995, dtype=None,
                              med_remat: bool = True):
    """Build the jittable train step.

    step(state, batch, alpha, rng) -> (state, metrics)
    batch: video (B,N,S,S,C), text_ids/enc_ids/text_mask (B,L), idx (B,)
    """

    from vidil_tpu.train.common import training_cfgs

    # default_fused_bwd=False: inside THIS step the fused-block Pallas
    # backward fails to compile on v5e — scoped-VMEM OOM (41.25M vs the
    # 16M stack limit) in jit(train_step)/transpose(jvp())/while/body/
    # closed_call/jit(_fused_block_backward), batch 32 x 4frm @224px,
    # 2026-08-19 — even though the identically-shaped caption/VQA steps
    # compile and run it 15-20% faster. Retrieval (momentum second
    # forward + queue) keeps the classic remat schedule until the
    # kernel's retrieval-context VMEM budget is diagnosed; opt in
    # explicitly via ViTConfig(use_fused_block=True,
    # use_fused_block_bwd=True) to reproduce. Batch 8 opt-in did not
    # even finish compiling in 500s (same day) - the pathology is the
    # retrieval step's fusion context (momentum second forward /
    # closed_call), not the batch-32 buffer sizes.
    vit_cfg, med_cfg = training_cfgs(vit_cfg, med_cfg, med_remat,
                                     default_fused_bwd=False)
    def train_step(state: RetrievalTrainState, batch, alpha, rng):
        def loss_fn(params):
            loss_ita, loss_itm, aux = retrieval_loss(
                params, state.params_m, state.queue,
                batch["video"], batch["text_ids"], batch["enc_ids"],
                batch["text_mask"], alpha, batch["idx"], rng,
                vit_cfg, med_cfg, dtype=dtype,
            )
            return loss_ita + loss_itm, (loss_ita, loss_itm, aux)

        # momentum update precedes the forward in the reference (:380);
        # applying it first keeps the same semantics
        params_m = momentum_update(state.params, state.params_m, momentum)
        state = state._replace(params_m=params_m)

        (loss, (loss_ita, loss_itm, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # keep temp in its clamp range after the update (reference :352)
        params["temp"] = jnp.clip(params["temp"], 0.001, 0.5)

        queue = dequeue_and_enqueue(state.queue, aux["video_feat_m"], aux["text_feat_m"], aux["idx"])
        new_state = RetrievalTrainState(params, params_m, queue, opt_state, state.step + 1)
        metrics = {"loss": loss, "loss_ita": loss_ita, "loss_itm": loss_itm}
        return new_state, metrics

    return train_step
