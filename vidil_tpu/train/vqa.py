"""Video VQA fine-tune: jitted train step (reference: train_vqa_video.py:28-62)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import blip as B
from vidil_tpu.models.blip_vqa import vqa_train_loss


class VQATrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_vqa_train_state(params, optimizer) -> VQATrainState:
    return VQATrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_vqa_train_step(vit_cfg: ViTConfig, med_cfg: MedConfig, optimizer, dtype=None,
                        med_remat: bool = True):
    """step(state, batch) -> (state, metrics).

    batch: video (B, N, S, S, C), question_ids/question_mask (B, Lq) with
    [ENC] first, answer_ids/answer_mask (A, La) flattened over the ragged
    per-question answers, answer_question_index (A,), weights (A,).
    """

    from vidil_tpu.train.common import training_cfgs

    vit_cfg, med_cfg = training_cfgs(vit_cfg, med_cfg, med_remat)
    def train_step(state: VQATrainState, batch):
        B_ = batch["video"].shape[0]

        def loss_fn(params):
            embeds = B.encode_video_frames(params, batch["video"], vit_cfg, dtype=dtype)
            return vqa_train_loss(
                params, embeds, batch["question_ids"], batch["question_mask"],
                batch["answer_ids"], batch["answer_mask"],
                batch["answer_question_index"], batch["weights"],
                med_cfg, batch_size=B_, dtype=dtype,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return VQATrainState(params, opt_state, state.step + 1), {"loss": loss}

    return train_step
