"""Video captioning fine-tune: jitted train step + ITM frame selection.

Reference: train_caption_video.py — AdamW + per-epoch cosine LR, LM loss
with prompt masking; 'single_frame' mode picks the best frame per caption
by ITM argmax (reference :30-36), 'concat_frame' feeds all frame tokens.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import blip as B


class CaptionTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_caption_train_state(params, optimizer) -> CaptionTrainState:
    return CaptionTrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_caption_train_step(vit_cfg: ViTConfig, med_cfg: MedConfig, optimizer,
                            prompt_length: int, dtype=None,
                            video_representation: str = "concat_frame",
                            med_remat: bool = True):
    """step(state, batch) -> (state, metrics).

    batch: video (B, N, S, S, C) normalized, input_ids (B, L) starting with
    [DEC], attention_mask (B, L). 'single_frame' batches expose the chosen
    frame as N == 1.
    """

    from vidil_tpu.train.common import training_cfgs

    vit_cfg, med_cfg = training_cfgs(vit_cfg, med_cfg, med_remat)
    def train_step(state: CaptionTrainState, batch):
        def loss_fn(params):
            embeds = B.encode_video_frames(params, batch["video"], vit_cfg, dtype=dtype)
            return B.blip_caption_loss(
                params, embeds, batch["input_ids"], batch["attention_mask"],
                med_cfg, prompt_length=prompt_length, dtype=dtype,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return CaptionTrainState(params, opt_state, state.step + 1), {"loss": loss}

    return train_step


def select_frame_itm(itm_params, frames, text_ids, text_mask,
                     vit_cfg: ViTConfig, med_cfg: MedConfig, dtype=None):
    """'single_frame' selection: argmax ITM prob over a video's frames for
    its caption (reference: train_caption_video.py:30-36).

    frames: (N, S, S, C) of ONE video; returns the winning frame index.
    """
    N = frames.shape[0]
    embeds = B.encode_images(itm_params, frames, vit_cfg, dtype=dtype)
    ids = jnp.broadcast_to(text_ids, (N,) + text_ids.shape[-1:])
    mask = jnp.broadcast_to(text_mask, (N,) + text_mask.shape[-1:])
    logits = B.blip_itm_scores(itm_params, embeds, ids, mask, med_cfg, dtype=dtype)
    probs = jax.nn.softmax(logits, axis=1)[:, 1]
    return jnp.argmax(probs)
