"""BLIP embedding extractor (reference: models/blip_embedding.py): ITM
layout; itc mode returns (image_feat, text_feat, sim) instead of sim only."""

from __future__ import annotations

import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip import blip_itc_features, blip_itm_scores, encode_images, init_blip_itm

init_blip_embedding = init_blip_itm


def blip_embedding_forward(params, images, text_ids, text_mask,
                           vit_cfg: ViTConfig, med_cfg: MedConfig,
                           match_head: str = "itc", dtype=None):
    """match_head='itm' -> (N, 2) logits; 'itc' -> (image_feat, text_feat, sim)."""
    image_embeds = encode_images(params, images, vit_cfg, dtype=dtype)
    if match_head == "itm":
        return blip_itm_scores(params, image_embeds, text_ids, text_mask, med_cfg, dtype=dtype)
    image_feat, text_feat = blip_itc_features(params, image_embeds, text_ids, text_mask, med_cfg, dtype=dtype)
    sim = image_feat @ text_feat.T
    return image_feat, text_feat, sim
