"""Shared trainer config normalization."""

from __future__ import annotations

import dataclasses


def training_cfgs(vit_cfg, med_cfg, med_remat: bool = True):
    """Return (vit_cfg, med_cfg) adjusted for autodiff training.

    * MED-layer remat ON by default — the saved (L, B, Lq, D) activation
      stacks are what blow HBM at large batches.
    * Pallas kernels OFF under autodiff: both the flash-attention and
      fused-MLP kernels' VJPs recompute through XLA anyway (a third
      pass), which under remat duplicates the recompute remat already
      performs — training is cheapest entirely on XLA.
    """
    if med_remat and not med_cfg.remat:
        med_cfg = dataclasses.replace(med_cfg, remat=True)
    if vit_cfg.use_flash:
        vit_cfg = dataclasses.replace(vit_cfg, use_flash=False)
    if vit_cfg.use_fused_mlp:
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_mlp=False)
    if med_cfg.use_fused_mlp:
        med_cfg = dataclasses.replace(med_cfg, use_fused_mlp=False)
    return vit_cfg, med_cfg
