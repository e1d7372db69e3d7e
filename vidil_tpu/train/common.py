"""Shared trainer config normalization."""

from __future__ import annotations

import dataclasses


def training_cfgs(vit_cfg, med_cfg, med_remat: bool = True):
    """Return (vit_cfg, med_cfg) adjusted for autodiff training.

    * MED-layer remat ON by default — the saved (L, B, Lq, D) activation
      stacks are what blow HBM at large batches.
    * Fused-MLP kernel OFF under autodiff: its VJP recomputes through
      XLA (a third pass), which under remat duplicates the recompute
      remat already performs.
    * Flash attention stays as configured: since the Pallas backward
      kernel landed (`ops/flash_attention._flash_backward`) the VJP no
      longer recomputes through XLA at framework shapes, and the
      forward shape gate (`_flash_profitable`) already keeps the 224px
      trainer shapes (197 tokens) on XLA's fused path — flash only
      engages at 384px training, where fwd+bwd both measured faster
      (benchmarks/attention_bwd_sweep.jsonl: 1.84x bwd at 577).
    """
    if med_remat and not med_cfg.remat:
        med_cfg = dataclasses.replace(med_cfg, remat=True)
    if vit_cfg.use_fused_mlp:
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_mlp=False)
    if med_cfg.use_fused_mlp:
        med_cfg = dataclasses.replace(med_cfg, use_fused_mlp=False)
    return vit_cfg, med_cfg
