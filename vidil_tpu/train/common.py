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
      engages at 384px training. There the isolated kernel measures
      1.84x bwd at 577 tokens (benchmarks/attention_bwd_sweep.jsonl)
      but the full retrieval step is near a wash (+6% at batch 8,
      -4% at 16, benchmarks/retrieval_train_step.jsonl use_flash
      rows) — XLA hides much of the isolated win behind adjacent work.
    """
    if med_remat and not med_cfg.remat:
        med_cfg = dataclasses.replace(med_cfg, remat=True)
    if vit_cfg.use_fused_mlp:
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_mlp=False)
    if med_cfg.use_fused_mlp:
        med_cfg = dataclasses.replace(med_cfg, use_fused_mlp=False)
    import os
    if (vit_cfg.use_fused_block
            and not vit_cfg.use_fused_block_bwd
            and os.environ.get("VIDIL_TPU_TRAIN_FUSED_BLOCK") != "1"):
        # Whole-layer fused ViT kernel (forward-only form) OFF under
        # autodiff: measured negative on the real chip — its custom-vjp
        # backward recomputes the block through XLA as one chunk, and the
        # caption/VQA steps run 6-7% SLOWER than the classic remat-full
        # schedule (batch 64: caption 0.621 vs 0.578 s/step, vqa 0.653 vs
        # 0.614; benchmarks/misc_train_steps.jsonl remat=fusedblock rows).
        # Inference encodes keep it (1.25-1.65x, fused_block_ab.jsonl).
        # With use_fused_block_bwd the backward is the whole-block Pallas
        # kernel (recompute-inside-VMEM, no XLA recompute) and the fused
        # pair stays on for training — see the REMAT=fusedbwd mode of
        # tools/bench_misc_train_steps.py for the measured step times.
        # Re-measure the forward-only form via VIDIL_TPU_TRAIN_FUSED_BLOCK=1
        # (the REMAT=fusedblock mode of the same tool).
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_block=False)
    return vit_cfg, med_cfg


def resolve_train_batch(config: dict, key: str, default: int | None = None) -> int:
    """Prefer the TPU-tuned ``<key>_tpu`` yaml key over the reference
    ``<key>`` (VERDICT r3 #7).

    The reference per-GPU batches (8-12) starve a v5e chip: measured
    16.5-29.6% MFU vs 33.6-39.0% at batch 32-64 (ARCHITECTURE.md
    "Measured" table). The shipped train yamls therefore carry a tuned
    ``<key>_tpu`` next to the untouched reference key; delete the _tpu
    key (or set it equal) to reproduce the reference's exact optimization
    hyperparameters. NOTE: a larger batch changes optimization — scale
    ``init_lr`` (linear rule-of-thumb) or expect different convergence
    (PARITY.md "TPU batch defaults").
    """
    base = config.get(key, default)
    tuned = config.get(f"{key}_tpu")
    if tuned is None or (base is not None and int(tuned) == int(base)):
        return int(base)
    print(f"batch: using {key}_tpu={tuned} (reference {key}={base}; the "
          f"reference batch runs starved on this chip — see ARCHITECTURE.md). "
          f"Optimization hyperparameters now differ: scale init_lr or drop "
          f"the _tpu key for exact reference behavior.", flush=True)
    return int(tuned)
