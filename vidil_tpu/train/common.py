"""Shared trainer config normalization."""

from __future__ import annotations

import dataclasses


def training_cfgs(vit_cfg, med_cfg, med_remat: bool = True,
                  default_fused_bwd: bool = True):
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
    fused_env = os.environ.get("VIDIL_TPU_TRAIN_FUSED_BLOCK")
    if fused_env == "0":
        # explicit opt-out: classic remat-full schedule
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_block=False,
                                      use_fused_block_bwd=False)
    elif (vit_cfg.use_fused_block and not vit_cfg.use_fused_block_bwd
          and fused_env != "1"):
        # Whole-layer fused ViT kernel (forward-only form) OFF under
        # autodiff: measured negative on the real chip — its custom-vjp
        # backward recomputes the block through XLA as one chunk, and the
        # caption/VQA steps run 6-7% SLOWER than the classic remat-full
        # schedule (batch 64: caption 0.621 vs 0.578 s/step, vqa 0.653 vs
        # 0.614; benchmarks/misc_train_steps.jsonl remat=fusedblock rows).
        # Re-measure it via VIDIL_TPU_TRAIN_FUSED_BLOCK=1 (the
        # REMAT=fusedblock mode of tools/bench_misc_train_steps.py).
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_block=False)
    elif not vit_cfg.use_fused_block and default_fused_bwd:
        # Measured default: the whole-block Pallas fwd+BWD pair
        # (ops/fused_vit_block.py) — the backward recomputes the forward
        # inside VMEM from the saved residual input (full-remat memory
        # profile, none of the XLA-recompute vjp's HBM boundaries). On
        # chip it beats the classic remat-full schedule at every measured
        # trainer shape (benchmarks/misc_train_steps.jsonl remat=fusedbwd
        # rows vs the remat-None rows at identical shapes): caption b64
        # 0.481 vs 0.578 s/step (46.6% vs 38.8% MFU), vqa b64 0.513 vs
        # 0.614 (45.1% vs 37.6%), caption b32 0.258 vs 0.297, vqa b32
        # 0.275 vs 0.318, pretrain b64 0.340 vs 0.348; at the reference
        # batch 8 it is a ~2% wash (caption 0.0996 vs 0.0974 — the
        # shipped yamls run the TPU-tuned batches 32-64). The dispatch
        # self-gates (models/vit.py): full-size hidden (768/1024) on a
        # real TPU only — tiny test configs and CPU meshes keep the
        # classic XLA path. Retrieval's step shares the same ViT
        # encode+bwd but is not separately A/B'd; opt out per-run with
        # VIDIL_TPU_TRAIN_FUSED_BLOCK=0.
        vit_cfg = dataclasses.replace(vit_cfg, use_fused_block=True,
                                      use_fused_block_bwd=True)
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
