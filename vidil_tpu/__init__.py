"""vidil_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-language framework.

Re-implements the capabilities of VidIL ("Language Models with Image
Descriptors are Strong Few-Shot Video-Language Learners", NeurIPS 2022)
from scratch with a TPU-first design:

* pure-functional BLIP (ViT + MED) and CLIP model cores with params as
  pytrees (``vidil_tpu.models``),
* batched, jitted inference engines — on-device beam search / nucleus
  sampling, fused ITM filtering, one-matmul visual tokenization
  (``vidil_tpu.ops``, ``vidil_tpu.pipeline``),
* SPMD scaling over ``jax.sharding.Mesh`` (``vidil_tpu.parallel``),
* optax-based training for retrieval / captioning / VQA / pretraining
  with momentum encoders and feature queues as explicit functional state
  (``vidil_tpu.train``),
* host-side data plumbing (video decode, frame sampling, prompt
  templating, JSON contracts) that preserves the reference's file
  formats exactly (``vidil_tpu.data``, ``vidil_tpu.pipeline``).
"""

__version__ = "0.1.0"
