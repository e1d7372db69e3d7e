"""CapFilt: per-frame BLIP captioning + ITM filtering, batched on TPU.

TPU-first redesign of the reference CapFilt driver (reference:
run_video_CapFilt.py). The reference loops video-by-video, captioning the
4 frames of ONE video per device step and scoring ITM one caption at a
time (:107-126). Here:

* frames from MANY videos are captioned in one beam-search program
  (batch = videos_per_batch × num_frm frames),
* the ITM filter is one batched scoring call over all (caption, frame)
  pairs of the chunk — softmax[:, 1], then max/avg-over-frames vs the
  threshold exactly as the reference (:114-122),
* frame preprocessing (bicubic resize via PIL for byte-parity with the
  reference's torchvision path, CLIP-normalize on device) feeds uint8 to
  the device once.

Output JSON contracts (video_text_Cap.json / video_text_CapFilt.json and
the per-rank tmp files) are byte-identical to the reference
(:249-291).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import blip as B
from vidil_tpu.ops.generation import GenerationConfig
from vidil_tpu.ops.image import (CLIP_MEAN, CLIP_STD, YUV420Frames,
                                 preprocess_any)
from vidil_tpu.pipeline.fused_filter import (
    fused_applicable, itm_ids_from_seqs, itm_ids_from_seqs_np,
)


# ---------------------------------------------------------------------------
# host-side preprocessing (PIL bicubic for exact reference parity)
# ---------------------------------------------------------------------------

def preprocess_frames_pil(frames_u8: np.ndarray, image_size: int) -> np.ndarray:
    """(F, H, W, C) uint8 -> (F, S, S, C) uint8, PIL bicubic resize
    (reference: run_video_CapFilt.py:128-137 via torchvision/PIL)."""
    out = np.empty((len(frames_u8), image_size, image_size, 3), np.uint8)
    for i, frm in enumerate(frames_u8):
        img = Image.fromarray(frm).resize((image_size, image_size), Image.BICUBIC)
        out[i] = np.asarray(img)
    return out


# sentence splitting lives in pipeline.sentences (spaCy senter when
# available, sentencizer-grade rules offline); re-exported here for the
# CapFilt path and train/frame_selection (reference:
# run_video_CapFilt.py:142,166-175, pretrain_video.py:30-44)
from vidil_tpu.pipeline.sentences import split_sentences  # noqa: F401


def original_caption_sentences(texts: list[str], do_sentence_tokenization: bool) -> list[str]:
    """reference: run_video_CapFilt.py:166-175."""
    if do_sentence_tokenization:
        out = []
        for original_cap in texts:
            for sent in split_sentences(original_cap.replace("\n", ". ")):
                if len(sent) > 3:
                    out.append(sent.strip())
        return out
    return [cap.replace("\n", ". ").strip() for cap in texts]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _num_frames(frames) -> int:
    return frames.num_frames if isinstance(frames, YUV420Frames) else frames.shape[0]


def _is_device_array(x) -> bool:
    return isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray)


def _concat_frames(frame_list):
    """Concatenate per-video frames along the frame axis; accepts uint8 RGB
    arrays or YUV420Frames plane tuples (host numpy or device arrays)."""
    if isinstance(frame_list[0], YUV420Frames):
        cat = jnp.concatenate if _is_device_array(frame_list[0].y) else np.concatenate
        return YUV420Frames(*(cat([f[i] for f in frame_list], axis=0) for i in range(3)))
    cat = jnp.concatenate if _is_device_array(frame_list[0]) else np.concatenate
    return cat(frame_list, axis=0)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

@dataclass
class CapFiltResult:
    video_id: str
    unfiltered_text: list[str]
    text: list[str]


@dataclass
class ChunkDispatch:
    """Device work of one chunk, in flight (see CapFiltEngine.dispatch_chunk)."""

    chunk: list[dict]
    config: dict
    num_frm: int
    seqs_dev: object | None      # (V*F, max_length) caption token ids, async
    frame_embeds: object | None  # (V, F, P, D) filterer ViT outputs, async
    itm_probs: object | None = None  # (V, F, F) fused-filter probs, async
    n_real: int | None = None    # videos before tail-chunk padding (counters)


class CapFiltEngine:
    """Jitted captioner + filterer over chunks of videos."""

    def __init__(
        self,
        captioner_params,
        filterer_params,
        tokenizer,
        vit_cfg: ViTConfig,
        med_cfg: MedConfig,
        *,
        prompt: str = "a picture of ",
        num_beams: int = 3,
        max_length: int = 20,
        min_length: int = 5,
        top_p: float = 0.9,
        itm_max_text_len: int = 35,
        dtype=jnp.bfloat16,
        length_norm: str = "legacy",
        beam_group_kv: bool = False,
        cross_kv_int8: bool | str = False,  # False | True (int8 store) | 'dot'
        # ('dot' = int8 MXU attention dots; needs beam_group_kv=True — at
        # beam_size 1 it degrades to the int8-store dequant path)
        decode_layer_unroll: bool = False,  # unrolled per-layer decode cache
        decode_lazy_reorder: bool = False,  # ancestry-gather beam reorder
        # (both bit-identical-output: see med.init_self_cache docstring)
        early_exit: bool = True,
        early_readback: bool = True,
        fused_filter: bool = True,
        mesh=None,
    ):
        # mesh: optional jax.sharding.Mesh with a 'data' axis. When given,
        # params are replicated across the mesh once and every batch input
        # is sharded over 'data', so one engine serves all local chips SPMD
        # (the reference data-parallelizes inference by launching one
        # process per GPU; here it is one program over the device mesh).
        self.mesh = mesh
        self.early_readback = early_readback
        self.fused_filter = fused_filter
        # observability: how often the fused filter's host verification
        # had to re-score videos through the classic path
        self.fused_fallback_videos = 0
        self.fused_total_videos = 0
        if mesh is not None:
            from vidil_tpu.parallel.mesh import replicated

            captioner_params = jax.device_put(captioner_params, replicated(mesh))
            filterer_params = jax.device_put(filterer_params, replicated(mesh))
        self.captioner_params = captioner_params
        self.filterer_params = filterer_params
        self.tok = tokenizer
        self.vit_cfg = vit_cfg
        self.med_cfg = med_cfg
        self.prompt = prompt
        self.itm_max_text_len = itm_max_text_len
        self.dtype = dtype

        # prompt ids: [DEC] + prompt tokens, trailing [SEP] cut
        # (reference: models/blip.py:135-138)
        prompt_ids = tokenizer.encode(prompt)
        prompt_ids[0] = tokenizer.bos_token_id
        self.prompt_ids = np.asarray(prompt_ids[:-1], np.int32)
        # reference prompt_length counts prompt tokens incl. bos
        # (models/blip.py:101: len(tokenizer(prompt).input_ids) - 1)
        self.prompt_length = len(prompt_ids) - 1

        # Fused-filter ITM text length: generated captions carry at most
        # max_length - len(prompt_ids) tokens, so [CLS] + caption + [SEP]
        # fits in that + 2 — trimming the itm_max_text_len=35 pad
        # (reference run_video_CapFilt.py:110 contract) to this bound cuts
        # the per-(caption, frame) MED rows ~L/35 with BITWISE-identical
        # probs (masked pads contribute exactly 0; same argument as the
        # tokenization rerank trim). Host verification re-tokenizes at the
        # full 35 and falls back to the classic 35-pad path for any row
        # whose WordPiece re-tokenization expands past this bound.
        self.itm_text_len_fused = min(
            itm_max_text_len, _round_up(max_length - len(self.prompt_ids) + 2, 8))

        self.gen_beam = GenerationConfig(
            max_length=max_length, min_length=min_length, num_beams=num_beams,
            eos_token_id=tokenizer.sep_token_id, pad_token_id=tokenizer.pad_token_id,
            repetition_penalty=1.0, length_norm=length_norm, early_exit=early_exit,
        )
        self.gen_sample = GenerationConfig(
            max_length=max_length, min_length=min_length, num_beams=1,
            eos_token_id=tokenizer.sep_token_id, pad_token_id=tokenizer.pad_token_id,
            repetition_penalty=1.1, top_p=top_p, length_norm=length_norm,
            early_exit=early_exit,
        )

        mean = np.asarray(CLIP_MEAN, np.float32)
        std = np.asarray(CLIP_STD, np.float32)

        # NOTE (TPU-first, and load-bearing on remote-compiled backends):
        #  * params are explicit jit ARGUMENTS, never closure captures — a
        #    captured param tree is serialized into the compiled module;
        #  * encode and generate are separate jits — the intermediate
        #    (B, P, D) embeddings stay on device between calls, and the two
        #    programs compile far faster than a fused ViT+beam-search graph.
        @partial(jax.jit, static_argnames=("sample",))
        def _generate(params, embeds, rng, sample=False):
            prompt_b = jnp.broadcast_to(jnp.asarray(self.prompt_ids), (embeds.shape[0], len(self.prompt_ids)))
            gen = self.gen_sample if sample else self.gen_beam
            return B.blip_generate_ids(
                params, embeds, prompt_b, med_cfg, gen,
                sample=sample, rng_key=rng, dtype=dtype,
                beam_group_kv=beam_group_kv and not sample,
                cross_kv_int8=cross_kv_int8,
                decode_layer_unroll=decode_layer_unroll,
                decode_lazy_reorder=decode_lazy_reorder,
            )

        @jax.jit
        def _encode(params, frames_u8):
            # frames arrive as uint8 RGB or a YUV420Frames plane tuple
            # (half the host->device bytes; colorspace conversion fuses
            # into this program), at image_size (host PIL resize, the
            # parity default) or at native decode resolution
            # (resize_on_device: bicubic runs on device, ~2x fewer link
            # bytes for sub-384 sources). jit retraces per input
            # structure/shape; see ops/image.preprocess_any.
            x = preprocess_any(frames_u8, vit_cfg.image_size, mean, std)
            return B.encode_images(params, x, vit_cfg, dtype=dtype)

        def _caption(frames_u8, rng, sample=False):
            embeds = _encode(self.captioner_params, frames_u8)
            return _generate(self.captioner_params, embeds, rng, sample=sample)

        @partial(jax.jit, static_argnames=("num_frm",))
        def _encode_filter(params, frames_u8, num_frm):
            """(V*F, S, S, C) uint8 -> (V, F, P, D); result stays on device."""
            embeds = _encode(params, frames_u8)
            V = _num_frames(frames_u8) // num_frm
            return embeds.reshape((V, num_frm) + embeds.shape[1:])

        @jax.jit
        def _itm_pairs_fn(params, frame_embeds, vid_idx, text_ids, text_mask):
            """Score every (text, frame) pair on device: frame_embeds
            (V, F, P, D), vid_idx (n,) -> probs (n, F). The pair expansion
            happens on-chip — no embedding round-trips through the host."""
            n = vid_idx.shape[0]
            F = frame_embeds.shape[1]
            img = frame_embeds[vid_idx]  # (n, F, P, D)
            img = img.reshape((n * F,) + img.shape[2:])
            ids_rep = jnp.repeat(text_ids, F, axis=0)
            mask_rep = jnp.repeat(text_mask, F, axis=0)
            logits = B.blip_itm_scores(params, img, ids_rep, mask_rep, med_cfg, dtype=dtype)
            return jax.nn.softmax(logits, axis=1)[:, 1].reshape(n, F)

        def _itm_grouped_core(params, frame_embeds, text_ids, text_mask):
            """Grouped (text, frame) scoring: frame_embeds (V, F, P, D),
            text_ids/mask (V, T, L) (texts padded per video) -> probs
            (V, T, F). All T texts of a video share each frame's memory
            via grouped cross-attention, so the per-frame cross-K/V
            projections — the dominant ITM FLOPs — run once per frame
            instead of once per (text, frame) pair."""
            V, F = frame_embeds.shape[:2]
            T, L = text_ids.shape[1:]
            img = frame_embeds.reshape((V * F,) + frame_embeds.shape[2:])
            # query rows ordered (v, f, t): group t-rows share frame (v, f)
            ids = jnp.broadcast_to(text_ids[:, None], (V, F, T, L)).reshape(V * F * T, L)
            mask = jnp.broadcast_to(text_mask[:, None], (V, F, T, L)).reshape(V * F * T, L)
            logits = B.blip_itm_scores(params, img, ids, mask, med_cfg,
                                       dtype=dtype, group_size=T)
            probs = jax.nn.softmax(logits, axis=1)[:, 1].reshape(V, F, T)
            return probs.transpose(0, 2, 1)  # (V, T, F)

        _itm_grouped_fn = jax.jit(_itm_grouped_core)

        @jax.jit
        def _itm_fused_fn(params, frame_embeds, seqs):
            """Fused filter: build the ITM text ids ON DEVICE from the
            generated sequences (fused_filter.itm_ids_from_seqs — the
            token-level equivalent of tokenizer(decode(seq)) for
            retok-stable captions) and score every frame's caption
            against every frame of its video: (V, F, P, D) x (V*F, Lgen)
            -> probs (V, T=F, F). Lets the whole chunk run as one
            uninterrupted device chain; complete_chunk verifies
            retok-stability per row and falls back to the classic path
            for rows where it fails."""
            V, F = frame_embeds.shape[:2]
            ids, tmask = itm_ids_from_seqs(
                seqs, len(self.prompt_ids), tokenizer.cls_token_id,
                tokenizer.sep_token_id, tokenizer.pad_token_id,
                self.itm_text_len_fused)
            L = ids.shape[1]
            ids = ids.reshape(V, F, L)
            tmask = tmask.reshape(V, F, L)
            # pad rows to the classic path's text-COUNT bucket so the
            # grouped program runs with the same group_size T as
            # filter_captions_batch would; the text LENGTH differs (fused
            # Lf vs classic 35), which keeps per-row probs bitwise equal
            # anyway because masked pads contribute exactly 0 (exp
            # underflow). Padded rows mirror classic: zero ids, mask [1,0..]
            T = _round_up(F, 4)
            if T != F:
                pad_ids = jnp.zeros((V, T - F, L), jnp.int32)
                pad_mask = jnp.zeros((V, T - F, L), jnp.int32).at[:, :, 0].set(1)
                ids = jnp.concatenate([ids, pad_ids], axis=1)
                tmask = jnp.concatenate([tmask, pad_mask], axis=1)
            return _itm_grouped_core(params, frame_embeds, ids, tmask)

        self._caption = _caption
        # split handles for measurement tools (tools/ab_decode_int8.py):
        # encode once, time the beam decode alone
        self.encode_captioner = lambda frames: _encode(self.captioner_params, frames)
        self.generate_beam = lambda embeds, rng: _generate(self.captioner_params, embeds, rng)
        self._encode_filter_frames = lambda frames, num_frm: _encode_filter(
            self.filterer_params, frames, num_frm)
        self._itm_pairs = lambda *a: _itm_pairs_fn(self.filterer_params, *a)
        self._itm_grouped = lambda *a: _itm_grouped_fn(self.filterer_params, *a)
        self._itm_fused = lambda *a: _itm_fused_fn(self.filterer_params, *a)

    def _put(self, x):
        """Device placement honoring the mesh: shard dim 0 over 'data'
        when divisible, replicate otherwise; plain transfer without a mesh."""
        if isinstance(x, YUV420Frames):
            return YUV420Frames(*(self._put(p) for p in x))
        if self.mesh is None:
            return jnp.asarray(x)
        from vidil_tpu.parallel.mesh import batch_put

        return batch_put(self.mesh, x)

    # -- captioning ---------------------------------------------------------

    def caption_frames(self, frames_u8: np.ndarray, mode: str = "beam", rng=None) -> list[str]:
        """(F, S, S, C) uint8 -> F caption strings (one per frame)."""
        rng = jax.random.PRNGKey(0) if rng is None else rng
        seqs = self._caption(self._put(frames_u8), rng, sample=(mode != "beam"))
        return B.decode_captions(self.tok, np.asarray(seqs), self.prompt)

    # -- filtering ----------------------------------------------------------

    def filter_captions_batch(
        self, frame_embeds, texts_per_video: list[list[str]],
        threshold: float, mode: str = "max_filter", text_bucket: int = 4,
    ) -> list[list[str]]:
        """Score all (text, frame) pairs of a chunk in one batched ITM call.

        frame_embeds: (V, F, P, D) filterer ViT outputs — a DEVICE array.
        Texts are padded per video to a bucketed T and scored with grouped
        cross-attention (all of a video's texts share each frame's memory:
        the per-frame cross-K/V projections — the dominant ITM FLOPs —
        run once per frame instead of once per pair). Only the (V, T, F)
        probabilities come back to the host.
        """
        V, F = frame_embeds.shape[:2]
        n_texts = [len(t) for t in texts_per_video]
        T = _round_up(max(n_texts, default=0), text_bucket)
        if T == 0:
            return [[] for _ in range(V)]

        flat = [text for texts in texts_per_video for text in texts]
        enc = self.tok(flat, padding="max_length", truncation=True,
                       max_length=self.itm_max_text_len)
        L = enc.input_ids.shape[1]
        ids = np.zeros((V, T, L), np.int32)
        mask = np.zeros_like(ids)
        pos = 0
        for v, n in enumerate(n_texts):
            ids[v, :n] = enc.input_ids[pos:pos + n]
            mask[v, :n] = enc.attention_mask[pos:pos + n]
            pos += n
        mask[:, :, 0] = 1  # [CLS] always attended (incl. padded rows)

        probs = np.asarray(self._itm_grouped(
            frame_embeds, self._put(ids), self._put(mask)))  # (V, T, F)

        agg = probs.max(axis=2) if mode == "max_filter" else probs.sum(axis=2) / F
        out: list[list[str]] = [[] for _ in range(V)]
        for v, texts in enumerate(texts_per_video):
            for t, text in enumerate(texts):
                if agg[v, t] > threshold:
                    out[v].append(text)
        return out

    def encode_filter_frames(self, frames_u8: np.ndarray, num_frm: int):
        """(V*F, S, S, C) uint8 -> device array (V, F, P, D)."""
        return self._encode_filter_frames(self._put(frames_u8), num_frm)

    # -- full CapFilt over a chunk ------------------------------------------

    def dispatch_chunk(self, chunk: list[dict], config: dict, rng=None,
                       n_real: int | None = None) -> ChunkDispatch:
        """Enqueue a chunk's device programs WITHOUT blocking the host.

        chunk items: {'video_id': str, 'frames': (F, S, S, C) uint8,
                      'text': [original captions]}
        config keys follow the reference yaml (caption / filter /
        filter_generated_only / keep_original_caption / threshold /
        filter_mode / generation_mode / do_sentence_tokenization).

        Dispatch order is load-bearing for throughput: the caption
        programs (encode + beam decode) AND the filter-side ViT encode
        are all enqueued BEFORE the host blocks on the caption-token
        readback (in complete_chunk), so the device runs the filter
        encode while the host waits out the decode + readback RTT and
        does its string work (detokenize/dedup/assemble). A strictly
        sequential order left the device idle for the whole host-glue
        window (measured ~0.1-0.6 s/iter on the tunnel).

        Cross-chunk pipelining history, path-dependent: for the CLASSIC
        filter, keeping a chunk in flight measured a wash (interleaved
        A/B: seq 123.4 vs pipe 120.5 f/s; capfilt_ab_pipeline.jsonl) —
        its mid-chunk caption->ITM host dependency serialized every
        schedule. The FUSED filter removed that dependency (ITM ids
        built on device), after which one chunk in flight is worth +27%
        (capfilt_ab_fused.jsonl) — that is the dispatch_chunk/
        complete_chunk split the CLI and bench.py use
        (run_video_CapFilt.py keep_in_flight).
        """
        F = _num_frames(chunk[0]["frames"])

        # frames go to the device ONCE; the caption and filter paths share
        # the device-resident array. Per-video frames may already be device
        # arrays (the CLI device_puts them from its decode threads so the
        # host->TPU transfer overlaps the previous chunk's compute), and may
        # be uint8 RGB or YUV420Frames plane tuples.
        all_frames_dev = self._put(_concat_frames([c["frames"] for c in chunk]))

        need_filter = config.get("filter", True)
        seqs_dev = None
        frame_embeds = None
        if config.get("caption", True):
            rng_key = jax.random.PRNGKey(0) if rng is None else rng
            sample = config.get("generation_mode", "beam") != "beam"
            seqs_dev = self._caption(all_frames_dev, rng_key, sample=sample)
            # Request the caption-token D2H copy now, before the filter
            # encode enters the queue, so on hosts with independent DMA
            # the small transfer overlaps the filter encode rather than
            # being requested only at complete_chunk's np.asarray.
            # Measured NEUTRAL on the dev tunnel (interleaved A/B: late
            # 2.093 s vs early 2.085 s median at batch 64 —
            # tools/ab_capfilt_readback.py, artifact
            # benchmarks/capfilt_ab_readback.jsonl); kept because the
            # async request is free and the win case costs nothing here.
            if self.early_readback:
                try:
                    seqs_dev.copy_to_host_async()
                except AttributeError:
                    pass  # non-jax.Array stand-ins in tests
        if need_filter:
            frame_embeds = self.encode_filter_frames(all_frames_dev, F)
        itm_probs = None
        if self.fused_filter and seqs_dev is not None and need_filter \
                and fused_applicable(config):
            # Fused filter: ITM text ids built on device from the
            # generated sequences, so the chunk's entire device work
            # (encode -> decode -> filter encode -> ITM) is enqueued
            # here with no host round trip in the middle. complete_chunk
            # verifies per-row retok-stability and falls back to the
            # classic path where it fails, keeping results exactly equal
            # to the classic path.
            itm_probs = self._itm_fused(frame_embeds, seqs_dev)
            if self.early_readback:
                try:
                    itm_probs.copy_to_host_async()
                except AttributeError:
                    pass
        return ChunkDispatch(chunk, config, F, seqs_dev, frame_embeds, itm_probs,
                             n_real=n_real)

    def complete_chunk(self, d: ChunkDispatch) -> list[CapFiltResult]:
        """Block on a dispatched chunk's device work and assemble results."""
        chunk, config, F = d.chunk, d.config, d.num_frm
        frame_embeds = d.frame_embeds
        results = []

        if d.seqs_dev is not None:
            captions = B.decode_captions(self.tok, np.asarray(d.seqs_dev), self.prompt)
        else:
            captions = None

        # 2. per-video candidate assembly (reference :166-196)
        generated_per_video: list[list[str]] = []
        candidates_per_video: list[list[str]] = []
        unfiltered: list[list[str]] = []
        originals: list[list[str]] = []
        for v, item in enumerate(chunk):
            orig = original_caption_sentences(
                item.get("text", []), config.get("do_sentence_tokenization", True)
            )
            originals.append(orig)
            if captions is None:
                generated_per_video.append([])
                candidates_per_video.append(orig)
                unfiltered.append(orig)
            else:
                caps = captions[v * F : (v + 1) * F]
                dedup: list[str] = []
                for cap in caps:
                    if cap not in dedup:
                        dedup.append(cap)
                generated_per_video.append(dedup)
                if config.get("keep_original_caption", False):
                    cands = orig + dedup
                else:
                    cands = dedup
                candidates_per_video.append(cands)
                unfiltered.append(cands)

        # 3. filtering (reference :197-204)
        if config.get("filter", True):
            to_filter = (
                generated_per_video if config.get("filter_generated_only", False)
                else candidates_per_video
            )
            if d.itm_probs is not None:
                filtered = self._fused_filter_results(d, to_filter, captions)
            else:
                filtered = self.filter_captions_batch(
                    frame_embeds, to_filter, config["threshold"], config.get("filter_mode", "max_filter")
                )
            for v, item in enumerate(chunk):
                if config.get("filter_generated_only", False):
                    # reference :178-204: item['text'] keeps the RAW original
                    # captions (keep_original_caption=True or caption=False),
                    # is reset to [] otherwise, then += filtered(generated)
                    if captions is None or config.get("keep_original_caption", False):
                        base = list(item.get("text", []))
                    else:
                        base = []
                    text = base + filtered[v]
                else:
                    text = filtered[v]
                results.append(CapFiltResult(item["video_id"], unfiltered[v], text))
        else:
            for v, item in enumerate(chunk):
                results.append(CapFiltResult(item["video_id"], unfiltered[v], candidates_per_video[v]))
        return results

    def _fused_filter_results(self, d: ChunkDispatch, to_filter: list[list[str]],
                              captions: list[str]) -> list[list[str]]:
        """Fused-path replacement for filter_captions_batch.

        Each dedup'd text's score is looked up from the device-computed
        (V, T, F) probs at its first-occurrence frame row, after
        VERIFYING that re-tokenizing the decoded caption on the host
        reproduces exactly the ids the device scored
        (fused_filter.itm_ids_from_seqs_np mirror). Videos with any
        unstable row — unusual WordPiece merges, mid-sequence special
        tokens — are re-scored in ONE batched classic call with the same
        text bucket the full classic program would have used, so every
        ITM input is token-exact either way; a chunk-level bucket
        mismatch (possible at num_frm > 4 with heavy dedup) falls back
        to the whole-chunk classic call outright. Cumulative fallback
        counts are kept on the engine (`fused_fallback_videos` /
        `fused_total_videos`) for observability.
        """
        config, F = d.config, d.num_frm
        probs = np.asarray(d.itm_probs)   # (V, T, F)
        mode = config.get("filter_mode", "max_filter")
        threshold = config["threshold"]
        # count only videos BEFORE tail-chunk padding (the CLI pads the
        # last chunk with copies of chunk[0]; pads would otherwise inflate
        # both counters and skew the fallback rate these exist to report)
        n_real = len(to_filter) if d.n_real is None else min(d.n_real, len(to_filter))
        self.fused_total_videos += n_real

        # the fused program bucketed its rows to round_up(F, 4); the
        # classic program buckets to round_up(max #texts, 4) — equal
        # shapes (hence bitwise-equal per-row probs) only when the
        # buckets coincide
        max_n = max((len(t) for t in to_filter), default=0)
        T_classic = _round_up(max_n, 4)
        if max_n > 0 and T_classic != probs.shape[1]:
            self.fused_fallback_videos += n_real
            return self.filter_captions_batch(d.frame_embeds, to_filter,
                                              threshold, mode)

        seqs_np = np.asarray(d.seqs_dev)
        Lf = self.itm_text_len_fused
        dev_ids, _ = itm_ids_from_seqs_np(
            seqs_np, len(self.prompt_ids), self.tok.cls_token_id,
            self.tok.sep_token_id, self.tok.pad_token_id, Lf)
        out: list[list[str] | None] = []
        fallback: list[int] = []
        for v, texts in enumerate(to_filter):
            caps_v = captions[v * F:(v + 1) * F]
            keep: list[str] = []
            ok = True
            if texts:
                enc = self.tok(texts, padding="max_length", truncation=True,
                               max_length=self.itm_max_text_len)
                for t_idx, t in enumerate(texts):
                    f0 = caps_v.index(t) if t in caps_v else -1
                    # compare over the fused length; anything past it in
                    # the 35-pad host re-tokenization must be pure pad
                    # (a retok-EXPANDED caption overflows the fused bound
                    # and takes the classic 35-pad path instead)
                    if (f0 < 0
                            or (enc.input_ids[t_idx][Lf:]
                                != self.tok.pad_token_id).any()
                            or not np.array_equal(enc.input_ids[t_idx][:Lf],
                                                  dev_ids[v * F + f0])):
                        ok = False
                        break
                    row = probs[v, f0]
                    agg = row.max() if mode == "max_filter" else row.sum() / F
                    if agg > threshold:
                        keep.append(t)
            if ok:
                out.append(keep)
            else:
                out.append(None)
                fallback.append(v)
        if fallback:
            self.fused_fallback_videos += sum(1 for v in fallback if v < n_real)
            fe = d.frame_embeds[np.asarray(fallback)]
            rescored = self.filter_captions_batch(
                fe, [to_filter[v] for v in fallback], threshold, mode,
                text_bucket=T_classic)
            for v, res in zip(fallback, rescored):
                out[v] = res
        return out

    def run_chunk(self, chunk: list[dict], config: dict, rng=None) -> list[CapFiltResult]:
        """Process one chunk of videos with already-decoded frames
        (dispatch + complete; see those methods for the contract)."""
        return self.complete_chunk(self.dispatch_chunk(chunk, config, rng))
