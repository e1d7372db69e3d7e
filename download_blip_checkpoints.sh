#!/usr/bin/env bash
# Fetch the public BLIP checkpoints the pipelines load (reference:
# download_blip_checkpoints.sh) and the HF CLIP assets the visual
# tokenizer needs, then convert everything via tools/convert_checkpoints.py.
set -e
mkdir -p ckpt/pretrained ckpt/finetuned ckpt/clip ckpt/bert-base-uncased

BASE="https://storage.googleapis.com/sfr-vision-language-research/BLIP/models"
wget -nc -P ckpt/pretrained "$BASE/model_base.pth"
wget -nc -P ckpt/pretrained "$BASE/model_base_capfilt_large.pth"
wget -nc -P ckpt/finetuned "$BASE/model_base_retrieval_coco.pth"   # the Filter / blip tokenizer
wget -nc -P ckpt/finetuned "$BASE/model_base_caption_capfilt_large.pth"  # the Captioner
wget -nc -P ckpt/finetuned "$BASE/model_base_vqa_capfilt_large.pth"

# bert-base-uncased vocab (BLIP text side)
wget -nc -O ckpt/bert-base-uncased/vocab.txt \
    "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt"

# CLIP ViT-L/14 weights + BPE files (visual tokenization)
CLIP="https://huggingface.co/openai/clip-vit-large-patch14/resolve/main"
wget -nc -O ckpt/clip/clip-vit-large-patch14.pth "$CLIP/pytorch_model.bin"
wget -nc -O ckpt/clip/vocab.json "$CLIP/vocab.json"
wget -nc -O ckpt/clip/merges.txt "$CLIP/merges.txt"

echo "done. Checkpoints convert lazily at load time (vidil_tpu.models.convert);"
echo "optionally pre-convert to npz: python tools/convert_checkpoints.py --help"
