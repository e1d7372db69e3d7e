"""Tiny train-CLI workspace for end-to-end verification of the real
train_caption_video.py CLI (incl. the train_batch_size_tpu resolution)."""
import json, os, sys
import numpy as np, cv2, yaml
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidil_tpu.models.testing import make_blip_decoder_ckpt, save_torch_ckpt
from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

WS = '/tmp/vws_train'
os.makedirs(WS, exist_ok=True)
videos = os.path.join(WS, 'videos'); os.makedirs(videos, exist_ok=True)
for vi in range(4):
    w = cv2.VideoWriter(os.path.join(videos, f'video{vi}.mp4'),
                        cv2.VideoWriter_fourcc(*'mp4v'), 10, (64, 48))
    for i in range(20):
        w.write(np.full((48, 64, 3), (i * 9 + vi * 30) % 255, np.uint8))
    w.release()

def write_jsonl(path, n_per_video=2):
    with open(path, 'w') as f:
        k = 0
        for vi in range(4):
            for j in range(n_per_video):
                f.write(json.dumps({'caption': f'a test caption {vi} {j}',
                                    'clip_name': f'video{vi}', 'sen_id': k}) + '\n')
                k += 1

write_jsonl(os.path.join(WS, 'train.jsonl'))
write_jsonl(os.path.join(WS, 'val.jsonl'), 1)
write_jsonl(os.path.join(WS, 'test.jsonl'), 1)

vocab_path = os.path.join(WS, 'vocab.txt')
write_test_vocab(vocab_path, ['a', 'test', 'caption', 'video', 'of', '0', '1', '2', '3'])
vocab_size = BlipTokenizer(vocab_path).vocab_size
med_cfg_path = os.path.join(WS, 'med_config.json')
json.dump({'vocab_size': vocab_size, 'hidden_size': 32, 'num_hidden_layers': 2,
           'num_attention_heads': 4, 'intermediate_size': 64,
           'max_position_embeddings': 64, 'encoder_width': 32,
           'add_cross_attention': True}, open(med_cfg_path, 'w'))
VIT_KW = dict(patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
vit_cfg = ViTConfig(image_size=32, **VIT_KW)
med_cfg = MedConfig.from_json(med_cfg_path)
ckpt = os.path.join(WS, 'decoder.pth')
save_torch_ckpt(make_blip_decoder_ckpt(vit_cfg, med_cfg), ckpt)

config = dict(
    video_root=videos,
    train_ann_jsonl=os.path.join(WS, 'train.jsonl'),
    val_ann_jsonl=os.path.join(WS, 'val.jsonl'),
    test_ann_jsonl=os.path.join(WS, 'test.jsonl'),
    num_frm_train=2, num_frm_test=2, frm_sampling_strategy='uniform',
    height=None, width=None, start_time=None, end_time=None, fps=-1,
    video_representation='concat_frame',
    pretrained=ckpt, bert_vocab=vocab_path,
    vit='tiny', vit_config=VIT_KW, med_config=med_cfg_path,
    train_batch_size=2, train_batch_size_tpu=4,  # exercises resolve_train_batch
    test_batch_size=2, init_lr=1e-4,
    image_size=32, max_length=12, min_length=2, num_beams=2,
    prompt='a video of ', weight_decay=0.05, min_lr=0, max_epoch=1,
)
yaml.safe_dump(config, open(os.path.join(WS, 'config.yaml'), 'w'))
print('train ws ready:', WS)
