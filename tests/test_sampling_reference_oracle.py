"""Frame-sampling strategies vs the LIVE reference dataset code.

sample_frame_indices decides which frames feed every pipeline; it was
pinned only by self-derived expectations. Here the reference's
data/video_pretrain_dataset.py is loaded standalone (decord/av/
torchvision stubbed), its _load_video_from_path_decord driven with a
fake VideoReader that records the indices it computes, and both sides
run under identical random/np.random seeds — so each strategy's index
stream must match element-for-element, including the RNG call order.
Ref: data/video_pretrain_dataset.py:132-178.
"""

import importlib.util
import os
import random
import re
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/data/video_pretrain_dataset.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree not present")

from vidil_tpu.data.sampling import sample_frame_indices  # noqa: E402

ALLOWED = ("torchvision", "pycocotools", "pycocoevalcap", "decord", "av",
           "timm")


def _stub(name):
    import importlib.machinery

    m = types.ModuleType(name)
    m.__path__ = []
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    parent, _, child = name.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, m)
    return m


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, "/root/reference")
    # decord needs callable attrs before module exec reaches them
    dec = _stub("decord")
    dec.VideoReader = object
    bridge = _stub("decord.bridge")
    bridge.set_bridge = lambda *a: None
    dec.bridge = bridge
    _stub("av")
    for _ in range(40):
        spec = importlib.util.spec_from_file_location("ref_vpd", REF)
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
            return mod
        except ModuleNotFoundError as e:
            if not any(e.name.startswith(p) for p in ALLOWED):
                raise
            _stub(e.name)
        except ImportError as e:
            m = re.search(r"cannot import name '(\w+)' from '([\w\.]+)'", str(e))
            if not m or not any(m.group(2).startswith(p) for p in ALLOWED):
                raise
            setattr(sys.modules[m.group(2)], m.group(1), object())
    raise RuntimeError("could not stub reference deps")


def _reference_indices(ref, strategy, vlen, num_frm, seed):
    """Drive the reference's loader with a fake VideoReader that records
    the frame indices it computes."""
    captured = {}

    class _FakeBatch:
        def __init__(self, idx):
            self._idx = np.asarray(idx)

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return np.zeros((len(self._idx), 2, 2, 3), np.uint8)

    class FakeVR:
        def __init__(self, path, width=None, height=None):
            pass

        def __len__(self):
            return vlen

        def get_batch(self, idx):
            captured["idx"] = np.asarray(idx)
            return _FakeBatch(idx)

    old = ref.VideoReader
    ref.VideoReader = FakeVR
    try:
        ds = object.__new__(ref.pretrain_video_dataset)
        ds.config = dict(frm_sampling_strategy=strategy, num_frm_train=num_frm,
                         height=None, width=None, start_time=None,
                         end_time=None, fps=-1, vit="base")
        random.seed(seed)
        np.random.seed(seed)
        out = ds._load_video_from_path_decord("fake.mp4")
        assert out is not None, "reference loader failed silently"
    finally:
        ref.VideoReader = old
    return captured["idx"]


@pytest.mark.parametrize("strategy", ["uniform", "nlvl_uniform", "nlvl_rand",
                                      "rand", "headtail"])
@pytest.mark.parametrize("vlen,num_frm", [(40, 4), (31, 4), (100, 8), (9, 4)])
@pytest.mark.parametrize("seed", [0, 7])
def test_indices_match_reference(ref, strategy, vlen, num_frm, seed):
    theirs = _reference_indices(ref, strategy, vlen, num_frm, seed)
    random.seed(seed)
    np.random.seed(seed)
    ours = sample_frame_indices(vlen, num_frm, strategy)
    np.testing.assert_array_equal(np.asarray(ours), theirs)
