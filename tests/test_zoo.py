"""Zoo specs must match the reference cfg files exactly (guards against
transcription drift in the embedded specs)."""

import os

import pytest

from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.spec import load_spec

CFG_DIR = "/root/reference/cfg"

PAIRS = [
    ("yolov7-face", "yolov7-face.yaml"),
    ("yolov7-w6-face", "yolov7-w6.yaml"),
    ("yolov7-tiny-face", "yolov7-tiny-face.yaml"),
    ("yolov7s-face", "yolov7s-face.yaml"),
    ("yolov7-lite-t", "yolov7-lite-t.yaml"),
    ("yolov7-lite-s", "yolov7-lite-s.yaml"),
]


@pytest.mark.parametrize("name,cfg", PAIRS)
@pytest.mark.skipif(not os.path.isdir(CFG_DIR), reason="reference absent")
def test_zoo_matches_reference_cfg(name, cfg):
    ours = zoo.get_spec(name)
    want = load_spec(f"{CFG_DIR}/{cfg}", name)
    assert ours.nc == want.nc
    assert ours.nkpt == want.nkpt
    assert ours.anchors == want.anchors
    assert ours.strides == want.strides
    assert ours.dw_conv_kpt == want.dw_conv_kpt
    assert ours.depth_multiple == want.depth_multiple
    assert ours.width_multiple == want.width_multiple
    assert len(ours.nodes) == len(want.nodes)
    for i, (a, b) in enumerate(zip(ours.nodes, want.nodes)):
        assert (a.f, a.n, a.op, tuple(a.args)) == (b.f, b.n, b.op, tuple(b.args)), \
            f"{name} node {i}"
        assert (a.c1, a.c2, a.n_resolved, a.repeats) == \
            (b.c1, b.c2, b.n_resolved, b.repeats), f"{name} node {i} channels"


def test_zoo_available():
    names = zoo.available()
    for n, _ in PAIRS:
        assert n in names
