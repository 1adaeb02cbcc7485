"""Aux tooling parity: blur kernels, annotation parsing, hub API."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.data import blur as B
from face_detection_multi_scale_tpu.data.widerface_annotations import (
    dataset_statistics, load_annotations)

from oracle import import_reference

ref = import_reference()


@pytest.mark.parametrize("btype,strength", [
    ("gaussian", 3), ("gaussian", 12), ("motion", 5), ("motion", 12),
    ("radial", 2), ("radial", 6),
])
def test_blur_parity(btype, strength):
    gen_mod = ref("blur_dataset_generator")
    gen = gen_mod.WiderFaceBlurDatasetGenerator.__new__(gen_mod.WiderFaceBlurDatasetGenerator)
    img = np.random.default_rng(3).integers(0, 255, (120, 160, 3), np.uint8)
    want = gen.apply_blur_effects(img.copy(), btype, strength)
    got = B.apply_blur(img.copy(), btype, strength)
    np.testing.assert_array_equal(got, want)


def test_blur_levels_match_reference():
    gen_mod = ref("blur_dataset_generator")
    gen = gen_mod.WiderFaceBlurDatasetGenerator.__new__(gen_mod.WiderFaceBlurDatasetGenerator)
    gen.__init__("/nonexistent")
    assert B.BLUR_LEVELS == gen.blur_levels
    assert B.EASY_CATEGORIES == gen.easy_categories
    assert B.MEDIUM_CATEGORIES == gen.medium_categories
    assert B.HARD_CATEGORIES == gen.hard_categories


def test_annotation_parser_parity(tmp_path):
    annot = tmp_path / "gt.txt"
    annot.write_text(
        "0--Ev/img1.jpg\n2\n"
        "10 20 30 40 1 0 0 0 2 0\n"
        "50 60 15 18 0 0 1 1 0 0\n"
        "0--Ev/img2.jpg\n0\n0 0 0 0 0 0 0 0 0 0\n")
    viz = ref("visualize_widerface")
    want = viz.load_annotations(str(annot))
    got = load_annotations(str(annot))
    assert set(got) == set(want)
    for k in got:
        assert len(got[k]) == len(want[k])
        for g, w in zip(got[k], want[k]):
            assert g["bbox"] == w["bbox"]
            assert g["invalid"] == w["invalid"]
            assert g["blur"] == w["blur"]
            assert g["occlusion"] == w["occlusion"]

    stats = dataset_statistics(got)
    assert stats["images"] == 2 and stats["faces"] == 2
    assert stats["invalid"] == 1


def test_hub_api():
    from face_detection_multi_scale_tpu import hub

    assert "yolov7-w6-face" in hub.available_models()
    det = hub.create("yolov7-lite-t", img_sizes=(64,))
    assert det.spec.name == "yolov7-lite-t"
