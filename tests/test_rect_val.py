"""Rect (aspect-ratio batched) validation: the upstream test.py protocol
(rect=True, pad=0.5 — reference test.py:114-119, utils/datasets.py:431-454).

The reference fork hard-forces `self.rect = False` (utils/datasets.py:357),
so the binning code is dead there and its actual val protocol is the square
letterbox (which cli/test.py mirrors by default). Our rect=True mode
restores the upstream protocol; this test re-enables rect in the reference
class to oracle the aspect sort, the per-batch shape formula, and the
per-image letterboxed outputs.
"""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.data.dataset import DataLoader, FaceDataset

from oracle import import_reference
from test_dataset import NKPT, make_fake_widerface

ref = import_reference()

IMGSZ, BS, STRIDE = 192, 2, 32


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    # enough images for several batches with a spread of aspect ratios
    return make_fake_widerface(tmp_path_factory.mktemp("wf_rect"),
                               n_images=9, seed=3)


def make_reference_rect(fake_data):
    """Reference LoadImagesAndLabels with the fork's `self.rect = False`
    forcing (utils/datasets.py:357) undone, restoring upstream behavior:
    a property setter that keeps only the first assignment (the honored
    constructor argument) and ignores the forced re-assignment."""
    datasets = ref("utils.datasets")

    class RectLoad(datasets.LoadImagesAndLabels):
        @property
        def rect(self):
            return self._rect

        @rect.setter
        def rect(self, value):
            if not hasattr(self, "_rect"):
                self._rect = value

    return RectLoad(fake_data, img_size=IMGSZ, batch_size=BS,
                    augment=False, hyp=None, rect=True, stride=STRIDE,
                    pad=0.5, kpt_label=NKPT)


def test_rect_shapes_and_items_match_upstream(fake_data):
    ours = FaceDataset(fake_data, img_size=IMGSZ, augment=False, hyp={},
                       kpt_label=NKPT, stride=STRIDE, rect=True,
                       batch_size=BS, pad=0.5)
    theirs = make_reference_rect(fake_data)

    # aspect sort reorders files identically
    assert [p.split("/")[-1] for p in ours.img_files] == \
        [p.split("/")[-1] for p in theirs.img_files]
    # the per-batch stride-aligned shapes match the upstream formula
    np.testing.assert_array_equal(ours.batch_shapes, theirs.batch_shapes)
    assert len({tuple(s) for s in ours.batch_shapes}) > 1, \
        "fixture should produce >1 distinct rect shape"

    # every item letterboxes to its batch shape with identical pixels,
    # labels, and inverse-mapping metadata
    for i in range(len(ours)):
        img_t, labels_t, _, shapes_t = theirs[i]
        img_o, labels_o, _, shapes_o = ours.get(i)
        want = img_t.numpy().transpose(1, 2, 0)
        assert img_o.shape == want.shape == (
            *ours.batch_shapes[i // BS], 3)
        np.testing.assert_array_equal(img_o, want)
        np.testing.assert_allclose(labels_o, labels_t.numpy()[:, 1:],
                                   atol=1e-5)
        assert shapes_o[0] == shapes_t[0]
        np.testing.assert_allclose(shapes_o[1][0], shapes_t[1][0])
        np.testing.assert_allclose(shapes_o[1][1], shapes_t[1][1])


def test_rect_label_geometry_round_trip(fake_data):
    """Denormalizing a rect item's labels by its own (h, w) frame and
    inverting the letterbox lands back on the original-image coordinates —
    the geometry validate() relies on for rect batches."""
    from face_detection_multi_scale_tpu.data.letterbox import scale_coords
    from face_detection_multi_scale_tpu.ops.boxes import xywh2xyxy

    ours = FaceDataset(fake_data, img_size=IMGSZ, augment=False, hyp={},
                       kpt_label=NKPT, stride=STRIDE, rect=True,
                       batch_size=BS, pad=0.5)
    checked = 0
    for i in range(len(ours)):
        img, labels, path, ((h0, w0), ratio_pad) = ours.get(i)
        if not len(labels):
            continue
        h_in, w_in = img.shape[:2]
        tbox = np.asarray(xywh2xyxy(
            labels[:, 1:5] * [w_in, h_in, w_in, h_in])).astype(np.float64)
        scale_coords((h_in, w_in), tbox, (h0, w0), ratio_pad=ratio_pad)
        # original normalized labels in original pixels
        orig = ours.labels[i]
        want = np.asarray(xywh2xyxy(orig[:, 1:5] * [w0, h0, w0, h0]))
        # scale_coords applies one gain (the h-ratio) to both axes, as the
        # reference does (utils/general.py:381, test.py:193-195), while the
        # true x scale differs slightly from integer resize rounding — a
        # couple of pixels of reference-faithful error
        np.testing.assert_allclose(tbox, want, atol=2.5)
        checked += 1
    assert checked >= 4


def test_validate_runs_rect_batches(fake_data):
    """validate() consumes a rect dataset: one executable per distinct
    batch shape, non-square inputs, finishes with sane outputs."""
    from face_detection_multi_scale_tpu.infer.validate import validate
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model

    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    ds = FaceDataset(fake_data, img_size=IMGSZ, augment=False, hyp={},
                     kpt_label=NKPT, stride=max(spec.strides), rect=True,
                     batch_size=BS, pad=0.5)
    loader = DataLoader(ds, BS, shuffle=False, drop_last=False)
    seen_shapes = {imgs.shape[1:3] for imgs, *_ in loader}
    assert len(seen_shapes) > 1
    out = validate(model, variables, ds, batch_size=BS, max_det=20,
                   verbose=False)
    assert out["images"] == len(ds)
    assert 0.0 <= out["map50"] <= 1.0
