"""validate()'s save-format long tail (reference test.py:197-239,
324-369): --save-txt normalized label files and --save-json COCO
predictions with keypoints."""

import json

import numpy as np

from face_detection_multi_scale_tpu.data.dataset import FaceDataset
from face_detection_multi_scale_tpu.infer.validate import validate
from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.model import init_model

from test_dataset import NKPT, make_fake_widerface


def _noisy_vars(variables, seed=3, noise=0.05):
    import jax
    prng = np.random.RandomState(seed)
    leaves, td = jax.tree.flatten(variables)
    return jax.tree.unflatten(
        td, [l + noise * prng.normal(size=l.shape).astype(np.float32)
             for l in leaves])


def test_validate_save_txt_and_json(tmp_path):
    data = make_fake_widerface(tmp_path / "wf", n_images=3, seed=5)
    spec = zoo.get_spec("yolov7-lite-t")
    model, variables = init_model(spec, img_size=64)
    variables = _noisy_vars(variables)  # break untrained-net score ties
    ds = FaceDataset(data, img_size=64, augment=False, hyp={},
                     kpt_label=NKPT, stride=spec.max_stride,
                     batch_size=3)

    save_dir = tmp_path / "out"
    out = validate(model, variables, ds, batch_size=3, conf_thres=0.05,
                   max_det=20, verbose=False, save_dir=save_dir,
                   save_txt=True, save_conf=True, save_json=True,
                   weights_name="lite.npz")

    # --save-txt: one labels/<stem>.txt per image with detections;
    # lines are `cls x y w h conf` normalized to the ORIGINAL frame
    txts = sorted((save_dir / "labels").glob("*.txt"))
    assert txts, "no label files written"
    for t in txts:
        for line in open(t):
            vals = [float(v) for v in line.split()]
            assert len(vals) == 6  # save_conf appends the confidence
            cls, x, y, w, h, conf = vals
            assert cls == 0.0
            assert 0.0 <= conf <= 1.0
            for v in (x, y):
                assert -0.5 <= v <= 1.5  # centers near the frame
            assert 0.0 < w and 0.0 < h

    # --save-json: COCO records with bbox (xywh top-left), score, and
    # 3*nkpt keypoints
    pred_json = save_dir / "lite_predictions.json"
    assert out["pred_json"] == str(pred_json)
    records = json.load(open(pred_json))
    assert records
    stems = {r["image_id"] for r in records}
    assert stems <= {f"im{i}" for i in range(3)}
    for r in records:
        assert set(r) >= {"image_id", "category_id", "bbox", "score"}
        assert len(r["bbox"]) == 4 and r["bbox"][2] > 0 and r["bbox"][3] > 0
        assert 0.0 <= r["score"] <= 1.0
        assert len(r["keypoints"]) == 3 * NKPT


def test_cli_test_save_flags(tmp_path, capsys):
    """cli/test.py --task val --save-txt --save-json end to end."""
    import yaml

    from cli.test import main

    data = make_fake_widerface(tmp_path / "wf", n_images=2, seed=7)
    dy = tmp_path / "d.yaml"
    dy.write_text(yaml.dump({"train": data, "val": data, "nc": 1,
                             "names": ["face"]}))
    rc = main(["--model", "yolov7-lite-t", "--data", str(dy),
               "--img-size", "64", "--batch-size", "2",
               "--conf-thres", "0.05", "--save-txt", "--save-json",
               "--project", str(tmp_path / "runs"), "--name", "t",
               "--exist-ok"])
    assert rc == 0
    run_dir = tmp_path / "runs" / "t"
    assert (run_dir / "labels").is_dir()
    preds = list(run_dir.glob("*_predictions.json"))
    assert len(preds) == 1
    json.load(open(preds[0]))  # parses
