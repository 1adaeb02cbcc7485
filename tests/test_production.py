"""Production pipeline JSON tensor contract and resume helpers."""

import json

import numpy as np

from face_detection_multi_scale_tpu.infer import production as P


def frame(n, t=0.1):
    return {
        "bboxes": [[1.0, 2.0, 3.0, 4.0]] * n,
        "confidence": [0.9] * n,
        "class_names": ["face"] * n,
        "class_indexes": [0] * n,
        "class_groups": ["face"] * n,
        "scale_used": ["640"] * n,
        "num_faces": n,
        "infer_time": t,
    }


def test_frames_to_json_contract():
    data = P.frames_to_json([frame(2), frame(0), frame(3)], 1.5)
    tensors = {t["name"]: t for t in data["yolo_face_prediction"]}
    assert set(tensors) == {
        "yolo-face-bboxes", "yolo-face-confidence", "yolo-face-class_names",
        "yolo-face-class_indexes", "yolo-face-class_groups",
        "yolo-face-scale_used", "yolo-face-ckpt_version",
        "yolo-face-infer_time", "yolo-face-total_time"}
    bb = tensors["yolo-face-bboxes"]
    assert bb["shape"] == [3, 3, 4]
    assert bb["datatype"] == "FP32"
    # padding sentinel rows
    assert bb["data"][1] == [[-1.0, -1.0, -1.0, -1.0]] * 3
    assert tensors["yolo-face-confidence"]["data"][0] == [0.9, 0.9, -1.0]
    assert tensors["yolo-face-class_indexes"]["data"][1] == [-1, -1, -1]
    assert tensors["yolo-face-total_time"]["data"] == [1.5]
    assert tensors["yolo-face-ckpt_version"]["data"] == \
        [P.CKPT_VERSION] * 3
    assert P.frames_to_json([], 0.0) is None


def test_read_existing_json_roundtrip(tmp_path):
    data = P.frames_to_json([frame(2), frame(1)], 2.5)
    path = tmp_path / "item.json"
    path.write_text(json.dumps(data))
    info = P.read_existing_json(str(path))
    assert info == (2, 3, 2.5)
    assert P.read_existing_json(str(tmp_path / "missing.json")) is None
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert P.read_existing_json(str(bad)) is None


def test_compare_json_shapes(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (a / "1.json").write_text(json.dumps(P.frames_to_json([frame(1)], 0.1)))
    (b / "1.json").write_text(json.dumps(P.frames_to_json([frame(1)], 0.1)))
    (a / "2.json").write_text(json.dumps(
        P.frames_to_json([frame(1), frame(1)], 0.1)))
    (b / "2.json").write_text(json.dumps(P.frames_to_json([frame(1)], 0.1)))
    r = P.compare_json_shapes(str(a), str(b))
    assert r["common"] == 2 and r["match"] == 1
    assert r["mismatches"] == [("2.json", 2, 1)]


def test_get_image_paths_from_base(tmp_path):
    d = tmp_path / "001"
    d.mkdir()
    for i in range(3):
        (d / f"99_original_{i}.jpg").write_bytes(b"x")
    paths = P.get_image_paths_from_base("001/99_original.jpg",
                                        str(tmp_path))
    assert len(paths) == 3
    # falls back to the bare file when no numbered frames exist
    (d / "77_original.jpg").write_bytes(b"x")
    paths = P.get_image_paths_from_base("001/77_original.jpg",
                                        str(tmp_path))
    assert len(paths) == 1


def test_detections_to_dataframe_columns():
    dets = np.array([[10, 20, 50, 80, 0.9, 0, 1]])
    df = P.detections_to_dataframe(dets, "a.jpg", "/x/a.jpg", [640, 3840])
    assert list(df.columns) == [
        "image_path", "full_image_path", "file_name", "face_id",
        "x1", "y1", "x2", "y2", "width", "height", "area",
        "center_x", "center_y", "aspect_ratio", "confidence", "scale_used"]
    assert df.iloc[0]["scale_used"] == 3840
    assert df.iloc[0]["area"] == 40 * 60
    analysis = P.analyze_results(df)
    assert analysis["total_faces"] == 1
