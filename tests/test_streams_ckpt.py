"""Stream readers and checkpoint round-trips."""

import numpy as np

from face_detection_multi_scale_tpu.data.streams import LoadImages


def test_load_images_mixed_sources(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"),
                    rng.integers(0, 255, (60, 80, 3), np.uint8))
    vid_path = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             10, (80, 60))
    for _ in range(5):
        writer.write(rng.integers(0, 255, (60, 80, 3), np.uint8))
    writer.release()

    loader = LoadImages(str(tmp_path))
    assert len(loader) == 4  # 3 images + 1 video
    frames = list(loader)
    img_frames = [f for f in frames if f[2] is None]
    vid_frames = [f for f in frames if f[2] is not None]
    assert len(img_frames) == 3
    assert len(vid_frames) == 5
    assert vid_frames[0][1].shape == (60, 80, 3)


def test_inference_weights_roundtrip(tmp_path):
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.train.checkpoint import (
        load_inference_weights, save_inference_weights)

    import jax

    spec = zoo.get_spec("yolov7-lite-t")
    _, variables = init_model(spec, img_size=64)
    path = str(tmp_path / "w.npz")
    save_inference_weights(path, jax.device_get(variables))
    loaded = load_inference_weights(path)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    assert len(flat_a) == len(flat_b)
    for keypath, val in flat_a:
        np.testing.assert_array_equal(np.asarray(val),
                                      np.asarray(flat_b[keypath]))


def test_orbax_state_roundtrip(tmp_path):
    import jax

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint)
    from face_detection_multi_scale_tpu.train.trainer import (
        create_train_state)

    spec = zoo.get_spec("yolov7-lite-t")
    _, variables = init_model(spec, img_size=64)
    state = create_train_state(variables)
    save_checkpoint(str(tmp_path), "last", state,
                    {"epoch": 7, "best_fitness": 0.5})
    restored, meta = load_checkpoint(str(tmp_path), "last", state)
    assert meta["epoch"] == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
