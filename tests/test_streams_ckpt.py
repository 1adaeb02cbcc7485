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


def test_save_checkpoint_crash_safe(tmp_path, monkeypatch):
    """A crash at ANY point inside save_checkpoint must leave a
    restorable `last` (reference train.py:517-534: the previous last.pt
    always survives a crashed epoch save). Simulated by failing each
    os.rename / shutil.rmtree call site in turn and asserting the
    PREVIOUS epoch still loads."""
    import os
    import shutil

    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.train import checkpoint as CKPT
    from face_detection_multi_scale_tpu.train.trainer import (
        create_train_state)

    spec = zoo.get_spec("yolov7-lite-t")
    _, variables = init_model(spec, img_size=64)
    state = create_train_state(variables)

    real_rename, real_rmtree = os.rename, shutil.rmtree

    # crash points keyed by the exact filesystem call save_checkpoint
    # makes (orbax's own internal renames never match these patterns):
    #   park    — rename(<last>, <last>.old) fails: old ckpt untouched
    #   move_in — rename(<last>.tmp, <last>) fails: old parked at .old,
    #             load_checkpoint must fall back to it
    #   drop    — final rmtree(<last>.old) fails: NEW ckpt live, stale
    #             .old must not break the next save
    def match(point, src, dst=None):
        if point == "park":
            return dst is not None and dst.endswith("last.old")
        if point == "move_in":
            return src.endswith("last.tmp") and dst is not None \
                and dst.endswith("last")
        return src.endswith("last.old") and dst is None  # drop

    for point, expect_epoch in [("park", 1), ("move_in", 1),
                                ("drop", 2)]:
        # fresh epoch-1 checkpoint, no strays
        for stray in list(tmp_path.iterdir()):
            if stray.is_dir():
                real_rmtree(str(stray))
            else:
                stray.unlink()
        CKPT.save_checkpoint(str(tmp_path), "last", state, {"epoch": 1})

        def rename_boom(src, dst, *a, _p=point, **k):
            if match(_p, str(src), str(dst)):
                raise RuntimeError("simulated crash")
            return real_rename(src, dst, *a, **k)

        def rmtree_boom(path, *a, _p=point, **k):
            if match(_p, str(path)):
                raise RuntimeError("simulated crash")
            return real_rmtree(path, *a, **k)

        monkeypatch.setattr(os, "rename", rename_boom)
        monkeypatch.setattr(shutil, "rmtree", rmtree_boom)
        try:
            CKPT.save_checkpoint(str(tmp_path), "last", state,
                                 {"epoch": 2})
            crashed = False
        except RuntimeError:
            crashed = True
        monkeypatch.setattr(os, "rename", real_rename)
        monkeypatch.setattr(shutil, "rmtree", real_rmtree)
        assert crashed, f"crash point {point} never reached"

        restored, meta = CKPT.load_checkpoint(str(tmp_path), "last",
                                              state)
        assert meta["epoch"] == expect_epoch, point
        assert restored is not None
        if point == "drop":
            # the stale .old left behind must not break the next save
            CKPT.save_checkpoint(str(tmp_path), "last", state,
                                 {"epoch": 3})
            _, meta = CKPT.load_checkpoint(str(tmp_path), "last", state)
            assert meta["epoch"] == 3


def test_save_adopts_parked_old_after_midswap_crash(tmp_path,
                                                    monkeypatch):
    """After a crash between park and move-in, <tag>.old holds the only
    restorable state. The NEXT save must adopt it back to <tag> before
    attempting the (crashable, multi-second) orbax write — deleting it
    first would open a window with zero restorable checkpoints."""
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.train import checkpoint as CKPT
    from face_detection_multi_scale_tpu.train.trainer import (
        create_train_state)

    spec = zoo.get_spec("yolov7-lite-t")
    _, variables = init_model(spec, img_size=64)
    state = create_train_state(variables)

    CKPT.save_checkpoint(str(tmp_path), "last", state, {"epoch": 1})
    # simulate the mid-swap crash state: parked at .old, nothing at last
    (tmp_path / "last").rename(tmp_path / "last.old")

    class BoomCkptr:
        def save(self, *a, **k):
            raise RuntimeError("simulated crash during orbax save")

        def wait_until_finished(self):
            pass

    monkeypatch.setattr(CKPT, "_ckptr", lambda: BoomCkptr())
    try:
        CKPT.save_checkpoint(str(tmp_path), "last", state, {"epoch": 2})
        crashed = False
    except RuntimeError:
        crashed = True
    monkeypatch.undo()
    assert crashed
    # epoch-1 must still restore (adopted back to <tag>)
    restored, meta = CKPT.load_checkpoint(str(tmp_path), "last", state)
    assert meta["epoch"] == 1
    assert restored is not None


def test_async_checkpoint_writer(tmp_path):
    """AsyncCheckpointWriter semantics: a save is durable after wait()
    (or the implicit wait of the next save / close), restores
    identically to the sync path, and a completed-but-unswapped .tmp
    from an abandoned save counts as never saved."""
    from face_detection_multi_scale_tpu.models import zoo
    from face_detection_multi_scale_tpu.models.model import init_model
    from face_detection_multi_scale_tpu.train import checkpoint as CKPT
    from face_detection_multi_scale_tpu.train.trainer import (
        create_train_state)

    spec = zoo.get_spec("yolov7-lite-t")
    _, variables = init_model(spec, img_size=64)
    state = create_train_state(variables)

    w = CKPT.AsyncCheckpointWriter()
    try:
        w.save(str(tmp_path), "last", state, {"epoch": 1})
        w.wait()
        _, meta = CKPT.load_checkpoint(str(tmp_path), "last", state)
        assert meta["epoch"] == 1
        # back-to-back saves: the second's implicit wait swaps the first
        w.save(str(tmp_path), "last", state, {"epoch": 2})
        w.save(str(tmp_path), "best", state, {"epoch": 2})
        w.wait()
        _, meta = CKPT.load_checkpoint(str(tmp_path), "last", state)
        assert meta["epoch"] == 2
        _, meta = CKPT.load_checkpoint(str(tmp_path), "best", state)
        assert meta["epoch"] == 2
    finally:
        w.close()

    # abandoned in-flight save: writer dies (process crash) after orbax
    # finished the tmp but before the swap — the next save discards the
    # stale tmp and the previous checkpoint still restores
    w2 = CKPT.AsyncCheckpointWriter()
    w2.save(str(tmp_path), "last", state, {"epoch": 3})
    w2._get().wait_until_finished()  # tmp complete on disk
    assert (tmp_path / "last.tmp").exists()
    w2._pending = None               # simulate crash-before-swap
    w2.close()
    _, meta = CKPT.load_checkpoint(str(tmp_path), "last", state)
    assert meta["epoch"] == 2        # unswapped tmp == never saved
    CKPT.save_checkpoint(str(tmp_path), "last", state, {"epoch": 4})
    _, meta = CKPT.load_checkpoint(str(tmp_path), "last", state)
    assert meta["epoch"] == 4
    assert not (tmp_path / "last.tmp").exists()


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
