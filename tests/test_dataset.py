"""Dataset/augmentation parity: seeded full-pipeline comparison against the
reference LoadImagesAndLabels (same global-RNG draw order)."""

import os
import random

import numpy as np
import pytest

from face_detection_multi_scale_tpu.data.dataset import (
    DataLoader, FaceDataset)
from face_detection_multi_scale_tpu.train.hyp import HYP_SCRATCH_P5

from oracle import import_reference

ref = import_reference()

NKPT = 5


def make_fake_widerface(root, n_images=6, seed=0):
    """Synthetic images + 5-landmark labels in the expected layout."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = root / "images" / "0--Ev"
    lbl_dir = root / "labels" / "0--Ev"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(n_images):
        h = int(rng.integers(200, 500))
        w = int(rng.integers(200, 500))
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        n = int(rng.integers(1, 4))
        rows = []
        for _ in range(n):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            bw, bh = rng.uniform(0.1, 0.25, 2)
            kpts = []
            for _ in range(NKPT):
                kx = cx + rng.uniform(-bw / 3, bw / 3)
                ky = cy + rng.uniform(-bh / 3, bh / 3)
                kpts += [kx, ky, 2.0]
            rows.append([0, cx, cy, bw, bh] + kpts)
        with open(lbl_dir / f"im{i}.txt", "w") as f:
            for r in rows:
                f.write(" ".join(f"{v:.6f}" for v in r) + "\n")
    return str(root / "images")


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    return make_fake_widerface(tmp_path_factory.mktemp("wf"))


def build_both(fake_data, augment, hyp):
    ours = FaceDataset(fake_data, img_size=192, augment=augment, hyp=hyp,
                       kpt_label=NKPT)
    datasets = ref("utils.datasets")
    theirs = datasets.LoadImagesAndLabels(
        fake_data, img_size=192, batch_size=4, augment=augment, hyp=hyp,
        rect=False, kpt_label=NKPT)
    return ours, theirs


def compare_item(ours, theirs, index, seed):
    random.seed(seed)
    np.random.seed(seed)
    img_t, labels_t, path_t, _ = theirs[index]
    random.seed(seed)
    np.random.seed(seed)
    img_o, labels_o, path_o, _ = ours.get(index)

    # reference returns CHW RGB torch tensor
    want = img_t.numpy().transpose(1, 2, 0)
    np.testing.assert_array_equal(img_o, want)
    want_l = labels_t.numpy()
    assert labels_o.shape[0] == want_l.shape[0]
    if len(labels_o):
        np.testing.assert_allclose(labels_o, want_l[:, 1:], atol=1e-5)
    assert os.path.basename(path_o) == os.path.basename(path_t)


def test_plain_parity(fake_data):
    hyp = dict(HYP_SCRATCH_P5)
    ours, theirs = build_both(fake_data, augment=False, hyp=hyp)
    for i in range(len(ours)):
        compare_item(ours, theirs, i, seed=100 + i)


def test_augmented_parity_mosaic(fake_data):
    hyp = dict(HYP_SCRATCH_P5, mosaic=1.0, mixup=0.5, fliplr=0.5,
               flipud=0.3)
    ours, theirs = build_both(fake_data, augment=True, hyp=hyp)
    for i in range(len(ours)):
        for seed in (7, 42):
            compare_item(ours, theirs, i, seed=seed * 10 + i)


def test_augmented_parity_no_mosaic(fake_data):
    hyp = dict(HYP_SCRATCH_P5, mosaic=0.0, translate=0.1, scale=0.5,
               degrees=5.0, shear=2.0, fliplr=0.5)
    ours, theirs = build_both(fake_data, augment=True, hyp=hyp)
    for i in range(len(ours)):
        compare_item(ours, theirs, i, seed=500 + i)


def test_label_loading_strips_occlusion(fake_data):
    ours = FaceDataset(fake_data, img_size=192, kpt_label=NKPT)
    for l in ours.labels:
        assert l.shape[1] == 5 + 2 * NKPT
        assert (l >= 0).all()


def test_dataloader_shards_and_batches(fake_data):
    ds = FaceDataset(fake_data, img_size=192, augment=False, hyp={})
    full = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(full)
    assert len(batches) == len(ds) // 2
    imgs, labels, paths, shapes = batches[0]
    assert imgs.shape == (2, 192, 192, 3) and imgs.dtype == np.uint8
    assert labels.shape[1] == 6 + 2 * NKPT
    # host sharding partitions the index space
    a = DataLoader(ds, batch_size=1, shuffle=True, seed=1, num_hosts=2,
                   host_id=0)
    b = DataLoader(ds, batch_size=1, shuffle=True, seed=1, num_hosts=2,
                   host_id=1)
    pa = {p for _, _, ps, _ in a for p in ps}
    pb = {p for _, _, ps, _ in b for p in ps}
    assert not (pa & pb)
    assert len(pa | pb) == len(ds)


def test_dataloader_process_mode(fake_data):
    """mode='process' (worker processes assembling whole batches, the
    reference's dataloader-worker equivalent, utils/datasets.py:59-121):
    un-augmented output must equal the serial loader exactly, and the
    augmented stream must be deterministic under (seed, epoch) — batch
    results cannot depend on the worker->batch schedule."""
    ds = FaceDataset(fake_data, img_size=192, augment=False, hyp={})
    serial = list(DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                             workers=1))
    proc_loader = DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                             workers=3, mode="process")
    try:
        proc = list(proc_loader)
        assert len(serial) == len(proc)
        for (si, sl, sp, _), (pi, pl, pp, _) in zip(serial, proc):
            np.testing.assert_array_equal(si, pi)
            np.testing.assert_allclose(sl, pl)
            assert sp == pp
    finally:
        proc_loader.close()

    hyp = dict(HYP_SCRATCH_P5, mosaic=1.0, fliplr=0.5, translate=0.1,
               scale=0.5, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    aug = FaceDataset(fake_data, img_size=192, augment=True, hyp=hyp,
                      kpt_label=NKPT)
    la = DataLoader(aug, batch_size=2, shuffle=True, seed=5, workers=3,
                    mode="process")
    lb = DataLoader(aug, batch_size=2, shuffle=True, seed=5, workers=2,
                    mode="process")
    try:
        ra, rb = list(la), list(lb)  # different worker counts/schedules
        for (ai, al, _, _), (bi, bl, _, _) in zip(ra, rb):
            np.testing.assert_array_equal(ai, bi)
            np.testing.assert_allclose(al, bl)
        la.set_epoch(1)
        rc = list(la)
        assert any(not np.array_equal(a[0], c[0])
                   for a, c in zip(ra, rc))  # epoch reseeds the stream
    finally:
        la.close()
        lb.close()


def test_dataloader_process_mode_honors_indices_resample(fake_data):
    """--image-weights mutates dataset.indices per epoch in the PARENT
    (cli/train.py); the forked workers' dataset snapshot must not pin
    the epoch-0 resample — the current indices ride along with every
    batch task."""
    ds = FaceDataset(fake_data, img_size=192, augment=False, hyp={})
    loader = DataLoader(ds, batch_size=2, shuffle=False, workers=2,
                        mode="process", drop_last=True)
    try:
        list(loader)  # epoch 0 with the identity indices
        ds.indices = list(reversed(range(len(ds))))  # parent resample
        got = list(loader)
    finally:
        loader.close()
    ref_ds = FaceDataset(fake_data, img_size=192, augment=False, hyp={})
    ref_ds.indices = list(reversed(range(len(ref_ds))))
    want = list(DataLoader(ref_ds, batch_size=2, shuffle=False,
                           workers=1, drop_last=True))
    assert len(got) == len(want)
    for (gi, gl, gp, _), (wi, wl, wp, _) in zip(got, want):
        np.testing.assert_array_equal(gi, wi)
        assert gp == wp


def test_dataloader_process_mode_propagates_errors(fake_data):
    ds = FaceDataset(fake_data, img_size=192, augment=False, hyp={})

    real_get = FaceDataset.get

    class BoomDS(FaceDataset):
        def __init__(self):  # reuse the built dataset's state wholesale
            self.__dict__.update(ds.__dict__)

        def get(self, i):
            if i == 2:
                raise ValueError("boom in worker process")
            return real_get(self, i)

    loader = DataLoader(BoomDS(), batch_size=2, shuffle=False,
                        workers=2, mode="process")
    try:
        with pytest.raises(ValueError, match="boom"):
            list(loader)
    finally:
        loader.close()


def test_dataloader_parallel_workers(fake_data):
    """workers > 1 yields the same batch structure (same images per
    batch, order preserved within the epoch) and actually overlaps
    sample fetches."""
    import time

    ds = FaceDataset(fake_data, img_size=192, augment=False, hyp={})
    serial = list(DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                             workers=1))
    parallel = list(DataLoader(ds, batch_size=2, shuffle=True, seed=3,
                               workers=4))
    assert len(serial) == len(parallel)
    for (si, sl, sp, _), (pi, pl, pp, _) in zip(serial, parallel):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_allclose(sl, pl)
        assert sp == pp

    class SlowDS:
        """get() sleeps: parallel fetch must overlap the waits."""
        n = 16
        indices = list(range(16))

        def __len__(self):
            return self.n

        def get(self, i):
            time.sleep(0.05)
            img = np.zeros((8, 8, 3), np.uint8)
            return img, np.zeros((0, 15), np.float32), f"p{i}", None

    t0 = time.perf_counter()
    list(DataLoader(SlowDS(), batch_size=8, shuffle=False, workers=1,
                    prefetch=1))
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    list(DataLoader(SlowDS(), batch_size=8, shuffle=False, workers=8,
                    prefetch=1))
    t_parallel = time.perf_counter() - t0
    assert t_parallel < t_serial / 2, (t_serial, t_parallel)


def test_dataloader_propagates_worker_errors(fake_data):
    class BadDS:
        n = 4
        indices = list(range(4))

        def __len__(self):
            return self.n

        def get(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(BadDS(), batch_size=2, shuffle=False, workers=4))
    with pytest.raises(RuntimeError, match="boom"):
        list(DataLoader(BadDS(), batch_size=2, shuffle=False, workers=1))
