"""Training/validation dataset: WIDER FACE images + 5-landmark labels with
mosaic / perspective / HSV / flip augmentation.

Host-side numpy/cv2 re-implementation of the reference data layer
(reference utils/datasets.py:349-676 LoadImagesAndLabels, :680-710
load_image/augment_hsv, :724-782 load_mosaic, :906-1016
random_perspective). The random draw ORDER inside `get()` matches the
reference __getitem__ exactly (global `random` + np.random in the same
sequence), so a seeded run reproduces the reference pipeline
augmentation-for-augmentation — that is what tests/test_dataset.py checks.

TPU-native differences: batches collate to uint8 NHWC (normalization
happens on device), labels ride along as fixed-width rows with an image
index column, and per-host sharding replaces DistributedSampler.
"""

from __future__ import annotations

import glob
import hashlib
import math
import os
import random
import threading
import queue as queue_mod
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from face_detection_multi_scale_tpu.data.letterbox import letterbox

IMG_FORMATS = {"bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp",
               "mpo"}
FLIP_INDEX = [1, 0, 2, 4, 3]  # landmark reindex on lr-flip
                              # (utils/datasets.py:364)


def img2label_paths(img_paths: Sequence[str]) -> List[str]:
    """images/ dir -> labels/ dir, image ext -> .txt
    (utils/datasets.py:343-346)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"
            for p in img_paths]


def load_label_file(path: str, kpt_label: int) -> np.ndarray:
    """Read + validate one label txt (utils/datasets.py:481-510): rows of
    `cls x y w h` plus kpt_label x (x, y, occlusion) triplets; occlusion is
    stripped, coords must be normalized and non-negative."""
    ncols = kpt_label * 2 + 5
    if not os.path.isfile(path):
        return np.zeros((0, ncols), np.float32)
    with open(path) as f:
        rows = [x.split() for x in f.read().strip().splitlines()]
    if not rows:
        return np.zeros((0, ncols), np.float32)
    l = np.array(rows, np.float32)
    assert (l >= 0).all(), f"negative labels: {path}"
    if kpt_label:
        assert l.shape[1] == kpt_label * 3 + 5, \
            f"labels require {kpt_label * 3 + 5} columns: {path}"
        assert (l[:, 5::3] <= 1).all() and (l[:, 6::3] <= 1).all(), \
            f"non-normalized coordinates: {path}"
        keep = np.ones(l.shape[1], bool)
        keep[7::3] = False  # drop occlusion columns
        l = l[:, keep]
    else:
        assert l.shape[1] == 5, f"labels require 5 columns: {path}"
        assert (l[:, 1:5] <= 1).all(), f"non-normalized coords: {path}"
    assert np.unique(l, axis=0).shape[0] == l.shape[0], \
        f"duplicate labels: {path}"
    return l.astype(np.float32)


def exif_size(img) -> Tuple[int, int]:
    """PIL image size (w, h) corrected for EXIF rotation
    (utils/datasets.py exif_size semantics)."""
    s = img.size
    try:
        rotation = dict(img._getexif().items())[274]
        if rotation in (6, 8):
            s = (s[1], s[0])
    except Exception:
        pass
    return s


def _files_hash(paths: Sequence[str]) -> str:
    h = hashlib.sha256()
    for p in paths:
        h.update(p.encode())
        try:
            h.update(str(os.path.getsize(p)).encode())
        except OSError:
            pass
    return h.hexdigest()


class FaceDataset:
    """Image + label store with reference-equivalent augmentation."""

    def __init__(self, path, img_size: int = 640, augment: bool = False,
                 hyp: Optional[Dict] = None, kpt_label: int = 5,
                 stride: int = 32, cache_images: bool = False,
                 prefix: str = "", rect: bool = False,
                 batch_size: int = 16, pad: float = 0.0,
                 single_cls: bool = False):
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.kpt_label = kpt_label
        self.stride = stride
        self.rect = rect
        self.mosaic = augment and not rect
        self.mosaic_border = [-img_size // 2, -img_size // 2]

        # enumerate images (dir / list-file / list of either,
        # utils/datasets.py:367-390)
        files: List[str] = []
        for p in path if isinstance(path, list) else [path]:
            p = Path(p)
            if p.is_dir():
                files += glob.glob(str(p / "**" / "*.*"), recursive=True)
            elif p.is_file():
                with open(p) as t:
                    parent = str(p.parent) + os.sep
                    for x in t.read().strip().splitlines():
                        files.append(x.replace("./", parent)
                                     if x.startswith("./") else x)
            else:
                raise FileNotFoundError(f"{prefix}{p} does not exist")
        self.img_files = sorted(
            x.split(" ")[0] for x in files
            if x.split(" ")[0].rsplit(".", 1)[-1].lower() in IMG_FORMATS)
        assert self.img_files, f"{prefix}no images found in {path}"
        self.label_files = img2label_paths(self.img_files)

        # label cache (the reference's *.cache equivalent,
        # utils/datasets.py:394-418), stored as an npz keyed by a
        # path+size hash
        cache_path = Path(self.label_files[0]).parent.with_suffix(
            ".labels.npz") if self.label_files else None
        key = _files_hash(self.img_files + self.label_files)
        cache = None
        if cache_path and cache_path.is_file():
            try:
                loaded = np.load(cache_path, allow_pickle=True)
                if str(loaded["key"]) == key:
                    cache = (list(loaded["labels"]), loaded["shapes"])
            except Exception:
                cache = None
        if cache is None:
            from PIL import Image

            labels = [load_label_file(lb, kpt_label)
                      for lb in self.label_files]
            shapes = np.array([exif_size(Image.open(p))
                               for p in self.img_files], np.float64)
            cache = (labels, shapes)
            if cache_path:
                try:
                    np.savez_compressed(
                        cache_path, key=key,
                        labels=np.array(labels, dtype=object),
                        shapes=shapes)
                except OSError:
                    pass
        self.labels, self.shapes = cache  # shapes: (n, 2) as (w, h)
        if single_cls:  # force one class (utils/datasets.py:419-421)
            self.labels = [l.copy() for l in self.labels]
            for l in self.labels:
                if len(l):
                    l[:, 0] = 0
        self.n = len(self.img_files)
        self.indices = list(range(self.n))

        # Rectangular batching: sort by aspect ratio and give each batch
        # the minimal stride-aligned (h, w) that fits its images
        # (utils/datasets.py:431-454). NOTE the reference fork hard-forces
        # `self.rect = False` (utils/datasets.py:357), so its own val
        # protocol always runs the square letterbox — rect here is the
        # opt-in restoration of the upstream protocol, off by default.
        self.batch = np.floor(
            np.arange(self.n) / batch_size).astype(int)
        self.batch_shapes = None
        if rect:
            s = np.asarray(self.shapes, np.float64)  # (n, 2) wh
            ar = s[:, 1] / s[:, 0]  # h / w
            irect = ar.argsort()
            self.img_files = [self.img_files[i] for i in irect]
            self.label_files = [self.label_files[i] for i in irect]
            self.labels = [self.labels[i] for i in irect]
            self.shapes = s[irect]
            ar = ar[irect]
            nb = int(self.batch[-1]) + 1
            shapes_b = [[1.0, 1.0]] * nb
            for i in range(nb):
                ari = ar[self.batch == i]
                mini, maxi = ari.min(), ari.max()
                if maxi < 1:
                    shapes_b[i] = [maxi, 1.0]
                elif mini > 1:
                    shapes_b[i] = [1.0, 1.0 / mini]
            self.batch_shapes = (np.ceil(
                np.array(shapes_b) * img_size / stride + pad)
                .astype(int) * stride)
        self._img_cache: Dict[int, Tuple] = {}
        if cache_images:
            for i in range(self.n):
                self._img_cache[i] = self._load_image_uncached(i)

    def __len__(self):
        return self.n

    # ------------------------------------------------------------------

    def _load_image_uncached(self, index: int):
        import cv2

        img = cv2.imread(self.img_files[index])
        assert img is not None, f"Image Not Found {self.img_files[index]}"
        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if (r < 1 and not self.augment) \
                else cv2.INTER_LINEAR
            img = cv2.resize(img, (int(w0 * r), int(h0 * r)),
                             interpolation=interp)
        return img, (h0, w0), img.shape[:2]

    def load_image(self, index: int):
        """Longest-side resize to img_size (utils/datasets.py:680-696)."""
        if index in self._img_cache:
            img, hw0, hw = self._img_cache[index]
            return img.copy(), hw0, hw
        return self._load_image_uncached(index)

    # ------------------------------------------------------------------

    def load_mosaic(self, index: int):
        """4-image mosaic + random_perspective
        (utils/datasets.py:724-782)."""
        s = self.img_size
        labels4 = []
        yc, xc = (int(random.uniform(-x, 2 * s + x))
                  for x in self.mosaic_border)
        indices = [index] + random.choices(self.indices, k=3)
        img4 = None
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:
                img4 = np.full((s * 2, s * 2, img.shape[2]), 114, np.uint8)
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
                x2b, y2b = w, h
            elif i == 1:
                x1a, y1a = xc, max(yc - h, 0)
                x2a, y2a = min(xc + w, s * 2), yc
                x1b, y1b = 0, h - (y2a - y1a)
                x2b, y2b = min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a = max(xc - w, 0), yc
                x2a, y2a = xc, min(s * 2, yc + h)
                x1b, y1b = w - (x2a - x1a), 0
                x2b, y2b = w, min(y2a - y1a, h)
            else:
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b = 0, 0
                x2b, y2b = min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b

            labels = self.labels[idx].copy()
            if labels.size:
                labels[:, 1:] = _xywhn2xyxy_kpt(
                    labels[:, 1:], w, h, padw, padh, self.kpt_label)
            labels4.append(labels)

        labels4 = np.concatenate(labels4, 0)
        np.clip(labels4[:, 1:], 0, 2 * s, out=labels4[:, 1:])
        return random_perspective(
            img4, labels4,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.0),
            scale=self.hyp.get("scale", 0.0),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border, kpt_label=self.kpt_label)

    def load_mosaic9(self, index: int):
        """9-image mosaic + random_perspective
        (utils/datasets.py:780-852). Unused by the default face recipe
        (reference __getitem__ only calls load_mosaic); provided for
        surface completeness with the same seeded draw order. Mirrors the
        reference's kpt quirk: the placement step maps only the box
        columns to mosaic pixels (xywhn2xyxy is called without kpt_label
        at utils/datasets.py:819), keypoint columns pass through."""
        s = self.img_size
        labels9 = []
        indices = [index] + random.choices(self.indices, k=8)
        img9 = None
        h0 = w0 = hp = wp = 0
        for i, idx in enumerate(indices):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:  # center
                img9 = np.full((s * 3, s * 3, img.shape[2]), 114, np.uint8)
                h0, w0 = h, w
                c = s, s, s + w, s + h
            elif i == 1:  # top
                c = s, s - h, s + w, s
            elif i == 2:  # top right
                c = s + wp, s - h, s + wp + w, s
            elif i == 3:  # right
                c = s + w0, s, s + w0 + w, s + h
            elif i == 4:  # bottom right
                c = s + w0, s + hp, s + w0 + w, s + hp + h
            elif i == 5:  # bottom
                c = s + w0 - w, s + h0, s + w0, s + h0 + h
            elif i == 6:  # bottom left
                c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
            elif i == 7:  # left
                c = s - w, s + h0 - h, s, s + h0
            else:  # top left
                c = s - w, s + h0 - hp - h, s, s + h0 - hp

            padx, pady = c[:2]
            x1, y1, x2, y2 = (max(x, 0) for x in c)

            labels = self.labels[idx].copy()
            if labels.size:
                # box columns only (reference utils/datasets.py:819)
                labels[:, 1:5] = _xywhn2xyxy_kpt(
                    labels[:, 1:5], w, h, padx, pady, kpt_label=0)
            labels9.append(labels)

            img9[y1:y2, x1:x2] = img[y1 - pady:, x1 - padx:]
            hp, wp = h, w

        yc, xc = (int(random.uniform(0, s)) for _ in self.mosaic_border)
        img9 = img9[yc:yc + 2 * s, xc:xc + 2 * s]

        labels9 = np.concatenate(labels9, 0)
        labels9[:, [1, 3]] -= xc
        labels9[:, [2, 4]] -= yc
        np.clip(labels9[:, 1:], 0, 2 * s, out=labels9[:, 1:])

        return random_perspective(
            img9, labels9,
            degrees=self.hyp.get("degrees", 0.0),
            translate=self.hyp.get("translate", 0.0),
            scale=self.hyp.get("scale", 0.0),
            shear=self.hyp.get("shear", 0.0),
            perspective=self.hyp.get("perspective", 0.0),
            border=self.mosaic_border, kpt_label=self.kpt_label)

    # ------------------------------------------------------------------

    def get(self, index: int):
        """One training example: (img HWC RGB uint8, labels (n, 5+2k)
        normalized, path, shapes). The augmentation RNG draw order matches
        reference __getitem__ (utils/datasets.py:551-645) exactly,
        including the indices indirection (utils/datasets.py:551) that
        image-weights resampling rewrites each epoch (train.py:374-385)."""
        index = self.indices[index]
        hyp = self.hyp
        mosaic = (self.mosaic
                  and random.random() < hyp.get("mosaic", 0.0))
        if mosaic:
            img, labels = self.load_mosaic(index)
            shapes = None
            if random.random() < hyp.get("mixup", 0.0):
                img2, labels2 = self.load_mosaic(
                    random.randint(0, self.n - 1))
                r = np.random.beta(8.0, 8.0)
                img = (img * r + img2 * (1 - r)).astype(np.uint8)
                labels = np.concatenate((labels, labels2), 0)
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            # per-batch rect shape when rect, else the square img_size
            # (utils/datasets.py:573)
            shape = (tuple(self.batch_shapes[self.batch[index]])
                     if self.rect else self.img_size)
            img, ratio, pad = letterbox(img, shape, auto=False,
                                        scaleup=self.augment)
            shapes = (h0, w0), ((h / h0, w / w0), pad)
            labels = self.labels[index].copy()
            if labels.size:
                labels[:, 1:] = _xywhn2xyxy_kpt(
                    labels[:, 1:], ratio[0] * w, ratio[1] * h,
                    pad[0], pad[1], self.kpt_label)

        if self.augment:
            if not mosaic:
                img, labels = random_perspective(
                    img, labels,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.0),
                    scale=hyp.get("scale", 0.0),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                    kpt_label=self.kpt_label)
            augment_hsv(img, hyp.get("hsv_h", 0.0), hyp.get("hsv_s", 0.0),
                        hyp.get("hsv_v", 0.0))

        nl = len(labels)
        if nl:
            labels[:, 1:5] = _xyxy2xywh_rows(labels[:, 1:5])
            labels[:, [2, 4]] /= img.shape[0]
            labels[:, [1, 3]] /= img.shape[1]
            if self.kpt_label:
                labels[:, 6::2] /= img.shape[0]
                labels[:, 5::2] /= img.shape[1]

        if self.augment:
            if random.random() < hyp.get("flipud", 0.0):
                img = np.flipud(img)
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
                    if self.kpt_label:
                        labels[:, 6::2] = ((1 - labels[:, 6::2])
                                           * (labels[:, 6::2] != 0))
            if random.random() < hyp.get("fliplr", 0.0):
                img = np.fliplr(img)
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]
                    if self.kpt_label:
                        labels[:, 5::2] = ((1 - labels[:, 5::2])
                                           * (labels[:, 5::2] != 0))
                        labels[:, 5::2] = labels[:, 5::2][:, FLIP_INDEX]
                        labels[:, 6::2] = labels[:, 6::2][:, FLIP_INDEX]

        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB, HWC
        return img, labels.astype(np.float32), self.img_files[index], shapes


# ---------------------------------------------------------------------------
# augmentation primitives
# ---------------------------------------------------------------------------

def _xywhn2xyxy_kpt(x, w, h, padw, padh, kpt_label):
    """Normalized xywh (+ normalized kpts) -> pixel xyxy (+ pixel kpts),
    zeros staying zero (utils/general.py:322-338)."""
    y = x.copy()
    y[:, 0] = w * (x[:, 0] - x[:, 2] / 2) + padw
    y[:, 1] = h * (x[:, 1] - x[:, 3] / 2) + padh
    y[:, 2] = w * (x[:, 0] + x[:, 2] / 2) + padw
    y[:, 3] = h * (x[:, 1] + x[:, 3] / 2) + padh
    if kpt_label:
        kx = x[:, 4::2]
        ky = x[:, 5::2]
        y[:, 4::2] = np.where(kx != 0, w * kx + padw, 0)
        y[:, 5::2] = np.where(ky != 0, h * ky + padh, 0)
    return y


def _xyxy2xywh_rows(x):
    y = x.copy()
    y[:, 0] = (x[:, 0] + x[:, 2]) / 2
    y[:, 1] = (x[:, 1] + x[:, 3]) / 2
    y[:, 2] = x[:, 2] - x[:, 0]
    y[:, 3] = x[:, 3] - x[:, 1]
    return y


def augment_hsv(img, hgain=0.5, sgain=0.5, vgain=0.5):
    """In-place HSV jitter (utils/datasets.py:699-710)."""
    import cv2

    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    dtype = img.dtype
    x = np.arange(0, 256, dtype=np.int16)
    lut_hue = ((x * r[0]) % 180).astype(dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(dtype)
    img_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                         cv2.LUT(val, lut_val))).astype(dtype)
    cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR, dst=img)


def random_perspective(img, targets=(), degrees=10, translate=.1, scale=.1,
                       shear=10, perspective=0.0, border=(0, 0),
                       kpt_label=0):
    """Random affine/perspective warp of image + boxes + keypoints
    (utils/datasets.py:906-1006). Same random draw order as the
    reference.

    Derivation note: this function (and the mosaic placement arithmetic
    above) is a structural transcription of the reference code, matrix
    names and expression order included. That is deliberate, not
    incidental: the module's contract is *seeded byte-equal* augmentation
    — tests/test_dataset.py draws the same global-RNG stream through both
    implementations and asserts identical pixels — which pins the
    implementation to the reference's exact call sequence (every
    random.uniform in the same order, every cv2 call with the same
    arguments). A free-form reimplementation could be numerically
    equivalent only by accident; byte-equality is what lets the rest of
    the training stack treat the data layer as a solved, oracle-verified
    component."""
    import cv2

    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = random.uniform(-perspective, perspective)
    P[2, 1] = random.uniform(-perspective, perspective)
    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective
              else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate(
            (x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)

        if kpt_label:
            xy_k = np.ones((n * kpt_label, 3))
            xy_k[:, :2] = targets[:, 5:].reshape(n * kpt_label, 2)
            xy_k = xy_k @ M.T
            xy_k = (xy_k[:, :2] / xy_k[:, 2:3] if perspective
                    else xy_k[:, :2]).reshape(n, kpt_label * 2)
            xy_k[targets[:, 5:] == 0] = 0
            xk = xy_k[:, 0::2]
            yk = xy_k[:, 1::2]
            # the reference zeroes x first, then recomputes the invalid
            # mask for y with x already zeroed (utils/datasets.py:992-995)
            bad = np.logical_or.reduce(
                (xk < 0, xk > width, yk < 0, yk > height))
            xk[bad] = 0
            bad_y = np.logical_or.reduce(
                (xk < 0, xk > width, yk < 0, yk > height))
            yk[bad_y] = 0
            xy_k[:, 0::2] = xk
            xy_k[:, 1::2] = yk

        i = box_candidates(box1=targets[:, 1:5].T * s, box2=new.T,
                           area_thr=0.10)
        targets = targets[i]
        targets[:, 1:5] = new[i]
        if kpt_label:
            targets[:, 5:] = xy_k[i]
    return img, targets


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1,
                   eps=1e-16):
    """Post-warp box validity filter (utils/datasets.py:1009-1015)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def _bbox_ioa(box1: np.ndarray, box2: np.ndarray) -> np.ndarray:
    """Intersection over box2 area, box1 (4,) vs box2 (n, 4) xyxy
    (utils/datasets.py:1021-1038)."""
    b2 = box2.T
    inter = (np.minimum(box1[2], b2[2]) - np.maximum(box1[0], b2[0])
             ).clip(0) * (np.minimum(box1[3], b2[3])
                          - np.maximum(box1[1], b2[1])).clip(0)
    area2 = (b2[2] - b2[0]) * (b2[3] - b2[1]) + 1e-16
    return inter / area2


def cutout(image: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Cutout augmentation: random gray-level masks over the image, boxes
    that end >60% obscured dropped (utils/datasets.py:1017-1061,
    https://arxiv.org/abs/1708.04552). In-place on the image; returns the
    surviving labels (rows of [cls, x1, y1, x2, y2, ...] pixels). Unused
    by the default face recipe; same seeded draw order as the
    reference."""
    h, w = image.shape[:2]
    scales = ([0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8
              + [0.03125] * 16)
    for s in scales:
        mask_h = random.randint(1, int(h * s))
        mask_w = random.randint(1, int(w * s))
        xmin = max(0, random.randint(0, w) - mask_w // 2)
        ymin = max(0, random.randint(0, h) - mask_h // 2)
        xmax = min(w, xmin + mask_w)
        ymax = min(h, ymin + mask_h)
        image[ymin:ymax, xmin:xmax] = [random.randint(64, 191)
                                       for _ in range(3)]
        if len(labels) and s > 0.03:
            box = np.array([xmin, ymin, xmax, ymax], np.float32)
            labels = labels[_bbox_ioa(box, labels[:, 1:5]) < 0.60]
    return labels


def replicate(img: np.ndarray, labels: np.ndarray):
    """Duplicate the smaller half of the boxes at random free positions
    (utils/datasets.py:856-870). labels rows are [cls, x1, y1, x2, y2]
    pixels; appended rows carry the copied class. Unused by the default
    face recipe; same seeded draw order as the reference."""
    h, w = img.shape[:2]
    boxes = labels[:, 1:].astype(int)
    x1, y1, x2, y2 = boxes.T
    s = ((x2 - x1) + (y2 - y1)) / 2
    for i in s.argsort()[:round(s.size * 0.5)]:
        x1b, y1b, x2b, y2b = boxes[i]
        bh, bw = y2b - y1b, x2b - x1b
        yc = int(random.uniform(0, h - bh))
        xc = int(random.uniform(0, w - bw))
        x1a, y1a, x2a, y2a = xc, yc, xc + bw, yc + bh
        img[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        labels = np.append(
            labels, [[labels[i, 0], x1a, y1a, x2a, y2a]], axis=0)
    return img, labels


def create_folder(path):
    """Fresh output folder, removing any existing one
    (utils/datasets.py:1064-1068)."""
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)


def flatten_recursive(path):
    """Copy every file in a directory tree into <path>_flat
    (utils/datasets.py:1071-1076)."""
    import shutil

    new_path = Path(str(path) + "_flat")
    create_folder(new_path)
    for file in sorted(Path(path).rglob("*")):
        if file.is_file():
            shutil.copyfile(file, new_path / file.name)
    return new_path


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False):
    """Write autosplit_{train,val,test}.txt next to an images dir, each
    image assigned to a split by weighted draw
    (utils/datasets.py:1113-1133)."""
    path = Path(path)
    files = sorted(p for p in path.rglob("*.*")
                   if p.suffix[1:].lower() in IMG_FORMATS)
    indices = random.choices([0, 1, 2], weights=weights, k=len(files))
    txt = ["autosplit_train.txt", "autosplit_val.txt",
           "autosplit_test.txt"]
    for x in txt:
        if (path / x).exists():
            (path / x).unlink()
    for i, img in zip(indices, files):
        if (not annotated_only
                or Path(img2label_paths([str(img)])[0]).exists()):
            with open(path / txt[i], "a") as f:
                f.write(str(img) + "\n")


def extract_boxes(path):
    """Crop every labeled box into path/classifier/<cls>/... jpgs,
    turning a detection dataset into a classification one
    (utils/datasets.py:1078-1110). Boxes are padded by 1.2x + 3 px."""
    import cv2
    import shutil

    path = Path(path)
    if (path / "classifier").is_dir():
        shutil.rmtree(path / "classifier")
    for im_file in sorted(path.rglob("*.*")):
        if im_file.suffix[1:].lower() not in IMG_FORMATS:
            continue
        im = cv2.imread(str(im_file))[..., ::-1]
        h, w = im.shape[:2]
        lb_file = Path(img2label_paths([str(im_file)])[0])
        if not lb_file.exists():
            continue
        with open(lb_file) as f:
            lb = np.array([x.split() for x in
                           f.read().strip().splitlines()], np.float32)
        for j, x in enumerate(lb):
            c = int(x[0])
            out = (path / "classifier" / str(c)
                   / f"{path.stem}_{im_file.stem}_{j}.jpg")
            out.parent.mkdir(parents=True, exist_ok=True)
            b = x[1:5] * [w, h, w, h]
            b[2:] = b[2:] * 1.2 + 3
            bx = np.empty(4)
            bx[0], bx[1] = b[0] - b[2] / 2, b[1] - b[3] / 2
            bx[2], bx[3] = b[0] + b[2] / 2, b[1] + b[3] / 2
            bx = bx.astype(int)
            bx[[0, 2]] = np.clip(bx[[0, 2]], 0, w)
            bx[[1, 3]] = np.clip(bx[[1, 3]], 0, h)
            assert cv2.imwrite(str(out), im[bx[1]:bx[3], bx[0]:bx[2]]), \
                f"box failure in {out}"


# ---------------------------------------------------------------------------
# batching
# ---------------------------------------------------------------------------

def collate(samples) -> Tuple[np.ndarray, np.ndarray, list, list]:
    """Stack samples: images (B, H, W, 3) uint8 RGB; labels (N, 6+2k)
    rows [img_idx, cls, x, y, w, h, kpts...] (the reference collate_fn,
    utils/datasets.py:647-652, in NHWC)."""
    imgs, labels, paths, shapes = zip(*samples)
    out_labels = []
    for i, l in enumerate(labels):
        if len(l):
            out_labels.append(np.concatenate(
                [np.full((len(l), 1), i, np.float32), l], axis=1))
    n_cols = labels[0].shape[1] + 1 if len(labels[0].shape) == 2 else 16
    merged = (np.concatenate(out_labels, 0) if out_labels
              else np.zeros((0, n_cols), np.float32))
    return np.stack(imgs), merged, list(paths), list(shapes)


class DataLoader:
    """Shuffling, optionally host-sharded, thread-prefetched loader.

    Per-host sharding replaces DistributedSampler (utils/datasets.py:78):
    host k of K takes every K-th index after the epoch-seeded shuffle.

    `workers` > 1 fetches the samples of each batch through a thread
    pool (mosaic + perspective are cv2/numpy-heavy and release the GIL),
    the InfiniteDataLoader-with-workers equivalent
    (utils/datasets.py:59-121); the prefetch queue overlaps batch
    assembly with the train step. workers <= 1 keeps the exact serial
    global-RNG draw order the seeded parity tests rely on.
    """

    def __init__(self, dataset: FaceDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 num_hosts: int = 1, host_id: int = 0,
                 drop_last: bool = True, prefetch: int = 2,
                 workers: int = 4):
        if getattr(dataset, "rect", False):
            # rect batch shapes are computed for sequential whole-dataset
            # iteration (batch i = indices [i*bs, (i+1)*bs)); shuffling
            # or host-sharding would mix shapes inside one stacked batch
            assert not shuffle and num_hosts == 1, (
                "rect datasets require shuffle=False, num_hosts=1")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.workers = workers
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.num_hosts
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.host_id::self.num_hosts]

    def __iter__(self):
        idx = self._epoch_indices()
        nb = len(self)
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)

        def produce():
            try:
                if self.workers > 1:
                    from concurrent.futures import ThreadPoolExecutor
                    with ThreadPoolExecutor(self.workers) as ex:
                        for b in range(nb):
                            chunk = idx[b * self.batch_size:
                                        (b + 1) * self.batch_size]
                            samples = list(ex.map(
                                self.dataset.get,
                                [int(i) for i in chunk]))
                            q.put(collate(samples))
                else:
                    for b in range(nb):
                        chunk = idx[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                        samples = [self.dataset.get(int(i))
                                   for i in chunk]
                        q.put(collate(samples))
                q.put(None)
            except BaseException as e:  # surface worker errors
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
