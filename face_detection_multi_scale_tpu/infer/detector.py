"""The inference engine: single-scale, batched, and multi-scale TTA
detection.

TPU-native equivalent of the reference MultiScaleFaceDetector
(multi_scale_face_detector.py:28-288) and the per-image detect loops
(detect.py:20-160, test_widerface.py:31-119): every (height, width, batch)
combination compiles once to a fused executable — uint8 normalize ->
backbone/head -> grid decode -> fixed-capacity NMS — and is cached;
detections come back as one small (max_det, 21) block per image, so the
host<->device traffic per frame is the input image and that block, nothing
else.

Preprocessing (letterbox / pad-to-square) stays on the host in cv2 for
bit-parity with the reference pipeline (see data/letterbox.py); the
division by 255 happens on device so the H2D transfer is uint8.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_multi_scale_tpu.data import letterbox as LB
from face_detection_multi_scale_tpu.models import zoo
from face_detection_multi_scale_tpu.models.convert import (
    convert_state_dict, load_torch_checkpoint)
from face_detection_multi_scale_tpu.models.head import decode
from face_detection_multi_scale_tpu.models.model import YoloFace, init_model
from face_detection_multi_scale_tpu.models.spec import ModelSpec
from face_detection_multi_scale_tpu.ops import nms as NMS
from face_detection_multi_scale_tpu.utils.general import check_img_size


class FaceDetector:
    """Face detector over any model in the zoo (or a custom spec/weights).

    Args mirror the reference MultiScaleFaceDetector
    (multi_scale_face_detector.py:33-52): img_sizes are rounded to stride
    multiples, thresholds default to 0.5/0.5, and `use_api_preprocess`
    selects pad-to-square + letterbox (the production mode) over plain
    letterbox.
    """

    def __init__(self, model: Union[str, ModelSpec] = "yolov7-w6-face",
                 variables=None, torch_weights: Optional[str] = None,
                 img_sizes: Sequence[int] = (640, 3840),
                 conf_thres: float = 0.5, iou_thres: float = 0.5,
                 use_api_preprocess: bool = False,
                 dtype=jnp.float32, max_det: int = 300,
                 max_candidates: int = 4096, seed: int = 0):
        spec = zoo.get_spec(model) if isinstance(model, str) else model
        self.spec = spec.resolve()
        self.model = YoloFace(spec=self.spec, dtype=dtype)
        if torch_weights is not None:
            if str(torch_weights).endswith(".npz"):
                from face_detection_multi_scale_tpu.train.checkpoint import (
                    load_inference_weights)
                variables = load_inference_weights(torch_weights)
            else:
                variables = convert_state_dict(
                    load_torch_checkpoint(torch_weights))
        if variables is None:
            _, variables = init_model(self.spec, jax.random.PRNGKey(seed),
                                      img_size=64, dtype=dtype)
        self.variables = variables
        self.dtype = dtype

        self.stride = self.spec.max_stride
        self.img_sizes = [check_img_size(s, self.stride) for s in img_sizes]
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.use_api_preprocess = use_api_preprocess
        self.max_det = max_det
        self.max_candidates = max_candidates
        self._exec: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------
    # compiled executables
    # ------------------------------------------------------------------

    def _executable(self, h: int, w: int):
        """One fused jit per static (h, w): uint8 NHWC batch -> Detections."""
        key = (h, w)
        if key not in self._exec:
            model, spec = self.model, self.spec
            conf, iou = self.conf_thres, self.iou_thres
            max_cand, max_det = self.max_candidates, self.max_det
            dtype = self.dtype

            @jax.jit
            def run(variables, images_u8):
                x = images_u8.astype(dtype) / 255.0
                raws = model.apply(variables, x, train=False)
                preds = decode(raws, spec)
                return NMS.non_max_suppression(
                    preds, conf, iou, nc=spec.nc, nkpt=spec.nkpt,
                    max_candidates=max_cand, max_det=max_det)

            self._exec[key] = run
        return self._exec[key]

    def run_network(self, images_u8: np.ndarray) -> NMS.Detections:
        """Raw engine call: uint8 NHWC (bs, h, w, 3) -> device Detections."""
        bs, h, w, _ = images_u8.shape
        return self._executable(h, w)(self.variables, images_u8)

    # ------------------------------------------------------------------
    # preprocessing
    # ------------------------------------------------------------------

    def _load(self, img) -> np.ndarray:
        if isinstance(img, (str, bytes)):
            import cv2
            im = cv2.imread(img)
            if im is None:
                raise ValueError(f"could not read image: {img!r}")
            return im
        return img

    def preprocess(self, img_bgr: np.ndarray, img_size: int) -> np.ndarray:
        """BGR HWC uint8 -> RGB HWC uint8 network input (reference
        multi_scale_face_detector.py:69-107 semantics for both modes)."""
        if self.use_api_preprocess:
            # production-API chain operates on RGB (PIL) input
            return LB.preprocess_api(img_bgr[:, :, ::-1], img_size,
                                     self.stride)
        # reference standard mode letterboxes with auto=True (minimum
        # stride-aligned rectangle)
        return LB.preprocess_standard(img_bgr, img_size, self.stride,
                                      auto=True)

    # ------------------------------------------------------------------
    # detection APIs
    # ------------------------------------------------------------------

    def detect_single_scale(self, img, img_size: int):
        """One image, one pyramid scale. Returns (detections, img0_shape,
        seconds): detections is (n, 7) [x1, y1, x2, y2, conf, cls,
        scale_idx] in original-image pixels (multi_scale_face_detector.py:
        109-166 contract, including the 6-column truncation, the API-inverse
        rescale, and the .round())."""
        img0 = self._load(img)
        img0_shape = img0.shape
        inp = self.preprocess(img0, img_size)

        t1 = time.perf_counter()
        dets = self.run_network(inp[None])
        rows = NMS.detections_to_numpy(dets)[0]
        t2 = time.perf_counter()

        rows = rows[:, :6]
        if len(rows):
            rows[:, :4] = LB.scale_coords_api(
                inp.shape[:2], rows[:, :4].astype(np.float64),
                img0_shape).round()
        scale_idx = self.img_sizes.index(img_size) if img_size in \
            self.img_sizes else -1
        out = np.hstack([rows, np.full((len(rows), 1), scale_idx,
                                       rows.dtype)])
        return out, img0_shape, t2 - t1

    def detect_multi_scale(self, img):
        """Full TTA pyramid: detect at every scale, merge with the
        scale-aware weighted NMS (multi_scale_face_detector.py:242-288).
        Returns (final (n, 7) array, img0_shape)."""
        all_dets: List[np.ndarray] = []
        img0_shape = None
        img0 = self._load(img)
        for img_size in self.img_sizes:
            det, img0_shape, _ = self.detect_single_scale(img0, img_size)
            if len(det):
                all_dets.append(det)
        if not all_dets:
            return np.zeros((0, 7)), img0_shape
        merged = np.vstack(all_dets)
        idx, valid = NMS.weighted_nms(
            merged[:, :4].astype(np.float32),
            merged[:, 4].astype(np.float32),
            merged[:, 6].astype(np.float32),
            np.ones(len(merged), bool),
            num_scales=len(self.img_sizes),
            iou_thres=self.iou_thres,
            max_det=len(merged))
        keep = np.asarray(idx)[np.asarray(valid)]
        return merged[keep], img0_shape

    def detect_batch(self, imgs: Sequence, img_size: int,
                     kpt: bool = True) -> List[np.ndarray]:
        """Throughput path: a batch of images at one scale in one compiled
        call. Images are letterboxed to the same square (auto=False).
        Returns per-image (n, 6 [+3*nkpt]) arrays in original coords."""
        img_size = check_img_size(img_size, self.stride)
        inputs, shapes = [], []
        for img in imgs:
            img0 = self._load(img)
            shapes.append(img0.shape)
            if self.use_api_preprocess:
                inputs.append(LB.preprocess_api(
                    img0[:, :, ::-1], img_size, self.stride))
            else:
                inputs.append(LB.preprocess_standard(
                    img0, img_size, self.stride, auto=False))
        batch = np.stack(inputs)
        dets = self.run_network(batch)
        rows_list = NMS.detections_to_numpy(dets)
        out = []
        for rows, shape in zip(rows_list, shapes):
            rows = rows.astype(np.float64)
            if not kpt:
                rows = rows[:, :6]
            if len(rows):
                if self.use_api_preprocess:
                    rows[:, :4] = LB.scale_coords_api(
                        (img_size, img_size), rows[:, :4], shape)
                else:
                    rows[:, :4] = LB.scale_coords(
                        (img_size, img_size), rows[:, :4], shape[:2])
                    if kpt and rows.shape[1] > 6:
                        rows[:, 6:] = LB.scale_coords(
                            (img_size, img_size), rows[:, 6:], shape[:2],
                            kpt=True, step=3)
            out.append(rows)
        return out

    def warmup(self, img_size: Optional[int] = None, batch: int = 1):
        """Compile the executable for a size ahead of time (reference
        warmup forward, detect.py:64-65)."""
        size = check_img_size(img_size or self.img_sizes[0], self.stride)
        dummy = np.zeros((batch, size, size, 3), np.uint8)
        jax.block_until_ready(self.run_network(dummy).boxes)
