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
from pathlib import Path
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
                 max_candidates: int = 4096, seed: int = 0,
                 mesh=None, fuse: bool = True,
                 use_device_preprocess: bool = False,
                 fuse_elan=False, micro_batch: Optional[int] = None,
                 tile_top_scale=False, tile_halo: int = 256,
                 tile_min_size: int = 2048,
                 quantize: Optional[str] = None, calib_images=None):
        if isinstance(model, str):
            spec = zoo.get_spec(model)  # pinned, verified strides
        else:
            spec = model
            # custom specs (hub.custom / cfg yaml): derive strides by a
            # shape-only dummy forward, as the reference Model.__init__
            # does (models/yolo.py:345) — the parser's P3-start default
            # is wrong for e.g. models/hub/yolov3-tiny.yaml (P4/P5)
            from face_detection_multi_scale_tpu.models.model import (
                compute_strides)
            compute_strides(spec)
        self.spec = spec.resolve()
        self.model = YoloFace(spec=self.spec, dtype=dtype)
        if torch_weights is not None:
            from face_detection_multi_scale_tpu.utils.downloads import (
                attempt_download)
            torch_weights = attempt_download(str(torch_weights))
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
        if fuse:
            # serve fused conv+BN weights like the reference's
            # attempt_load -> .fuse() (models/experimental.py:126)
            from face_detection_multi_scale_tpu.models.fuse import fold_bn
            variables = fold_bn(variables)
        self.variables = variables
        self.dtype = dtype

        self.stride = self.spec.max_stride
        self.img_sizes = [check_img_size(s, self.stride) for s in img_sizes]
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.use_api_preprocess = use_api_preprocess
        self.max_det = max_det
        self.max_candidates = max_candidates
        # optional device mesh: batches shard along the data axis so one
        # engine serves every chip (the multi-GPU pool replacement,
        # reference yolov7_face_multi_scale_dataframe_predict.py:569-597)
        self.mesh = mesh
        # fuse resize+pad+normalize into the network executable so the
        # raw uint8 frame is the only H2D transfer (one upload serves
        # every pyramid scale); numerics differ from cv2 by <=2/255 per
        # pixel (see infer/device_preprocess.py)
        self.use_device_preprocess = use_device_preprocess
        # micro-batching: run the engine as lax.map over micro_batch-
        # sized chunks INSIDE one jit. Peak activation memory scales
        # with the chunk, not the API batch — the lever for large-image
        # operating points where HBM capacity, not compute, caps the
        # batch (w6@1280 regresses past b8 from HBM churn; two
        # sequential b8 chunks keep b8's working set at b16's
        # dispatch/pipeline efficiency). None = whole-batch (default).
        self.micro_batch = micro_batch
        self._warned_mb_mesh = False
        self._warned_mb_divide = False
        # tiled giant scales: run any pyramid scale >= tile_min_size as
        # a g x g batch of halo'd tiles instead of one batch-1
        # giant-spatial forward (b1@3840 measures ~5% MFU, PERF.md §3b;
        # the same pixels as a batch run ~1.9x faster). Detections are
        # reassembled by tile ownership + seam dedup — an approximation
        # near seams, OFF by default; see infer/tiling.py for the
        # correctness contract.
        self.tile_grid = 2 if tile_top_scale is True else \
            int(tile_top_scale or 0)
        if self.tile_grid == 1:
            raise ValueError(
                "tile_top_scale=1 is not a tiling (grid must be >= 2); "
                "pass 0/False for the untiled path")
        self.tile_halo = tile_halo
        self.tile_min_size = tile_min_size
        self._warned_tile_standard = False
        # execute E-ELAN groups as single Pallas kernels (VMEM-resident
        # intermediates, models/fused.py); serving-only HBM-byte saver.
        # True fuses with the default kernel; a string selects a
        # measured variant ("flat+im2col9+ab+ct", optionally prefixed
        # "pre:" to absorb each group's feeding downsample conv) via
        # models/fused.apply_variant — the same grammar the on-chip A/B
        # (tools/bench_elan.py) ranks.
        # W8A8 quantized serving (models/quant.py): int8 weights + int8
        # inter-node activations, int32 MXU accumulate, requant folded
        # into each conv epilogue. The byte-reduction lever for the
        # HBM-bound forward — measured on-chip bytes 38.6 -> 23.4 GB and
        # 99 -> 73 ms/batch for w6@640 b128 (tools/QUANT_AB.json,
        # PERF.md §3e). Calibration: pass `calib_images` (uint8 NHWC
        # network-input frames) or call calibrate_int8(); otherwise the
        # first served batch calibrates lazily (post-training, activation
        # amax over that batch).
        if quantize not in (None, "int8"):
            raise ValueError(f"quantize must be None or 'int8', "
                             f"got {quantize!r}")
        if quantize and fuse_elan:
            raise ValueError("quantize and fuse_elan are mutually "
                             "exclusive serving modes")
        self._quantize = quantize
        self._qparams = None
        if quantize:
            from face_detection_multi_scale_tpu.models import quant
            # validate the op set NOW (raises NotImplementedError for
            # any op outside the quantized executor; all seven zoo
            # families pass as of round 5) via the compute-free
            # structural trace
            quant.calibrate_shape_only(self.spec, self.variables)
            if calib_images is not None:
                self.calibrate_int8(calib_images)
        self.fuse_elan = bool(fuse_elan)
        self._elan_blocks = None
        if fuse_elan:
            import dataclasses as _dc

            from face_detection_multi_scale_tpu.models.fused import (
                apply_variant, find_elan_blocks)
            expr = fuse_elan if isinstance(fuse_elan, str) else ""
            absorb = expr.startswith("pre:")
            expr = expr[4:] if absorb else expr
            blocks = find_elan_blocks(self.spec, absorb_pre=absorb)
            if expr:
                blocks = [_dc.replace(b, shape=apply_variant(b.shape,
                                                             expr))
                          for b in blocks]
            self._elan_blocks = blocks
        self._exec: Dict[Tuple, object] = {}
        # candidate-truncation telemetry: count of images whose gated
        # candidates exceeded max_candidates (the fixed-capacity accuracy
        # knob; the reference keeps every gated box up to 30000,
        # utils/general.py:518-524) — see truncation_report()
        self._trunc_images = 0
        self._trunc_total = 0
        self._trunc_max_gated = 0
        self._trunc_dropped = 0

    def _record_truncation(self, dets) -> None:
        if dets.n_gated is None:
            return
        n = np.asarray(dets.n_gated).reshape(-1)
        over = n > self.max_candidates
        self._trunc_images += int(over.sum())
        self._trunc_total += int(n.size)
        self._trunc_max_gated = max(self._trunc_max_gated, int(n.max()))
        self._trunc_dropped += int(
            np.clip(n - self.max_candidates, 0, None).sum())

    def _record_truncation_tiled(self, dets, n_tiles: int) -> None:
        """Tiled-scale telemetry: one report entry per IMAGE, not per
        tile (the capacity is per tile, so an image is truncated iff any
        of its tiles overflowed; dropped counts sum over its tiles)."""
        if dets.n_gated is None:
            return
        n = np.asarray(dets.n_gated).reshape(-1, n_tiles)
        self._trunc_images += int((n > self.max_candidates)
                                  .any(axis=1).sum())
        self._trunc_total += int(n.shape[0])
        self._trunc_max_gated = max(self._trunc_max_gated, int(n.max()))
        self._trunc_dropped += int(
            np.clip(n - self.max_candidates, 0, None).sum())

    def truncation_report(self) -> Dict[str, int]:
        """Accumulated candidate-truncation stats over every network call
        this detector has served; truncated_images > 0 means crowded
        inputs exceeded `max_candidates` and recall was silently capped —
        raise max_candidates to recover it."""
        return {"images": self._trunc_total,
                "truncated_images": self._trunc_images,
                "max_gated": self._trunc_max_gated,
                "max_candidates": int(self.max_candidates),
                "dropped_total": self._trunc_dropped}

    # ------------------------------------------------------------------
    # compiled executables
    # ------------------------------------------------------------------

    def calibrate_int8(self, images_u8) -> None:
        """Post-training calibration for quantize='int8': run a float
        forward over `images_u8` (uint8 NHWC network-input frames, or
        float in [0, 1]) recording per-tensor activation ranges, then
        build the int8 qparams tree the serving executables consume.
        At most 8 frames are used — amax saturates fast and the float
        calibration forward is a one-off compile."""
        from face_detection_multi_scale_tpu.models import quant
        x = jnp.asarray(images_u8[:8])
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        self._qparams = quant.quantize_model(self.spec, self.variables, x)

    def _serving_variables(self):
        """The params tree the executables take as their jit argument:
        the int8 qparams when quantized, else the float variables."""
        return self._qparams if self._quantize else self.variables

    def _ensure_calibrated(self, images_u8) -> None:
        if self._quantize and self._qparams is None:
            self.calibrate_int8(images_u8)

    def _require_calibrated_for_dev(self) -> None:
        """Device-preprocess executables fuse letterboxing on device, so
        there is no host-side network-input frame to lazily calibrate
        on; quantized serving there needs explicit calibration."""
        if self._quantize and self._qparams is None:
            raise RuntimeError(
                "quantize='int8' with use_device_preprocess needs "
                "explicit calibration: pass calib_images= or call "
                "calibrate_int8(frames) before serving")

    def _forward(self, variables, x):
        """Network forward used by every executable: the flax module
        graph; the W8A8 executor (models/quant.py) when `quantize` is
        set (x in [0,1] re-quantizes to int8 on device — `variables` is
        then the qparams tree); or the fused-ELAN serving executor
        (models/fused.py) when `fuse_elan` is set."""
        if self._quantize:
            from face_detection_multi_scale_tpu.models import quant
            return quant.quant_apply(self.spec, variables, x,
                                     dtype=self.dtype)
        if self.fuse_elan and self._elan_blocks:
            from face_detection_multi_scale_tpu.models.fused import (
                fused_apply)
            return fused_apply(self.spec, variables, x,
                               blocks=self._elan_blocks, dtype=self.dtype)
        return self.model.apply(variables, x, train=False)

    def _microbatched(self, engine, variables, images_u8):
        """Apply a (variables, chunk) -> Detections engine to the whole
        batch, as lax.map over micro_batch-sized chunks when enabled and
        the batch divides evenly (trace-time decision — the batch dim is
        static under jit). Peak activation memory is the chunk's, not
        the batch's; results re-merge to the flat batch layout."""
        mb, batch = self.micro_batch, images_u8.shape[0]
        # under a mesh the batch dim carries the data sharding; chunking
        # it would fold shards into the map dim — per-chip chunking there
        # is a different (unimplemented) layout, so mesh wins
        if not mb or self.mesh is not None or batch <= mb or batch % mb:
            # a user-set knob silently degrading is a deployment trap
            # (the tiled path warns the same way, see _warned_tile_*) —
            # say it once per cause; batch <= mb is whole-batch by
            # definition, not a degradation
            if mb and self.mesh is not None \
                    and not self._warned_mb_mesh:
                self._warned_mb_mesh = True
                import warnings
                warnings.warn(
                    f"micro_batch={mb} is inert under a mesh (the batch "
                    "dim carries the data sharding; per-chip chunking "
                    "is not implemented) — running whole-batch",
                    RuntimeWarning, stacklevel=2)
            elif mb and self.mesh is None and batch > mb \
                    and batch % mb and not self._warned_mb_divide:
                self._warned_mb_divide = True
                import warnings
                warnings.warn(
                    f"micro_batch={mb} does not divide batch {batch} — "
                    "running whole-batch (pad or resize the batch to a "
                    "multiple to get micro-batching)",
                    RuntimeWarning, stacklevel=2)
            return engine(variables, images_u8)
        chunks = images_u8.reshape((batch // mb, mb)
                                   + images_u8.shape[1:])
        dets = jax.lax.map(lambda c: engine(variables, c), chunks)
        return jax.tree.map(
            lambda a: a.reshape((batch,) + a.shape[2:]), dets)

    def _executable(self, h: int, w: int):
        """One fused jit per static (h, w): uint8 NHWC batch -> Detections."""
        key = (h, w)
        if key not in self._exec:
            model, spec = self.model, self.spec
            conf, iou = self.conf_thres, self.iou_thres
            max_cand, max_det = self.max_candidates, self.max_det
            dtype = self.dtype

            forward = self._forward

            def engine(variables, images_u8):
                x = images_u8.astype(dtype) / 255.0
                raws = forward(variables, x)
                preds = decode(raws, spec)
                return NMS.non_max_suppression(
                    preds, conf, iou, nc=spec.nc, nkpt=spec.nkpt,
                    max_candidates=max_cand, max_det=max_det)

            @jax.jit
            def run(variables, images_u8):
                return self._microbatched(engine, variables, images_u8)

            self._exec[key] = run
        return self._exec[key]

    def _executable_dev(self, src_hw: Tuple[int, int], img_size: int,
                        auto: bool):
        """Fused device-preprocess executable for one (raw shape, scale):
        uint8 RAW NHWC batch -> letterbox/normalize on device -> network
        -> Detections. Returns (run, geometry) where geometry.out_hw is
        the network-input shape for the coordinate inverse."""
        key = ("dev", src_hw, img_size, auto, self.use_api_preprocess)
        if key not in self._exec:
            from face_detection_multi_scale_tpu.infer import (
                device_preprocess as DP)

            model, spec = self.model, self.spec
            conf, iou = self.conf_thres, self.iou_thres
            max_cand, max_det = self.max_candidates, self.max_det
            dtype = self.dtype
            if self.use_api_preprocess:
                geom = DP.geometry_for_api(src_hw, img_size)

                def pre(raw):
                    # raw frames are BGR (cv2); the API chain expects RGB
                    return DP.device_preprocess_api(
                        raw[..., ::-1], img_size, dtype=dtype)
            else:
                geom = DP.letterbox_geometry(src_hw, img_size, auto=auto,
                                             stride=self.stride)

                def pre(raw):
                    return DP.device_letterbox(raw, geom, dtype=dtype)

            forward = self._forward

            def engine(variables, raw_u8):
                x = pre(raw_u8)
                raws = forward(variables, x)
                preds = decode(raws, spec)
                return NMS.non_max_suppression(
                    preds, conf, iou, nc=spec.nc, nkpt=spec.nkpt,
                    max_candidates=max_cand, max_det=max_det)

            @jax.jit
            def run(variables, raw_u8):
                return self._microbatched(engine, variables, raw_u8)

            self._exec[key] = (run, geom)
        return self._exec[key]

    def run_network(self, images_u8: np.ndarray, *,
                    _record: bool = True) -> NMS.Detections:
        """Raw engine call: uint8 NHWC (bs, h, w, 3) -> device Detections.

        With a mesh attached, the batch is padded to a multiple of the
        mesh size, sharded along the data axis (params replicate), and
        the padded tail is dropped from the result. _record=False defers
        truncation telemetry to the caller (the tiled paths record one
        entry per image, not per tile)."""
        bs, h, w, _ = images_u8.shape
        self._ensure_calibrated(images_u8)
        if self.mesh is None:
            dets = self._executable(h, w)(self._serving_variables(),
                                          images_u8)
            if _record:
                self._record_truncation(dets)
            return dets

        from face_detection_multi_scale_tpu.parallel.mesh import (
            batch_sharding)

        n_dev = self.mesh.size
        pad = (-bs) % n_dev
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.zeros((pad, h, w, 3), images_u8.dtype)])
        with self.mesh:
            sharded = jax.device_put(images_u8, batch_sharding(self.mesh))
            dets = self._executable(h, w)(self._serving_variables(),
                                          sharded)
        if pad:
            dets = NMS.Detections(*(jax.device_get(x)[:bs] for x in dets))
        if _record:
            self._record_truncation(dets)
        return dets

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
    # tiled giant scales
    # ------------------------------------------------------------------

    def _tile_plan(self, img_size: int):
        """TilePlan when tiling applies to this scale, else None."""
        if self.tile_grid < 2 or img_size < self.tile_min_size:
            return None
        from face_detection_multi_scale_tpu.infer import tiling
        return tiling.plan_tiles(img_size, self.tile_grid,
                                 self.tile_halo, self.stride)

    def _run_tiled_batch(self, inputs, plan) -> List[np.ndarray]:
        """Letterboxed square frames -> per-frame (n, 6+E) rows in frame
        coords: ALL frames' g² halo'd tiles in one batched call,
        reassembled per frame by tile ownership + seam dedup, with
        per-image (not per-tile) truncation telemetry. The single tiled
        call sequence shared by every tiled path."""
        from face_detection_multi_scale_tpu.infer import tiling
        tiles = np.concatenate(
            [tiling.extract_tiles(inp, plan) for inp in inputs])
        dets = self.run_network(tiles, _record=False)
        self._record_truncation_tiled(dets, plan.n_tiles)
        tile_rows = NMS.detections_to_numpy(dets)
        n = plan.n_tiles
        return [tiling.assemble_rows(tile_rows[i * n:(i + 1) * n], plan,
                                     self.iou_thres)
                for i in range(len(inputs))]

    def _run_scale_tiled(self, inp: np.ndarray, plan) -> np.ndarray:
        """One letterboxed S×S frame -> (n, 6+E) rows in the S×S frame."""
        return self._run_tiled_batch([inp], plan)[0]

    # ------------------------------------------------------------------
    # detection APIs
    # ------------------------------------------------------------------

    def detect_single_scale(self, img, img_size: int, _raw_dev=None):
        """One image, one pyramid scale. Returns (detections, img0_shape,
        seconds): detections is (n, 7) [x1, y1, x2, y2, conf, cls,
        scale_idx] in original-image pixels (multi_scale_face_detector.py:
        109-166 contract, including the 6-column truncation, the API-inverse
        rescale, and the .round()).

        `_raw_dev` (internal): a device-resident (1, h, w, 3) uint8 raw
        frame — the multi-scale loop uploads the frame once and reuses it
        at every scale when device preprocessing is on."""
        if _raw_dev is not None:
            img0_shape = tuple(int(v) for v in _raw_dev.shape[1:])
            img0 = None
        else:
            img0 = self._load(img)
            img0_shape = img0.shape

        # per-image tiling needs a SQUARE scale frame: api mode's
        # pad-to-square gives one; standard mode letterboxes auto=True
        # (rectangular) here, so tiling applies via the batch path's
        # square auto=False variant instead (detect_multi_scale_batch)
        plan = (self._tile_plan(img_size) if self.use_api_preprocess
                else None)
        if (plan is None and not self.use_api_preprocess
                and self.tile_grid >= 2 and img_size >= self.tile_min_size
                and not self._warned_tile_standard):
            self._warned_tile_standard = True
            import warnings
            warnings.warn(
                "tile_top_scale is inert on the per-image standard-"
                "preprocess path (rectangular auto=True letterbox); use "
                "use_api_preprocess=True or detect_multi_scale_batch "
                "for tiled giant scales", RuntimeWarning, stacklevel=2)
        t1 = time.perf_counter()
        if plan is not None:
            # tiled giant scale: host letterbox + one g²-tile batched
            # call. The device-preprocess raw path doesn't tile —
            # prefer the host frame we were handed; only fall back to
            # fetching the raw upload when no host copy exists
            if img0 is None:
                img0 = (self._load(img) if img is not None
                        else np.asarray(_raw_dev)[0])
            inp = self.preprocess(img0, img_size)
            rows = self._run_scale_tiled(inp, plan)
            inp_hw = inp.shape[:2]
        elif self.use_device_preprocess:
            raw = (_raw_dev if _raw_dev is not None
                   else jnp.asarray(img0[None]))
            run, geom = self._executable_dev(img0_shape[:2], img_size,
                                             auto=True)
            self._require_calibrated_for_dev()
            dets = run(self._serving_variables(), raw)
            self._record_truncation(dets)
            inp_hw = geom.out_hw
            rows = NMS.detections_to_numpy(dets)[0]
        else:
            inp = self.preprocess(img0, img_size)
            dets = self.run_network(inp[None])
            inp_hw = inp.shape[:2]
            rows = NMS.detections_to_numpy(dets)[0]
        t2 = time.perf_counter()

        rows = rows[:, :6]
        if len(rows):
            rows[:, :4] = LB.scale_coords_api(
                inp_hw, rows[:, :4].astype(np.float64),
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
        # device preprocessing: ONE raw-frame upload serves all scales
        raw_dev = (jnp.asarray(img0[None])
                   if self.use_device_preprocess else None)
        for img_size in self.img_sizes:
            det, img0_shape, _ = self.detect_single_scale(
                img0, img_size, _raw_dev=raw_dev)
            if len(det):
                all_dets.append(det)
        if not all_dets:
            return np.zeros((0, 7)), img0_shape
        merged = np.vstack(all_dets)
        keep = NMS.weighted_nms_merge(merged, len(self.img_sizes),
                                      self.iou_thres)
        return merged[keep], img0_shape

    def detect_multi_scale_batch(self, imgs: Sequence
                                 ) -> List[np.ndarray]:
        """Batched TTA pyramid: all images go through each scale as ONE
        compiled call, then merge per image with the weighted NMS; the
        device sees (n_imgs, s, s, 3) batches instead of n_imgs x
        n_scales single-image launches.

        In API mode this is functionally identical to detect_multi_scale
        per image (same pad-to-square preprocess + top-left-scale
        inverse). In standard mode the images are letterboxed to a
        centered square (auto=False, the only batchable variant) and
        inverted with the exact gain+pad `scale_coords` — boxes land in
        true original-image coordinates, which for non-square images
        differs from the per-image standard path, because the reference
        per-image path applies the API inverse to an auto=True letterbox
        (multi_scale_face_detector.py:144, a reference quirk we mirror
        there)."""
        loaded = [self._load(im) for im in imgs]
        per_image: List[List[np.ndarray]] = [[] for _ in loaded]
        for scale_idx, img_size in enumerate(self.img_sizes):
            if self.use_api_preprocess:
                inputs = [self.preprocess(im, img_size) for im in loaded]
            else:
                # standard mode letterboxes auto=True per image (variable
                # shapes); batching needs the square auto=False variant
                inputs = [LB.preprocess_standard(im, img_size,
                                                 self.stride, auto=False)
                          for im in loaded]
            plan = self._tile_plan(img_size)
            if plan is not None:
                # giant scale: every image's g² halo'd tiles in ONE
                # batched call, reassembled per image (infer/tiling.py)
                rows_list = self._run_tiled_batch(inputs, plan)
            else:
                dets = self.run_network(np.stack(inputs))
                rows_list = NMS.detections_to_numpy(dets)
            frame_hw = inputs[0].shape[:2]
            for i, rows in enumerate(rows_list):
                rows = rows[:, :6].astype(np.float64)
                if len(rows):
                    if self.use_api_preprocess:
                        rows[:, :4] = LB.scale_coords_api(
                            frame_hw, rows[:, :4],
                            loaded[i].shape).round()
                    else:
                        # centered auto=False letterbox inverts with the
                        # gain+pad formula, not the top-left API scale
                        rows[:, :4] = LB.scale_coords(
                            frame_hw, rows[:, :4],
                            loaded[i].shape[:2]).round()
                per_image[i].append(np.hstack([
                    rows, np.full((len(rows), 1), scale_idx)]))
        out = []
        for dets_per_scale in per_image:
            merged = np.vstack(dets_per_scale)
            if not len(merged):
                out.append(np.zeros((0, 7)))
                continue
            keep = NMS.weighted_nms_merge(merged, len(self.img_sizes),
                                          self.iou_thres)
            out.append(merged[keep])
        return out

    def detect_batch(self, imgs: Sequence, img_size: int,
                     kpt: bool = True) -> List[np.ndarray]:
        """Throughput path: a batch of images at one scale in one compiled
        call. Images are letterboxed to the same square (auto=False).
        Returns per-image (n, 6 [+3*nkpt]) arrays in original coords."""
        img_size = check_img_size(img_size, self.stride)
        loaded = [self._load(img) for img in imgs]
        shapes = [im.shape for im in loaded]
        plan = self._tile_plan(img_size)
        if (plan is None and self.use_device_preprocess
                and self.mesh is None and len(set(shapes)) == 1):
            # uniform raw shapes (e.g. video frames): upload raw uint8,
            # fuse preprocess into the network executable
            run, geom = self._executable_dev(shapes[0][:2], img_size,
                                             auto=False)
            self._require_calibrated_for_dev()
            dets = run(self._serving_variables(),
                       jnp.asarray(np.stack(loaded)))
            self._record_truncation(dets)
            rows_list = NMS.detections_to_numpy(dets)
        else:
            inputs = []
            for img0 in loaded:
                if self.use_api_preprocess:
                    inputs.append(LB.preprocess_api(
                        img0[:, :, ::-1], img_size, self.stride))
                else:
                    inputs.append(LB.preprocess_standard(
                        img0, img_size, self.stride, auto=False))
            if plan is not None:
                # giant single scale: same tiled transform as TTA
                rows_list = self._run_tiled_batch(inputs, plan)
            else:
                dets = self.run_network(np.stack(inputs))
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
                    if kpt and rows.shape[1] > 6:
                        # same pad-to-square inverse for landmarks:
                        # pure scale by max(orig)/input then clip
                        scale = max(shape[0], shape[1]) / img_size
                        rows[:, 6::3] = (rows[:, 6::3] * scale).clip(
                            0, shape[1])
                        rows[:, 7::3] = (rows[:, 7::3] * scale).clip(
                            0, shape[0])
                else:
                    rows[:, :4] = LB.scale_coords(
                        (img_size, img_size), rows[:, :4], shape[:2])
                    if kpt and rows.shape[1] > 6:
                        rows[:, 6:] = LB.scale_coords(
                            (img_size, img_size), rows[:, 6:], shape[:2],
                            kpt=True, step=3)
            out.append(rows)
        return out

    def predict(self, imgs, size: int = 640):
        """Input-robust hub inference — the autoShape forward equivalent
        (reference models/common.py:572-639): accepts a filename, URL,
        PIL image, HWC numpy array (RGB, per the autoShape convention),
        CHW array, or a list of any of those; letterboxes the batch to
        ONE stride-aligned common rectangle (max of the per-image scaled
        shapes), runs the fused engine once, and returns a `Detections`
        results object (xyxy/xywh/normalized/pandas/save/crop/render).
        """
        from face_detection_multi_scale_tpu.infer.results import (
            Detections)
        from face_detection_multi_scale_tpu.utils.general import (
            make_divisible)

        t = [time.perf_counter()]
        batch = imgs if isinstance(imgs, (list, tuple)) else [imgs]
        n = len(batch)
        loaded, files, shape0, shape1 = [], [], [], []
        for i, im in enumerate(batch):
            f = f"image{i}"
            if isinstance(im, str):
                if im.startswith("http"):
                    import requests
                    from PIL import Image

                    im, f = np.asarray(Image.open(
                        requests.get(im, stream=True).raw)), im
                else:
                    f = im
                    im = np.asarray(self._load(im))[:, :, ::-1]  # RGB
            elif hasattr(im, "filename"):  # PIL Image
                f = getattr(im, "filename", None) or f
                im = np.asarray(im)
            im = np.asarray(im)
            files.append(Path(f).with_suffix(".jpg").name)
            if im.shape[0] < 5:  # CHW input
                im = im.transpose((1, 2, 0))
            im = (im[:, :, :3] if im.ndim == 3
                  else np.tile(im[:, :, None], 3))
            s = im.shape[:2]
            shape0.append(s)
            g = size / max(s)
            shape1.append([y * g for y in s])
            loaded.append(np.ascontiguousarray(im))
        # one common stride-aligned inference rectangle
        # (models/common.py:619)
        shape1 = [make_divisible(x, self.stride)
                  for x in np.stack(shape1, 0).max(0)]
        x = np.stack([LB.letterbox(im, tuple(shape1), auto=False)[0]
                      for im in loaded])
        t.append(time.perf_counter())
        dets = self.run_network(x)
        t.append(time.perf_counter())
        rows_list = NMS.detections_to_numpy(dets)
        pred = []
        for rows, s0 in zip(rows_list, shape0):
            rows = rows[:, :6].astype(np.float64)
            if len(rows):
                LB.scale_coords(tuple(shape1), rows[:, :4], s0)
            pred.append(rows)
        t.append(time.perf_counter())
        names = (["face"] if self.spec.nc == 1
                 else [str(i) for i in range(self.spec.nc)])
        return Detections(loaded, pred, files, times=t, names=names,
                          shape=(n, *shape1, 3))

    __call__ = predict

    # ------------------------------------------------------------------
    # visualization / export helpers
    # (reference multi_scale_face_detector.py:290-688)
    # ------------------------------------------------------------------

    def save_detection_result(self, img, detections, output_path: str):
        """Draw final multi-scale detections on the image and save
        (multi_scale_face_detector.py:424-490)."""
        import cv2

        from face_detection_multi_scale_tpu.utils.plotting import (
            draw_detection)

        img0 = self._load(img).copy()
        for det in np.asarray(detections):
            scale_idx = int(det[6]) if len(det) >= 7 else -1
            scale = (self.img_sizes[scale_idx]
                     if 0 <= scale_idx < len(self.img_sizes) else "?")
            draw_detection(img0, det[:4], det[4], 0,
                           f"{det[4]:.2f}@{scale}")
        cv2.imwrite(output_path, img0)
        return output_path

    def visualize_multi_scale_results(self, img, save_path: str):
        """Per-scale detection grid: one panel per pyramid scale plus the
        weighted-NMS merge (multi_scale_face_detector.py:290-422)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        img0 = self._load(img)
        rgb = img0[:, :, ::-1]
        per_scale = []
        for size in self.img_sizes:
            det, _, _ = self.detect_single_scale(img0, size)
            per_scale.append(det)
        final, _ = self.detect_multi_scale(img0)

        n = len(self.img_sizes) + 1
        fig, axes = plt.subplots(1, n, figsize=(6 * n, 6))
        panels = list(zip([f"scale {s}" for s in self.img_sizes],
                          per_scale)) + [("weighted NMS merge", final)]
        for ax, (title, dets) in zip(np.atleast_1d(axes), panels):
            ax.imshow(rgb)
            for d in dets:
                x1, y1, x2, y2 = d[:4]
                ax.add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           fill=False, color="lime",
                                           linewidth=1.5))
            ax.set_title(f"{title}: {len(dets)} faces")
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
        return per_scale, final

    def export_to_json(self, detections, img0_shape, path: str):
        """Single-image Triton-style JSON export
        (multi_scale_face_detector.py:574-616)."""
        import json

        from face_detection_multi_scale_tpu.infer.production import (
            frames_to_json)

        dets = np.asarray(detections)
        frame = {
            "bboxes": [[float(v) for v in d[:4]] for d in dets],
            "confidence": [float(d[4]) for d in dets],
            "class_names": ["face"] * len(dets),
            "class_indexes": [int(d[5]) for d in dets],
            "class_groups": ["face"] * len(dets),
            "scale_used": [str(self.img_sizes[int(d[6])])
                           if 0 <= int(d[6]) < len(self.img_sizes)
                           else "unknown" for d in dets],
            "num_faces": len(dets),
            "infer_time": 0.0,
        }
        data = frames_to_json([frame], 0.0)
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
        return path

    def compare_preprocessing_methods(self, img, img_size: Optional[int]
                                      = None):
        """Quantitative A/B of API vs standard preprocessing on one image
        (multi_scale_face_detector.py:618-688): runs both, returns
        detection counts and mean confidences."""
        size = img_size or self.img_sizes[0]
        img0 = self._load(img)
        saved = self.use_api_preprocess
        out = {}
        try:
            for mode, flag in (("api", True), ("standard", False)):
                self.use_api_preprocess = flag
                det, _, dt = self.detect_single_scale(img0, size)
                out[mode] = {
                    "count": int(len(det)),
                    "mean_conf": float(det[:, 4].mean()) if len(det)
                    else 0.0,
                    "seconds": dt,
                }
        finally:
            self.use_api_preprocess = saved
        return out

    def warmup(self, img_size: Optional[int] = None, batch: int = 1):
        """Compile the executable for a size ahead of time (reference
        warmup forward, detect.py:64-65)."""
        if self._quantize and self._qparams is None:
            # a zero dummy would lazily calibrate to garbage amax and
            # lock it in — quantized warmup needs real calibration first
            raise RuntimeError(
                "calibrate_int8(frames) (or calib_images=) before "
                "warmup() on a quantize='int8' detector — warming up on "
                "the zero dummy would calibrate to degenerate scales")
        size = check_img_size(img_size or self.img_sizes[0], self.stride)
        dummy = np.zeros((batch, size, size, 3), np.uint8)
        jax.block_until_ready(self.run_network(dummy).boxes)
