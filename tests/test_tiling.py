"""Tiled giant-scale inference (infer/tiling.py + FaceDetector tiling).

The tiling transform (PERF.md §3b answer to the 5%-MFU batch-1 top
scale) must be detection-equivalent to the untiled forward whenever
every face is smaller than the halo contract allows. The geometry is
tested exactly; the detector integration is tested end-to-end against
the untiled path with a deterministic mock network that "detects"
distinct-valued bright markers, exercising tile extraction, offsetting,
ownership filtering, seam dedup, and the coordinate inverses."""

import numpy as np
import pytest

from face_detection_multi_scale_tpu.infer import tiling


class TestPlanTiles:
    def test_3840_grid2_halo256(self):
        p = tiling.plan_tiles(3840, grid=2, halo=256, stride=64)
        assert p.tile == 2176
        assert p.origins == (0, 1664)
        assert p.bounds == (1920,)
        # overlap = 2*halo: every kept center has >= halo px of real
        # context toward the cropped side
        assert 2 * p.tile - p.size == 2 * 256

    def test_small_grid2(self):
        p = tiling.plan_tiles(256, grid=2, halo=64, stride=64)
        assert p.tile == 192
        assert p.origins == (0, 64)
        assert p.bounds == (128,)

    def test_grid3_halo_guarantee(self):
        p = tiling.plan_tiles(1920, grid=3, halo=128, stride=64)
        assert p.tile <= p.size and p.tile % 64 == 0
        for a, b in zip(p.origins, p.origins[1:]):
            overlap = a + p.tile - b
            assert overlap >= 2 * 128

    def test_ownership_partitions_frame(self):
        p = tiling.plan_tiles(1920, grid=3, halo=128, stride=64)
        edges = [tiling.owner_interval(p, i) for i in range(p.grid)]
        assert edges[0][0] == 0 and edges[-1][1] == p.size
        for (lo_a, hi_a), (lo_b, _) in zip(edges, edges[1:]):
            assert hi_a == lo_b
            assert lo_a < hi_a

    def test_rejects(self):
        with pytest.raises(ValueError):
            tiling.plan_tiles(256, grid=1, halo=64, stride=64)
        with pytest.raises(ValueError):
            tiling.plan_tiles(250, grid=2, halo=64, stride=64)

    def test_rejects_degenerate_full_frame_tiles(self):
        # halo so large the tiles grow to the full frame: g^2 identical
        # copies of the untiled compute — must refuse, not "optimize"
        with pytest.raises(ValueError, match="degenerate"):
            tiling.plan_tiles(2048, grid=2, halo=1000, stride=64)

    def test_extract_tiles_matches_crops(self):
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (256, 256, 3), np.uint8)
        p = tiling.plan_tiles(256, grid=2, halo=64, stride=64)
        tiles = tiling.extract_tiles(frame, p)
        assert tiles.shape == (4, 192, 192, 3)
        np.testing.assert_array_equal(tiles[1],
                                      frame[0:192, 64:256])
        np.testing.assert_array_equal(tiles[3],
                                      frame[64:256, 64:256])


class TestPlanTilesFuzz:
    def test_invariants_over_config_space(self):
        """For every (size, grid, halo) in a broad grid: plan_tiles
        either raises ValueError (degenerate) or yields a plan where
        (a) tiles stay inside the frame, (b) ownership cells partition
        it exactly, and (c) every adjacent overlap is >= 2*halo — the
        contract assemble_rows' halo-context guarantee rests on."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(size_mult=st.integers(2, 64), grid=st.integers(2, 5),
               halo=st.integers(0, 1024))
        def check(size_mult, grid, halo):
            size = 64 * size_mult
            try:
                p = tiling.plan_tiles(size, grid=grid, halo=halo,
                                      stride=64)
            except ValueError:
                return  # degenerate configs must raise, not mis-plan
            assert p.tile % 64 == 0 and p.tile < p.size
            assert p.origins[0] == 0
            assert p.origins[-1] + p.tile <= p.size
            assert all(a < b for a, b in zip(p.origins, p.origins[1:]))
            cells = [tiling.owner_interval(p, i) for i in range(p.grid)]
            assert cells[0][0] == 0 and cells[-1][1] == p.size
            for (_, hi), (lo, _) in zip(cells, cells[1:]):
                assert hi == lo
            for a, b in zip(p.origins, p.origins[1:]):
                assert a + p.tile - b >= 2 * halo

        check()


class TestAssembleRows:
    plan = tiling.plan_tiles(256, grid=2, halo=64, stride=64)

    @staticmethod
    def _rows(*rows):
        return np.asarray(rows, np.float64).reshape(-1, 6)

    def test_offset_and_ownership(self):
        # tile (0,0) detects a core box AND the far box it can see but
        # does not own; tile (1,1) owns the far box (local coords)
        r00 = self._rows([10, 10, 20, 20, .9, 0],
                         [150, 150, 160, 160, .8, 0])
        r11 = self._rows([150 - 64, 150 - 64, 160 - 64, 160 - 64, .8, 0])
        empty = np.zeros((0, 6))
        out = tiling.assemble_rows([r00, empty, empty, r11], self.plan)
        out = out[np.argsort(out[:, 0])]
        assert out.shape == (2, 6)
        np.testing.assert_allclose(out[0, :4], [10, 10, 20, 20])
        np.testing.assert_allclose(out[1, :4], [150, 150, 160, 160])

    def test_seam_duplicate_dedup(self):
        # box jitter puts the two sides' centers in different ownership
        # cells (127.x vs 128.x): both survive the filter, the weighted
        # merge kills one
        r00 = self._rows([120, 10, 134, 20, .9, 0])     # center x 127
        r01 = self._rows([121 - 64, 10, 135 - 64, 20, .85, 0])  # x 128
        empty = np.zeros((0, 6))
        out = tiling.assemble_rows([r00, r01, empty, empty], self.plan)
        assert out.shape[0] == 1

    def test_landmark_offsets(self):
        row = np.zeros((1, 6 + 15))
        row[0, :6] = [150 - 64, 150 - 64, 160 - 64, 160 - 64, .8, 0]
        row[0, 6:9] = [152 - 64, 155 - 64, .7]   # one (x, y, conf) kpt
        empty = np.zeros((0, 21))
        out = tiling.assemble_rows([empty, empty, empty, row], self.plan)
        assert out.shape == (1, 21)
        np.testing.assert_allclose(out[0, 6:9], [152, 155, .7])

    def test_all_empty(self):
        empty = np.zeros((0, 6))
        out = tiling.assemble_rows([empty] * 4, self.plan)
        assert out.shape[0] == 0


def _marker_mock_run_network(max_det=300):
    """A deterministic stand-in for FaceDetector.run_network: every
    pixel value >= 250 is a marker id; each marker's bbox becomes a
    detection with conf = value/255. Componentization is exact because
    each marker uses a distinct value."""
    from face_detection_multi_scale_tpu.ops import nms as NMS

    def run(images_u8, _record=True):
        images = np.asarray(images_u8)
        bs = images.shape[0]
        boxes = np.zeros((bs, max_det, 4), np.float32)
        scores = np.zeros((bs, max_det), np.float32)
        classes = np.zeros((bs, max_det), np.float32)
        valid = np.zeros((bs, max_det), bool)
        n_gated = np.zeros((bs,), np.int32)
        for b in range(bs):
            ch = images[b, :, :, 0]
            k = 0
            for v in range(255, 249, -1):
                ys, xs = np.nonzero(ch == v)
                if len(ys) == 0:
                    continue
                boxes[b, k] = [xs.min(), ys.min(), xs.max() + 1,
                               ys.max() + 1]
                scores[b, k] = v / 255.0
                valid[b, k] = True
                k += 1
            n_gated[b] = k
        return NMS.Detections(boxes=boxes, scores=scores,
                              classes=classes,
                              extras=np.zeros((bs, max_det, 0),
                                              np.float32),
                              valid=valid, n_gated=n_gated)

    return run


def _marker_image():
    """256x256 BGR frame with distinct-valued square markers, none
    touching a tile edge (x/y = 64 or 192 for the grid-2/halo-64 plan),
    one straddling the ownership bound at 128."""
    img = np.full((256, 256, 3), 20, np.uint8)
    spots = [(255, 10, 10), (254, 150, 150), (253, 124, 124),
             (252, 40, 170), (251, 200, 30)]
    for v, y, x in spots:
        img[y:y + 7, x:x + 7] = v
    return img, len(spots)


@pytest.fixture(scope="module")
def tiled_detector():
    from face_detection_multi_scale_tpu.infer.detector import FaceDetector
    det = FaceDetector("yolov7-lite-t", img_sizes=(256,),
                       conf_thres=0.1, iou_thres=0.5,
                       tile_top_scale=2, tile_halo=64,
                       tile_min_size=256)
    det.run_network = _marker_mock_run_network(det.max_det)
    return det


class TestDetectorTiling:
    def test_batch_tiled_equals_untiled(self, tiled_detector):
        det = tiled_detector
        img, n = _marker_image()
        det.tile_grid = 2
        tiled = det.detect_multi_scale_batch([img])[0]
        det.tile_grid = 0
        untiled = det.detect_multi_scale_batch([img])[0]
        assert len(tiled) == len(untiled) == n
        order = lambda r: r[np.argsort(r[:, 4])]
        np.testing.assert_allclose(order(tiled), order(untiled))

    def test_single_scale_api_tiled_equals_untiled(self, tiled_detector):
        det = tiled_detector
        img, n = _marker_image()
        det.use_api_preprocess = True
        try:
            det.tile_grid = 2
            tiled, shape_t, _ = det.detect_single_scale(img, 256)
            det.tile_grid = 0
            untiled, shape_u, _ = det.detect_single_scale(img, 256)
        finally:
            det.use_api_preprocess = False
        assert shape_t == shape_u
        assert len(tiled) == len(untiled) == n
        order = lambda r: r[np.argsort(r[:, 4])]
        np.testing.assert_allclose(order(tiled), order(untiled))

    def test_plan_gating(self, tiled_detector):
        det = tiled_detector
        det.tile_grid = 2
        assert det._tile_plan(256) is not None
        assert det._tile_plan(128) is None     # below tile_min_size
        det.tile_grid = 0
        assert det._tile_plan(256) is None

    def test_detect_batch_tiled_equals_untiled(self, tiled_detector):
        # the single-scale throughput path (cli/detect.py) tiles too
        det = tiled_detector
        img, n = _marker_image()
        det.tile_grid = 2
        tiled = det.detect_batch([img, img], 256, kpt=False)
        det.tile_grid = 0
        untiled = det.detect_batch([img, img], 256, kpt=False)
        for t, u in zip(tiled, untiled):
            assert len(t) == len(u) == n
            order = lambda r: r[np.argsort(r[:, 4])]
            np.testing.assert_allclose(order(t), order(u))

    def test_grid1_rejected_at_construction(self):
        from face_detection_multi_scale_tpu.infer.detector import (
            FaceDetector)
        with pytest.raises(ValueError, match="tile_top_scale=1"):
            FaceDetector("yolov7-lite-t", tile_top_scale=1)

    def test_truncation_telemetry_per_image(self, tiled_detector):
        # a tiled image must count as ONE report entry, not g^2 tiles
        det = tiled_detector
        det.tile_grid = 2
        before = det.truncation_report()["images"]
        img, _ = _marker_image()
        det.detect_multi_scale_batch([img])
        after = det.truncation_report()["images"]
        assert after - before == 1

    def test_standard_per_image_warns_once(self, tiled_detector):
        det = tiled_detector
        det.tile_grid = 2
        det._warned_tile_standard = False
        img, _ = _marker_image()
        assert not det.use_api_preprocess
        with pytest.warns(RuntimeWarning, match="tile_top_scale is "
                                                "inert"):
            det.detect_single_scale(img, 256)
        # second call: silent (warn-once)
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            det.detect_single_scale(img, 256)
