"""REST demo server smoke: POST an image (multipart and raw body) to
/v1/object-detection and get back the reference Flask demo's JSON record
shape (utils/flask_rest_api/restapi.py:1-37)."""

import json
import sys
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# package-style import: the bare name would collide with the reference
# repo's top-level modules once tests/oracle.py puts /root/reference on
# sys.path
import cli.serve as serve_mod  # noqa: E402

from face_detection_multi_scale_tpu.infer.detector import FaceDetector


@pytest.fixture(scope="module")
def server():
    import argparse

    serve_mod.DETECTOR = FaceDetector(
        "yolov7-lite-t", img_sizes=(128,), conf_thres=0.001,
        max_det=10, max_candidates=128)
    serve_mod.ARGS = argparse.Namespace(img_size=128)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _jpeg_bytes():
    import cv2

    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3),
                                            np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def test_raw_body_post(server):
    req = urllib.request.Request(
        server + "/v1/object-detection/yolov7-lite-t",
        data=_jpeg_bytes(), method="POST",
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        records = json.loads(resp.read())
    assert isinstance(records, list) and records
    assert set(records[0]) == {"xmin", "ymin", "xmax", "ymax",
                               "confidence", "class", "name"}
    assert records[0]["name"] == "face"


def test_multipart_post_and_404(server):
    boundary = b"xBOUNDARYx"
    body = (b"--" + boundary + b"\r\n"
            b'Content-Disposition: form-data; name="image"; '
            b'filename="a.jpg"\r\n'
            b"Content-Type: image/jpeg\r\n\r\n"
            + _jpeg_bytes() + b"\r\n--" + boundary + b"--\r\n")
    req = urllib.request.Request(
        server + "/v1/object-detection/yolov7-lite-t", data=body,
        method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary.decode()}"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        assert json.loads(resp.read())

    bad = urllib.request.Request(server + "/nope", data=b"x",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(bad, timeout=30)
    assert e.value.code == 404
