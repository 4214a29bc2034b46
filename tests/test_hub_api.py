"""AutoShape/Detections hub API (reference models/common.py:623-837)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def detector():
    from adaptiveisp_tpu import api
    from adaptiveisp_tpu.detect.spec import YOLOV3_TINY_SPEC

    return api.load_detector(spec=YOLOV3_TINY_SPEC)


def test_autoshape_accepts_mixed_sources(detector, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    arr_f = rng.rand(40, 60, 3).astype(np.float32)
    arr_u8 = (rng.rand(30, 50, 3) * 255).astype(np.uint8)
    pil = Image.fromarray(arr_u8)
    p = str(tmp_path / "x.png")
    pil.save(p)

    res = detector([arr_f, arr_u8, pil, p], size=64, conf_thres=0.001)
    assert len(res) == 4
    assert res.paths[3] == p
    # boxes live in original coordinates
    for im, det in zip(res.ims, res.xyxy):
        h, w = im.shape[:2]
        if det.shape[0]:
            assert det[:, [0, 2]].max() <= w + 1e-3
            assert det[:, [1, 3]].max() <= h + 1e-3
    assert isinstance(repr(res), str) and "image 0/4" in repr(res)


def test_detections_accessors(detector, tmp_path):
    rng = np.random.RandomState(1)
    res = detector(rng.rand(48, 48, 3).astype(np.float32), size=64,
                   conf_thres=0.001)
    dicts = res.to_dicts()
    assert len(dicts) == 1
    for d in dicts[0]:
        assert set(d) == {"xmin", "ymin", "xmax", "ymax", "confidence",
                          "class", "name"}
    rendered = res.render()
    assert rendered[0].shape == (48, 48, 3) and rendered[0].dtype == np.uint8
    saved = res.save(str(tmp_path / "out"))
    assert len(saved) == 1
    crops = res.crop()
    for c in crops:
        assert c["im"].ndim == 3 and c["im"].size > 0


def test_rest_serving(detector, tmp_path):
    """POST an image to the stdlib REST shim, get detection JSON back
    (reference utils/flask_rest_api capability)."""
    import io
    import json
    import urllib.request

    from PIL import Image

    from adaptiveisp_tpu.serve.rest import ROUTE, DetectionServer

    srv = DetectionServer(detector, port=0, size=64,
                          conf_thres=0.001).start()
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/healthz", timeout=30) as r:
            assert json.load(r) == {"status": "ok"}
        # predict
        rng = np.random.RandomState(2)
        buf = io.BytesIO()
        Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
            buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{ROUTE}", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert isinstance(out, list)
        for d in out:
            assert set(d) == {"xmin", "ymin", "xmax", "ymax", "confidence",
                              "class", "name"}
        # bad payload -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{ROUTE}", data=b"not an image")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_named_constructors_and_custom(tmp_path):
    """hubconf-style entries (reference hubconf.py:68-135)."""
    import numpy as np

    from adaptiveisp_tpu import api

    det = api.yolov3_tiny(classes=3)
    assert isinstance(det, api.Detector)
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    res = det(img, size=64, conf_thres=0.5)
    assert len(res) == 1
    # TTA flag threads through the named constructor
    det_tta = api.yolov3_tiny(classes=3, augment=True)
    assert det_tta.augment
    # custom(path): round-trip a variables pickle
    import pickle

    p = tmp_path / "w.pkl"
    with open(p, "wb") as f:
        pickle.dump(
            {k: v for k, v in det.variables.items()}, f)
    det2 = api.custom(str(p), spec=det.spec)
    assert isinstance(det2, api.Detector)
