"""COCO-JSON dump and convenience API tests."""

import json

import numpy as np
import jax
import pytest

from adaptiveisp_tpu.eval.coco_json import (
    COCO80_TO_91, detections_to_coco, image_id_from_path, save_predictions)


def test_image_id_from_path():
    assert image_id_from_path("/a/b/000000012345.jpg") == 12345
    assert image_id_from_path("/a/b/2.png") == 2
    assert image_id_from_path("/a/b/frame_01.png") == "frame_01"


def test_detections_to_coco_xywh():
    det = np.array([[10, 20, 50, 80, 0.9, 0],
                    [0, 0, 10, 10, 0.5, 2]], np.float32)
    recs = detections_to_coco("/imgs/42.png", det, class_map=COCO80_TO_91)
    assert len(recs) == 2
    assert recs[0]["image_id"] == 42
    assert recs[0]["category_id"] == 1  # person: 80-idx 0 -> coco 91-id 1
    assert recs[0]["bbox"] == [10.0, 20.0, 40.0, 60.0]  # xyxy -> xywh
    assert recs[1]["category_id"] == 3  # car
    # empty detections
    assert detections_to_coco("/x/1.png", np.zeros((0, 6), np.float32)) == []


def test_save_predictions(tmp_path):
    recs = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 1, 1],
             "score": 0.5}]
    p = save_predictions(recs, str(tmp_path))
    assert json.load(open(p)) == recs


def test_api_adaptive_isp_and_detector():
    import adaptiveisp_tpu.api as api

    rng = np.random.RandomState(0)
    imgs = rng.rand(1, 64, 64, 3).astype(np.float32)
    isp = api.load_adaptive_isp(imgsz=64, steps=2)
    out = isp.process(imgs)
    assert out.shape == imgs.shape
    # forced pipeline
    out2 = isp.process(imgs, pipeline=[0, 9])
    assert out2.shape == imgs.shape
    trace = isp.process_with_trace(imgs)
    assert trace.selected.shape == (2, 1)

    spec = {
        "nc": 4,
        "anchors": [[10, 14, 23, 27, 37, 58]],
        "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],
        "head": [[[3], 1, "Detect", ["nc", "anchors"]]],
    }
    det = api.load_detector(spec=spec)
    boxes, nvalid = det.detect(imgs)
    assert boxes.shape[0] == 1 and boxes.shape[2] == 6
