"""Streaming source loaders (images / video / dispatch) + CLI smoke.

Capability tests for the reference LoadImages/LoadStreams surface
(/root/reference/yolov3/utils/dataloaders.py:190-427).
"""

import os

import numpy as np
import pytest

from adaptiveisp_tpu.data.sources import (
    ImageSource,
    VideoSource,
    open_source,
)

RNG = np.random.RandomState(11)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("media")
    for i in range(3):
        arr = (RNG.rand(32, 48, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img{i}.png")

    import cv2

    vid = str(root / "clip.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (48, 32))
    assert w.isOpened()
    for i in range(10):
        frame = np.full((32, 48, 3), i * 20, np.uint8)
        w.write(frame)
    w.release()
    return str(root)


def test_image_source_dir(media_dir):
    src = ImageSource(media_dir)
    frames = list(src)
    assert len(frames) == 3
    name, frame, meta = frames[0]
    assert name == "img0.png"
    assert frame.dtype == np.float32 and frame.shape == (32, 48, 3)
    assert 0.0 <= frame.min() and frame.max() <= 1.0
    assert meta["kind"] == "image" and meta["total"] == 3


def test_image_source_single_file(media_dir):
    src = ImageSource(os.path.join(media_dir, "img1.png"))
    assert len(src) == 1
    assert next(iter(src))[0] == "img1.png"


def test_image_source_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ImageSource(str(tmp_path / "empty_dir_nope"))


def test_video_source_frames(media_dir):
    src = VideoSource(os.path.join(media_dir, "clip.avi"))
    frames = list(src)
    assert len(frames) == 10
    name, frame, meta = frames[3]
    assert name == "clip:f000003"
    assert frame.dtype == np.float32 and frame.shape == (32, 48, 3)
    assert meta["kind"] == "video" and meta["fps"] == pytest.approx(10.0)
    # MJPG is lossy; brightness must still be monotone over the ramp
    means = [f.mean() for _, f, _ in frames]
    assert all(b > a for a, b in zip(means, means[1:]))


def test_video_source_stride(media_dir):
    src = VideoSource(os.path.join(media_dir, "clip.avi"), vid_stride=3)
    names = [n for n, _, _ in src]
    assert names == ["clip:f000000", "clip:f000003", "clip:f000006",
                     "clip:f000009"]


def test_open_source_dispatch(media_dir):
    assert isinstance(open_source(media_dir), ImageSource)
    assert isinstance(open_source(os.path.join(media_dir, "img0.png")),
                      ImageSource)
    assert isinstance(open_source(os.path.join(media_dir, "clip.avi")),
                      VideoSource)


def test_detect_cli_on_video(media_dir, tmp_path, monkeypatch):
    """End-to-end CLI over a video source (random detector weights)."""
    import detect_cli

    save_dir = str(tmp_path / "runs")
    detect_cli.main([
        "--source", os.path.join(media_dir, "clip.avi"),
        "--weights", "/nonexistent.pt",  # falls back to random init
        "--imgsz", "64", "--vid_stride", "5",
        "--save_dir", save_dir, "--save_txt",
    ])
    # one txt per emitted frame (stride 5 over 10 frames -> f0 and f5)
    files = sorted(os.listdir(save_dir))
    assert files == ["clip_f000000.txt", "clip_f000005.txt"]
