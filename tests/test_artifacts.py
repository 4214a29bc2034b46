"""Artifact resolver / download kit (reference utils/downloads.py)."""

import os
import zipfile

import pytest

from adaptiveisp_tpu.data.artifacts import (
    artifact_cache, download, is_url, resolve_artifact, safe_download)


def test_is_url():
    assert is_url("https://example.com/w.pt")
    assert is_url("file:///tmp/w.pt")
    assert not is_url("weights/w.pt")
    assert not is_url("w.pt")
    assert not is_url("")


def test_resolve_existing_path(tmp_path):
    f = tmp_path / "w.pkl"
    f.write_bytes(b"x" * 10)
    assert resolve_artifact(str(f)) == str(f)


def test_resolve_via_search_dirs(tmp_path):
    d = tmp_path / "zoo"
    d.mkdir()
    (d / "yolov3.pkl").write_bytes(b"x" * 10)
    got = resolve_artifact("some/other/prefix/yolov3.pkl",
                           search_dirs=[str(d)])
    assert got == str(d / "yolov3.pkl")


def test_resolve_via_env_root(tmp_path, monkeypatch):
    d = tmp_path / "staged"
    d.mkdir()
    (d / "agent.ckpt").write_bytes(b"x")
    monkeypatch.setenv("ADAPTIVEISP_ARTIFACTS", str(d))
    assert resolve_artifact("agent.ckpt") == str(d / "agent.ckpt")


def test_resolve_missing_raises_with_roots(tmp_path, monkeypatch):
    monkeypatch.setenv("ADAPTIVEISP_ARTIFACTS", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="nonexistent.pt"):
        resolve_artifact("nonexistent.pt", download=False)


def test_cache_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("ADAPTIVEISP_CACHE", str(tmp_path / "cache"))
    assert artifact_cache() == str(tmp_path / "cache")


def test_safe_download_file_url(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"y" * 64)
    dst = tmp_path / "out" / "dst.bin"
    got = safe_download(dst, src.as_uri(), min_bytes=32)
    assert got == str(dst) and dst.read_bytes() == b"y" * 64


def test_safe_download_min_bytes_removes_partial(tmp_path):
    src = tmp_path / "small.bin"
    src.write_bytes(b"z")
    dst = tmp_path / "dst.bin"
    with pytest.raises(FileNotFoundError):
        safe_download(dst, src.as_uri(), min_bytes=100, retries=2)
    assert not dst.exists()  # partial removed (downloads.py:70-79)


def test_safe_download_url2_fallback(tmp_path):
    good = tmp_path / "good.bin"
    good.write_bytes(b"k" * 32)
    dst = tmp_path / "dst.bin"
    got = safe_download(dst, (tmp_path / "missing.bin").as_uri(),
                        url2=good.as_uri(), retries=2)
    assert got == str(dst) and dst.read_bytes() == b"k" * 32


def test_resolve_url_downloads_to_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("ADAPTIVEISP_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "weights.pkl"
    src.write_bytes(b"w" * 16)
    got = resolve_artifact(src.as_uri())
    assert got == str(tmp_path / "cache" / "weights.pkl")
    assert open(got, "rb").read() == b"w" * 16
    # second resolve hits the cache, not the "network"
    src.unlink()
    assert resolve_artifact(src.as_uri()) == got


def test_batch_download_with_unzip(tmp_path):
    z = tmp_path / "bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner/a.txt", "hello")
    out_dir = tmp_path / "out"
    got = download([z.as_uri()], dir=out_dir, unzip=True)
    assert got == [str(out_dir / "bundle.zip")]
    assert (out_dir / "inner" / "a.txt").read_text() == "hello"


def test_load_yolo_variables_uses_artifact_roots(tmp_path, monkeypatch):
    """train_isp weight loading searches the artifact roots."""
    import pickle

    import train_isp

    staged = tmp_path / "zoo"
    staged.mkdir()
    payload = {"params": {"w": [1.0]}, "batch_stats": {}}
    with open(staged / "conv.pkl", "wb") as f:
        pickle.dump(payload, f)
    monkeypatch.setenv("ADAPTIVEISP_ARTIFACTS", str(staged))
    got = train_isp.load_yolo_variables("conv.pkl")
    assert got is not None and "params" in got
