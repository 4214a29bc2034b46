"""Artifact resolution and download utilities.

Counterpart of the reference's download kit
(/root/reference/yolov3/utils/downloads.py): ``is_url`` / ``safe_download``
(url2 fallback, min-size gate, partial-file cleanup, downloads.py:59-81) /
``attempt_download``-style resolution (downloads.py:83-127) plus the batch
``download(..., unzip=True)`` helper used by dataset YAMLs
(reference utils/general.py download()).

Re-designed for the deployment reality of a TPU pod:

- **Local-first resolution.** ``resolve_artifact`` searches an ordered set
  of local roots (explicit dirs, ``$ADAPTIVEISP_ARTIFACTS``, the artifact
  cache, CWD) before ever considering the network — pods frequently run
  with zero egress, and weights arrive pre-staged on NFS/GCS-fuse mounts.
- **stdlib only.** urllib streams with retries instead of torch.hub /
  requests / a curl subprocess.
- **No GitHub-release probing.** The reference queries the GitHub API for
  release assets; here unknown names raise with the resolution order in
  the message so the failure is actionable offline.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Iterable, Optional, Sequence

DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "adaptiveisp_tpu")


def artifact_cache() -> str:
    """The local artifact cache root (override: $ADAPTIVEISP_CACHE)."""
    return os.environ.get("ADAPTIVEISP_CACHE", DEFAULT_CACHE)


def is_url(s, check: bool = False) -> bool:
    """True if ``s`` parses as a URL (reference downloads.py:15-23).

    ``check=True`` additionally opens the URL to confirm it exists —
    off by default (zero-egress safe).
    """
    try:
        s = str(s)
        r = urllib.parse.urlparse(s)
        if not (r.scheme and (r.netloc or r.scheme == "file")):
            return False
        if check:
            with urllib.request.urlopen(s) as resp:
                return getattr(resp, "status", 200) == 200
        return True
    except Exception:
        return False


def url_getsize(url: str) -> int:
    """Downloadable size in bytes, -1 if unknown (downloads.py:33-36)."""
    req = urllib.request.Request(url, method="HEAD")
    try:
        with urllib.request.urlopen(req) as resp:
            return int(resp.headers.get("content-length", -1))
    except Exception:
        return -1


def safe_download(file, url: str, url2: Optional[str] = None,
                  min_bytes: float = 1.0, retries: int = 3,
                  error_msg: str = "") -> str:
    """Stream ``url`` to ``file``; fall back to ``url2``; remove partial
    files below ``min_bytes`` (reference downloads.py:59-81 semantics)."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    last_err: Optional[Exception] = None
    for attempt in range(max(1, retries)):
        src = url if attempt == 0 or url2 is None else url2
        try:
            with urllib.request.urlopen(src) as resp, open(file, "wb") as f:
                shutil.copyfileobj(resp, f)
            if file.exists() and file.stat().st_size >= min_bytes:
                return str(file)
        except Exception as e:  # noqa: BLE001 - mirror reference fallback
            last_err = e
        if file.exists():
            file.unlink()  # partial download
    raise FileNotFoundError(
        f"download of '{url}' to '{file}' failed or produced "
        f"< {min_bytes} bytes. {error_msg}") from last_err


def resolve_artifact(name, search_dirs: Sequence[str] = (),
                     download: bool = True) -> str:
    """Resolve an artifact name/path/URL to a local file path.

    Order (reference attempt_download, downloads.py:83-127, minus the
    GitHub-API probing):

    1. ``name`` itself as an existing path;
    2. basename of ``name`` under each of ``search_dirs``,
       ``$ADAPTIVEISP_ARTIFACTS`` (``:``-separated), the artifact cache,
       and the CWD;
    3. if ``name`` is a URL and ``download=True``: fetch into the cache.
    """
    s = str(name).strip().replace("'", "")
    p = Path(s)
    if p.is_file():
        return str(p)

    base = Path(urllib.parse.unquote(s)).name.split("?")[0]
    roots: list = list(search_dirs)
    roots += [d for d in os.environ.get(
        "ADAPTIVEISP_ARTIFACTS", "").split(":") if d]
    roots += [artifact_cache(), "."]
    for root in roots:
        cand = Path(root) / base
        if cand.is_file():
            return str(cand)

    if is_url(s):
        if not download:
            raise FileNotFoundError(
                f"'{base}' not found locally and download=False")
        return safe_download(Path(artifact_cache()) / base, s)

    raise FileNotFoundError(
        f"artifact '{s}' not found. Looked for '{base}' in: "
        f"{[str(r) for r in roots]}. Stage the file in one of these "
        f"locations or set $ADAPTIVEISP_ARTIFACTS.")


def download(urls: Iterable[str], dir=".", unzip: bool = True,
             delete: bool = False, retries: int = 3) -> list:
    """Batch download with optional archive extraction (the reference's
    ``utils.general.download`` used by dataset YAML ``download:`` keys).

    Sequential on purpose: artifact pulls on a pod share one NIC, and the
    reference's thread pool only obscures failures.
    """
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    out = []
    for url in ([urls] if isinstance(urls, str) else list(urls)):
        f = dir / (Path(urllib.parse.unquote(str(url))).name.split("?")[0])
        if not f.is_file():
            safe_download(f, str(url), retries=retries)
        if unzip and f.suffix in (".zip", ".tar", ".gz", ".tgz"):
            if f.suffix == ".zip":
                import zipfile

                with zipfile.ZipFile(f) as z:
                    z.extractall(dir)
            else:
                import tarfile

                with tarfile.open(f) as t:
                    t.extractall(dir)
            if delete:
                f.unlink()
        out.append(str(f))
    return out
