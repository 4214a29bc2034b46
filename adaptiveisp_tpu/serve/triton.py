"""Triton Inference Server client — stdlib KServe-v2 HTTP implementation.

Counterpart of the reference TritonRemoteModel
(/root/reference/yolov3/utils/triton.py:11-85), which wraps the external
`tritonclient` package.  That package isn't shipped here (zero-egress
build), so this speaks Triton's wire protocol directly: the KServe v2
HTTP/REST inference protocol (`/v2/models/...`), including the binary
tensor extension both for request inputs and response outputs — pure
stdlib (urllib + json), numpy in/out instead of torch tensors.

    model = TritonRemoteModel("http://localhost:8000")   # first repo model
    out = model(np.zeros((1, 640, 640, 3), np.float32))  # positional
    out = model(images=x)                                # or by input name
"""

from __future__ import annotations

import json
import urllib.request
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

# KServe v2 datatype <-> numpy
_DTYPES = {
    "BOOL": np.bool_, "UINT8": np.uint8, "UINT16": np.uint16,
    "UINT32": np.uint32, "UINT64": np.uint64, "INT8": np.int8,
    "INT16": np.int16, "INT32": np.int32, "INT64": np.int64,
    "FP16": np.float16, "FP32": np.float32, "FP64": np.float64,
}
_NP2DT = {np.dtype(v): k for k, v in _DTYPES.items()}


def _np_dtype(datatype: str):
    try:
        return _DTYPES[datatype]
    except KeyError:
        raise ValueError(f"unsupported Triton datatype {datatype!r}")


class TritonRemoteModel:
    """numpy-in / numpy-out call wrapper over one served model.

    url: ``http://host:port`` (KServe v2 REST).  The reference also
    supports grpc:// via the tritonclient package; gRPC needs protobuf
    codegen that isn't in this container, so http-only — raise clearly.
    """

    def __init__(self, url: str, model_name: Optional[str] = None):
        if "://" not in url:
            url = "http://" + url  # bare host:port
        parsed = urlparse(url)
        if parsed.scheme == "grpc":
            raise NotImplementedError(
                "grpc:// needs the tritonclient package (not shipped); "
                "use the http:// KServe v2 endpoint")
        if parsed.scheme not in ("http", "https"):
            raise ValueError(f"unsupported scheme {parsed.scheme!r}")
        self.base = f"{parsed.scheme}://{parsed.netloc}"
        if model_name is None:
            index = self._post_json("/v2/repository/index", {})
            if not index:
                raise RuntimeError("Triton model repository is empty")
            model_name = index[0]["name"]
        self.model_name = model_name
        self.metadata = self._get_json(f"/v2/models/{model_name}")

    # ------------------------------------------------------------------ #
    @property
    def runtime(self):
        """Model runtime/backend (reference triton.py:52-54)."""
        return self.metadata.get("backend", self.metadata.get("platform"))

    @property
    def input_names(self) -> List[str]:
        return [i["name"] for i in self.metadata["inputs"]]

    def __call__(self, *args: np.ndarray, **kwargs: np.ndarray):
        """Run inference; positional args follow the model's input order,
        kwargs match input names (reference triton.py:56-67).  Returns one
        array, or a tuple in the metadata's output order."""
        if args and kwargs:
            raise RuntimeError(
                "Cannot specify args and kwargs at the same time")
        if not args and not kwargs:
            raise RuntimeError("No inputs provided.")
        inputs = self.metadata["inputs"]
        if args:
            if len(args) != len(inputs):
                raise RuntimeError(
                    f"Expected {len(inputs)} inputs, got {len(args)}.")
            tensors = {i["name"]: np.asarray(v)
                       for i, v in zip(inputs, args)}
        else:
            tensors = {i["name"]: np.asarray(kwargs[i["name"]])
                       for i in inputs}

        body, header = _encode_infer_request(
            tensors, output_names=[o["name"]
                                   for o in self.metadata["outputs"]])
        raw = self._post_raw(
            f"/v2/models/{self.model_name}/infer", body,
            {"Content-Type": "application/octet-stream",
             "Inference-Header-Content-Length": str(header)})
        outputs = _decode_infer_response(raw)
        result = [outputs[o["name"]] for o in self.metadata["outputs"]]
        return result[0] if len(result) == 1 else tuple(result)

    # ------------------------------------------------------------------ #
    def _get_json(self, path: str):
        with urllib.request.urlopen(self.base + path) as r:
            return json.loads(r.read())

    def _post_json(self, path: str, payload):
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            self.base + path, data=data,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def _post_raw(self, path: str, body: bytes, headers: Dict[str, str]):
        req = urllib.request.Request(self.base + path, data=body,
                                     headers=headers)
        with urllib.request.urlopen(req) as r:
            # lowercase the header keys: dict() loses HTTPMessage's
            # case-insensitivity and proxies may rewrite the casing
            return r.read(), {k.lower(): v for k, v in r.headers.items()}


# --------------------------------------------------------------------------- #
# KServe v2 wire format (JSON header + concatenated binary tensor blobs)
# --------------------------------------------------------------------------- #
def _encode_infer_request(tensors: Dict[str, np.ndarray],
                          output_names=None) -> Tuple[bytes, int]:
    """-> (body, json_header_length) with binary_data_size extensions.

    output_names (when given) adds an outputs section requesting
    binary_data — without it Triton JSON-embeds output tensors (failing
    outright for FP16 and bloating large outputs)."""
    header = {"inputs": []}
    if output_names:
        header["outputs"] = [
            {"name": n, "parameters": {"binary_data": True}}
            for n in output_names]
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        blob = arr.tobytes()
        header["inputs"].append({
            "name": name,
            "shape": list(arr.shape),
            "datatype": _NP2DT[arr.dtype],
            "parameters": {"binary_data_size": len(blob)},
        })
        blobs.append(blob)
    hdr = json.dumps(header).encode()
    return hdr + b"".join(blobs), len(hdr)


def _decode_infer_response(raw: Tuple[bytes, Dict[str, str]]
                           ) -> Dict[str, np.ndarray]:
    body, headers = raw
    # case-insensitive header lookup (proxies rewrite casing)
    hlen = next((v for k, v in headers.items()
                 if k.lower() == "inference-header-content-length"), None)
    hlen = int(hlen) if hlen else len(body)
    meta = json.loads(body[:hlen])
    out: Dict[str, np.ndarray] = {}
    offset = hlen
    for o in meta.get("outputs", []):
        shape = [int(s) for s in o["shape"]]
        dt = _np_dtype(o["datatype"])
        bsize = (o.get("parameters") or {}).get("binary_data_size")
        if bsize is not None:
            arr = np.frombuffer(body[offset:offset + bsize], dtype=dt)
            offset += bsize
            out[o["name"]] = arr.reshape(shape)
        else:  # JSON-embedded data
            out[o["name"]] = np.asarray(o["data"], dtype=dt).reshape(shape)
    return out


__all__ = ["TritonRemoteModel"]
