"""TritonRemoteModel vs an in-process mock KServe-v2 server
(reference utils/triton.py surface; protocol implemented from scratch)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from adaptiveisp_tpu.serve.triton import (
    TritonRemoteModel,
    _decode_infer_response,
    _encode_infer_request,
)

MODEL = {
    "name": "toydet",
    "backend": "stablehlo",
    "inputs": [{"name": "images", "datatype": "FP32",
                "shape": [1, 8, 8, 3]}],
    "outputs": [{"name": "doubled", "datatype": "FP32",
                 "shape": [1, 8, 8, 3]},
                {"name": "sum", "datatype": "FP32", "shape": [1]}],
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, body: bytes, ctype="application/json", extra=None):
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        assert self.path == "/v2/models/toydet"
        self._send(json.dumps(MODEL).encode())

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        body = self.rfile.read(n)
        if self.path == "/v2/repository/index":
            self._send(json.dumps([{"name": "toydet"}]).encode())
            return
        assert self.path == "/v2/models/toydet/infer"
        hlen = int(self.headers["Inference-Header-Content-Length"])
        meta = json.loads(body[:hlen])
        (inp,) = meta["inputs"]
        assert inp["name"] == "images" and inp["datatype"] == "FP32"
        bsize = inp["parameters"]["binary_data_size"]
        x = np.frombuffer(body[hlen:hlen + bsize],
                          np.float32).reshape(inp["shape"])
        doubled = (x * 2.0 + 1.0).astype(np.float32)
        total = np.asarray([x.sum()], np.float32)
        # respond: first output binary, second JSON-embedded (both legal)
        blob = doubled.tobytes()
        hdr = json.dumps({"outputs": [
            {"name": "doubled", "datatype": "FP32",
             "shape": list(doubled.shape),
             "parameters": {"binary_data_size": len(blob)}},
            {"name": "sum", "datatype": "FP32", "shape": [1],
             "data": [float(total[0])]},
        ]}).encode()
        self._send(hdr + blob, "application/octet-stream",
                   {"Inference-Header-Content-Length": str(len(hdr))})


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_discovers_model_and_metadata(server):
    m = TritonRemoteModel(server)
    assert m.model_name == "toydet"
    assert m.runtime == "stablehlo"
    assert m.input_names == ["images"]


def test_infer_positional_and_kwargs(server):
    m = TritonRemoteModel(server)
    x = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    doubled, total = m(x)
    np.testing.assert_allclose(doubled, x * 2 + 1, rtol=1e-6)
    np.testing.assert_allclose(total, [x.sum()], rtol=1e-5)
    d2, t2 = m(images=x)
    np.testing.assert_array_equal(doubled, d2)


def test_input_validation(server):
    m = TritonRemoteModel(server)
    x = np.zeros((1, 8, 8, 3), np.float32)
    with pytest.raises(RuntimeError):
        m()
    with pytest.raises(RuntimeError):
        m(x, images=x)
    with pytest.raises(RuntimeError):
        m(x, x)


def test_grpc_rejected_clearly():
    with pytest.raises(NotImplementedError):
        TritonRemoteModel("grpc://localhost:8001")


def test_wire_roundtrip():
    x = {"a": np.arange(6, dtype=np.int32).reshape(2, 3),
         "b": np.ones((4,), np.float16)}
    body, hlen = _encode_infer_request(x)
    meta = json.loads(body[:hlen])
    assert [i["name"] for i in meta["inputs"]] == ["a", "b"]
    # reinterpret the request as a response to exercise the decoder
    resp_meta = json.dumps({"outputs": meta["inputs"]}).encode()
    decoded = _decode_infer_response(
        (resp_meta + body[hlen:],
         {"Inference-Header-Content-Length": str(len(resp_meta))}))
    np.testing.assert_array_equal(decoded["a"], x["a"])
    np.testing.assert_array_equal(decoded["b"], x["b"])
