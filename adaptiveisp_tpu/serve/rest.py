"""REST detection service — the reference flask demo's capability
(/root/reference/yolov3/utils/flask_rest_api/restapi.py) on the stdlib
http.server (this environment ships no flask; zero extra dependencies).

    POST /v1/object-detection/adaptiveisp   body: image bytes (png/jpeg)
      -> JSON [{xmin, ymin, xmax, ymax, confidence, class, name}, ...]
    GET  /healthz                            -> {"status": "ok"}

Usage:
    python -m adaptiveisp_tpu.serve.rest --port 5000 [--weights w.pkl]
or programmatically:
    srv = DetectionServer(detector, port=0); srv.start()
    ... requests ...
    srv.stop()

Single-worker by design: one device, one compiled graph; the HTTP layer
queues naturally.  Each request is letterboxed to the fixed service size so
the jit compiles exactly once.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np

ROUTE = "/v1/object-detection/adaptiveisp"


def _make_handler(detector, size: int, conf_thres: float, isp=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path.rstrip("/") != ROUTE:
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                from PIL import Image

                im = np.asarray(
                    Image.open(io.BytesIO(raw)).convert("RGB"),
                    np.float32) / 255.0
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            try:
                self._infer(im)
            except Exception as e:
                # inference error -> 5xx JSON instead of a dropped socket
                self._json(500, {"error": f"inference failed: {e}"})

        def _infer(self, im):
            if isp is not None:
                # letterbox FIRST so the ISP rollout always sees the fixed
                # service size (one compile, train/eval input distribution)
                import jax.numpy as jnp

                from adaptiveisp_tpu.data.letterbox import letterbox
                from adaptiveisp_tpu.detect.boxes import scale_boxes

                h0, w0 = im.shape[:2]
                lb, ratio, pad = letterbox(im, size, color=(0, 0, 0),
                                           auto=False)
                x = np.asarray(isp.process(jnp.asarray(lb[None])))[0]
                dets, nvalid = detector.detect(
                    x[None], conf_thres=conf_thres)
                det = np.array(dets[0][:int(nvalid[0])])
                if det.shape[0]:
                    det[:, :4] = scale_boxes((size, size), det[:, :4],
                                             (h0, w0), (ratio, pad))
                payload = [
                    {"xmin": float(d[0]), "ymin": float(d[1]),
                     "xmax": float(d[2]), "ymax": float(d[3]),
                     "confidence": float(d[4]), "class": int(d[5]),
                     "name": detector.names.get(int(d[5]),
                                                str(int(d[5])))}
                    for d in det]
                self._json(200, payload)
                return
            res = detector(im, size=size, conf_thres=conf_thres)
            self._json(200, res.to_dicts()[0])

    return Handler


class DetectionServer:
    """Threaded wrapper so tests and notebooks can run the service."""

    def __init__(self, detector, port: int = 5000, size: int = 512,
                 conf_thres: float = 0.25, isp=None):
        handler = _make_handler(detector, size, conf_thres, isp=isp)
        self.httpd = HTTPServer(("127.0.0.1", port), handler)
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def serve(weights: Optional[str] = None, spec=None, port: int = 5000,
          size: int = 512, conf_thres: float = 0.25,
          isp_weights: Optional[str] = None):
    from adaptiveisp_tpu import api

    detector = api.load_detector(weights=weights, spec=spec)
    isp = api.load_adaptive_isp(isp_weights) if isp_weights else None
    srv = DetectionServer(detector, port=port, size=size,
                          conf_thres=conf_thres, isp=isp)
    print(f"serving on http://127.0.0.1:{srv.port}{ROUTE}")
    srv.start()
    return srv


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--weights", default=None)
    p.add_argument("--spec", default=None,
                   help="yolov3 | yolov3-tiny | yolov5s | spec.yaml "
                        "(e.g. a train run's AutoAnchor-refit spec)")
    p.add_argument("--isp_weights", default=None)
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--conf_thres", type=float, default=0.25)
    args = p.parse_args(argv)
    spec = None
    if args.spec:
        from adaptiveisp_tpu.detect.spec import resolve_spec

        spec = resolve_spec(args.spec)
    srv = serve(weights=args.weights, spec=spec, port=args.port,
                size=args.imgsz, conf_thres=args.conf_thres,
                isp_weights=args.isp_weights)
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
