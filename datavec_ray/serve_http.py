"""HTTP transport for the inference-server engine.

Parity target: the reference's REST server + client —
``datavec-spark-inference-parent/.../CSVSparkTransformServer.java:33-192``
(GET/POST /transformprocess hot-swaps the pipeline JSON, POST
/transform runs a batch, POST /transformincremental runs one record)
and ``.../client/DataVecTransformClient.java:21``.

Implementation: stdlib ``http.server`` (threaded) wrapping
``datavec_ray.serve.IncrementalTransformer`` — no web framework in
this container. A production deployment would mount the same engine in
Ray Serve; the endpoint contract below is transport-agnostic.

JSON bodies:
    POST /transformprocess   pipeline JSON (TransformPipeline serde)
    GET  /transformprocess   → current pipeline JSON
    POST /transform          {"records": [{...}, ...]} → {"records": [...]}
    POST /transformincremental {"record": {...}} → {"record": {...} | null}
    GET  /health             → {"ok": true, "has_pipeline": bool}

Image endpoints (ImageSparkTransformServer.java:33 —
SingleImageRecord/BatchImageRecord → Base64NDArrayBody; the sandbox
variant ships image BYTES base64-inline instead of a URI, decoded by
the REAL pure-stdlib PNG/BMP codecs):
    POST /imagetransformprocess  {"h":H,"w":W,"steps":[...]} hot-swap
    GET  /imagetransformprocess  → current image-pipeline config
    POST /transformimage         {"images": [b64, ...]} →
                                 {"base64","dtype","shape"} (N,h',w')
    POST /transformimageincremental {"image": b64} → same, (h',w')
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional
from urllib import request as _urlreq

from datavec_ray.serve import IncrementalTransformer


class ImagePipelineEngine:
    """Server-side image pipeline: base64 image bytes → REAL PNG/BMP
    decode → grayscale resize → optional ImageAugmentChain → float32
    stack. (ImageSparkTransform.java semantics on the repo's codecs.)"""

    def __init__(self, config: dict):
        import numpy as np
        import pyarrow as pa

        from datavec_ray.ops.multimodal import (ImageAugmentChain,
                                                ImageDecodeResize)
        self.config = dict(config)
        h = int(config.get("h", 8))
        w = int(config.get("w", 8))
        self._np, self._pa = np, pa
        self.decoder = ImageDecodeResize(h, w, deterministic_fake=False)
        steps = config.get("steps") or []
        self.chain = ImageAugmentChain(steps, h, w,
                                       seed=int(config.get("seed", 0))) \
            if steps else None

    def transform(self, payloads: list[bytes]):
        np, pa = self._np, self._pa
        from datavec_ray.hll import hash64
        batch = pa.table({
            "media_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * len(payloads), pa.int32()),
            "height": pa.array([0] * len(payloads), pa.int32()),
        })
        feat = self.decoder(batch)["image_feat"].combine_chunks()
        mat = np.asarray(feat.flatten().to_numpy(zero_copy_only=False),
                         np.float32).reshape(len(payloads), self.decoder.h,
                                             self.decoder.w)
        if self.chain is not None:
            ids = hash64(pa.array([p for p in payloads], pa.binary()))
            mat = self.chain.apply_stack(mat.astype(np.float64),
                                         ids).astype(np.float32)
        return mat


class TransformServer:
    """Threaded HTTP server holding one hot-swappable pipeline."""

    def __init__(self, pipeline_json: Optional[str] = None,
                 host: str = "127.0.0.1", port: int = 0):
        self._lock = threading.Lock()
        self._engine: Optional[IncrementalTransformer] = (
            IncrementalTransformer(pipeline_json) if pipeline_json else None)
        self._image_engine: Optional[ImagePipelineEngine] = None
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 - quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length", 0))
                return self.rfile.read(n)

            def do_GET(self):  # noqa: N802
                if self.path == "/health":
                    self._send(200, {"ok": True,
                                     "has_pipeline": outer._engine is not None})
                elif self.path == "/transformprocess":
                    with outer._lock:
                        eng = outer._engine
                    if eng is None:
                        self._send(404, {"error": "no pipeline set"})
                    else:
                        self._send(200, {"pipeline": eng.get_pipeline_json()})
                elif self.path == "/imagetransformprocess":
                    with outer._lock:
                        ieng = outer._image_engine
                    if ieng is None:
                        self._send(404, {"error": "no image pipeline set"})
                    else:
                        self._send(200, {"config": ieng.config})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):  # noqa: N802
                try:
                    raw = self._body()
                    if self.path == "/transformprocess":
                        with outer._lock:
                            outer._engine = IncrementalTransformer(raw.decode())
                        self._send(200, {"ok": True})
                        return
                    if self.path == "/imagetransformprocess":
                        with outer._lock:
                            outer._image_engine = ImagePipelineEngine(
                                json.loads(raw.decode()))
                        self._send(200, {"ok": True})
                        return
                    if self.path in ("/transformimage",
                                     "/transformimageincremental"):
                        import base64
                        with outer._lock:
                            ieng = outer._image_engine
                        if ieng is None:
                            self._send(409, {"error": "no image pipeline set"})
                            return
                        payload = json.loads(raw.decode())
                        single = self.path.endswith("incremental")
                        b64s = [payload["image"]] if single \
                            else payload["images"]
                        mat = ieng.transform(
                            [base64.b64decode(b) for b in b64s])
                        if single:
                            mat = mat[0]
                        self._send(200, {
                            "base64": base64.b64encode(mat.tobytes()).decode(),
                            "dtype": "float32", "shape": list(mat.shape)})
                        return
                    with outer._lock:
                        eng = outer._engine
                    if eng is None:
                        self._send(409, {"error": "no pipeline set"})
                        return
                    payload = json.loads(raw.decode())
                    if self.path == "/transform":
                        out = eng.transform_batch(payload["records"])
                        self._send(200, {"records": out})
                    elif self.path == "/transformarray":
                        import base64
                        mat, cols = eng.transform_array(payload["records"])
                        self._send(200, {
                            "base64": base64.b64encode(mat.tobytes()).decode(),
                            "dtype": "float32", "shape": list(mat.shape),
                            "columns": cols})
                    elif self.path == "/transformincremental":
                        out = eng.transform_record(payload["record"])
                        self._send(200, {"record": out})
                    else:
                        self._send(404, {"error": f"unknown path {self.path}"})
                except Exception as e:  # noqa: BLE001 - report to the client
                    self._send(400, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "TransformServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


class TransformClient:
    """HTTP client for TransformServer (DataVecTransformClient parity)."""

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _call(self, method: str, path: str, payload=None,
              raw_body: Optional[bytes] = None) -> dict:
        data = raw_body if raw_body is not None else (
            json.dumps(payload).encode() if payload is not None else None)
        req = _urlreq.Request(self.base + path, data=data, method=method,
                              headers={"Content-Type": "application/json"})
        with _urlreq.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    def health(self) -> dict:
        return self._call("GET", "/health")

    def set_pipeline(self, pipeline_json: str) -> dict:
        return self._call("POST", "/transformprocess",
                          raw_body=pipeline_json.encode())

    def get_pipeline(self) -> str:
        return self._call("GET", "/transformprocess")["pipeline"]

    def transform(self, records: list[dict[str, Any]]) -> list[dict]:
        return self._call("POST", "/transform",
                          {"records": records})["records"]

    def transform_array(self, records: list[dict[str, Any]]):
        """→ (float32 ndarray, numeric column names)."""
        import base64

        import numpy as np
        r = self._call("POST", "/transformarray", {"records": records})
        mat = np.frombuffer(base64.b64decode(r["base64"]),
                            dtype=r["dtype"]).reshape(r["shape"])
        return mat, r["columns"]

    def transform_incremental(self, record: dict[str, Any]) -> Optional[dict]:
        return self._call("POST", "/transformincremental",
                          {"record": record})["record"]

    # -- image endpoints (ImageSparkTransformServer parity) ---------------
    def set_image_pipeline(self, config: dict) -> dict:
        """config: {"h":H, "w":W, "steps":[ImageAugmentChain steps],
        "seed": int}"""
        return self._call("POST", "/imagetransformprocess", config)

    def get_image_pipeline(self) -> dict:
        return self._call("GET", "/imagetransformprocess")["config"]

    def _decode_array(self, r: dict):
        import base64

        import numpy as np
        return np.frombuffer(base64.b64decode(r["base64"]),
                             dtype=r["dtype"]).reshape(r["shape"])

    def transform_image(self, images: list[bytes]):
        """PNG/BMP byte payloads → (N, h', w') float32 array."""
        import base64
        r = self._call("POST", "/transformimage", {
            "images": [base64.b64encode(b).decode() for b in images]})
        return self._decode_array(r)

    def transform_image_incremental(self, image: bytes):
        """One PNG/BMP payload → (h', w') float32 array
        (SingleImageRecord → Base64NDArrayBody)."""
        import base64
        r = self._call("POST", "/transformimageincremental", {
            "image": base64.b64encode(image).decode()})
        return self._decode_array(r)
