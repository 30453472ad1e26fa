"""Minimal production-style serving layer: HTTP relighting endpoint.

The reference has no serving story (CLI scripts only); this exposes the
Relighter over HTTP for deployment behind a load balancer:

  POST /relight    multipart-free JSON body:
      {"image": <base64 PNG>, "mask": <base64 PNG>,
       "light": [lx, ly, lz] | "light_preset": "multipie_14",
       "ambient": 0.5}
    -> {"rendered": <base64 PNG>, "shadow_mask": <base64 PNG>}
  POST /estimate   {"image": <base64 PNG>} -> {"direction": [...], "ambient": a}
  GET  /healthz    -> ok

Run: python -m geomconsistentfr_tpu.serve --checkpoint model.pth --port 8400
Single-threaded stdlib server; the jitted model executes one request at a
time (the TPU is serialized anyway). For high QPS put batching in front.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def _decode_image(b64: str, size: int = 256) -> np.ndarray:
    import imageio.v2 as imageio

    raw = imageio.imread(io.BytesIO(base64.b64decode(b64)))
    img = np.asarray(raw, np.float64) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    if img.shape[0] != size:
        import cv2

        img = cv2.resize(img, (size, size))
    return img.astype(np.float32)


def _encode_image(img01: np.ndarray) -> str:
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(
        buf, np.clip(np.asarray(img01) * 255, 0, 255).astype(np.uint8), format="png"
    )
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(relighter):
    from geomconsistentfr_tpu.lighting_presets import DEFAULT_AMBIENT, LIGHT_PRESETS

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                if self.path == "/relight":
                    image = _decode_image(req["image"])
                    mask = _decode_image(req["mask"])[..., 0]
                    if "light_preset" in req:
                        light = np.asarray(
                            [LIGHT_PRESETS[req["light_preset"]]], np.float32
                        )
                    else:
                        light = np.asarray([req["light"]], np.float32)
                    ambient = np.asarray(
                        [req.get("ambient", DEFAULT_AMBIENT)], np.float32
                    )
                    out = relighter.forward(
                        image[None], mask[None],
                        target_light=light, target_ambient=ambient,
                    )
                    mask3 = np.repeat(mask[..., None], 3, -1)
                    self._json(
                        200,
                        {
                            "rendered": _encode_image(
                                np.asarray(out.rendered[0]) * mask3
                            ),
                            "shadow_mask": _encode_image(
                                np.asarray(out.shadow_mask_weights[0]) * mask
                            ),
                        },
                    )
                elif self.path == "/estimate":
                    image = _decode_image(req["image"])
                    unit, ambient = relighter.estimate_lighting(image[None])
                    self._json(
                        200,
                        {
                            "direction": [float(v) for v in unit[0]],
                            "ambient": float(ambient[0]),
                        },
                    )
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--preset", default="single_image")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8400)
    args = parser.parse_args(argv)

    from geomconsistentfr_tpu.config import PRESETS
    from geomconsistentfr_tpu.infer import load_relighter

    relighter = load_relighter(args.checkpoint, cfg=PRESETS[args.preset]())
    server = HTTPServer((args.host, args.port), make_handler(relighter))
    print(json.dumps({"serving": f"http://{args.host}:{args.port}"}), flush=True)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
