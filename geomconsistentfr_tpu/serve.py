"""Production-style serving layer: HTTP relighting endpoint with batching.

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

Request handling is threaded (decode/encode and socket IO run concurrently);
device work funnels through a micro-batching executor that coalesces
concurrent /relight requests into one padded device batch (TPU serving
batches are fixed-shape, so only two shapes ever compile: batch 1 for idle
traffic and --max-batch for bursts). The single worker thread also
serializes device access, which the exclusive TPU requires.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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


class MicroBatcher:
    """Coalesce concurrent relight requests into one padded device batch.

    submit() blocks the calling handler thread until its slice of the
    batched forward is ready. The worker drains the queue for up to
    window_ms after the first request, pads the batch to a fixed size
    (one compiled shape per bucket: 1 or max_batch), runs one forward,
    and scatters the per-request outputs back through Futures.
    """

    def __init__(self, relighter, max_batch: int = 8, window_ms: float = 4.0):
        self.relighter = relighter
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, image, mask, light, ambient):
        """image (H,W,3), mask (H,W), light (3,), ambient scalar -> outputs."""
        fut: Future = Future()
        self._queue.put((image, mask, light, ambient, fut))
        return fut.result()

    def _worker(self):
        while True:
            items = [self._queue.get()]
            deadline = time.monotonic() + self.window_s
            while len(items) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    items.append(self._queue.get(timeout=timeout))
                except queue.Empty:
                    break
            n = len(items)
            # Fixed-shape buckets keep the number of compiled programs at 2.
            padded = n if n == 1 else self.max_batch
            try:
                def stack(i):
                    rows = [it[i] for it in items]
                    rows += [rows[-1]] * (padded - n)
                    return np.stack(rows).astype(np.float32)

                out = self.relighter.forward(
                    stack(0),
                    stack(1),
                    target_light=stack(2),
                    target_ambient=stack(3),
                )
                rendered = np.asarray(out.rendered)
                weights = np.asarray(out.shadow_mask_weights)
                for k, (_, _, _, _, fut) in enumerate(items):
                    fut.set_result((rendered[k], weights[k]))
            except Exception as e:  # noqa: BLE001 - propagate to each caller
                for *_, fut in items:
                    if not fut.done():
                        fut.set_exception(e)


def make_handler(relighter, batcher: MicroBatcher | None = None):
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
                    ambient = np.float32(req.get("ambient", DEFAULT_AMBIENT))
                    if batcher is not None:
                        rendered, weights = batcher.submit(
                            image, mask, light[0], ambient
                        )
                    else:
                        out = relighter.forward(
                            image[None], mask[None],
                            target_light=light,
                            target_ambient=ambient[None],
                        )
                        rendered = np.asarray(out.rendered[0])
                        weights = np.asarray(out.shadow_mask_weights[0])
                    mask3 = np.repeat(mask[..., None], 3, -1)
                    self._json(
                        200,
                        {
                            "rendered": _encode_image(rendered * mask3),
                            "shadow_mask": _encode_image(weights * mask),
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
    parser.add_argument("--max-batch", type=int, default=8,
                        help="micro-batch size for coalesced /relight requests")
    parser.add_argument("--batch-window-ms", type=float, default=4.0,
                        help="how long to wait for more requests after the first")
    args = parser.parse_args(argv)

    from geomconsistentfr_tpu.config import PRESETS
    from geomconsistentfr_tpu.infer import load_relighter

    relighter = load_relighter(args.checkpoint, cfg=PRESETS[args.preset]())
    batcher = MicroBatcher(
        relighter, max_batch=args.max_batch, window_ms=args.batch_window_ms
    )
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(relighter, batcher)
    )
    print(json.dumps({"serving": f"http://{args.host}:{args.port}"}), flush=True)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
