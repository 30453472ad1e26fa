"""Production-style serving layer: HTTP relighting endpoint with batching.

The reference has no serving story (CLI scripts only); this exposes the
Relighter over HTTP for deployment behind a load balancer:

  POST /relight    multipart-free JSON body:
      {"image": <base64 PNG>, "mask": <base64 PNG>,
       "light": [lx, ly, lz] | "light_preset": "multipie_14",
       "ambient": 0.5, "precision": "draft" (optional per-request tier
       override — e.g. draft previews and high finals from one process;
       requests coalesce per tier, each used tier compiles once),
       "format": "jpeg" (optional response codec, default "png";
       "quality": 90) — JPEG responses cut the dominant serving cost on a
       small host (PNG deflate + base64 was 75% of wall, BENCH_serve.json)
       via the native libjpeg encoder}
    -> {"rendered": <base64 PNG|JPEG>, "shadow_mask": ..., "format": ...}
  POST /estimate   {"image": <base64 PNG>} -> {"direction": [...], "ambient": a}
  POST /transfer   2-pass lighting transfer (test_..._lighting_transfer.py):
      {"image": <base64 PNG>, "reference": <base64 PNG>, "mask": <base64 PNG>}
    -> {"rendered": ..., "shadow_mask": ..., "direction": [...], "ambient": a}
  GET  /healthz    -> ok
  GET  /statz      -> serving counters (requests per endpoint/tier, batch
                      sizes, device seconds) for dashboards/load balancers

Run: python -m geomconsistentfr_tpu.serve --checkpoint model.pth --port 8400

Request handling is threaded (decode/encode and socket IO run concurrently);
ALL device work — /relight and /estimate — funnels through one micro-batching
worker thread, which the exclusive TPU requires. /relight requests coalesce
into one padded device batch (TPU serving batches are fixed-shape, so only
three shapes ever compile: a minimum relight batch for idle traffic,
--max-batch for bursts, and one estimate shape); /estimate runs serialized
between batches. Under backlog (more than --max-batch outstanding) the
worker PIPELINES consecutive batches — batch N+1 is assembled, uploaded and
dispatched while batch N computes and its packed outputs stream back
asynchronously — hiding the per-dispatch tunnel cost (--no-pipeline
restores the serialized loop; statz counts pipelined_batches). With --data-parallel the relighter shards every device batch
across all chips (min batch = chip count; --max-batch a multiple of it).
Handler threads block on a Future with a timeout and return 503 if the
worker wedges or dies, rather than hanging the client forever.
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
from concurrent.futures import TimeoutError as FutTimeout


def _decode_image(b64: str, size: int = 256) -> np.ndarray:
    """Decode a base64 PNG to uint8 RGB. Stays uint8 end to end: the device
    converts to [0, 1] f32 (infer.Relighter), so request uploads cost 1/4
    of the f32 bytes over the host link."""
    import imageio.v2 as imageio

    raw = np.asarray(imageio.imread(io.BytesIO(base64.b64decode(b64))))
    if raw.dtype != np.uint8:
        raw = np.clip(raw, 0, 255).astype(np.uint8)
    if raw.ndim == 2:
        raw = np.stack([raw] * 3, -1)
    if raw.shape[-1] == 4:
        raw = raw[..., :3]
    if raw.shape[0] != size:
        import cv2

        raw = cv2.resize(raw, (size, size))
    return raw


def _encode_image(img: np.ndarray, fmt: str = "png", quality: int = 90) -> str:
    """Encode a uint8 (or float-in-[0,1]) image as base64 PNG or JPEG.

    PNG (lossless) is the default for parity; "format": "jpeg" per request
    trades exactness for host time and payload: PNG deflate + base64 was
    75% of serving wall time on the 1-CPU host (docs/BENCH_serve.json,
    round 4), while the native libjpeg encoder (native/dataloader.cc
    gcfr_encode_jpeg) measures ~1.7 ms vs ~51 ms per 256^2 frame with a
    3-5x smaller payload over the tunnel."""
    import imageio.v2 as imageio

    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img) * 255, 0, 255).astype(np.uint8)
    if fmt == "jpeg":
        try:
            from geomconsistentfr_tpu.data.native_loader import encode_jpeg

            return base64.b64encode(encode_jpeg(img, quality)).decode()
        except Exception:  # noqa: BLE001 - no toolchain/libjpeg -> imageio
            buf = io.BytesIO()
            imageio.imwrite(buf, img, format="jpeg", quality=quality)
            return base64.b64encode(buf.getvalue()).decode()
    buf = io.BytesIO()
    imageio.imwrite(buf, img, format="png")
    return base64.b64encode(buf.getvalue()).decode()


def _parse_format(req: dict) -> tuple[str, int]:
    """Validate optional "format" ('png' | 'jpeg') and "quality" (1-100)."""
    fmt = req.get("format", "png")
    if fmt not in ("png", "jpeg"):
        raise ValueError(f"unknown format {fmt!r} (use 'png' or 'jpeg')")
    quality = int(req.get("quality", 90))
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    return fmt, quality


class WorkerDied(RuntimeError):
    """The device worker thread exited; the server cannot serve device work."""


def _parse_tier(req: dict):
    """Validate an optional per-request "precision" field in the handler
    thread, so a bad value can only 400 its own caller."""
    tier = req.get("precision")
    if tier is None:
        return None
    from geomconsistentfr_tpu.config import PRECISION_TIERS

    if tier not in PRECISION_TIERS:
        raise ValueError(
            f"unknown precision {tier!r} (use one of {PRECISION_TIERS})"
        )
    return tier


class MicroBatcher:
    """Single device-worker thread: coalesces /relight into padded batches
    and serializes /estimate through the same thread (the exclusive TPU
    requires exactly one in-flight program, so ALL device work funnels here).

    submit()/submit_estimate() block the calling handler thread (with a
    timeout) until their slice of the device work is ready. For relights the
    worker drains the queue for up to window_ms after the first request, pads
    the batch to a fixed size (one compiled shape per bucket: 1 or
    max_batch), runs one forward, and scatters per-request outputs back
    through Futures. Estimates run one at a time (single compiled shape).

    When more than max_batch requests are outstanding, consecutive batches
    PIPELINE: the worker dispatches batch N+1 (host stack + uint8 upload +
    device compute) before fetching batch N's packed outputs, so the
    per-batch tunnel cost overlaps device work (pipeline=False disables).
    """

    def __init__(
        self,
        relighter,
        max_batch: int = 8,
        window_ms: float = 4.0,
        request_timeout_s: float = 120.0,
        tier_pool=None,
        pipeline: bool = True,
    ):
        # pipeline: overlap batch N's result fetch with batch N+1's
        # assembly/upload/dispatch (see _worker). False restores the fully
        # serialized dispatch->fetch loop (an A/B and fallback knob).
        # tier_pool: optional callable tier-name -> Relighter used for
        # per-request "precision" overrides; only the worker thread calls
        # it, so a lazily-populated dict inside it needs no locking. The
        # default relighter serves requests without an override.
        self.relighter = relighter
        self._tier_pool = tier_pool
        self.max_batch = max_batch
        # Mesh-sharded relighters need every device batch to be a multiple
        # of their batch-axis size (the whole mesh for 'data', the first
        # axis for 'grid'); idle traffic pads accordingly. Sample-parallel
        # relighters replicate the batch, so any size works.
        mesh = getattr(relighter, "mesh", None)
        mode = getattr(relighter, "parallel", "data")
        if mesh is None or mode == "samples":
            self.min_batch = 1
        elif mode == "grid":
            self.min_batch = mesh.shape[mesh.axis_names[0]]
        else:
            self.min_batch = mesh.size
        if max_batch % self.min_batch:
            what = (
                f"the grid mesh's data-axis size {self.min_batch}"
                if mode == "grid"
                else f"the mesh size {self.min_batch}"
            )
            raise ValueError(f"max_batch {max_batch} must be a multiple of {what}")
        self.window_s = window_ms / 1000.0
        self.request_timeout_s = request_timeout_s
        self.pipeline = pipeline
        self._queue: "queue.Queue" = queue.Queue()
        # Serving counters (GET /statz). Written only by the worker thread;
        # racy point-in-time reads from handler threads are fine under the
        # GIL (single dict item reads/writes are atomic).
        self.stats = {
            "relight_requests": 0,
            "estimate_requests": 0,
            "batches": 0,
            "batched_rows": 0,       # real rows, excluding padding
            "padded_rows": 0,        # rows actually sent to the device
            "device_seconds": 0.0,
            "pipelined_batches": 0,  # batches dispatched while one pended
            "errors": 0,
            "per_tier": {},          # tier -> request count ('' = default)
            "per_format": {},        # response format -> request count
        }
        # per_format is written by HANDLER threads (format is a response-
        # encoding concern, resolved after the device work), so unlike the
        # worker-only counters it takes a lock.
        self._fmt_lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def note_format(self, fmt: str) -> None:
        with self._fmt_lock:
            pf = self.stats["per_format"]
            pf[fmt] = pf.get(fmt, 0) + 1

    def _submit(self, kind: str, payload) -> Future:
        if not self._thread.is_alive():
            raise WorkerDied("device worker thread is not running")
        fut: Future = Future()
        self._queue.put((kind, payload, fut))
        return fut

    def drain(self, timeout_s: float = 30.0) -> bool:
        """Wait until every queued/in-flight device request has resolved.

        Used by graceful shutdown: the HTTP listener stops accepting first,
        then this blocks (up to timeout_s) while the worker finishes what
        was already admitted, so no accepted request is dropped. Returns
        True when the queue fully drained."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if self._queue.unfinished_tasks == 0:
                return True
            time.sleep(0.02)
        return self._queue.unfinished_tasks == 0

    def submit(self, image, mask, light, ambient, tier=None):
        """image (H,W,3), mask (H,W), light (3,), ambient scalar -> outputs.

        tier: optional precision-tier override (requires tier_pool)."""
        if tier is not None and self._tier_pool is None:
            raise ValueError(
                "per-request precision overrides are not enabled on this "
                "server"
            )
        fut = self._submit("relight", (image, mask, light, ambient, tier))
        return fut.result(timeout=self.request_timeout_s)

    def submit_estimate(self, image):
        """image (H,W,3) -> (unit direction (3,), ambient scalar)."""
        fut = self._submit("estimate", image)
        return fut.result(timeout=self.request_timeout_s)

    def _worker(self):
        # Pipelined double-buffering (self.pipeline, default on): after
        # dispatching batch N (device compute + async device->host copy of
        # the packed outputs), the worker goes straight back to the queue;
        # batch N's fetch (and its futures) resolve only once batch N+1 has
        # been dispatched or the queue is momentarily empty. At concurrency
        # <= max_batch nothing changes -- the queue is empty right after
        # each dispatch, so the fetch happens immediately, same as the old
        # serialized loop. Above it, batch N+1's host stack + uint8 upload
        # ride the tunnel while batch N computes, hiding the per-dispatch
        # link cost that dominates small-batch serving on this transport
        # (docs/BENCH_serve.json). At most ONE batch is ever pending, so
        # device memory and queue-order fairness are unchanged.
        pending = None
        while True:
            try:
                kind, payload, fut = self._queue.get(block=pending is None)
            except queue.Empty:
                pending = self._flush(pending)
                continue
            if kind == "estimate":
                # Flush first so earlier relight callers aren't held behind
                # this caller's blocking fetch; uint8 stays uint8
                # (device-side /255).
                pending = self._flush(pending)
                try:
                    self.stats["estimate_requests"] += 1
                    t0 = time.monotonic()
                    batch = np.broadcast_to(
                        payload[None], (self.min_batch, *payload.shape)
                    )
                    unit, ambient = self.relighter.estimate_lighting(batch)
                    self.stats["device_seconds"] += time.monotonic() - t0
                    fut.set_result((unit[0], float(ambient[0])))
                except BaseException as e:  # noqa: BLE001 - never kill the worker
                    self.stats["errors"] += 1
                    if not fut.done():
                        fut.set_exception(
                            e
                            if isinstance(e, Exception)
                            else WorkerDied(repr(e))
                        )
                finally:
                    # After the future resolves, so drain() can't report
                    # empty while a request is still unanswered.
                    self._queue.task_done()
                continue
            gets = 1  # task_done() once per get(), deferred to _flush
            tier = payload[4]
            items = [(payload, fut)]
            deadline = time.monotonic() + self.window_s
            while len(items) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    k2, p2, f2 = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if k2 == "relight" and p2[4] == tier:
                    items.append((p2, f2))
                    gets += 1
                else:
                    # Estimates and different-tier relights don't batch
                    # with this batch: requeue behind it (the worker
                    # handles them next iteration). The re-put registers a
                    # fresh unfinished task, so this get's task_done
                    # happens here, not in _flush.
                    self._queue.put((k2, p2, f2))
                    self._queue.task_done()
                    break
            nxt = self._dispatch_relight_batch(
                items, gets, tier, pipelined=pending is not None
            )
            pending = self._flush(pending)
            if self.pipeline:
                pending = nxt
            else:
                self._flush(nxt)

    def _dispatch_relight_batch(self, items, gets, tier=None, pipelined=False):
        """Stack, upload and dispatch one padded batch; start the async
        device->host copy of the packed outputs. Returns a pending record
        for _flush, or None (futures already failed) on dispatch error."""
        n = len(items)
        # Fixed-shape buckets keep the number of compiled programs at 2
        # (per used precision tier).
        padded = self.min_batch if n <= self.min_batch else self.max_batch
        st = self.stats
        st["relight_requests"] += n
        st["batches"] += 1
        st["batched_rows"] += n
        st["padded_rows"] += padded
        key = tier or ""
        st["per_tier"][key] = st["per_tier"].get(key, 0) + n
        t0 = time.monotonic()
        try:
            relighter = (
                self.relighter if tier is None else self._tier_pool(tier)
            )
            def stack(i):
                # Images/masks arrive uint8 and stay uint8 (device /255);
                # lights/ambients are float.
                rows = [np.asarray(it[0][i]) for it in items]
                rows += [rows[-1]] * (padded - n)
                out = np.stack(rows)
                return out if out.dtype == np.uint8 else out.astype(np.float32)

            # The device-quantized visual pack (uint8, pre-masked): ~4x
            # less host-link traffic than f32 rendered+weights, and the
            # response encodes these bytes into PNG/JPEG verbatim anyway.
            pack = relighter.forward_visuals(
                stack(0),
                stack(1),
                target_light=stack(2),
                target_ambient=stack(3),
            )
            if hasattr(pack, "copy_to_host_async"):
                # Start the fetch now: it rides the link while the worker
                # assembles and uploads the next batch.
                pack.copy_to_host_async()
            st["device_seconds"] += time.monotonic() - t0
            if pipelined:
                st["pipelined_batches"] += 1
            return {"pack": pack, "items": items, "gets": gets}
        except BaseException as e:  # noqa: BLE001 - propagate to each caller
            st["errors"] += 1
            err = e if isinstance(e, Exception) else WorkerDied(repr(e))
            for _, fut in items:
                if not fut.done():
                    fut.set_exception(err)
            for _ in range(gets):
                self._queue.task_done()
            return None

    def _flush(self, pending):
        """Fetch a dispatched batch's packed outputs, resolve its futures,
        and only then task_done its queue entries (so drain() can't report
        empty while a request is still unanswered). Returns None."""
        if pending is None:
            return None
        st = self.stats
        t0 = time.monotonic()
        try:
            pack = np.asarray(pending["pack"])
        except BaseException as e:  # noqa: BLE001 - propagate to each caller
            st["errors"] += 1
            err = e if isinstance(e, Exception) else WorkerDied(repr(e))
            for _, fut in pending["items"]:
                if not fut.done():
                    fut.set_exception(err)
        else:
            st["device_seconds"] += time.monotonic() - t0
            for k, (_, fut) in enumerate(pending["items"]):
                fut.set_result((pack[k, ..., 0:3], pack[k, ..., 3]))
        finally:
            for _ in range(pending["gets"]):
                self._queue.task_done()
        return None


def make_tier_pool(cfg, relighter, default_tier: str,
                   mesh=None, parallel: str = "data"):
    """Lazy per-tier Relighter factory for per-request precision overrides.

    cfg is the server's PipelineConfig (any tier — apply_precision_tier
    resets every tier-controlled field). Shares the already-loaded weights;
    each used tier builds (and jit-compiles) its Relighter once. Only the
    single device-worker thread calls the returned function, so the cache
    dict needs no locking. The server default tier maps to the existing
    relighter (no duplicate compile)."""
    from geomconsistentfr_tpu.config import apply_precision_tier
    from geomconsistentfr_tpu.infer import Relighter

    cache = {default_tier: relighter}

    def tier_pool(t: str):
        if t not in cache:
            cache[t] = Relighter(
                apply_precision_tier(cfg, t),
                relighter.variables,
                mesh=mesh,
                parallel=parallel,
            )
        return cache[t]

    return tier_pool


def warmup(relighter, batch_sizes=(1, 8), size: int = 256) -> float:
    """Compile every shape the serving path uses, before traffic arrives.

    Runs one forward_visuals per relight batch bucket and one
    estimate_lighting at the idle bucket, on zero-filled uint8 inputs (the
    compiled programs are shape-keyed; values are irrelevant). Returns the
    wall seconds spent — on TPU with a persistent compile cache this is
    milliseconds on restart, minutes only on the very first deploy of a new
    shape/config."""
    t0 = time.monotonic()
    light = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    for b in sorted(set(batch_sizes)):
        img = np.zeros((b, size, size, 3), np.uint8)
        msk = np.zeros((b, size, size), np.uint8)
        np.asarray(
            relighter.forward_visuals(
                img, msk,
                target_light=np.repeat(light, b, 0),
                target_ambient=np.full((b,), 0.5, np.float32),
            )
        )
    np.asarray(
        relighter.estimate_lighting(
            np.zeros((min(batch_sizes), size, size, 3), np.uint8)
        )[0]
    )
    return time.monotonic() - t0


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
            elif self.path == "/statz":
                if batcher is None:
                    self._json(200, {"batching": False})
                    return
                st = dict(batcher.stats)
                st["per_tier"] = dict(st["per_tier"])
                st["per_format"] = dict(st["per_format"])
                st["batching"] = True
                st["worker_alive"] = batcher._thread.is_alive()
                st["queue_depth"] = batcher._queue.qsize()
                if st["batches"]:
                    st["mean_batch_rows"] = st["batched_rows"] / st["batches"]
                    st["padding_overhead"] = (
                        st["padded_rows"] / max(st["batched_rows"], 1) - 1.0
                    )
                self._json(200, st)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                if self.path == "/relight":
                    # Validate the full request in the handler thread so a
                    # malformed request can only 400 its own caller, never a
                    # whole coalesced batch.
                    image = _decode_image(req["image"])
                    mask = _decode_image(req["mask"])[..., 0]
                    if "light_preset" in req:
                        light = np.asarray(
                            LIGHT_PRESETS[req["light_preset"]], np.float32
                        )
                    else:
                        light = np.asarray(req["light"], np.float32)
                    if light.shape != (3,) or not np.all(np.isfinite(light)):
                        raise ValueError(
                            f"'light' must be 3 finite floats, got shape "
                            f"{light.shape}"
                        )
                    ambient = np.float32(req.get("ambient", DEFAULT_AMBIENT))
                    if not np.isfinite(ambient):
                        raise ValueError("'ambient' must be finite")
                    tier = _parse_tier(req)
                    fmt, quality = _parse_format(req)
                    if batcher is not None:
                        batcher.note_format(fmt)
                        rendered, weights = batcher.submit(
                            image, mask, light, ambient, tier=tier
                        )
                    else:
                        if tier is not None:
                            raise ValueError(
                                "per-request 'precision' requires the "
                                "batching worker"
                            )
                        pack = np.asarray(
                            relighter.forward_visuals(
                                image[None], mask[None],
                                target_light=light[None],
                                target_ambient=ambient[None],
                            )
                        )[0]
                        rendered, weights = pack[..., 0:3], pack[..., 3]
                    # Already uint8 and pre-masked on device.
                    self._json(
                        200,
                        {
                            "rendered": _encode_image(rendered, fmt, quality),
                            "shadow_mask": _encode_image(
                                weights, fmt, quality
                            ),
                            "format": fmt,
                        },
                    )
                elif self.path == "/transfer":
                    # 2-pass transfer: estimate from the reference image, then
                    # relight the input with it — both passes through the same
                    # serialized worker (two queue entries; a concurrent batch
                    # may interleave between them, which is fine: estimation
                    # is read-only).
                    image = _decode_image(req["image"])
                    reference = _decode_image(req["reference"])
                    mask = _decode_image(req["mask"])[..., 0]
                    tier = _parse_tier(req)
                    fmt, quality = _parse_format(req)
                    if batcher is not None:
                        batcher.note_format(fmt)
                        unit, amb = batcher.submit_estimate(reference)
                        rendered, weights = batcher.submit(
                            image, mask,
                            np.asarray(unit, np.float32), np.float32(amb),
                            tier=tier,
                        )
                    else:
                        if tier is not None:
                            raise ValueError(
                                "per-request 'precision' requires the "
                                "batching worker"
                            )
                        unit_b, amb_b = relighter.estimate_lighting(
                            reference[None]
                        )
                        unit, amb = unit_b[0], float(amb_b[0])
                        pack = np.asarray(
                            relighter.forward_visuals(
                                image[None], mask[None],
                                target_light=np.asarray(unit_b, np.float32),
                                target_ambient=np.asarray(amb_b, np.float32),
                            )
                        )[0]
                        rendered, weights = pack[..., 0:3], pack[..., 3]
                    self._json(
                        200,
                        {
                            "rendered": _encode_image(rendered, fmt, quality),
                            "shadow_mask": _encode_image(
                                weights, fmt, quality
                            ),
                            "format": fmt,
                            "direction": [float(v) for v in unit],
                            "ambient": float(amb),
                        },
                    )
                elif self.path == "/estimate":
                    image = _decode_image(req["image"])
                    if batcher is not None:
                        # Same single worker thread as /relight: the device
                        # serialization invariant holds for every endpoint.
                        unit, amb = batcher.submit_estimate(image)
                    else:
                        unit_b, amb_b = relighter.estimate_lighting(image[None])
                        unit, amb = unit_b[0], float(amb_b[0])
                    self._json(
                        200,
                        {
                            "direction": [float(v) for v in unit],
                            "ambient": float(amb),
                        },
                    )
                else:
                    self._json(404, {"error": "not found"})
            except (FutTimeout, WorkerDied) as e:
                self._json(503, {"error": f"{type(e).__name__}: {e}"})
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
    parser.add_argument("--precision",
                        choices=["strict", "high", "fast", "draft"],
                        default=None,
                        help="serving precision tier (see config.PRECISION_TIERS); "
                        "default 'high' — matches strict parity on every "
                        "golden fixture at +12%% throughput. 'draft' "
                        "additionally halves the shadow-march resolution "
                        "(preview-grade shadows, max throughput)")
    parser.add_argument("--fast", action="store_true",
                        help="alias for --precision fast")
    parser.add_argument("--no-pipeline", action="store_true",
                        help="disable micro-batch pipelining (fetch batch "
                        "N's results before dispatching batch N+1); the "
                        "default overlaps the fetch/upload tunnel cost "
                        "with device compute when more than --max-batch "
                        "requests are outstanding")
    parser.add_argument("--drain-timeout-s", type=float, default=30.0,
                        help="max seconds to wait for in-flight device work "
                        "after SIGTERM/SIGINT before exiting non-zero")
    parser.add_argument("--warmup", action="store_true",
                        help="compile the serving shapes (min/max relight "
                        "batch + estimate) before announcing readiness, so "
                        "the first request never pays XLA compile latency. "
                        "Recommended in production; off by default because "
                        "fresh compiles take minutes on a CPU dev box.")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard device batches across all visible chips "
                        "(--max-batch must be a multiple of the chip count)")
    parser.add_argument("--sample-parallel", action="store_true",
                        help="latency parallelism: shard the shadow march's "
                        "sample grid across all visible chips (pmin over "
                        "ICI; outputs identical to single-chip). Best for "
                        "low-concurrency serving where per-request latency "
                        "matters more than aggregate throughput.")
    parser.add_argument("--grid-parallel", metavar="DxS", default=None,
                        help="2-D mesh, e.g. '4x2': batches shard across D "
                        "chips while each image's shadow march splits over "
                        "S chips — the medium-concurrency point between "
                        "--data-parallel and --sample-parallel")
    args = parser.parse_args(argv)
    if sum(bool(x) for x in (args.data_parallel, args.sample_parallel,
                             args.grid_parallel)) > 1:
        parser.error("--data-parallel / --sample-parallel / --grid-parallel "
                     "are mutually exclusive")

    from geomconsistentfr_tpu.config import PRESETS, apply_precision_tier
    from geomconsistentfr_tpu.infer import load_relighter

    cfg = PRESETS[args.preset]()
    tier = args.precision
    if args.fast:
        if tier and tier != "fast":
            parser.error("--fast conflicts with --precision " + tier)
        tier = "fast"
    cfg = apply_precision_tier(cfg, tier or "high")
    mesh = None
    parallel = "data"
    if args.grid_parallel:
        from geomconsistentfr_tpu.parallel.mesh import make_mesh_grid

        try:
            n_data, n_samples = map(int, args.grid_parallel.lower().split("x"))
        except ValueError:
            parser.error("--grid-parallel expects DxS, e.g. 4x2")
        mesh = make_mesh_grid(n_data, n_samples)
        parallel = "grid"
    elif args.data_parallel or args.sample_parallel:
        from geomconsistentfr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        if args.sample_parallel:
            parallel = "samples"
    relighter = load_relighter(
        args.checkpoint, cfg=cfg, mesh=mesh, parallel=parallel
    )

    tier_pool = make_tier_pool(
        cfg, relighter, tier or "high", mesh=mesh, parallel=parallel
    )
    batcher = MicroBatcher(
        relighter, max_batch=args.max_batch, window_ms=args.batch_window_ms,
        tier_pool=tier_pool, pipeline=not args.no_pipeline,
    )
    if args.warmup:
        secs = warmup(
            relighter, batch_sizes=(batcher.min_batch, args.max_batch)
        )
        print(json.dumps({"warmup_seconds": round(secs, 2)}), flush=True)
    class GracefulServer(ThreadingHTTPServer):
        # Join handler threads on server_close(): after the batcher drains,
        # in-flight handlers still need to WRITE their responses before the
        # process may exit.
        daemon_threads = False
        block_on_close = True

    server = GracefulServer(
        (args.host, args.port), make_handler(relighter, batcher)
    )

    # Graceful drain: SIGTERM (the load balancer's stop signal) closes the
    # listener first, then waits for every ADMITTED request to resolve and
    # its response to flush before the process exits — no accepted work is
    # dropped.
    import signal

    def _graceful(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)

    print(json.dumps({"serving": f"http://{args.host}:{args.port}"}), flush=True)
    server.serve_forever()          # returns after shutdown()
    drained = batcher.drain(timeout_s=args.drain_timeout_s)
    server.server_close()           # joins handler threads (responses flushed)
    print(json.dumps({"drained": drained}), flush=True)
    return 0 if drained else 1


if __name__ == "__main__":
    raise SystemExit(main())
