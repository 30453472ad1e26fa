"""End-to-end HTTP serving benchmark: latency percentiles under load.

Stands up the real serving stack in-process (Relighter -> MicroBatcher ->
ThreadingHTTPServer on an ephemeral port), fires a closed-loop request storm
from N client threads (optionally a mixed precision-tier workload), and
reports throughput and client-observed latency percentiles plus the server's
own /statz counters. Run on the chip; the TPU-exclusive rule is satisfied
because server and clients share this one process.

Usage:
  python tools/bench_serve.py [--requests 64] [--concurrency 8]
      [--max-batch 8] [--tiers high] [--precision high]
      [--checkpoint /root/reference/model_lighting_transfer/model_epoch106.pth]

  --tiers high,draft  alternates request tiers (per-request "precision").
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import threading
import time
from http.server import ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--checkpoint",
        default="/root/reference/model_lighting_transfer/model_epoch106.pth",
    )
    ap.add_argument("--preset", default="lighting_transfer")
    ap.add_argument("--precision", default="high",
                    help="server default tier")
    ap.add_argument("--tiers", default="",
                    help="comma list; requests cycle through these as "
                    "per-request overrides (empty = use the server default)")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=4.0)
    ap.add_argument("--format", default="png", choices=["png", "jpeg"],
                    help="response codec requested by the storm (jpeg cuts "
                    "the dominant host PNG-deflate cost; BENCH_serve.json)")
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--no-pipeline", action="store_true",
                    help="serialized dispatch->fetch worker (A/B baseline "
                    "for the pipelined micro-batcher)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geomconsistentfr_tpu.config import PRESETS, apply_precision_tier
    from geomconsistentfr_tpu.infer import load_relighter
    from geomconsistentfr_tpu.serve import (
        MicroBatcher,
        make_handler,
        make_tier_pool,
        warmup,
    )

    cfg = apply_precision_tier(PRESETS[args.preset](), args.precision)
    relighter = load_relighter(args.checkpoint, cfg=cfg)
    tier_pool = make_tier_pool(cfg, relighter, args.precision)
    batcher = MicroBatcher(
        relighter, max_batch=args.max_batch, window_ms=args.window_ms,
        tier_pool=tier_pool, pipeline=not args.no_pipeline,
    )

    tiers = [t for t in args.tiers.split(",") if t]
    # Warm every shape the storm will hit so the measurement excludes
    # compiles (the production server does the same via --warmup).
    warmup(relighter, batch_sizes=(batcher.min_batch, args.max_batch))
    for t in tiers:
        warmup(tier_pool(t), batch_sizes=(batcher.min_batch, args.max_batch))

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(relighter, batcher)
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # One representative request body (256x256 face + mask, PNG-encoded);
    # serve._encode_image is the same b64-PNG encoder the responses use.
    from geomconsistentfr_tpu.serve import _encode_image

    rng = np.random.default_rng(0)
    img = _encode_image(rng.uniform(0, 255, (256, 256, 3)).astype(np.uint8))
    yy, xx = np.mgrid[0:256, 0:256]
    mask = _encode_image(
        ((((yy - 128) / 110.0) ** 2 + ((xx - 128) / 90.0) ** 2) < 1)
        .astype(np.uint8) * 255
    )

    latencies: list[tuple[str, float]] = []
    lat_lock = threading.Lock()
    errors = []

    def client(worker_id: int):
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        for k in range(args.requests // args.concurrency):
            body = {"image": img, "mask": mask,
                    "light_preset": "multipie_14"}
            if args.format != "png":
                body["format"] = args.format
                body["quality"] = args.quality
            tier = tiers[(worker_id + k) % len(tiers)] if tiers else ""
            if tier:
                body["precision"] = tier
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/relight", json.dumps(body))
                resp = conn.getresponse()
                payload = resp.read()
                if resp.status != 200:
                    errors.append(payload[:200])
                    continue
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e))
                conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=600
                )
                continue
            with lat_lock:
                latencies.append(
                    (tier or args.precision, time.perf_counter() - t0)
                )

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(i,))
        for i in range(args.concurrency)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()

    lats = sorted(l for _, l in latencies)
    per_tier: dict = {}
    for tier, l in latencies:
        per_tier.setdefault(tier, []).append(l)

    def pct(xs, p):
        return round(float(np.percentile(np.asarray(xs), p)) * 1000, 1)

    print(json.dumps({
        "requests_ok": len(lats),
        "errors": len(errors),
        "concurrency": args.concurrency,
        "max_batch": args.max_batch,
        "format": args.format,
        "throughput_rps": round(len(lats) / wall, 2),
        "latency_ms": {"p50": pct(lats, 50), "p90": pct(lats, 90),
                       "p99": pct(lats, 99)},
        "per_tier_p50_ms": {
            k: pct(v, 50) for k, v in sorted(per_tier.items())
        },
        "statz": dict(batcher.stats),
    }))
    if errors:
        print("first error:", errors[0], file=sys.stderr)


if __name__ == "__main__":
    main()
