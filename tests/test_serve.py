"""Serving endpoint test: spin up the HTTP server with a tiny model."""

import base64
import dataclasses
import io
import json
import threading
from http.server import HTTPServer

import numpy as np

import jax
import jax.numpy as jnp


def _png_b64(img01):
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(buf, (np.asarray(img01) * 255).astype(np.uint8), format="png")
    return base64.b64encode(buf.getvalue()).decode()


def test_relight_endpoint():
    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)

    # Serve expects 256-inputs by default; patch its decode size via a small
    # request image that it resizes — instead call the handler with 64x64 by
    # monkeypatching the decoder size through the posted image size (the
    # handler resizes to 256; our tiny model is 64). Simplest: post 64x64 and
    # patch serve._decode_image default.
    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = HTTPServer(("127.0.0.1", 0), make_handler(relighter))
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()

        import http.client

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request(
            "POST",
            "/relight",
            json.dumps(
                {
                    "image": _png_b64(img),
                    "mask": _png_b64(mask),
                    "light_preset": "multipie_14",
                }
            ),
        )
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 200, payload
        assert "rendered" in payload and "shadow_mask" in payload

        conn.request("POST", "/estimate", json.dumps({"image": _png_b64(img)}))
        resp = conn.getresponse()
        est = json.loads(resp.read())
        assert resp.status == 200
        assert len(est["direction"]) == 3
        np.testing.assert_allclose(np.linalg.norm(est["direction"]), 1.0, rtol=1e-4)

        # 2-pass transfer: direction/ambient must equal a direct /estimate
        # of the reference image (the handler estimates, then relights).
        ref_img = rng.uniform(size=(64, 64, 3))
        conn.request(
            "POST",
            "/transfer",
            json.dumps(
                {
                    "image": _png_b64(img),
                    "reference": _png_b64(ref_img),
                    "mask": _png_b64(mask),
                }
            ),
        )
        resp = conn.getresponse()
        tr = json.loads(resp.read())
        assert resp.status == 200, tr
        assert "rendered" in tr and "shadow_mask" in tr
        conn.request("POST", "/estimate", json.dumps({"image": _png_b64(ref_img)}))
        est_ref = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(tr["direction"], est_ref["direction"], atol=1e-5)
        np.testing.assert_allclose(tr["ambient"], est_ref["ambient"], atol=1e-5)

        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200

        # Probe: malformed body -> clean 400
        conn.request("POST", "/relight", "{not json")
        resp = conn.getresponse()
        assert resp.status == 400
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_threaded_server_micro_batching():
    """Concurrent /relight requests coalesce into one padded device batch
    and every caller gets ITS OWN slice back (threaded server + batcher)."""
    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)

    calls = []
    orig_forward = relighter.forward_visuals

    def counting_forward(images, masks, **kw):
        calls.append(images.shape[0])
        return orig_forward(images, masks, **kw)

    relighter.forward_visuals = counting_forward
    batcher = MicroBatcher(relighter, max_batch=4, window_ms=200.0)

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(1)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))
        presets = ["multipie_14", "multipie_10", "A00E45"]

        import http.client

        results = {}

        def post(preset):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/relight", json.dumps({
                "image": _png_b64(img), "mask": _png_b64(mask),
                "light_preset": preset,
            }))
            resp = conn.getresponse()
            results[preset] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(p,)) for p in presets]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert all(status == 200 for status, _ in results.values()), results
        # Distinct lights must produce distinct renders (per-request slices).
        pngs = {p: results[p][1]["rendered"] for p in presets}
        assert len(set(pngs.values())) == 3
        # The three concurrent requests used fewer forwards than requests
        # (the long batch window guarantees coalescing here).
        assert len(calls) < 3, calls
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_concurrent_mixed_relight_and_estimate():
    """/estimate is serialized through the SAME worker thread as /relight:
    concurrent mixed traffic succeeds, never runs two device programs at
    once, and a malformed /relight 400s only its own caller."""
    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)

    # Track that device entry points never run concurrently.
    lock = threading.Lock()
    in_flight = {"n": 0, "max": 0}

    def tracking(fn):
        def wrapped(*a, **kw):
            with lock:
                in_flight["n"] += 1
                in_flight["max"] = max(in_flight["max"], in_flight["n"])
            try:
                return fn(*a, **kw)
            finally:
                with lock:
                    in_flight["n"] -= 1
        return wrapped

    relighter.forward_visuals = tracking(relighter.forward_visuals)
    relighter.estimate_lighting = tracking(relighter.estimate_lighting)
    batcher = MicroBatcher(relighter, max_batch=4, window_ms=50.0)

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(2)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))

        import http.client

        results = {}

        def post(name, path, body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", path, json.dumps(body))
            resp = conn.getresponse()
            results[name] = (resp.status, json.loads(resp.read()))

        jobs = [
            ("r1", "/relight", {"image": _png_b64(img), "mask": _png_b64(mask),
                                "light_preset": "multipie_14"}),
            ("e1", "/estimate", {"image": _png_b64(img)}),
            ("r2", "/relight", {"image": _png_b64(img), "mask": _png_b64(mask),
                                "light_preset": "multipie_10"}),
            ("e2", "/estimate", {"image": _png_b64(img)}),
            # Malformed light: must 400 without poisoning any batch.
            ("bad", "/relight", {"image": _png_b64(img), "mask": _png_b64(mask),
                                 "light": [1.0, 0.0]}),
            # 2-pass transfer rides the same worker (two queue entries).
            ("t1", "/transfer", {"image": _png_b64(img),
                                 "reference": _png_b64(img),
                                 "mask": _png_b64(mask)}),
        ]
        threads = [
            threading.Thread(target=post, args=j) for j in jobs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        assert results["r1"][0] == 200 and results["r2"][0] == 200, results
        assert results["e1"][0] == 200 and results["e2"][0] == 200, results
        assert results["bad"][0] == 400, results["bad"]
        assert "light" in results["bad"][1]["error"]
        assert results["t1"][0] == 200, results["t1"]
        np.testing.assert_allclose(
            results["t1"][1]["direction"], results["e1"][1]["direction"],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.linalg.norm(results["e1"][1]["direction"]), 1.0, rtol=1e-4
        )
        assert in_flight["max"] == 1, in_flight
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_worker_death_returns_503():
    """If the worker thread is gone, handlers return 503, not a hang."""
    from geomconsistentfr_tpu.serve import MicroBatcher, WorkerDied

    class Boom:
        def forward_visuals(self, *a, **k):
            raise SystemExit("device lost")  # BaseException

    batcher = MicroBatcher(Boom(), max_batch=2, window_ms=1.0,
                           request_timeout_s=30.0)
    img = np.zeros((64, 64, 3), np.float32)
    mask = np.ones((64, 64), np.float32)
    light = np.asarray([0.0, 0.0, 1.0], np.float32)
    # BaseException from the forward is converted to WorkerDied on the future
    # and the worker thread survives for subsequent requests.
    import pytest

    with pytest.raises(WorkerDied):
        batcher.submit(img, mask, light, np.float32(0.5))
    with pytest.raises(WorkerDied):
        batcher.submit(img, mask, light, np.float32(0.5))
    assert batcher._thread.is_alive()


def test_serving_data_parallel_mesh():
    """A mesh-sharded relighter serves /relight, /estimate and /transfer
    through the MicroBatcher: idle batches pad to one row per device and
    max_batch must be mesh-divisible."""
    import pytest

    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mesh = make_mesh()
    relighter = Relighter(cfg, variables, mesh=mesh)

    with pytest.raises(ValueError, match="multiple of the mesh size"):
        MicroBatcher(relighter, max_batch=mesh.size + 1)

    batcher = MicroBatcher(relighter, max_batch=mesh.size, window_ms=20.0)

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(7)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))

        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/relight", json.dumps({
            "image": _png_b64(img), "mask": _png_b64(mask),
            "light_preset": "multipie_14",
        }))
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 200, payload

        conn.request("POST", "/estimate", json.dumps({"image": _png_b64(img)}))
        est = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(np.linalg.norm(est["direction"]), 1.0,
                                   rtol=1e-4)

        conn.request("POST", "/transfer", json.dumps({
            "image": _png_b64(img), "reference": _png_b64(img),
            "mask": _png_b64(mask),
        }))
        resp = conn.getresponse()
        tr = json.loads(resp.read())
        assert resp.status == 200, tr
        np.testing.assert_allclose(tr["direction"], est["direction"], atol=1e-4)
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_serving_sample_parallel_mesh():
    """A sample-parallel relighter serves through the MicroBatcher with NO
    batch-multiple constraint (the batch is replicated; the march's sample
    axis is the sharded one): min_batch is 1, odd max_batch is accepted, and
    a single /relight round-trips."""
    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mesh = make_mesh()
    relighter = Relighter(cfg, variables, mesh=mesh, parallel="samples")

    # No mesh-divisibility requirement in this mode.
    batcher = MicroBatcher(relighter, max_batch=mesh.size + 1, window_ms=5.0)
    assert batcher.min_batch == 1

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(7)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))

        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/relight", json.dumps({
            "image": _png_b64(img), "mask": _png_b64(mask),
            "light_preset": "multipie_14",
        }))
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 200, payload
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_per_request_precision_override():
    """One server process serves multiple precision tiers: an optional
    "precision" field on /relight routes the request to a lazily-built
    per-tier Relighter (shared weights); different-tier requests never
    coalesce into one device batch; bad tiers 400 only their own caller."""
    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import (
        apply_precision_tier,
        preset_single_image,
    )
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)

    built = []

    def tier_pool(t):
        built.append(t)
        return Relighter(apply_precision_tier(cfg, t), variables)

    batcher = MicroBatcher(
        relighter, max_batch=4, window_ms=20.0, tier_pool=tier_pool
    )

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(11)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))

        import http.client

        def post(body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", "/relight", json.dumps(body))
            resp = conn.getresponse()
            return resp.status, json.loads(resp.read())

        base = {"image": _png_b64(img), "mask": _png_b64(mask),
                "light_preset": "multipie_04"}

        status, default_resp = post(dict(base))
        assert status == 200, default_resp
        status, draft_resp = post(dict(base, precision="draft"))
        assert status == 200, draft_resp
        assert built == ["draft"]
        # Same weights, different tier: the rendered bytes may legitimately
        # differ (half-res march), but both must be valid PNG payloads.
        assert default_resp["rendered"] and draft_resp["rendered"]

        status, payload = post(dict(base, precision="warp9"))
        assert status == 400 and "precision" in payload["error"]
        # The bad request 400'd its own caller only; the worker still serves.
        status, _ = post(dict(base, precision="draft"))
        assert status == 200
        assert built == ["draft", "draft"] or built == ["draft"]

        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_statz_endpoint():
    """GET /statz reports serving counters: request totals, per-tier counts,
    batch/padding stats, device seconds, worker liveness."""
    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import (
        apply_precision_tier,
        preset_single_image,
    )
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)
    batcher = MicroBatcher(
        relighter, max_batch=4, window_ms=5.0,
        tier_pool=lambda t: Relighter(apply_precision_tier(cfg, t), variables),
    )

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(5)
        img = rng.uniform(size=(64, 64, 3))
        mask = np.ones((64, 64, 3))

        import http.client

        def post(path, body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", path, json.dumps(body))
            r = conn.getresponse()
            return r.status, json.loads(r.read())

        base = {"image": _png_b64(img), "mask": _png_b64(mask),
                "light_preset": "multipie_14"}
        assert post("/relight", dict(base))[0] == 200
        assert post("/relight", dict(base, precision="draft"))[0] == 200
        assert post("/estimate", {"image": _png_b64(img)})[0] == 200

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/statz")
        r = conn.getresponse()
        st = json.loads(r.read())
        assert r.status == 200, st
        assert st["batching"] and st["worker_alive"]
        assert st["relight_requests"] == 2
        assert st["estimate_requests"] == 1
        assert st["batches"] == 2
        assert st["per_tier"] == {"": 1, "draft": 1}
        assert st["device_seconds"] > 0
        assert st["errors"] == 0
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_warmup_compiles_serving_shapes():
    """serve.warmup runs every serving shape (relight buckets + estimate)
    so readiness means compiled; subsequent calls at those shapes are
    cache hits."""
    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import warmup

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)

    secs = warmup(relighter, batch_sizes=(1, 2), size=64)
    assert secs > 0
    # The shapes warmup visited now serve without retracing: a real request
    # at the same shapes completes and returns the packed visual layout.
    rng = np.random.default_rng(3)
    pack = np.asarray(relighter.forward_visuals(
        (rng.uniform(size=(2, 64, 64, 3)) * 255).astype(np.uint8),
        np.ones((2, 64, 64), np.uint8),
        target_light=np.tile(np.asarray([[0.3, 0.4, 0.86]], np.float32), (2, 1)),
        target_ambient=np.full((2,), 0.5, np.float32),
    ))
    assert pack.shape == (2, 64, 64, 12) and pack.dtype == np.uint8


def test_drain_waits_for_inflight_work():
    """MicroBatcher.drain() returns only after every admitted request has
    resolved (graceful-shutdown invariant: accepted work is never dropped)."""
    import time as time_mod

    from geomconsistentfr_tpu.serve import MicroBatcher

    class Slow:
        mesh = None
        parallel = "data"

        def forward_visuals(self, images, masks, **kw):
            time_mod.sleep(0.5)
            return np.zeros((images.shape[0], 4, 4, 12), np.uint8)

    batcher = MicroBatcher(Slow(), max_batch=2, window_ms=1.0)
    img = np.zeros((4, 4, 3), np.uint8)
    msk = np.zeros((4, 4), np.uint8)
    light = np.zeros(3, np.float32)

    results = []
    t = threading.Thread(
        target=lambda: results.append(
            batcher.submit(img, msk, light, np.float32(0.5))
        )
    )
    t.start()
    time_mod.sleep(0.05)           # let the worker pick the request up
    assert batcher.drain(timeout_s=5.0)   # blocks past the 0.5 s device call
    t.join(timeout=1.0)
    assert results and results[0][0].shape == (4, 4, 3)
    # Idle batcher drains immediately.
    assert batcher.drain(timeout_s=0.1)


def test_tier_pool_mesh_path():
    """make_tier_pool builds mesh-sharded per-tier relighters (the path the
    --data-parallel server takes), reuses the default tier, and builds a
    sample-parallel draft relighter (pooled march, pmin-sharded)."""
    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.parallel.mesh import make_mesh
    from geomconsistentfr_tpu.serve import make_tier_pool

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    mesh = make_mesh()
    relighter = Relighter(cfg, variables, mesh=mesh)

    pool = make_tier_pool(cfg, relighter, "high", mesh=mesh)
    assert pool("high") is relighter          # default tier: no rebuild
    draft = pool("draft")
    assert draft.mesh is mesh
    assert draft.cfg.render.shadow_resolution_scale == 4
    assert draft.cfg.render.img_height == 64  # tiny cfg preserved
    assert pool("draft") is draft             # cached

    # Mesh-sharded draft forward actually runs (batch = mesh size).
    n = mesh.size
    rng = np.random.default_rng(2)
    pack = np.asarray(draft.forward_visuals(
        (rng.uniform(size=(n, 64, 64, 3)) * 255).astype(np.uint8),
        np.ones((n, 64, 64), np.uint8),
        target_light=np.tile(np.asarray([[0.3, 0.4, 0.86]], np.float32), (n, 1)),
        target_ambient=np.full((n,), 0.5, np.float32),
    ))
    assert pack.shape == (n, 64, 64, 12) and pack.dtype == np.uint8

    sp_pool = make_tier_pool(cfg, relighter, "high", mesh=mesh,
                             parallel="samples")
    draft_sp = sp_pool("draft")
    assert draft_sp.parallel == "samples"
    out = draft_sp.forward(
        rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
        np.ones((1, 64, 64), np.float32),
        target_light=np.asarray([[0.3, 0.4, 0.86]], np.float32),
        target_ambient=np.full((1,), 0.5, np.float32),
    )
    assert np.isfinite(np.asarray(out.rendered)).all()


def test_serving_soak_counters_and_rss():
    """Soak: 1,000 requests through the real threaded server + micro-batcher.

    Asserts the three properties the on-chip load benchmark
    (tools/bench_serve.py, docs/BENCH_serve.json) relies on, at unit scale:
    every request succeeds, the /statz counters stay mutually consistent
    (requests == batched rows, padding only ever rounds UP to a bucket,
    zero errors), and the process RSS is stable after warmup (no per-request
    leak in the batcher/handler/encode path).
    """
    from http.server import ThreadingHTTPServer

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)
    batcher = MicroBatcher(relighter, max_batch=4, window_ms=2.0)

    import geomconsistentfr_tpu.serve as serve_mod

    def rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
        raise RuntimeError("VmRSS not found")

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(3)
        img = _png_b64(rng.uniform(size=(64, 64, 3)))
        mask = _png_b64(np.ones((64, 64, 3)))
        body = json.dumps(
            {"image": img, "mask": mask, "light_preset": "multipie_14"}
        )

        import http.client

        n_threads, per_thread = 8, 125
        statuses = []
        lock = threading.Lock()

        def client():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            mine = []
            for _ in range(per_thread):
                conn.request("POST", "/relight", body)
                resp = conn.getresponse()
                resp.read()
                mine.append(resp.status)
            with lock:
                statuses.extend(mine)

        # Warmup burst (compile + allocator high-water): one full round.
        warm = threading.Thread(target=client)
        warm.start()
        warm.join(timeout=600)
        assert statuses == [200] * per_thread
        rss_after_warm = rss_mb()

        threads = [threading.Thread(target=client) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)

        total = per_thread * (n_threads + 1)
        assert statuses == [200] * total
        st = batcher.stats
        assert st["errors"] == 0
        assert st["relight_requests"] == total
        assert st["batched_rows"] == total
        # Padding only rounds up to the {min_batch, max_batch} buckets.
        assert st["padded_rows"] >= st["batched_rows"]
        assert st["padded_rows"] <= st["batches"] * batcher.max_batch
        assert st["per_tier"] == {"": total}
        assert st["device_seconds"] > 0
        # No per-request leak: 1,000 post-warmup requests move RSS by less
        # than a loose 150 MB bound (observed growth is a few MB; the bound
        # only catches O(request) leaks of image-sized buffers, ~50 KB each).
        growth = rss_mb() - rss_after_warm
        assert growth < 150, f"RSS grew {growth:.0f} MB during soak"
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_jpeg_response_format():
    """Per-request "format": "jpeg" returns decodable JPEG payloads (PNG
    stays the default), bad formats 400 cleanly, and the statz counter
    tracks per-format requests. JPEG responses exist because PNG deflate +
    base64 was 75% of serving wall on the 1-CPU host (BENCH_serve.json);
    the encode rides native/dataloader.cc's libjpeg (gcfr_encode_jpeg)."""
    import http.client

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher, make_handler

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    relighter = Relighter(cfg, variables)
    batcher = MicroBatcher(relighter, max_batch=2, window_ms=1.0)

    import geomconsistentfr_tpu.serve as serve_mod

    orig = serve_mod._decode_image
    serve_mod._decode_image = lambda b64, size=64: orig(b64, size=64)
    try:
        server = HTTPServer(
            ("127.0.0.1", 0), make_handler(relighter, batcher)
        )
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        rng = np.random.default_rng(1)
        body = {
            "image": _png_b64(rng.uniform(size=(64, 64, 3))),
            "mask": _png_b64(np.ones((64, 64, 3))),
            "light_preset": "multipie_14",
        }
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)

        # Default: PNG magic bytes.
        conn.request("POST", "/relight", json.dumps(body))
        png = json.loads(conn.getresponse().read())
        assert png["format"] == "png"
        assert base64.b64decode(png["rendered"])[:8] == b"\x89PNG\r\n\x1a\n"

        # JPEG: SOI marker, decodable, pixel-close to the PNG response.
        conn.request(
            "POST", "/relight",
            json.dumps({**body, "format": "jpeg", "quality": 92}),
        )
        jp = json.loads(conn.getresponse().read())
        assert jp["format"] == "jpeg"
        raw = base64.b64decode(jp["rendered"])
        assert raw[:2] == b"\xff\xd8"
        import imageio.v2 as imageio

        img_j = np.asarray(imageio.imread(io.BytesIO(raw)))
        img_p = np.asarray(
            imageio.imread(io.BytesIO(base64.b64decode(png["rendered"])))
        )
        assert img_j.shape == img_p.shape
        assert np.abs(
            img_j.astype(np.int16) - img_p.astype(np.int16)
        ).mean() < 8.0
        # Grayscale shadow mask also decodes.
        raw_m = base64.b64decode(jp["shadow_mask"])
        assert raw_m[:2] == b"\xff\xd8"
        assert imageio.imread(io.BytesIO(raw_m)).ndim == 2

        # Unknown format -> its caller's 400, nobody else's.
        conn.request(
            "POST", "/relight", json.dumps({**body, "format": "webp"})
        )
        assert conn.getresponse().status == 400
        conn.request(
            "POST", "/relight",
            json.dumps({**body, "format": "jpeg", "quality": 0}),
        )
        assert conn.getresponse().status == 400

        conn.request("GET", "/statz")
        st = json.loads(conn.getresponse().read())
        assert st["per_format"] == {"png": 1, "jpeg": 1}
        server.shutdown()
    finally:
        serve_mod._decode_image = orig


def test_pipelined_worker_overlaps_and_matches_serialized():
    """With more outstanding requests than max_batch, the worker dispatches
    batch N+1 before fetching batch N (statz pipelined_batches > 0) and each
    caller still gets exactly its own row -- byte-identical to a direct
    batch-2 forward of its inputs. pipeline=False keeps the old fully
    serialized loop (pipelined_batches == 0) with identical results."""
    import time

    from geomconsistentfr_tpu.config import preset_single_image
    from geomconsistentfr_tpu.infer import Relighter
    from geomconsistentfr_tpu.models.relightnet import RelightNet
    from geomconsistentfr_tpu.serve import MicroBatcher

    cfg = preset_single_image()
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, img_height=64, img_width=64,
            num_sample_points=16, t_stop=0.105, march_chunk=16,
            use_pallas_shadows=False,
        ),
    )
    model = RelightNet(cfg=cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.default_rng(7)
    img = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
    mask = np.full((64, 64), 255, np.uint8)
    lights = np.asarray(
        [[0.3, 0.4, 0.866], [-0.5, 0.1, 0.86], [0.0, -0.6, 0.8],
         [0.7, 0.0, 0.71]], np.float32,
    )

    # Reference rows: per-row independence of the batch-2 program (the
    # storm below runs every request through that same padded bucket).
    ref = Relighter(cfg, variables)
    expected = [
        np.asarray(ref.forward_visuals(
            np.stack([img, img]), np.stack([mask, mask]),
            target_light=np.stack([l, l]),
            target_ambient=np.asarray([0.5, 0.5], np.float32),
        ))[0]
        for l in lights
    ]

    def storm(pipeline):
        relighter = Relighter(cfg, variables)
        orig_forward = relighter.forward_visuals

        def slow_forward(images, masks, **kw):
            # Holds the worker in dispatch long enough that the remaining
            # requests are queued when it returns, forcing the next batch
            # to assemble while this one is pending.
            time.sleep(0.05)
            return orig_forward(images, masks, **kw)

        relighter.forward_visuals = slow_forward
        batcher = MicroBatcher(
            relighter, max_batch=2, window_ms=200.0, pipeline=pipeline
        )
        results = [None] * len(lights)

        def post(i):
            results[i] = batcher.submit(img, mask, lights[i], 0.5)

        # A sacrificial request holds the worker inside dispatch (the 50 ms
        # sleep) while ALL real requests queue behind it, so the real ones
        # deterministically form two full batches of 2 -- the same compiled
        # bucket as the reference rows above -- and, with pipelining on,
        # each of those batches is dispatched while the previous one is
        # still pending.
        sacrificial = threading.Thread(
            target=lambda: batcher.submit(img, mask, lights[0], 0.5)
        )
        sacrificial.start()
        time.sleep(0.02)
        threads = [
            threading.Thread(target=post, args=(i,))
            for i in range(len(lights))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        sacrificial.join(timeout=600)
        assert batcher.drain(timeout_s=10.0)
        assert batcher._queue.unfinished_tasks == 0
        assert batcher.stats["relight_requests"] == len(lights) + 1
        assert batcher.stats["errors"] == 0
        return results, batcher.stats["pipelined_batches"]

    piped, n_piped = storm(pipeline=True)
    serial, n_serial = storm(pipeline=False)
    assert n_piped > 0
    assert n_serial == 0
    for i in range(len(lights)):
        rgb, extra = piped[i]
        assert np.array_equal(rgb, expected[i][..., 0:3])
        assert np.array_equal(extra, expected[i][..., 3])
        s_rgb, s_extra = serial[i]
        assert np.array_equal(s_rgb, rgb)
        assert np.array_equal(s_extra, extra)
