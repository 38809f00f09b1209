"""Inference server (drivers/serve.py): checkpoint loading, bucket padding,
micro-batching, HTTP surface — all on the CPU backend with a tiny model."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import get_mgmt_cross_config, modify_config
from cross_attention_vit_tpu.models import model_cross
from cross_attention_vit_tpu.drivers.serve import InferenceServer, serve
from cross_attention_vit_tpu.train.checkpoint import CheckpointManager


def _tiny_cfg():
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_multi_blocks=1,
        num_self_blocks=1, img_size=(16, 16, 8), patch_size=(8, 8, 8),
        num_modalities=2, attn_order={"0": "1", "1": "0"},
        dropout=0.0, lr=1e-3, weight_decay=1e-4, label_smoothing=0.0,
        img_aug=False, optim_params={"T_max": 10, "eta_min": 1e-6}))
    return cfg


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_ckpt")
    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    mgr = CheckpointManager(d, monitor="val_loss", save_top_k=1, config=cfg)
    state = {"params": params,
             "opt": {"unused": jnp.zeros((1,))},
             "epoch": jnp.zeros((), jnp.int32)}
    path = mgr.save(0, 0.5, state)
    return path, cfg, params


def _vols(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(b, cfg.num_modalities, 1, *cfg.img_size)) * 100
            ).astype(np.float32)


def test_predict_matches_direct_apply_and_pads_buckets(ckpt):
    path, cfg, params = ckpt
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(2, 4), max_wait_ms=1.0)
    srv.start()
    try:
        # b=3 pads up to bucket 4; results must equal the unpadded forward
        vols = _vols(cfg, 3)
        got = srv.predict(vols)
        want = np.asarray(model_cross.apply(params, cfg, vols, train=False))
        assert got.shape == (3, 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        srv.stop()


def test_microbatching_coalesces_concurrent_requests(ckpt):
    path, cfg, _ = ckpt
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(1, 2, 4, 8), max_wait_ms=200.0)
    srv.warmup()  # compile before timing-sensitive coalescing
    srv.start()
    try:
        results = {}

        def hit(i):
            results[i] = srv.predict(_vols(cfg, 1, seed=i))

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(results) == [0, 1, 2, 3]
        view = srv.stats_view()
        assert view["requests"] == 4 and view["volumes"] == 4
        # the 200 ms window must have coalesced them into at most 2 steps
        assert sum(view["batch_histogram"].values()) <= 2
        # each result is the right individual volume's logits (no swap)
        for i in range(4):
            want = np.asarray(model_cross.apply(
                srv.params, cfg, _vols(cfg, 1, seed=i), train=False))
            np.testing.assert_allclose(results[i], want, rtol=1e-5, atol=1e-5)
    finally:
        srv.stop()


def test_backpressure_sheds_when_queue_full(ckpt):
    """Admission is bounded in volumes: requests beyond max_queue_volumes
    raise Overloaded (HTTP 503) instead of growing the queue, the shed is
    counted, and draining the queue re-admits."""
    from cross_attention_vit_tpu.drivers.serve import Overloaded

    path, cfg, _ = ckpt
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(1, 2, 4), max_wait_ms=1.0,
                          max_queue_volumes=4)
    # dispatcher NOT started: the queue can only fill
    try:
        waiters = []

        def hit(b, seed):
            try:
                srv.predict(_vols(cfg, b, seed=seed), timeout=30)
            except Exception:
                pass

        for i in range(2):  # 2 × 2 volumes = the whole budget
            t = threading.Thread(target=hit, args=(2, i), daemon=True)
            t.start()
            waiters.append(t)
        deadline = time.monotonic() + 5
        while srv._pending_volumes < 4 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._pending_volumes == 4

        with pytest.raises(Overloaded) as ei:
            srv.predict(_vols(cfg, 1, seed=9))
        assert ei.value.retry_after_s > 0
        view = srv.stats_view()
        assert view["shed_requests"] == 1 and view["shed_volumes"] == 1
        assert view["pending_volumes"] == 4
        assert view["queue_limit_volumes"] == 4

        # drain: starting the dispatcher completes the queued work and
        # re-opens admission
        srv.start()
        for t in waiters:
            t.join(timeout=30)
        deadline = time.monotonic() + 10
        while srv._pending_volumes and time.monotonic() < deadline:
            time.sleep(0.01)
        out = srv.predict(_vols(cfg, 1, seed=10), timeout=30)
        assert out.shape == (1, 2)
        view = srv.stats_view()
        assert view["pending_volumes"] == 0
        # the transfer/device split is populated by real steps
        assert view["device_ms"]["p50"] is not None
        assert view["transfer_ms"]["p50"] is not None
    finally:
        srv.stop()


def test_http_503_retry_after_on_overload(ckpt):
    """The HTTP layer maps Overloaded to 503 + Retry-After."""
    import urllib.error
    import urllib.request

    path, cfg, _ = ckpt
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(1, 2), max_wait_ms=1.0,
                          max_queue_volumes=1)
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # saturate: one in-flight slot, dispatcher stopped after warmup
        srv._stop.set()
        srv._dispatcher.join(timeout=5)
        blocker = threading.Thread(
            target=lambda: _post_predict_ignore(port, cfg), daemon=True)
        blocker.start()
        deadline = time.monotonic() + 5
        while srv._pending_volumes < 1 and time.monotonic() < deadline:
            time.sleep(0.01)

        buf = io.BytesIO()
        np.save(buf, _vols(cfg, 1, seed=3))
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 503
        assert int(ei.value.headers["Retry-After"]) >= 1
        body = json.loads(ei.value.read())
        assert "queue full" in body["error"]
    finally:
        httpd.shutdown()
        srv.stop()


def _post_predict_ignore(port, cfg):
    import urllib.request

    buf = io.BytesIO()
    np.save(buf, _vols(cfg, 1, seed=2))
    req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                 data=buf.getvalue(), method="POST")
    try:
        urllib.request.urlopen(req, timeout=5)
    except Exception:
        pass


def test_shape_validation(ckpt):
    path, cfg, _ = ckpt
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"))
    with pytest.raises(ValueError):
        srv.predict(np.zeros((1, 3, 1, *cfg.img_size), np.float32))  # M=3


def test_http_surface(ckpt):
    path, cfg, params = ckpt
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(1, 2), max_wait_ms=1.0)
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health["status"] == "ok" and health["model"] == "cross"
        assert health["params"] == srv.n_params

        vols = _vols(cfg, 1)[0]  # single item, no batch axis
        buf = io.BytesIO()
        np.save(buf, vols)
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(),
                                     method="POST")
        out = json.load(urllib.request.urlopen(req))
        want = np.asarray(model_cross.apply(params, cfg, vols[None],
                                            train=False))
        np.testing.assert_allclose(np.asarray(out["logits"]), want,
                                   rtol=1e-5, atol=1e-5)
        assert 0.0 <= out["prob_class1"][0] <= 1.0

        # bad shape → 400 with an error message, server keeps serving
        buf = io.BytesIO()
        np.save(buf, np.zeros((3, 1, 4, 4, 4), np.float32))
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(),
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

        stats = json.load(urllib.request.urlopen(f"{base}/stats"))
        assert stats["requests"] == 1
        assert stats["latency_ms"]["p50"] is not None
    finally:
        httpd.shutdown()
        srv.stop()


def test_sharded_serving_matches_single_device(ckpt):
    from cross_attention_vit_tpu.parallel import make_mesh

    path, cfg, params = ckpt
    mesh = make_mesh(4, 2)  # DP×TP over the 8 virtual devices
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(4, 8), max_wait_ms=1.0, mesh=mesh)
    srv.start()
    try:
        vols = _vols(cfg, 3)  # pads to the 4-bucket, sharded over 'data'
        got = srv.predict(vols)
        want = np.asarray(model_cross.apply(params, cfg, vols, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        srv.stop()
    # buckets that don't divide the data axis are rejected up front
    with pytest.raises(ValueError):
        InferenceServer(path, "cross", img_types=("T1c", "T2"),
                        buckets=(1, 2), mesh=mesh)


UCSF = "/root/reference/ucsf-data"


@pytest.mark.skipif(not __import__("os").path.isdir(UCSF),
                    reason="ucsf-data not mounted")
def test_predict_subject_real_nifti(ckpt):
    import os

    path, cfg, params = ckpt
    srv = InferenceServer(path, "cross", img_types=("DWI", "SWI"),
                          data_folder=UCSF, buckets=(1,), max_wait_ms=1.0)
    srv.start()
    try:
        case = sorted(os.listdir(UCSF))[0].split("_nifti")[0]
        logits = srv.predict_subject(case)
        assert logits.shape == (2,) and np.isfinite(logits).all()
    finally:
        srv.stop()
