"""Serving latency/throughput on the real chip: drive drivers/serve.py over
HTTP with the flagship ModelCross checkpoint.

Measures, through the full production path (HTTP → .npy parse → micro-batch
dispatch → bucket-padded jitted forward → JSON):
  * cold-free p50/p99 single-request latency (sequential, batch-1 bucket)
  * saturated throughput with 16 concurrent clients (micro-batching fills
    the largest bucket)

Usage: python benchmarks/bench_serve.py --checkpoint <npz> [--img-types ...]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def post(base: str, vols: np.ndarray) -> dict:
    buf = io.BytesIO()
    np.save(buf, vols)
    req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(),
                                 method="POST")
    return json.load(urllib.request.urlopen(req))


def post_maybe_shed(base: str, vols: np.ndarray) -> tuple[bool, float]:
    """(served?, seconds).  503 (shed) counts as not-served; the client
    honors Retry-After by sleeping it off before returning."""
    import urllib.error

    t0 = time.monotonic()
    try:
        post(base, vols)
        return True, time.monotonic() - t0
    except urllib.error.HTTPError as e:
        if e.code != 503:
            raise
        retry = float(e.headers.get("Retry-After", 1))
        e.read()
        time.sleep(retry)
        return False, time.monotonic() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="cross")
    p.add_argument("--img-types", nargs="+", default=["DWI", "SWI", "ASL"])
    p.add_argument("--requests", type=int, default=40)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--overload-queue", type=int, default=8,
                   help="queue bound (volumes) for the overload phase "
                        "(32 clients against it shows bounded p99 + sheds)")
    p.add_argument("--jit-cache", default=None)
    p.add_argument("--quantize", default=None,
                   choices=["int8", "int8+attn"],
                   help="serve with w8a8 FFN (int8) or FFN+attention "
                        "projections (int8+attn); see docs/PERF_r05.md for "
                        "the measured selection guidance")
    args = p.parse_args()

    from cross_attention_vit_tpu.drivers.serve import InferenceServer, serve

    if args.jit_cache:
        from cross_attention_vit_tpu.utils.misc import enable_compilation_cache

        enable_compilation_cache(args.jit_cache)

    srv = InferenceServer(args.checkpoint, args.model,
                          img_types=tuple(args.img_types),
                          buckets=(1, 2, 4, 8), max_wait_ms=5.0,
                          quantize=args.quantize)
    t0 = time.monotonic()
    httpd = serve(srv, host="127.0.0.1", port=0)
    warmup_s = time.monotonic() - t0
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    cfg = srv.cfg
    rng = np.random.default_rng(0)
    vol = (rng.normal(size=(1, cfg.num_modalities, 1, *cfg.img_size)) * 800
           ).astype(np.float32)

    # sequential batch-1 latency (the idle-server case)
    lat = []
    for _ in range(args.requests):
        t = time.monotonic()
        out = post(base, vol)
        lat.append((time.monotonic() - t) * 1e3)
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(0.99 * len(lat)))]

    # saturated: N concurrent clients, micro-batching coalesces
    done = []
    lock = threading.Lock()

    def client(n):
        for _ in range(n):
            post(base, vol)
            with lock:
                done.append(time.monotonic())

    per_client = max(2, args.requests // args.clients)
    t0 = time.monotonic()
    threads = [threading.Thread(target=client, args=(per_client,))
               for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    n_sat = args.clients * per_client

    # overload: 2x the clients, small queue bound — p99 of SERVED requests
    # must stay bounded (the shed path, 503 + Retry-After, absorbs the rest)
    srv.max_queue_volumes = args.overload_queue
    served_lat, shed_count = [], [0]
    olock = threading.Lock()

    def overload_client(n):
        for _ in range(n):
            ok, dt = post_maybe_shed(base, vol)
            with olock:
                if ok:
                    served_lat.append(dt * 1e3)
                else:
                    shed_count[0] += 1

    oc = args.clients * 2
    threads = [threading.Thread(target=overload_client, args=(per_client,))
               for _ in range(oc)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    overload_wall = time.monotonic() - t0
    served_lat.sort()
    op99 = (served_lat[min(len(served_lat) - 1, int(0.99 * len(served_lat)))]
            if served_lat else None)
    stats = json.load(urllib.request.urlopen(f"{base}/stats"))

    httpd.shutdown()
    srv.stop()
    print(json.dumps({
        "metric": "serve_batch1_http_p50_ms", "value": round(p50, 2),
        "unit": "ms (HTTP round-trip, batch-1 bucket, full-size ModelCross)",
        "p99_ms": round(p99, 2),
        "saturated_volumes_per_sec": round(n_sat / wall, 2),
        "saturated_clients": args.clients,
        "batch_histogram": stats["batch_histogram"],
        "overload_clients": oc,
        "overload_queue_volumes": args.overload_queue,
        "overload_served": len(served_lat),
        "overload_shed": shed_count[0],
        "overload_served_p99_ms": round(op99, 2) if op99 else None,
        "overload_volumes_per_sec": round(len(served_lat) / overload_wall, 2),
        "stats_shed_requests": stats["shed_requests"],
        "device_ms_p50": stats["device_ms"]["p50"],
        "transfer_ms_p50": stats["transfer_ms"]["p50"],
        "warmup_s": round(warmup_s, 1),
        "params_m": round(srv.n_params / 1e6, 1),
        "quantize": args.quantize,
        "quantized_kernels": srv.quantized_kernels,
    }))


if __name__ == "__main__":
    main()
