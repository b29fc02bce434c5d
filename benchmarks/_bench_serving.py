"""Serving benchmarks.

Mode 1 — live HTTP throughput/latency with concurrent clients:
    python -m benchmarks._bench_serving <port> <threads> <requests_per_thread>
    (server must already be running on localhost:<port>)

Mode 2 — request-parse A/B (round-4 VERDICT item 8: the native JSON-column
parser must ENGAGE across batch sizes, with json.loads only for malformed
input):
    python -m benchmarks._bench_serving parse [sizes...]
    Default sizes 64 1024 10240. For each size: builds a realistic request
    body (strings with occasional escapes/UTF-8 riding the widened native
    coverage), verifies the native parser engaged (parse_json_instances
    is not None), and times native vs the json.loads+instances_to_columns
    fallback.
"""
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def parse_bench(sizes):
    from rectpu.io import native
    from rectpu.serve.server import instances_to_columns

    assert native.available(), "native lib not built"
    rng = np.random.default_rng(0)
    occupations = ["student", "engineer", "artist", "écrivain", "none\\other"]
    for n in sizes:
        instances = [
            {
                "user_id": int(rng.integers(1, 1000)),
                "item_id": int(rng.integers(1, 1700)),
                "age": int(rng.integers(18, 70)),
                "gender": "F" if rng.random() < 0.5 else "M",
                "occupation": occupations[int(rng.integers(0, len(occupations)))],
                "zipcode": f"{int(rng.integers(0, 99999)):05d}",
                "release_year": int(rng.integers(1950, 2000)),
                "action": bool(rng.random() < 0.3),
            }
            for _ in range(n)
        ]
        body = json.dumps({"instances": instances}).encode()

        got = native.parse_json_instances(body)
        assert got is not None, f"native parser did NOT engage at {n} rows"
        assert got[1] == n

        reps = max(3, 2_000_000 // max(len(body), 1))
        t0 = time.perf_counter()
        for _ in range(reps):
            native.parse_json_instances(body)
        t_native = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        for _ in range(reps):
            instances_to_columns(json.loads(body)["instances"])
        t_py = (time.perf_counter() - t0) / reps

        print(
            f"rows={n:6d} body={len(body) / 1e3:8.1f} kB  native engaged: yes  "
            f"native {1e3 * t_native:7.3f} ms  json.loads {1e3 * t_py:7.3f} ms  "
            f"speedup {t_py / t_native:5.1f}x",
            flush=True,
        )


def http_bench(port, nthreads, nreq):
    body = json.dumps({"instances": [{
        "user_id": 1, "item_id": 10, "age": 25, "gender": "F",
        "occupation": "student", "zipcode": "85711", "release_year": 1994}]}).encode()

    lat = [[] for _ in range(nthreads)]

    def worker(i):
        for _ in range(nreq):
            t0 = time.monotonic()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=60) as r:
                json.loads(r.read())
            lat[i].append(time.monotonic() - t0)

    worker(0)
    lat[0].clear()  # warm
    t0 = time.monotonic()
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(nthreads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    dt = time.monotonic() - t0
    all_lat = np.array([x for l in lat for x in l]) * 1e3
    n = len(all_lat)
    print(f"threads={nthreads} total={n} in {dt:.2f}s -> {n/dt:,.1f} req/s; "
          f"latency p50={np.percentile(all_lat,50):.1f} "
          f"p95={np.percentile(all_lat,95):.1f} "
          f"p99={np.percentile(all_lat,99):.1f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse_bench([int(s) for s in sys.argv[2:]] or [64, 1024, 10240])
    else:
        http_bench(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
