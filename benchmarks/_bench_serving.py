"""Measure /predict throughput+latency with concurrent clients.

Usage: python _bench_serving.py <port> <threads> <requests_per_thread>
Server must already be running on localhost:<port>.
"""
import json, sys, threading, time, urllib.request
import numpy as np

port, nthreads, nreq = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
body = json.dumps({"instances": [{
    "user_id": 1, "item_id": 10, "age": 25, "gender": "F",
    "occupation": "student", "zipcode": "85711", "release_year": 1994}]}).encode()

lat = [[] for _ in range(nthreads)]
def worker(i):
    for _ in range(nreq):
        t0 = time.monotonic()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            json.loads(r.read())
        lat[i].append(time.monotonic() - t0)

# warm
worker(0); lat[0].clear()
t0 = time.monotonic()
ts = [threading.Thread(target=worker, args=(i,)) for i in range(nthreads)]
for t in ts: t.start()
for t in ts: t.join()
dt = time.monotonic() - t0
all_lat = np.array([x for l in lat for x in l]) * 1e3
n = len(all_lat)
print(f"threads={nthreads} total={n} in {dt:.2f}s -> {n/dt:,.1f} req/s; "
      f"latency p50={np.percentile(all_lat,50):.1f} p95={np.percentile(all_lat,95):.1f} "
      f"p99={np.percentile(all_lat,99):.1f} ms")
