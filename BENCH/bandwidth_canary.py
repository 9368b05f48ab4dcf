"""Memory-bandwidth canary for the scaling-pair evidence (r6).

Measures aggregate throughput of the pull superstep's dominant kernel —
a random gather + multiply + bincount over arrays far larger than LLC —
run by 1, 4, 8, and 32 CONCURRENT PROCESSES (one numpy thread each, like
Spark local-mode tasks). If per-process throughput collapses as workers
grow while aggregate throughput plateaus, the host's shared DRAM
bandwidth — not the engine — is the scaling ceiling for the high
local[N] levels; a real 4N-executor cluster multiplies sockets and
memory channels along with cores.

Usage: python BENCH/bandwidth_canary.py  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N_EDGES = 8_000_000    # per-worker gather size (~64 MB of int64 indices)
N_NODES = 4_000_000    # rank-vector length (~32 MB, larger than LLC slices)
REPS = 6


def _worker(q: mp.Queue) -> None:
    os.environ["OMP_NUM_THREADS"] = "1"
    import numpy as np

    rng = np.random.RandomState(7)
    src = rng.randint(0, N_NODES, size=N_EDGES).astype(np.int64)
    slice_pos = rng.randint(0, N_NODES, size=N_EDGES).astype(np.int32)
    w = rng.rand(N_EDGES)
    p = rng.rand(N_NODES)
    buf = np.empty(N_EDGES)
    # warm-up (page in)
    np.take(p, src, out=buf)
    t0 = time.time()
    for _ in range(REPS):
        np.take(p, src, out=buf)          # gather
        np.multiply(buf, w, out=buf)      # weight
        np.bincount(slice_pos, weights=buf, minlength=N_NODES)  # scatter-add
    dt = time.time() - t0
    q.put(REPS * N_EDGES / dt)  # edges/sec for this worker


def run_level(workers: int) -> dict:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(workers)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    agg = sum(rates)
    return {
        "workers": workers,
        "edges_per_sec_aggregate": round(agg),
        "edges_per_sec_per_worker": round(agg / workers),
    }


def main() -> None:
    out = [run_level(k) for k in (1, 4, 8, 32)]
    base = out[0]["edges_per_sec_per_worker"]
    for lv in out:
        lv["per_worker_vs_1"] = round(lv["edges_per_sec_per_worker"] / base, 3)
    print(json.dumps({"kernel": "gather+mul+bincount", "n_edges_per_worker": N_EDGES,
                      "n_nodes": N_NODES, "levels": out}))


if __name__ == "__main__":
    main()
