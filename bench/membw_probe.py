"""Engine-independent memory-bandwidth probe.

Purpose (VERDICT r03 Next #1): corroborate — with NO Ray involvement — that this
box's aggregate DRAM bandwidth saturates between 8 and 16 concurrent workers,
which is the builder's justification for the canonical scaling pair being 2→8
CPUs rather than 4→16 (a real N→4N *cluster* scales memory controllers with
node count; a single shared box does not).

Method: spawn K independent OS processes (multiprocessing, spawn-free fork);
each allocates three float64 arrays far larger than L3 and runs a STREAM-style
triad `a = b + s*c` R times, timing only the triad loop (allocation excluded,
start barrier so all K run concurrently). Per-process bandwidth is
3*8*n*R/elapsed bytes/s (2 reads + 1 write per element). If the box had
independent per-worker memory paths, per-process bandwidth would be flat in K;
a shared-controller ceiling shows up as per-process bandwidth falling once
K crosses the saturation point while aggregate bandwidth plateaus.

Output: one JSON line per K with per-process median bandwidth, aggregate
bandwidth, and the per-process slowdown vs K=2. No Ray, no Arrow, no engine
code — numpy only.

Usage: python bench/membw_probe.py [--sizes 2,8,16,32] [--mib 256] [--reps 8]
"""
import argparse
import json
import multiprocessing as mp
import time


def _triad_worker(n: int, reps: int, barrier, out, idx: int) -> None:
    import numpy as np

    b = np.random.default_rng(idx).random(n)
    c = np.random.default_rng(idx + 1000).random(n)
    a = np.empty(n)
    # warm the pages so the timed loop measures steady-state DRAM traffic
    np.add(b, c, out=a)
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        np.multiply(c, 1.000001, out=a)
        np.add(a, b, out=a)
    dt = time.perf_counter() - t0
    # triad as two kernels: mul = 1R+1W, add = 2R+1W -> 5 accesses * 8B per elem per rep
    out[idx] = (5.0 * 8.0 * n * reps) / dt


def run_level(k: int, mib: int, reps: int) -> dict:
    n = mib * 1024 * 1024 // 8
    barrier = mp.Barrier(k)
    out = mp.Array("d", k)
    procs = [
        mp.Process(target=_triad_worker, args=(n, reps, barrier, out, i))
        for i in range(k)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    import numpy as np

    per = sorted(out[:])
    med = float(np.median(per))
    return {
        "k": k,
        "per_proc_median_gbps": round(med / 1e9, 3),
        "aggregate_gbps": round(sum(per) / 1e9, 3),
        "per_proc_min_gbps": round(per[0] / 1e9, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2,8,16,32")
    ap.add_argument("--mib", type=int, default=256, help="array MiB per buffer per proc")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3, help="repeat each K, keep best (least-noise) round")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    results = {}
    for rnd in range(args.rounds):
        for k in sizes:
            r = run_level(k, args.mib, args.reps)
            prev = results.get(k)
            # keep the round with the highest per-proc median: noise only slows
            if prev is None or r["per_proc_median_gbps"] > prev["per_proc_median_gbps"]:
                results[k] = r
            print(json.dumps({"round": rnd, **r}), flush=True)

    base = results[sizes[0]]["per_proc_median_gbps"]
    summary = []
    for k in sizes:
        r = results[k]
        r["per_proc_vs_k%d" % sizes[0]] = round(r["per_proc_median_gbps"] / base, 3)
        summary.append(r)
    print(json.dumps({"probe": "numpy-triad", "mib_per_buffer": args.mib, "best": summary}))


if __name__ == "__main__":
    main()
