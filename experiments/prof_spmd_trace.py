"""Device trace of the 1x1x1-grid SPMD windowed LU at N=16384 v=1024
'high' (the VERDICT #4 target: 289 ms today vs 190 ms flat single-chip;
goal <= 218 ms). Prints the per-source-line cost table so the gap is
attributed, not guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_spmd_trace.py > /tmp/prof_spmd_trace.log 2>&1 &
"""

import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.grid import make_grid
from conflux_tpu.layout import BlockCyclic, distribute
from conflux_tpu.lu.p25d import lu_25d

LOGDIR = "/tmp/jaxtrace_spmd"
N, V = 16384, 1024


def main():
    grid = make_grid((1, 1, 1))
    desc = BlockCyclic.create(N, N, V, grid)
    A = jax.jit(lambda key: 5.0 + jax.random.uniform(
        key, (N, N), jnp.float32))(jax.random.key(42))
    G = distribute(A, desc)
    del A

    def run(G):
        F, piv = lu_25d(G, desc, "tournament", "high", "windowed", windows=4)
        return jnp.sum(F), piv[0]

    s, _ = run(G)
    float(s)  # compile + warm
    t0 = time.perf_counter()
    s, _ = run(G)
    float(s)
    print(f"warm wall: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    jax.profiler.start_trace(LOGDIR)
    s, _ = run(G)
    float(s)
    jax.profiler.stop_trace()

    time.sleep(2)
    paths = glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace files", flush=True)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    ev = [e for e in data.get("traceEvents", [])
          if e.get("ph") == "X" and "dur" in e
          and e.get("args", {}).get("device_duration_ps")]
    agg = defaultdict(lambda: [0.0, 0, 0.0])
    tot = 0.0
    for e in ev:
        a = e["args"]
        if e["name"].startswith(("$", "np.asarray", "jit_run")):
            continue
        key = (a.get("source", "?").split("/")[-1], a.get("hlo_category", "?"))
        agg[key][0] += e["dur"] / 1e3
        agg[key][1] += 1
        agg[key][2] += float(a.get("model_flops", 0) or 0)
        tot += e["dur"] / 1e3
    print(f"device total {tot:.1f} ms", flush=True)
    for key, (d, c, f) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
        tf = f / (d / 1e3) / 1e12 if d else 0
        print(f"{d:8.1f} ms x{c:5d}  {tf:6.1f} TF/s  {key[0]:40s} {key[1]}",
              flush=True)


if __name__ == "__main__":
    main()
