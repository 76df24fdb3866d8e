"""Device trace of the crout headline config (N=32768 v=1024 'high',
gather compaction): exact per-op breakdown of the 943 ms — replaces the
dispatch-floor-contaminated standalone attribution of prof_crout_split.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_crout_trace.py > /tmp/prof_crout_trace.log 2>&1 &
"""

import glob
import gzip
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.single import lu_factor

import sys

LOGDIR = "/tmp/jaxtrace_crout"
N, V = 32768, int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def main():
    @jax.jit
    def run(key):
        A = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
        # scheme left at 'auto' (resolves to crout at these sizes): an
        # explicit scheme string is a DIFFERENT static arg -> cache miss ->
        # fresh remote compile, and the v=1536 recompile has twice drawn
        # the helper's OOM SIGKILL; matching bench.py's signature exactly
        # reuses its cached executable
        F, perm = lu_factor(A, v=V, precision="high")
        return jnp.sum(F), perm[0]

    key = jax.random.key(42)
    s, _ = run(key)
    float(s)  # compile + warm
    t0 = time.perf_counter()
    jax.profiler.start_trace(LOGDIR)
    s, _ = run(key)
    float(s)
    jax.profiler.stop_trace()
    print(f"traced run wall: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    time.sleep(2)
    paths = glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if not paths:
        print("all files:",
              glob.glob(LOGDIR + "/**/*", recursive=True)[:40], flush=True)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    from collections import Counter

    agg = Counter()
    cnt = Counter()
    for e in events:
        name = e.get("name", "?")
        agg[name] += e["dur"]
        cnt[name] += 1
    total = sum(agg.values())
    print(f"total traced op-time {total/1e3:.1f} ms over {len(events)} "
          f"events", flush=True)
    for name, dur in agg.most_common(50):
        print(f"{dur/1e3:9.2f} ms  x{cnt[name]:4d}  {name[:100]}",
              flush=True)


if __name__ == "__main__":
    main()
