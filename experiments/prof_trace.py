"""Capture an XLA device trace of one flat2 LU run at N=8192 and dump the
largest-duration ops from the trace (self-parsed chrome trace JSON).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_trace.py > /tmp/prof_trace.log 2>&1 &
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
import numpy as np

from conflux_tpu.lu.single import _getrf_flat

LOGDIR = "/tmp/jaxtrace"


def main():
    rng = np.random.default_rng(42)
    n = 8192
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    f = jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
        *_getrf_flat(A, 512, "high")))
    out = f(A)
    float(out[0])  # compile+warm
    jax.profiler.start_trace(LOGDIR)
    out = f(A)
    float(out[0])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    time.sleep(2)
    paths = glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", paths, flush=True)
    if not paths:
        others = glob.glob(LOGDIR + "/**/*", recursive=True)
        print("all files:", others[:40], flush=True)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # aggregate by op name prefix
    from collections import Counter

    agg = Counter()
    for e in events:
        name = e.get("name", "?")
        agg[name] += e["dur"]
    total = sum(agg.values())
    print(f"total traced op-time {total/1e3:.1f} ms over {len(events)} events",
          flush=True)
    for name, dur in agg.most_common(40):
        print(f"{dur/1e3:9.2f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
