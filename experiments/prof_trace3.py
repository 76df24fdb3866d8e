"""Trace flat3 LU at N=16384 v=512 and flat Cholesky at N=16384, print
aggregated device-op attribution.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_trace3.py > /tmp/prof_trace3.log 2>&1 &
"""

import glob
import gzip
import json
import os
import time
from collections import Counter

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.cholesky.single import cholesky
from conflux_tpu.lu.single import lu_factor


def capture(tag, f, A):
    logdir = f"/tmp/jaxtrace_{tag}"
    out = f(A)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    jax.profiler.start_trace(logdir)
    out = f(A)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    jax.profiler.stop_trace()
    time.sleep(1)
    path = max(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True),
               key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    ev = [e for e in data["traceEvents"] if e.get("ph") == "X" and "dur" in e
          and not e["name"].startswith(("$", "np.", "jit_", "Pjit"))]
    cnt, dur = Counter(), Counter()
    for e in ev:
        key = e["name"].split(".")[0]
        cnt[key] += 1
        dur[key] += e["dur"]
    print(f"== {tag} ==", flush=True)
    for kk, d in dur.most_common(18):
        print(f"{d/1e3:10.2f} ms  x{cnt[kk]:6d}  {kk[:70]}", flush=True)


def main():
    rng = np.random.default_rng(42)
    n = 16384
    A = jnp.asarray(5.0 + rng.random((n, n), dtype=np.float32))
    capture("rec_lu", jax.jit(lambda A: (lambda F, p: (jnp.sum(F), p[0]))(
        *lu_factor(A, v=512, precision="high", scheme="recursive"))), A)
    S = (A + A.T) / 2 + 2 * n * jnp.eye(n, dtype=jnp.float32)
    del A
    capture("flat_chol", jax.jit(lambda A: jnp.sum(
        cholesky(A, v=512, precision="high", scheme="recursive"))), S)
    print("done", flush=True)


if __name__ == "__main__":
    main()
