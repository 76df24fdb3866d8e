"""A/B the two-level Mosaic panel kernel (f0d90da) against the single-level
one (f0d90da~1, snapshotted to /tmp/pallas_panel_old.py), K-amortized:
REPS back-to-back kernel calls inside one jit, chained through the block
values so nothing is CSE'd or hoisted.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_panel_ab.py > /tmp/panel_ab.log 2>&1 &
"""

import importlib.util
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.pallas_panel import rank1_block_pallas_t as new_kernel

spec = importlib.util.spec_from_file_location("ppold",
                                              "/tmp/pallas_panel_old.py")
old = importlib.util.module_from_spec(spec)
sys.modules["ppold"] = old
spec.loader.exec_module(old)
old_kernel = old.rank1_block_pallas_t

REPS = 16


def bench(name, kern, w, m):
    @jax.jit
    def run(key):
        Mt = jax.random.normal(key, (w, m), jnp.float32)
        availf = jnp.ones((1, m), jnp.float32)
        s = jnp.float32(0)
        for _ in range(REPS):
            mt, availf2, piv, ok = kern(Mt, availf)
            s = s + mt[0, 0]
            Mt = mt  # chain: next call consumes the previous output
        return s

    key = jax.random.key(1)
    float(run(key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS * 1e6
    print(f"{name:6s} w={w} m={m:6d}: {per:9.1f} us/call", flush=True)


if __name__ == "__main__":
    for m in (32768, 16384, 8192, 1024):
        for name, kern in (("old", old_kernel), ("new", new_kernel)):
            bench(name, kern, 128, m)
    print("done", flush=True)
