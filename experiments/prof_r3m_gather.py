"""Gather-rate probe for the tiled-raw-panel crout design: is a row
gather from a CONTIGUOUS [m, v] column panel fast (streaming-ish), or
descriptor-bound like the monolithic column-sliced gather that sank the
'split' compaction (2175 vs 943 ms, experiments/prof_r3f.py)?

Cases (all amortized REPS x inside one jit via a data-dependent index so
nothing folds):
  mono-full   : live-row gather from [32768, 32768] f32, full width
                (the current compaction; known ~680 GB/s)
  panel-f32   : live-row gather from a contiguous [32768, 1536] f32
                (per-step panel read of the tiled design @ headline)
  panel-bf16  : live-row gather from a contiguous [65536, 1024] bf16
                (per-step panel read of the tiled STEPPED design)
  mono-slice  : live-row gather of a 1536-col SLICE of the monolithic
                array (the 'split' loser, as control)
  piv-rows    : 1536-row gather from [32768, 1536] f32 (rhs/pivot reads)

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3m_gather.py > /tmp/prof_r3m.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

REPS = 8


def bench(label, make_arr, nidx, take_cols=None):
    m = None

    @jax.jit
    def run(key):
        A = make_arr(key)
        mm = A.shape[0]
        idx = jnp.sort(jax.random.choice(jax.random.key(7), mm, (nidx,),
                                         replace=False))

        def body(i, s):
            ix = idx + (s.astype(jnp.int32) & 0)
            G = A[ix] if take_cols is None else A[ix, :take_cols]
            return s + G[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    key = jax.random.key(3)
    try:
        float(run(key))
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(key))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1] / REPS
    return med


def main():
    cases = [
        ("mono-full  f32[32768,32768] 16k rows",
         lambda k: jax.random.uniform(k, (32768, 32768), jnp.float32),
         16384, None, 16384 * 32768 * 4),
        ("panel-f32  f32[32768,1536]  16k rows",
         lambda k: jax.random.uniform(k, (32768, 1536), jnp.float32),
         16384, None, 16384 * 1536 * 4),
        ("panel-bf16 bf16[65536,1024] 32k rows",
         lambda k: jax.random.uniform(k, (65536, 1024),
                                      jnp.float32).astype(jnp.bfloat16),
         32768, None, 32768 * 1024 * 2),
        ("mono-slice f32[32768,32768][:, :1536] 16k rows",
         lambda k: jax.random.uniform(k, (32768, 32768), jnp.float32),
         16384, 1536, 16384 * 1536 * 4),
        ("piv-rows   f32[32768,1536]  1536 rows",
         lambda k: jax.random.uniform(k, (32768, 1536), jnp.float32),
         1536, None, 1536 * 1536 * 4),
    ]
    for label, mk, nidx, cols, nbytes in cases:
        med = bench(label, mk, nidx, cols)
        if med:
            rate = 2 * nbytes / med / 1e9  # read + write
            print(f"{label}: {med*1e3:8.2f} ms  {rate:7.1f} GB/s (r+w)",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
