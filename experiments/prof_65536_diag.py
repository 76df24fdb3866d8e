"""Diagnose the N=65536 flat-stepped slowdown: 5246 s measured
(/tmp/prof_65536_flat2.log) vs a ~10 s compute+traffic floor
(280 TFLOP bf16out at ~36 TF/s + 550 GB of in-place trailing traffic).
Prime suspects: (a) the documented HBM-pressure cliff (~100x degradation
when the working set nears 13 GB — per-step f32 temps on top of the
8.6 GB bf16 buffer), (b) a whole-buffer copy per chunked trailing add
(XLA in-place analysis giving up on the column-sliced dus/add), (c) the
Mosaic route not engaging (_pallas_mode_ok false at these shapes).

Runs steps k=0..3 individually, printing per-step wall time and
device memory_stats (peak/in-use) after each.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_65536_diag.py > /tmp/prof_65536_diag.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.lu.stepped import _make_step, _make_step_chunked
from conflux_tpu.lu.single import _pallas_mode_ok

N, V, CHUNK = 65536, 1024, 8192


def memstats():
    s = jax.local_devices()[0].memory_stats() or {}
    gb = 1e9
    return (f"in_use {s.get('bytes_in_use', 0)/gb:.2f} GB, "
            f"peak {s.get('peak_bytes_in_use', 0)/gb:.2f} GB, "
            f"limit {s.get('bytes_limit', 0)/gb:.2f} GB")


def main():
    key = jax.random.key(0)
    # in-device generation straight to bf16 (no host round trip): row-block
    # dus into a donated buffer, f32 RNG temps only [4096, N]
    upd = jax.jit(
        lambda buf, kk, r: jax.lax.dynamic_update_slice(
            buf, (5.0 + jax.random.uniform(kk, (4096, N), jnp.float32)
                  ).astype(jnp.bfloat16), (r, 0)),
        donate_argnums=(0,), static_argnums=(2,))
    R = jnp.zeros((N, N), jnp.bfloat16)
    for r in range(0, N, 4096):
        R = upd(R, jax.random.fold_in(key, r), r)
    float(jnp.sum(R[0].astype(jnp.float32)))
    print(f"[diag] gen done; {memstats()}", flush=True)
    mode_ok = _pallas_mode_ok(R, "bf16out", V, N)
    print(f"[diag] _pallas_mode_ok(bf16out, c0=V) = {mode_ok}", flush=True)

    avail = jnp.ones(N, bool)
    for k in range(0, 4 * V, V):
        step = _make_step(k, V, N, N, "high", CHUNK, True)
        t0 = time.perf_counter()
        R, avail, piv = step(R, avail)
        p0 = int(piv[0])  # sync fence (4-byte readback)
        dt = time.perf_counter() - t0
        print(f"[diag] step k={k:6d}: {dt*1e3:9.1f} ms (first run, incl "
              f"compile); {memstats()}", flush=True)
    # steady-state timing of one mid-matrix-shaped step without recompiles:
    # re-run step 3's executable shape via a fresh cache entry is impossible
    # (k is static), so re-time step 3 by reusing its jit on the SAME R
    # shape — correctness irrelevant here, timing only
    step = _make_step(3 * V, V, N, N, "high", CHUNK, True)
    t0 = time.perf_counter()
    R, avail, piv = step(R, avail)
    p0 = int(piv[0])
    print(f"[diag] step k={3*V} rerun (warm): "
          f"{(time.perf_counter()-t0)*1e3:9.1f} ms; {memstats()}", flush=True)

    # --- chunked-storage step (the fix): same shapes, R split in chunks.
    # Splitting the live monolith would transiently hold 17 GB; free it and
    # regenerate column blocks directly (timing-only probe — values differ)
    del R, avail, piv
    bounds = [(j, min(j + CHUNK, N)) for j in range(0, N, CHUNK)]
    genc = jax.jit(lambda kk: (
        5.0 + jax.random.uniform(kk, (N, CHUNK), jnp.float32)
    ).astype(jnp.bfloat16))
    chunks = []
    for j0, j1 in bounds:
        chunks.append(genc(jax.random.fold_in(key, 1000 + j0)))
        _ = float(jnp.sum(chunks[-1][0].astype(jnp.float32)))
    chunks = tuple(chunks)
    avail = jnp.ones(N, bool)
    print(f"[diag] split into {len(chunks)} chunks; {memstats()}", flush=True)
    for k in range(0, 6 * V, V):
        stepc = _make_step_chunked(k, V, N, N, "high", CHUNK, True,
                                   len(chunks))
        t0 = time.perf_counter()
        outs = stepc(avail, *chunks)
        avail, piv, chunks = outs[0], outs[1], outs[2:]
        p0 = int(piv[0])
        dt = time.perf_counter() - t0
        print(f"[diag] chunked step k={k:6d}: {dt*1e3:9.1f} ms (incl "
              f"compile on first); {memstats()}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
