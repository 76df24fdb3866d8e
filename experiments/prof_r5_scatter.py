"""Round-5 probe for ops/pallas_scatter.scatter_rows — the enabling kernel
for crout 'pushup' compaction (VERDICT r4 item 1's structural lever).

Three questions, in escalation order:
  1. correctness on the real chip (small shapes; interpret-mode parity
     already passes on CPU but Mosaic lowering is the real test);
  2. does a CHAIN of aliased scatter calls on one carried buffer compile?
     (/tmp/schur_pallas2.log killed the helper on chained aliased custom
     calls through one buffer — but those were whole-matrix VMEM-blocked
     GEMM kernels; this one is ANY-memory row DMAs. Headline-scale shards:
     [32768, 16384] f32 = 2.1 GB < the 3.7e9 Mosaic operand ceiling.)
  3. per-step cost of a w-row scatter vs the ~12 ms/step compaction
     gather it would replace (250 ms over 21 steps at N=32768).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_r5_scatter.py > /tmp/prof_r5_scatter.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from conflux_tpu.ops.pallas_scatter import gather_rows, scatter_rows


def stage1_correctness():
    rng = np.random.default_rng(0)
    for (m, n, w, group) in [(1024, 512, 64, 8), (4096, 4096, 512, 8),
                             (4096, 4096, 512, 32)]:
        R = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
        src = jnp.asarray(rng.standard_normal((w, n)), jnp.float32)
        slots = jnp.asarray(rng.choice(m, w, replace=False).astype(np.int32))
        ref = R.at[slots].set(src)
        out = scatter_rows(R, src, slots, group=group)
        ok = bool(jnp.array_equal(out, ref))
        idx = jnp.asarray(rng.choice(m, w, replace=False).astype(np.int32))
        gok = bool(jnp.array_equal(gather_rows(R, idx, group=group), R[idx]))
        print(f"stage1 m={m} n={n} w={w} g={group}: scatter "
              f"{'OK' if ok else 'FAIL'} gather {'OK' if gok else 'FAIL'}",
              flush=True)
        if not (ok and gok):
            return False
    return True


def stage2_chain(m=32768, nh=16384, w=1536, steps=16, group=8):
    """Chained aliased scatters on one carried half-R buffer with a real
    op (column dus) between consecutive calls — the compile-death probe,
    plus the fenced e2e timing of the chain."""

    @jax.jit
    def chain(R, srcs, slots):
        for t in range(steps):
            # a real op between pallas calls (CLAUDE.md chain rule): the
            # panel write the real program does anyway
            R = jax.lax.dynamic_update_slice(
                R, R[:w, :128] * 0.5 + 1.0, (0, (t * 128) % nh))
            R = scatter_rows(R, srcs[t], slots[t], group=group)
        return jnp.sum(R[:4, :4])

    rng = np.random.default_rng(1)
    R = jnp.asarray(rng.standard_normal((m, nh)), jnp.float32)
    srcs = jnp.asarray(rng.standard_normal((steps, w, nh)), jnp.float32)
    slots = jnp.stack([
        jnp.asarray(rng.choice(m, w, replace=False).astype(np.int32))
        for _ in range(steps)])
    t0 = time.perf_counter()
    try:
        s = float(chain(R, srcs, slots))
    except Exception as e:
        print(f"stage2 chain: FAIL {type(e).__name__} {str(e)[:300]}",
              flush=True)
        return False
    print(f"stage2 chain compile+run {time.perf_counter()-t0:.0f} s "
          f"(sum {s:.3f})", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(R, srcs, slots))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    per = (med / steps) * 1e3
    gbps = 2 * w * nh * 4 / (med / steps) / 1e9
    print(f"stage2 chain med {med*1e3:.1f} ms -> {per:.2f} ms/step "
          f"({gbps:.0f} GB/s effective incl. dus)", flush=True)
    return True


def stage3_groups(m=32768, nh=16384, w=1536):
    """Group-size sweep: per-call scatter cost (16-call chain to amortize
    dispatch), vs the XLA full-compaction gather baseline."""
    rng = np.random.default_rng(2)
    R0 = jnp.asarray(rng.standard_normal((m, nh)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((w, nh)), jnp.float32)
    slotss = jnp.stack([
        jnp.asarray(rng.choice(m, w, replace=False).astype(np.int32))
        for _ in range(16)])

    for group in (4, 8, 16, 32):
        @jax.jit
        def loop(R, src, slotss):
            for t in range(16):
                R = scatter_rows(R, src * (t + 1), slotss[t], group=group)
                R = jax.lax.dynamic_update_slice(R, R[:8, :128] + 1.0, (0, 0))
            return jnp.sum(R[:4, :4])

        try:
            float(loop(R0, src, slotss))
        except Exception as e:
            print(f"stage3 group={group}: FAIL {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(R0, src, slotss))
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[1] / 16
        print(f"stage3 group={group}: {med*1e3:.2f} ms/scatter "
              f"({2*w*nh*4/med/1e9:.0f} GB/s)", flush=True)

    # baseline: one full live-row compaction gather of the same half
    live = jnp.asarray(
        np.sort(rng.choice(m, m - w, replace=False)).astype(np.int32))

    @jax.jit
    def gather_base(R, live):
        return jnp.sum(R[live][:4, :4])

    float(gather_base(R0, live))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(gather_base(R0, live))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(f"stage3 XLA compaction-gather baseline ({m-w} rows x {nh}): "
          f"{med*1e3:.2f} ms ({2*(m-w)*nh*4/med/1e9:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    if stage1_correctness():
        if stage2_chain():
            stage3_groups()
    print("done", flush=True)
