"""Round-3 headline decisions at N=32768 (memory-lean successor of
prof_r3b, which OOMed holding F + a resident 4 GB U during the residual):

  1. crout 'high' (bf16x3) residual — does the one-shot-GEMM crout scheme
     hold the 1e-6 gate at the headline size? (the linchpin: 949 ms =
     24.7 TF/s would be a GATE-PASSING headline)
  2. swap vs gather compaction A/B ('high' + bf16-STORAGE) — the
     per-step full-width live-row gather is modeled at ~300 ms of the
     949; swap moves <= v rows/step instead.
  3. 'bf16' single-pass timing + residual at 32768 (16384 measured
     3.0e-6 — confirm the fail scaling).
  4. crout v=2048 'high' timing (K-granularity vs panel cost).

Residuals are computed with F as the ONLY resident factor buffer (triu
slice taken per chunk inside the jit), so peak extra memory is one
[CHUNK, n] block set.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3c.py > /tmp/prof_r3c.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST
CHUNK = 2048


def gen_rows(key, idx, n):
    return jax.vmap(
        lambda r: 5.0 + jax.random.uniform(jax.random.fold_in(key, r), (n,))
    )(idx)


def run_cfg(n, v, precision, reps=3, resid=True, compaction="gather",
            dtype="f32"):
    from conflux_tpu.lu.single import lu_factor

    key = jax.random.key(42)

    @jax.jit
    def fact(key):
        A = gen_rows(key, jnp.arange(n, dtype=jnp.int32), n)
        if dtype == "bf16":
            A = A.astype(jnp.bfloat16)
        F, perm = lu_factor(A, v=v, precision=precision, scheme="crout",
                            compaction=compaction)
        return jnp.sum(F.astype(jnp.float32)), F, perm

    try:
        s, F, perm = fact(key)
        float(s)
    except Exception as e:
        print(f"crout/{compaction:6s} N={n} v={v} {precision}/{dtype}: FAIL "
              f"{type(e).__name__} {str(e)[:110]}", flush=True)
        return
    ts = []
    for _ in range(reps):
        del s, F, perm  # free the previous outputs before the next run
        t0 = time.perf_counter()
        s, F, perm = fact(key)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    line = (f"crout/{compaction:6s} N={n} v={v} {precision}/{dtype}: "
            f"med {med*1e3:8.1f} ms {tf:6.1f} TF/s "
            f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]")
    if not resid:
        print(line, flush=True)
        return

    # blocked on-device residual: F is the only resident factor buffer;
    # PA rows regenerate from the row-keyed RNG
    @jax.jit
    def resid_block(F, pb, r0):
        Lb = jax.lax.dynamic_slice(
            F, (r0, 0), (CHUNK, n)).astype(jnp.float32)
        U = jnp.triu(F[:n].astype(jnp.float32))
        r = r0 + jnp.arange(CHUNK)[:, None]
        c = jnp.arange(n)[None, :]
        Lmask = jnp.where(c < r, Lb, 0) + ((c == r) & (r < n)).astype(
            jnp.float32)
        recon = jnp.dot(Lmask, U, precision=_PREC)
        PA = gen_rows(key, pb, n)
        R = PA - recon
        return jnp.sum(R * R), jnp.sum(PA * PA)

    r2 = a2 = 0.0
    for r0 in range(0, n, CHUNK):
        s2, sa = resid_block(F, jax.lax.dynamic_slice(perm, (r0,), (CHUNK,)),
                             r0)
        r2 += float(s2)
        a2 += float(sa)
    res = (r2 ** 0.5) / (n * a2 ** 0.5)
    gate = "PASS" if res <= 1e-6 else "fail"
    print(line + f"  resid {res:.2e} [{gate}]", flush=True)


def main():
    n = 32768
    # 1. the linchpin: gate check of the current headline config
    run_cfg(n, 1024, "high")
    # 2. swap-compaction A/B
    run_cfg(n, 1024, "high", compaction="swap")
    run_cfg(n, 1024, "high", compaction="swap", dtype="bf16", resid=False)
    run_cfg(n, 1024, "high", dtype="bf16", resid=False)  # gather bf16s ref
    # 3. single-pass bf16 precision: fail margin at the headline size
    run_cfg(n, 1024, "bf16", compaction="swap")
    # 4. tile-size sweep
    run_cfg(n, 2048, "high", compaction="swap", resid=False)
    print("done", flush=True)


if __name__ == "__main__":
    main()
