"""Round-3 follow-up probe: (a) can a 'bf16' trailing-precision (f32
STORAGE) headline pass the reference's N-normalized 1e-6 residual gate at
N=32768 while riding XLA's ~60 TF/s big-K bf16 dot, and (b) crout tile-size
sweep at N=32768.

Context (prof_crout.log, 2026-08-18): XLA's dot beats the big-K Mosaic
kernel at every left-looking shape ('high' 37.7 vs 30.7 TF/s, 'bf16' 62.8
vs 48.6 at K=16384), so crout's ceiling is set by XLA's K-weighted rate;
'bf16' roughly halves the trailing cost vs bf16x3.

Each config reports BOTH the wall time and the full on-device
||PA - LU||_F / (N ||A||_F) residual (row-keyed RNG regeneration, same
machinery as prof_fused_e2e.py) so gate decisions use measured numbers.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_r3b.py > /tmp/prof_r3b.log 2>&1 &
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


def gen_A(key, m, n):
    return gen_rows(key, jnp.arange(m, dtype=jnp.int32), n)


def run_cfg(n, v, precision, scheme, reps=3, resid=True, part=1):
    from conflux_tpu.lu.single import lu_factor

    @jax.jit
    def fact(key):
        F, perm = lu_factor(gen_A(key, n, n), v=v, precision=precision,
                            scheme=scheme, partition=part)
        return jnp.sum(F), F, perm

    key = jax.random.key(42)
    try:
        s, F, perm = fact(key)
        float(s)
    except Exception as e:
        print(f"{scheme:6s} N={n} v={v} {precision:7s}: FAIL "
              f"{type(e).__name__} {str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, F, perm = fact(key)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = 2 * n**3 / 3 / med / 1e12
    line = (f"{scheme:6s} N={n} v={v} {precision:7s} part={part}: "
            f"med {med*1e3:8.1f} ms {tf:6.1f} TF/s "
            f"[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]")
    if not resid:
        print(line, flush=True)
        return

    # on-device blocked residual: U stays resident, PA rows regenerate from
    # the row-keyed RNG, L rows stream in CHUNK blocks
    @jax.jit
    def resid_block(U, Lb, pb, r0):
        r = r0 + jnp.arange(Lb.shape[0])[:, None]
        c = jnp.arange(n)[None, :]
        Lmask = jnp.where(c < r, Lb, 0) + ((c == r) & (r < n)).astype(U.dtype)
        recon = jnp.dot(Lmask, U, precision=_PREC)
        PA = gen_rows(key, pb, n)
        R = PA - recon
        return jnp.sum(R * R), jnp.sum(PA * PA)

    U = jax.jit(jnp.triu)(F[:n])
    r2 = a2 = 0.0
    for r0 in range(0, n, CHUNK):
        s2, sa = resid_block(U, F[r0 : r0 + CHUNK],
                             jax.lax.dynamic_slice(perm, (r0,), (CHUNK,)), r0)
        r2 += float(s2)
        a2 += float(sa)
    res = (r2 ** 0.5) / (n * a2 ** 0.5)
    gate = "PASS" if res <= 1e-6 else "fail"
    print(line + f"  resid {res:.2e} [{gate}]", flush=True)


def main():
    # the gate question first, at the cheap size
    for scheme in ("crout", "flat"):
        run_cfg(16384, 1024, "bf16", scheme)
    # the headline size: bf16-precision timing + gate
    for scheme in ("crout", "flat"):
        run_cfg(32768, 1024, "bf16", scheme)
    # reference points: 'high' residuals at 32768 (times known elsewhere)
    for scheme in ("crout", "flat"):
        run_cfg(32768, 1024, "high", scheme)
    # crout tile-size sweep at 32768 (panel cost vs GEMM K-granularity)
    run_cfg(32768, 2048, "bf16", "crout", resid=False)
    run_cfg(32768, 2048, "high", "crout", resid=False)
    print("done", flush=True)


if __name__ == "__main__":
    main()
