"""Archive the N=65536 tier (VERDICT r3 Missing #1): timed Cholesky and
LU bf16-STORAGE stepped runs with committed rows in results/benchmarks.csv
and FULL residuals — nothing left in /tmp.

Protocol (matches run_archive.py / the reference's repetition loop,
examples/conflux_miniapp.cpp:138-167): first run is the warm-up/compile,
then `REPS` timed repetitions; one CSV row per repetition. The timer
covers the factorization only (the reference times LU_rep, not
InitMatrix/validation): matrix upload/generation and the factor download
happen outside it.

Cholesky: the prof_chol65536.py flow (stepped dynamic-k driver, in-jit
replicated-Gram SPD generation, blocked in-jit residual), now appending
rows. LU: flat stepped driver (the only scheme whose in-place donation
fits bf16 N=65536 — crout transiently needs 2 copies, lu/stepped.py),
host-seeded 5+U[0,1) matrix uploaded in row chunks (device-side asarray
of the f32 would OOM, CLAUDE.md), full blocked residual via
validation.lu_residual_blocked after streaming the factor out.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/run_archive_65536.py > /tmp/run_archive_65536.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from conflux_tpu.bench.harness import Result, append_results

CSV = "/root/repo/results/benchmarks.csv"
N = 65536
REPS = 2


def drop_rows(pred):
    """Remove stale rows matching pred(fields) so reruns replace, not
    duplicate."""
    import os

    if not os.path.exists(CSV):
        return
    with open(CSV) as fh:
        lines = fh.readlines()
    keep = [lines[0]] + [
        ln for ln in lines[1:] if not pred(ln.rstrip("\n").split(","))
    ]
    with open(CSV, "w") as fh:
        fh.writelines(keep)


def chol():
    from conflux_tpu.cholesky.stepped import cholesky_stepped

    V = 2048
    T = N // V

    def _gram_tile_bf16():
        R = jax.random.uniform(jax.random.key(11), (V, V), jnp.float32)
        G = jnp.dot(R, R.T, precision=jax.lax.Precision.HIGHEST) / V
        return G.astype(jnp.bfloat16)

    @jax.jit
    def gen():
        Gb = _gram_tile_bf16()
        row = jnp.tile(Gb, (1, T))

        def body(i, S):
            r = i * V
            eye = (jax.lax.broadcasted_iota(jnp.int32, (V, N), 0) + r
                   == jax.lax.broadcasted_iota(jnp.int32, (V, N), 1))
            return jax.lax.dynamic_update_slice(
                S, row + jnp.bfloat16(N) * eye.astype(jnp.bfloat16), (r, 0))

        return jax.lax.fori_loop(0, T, body, jnp.zeros((N, N), jnp.bfloat16))

    @jax.jit
    def residual(L):
        Gb = _gram_tile_bf16()
        bw = 2 * V

        def body(i, acc):
            r0 = i * bw
            Lb = jax.lax.dynamic_slice(L, (r0, 0), (bw, N))
            rec = jax.lax.dot_general(
                Lb, L, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            Ab = jnp.tile(Gb, (2, T)).astype(jnp.float32)
            eye = (jax.lax.broadcasted_iota(jnp.int32, (bw, N), 0) + r0
                   == jax.lax.broadcasted_iota(jnp.int32, (bw, N), 1))
            Ab = Ab + N * eye.astype(jnp.float32)
            num, den = acc
            return (num + jnp.sum((Ab - rec) ** 2), den + jnp.sum(Ab**2))

        num, den = jax.lax.fori_loop(0, T // 2, body,
                                     (jnp.float32(0), jnp.float32(0)))
        return jnp.sqrt(num) / (N * jnp.sqrt(den))

    ts, L = [], None
    for rep in range(REPS + 1):
        del L
        L = None
        S = gen()
        float(S[0, 0].astype(jnp.float32))
        t0 = time.perf_counter()
        L = cholesky_stepped(S, v=V, precision="high", out="device")
        float(L[-1, -1].astype(jnp.float32))
        dt = time.perf_counter() - t0
        print(f"chol65536 rep {rep}: {dt:8.2f} s", flush=True)
        if rep > 0:
            ts.append(dt * 1e3)
    res = float(residual(L))
    del L
    med = sorted(ts)[len(ts) // 2]
    print(f"chol65536 bf16s v={V} 'high': med {med/1e3:.2f} s "
          f"{N**3/3/med/1e9:6.1f} TF/s  residual {res:.3e}", flush=True)
    drop_rows(lambda f: f[0] == "cholesky" and f[2] == str(N))
    append_results(CSV, [
        Result("cholesky", "psychol", N, N, 1, "1x1x1", "time", "strong",
               round(ms, 1), V, "bf16s-stepped") for ms in ts
    ] + [Result("cholesky", "psychol", N, N, 1, "1x1x1", "residual",
                "strong", res, V, "bf16s-stepped")])
    print("chol65536 rows appended", flush=True)


def lu():
    from conflux_tpu.lu.stepped import _make_step_dyn, _upload_rowchunks
    from conflux_tpu.validation import lu_residual_blocked

    V = 2048
    print("lu65536: generating host matrix", flush=True)
    rng = np.random.default_rng(42)
    A_host = np.empty((N, N), dtype=ml_dtypes.bfloat16)
    for r0 in range(0, N, 4096):
        A_host[r0:r0 + 4096] = (
            5.0 + rng.random((4096, N), dtype=np.float32)
        ).astype(ml_dtypes.bfloat16)

    ts = []
    R = avail = porder = None
    for rep in range(REPS + 1):
        del R, avail, porder
        R = avail = porder = None
        R = _upload_rowchunks(A_host)
        avail = jnp.ones(N, bool)
        porder = jnp.zeros(N, jnp.int32)
        t0 = time.perf_counter()
        for k in range(0, N, V):
            w = min(V, N - k)
            step = _make_step_dyn(w, N, N, "high", 8192, True)
            R, avail, porder = step(np.int32(k), R, avail, porder)
        perm = np.asarray(porder)  # completion fence + the pivot fetch
        dt = time.perf_counter() - t0
        print(f"lu65536 rep {rep}: {dt:8.2f} s", flush=True)
        if rep > 0:
            ts.append(dt * 1e3)
    med = sorted(ts)[len(ts) // 2]
    print(f"lu65536 bf16s v={V} flat-stepped: med {med/1e3:.2f} s "
          f"{2*N**3/3/med/1e9:6.1f} TF/s", flush=True)

    # factor -> host (outside the timer; ~50 MB/s device link), then the
    # full blocked residual. R is in ORIGINAL row order; factor order is
    # R[perm] which the host assembles row-block-wise.
    print("lu65536: streaming factor to host", flush=True)
    Fh = np.empty((N, N), dtype=ml_dtypes.bfloat16)
    gather = jax.jit(lambda R, idx: R[idx])
    for r0 in range(0, N, 4096):
        Fh[r0:r0 + 4096] = np.asarray(
            gather(R, jnp.asarray(perm[r0:r0 + 4096])))
    del R, avail, porder
    res = lu_residual_blocked(A_host, Fh, perm)
    print(f"lu65536 residual ||PA-LU||/(N||A||) = {res:.3e}", flush=True)
    drop_rows(lambda f: f[0] == "lu" and f[2] == str(N))
    append_results(CSV, [
        Result("lu", "conflux-tpu", N, N, 1, "1x1x1", "time", "strong",
               round(ms, 1), V, "bf16s-stepped") for ms in ts
    ] + [Result("lu", "conflux-tpu", N, N, 1, "1x1x1", "residual",
                "strong", res, V, "bf16s-stepped")])
    print("lu65536 rows appended", flush=True)


def main():
    chol()
    lu()
    print("done", flush=True)


if __name__ == "__main__":
    main()
