"""N=65536 single-chip bf16-STORAGE Cholesky (VERDICT #6), via the
dynamic-k STEPPED driver (cholesky/stepped.py): one executable shared by
all 32 steps — the k-static first design paid one ~65 s remote compile
per step, and a 32-step single-jit program wedged the compile helper for
1h+ (CLAUDE.md killer pattern).

Input follows the reference's distributed SPD generator
(src/conflux/cholesky/CholeskyIO.cpp:100-172): ONE seeded v x v Gram tile
R R^T replicated across the (n/v)^2 grid plus an n-scaled diagonal boost.
Generated on device inside ONE jit (fori_loop of tile-row writes into an
in-jit zeros buffer — the per-row donated-dus version OOM'd,
/tmp/prof_chol65536.log 2026-08-19).

Residual ||A - L L^T||_F / (N ||A||_F) is computed in-jit, blocked over
row bands, A bands regenerated on the fly; the L L^T contraction uses
dot_general on axis 1 of both operands so no 8.6 GB transpose is
materialized.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_chol65536.py > /tmp/prof_chol65536.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.cholesky.stepped import cholesky_stepped

N, V, REPS = 65536, 2048, 2
T = N // V  # tiles per side
BAND_T = 2  # tile-rows per residual band: [4096, 65536] f32 temps (~1 GB)


def _gram_tile_bf16():
    """Seeded v x v Gram tile, rounded to the bf16 the matrix is DEFINED
    in (the replicated unit of the reference generator)."""
    R = jax.random.uniform(jax.random.key(11), (V, V), jnp.float32)
    G = jnp.dot(R, R.T, precision=jax.lax.Precision.HIGHEST) / V
    return G.astype(jnp.bfloat16)


@jax.jit
def gen():
    """The whole SPD matrix in ONE jit: tile-row writes via an in-jit
    fori_loop (one 8.6 GB buffer + one [V, N] row temp)."""
    Gb = _gram_tile_bf16()
    row = jnp.tile(Gb, (1, T))

    def body(i, S):
        r = i * V
        eye_rows = (jax.lax.broadcasted_iota(jnp.int32, (V, N), 0) + r
                    == jax.lax.broadcasted_iota(jnp.int32, (V, N), 1))
        rowi = row + jnp.bfloat16(N) * eye_rows.astype(jnp.bfloat16)
        return jax.lax.dynamic_update_slice(S, rowi, (r, 0))

    return jax.lax.fori_loop(0, T, body, jnp.zeros((N, N), jnp.bfloat16))


@jax.jit
def residual(L):
    """Blocked ||A - L L^T||_F / (N ||A||_F), A bands regenerated. bf16
    operands (that IS the stored factor), f32 accumulation."""
    Gb = _gram_tile_bf16()
    bw = BAND_T * V

    def body(i, acc):
        r0 = i * bw
        Lb = jax.lax.dynamic_slice(L, (r0, 0), (bw, N))
        rec = jax.lax.dot_general(
            Lb, L, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        Ab = jnp.tile(Gb, (BAND_T, T)).astype(jnp.float32)
        eye_band = (jax.lax.broadcasted_iota(jnp.int32, (bw, N), 0) + r0
                    == jax.lax.broadcasted_iota(jnp.int32, (bw, N), 1))
        Ab = Ab + N * eye_band.astype(jnp.float32)
        num, den = acc
        return (num + jnp.sum((Ab - rec) ** 2), den + jnp.sum(Ab**2))

    num, den = jax.lax.fori_loop(0, T // BAND_T, body,
                                 (jnp.float32(0), jnp.float32(0)))
    return jnp.sqrt(num) / (N * jnp.sqrt(den))


def main():
    ts = []
    L = None
    for rep in range(REPS + 1):  # first rep = the one shared compile
        del L  # free BEFORE regenerating (L + fresh S would be 17.2 GB)
        L = None
        S = gen()
        float(S[0, 0].astype(jnp.float32))  # fence
        t0 = time.perf_counter()
        L = cholesky_stepped(S, v=V, precision="high", out="device")
        float(L[-1, -1].astype(jnp.float32))  # completion fence
        dt = time.perf_counter() - t0
        print(f"chol65536 rep {rep}: {dt:8.2f} s", flush=True)
        if rep > 0:
            ts.append(dt)
    med = sorted(ts)[len(ts) // 2]
    tf = N**3 / 3 / med / 1e12
    print(f"chol65536 bf16s v={V} 'high' stepped-dyn: med {med:8.2f} s "
          f"{tf:6.1f} TF/s (N^3/3) [{min(ts):.2f},{max(ts):.2f}]", flush=True)
    res = float(residual(L))
    print(f"chol65536 residual ||A-LL^T||/(N||A||) = {res:.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
