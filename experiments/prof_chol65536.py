"""N=65536 single-chip bf16-STORAGE Cholesky (VERDICT #6): one jit, v=2048
(32 steps — 64-step programs have killed this toolchain's compile helper).

Input follows the reference's distributed SPD generator
(src/conflux/cholesky/CholeskyIO.cpp:100-172): ONE seeded v x v Gram tile
R R^T replicated across the (n/v)^2 grid plus an n-scaled diagonal boost —
generatable on the fly, so the 8.6 GB matrix never needs a second device
copy (a Gram of a full random A would: A + S = 17.2 GB > HBM). Everything
stays bf16 END TO END in the generator (a f32 intermediate would be
17 GB).

Protocol mirrors bench.py: the matrix is regenerated (untimed) and passed
DONATED; the factorization aliases it in place. Residual
||A - L L^T||_F / (N ||A||_F) is computed in-jit, blocked over row bands,
with the A bands regenerated on the fly (same tile + diag values).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_chol65536.py > /tmp/prof_chol65536.log 2>&1 &
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.cholesky.single import cholesky

N, V, REPS = 65536, 2048, 3
T = N // V  # tiles per side
BAND_T = 2  # tile-rows per residual band: [4096, 65536] f32 temps (~1 GB)


def _gram_tile_bf16():
    """Seeded v x v Gram tile, rounded to the bf16 the matrix is DEFINED
    in (the replicated unit of the reference generator)."""
    R = jax.random.uniform(jax.random.key(11), (V, V), jnp.float32)
    G = jnp.dot(R, R.T, precision=jax.lax.Precision.HIGHEST) / V
    return G.astype(jnp.bfloat16)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _gen_rows(S, r):
    """One [V, N] tile-row written into the donated buffer: the one-shot
    tile(G,(T,T)) + N*eye(N) expression did NOT fuse (two 8.6 GB
    intermediates -> RESOURCE_EXHAUSTED, /tmp/prof_chol65536.log);
    row-block dus keeps the peak at 8.6 GB + one 268 MB block.
    65536 == 2^16 is bf16-exact."""
    Gb = _gram_tile_bf16()
    row = jnp.tile(Gb, (1, T))
    eye_rows = (jax.lax.broadcasted_iota(jnp.int32, (V, N), 0) + r
                == jax.lax.broadcasted_iota(jnp.int32, (V, N), 1))
    row = row + N * eye_rows.astype(jnp.bfloat16)
    return jax.lax.dynamic_update_slice(S, row, (r, 0))


def gen(_):
    S = jnp.zeros((N, N), jnp.bfloat16)
    for r in range(0, N, V):
        S = _gen_rows(S, r)
    return S


@functools.partial(jax.jit, donate_argnums=(0,))
def run(S):
    L = cholesky(S, v=V, precision="high")
    return jnp.sum(L.astype(jnp.float32)), L


@jax.jit
def residual(L):
    """Blocked ||A - L L^T||_F / (N ||A||_F), A bands regenerated. bf16
    operands (that IS the stored factor), f32 accumulation."""
    Gb = _gram_tile_bf16()
    bw = BAND_T * V

    def body(i, acc):
        r0 = i * bw
        Lb = jax.lax.dynamic_slice(L, (r0, 0), (bw, N))
        rec = jnp.dot(Lb, L.T, preferred_element_type=jnp.float32)
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
    S = gen(0)
    float(S[0, 0].astype(jnp.float32))
    s, L = run(S)
    float(s)  # compile + warm
    ts = []
    for _ in range(REPS):
        del L  # free BEFORE regenerating (L + fresh S would be 17.2 GB)
        S = gen(0)
        float(S[0, 0].astype(jnp.float32))
        t0 = time.perf_counter()
        s, L = run(S)
        float(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    tf = N**3 / 3 / med / 1e12
    print(f"chol65536 bf16s v={V} 'high': med {med:8.2f} s {tf:6.1f} TF/s "
          f"(N^3/3) [{min(ts):.2f},{max(ts):.2f}]", flush=True)
    res = float(residual(L))
    print(f"chol65536 residual ||A-LL^T||/(N||A||) = {res:.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
