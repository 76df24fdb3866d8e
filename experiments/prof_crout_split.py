"""Per-component split of the crout N=32768 'high' run (VERDICT r2 item 3:
"get a true per-op split ... and attack the top cost").

The crout kernel's per-step work at step k (w = v, part=1 so m_r = n - k):

  A. panel-update GEMM   [n-k, k] x [k, v]        (schur_dot 'high')
  B. row-block GEMM      [v, k]   x [k, n-k-v]    (schur_dot 'high')
  C. factor_panel        [n-k, v] masked-argmax blocked panel LU
  D. compaction gather   R[live_idx] on [n-k, n] f32
  E. pivot-row gather    R[piv] — v rows of [n-k, n]
  F. TRSM + band assembly  [v, v] solve + [v, n] concat

Each component is timed standalone at SAMPLED steps k (operands generated
once per sample and passed device-resident so RNG fill is NOT in the timed
region) and the per-step costs are summed over all Nt steps by
piecewise-linear interpolation in k — avoiding a 32-distinct-shape program
(the remote compile helper dies on high shape diversity, CLAUDE.md) while
still attributing the full ~949 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/prof_crout_split.py > /tmp/prof_crout_split.log 2>&1 &
"""

import gc
from functools import partial
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from conflux_tpu.ops.panel import factor_panel
from conflux_tpu.ops.tri import schur_dot, trsm_left_lower_unit, unit_lower

N, V = 32768, 1024
SAMPLES = (1024, 4096, 8192, 16384, 24576, 28672)
REPS = 3


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


@partial(jax.jit, static_argnums=(1, 2))
def gen(key, m, n):
    return 5.0 + jax.random.uniform(key, (m, n), jnp.float32)


def main():
    key = jax.random.key(0)
    per_step = {c: {} for c in "ABCDEF"}

    for k in SAMPLES:
        m_r = N - k
        nc = N - k - V
        kk = jax.random.fold_in(key, k)

        # device-resident operands (created outside every timed region);
        # R [m_r, N] doubles as the gather source, its slices as GEMM
        # operands — total resident ~4+ GB, well under HBM
        R = gen(kk, m_r, N)
        Urows = gen(jax.random.fold_in(kk, 1), k, N)   # F[:k, :] stand-in
        float(jnp.sum(R[0]) + jnp.sum(Urows[0]))

        gA = jax.jit(lambda R, U, k=k: jnp.sum(
            jax.lax.slice(R, (0, k), (R.shape[0], k + V))
            - schur_dot(jax.lax.slice(R, (0, 0), (R.shape[0], k)),
                        jax.lax.slice(U, (0, k), (k, k + V)), "high")))
        per_step["A"][k] = timeit(gA, R, Urows)

        gB = jax.jit(lambda R, U, k=k, nc=nc: jnp.sum(
            jax.lax.slice(R, (0, k + V), (V, N))
            - schur_dot(jax.lax.slice(R, (0, 0), (V, k)),
                        jax.lax.slice(U, (0, k + V), (k, N)), "high")))
        per_step["B"][k] = timeit(gB, R, Urows)

        def gC(R):
            P = jax.lax.slice(R, (0, 0), (R.shape[0], V))
            piv, _, M = factor_panel(P, jnp.ones(R.shape[0], bool), V,
                                     block=128)
            return jnp.sum(M) + piv[0]

        per_step["C"][k] = timeit(jax.jit(gC), R)

        def gD(R):
            # realistic live-row compaction: ascending sorted indices with
            # V pseudo-random rows deleted (what the kernel's
            # sort(where(avail, rows, m_r))[:live] produces). The gathered
            # array itself is returned (second output, never fetched) so
            # the gather's WRITE can't be fused away into a reduction; the
            # cheap scalar is what timeit reads back.
            m_r = R.shape[0]
            rows = jnp.arange(m_r, dtype=jnp.int32)
            dead = ((rows * 7919) % m_r) < V  # ~V scattered dead rows
            idx = jnp.sort(jnp.where(~dead, rows, m_r))[: m_r - V]
            G = R[idx]
            return G[0, 0] + G[-1, -1], G

        per_step["D"][k] = timeit(jax.jit(gD), R)

        def gE(R):
            piv = (jnp.arange(V, dtype=jnp.int32) * 7919) % R.shape[0]
            return jnp.sum(R[piv])

        per_step["E"][k] = timeit(jax.jit(gE), R)

        def gF(R, k=k):
            lu_top = jnp.eye(V, dtype=jnp.float32) + 0.01 * jax.lax.slice(
                R, (0, 0), (V, V))
            rhs = jax.lax.slice(R, (0, V), (V, N - k))
            U12 = trsm_left_lower_unit(unit_lower(lu_top), rhs,
                                       method="invert")
            band = jnp.concatenate(
                [jax.lax.slice(R, (0, 0), (V, k)), lu_top, U12], axis=1)
            return jnp.sum(band)

        per_step["F"][k] = timeit(jax.jit(gF), R)

        print(f"k={k:6d}: " + "  ".join(
            f"{c}={per_step[c][k]*1e3:7.2f}ms" for c in "ABCDEF"), flush=True)
        del R, Urows
        gc.collect()

    ks = list(range(0, N, V))
    import numpy as np

    xs = np.array(SAMPLES, float)
    print("\n== integrated over all steps (piecewise-linear in k) ==",
          flush=True)
    tot = 0.0
    for c in "ABCDEF":
        ys = np.array([per_step[c][k] for k in SAMPLES])
        total = float(sum(np.interp(k, xs, ys) for k in ks))
        tot += total
        print(f"{c}: {total*1e3:8.1f} ms", flush=True)
    print(f"sum {tot*1e3:8.1f} ms  (measured full run: ~949 ms; gap = "
          f"dispatch floor x 6 components x 6 samples + fusion effects)",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
