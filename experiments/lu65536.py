"""N=65536 single-chip LU in bf16 STORAGE via PER-STEP dispatch.

The single-jit flat program at this size (a) kills the remote compile
helper (64-step v=1024: SIGKILL; 32-step v=2048: exit 1) and (b) would need
R + F buffers (2 x 8.6 GB) for the final factor-order gather — over the
~13 GB HBM degradation cliff. Instead: one small jit per panel step with k
STATIC and the buffer DONATED (updated in place), and the factor left in
ORIGINAL row order (the pivot vector `perm` gives factor order; consumers
gather rows lazily). Peak device memory: one 8.6 GB buffer + one ~2 GB
chunked-GEMM temp.

Validation: sampled-row residual on host — 256 random factor rows
reconstructed as (L @ U)[rows] in blocked numpy f64 GEMMs against the bf16
A that was actually factored.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/lu65536.py > /tmp/lu65536.log 2>&1 &
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from conflux_tpu.ops.panel import factor_panel
from conflux_tpu.ops.tri import schur_dot, trsm_left_lower_unit, unit_lower

_PREC = jax.lax.Precision.HIGHEST
F32 = jnp.float32
BF16 = jnp.bfloat16
CHUNK = 4096  # keeps the f32 GEMM temp ~1 GB: peak ~11.8 GB, under the cliff


def make_step(k: int, n: int, m: int, v: int):
    w = min(v, n - k)

    def step(R, avail):
        panel = jax.lax.slice(R, (0, k), (m, k + w)).astype(F32)
        piv, _, M = factor_panel(panel, avail, w, block=128)
        lu_top = M[piv]
        R = jax.lax.dynamic_update_slice(
            R, jnp.where(avail[:, None], M, panel).astype(BF16), (0, k)
        )
        avail = avail.at[piv].set(False)
        if k + w < n:
            Rpiv = R[piv]
            L11 = unit_lower(lu_top)
            U12 = trsm_left_lower_unit(L11, Rpiv[:, k + w :].astype(F32),
                                       method="invert")
            onehot = (
                jnp.arange(m, dtype=jnp.int32)[:, None] == piv[None, :]
            ).astype(F32)
            # avail was already flipped for this step's pivots; Mgemm gives
            # them strict(L11) rows via the onehot product, so the single
            # GEMM writes U12 into them in place (see lu/single.py)
            Mgemm = jnp.where(avail[:, None], M, 0.0) + jnp.dot(
                onehot, jnp.tril(lu_top, -1), precision=_PREC
            )
            for c0 in range(k + w, n, CHUNK):
                c1 = min(c0 + CHUNK, n)
                R = R.at[:, c0:c1].add(
                    -schur_dot(Mgemm, U12[:, c0 - k - w : c1 - k - w],
                               "bf16out")
                )
        return R, avail, piv

    return jax.jit(step, donate_argnums=0)


def main():
    n = m = 65536
    v = 2048
    rng = np.random.default_rng(42)
    print("building host matrix...", flush=True)
    A_h = (5.0 + rng.random((n, n), dtype=np.float32)).astype(
        ml_dtypes.bfloat16)
    R = jnp.asarray(A_h)
    print("transferred", flush=True)

    steps = [make_step(k, n, m, v) for k in range(0, n, v)]
    pivs = []
    for rep in range(2):
        if rep == 1:
            del R
            R = jnp.asarray(A_h)
        avail = jnp.ones(m, bool)
        pivs = []
        t0 = time.perf_counter()
        for i, st in enumerate(steps):
            R, avail, piv = st(R, avail)
            pivs.append(piv)
            if rep == 0 and (i + 1) % 8 == 0:
                print(f"  step {i+1}/{len(steps)}", flush=True)
        float(jnp.sum(R[:1].astype(F32)))  # completion fence
        t = time.perf_counter() - t0
        gf = 2 / 3 * n**3 / t / 1e9
        print(f"rep {rep}: {t*1e3:9.1f} ms  {gf:9.1f} GF/s", flush=True)

    perm = np.concatenate([np.asarray(p) for p in pivs])
    assert sorted(perm.tolist()) == list(range(n)), "perm broken"

    print("fetching factor to host (bf16, ~8.6 GB)...", flush=True)
    t0 = time.perf_counter()
    Fh = np.asarray(R)  # original row order
    del R
    print(f"fetched in {time.perf_counter()-t0:.0f}s", flush=True)

    S = np.sort(rng.choice(n, size=256, replace=False))
    Fs = Fh[perm[S]].astype(np.float32)
    recon = np.zeros((len(S), n), np.float64)
    for t0c in range(0, n, v):
        t1c = min(t0c + v, n)
        Lblk = Fs[:, t0c:t1c].astype(np.float64).copy()
        for si, j in enumerate(S):
            if j < t1c:
                Lblk[si, max(0, j - t0c):] = 0.0
                if t0c <= j:          # j inside this block: unit diagonal
                    Lblk[si, j - t0c] = 1.0
        Ublk = Fh[perm[t0c:t1c]].astype(np.float64)
        for ri, t in enumerate(range(t0c, t1c)):
            Ublk[ri, :t] = 0.0
        recon += Lblk @ Ublk
    Arows = A_h[perm[S]].astype(np.float64)
    r = float(np.linalg.norm(Arows - recon) / np.linalg.norm(Arows))
    print(f"sampled residual (256 rows): raw {r:.2e}  /N {r/n:.2e}",
          flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
