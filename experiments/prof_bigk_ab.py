"""CONFLUX_CROUT_BIGK e2e decision A/B (VERDICT r3 Weak #5): the big-K
Mosaic GEMM kernel (ops/pallas_gemm.sub_matmul_pallas_bigk) was built for
the crout scheme's panel-update shapes but ships opt-in with no recorded
verdict. Run the N=32768 v=1536 'high' crout headline with and without it
(subprocess per arm — the flag is read at trace time) and print the
decision the default should encode.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    experiments/prof_bigk_ab.py > /tmp/prof_bigk_ab.log 2>&1 &
"""

import os
import re
import subprocess
import sys

E2E = r"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from conflux_tpu.lu.single import lu_factor

N, V = 32768, 1536

@jax.jit
def e2e(key):
    A = 5.0 + jax.random.uniform(key, (N, N), jnp.float32)
    F, perm = lu_factor(A, v=V, precision="high", scheme="crout",
                        partition=1)
    return jnp.sum(F), perm[0]

key = jax.random.key(42)
s, _ = e2e(key); float(s)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); s, _ = e2e(key); float(s)
    ts.append(time.perf_counter() - t0)
med = sorted(ts)[len(ts) // 2]
tag = "bigk" if __import__("os").environ.get("CONFLUX_CROUT_BIGK") else "dot"
print(f"E2E {tag} crout N={N} v={V} 'high': med {med*1e3:.1f} ms "
      f"{2*N**3/3/med/1e12:.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
      flush=True)
"""


def child(bigk: bool):
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site")
    if bigk:
        env["CONFLUX_CROUT_BIGK"] = "1"
    else:
        env.pop("CONFLUX_CROUT_BIGK", None)
    r = subprocess.run([sys.executable, "-c", E2E], env=env,
                       capture_output=True, text=True, timeout=3600)
    for ln in r.stdout.splitlines():
        if ln.startswith("E2E"):
            print(ln, flush=True)
            return ln
    print(f"bigk={bigk}: no output (rc={r.returncode})\n{r.stderr[-800:]}",
          flush=True)
    return ""


def ms(line):
    m = re.search(r"med (\d+\.?\d*) ms", line)
    return float(m.group(1)) if m else None


def main():
    base = child(False)
    cand = child(True)
    b, c = ms(base), ms(cand)
    if b is None or c is None:
        print("A/B incomplete: an arm failed; no decision", flush=True)
    elif c < 0.97 * b:
        print(f"DECISION: bigk wins ({c:.1f} vs {b:.1f} ms) -> make it the "
              f"default in _bigk_ok", flush=True)
    else:
        print(f"DECISION: bigk does not beat the dot path ({c:.1f} vs "
              f"{b:.1f} ms) -> delete the opt-in or record keep-dark",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
