"""SUB=16 vs 32 panel-kernel A/B, cheap-first (the full prof_r3v_leaf A/B
never got chip time before the machine restart).

Stage 1 (minutes): the serial kernel floor — kchain252 at the headline
micro-panel shape [128, 17408] — one subprocess per _SUB (read at import).
Rationale: the kernel is VMEM-bandwidth-bound on the [_SUB, m] rank-1 RMW
slice (545 us/call at _SUB=32); _SUB=16 halves that traffic but doubles
the deferred-MXU boundaries (the term that made _LEAF=8 lose, see
ops/pallas_panel.py).

Stage 2 (only if 16 wins stage 1 by >10%): the crout N=32768 v=1536 'high'
e2e headline under SUB=16, 3 reps.

Run: nohup python experiments/prof_sub16_kchain.py > /tmp/prof_sub16.log 2>&1 &
"""

import os
import re
import subprocess
import sys

KCHAIN = r"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from conflux_tpu.ops.panel import _rank1_dispatch
from conflux_tpu.ops.pallas_panel import _SUB

m = 17408
CHAIN = 64  # the 252-call program wedged the remote compile helper for
#             25+ min at SUB=16 (2026-08-20) — 64 amortizes the dispatch
#             fence to <1 us/call and compiles

@jax.jit
def mk(key):
    B = 5.0 + jax.random.uniform(key, (128, m), jnp.float32)
    return B + 5.0, jnp.ones((1, m), jnp.float32)

Bt0, av0 = mk(jax.random.key(0))
float(Bt0[0, 0])

@jax.jit
def kchain(Bt, av):
    acc = jnp.float32(0)
    for _ in range(CHAIN):
        Bt, av, pivw, _ = _rank1_dispatch(Bt, av, 0, False)
        acc += jnp.sum(pivw)
    return acc, Bt

out = kchain(Bt0, av0); float(out[0])
ts = []
for _ in range(3):
    t0 = time.perf_counter(); out = kchain(Bt0, av0); float(out[0])
    ts.append(time.perf_counter() - t0)
t = min(ts)
print(f"KCHAIN SUB={_SUB} {t/CHAIN*1e6:.0f} us/call ({t*1e3:.1f} ms total)",
      flush=True)
"""

E2E = r"""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from conflux_tpu.lu.single import lu_factor
from conflux_tpu.ops.pallas_panel import _SUB

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
print(f"E2E SUB={_SUB} crout N={N} v={V} 'high': med {med*1e3:.1f} ms "
      f"{2*N**3/3/med/1e12:.1f} TF/s [{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]",
      flush=True)
"""


def child(code, sub):
    env = dict(os.environ, CONFLUX_PANEL_SUB=str(sub),
               PYTHONPATH="/root/repo:/root/.axon_site")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    for ln in r.stdout.splitlines():
        if ln.startswith(("KCHAIN", "E2E")):
            print(ln, flush=True)
            return ln
    print(f"SUB={sub}: no output (rc={r.returncode})\n{r.stderr[-500:]}",
          flush=True)
    return ""


def us(line):
    m = re.search(r"(\d+) us/call", line)
    return int(m.group(1)) if m else 10**9


def main():
    l32 = child(KCHAIN, 32)
    l16 = child(KCHAIN, 16)
    if not (l32 and l16):
        # a crashed child must not decide the A/B (us() returns the 1e9
        # sentinel for an unparsable line, which would make the comparison
        # vacuously true/false)
        print("baseline or candidate failed; e2e skipped", flush=True)
    elif us(l16) < 0.9 * us(l32):
        print("SUB=16 wins the kernel floor; running e2e", flush=True)
        child(E2E, 16)
    else:
        print("SUB=16 does not clear the 10% bar; e2e skipped", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
