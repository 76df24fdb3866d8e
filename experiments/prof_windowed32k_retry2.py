"""Third windowed-N=32768 attempt: a BISECT, not another config poke.
Both v=512 w=8 and v=512 w=4 die in the remote compile helper within
~60 s (exit 1, /tmp/prof_windowed32k.log, /tmp/prof_windowed32k_retry.log)
— too fast for an out-of-memory trace blow-up, more like the
CostEstimate/oversize-operand instant-kill class (CLAUDE.md). Arms:

  1. w=1  — segment_bounds(Nt, 1) collapses windowed to one full-shape
            fori body: if THIS fails, window-shape diversity is innocent
            and the killer is in the step body at Ml=32768;
  2. w=1 with the Mosaic panel kernel monkeypatched off — isolates the
            pallas panel at [32768, 512] as the suspect;
  3. w=2, then v=1024 w=8 (Nt=32) — the smallest useful windowed proofs
            if the body itself is fine.

Run: PYTHONPATH=/root/repo:/root/.axon_site:/root/repo/experiments nohup \
  python experiments/prof_windowed32k_retry2.py > /tmp/prof_windowed32k_retry2.log 2>&1 &
"""

from prof_windowed32k import timing


def main():
    timing(32768, 512, 1)

    import conflux_tpu.ops.panel as panel

    orig = panel._use_pallas
    panel._use_pallas = lambda *a: False
    try:
        print("--- pallas panel OFF ---", flush=True)
        timing(32768, 512, 1, reps=1)
    finally:
        panel._use_pallas = orig

    timing(32768, 512, 2)
    timing(32768, 1024, 8)
    print("done", flush=True)


if __name__ == "__main__":
    main()
