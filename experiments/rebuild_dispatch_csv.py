"""Rebuild results/variant_dispatch.csv from a (possibly truncated)
prof_dispatch2 run log. The regen script only writes the CSV after ALL
arms complete; on this platform the 16384 single-shot arms can push the
run past its timeout — but every completed arm already printed its row,
so the committed artifact is reconstructed from the log.

Usage: python experiments/rebuild_dispatch_csv.py [LOG [LOG...]]
       (default /tmp/prof_dispatch2_r4.log /tmp/prof_dispatch2_addon.log)
"""

import csv
import re
import sys

PAT = re.compile(
    r"^(cholesky|lu|lu-single|cholesky-single)\s+(\S+)\s+N=(\d+)"
    r"(?:\s+v=(\d+))?:\s+([\d.]+) ms")

def main(logs):
    rows = []
    for path in logs:
        try:
            with open(path) as fh:
                for ln in fh:
                    m = PAT.match(ln.strip())
                    if m:
                        alg, name, n, v, ms = m.groups()
                        rows.append((alg, name, int(n), int(v or 512),
                                     float(ms)))
        except OSError:
            continue
    if not rows:
        print("no rows parsed; CSV untouched")
        return
    with open("/root/repo/results/variant_dispatch.csv", "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["algorithm", "variant", "N", "v", "ms"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/prof_dispatch2_r4.log",
                          "/tmp/prof_dispatch2_addon.log"])
