"""Remaining archive points after the N=32768 OOM fix: LU 32768 (scalar
output, no donation — donating while returning the factor is the documented
HBM-cliff trigger, see run_archive.py), Cholesky 32768, then regenerate
results/scaling.png.
Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python experiments/run_archive_tail.py > /tmp/run_archive_tail.log 2>&1 &
"""
import importlib.util, sys
spec = importlib.util.spec_from_file_location("ra", "/root/repo/experiments/run_archive.py")
ra = importlib.util.module_from_spec(spec)
sys.modules["ra"] = ra
# exec module top-level (imports + helpers) without running main()
spec.loader.exec_module(ra)

ra.run_lu(32768, 1024, "high")
ra.run_chol(32768, 1024, "high")
try:
    from conflux_tpu.bench import plots
    plots.main([ra.CSV, "-o", "/root/repo/results/scaling.png"])
    print("scaling.png regenerated", flush=True)
except Exception as e:
    print(f"plot failed: {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
