#!/usr/bin/env python
"""Prewarm the persistent XLA compile cache for the driver's bench run.

Round-4 failure mode: the last commit of the round touched
`kernels/attention.py` + `models/wan/dit.py`, invalidating every cached
TPU denoise program minutes before the driver ran `bench.py` — each row
then recompiled cold through the minutes-per-program TPU tunnel and the
driver's wall-clock timeout fired with zero output (BENCH_r04.json
rc=124/parsed=null).

Policy (README "bench discipline"): any commit that touches
`univid_tpu/kernels/`, `univid_tpu/models/wan/dit.py`,
`univid_tpu/models/wan/vae.py`, `univid_tpu/ops/` or `bench.py` must be
followed by `python tools/prewarm_cache.py` on the TPU before round end.

Implementation: run `bench.py` itself (default rows, generous budget) so
the prewarmed programs are HLO-identical to what the driver compiles —
any divergence between a bespoke prewarm path and the real bench would
silently miss cache keys. Prints the bench JSON line plus a prewarm
summary (elapsed, cache entry count delta).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(REPO, ".jax_cache"))


def cache_entries() -> int:
    try:
        return len(os.listdir(CACHE))
    except OSError:
        return 0


def main():
    n0 = cache_entries()
    t0 = time.time()
    env = dict(os.environ)
    env.setdefault("BENCH_BUDGET", os.environ.get("PREWARM_BUDGET", "7200"))
    env.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True,
                         timeout=float(env["BENCH_BUDGET"]) + 120)
    lines = out.stdout.strip().splitlines()
    bench = None
    if lines:
        try:
            bench = json.loads(lines[-1])
        except ValueError:
            pass
    summary = {
        "prewarm_elapsed_s": round(time.time() - t0, 1),
        "cache_entries_before": n0,
        "cache_entries_after": cache_entries(),
        "bench_rc": out.returncode,
        "bench_result": bench,
    }
    if bench is None:
        summary["stderr_tail"] = out.stderr.strip()[-500:]
    print(json.dumps(summary))
    sys.exit(0 if bench is not None else 1)


if __name__ == "__main__":
    main()
