"""Profiling / observability hooks.

The reference has no tracing beyond wall-clock prints and tqdm bars
(SURVEY.md §5); since the north-star metric is sec/video, the rebuild
ships first-class hooks:

  * PhaseTimer — named per-phase wall-clock accumulation (text encode /
    denoise / vae decode / save), blocking on device results so device
    time is attributed to the right phase.
  * trace() — a jax.profiler trace context (TensorBoard-compatible
    XPlane dumps) gated by UNIVID_PROFILE_DIR so production runs pay
    nothing.
  * annotate() — jax.profiler.TraceAnnotation passthrough for marking
    regions inside jitted host loops.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

import jax


def device_sync(x) -> None:
    """Wait for the device work producing `x` to really finish.

    jax.block_until_ready is a no-op through remote-relay backends (the
    TPU tunnel): only a data-dependent D2H readback proves the execution
    ran, so this reads ONE scalar from the first jax-array leaf (4-byte
    transfer — one RTT, value discarded)."""
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))
            return


class PhaseTimer:
    """Accumulates wall-clock per named phase; `block=True` waits for
    device work so async dispatch doesn't leak into the next phase."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                device_sync(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def time_phase(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its result, attribute the time to `name`."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        device_sync(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def summary(self) -> Dict[str, float]:
        return {k: round(v, 4) for k, v in self.totals.items()}


@contextlib.contextmanager
def trace(name: str = "univid", profile_dir: Optional[str] = None):
    """jax.profiler trace when UNIVID_PROFILE_DIR (or profile_dir) is
    set; no-op otherwise."""
    out = profile_dir or os.environ.get("UNIVID_PROFILE_DIR")
    if not out:
        yield
        return
    path = os.path.join(out, name)
    os.makedirs(path, exist_ok=True)
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for host-side region marking."""
    return jax.profiler.TraceAnnotation(name)
