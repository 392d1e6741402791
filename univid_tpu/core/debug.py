"""Debug / sanitizer flags (SURVEY §5: the reference's determinism
switches — TF32 off, CUDA_LAUNCH_BLOCKING — dissolve into XLA, which is
deterministic under jit by default; what remains useful on TPU is nan
trapping and jit bypass for interactive debugging).

Env knobs (applied by every CLI via apply_debug_flags):
  UNIVID_DEBUG_NANS=1   jax_debug_nans — re-runs the failing op un-jitted
                        and raises at the first NaN-producing primitive
  UNIVID_DISABLE_JIT=1  jax_disable_jit — eager op-by-op execution
  UNIVID_LOG_COMPILES=1 jax_log_compiles — print every trace/compile
"""

from __future__ import annotations

import os


def apply_debug_flags(env=None) -> dict:
    """Read the UNIVID_* debug env knobs into jax.config; returns the
    flags applied (for logging/metadata)."""
    import jax

    env = os.environ if env is None else env
    applied = {}
    for var, flag in (("UNIVID_DEBUG_NANS", "jax_debug_nans"),
                      ("UNIVID_DISABLE_JIT", "jax_disable_jit"),
                      ("UNIVID_LOG_COMPILES", "jax_log_compiles")):
        if env.get(var, "0") not in ("0", ""):
            jax.config.update(flag, True)
            applied[flag] = True
    return applied
