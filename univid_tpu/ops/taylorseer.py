"""TaylorSeer step caching for BAGEL flow-matching image generation.

Behavioral parity with reference models/BAGEL/modeling/cache_utils/
taylorseer.py:11-153 + the per-layer hooks (qwen2_navit.py:773-833,
wired per CFG branch at bagel.py:680-689,816-818):

  * cal_type schedule: a step is 'full' while step < first_enhance (5) or
    every fresh_threshold-th (3) step after; otherwise 'Taylor'.
  * On full steps the LM runs and per-step Taylor factors are updated:
    factor[0] = feature, factor[i+1] = (new[i] - old[i]) / dd where dd is
    the activated-step distance; higher orders only start once
    step > first_enhance - 2 and grow one order per full step up to
    max_order (6).
  * On Taylor steps the LM is skipped and the feature is extrapolated:
    sum_i factor[i] * x^i / i!, x = step - last_activated_step.
  * Separate cache per CFG branch (cond / cfg_text / cfg_img).

TPU redesign: the schedule is pure bookkeeping over the step index —
everything (is_full, x, dd, order counts) is precomputed on the host and
fed as `lax.scan` inputs; the factor stack is a fixed-shape
[max_order+1, ...] array carried through the scan, so the whole denoise
loop stays one compiled program with a `lax.cond` choosing LM-vs-Taylor.

Memory note: the reference hooks every decoder layer with module
'total', but on a Taylor step EVERY layer returns its own extrapolation,
so only the final layer's cache can influence the output — the
intermediate caches are dead state. We therefore cache only the
last-layer hidden (pre final-norm), which is mathematically identical
and ~30x smaller.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TaylorSeerConfig:
    fresh_threshold: int = 3
    first_enhance: int = 5
    max_order: int = 6


def taylorseer_schedule(num_steps: int, cfg: TaylorSeerConfig
                        ) -> Dict[str, np.ndarray]:
    """Host-side simulation of cal_type/derivative bookkeeping
    (taylorseer.py:79-114). Returns per-step arrays:
      is_full  1.0 on full steps
      dd       activated-step distance for the derivative update
      x        step - last_activated (Taylor expansion distance)
      n_upd    number of derivative orders updated this full step
      n_stored factors valid when predicting at this step
    """
    is_full = np.zeros(num_steps, np.float32)
    dd = np.zeros(num_steps, np.float32)
    x = np.zeros(num_steps, np.float32)
    n_upd = np.zeros(num_steps, np.int32)
    n_stored = np.zeros(num_steps, np.int32)

    counter = 0
    activated = [0]
    stored = 0
    for step in range(num_steps):
        first = step < cfg.first_enhance
        full = first or counter == cfg.fresh_threshold - 1
        if full:
            is_full[step] = 1.0
            counter = 0
            activated.append(step)
            dd[step] = activated[-1] - activated[-2]
            if step == 0:
                stored = 0  # taylor_cache_init clears at step 0
            upd = min(stored, cfg.max_order) if step > cfg.first_enhance - 2 \
                else 0
            n_upd[step] = upd
            stored = upd + 1
        else:
            counter += 1
            x[step] = step - activated[-1]
        n_stored[step] = stored
    return {"is_full": is_full, "dd": dd, "x": x, "n_upd": n_upd,
            "n_stored": n_stored}


def init_taylor_cache(feature_shape, max_order: int = 6,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Fixed-slot factor stack [max_order+1, *feature_shape]."""
    return jnp.zeros((max_order + 1,) + tuple(feature_shape), dtype)


def taylor_update(factors: jnp.ndarray, feature: jnp.ndarray,
                  dd: jnp.ndarray, n_upd: jnp.ndarray) -> jnp.ndarray:
    """Full-step factor refresh (derivative_approximation:11-28)."""
    max_order = factors.shape[0] - 1
    safe_dd = jnp.where(dd > 0, dd, 1.0)
    new = [feature.astype(factors.dtype)]
    for i in range(max_order):
        nxt = (new[i] - factors[i]) / safe_dd
        new.append(jnp.where(i < n_upd, nxt, jnp.zeros_like(nxt)))
    return jnp.stack(new)


def taylor_predict(factors: jnp.ndarray, x: jnp.ndarray,
                   n_stored: jnp.ndarray) -> jnp.ndarray:
    """Taylor extrapolation (taylor_formula:31-44)."""
    max_order = factors.shape[0] - 1
    out = jnp.zeros_like(factors[0])
    for i in range(max_order + 1):
        term = factors[i] * (x ** i) / math.factorial(i)
        out = out + jnp.where(i < n_stored, term, jnp.zeros_like(term))
    return out
