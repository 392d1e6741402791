"""Ulysses sequence-parallel attention via ICI all-to-all.

Reference mechanism (models/wan/distributed/ulysses.py:9-47): NCCL
all_to_all scatters heads / gathers sequence, runs full-sequence flash
attention per head group, then the inverse all_to_all. Here the same data
movement is two `jax.lax.all_to_all` calls on a named mesh axis inside
`shard_map` — XLA lowers them onto ICI.

Composition with context-parallel chunking (sequence_parallel.py:64-176):
activations enter sharded [B, L/sp, N, D]; RoPE has already been applied
per shard using globally-indexed tables.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.attention import attention


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      axis_name: str, *, kv_len: Optional[jnp.ndarray] = None,
                      causal: bool = False, rope_tables=None,
                      softmax_bf16: bool = False,
                      qk_int8: bool = False,
                      score_bound=None) -> jnp.ndarray:
    """Full-sequence attention over seq-sharded q/k/v [B, L/sp, N, D].

    Returns [B, L/sp, N, D] (same sharding as input).

    rope_tables (build_fused_rope_tables output over the GLOBAL padded
    sequence) fuses the rotary prologue into the flash kernel: after the
    all-to-all each chip holds the full sequence in global position
    order, so the full tables apply directly — q/k must arrive UNROTATED.
    Without it the caller applies per-shard RoPE before the all-to-all
    (reference sequence_parallel.py:50-55 semantics).
    """
    # scatter heads, gather sequence: [B, L/sp, N, D] -> [B, L, N/sp, D]
    qg = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    kg = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    vg = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)
    o = attention(qg, kg, vg, kv_len=kv_len, causal=causal,
                  rope_tables=rope_tables, softmax_bf16=softmax_bf16,
                  qk_int8=qk_int8, score_bound=score_bound)
    # inverse: gather heads, scatter sequence
    return jax.lax.all_to_all(o, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)
