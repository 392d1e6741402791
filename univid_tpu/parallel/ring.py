"""Ring attention over the sequence-parallel mesh axis.

The long-video scaling slot (SURVEY.md §2.5: absent in the reference,
reserved as the design slot for frames >> 121): keys/values stay
sharded and ROTATE around the ring via `jax.lax.ppermute` while each
shard's queries accumulate partial attention with an online-softmax
merge — peak activation memory is O(L/sp) per chip instead of the
O(L) the Ulysses all-to-all path materializes after gathering the
sequence, and the permute of the next kv shard overlaps the current
shard's flash kernel (XLA schedules the ICI send/recv concurrently
with compute).

Composition matches `ulysses_attention`'s contract: called inside
`shard_map` on seq-sharded [B, L/sp, N, D] with RoPE already applied
per shard from global tables; padded tail keys are masked via the
GLOBAL real sequence length.

Merge math: the flash kernel returns per-row o (normalized) and the
exp2-domain lse = m + log2(l). Two partials combine as
  lse' = log2(2^lse_a + 2^lse_b)
  o'   = 2^(lse_a - lse') * o_a + 2^(lse_b - lse') * o_b
with the kernel's empty-row sentinel (+1e30) remapped to -inf weight.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention_padded

_NEG = jnp.float32(-1e30)


def _row_lse(lse: jnp.ndarray, b: int, n: int) -> jnp.ndarray:
    """[B*N, L, 128] lane-broadcast lse -> [B, L, N, 1] fp32 per-row,
    with the kernel's empty-row sentinel (+1e30) mapped to -1e30 so an
    empty partial contributes zero weight in the merge."""
    row = lse[:, :, :1].reshape(b, n, -1, 1).transpose(0, 2, 1, 3)
    return jnp.where(row > 1e29, _NEG, row)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, *,
                   seq_len_global: Optional[jnp.ndarray] = None,
                   block_q: Optional[int] = None,
                   block_k: Optional[int] = None,
                   softmax_scale: Optional[float] = None,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """Full (non-causal) attention over seq-sharded q/k/v
    [B, L/sp, N, D]; returns [B, L/sp, N, D] with the same sharding.

    seq_len_global: [B] int32 REAL total key count (padded tail keys
    beyond it are masked; defaults to sp * L/sp = everything valid).
    """
    sp = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, l_loc, n, d = q.shape
    if block_q is None:
        block_q = min(1024, l_loc)
    if block_k is None:
        block_k = min(1024, l_loc)

    if seq_len_global is None:
        seq_len_global = jnp.full((b,), sp * l_loc, jnp.int32)

    o0 = jnp.zeros((b, l_loc, n, d), jnp.float32)
    lse0 = jnp.full((b, l_loc, n, 1), _NEG, jnp.float32)
    perm = [(j, (j + 1) % sp) for j in range(sp)]

    def body(step, carry):
        o, lse, k_cur, v_cur = carry
        # kv currently on this chip originated at shard (my - step) % sp
        src = (my - step) % sp
        valid = jnp.clip(seq_len_global - src * l_loc, 0, l_loc)
        o_i, lse_i = flash_attention_padded(
            q, k_cur, v_cur, kv_len=valid.astype(jnp.int32),
            softmax_scale=softmax_scale, block_q=block_q,
            block_k=block_k, save_residuals=True, interpret=interpret)
        lse_i = _row_lse(lse_i, b, n)
        m = jnp.maximum(lse, lse_i)
        # m == -inf proxy (both empty) -> keep weights at 0
        w_a = jnp.where(m > _NEG / 2, jnp.exp2(lse - m), 0.0)
        w_b = jnp.where(m > _NEG / 2, jnp.exp2(lse_i - m), 0.0)
        tot = w_a + w_b
        lse_new = jnp.where(tot > 0, m + jnp.log2(jnp.maximum(tot, 1e-30)),
                            _NEG)
        inv = jnp.where(tot > 0, 1.0 / jnp.maximum(tot, 1e-30), 0.0)
        o_new = (o * w_a + o_i.astype(jnp.float32) * w_b) * inv
        # rescale: previous o was normalized by its own tot — fold back
        # NOTE o carries the already-merged normalized value, so the
        # incremental form above is exact: o' = (w_a*o + w_b*o_i)/tot.
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return o_new, lse_new, k_nxt, v_nxt

    o, lse, _, _ = jax.lax.fori_loop(0, sp, body, (o0, lse0, k, v))
    return o.astype(q.dtype)
