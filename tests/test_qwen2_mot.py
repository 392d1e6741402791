"""Qwen2-MoT tests: cache-append decode == full-sequence forward, MoT
routing, rope tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.models.bagel.qwen2_mot import (
    Qwen2MoTConfig,
    apply_rope_half,
    init_kv_cache,
    init_qwen2_mot,
    lm_head_logits,
    qwen2_mot_forward,
    rope_tables,
)

TINY = Qwen2MoTConfig(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=2,
)


@pytest.fixture(scope="module")
def model():
    return init_qwen2_mot(jax.random.PRNGKey(0), TINY)


def _embed(model, ids):
    return model["embed_tokens"][jnp.asarray(ids)]


def test_rope_half_rotation_norm():
    pos = jnp.arange(6)
    cos, sin = rope_tables(pos, 8, 1e6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 2, 8)),
                    jnp.float32)
    y = apply_rope_half(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # position 0 = identity
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(x[0]),
                               rtol=1e-6)


def test_prefill_then_decode_matches_full(model):
    """KV-cache incremental decode must equal one full causal forward."""
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 64, 10)
    x = _embed(model, ids)
    pos = jnp.arange(10)

    cache = init_kv_cache(TINY, 32, dtype=jnp.float32)
    h_full, _ = qwen2_mot_forward(model, TINY, x, pos, cache,
                                  compute_dtype=jnp.float32)

    # prefill 6, then decode 4 one at a time
    cache = init_kv_cache(TINY, 32, dtype=jnp.float32)
    h_pre, cache = qwen2_mot_forward(model, TINY, x[:6], pos[:6], cache,
                                     compute_dtype=jnp.float32)
    outs = [h_pre]
    for i in range(6, 10):
        h_i, cache = qwen2_mot_forward(model, TINY, x[i:i + 1],
                                       pos[i:i + 1], cache,
                                       compute_dtype=jnp.float32)
        outs.append(h_i)
    h_inc = jnp.concatenate(outs, axis=0)
    np.testing.assert_allclose(np.asarray(h_inc), np.asarray(h_full),
                               rtol=2e-4, atol=2e-4)


def test_padded_query_tail_is_masked(model):
    """Rows past q_valid must not affect valid outputs or the cache
    cursor."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 64, 8)
    x = _embed(model, ids)
    pos = jnp.arange(8)

    cache = init_kv_cache(TINY, 32, dtype=jnp.float32)
    h_a, cache_a = qwen2_mot_forward(model, TINY, x[:6], pos[:6], cache,
                                     compute_dtype=jnp.float32)

    x_pad = jnp.concatenate([x[:6], jnp.ones((2, 32)) * 99.0], axis=0)
    cache = init_kv_cache(TINY, 32, dtype=jnp.float32)
    h_b, cache_b = qwen2_mot_forward(model, TINY, x_pad, pos, cache,
                                     q_valid=jnp.asarray(6, jnp.int32),
                                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(h_b[:6]), np.asarray(h_a),
                               rtol=2e-4, atol=2e-4)
    assert int(cache_b["len"]) == 6
    # a subsequent decode step sees identical context
    nxt = _embed(model, [5])
    d_a, _ = qwen2_mot_forward(model, TINY, nxt, jnp.asarray([6]), cache_a,
                               compute_dtype=jnp.float32)
    d_b, _ = qwen2_mot_forward(model, TINY, nxt, jnp.asarray([6]), cache_b,
                               compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=2e-4,
                               atol=2e-4)


def test_gen_mode_routes_experts(model):
    """'gen' mode uses the gen experts except at und_rows; outputs must
    differ from 'und' mode on the same inputs."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 32)), jnp.float32)
    pos = jnp.zeros((6,), jnp.int32)
    cache = init_kv_cache(TINY, 16, dtype=jnp.float32)
    h_und, _ = qwen2_mot_forward(model, TINY, x, pos, cache, mode="und",
                                 is_causal=False,
                                 compute_dtype=jnp.float32)
    h_gen, _ = qwen2_mot_forward(
        model, TINY, x, pos, cache, mode="gen",
        und_rows=jnp.asarray([0, 5], jnp.int32), is_causal=False,
        compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(h_und), np.asarray(h_gen))


def test_logits_shape(model):
    h = jnp.ones((3, 32), jnp.float32)
    logits = lm_head_logits(model, TINY, h, compute_dtype=jnp.float32)
    assert logits.shape == (3, 64)
    assert logits.dtype == jnp.float32
