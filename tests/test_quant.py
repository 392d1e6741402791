"""int8 weight-only quantization (core/quant.py + nn.linear qw path)."""

import jax
import jax.numpy as jnp
import numpy as np

from univid_tpu.core import nn
from univid_tpu.core.quant import (quantize_linear, quantize_tree,
                                   quantized_bytes)


def test_quantize_linear_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    q = quantize_linear({"w": w, "b": jnp.zeros((128,))})
    assert q["qw"].dtype == jnp.int8
    assert q["scale"].shape == (128,)
    deq = q["qw"].astype(jnp.float32) * q["scale"]
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.01  # half-ULP of 1/127 per channel


def test_linear_quantized_matches_dense():
    rng = np.random.default_rng(1)
    p = {"w": jnp.asarray(rng.standard_normal((64, 48)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal(48), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    dense = nn.linear(p, x, compute_dtype=jnp.float32)
    quant = nn.linear(quantize_linear(p), x, compute_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(quant - dense)
                / jnp.linalg.norm(dense))
    assert rel < 0.01


def test_quantize_tree_structure_and_bytes():
    from univid_tpu.models.bagel.qwen2_mot import (Qwen2MoTConfig,
                                                   init_qwen2_mot)

    cfg = Qwen2MoTConfig(vocab_size=512, hidden_size=256,
                         intermediate_size=512, num_layers=2,
                         num_heads=4, num_kv_heads=2)
    params = init_qwen2_mot(jax.random.PRNGKey(0), cfg,
                            param_dtype=jnp.bfloat16)
    base = quantized_bytes(params)
    qp = quantize_tree(params)
    # embeddings skipped, stacked layer linears quantized
    assert "qw" not in jax.tree_util.tree_leaves_with_path(qp)[0]
    assert qp["layers"]["attn"]["q"]["qw"].dtype == jnp.int8
    assert qp["layers"]["mlp_gen"]["down"]["qw"].dtype == jnp.int8
    assert qp["embed_tokens"].dtype == jnp.bfloat16
    # norms survive unquantized
    assert qp["layers"]["attn"]["q_norm"].dtype == jnp.bfloat16
    assert quantized_bytes(qp) < 0.65 * base


def test_quantized_mot_forward_close_to_dense():
    from univid_tpu.models.bagel.qwen2_mot import (Qwen2MoTConfig,
                                                   init_kv_cache,
                                                   init_qwen2_mot,
                                                   lm_head_logits,
                                                   qwen2_mot_forward)

    cfg = Qwen2MoTConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_layers=2,
                         num_heads=4, num_kv_heads=2)
    params = init_qwen2_mot(jax.random.PRNGKey(0), cfg)
    qp = quantize_tree(params, min_size=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.hidden_size))
    pos = jnp.arange(8)
    h_d, _ = qwen2_mot_forward(params, cfg, x, pos,
                               init_kv_cache(cfg, 16, jnp.float32),
                               mode="und", compute_dtype=jnp.float32)
    h_q, _ = qwen2_mot_forward(qp, cfg, x, pos,
                               init_kv_cache(cfg, 16, jnp.float32),
                               mode="und", compute_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(h_q - h_d) / jnp.linalg.norm(h_d))
    assert rel < 0.05
    lg_d = lm_head_logits(params, cfg, h_d[-1:], jnp.float32)
    lg_q = lm_head_logits(qp, cfg, h_q[-1:], jnp.float32)
    assert int(lg_d.argmax()) == int(lg_q.argmax())
