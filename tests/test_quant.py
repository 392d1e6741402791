"""int8 quantization: weight-only (qw) and dynamic W8A8 (qw8) paths."""

import jax
import jax.numpy as jnp
import numpy as np

from univid_tpu.core import nn
from univid_tpu.core.quant import (quantize_dit_w8a8, quantize_linear,
                                   quantize_linear_w8a8, quantize_tree,
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


def test_w8a8_linear_matches_dense():
    rng = np.random.default_rng(2)
    p = {"w": jnp.asarray(rng.standard_normal((96, 80)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal(80), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((7, 96)), jnp.float32)
    dense = nn.linear(p, x, compute_dtype=jnp.float32)
    q = quantize_linear_w8a8(p)
    assert q["qw8"].dtype == jnp.int8 and "qw" not in q
    quant = nn.linear(q, x, compute_dtype=jnp.float32)
    # W8A8 adds activation-quant error on top of the weight quant:
    # per-token symmetric int8 on gaussian activations stays ~1%
    rel = float(jnp.linalg.norm(quant - dense) / jnp.linalg.norm(dense))
    assert rel < 0.02


def test_w8a8_linear_int8_dot_under_jit():
    # the dot must lower with int8 operands (the whole point of the
    # mode); snoop the jaxpr for an s8 x s8 -> s32 dot_general
    p = quantize_linear_w8a8(
        {"w": jnp.ones((32, 16), jnp.float32)})
    x = jnp.ones((4, 32), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(
        lambda p, x: nn.linear(p, x, compute_dtype=jnp.bfloat16))(p, x)
    s = str(jaxpr)
    assert "dot_general" in s and "preferred_element_type=int32" in s


def test_quantize_dit_w8a8_forward_close():
    """Full DiT forward with the int8 serving tree stays within ~1% of
    fp32 on the tiny config (scan-stacked block leaves quantized;
    embeds/modulation/head untouched)."""
    from univid_tpu.core.config import WAN_CONFIGS
    from univid_tpu.models.wan.dit import init_wan_dit, wan_dit_forward
    from univid_tpu.ops.rope import build_rope_3d

    cfg = WAN_CONFIGS["tiny"].dit
    p = init_wan_dit(jax.random.PRNGKey(0), cfg, param_dtype=jnp.float32)
    hw = p["head"]["head"]["w"]  # zero-init head would void the check
    p["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(9), hw.shape, hw.dtype)
    q = quantize_dit_w8a8(p)
    assert q["blocks"]["self_attn"]["q"]["qw8"].dtype == jnp.int8
    assert q["blocks"]["ffn"]["fc1"]["qw8"].dtype == jnp.int8
    assert "w" in q["head"]["head"]  # output head stays dense
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8, 8, cfg.in_dim))
    t = jnp.array([500.0])
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim)) * 0.02
    f = 5
    h = 8 // cfg.patch_size[1]
    w = 8 // cfg.patch_size[2]
    cos, sin = build_rope_3d(cfg.head_dim, (f, h, w))
    a = np.asarray(wan_dit_forward(p, cfg, x, t, ctx, cos, sin))
    b = np.asarray(wan_dit_forward(q, cfg, x, t, ctx, cos, sin))
    rel = float(np.linalg.norm(a - b) / np.linalg.norm(a))
    assert rel < 0.015


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
