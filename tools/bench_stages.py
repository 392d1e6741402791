#!/usr/bin/env python
"""Per-stage DiT step breakdown — makes the bench MFU attributable.

Times each stage of one denoise step at the bench shape (VERDICT r4 #3:
"self-attn kernel / cross-attn / matmuls / modulation ms per step"),
using the same chained-dispatch + scalar-readback methodology as
tools/bench_attn.py (block_until_ready is a no-op through the TPU
tunnel). Stages are timed as shape-preserving jitted chains with
zeros weights (timing is value-independent on TPU):

  self_attn   fused-rope flash kernel at the padded token count
  qkvo        the 4 d x d attention projections
  cross_attn  q proj + flash vs the 512-token text context + o proj
  ffn         d -> ffn_dim -> d with gelu
  modulation  AdaLN select + fp32 layernorm + scale/shift + residual

Reported per STEP (x num_layers; batch-2 CFG is inside the shapes).
`sum_ms` vs the bench's dit_step_ms attributes the residue to
scan/dispatch overhead. Prints ONE JSON line. Env: BENCH_MODEL/W/H/
FRAMES (bench.py defaults), STAGE_ITERS (default 5).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

PEAK = {"tpu": 197e12}


def _sync(x):
    for leaf in jax.tree.leaves(x):
        float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def bench(fn, x, iters):
    out = fn(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out.astype(x.dtype) if out.shape == x.shape else x)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from univid_tpu.core import nn
    from univid_tpu.core.config import WAN_CONFIGS, dit_seq_len
    from univid_tpu.kernels.attention import attention
    from univid_tpu.ops.rope import build_rope_3d

    model = os.environ.get("BENCH_MODEL", "t2v-1.3B")
    w = int(os.environ.get("BENCH_W", "832"))
    h = int(os.environ.get("BENCH_H", "480"))
    frames = int(os.environ.get("BENCH_FRAMES", "81"))
    iters = int(os.environ.get("STAGE_ITERS", "5"))
    spec = WAN_CONFIGS[model]
    cfg = spec.dit
    d, n_heads, layers = cfg.dim, cfg.num_heads, cfg.num_layers
    dh = cfg.head_dim
    seq = dit_seq_len(spec, w, h, frames)
    pt, ph, pw = cfg.patch_size
    from univid_tpu.core.config import latent_shape
    _, lf, lh, lw = latent_shape(spec, w, h, frames)
    grid = (lf // pt, lh // ph, lw // pw)
    b = 2  # batch-2 CFG

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, seq, d), jnp.bfloat16)
    x32 = x.astype(jnp.float32)

    def zeros_lin(din, dout):
        return {"w": jnp.zeros((din, dout), jnp.bfloat16),
                "b": jnp.zeros((dout,), jnp.bfloat16)}

    rows = {}

    # ---- self-attention kernel (fused rope, kv_len mask — the bench
    # config) ---------------------------------------------------------------
    cos, sin = build_rope_3d(dh, grid)
    from univid_tpu.kernels.flash_attention import build_fused_rope_tables
    tabs = build_fused_rope_tables(jnp.asarray(cos), jnp.asarray(sin), dh)

    # STAGE_BOUND=1: bounded-softmax kernel (static qk-norm score bound,
    # exact math — see core/dtypes.py); value-independent timing
    sb = jnp.float32(float(dh)) \
        if os.environ.get("STAGE_BOUND", "0") == "1" else None

    @jax.jit
    def self_attn(q):
        qh = q.reshape(b, seq, n_heads, dh)
        o = attention(qh, qh, qh, rope_tables=tabs, score_bound=sb)
        return o.reshape(b, seq, d).astype(jnp.bfloat16)

    rows["self_attn"] = bench(self_attn, x, iters)

    # ---- qkvo projections ---------------------------------------------------
    pq, pk, pv, po = (zeros_lin(d, d) for _ in range(4))

    @jax.jit
    def qkvo(y):
        q = nn.linear(pq, y, compute_dtype=jnp.bfloat16)
        k = nn.linear(pk, y, compute_dtype=jnp.bfloat16)
        v = nn.linear(pv, y, compute_dtype=jnp.bfloat16)
        return nn.linear(po, q + k + v, compute_dtype=jnp.bfloat16)

    rows["qkvo"] = bench(qkvo, x, iters)

    # ---- cross-attention ----------------------------------------------------
    ctx = jax.random.normal(key, (b, cfg.text_len, d), jnp.bfloat16)
    ck, cv = zeros_lin(d, d), zeros_lin(d, d)
    cq, co = zeros_lin(d, d), zeros_lin(d, d)

    @jax.jit
    def cross(y):
        q = nn.linear(cq, y, compute_dtype=jnp.bfloat16)
        k = nn.linear(ck, ctx, compute_dtype=jnp.bfloat16)
        v = nn.linear(cv, ctx, compute_dtype=jnp.bfloat16)
        o = attention(q.reshape(b, seq, n_heads, dh),
                      k.reshape(b, cfg.text_len, n_heads, dh),
                      v.reshape(b, cfg.text_len, n_heads, dh))
        return nn.linear(co, o.reshape(b, seq, d),
                         compute_dtype=jnp.bfloat16)

    rows["cross_attn"] = bench(cross, x, iters)

    # ---- ffn ----------------------------------------------------------------
    f0, f1 = zeros_lin(d, cfg.ffn_dim), zeros_lin(cfg.ffn_dim, d)

    @jax.jit
    def ffn(y):
        z = nn.linear(f0, y, compute_dtype=jnp.bfloat16)
        return nn.linear(f1, nn.gelu_tanh(z), compute_dtype=jnp.bfloat16)

    rows["ffn"] = bench(ffn, x, iters)

    # ---- modulation / norms (3 AdaLN applications + residual adds/step,
    # fp32 islands — timed as one representative application x3) ------------
    e0 = jnp.zeros((b, 2, 6, d), jnp.float32)
    mask = jnp.zeros((b, seq), bool)

    @jax.jit
    def modulation(y32):
        mod = e0 + 1.0
        sel = jnp.where(mask[..., None], mod[:, 1, 0][:, None],
                        mod[:, 0, 0][:, None])
        z = nn.layer_norm(y32) * (1.0 + sel) + sel
        return (y32 + z * sel) / 2.0

    rows["modulation_x3"] = 3 * bench(modulation, x32, iters)

    per_step = {k: round(v * layers * 1e3, 1) for k, v in rows.items()}
    total = round(sum(per_step.values()), 1)
    peak = PEAK.get(jax.default_backend(), 197e12)
    attn_flops = 4 * b * n_heads * seq * seq * dh * layers
    out = {
        "model": model, "resolution": f"{w}x{h}x{frames}f",
        "seq": seq, "layers": layers,
        "per_step_ms": per_step,
        "sum_ms": total,
        "share": {k: round(v / total, 3) for k, v in per_step.items()},
        "self_attn_kernel_mfu": round(
            attn_flops / (rows["self_attn"] * layers) / peak, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
