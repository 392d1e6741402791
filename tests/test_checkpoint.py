"""Checkpoint ingestion tests: synthetic reference-named state dicts ->
converted params -> forward; torch-vs-jax operator equivalence for the
layout-sensitive conversions (patch embed, causal conv)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from univid_tpu.core.checkpoint import (
    _conv,
    _lin,
    convert_bagel_llm,
    convert_umt5,
    convert_wan_dit,
)
from univid_tpu.core.config import T5Config, WanDiTConfig
from univid_tpu.core.dtypes import FP32_POLICY
from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig
from univid_tpu.models.wan.dit import patchify_latent, wan_dit_forward
from univid_tpu.models.wan.t5 import t5_encode
from univid_tpu.models.wan.vae import conv3d
from univid_tpu.core import nn


def test_linear_conversion():
    w = np.random.default_rng(0).standard_normal((6, 4)).astype(np.float32)
    b = np.random.default_rng(1).standard_normal(6).astype(np.float32)
    sd = {"fc.weight": w, "fc.bias": b}
    p = _lin(sd, "fc", jnp.float32)
    x = np.random.default_rng(2).standard_normal((3, 4)).astype(np.float32)
    got = np.asarray(nn.linear(p, jnp.asarray(x)))
    want = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w),
        torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_patch_embed_conversion_matches_torch_conv3d():
    """Conv3d kernel==stride == patchify+linear with the converted weight."""
    rng = np.random.default_rng(0)
    cin, dim = 4, 8
    pt, ph, pw = 1, 2, 2
    conv = torch.nn.Conv3d(cin, dim, (pt, ph, pw), stride=(pt, ph, pw))
    x = rng.standard_normal((1, cin, 2, 4, 4)).astype(np.float32)
    want = conv(torch.from_numpy(x)).detach().numpy()  # [1, dim, F, H', W']

    sd = {"patch_embedding.weight": conv.weight.detach().numpy(),
          "patch_embedding.bias": conv.bias.detach().numpy()}
    w = np.transpose(sd["patch_embedding.weight"],
                     (2, 3, 4, 1, 0)).reshape(-1, dim)
    p = {"w": jnp.asarray(w), "b": jnp.asarray(sd["patch_embedding.bias"])}

    x_cl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # [B,F,H,W,C]
    tokens, grid = patchify_latent(x_cl, (pt, ph, pw))
    got = np.asarray(nn.linear(p, tokens))  # [1, L, dim]
    want_tokens = want.reshape(1, dim, -1).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want_tokens, rtol=1e-4, atol=1e-4)


def test_causal_conv3d_conversion_matches_torch():
    """My NTHWC conv with converted weights == torch Conv3d with causal
    front padding (vae2_2.py:17-42)."""
    rng = np.random.default_rng(1)
    conv = torch.nn.Conv3d(3, 5, 3, padding=0)
    x = rng.standard_normal((1, 3, 4, 6, 6)).astype(np.float32)
    xt = torch.nn.functional.pad(torch.from_numpy(x), (1, 1, 1, 1, 2, 0))
    want = conv(xt).detach().numpy()

    sd = {"c.weight": conv.weight.detach().numpy(),
          "c.bias": conv.bias.detach().numpy()}
    p = _conv(sd, "c", jnp.float32)
    x_cl = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    got = np.asarray(conv3d(x_cl, p["w"], p["b"]))
    want_cl = np.transpose(want, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(got, want_cl, rtol=1e-4, atol=1e-4)


def _dit_state_dict(cfg: WanDiTConfig, seed=0):
    rng = np.random.default_rng(seed)
    d = cfg.dim

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {
        "patch_embedding.weight": r(d, cfg.in_dim, *cfg.patch_size),
        "patch_embedding.bias": r(d),
        "text_embedding.0.weight": r(d, cfg.text_dim),
        "text_embedding.0.bias": r(d),
        "text_embedding.2.weight": r(d, d),
        "text_embedding.2.bias": r(d),
        "time_embedding.0.weight": r(d, cfg.freq_dim),
        "time_embedding.0.bias": r(d),
        "time_embedding.2.weight": r(d, d),
        "time_embedding.2.bias": r(d),
        "time_projection.1.weight": r(6 * d, d),
        "time_projection.1.bias": r(6 * d),
        "head.head.weight": r(
            cfg.out_dim * np.prod(cfg.patch_size), d),
        "head.head.bias": r(cfg.out_dim * int(np.prod(cfg.patch_size))),
        "head.modulation": r(1, 2, d),
    }
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        for mod in ("self_attn", "cross_attn"):
            for k in "qkvo":
                sd[f"{b}.{mod}.{k}.weight"] = r(d, d)
                sd[f"{b}.{mod}.{k}.bias"] = r(d)
            sd[f"{b}.{mod}.norm_q.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{mod}.norm_k.weight"] = np.ones(d, np.float32)
        sd[f"{b}.ffn.0.weight"] = r(cfg.ffn_dim, d)
        sd[f"{b}.ffn.0.bias"] = r(cfg.ffn_dim)
        sd[f"{b}.ffn.2.weight"] = r(d, cfg.ffn_dim)
        sd[f"{b}.ffn.2.bias"] = r(d)
        sd[f"{b}.modulation"] = r(1, 6, d)
        sd[f"{b}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"{b}.norm3.bias"] = np.zeros(d, np.float32)
    return sd


def test_wan_dit_conversion_forward():
    cfg = WanDiTConfig(model_type="t2v", in_dim=4, out_dim=4, dim=32,
                       ffn_dim=64, freq_dim=16, text_dim=16, num_heads=4,
                       num_layers=2, text_len=8)
    sd = _dit_state_dict(cfg)
    params = convert_wan_dit(sd, cfg, dtype=jnp.float32)
    from univid_tpu.ops.rope import build_rope_3d
    cos, sin = build_rope_3d(cfg.head_dim, (2, 2, 2))
    x = jnp.ones((1, 2, 4, 4, 4))
    out = wan_dit_forward(params, cfg, x, jnp.asarray([500.0]),
                          jnp.ones((1, 8, 16)), cos, sin,
                          policy=FP32_POLICY)
    assert out.shape == (1, 2, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_umt5_conversion_forward():
    cfg = T5Config(vocab_size=100, dim=16, dim_attn=16, dim_ffn=32,
                   num_heads=2, num_layers=2)
    rng = np.random.default_rng(0)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {"token_embedding.weight": r(100, 16),
          "norm.weight": np.ones(16, np.float32)}
    for i in range(2):
        b = f"blocks.{i}"
        for k in "qkvo":
            sd[f"{b}.attn.{k}.weight"] = r(16, 16)
        sd[f"{b}.norm1.weight"] = np.ones(16, np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(16, np.float32)
        sd[f"{b}.pos_embedding.embedding.weight"] = r(32, 2)
        sd[f"{b}.ffn.gate.0.weight"] = r(32, 16)
        sd[f"{b}.ffn.fc1.weight"] = r(32, 16)
        sd[f"{b}.ffn.fc2.weight"] = r(16, 32)
    params = convert_umt5(sd, cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 100, (1, 8)))
    out = t5_encode(params, cfg, ids, compute_dtype=jnp.float32)
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_bagel_llm_conversion_forward():
    cfg = Qwen2MoTConfig(vocab_size=64, hidden_size=16,
                         intermediate_size=32, num_layers=2, num_heads=2,
                         num_kv_heads=1)
    rng = np.random.default_rng(0)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    hd = cfg.head_dim
    sd = {"language_model.model.embed_tokens.weight": r(64, 16),
          "language_model.model.norm.weight": np.ones(16, np.float32),
          "language_model.model.norm_moe_gen.weight": np.ones(16,
                                                             np.float32),
          "language_model.lm_head.weight": r(64, 16)}
    for i in range(2):
        b = f"language_model.model.layers.{i}"
        for sfx in ("", "_moe_gen"):
            sd[f"{b}.self_attn.q_proj{sfx}.weight"] = r(16, 16)
            sd[f"{b}.self_attn.q_proj{sfx}.bias"] = r(16)
            sd[f"{b}.self_attn.k_proj{sfx}.weight"] = r(hd, 16)
            sd[f"{b}.self_attn.k_proj{sfx}.bias"] = r(hd)
            sd[f"{b}.self_attn.v_proj{sfx}.weight"] = r(hd, 16)
            sd[f"{b}.self_attn.v_proj{sfx}.bias"] = r(hd)
            sd[f"{b}.self_attn.o_proj{sfx}.weight"] = r(16, 16)
        for norm in ("q_norm", "k_norm", "q_norm_moe_gen",
                     "k_norm_moe_gen"):
            sd[f"{b}.self_attn.{norm}.weight"] = np.ones(hd, np.float32)
        for mlp in ("mlp", "mlp_moe_gen"):
            sd[f"{b}.{mlp}.gate_proj.weight"] = r(32, 16)
            sd[f"{b}.{mlp}.up_proj.weight"] = r(32, 16)
            sd[f"{b}.{mlp}.down_proj.weight"] = r(16, 32)
        sd[f"{b}.input_layernorm.weight"] = np.ones(16, np.float32)
        sd[f"{b}.input_layernorm_moe_gen.weight"] = np.ones(16, np.float32)
        sd[f"{b}.post_attention_layernorm.weight"] = np.ones(16, np.float32)
        sd[f"{b}.post_attention_layernorm_moe_gen.weight"] = \
            np.ones(16, np.float32)
    params = convert_bagel_llm(sd, cfg, dtype=jnp.float32)

    from univid_tpu.models.bagel.qwen2_mot import (
        init_kv_cache, qwen2_mot_forward)
    cache = init_kv_cache(cfg, 16, dtype=jnp.float32)
    x = params["embed_tokens"][jnp.asarray([1, 2, 3])]
    h, _ = qwen2_mot_forward(params, cfg, x, jnp.arange(3), cache,
                             compute_dtype=jnp.float32)
    assert h.shape == (3, 16)
    assert np.isfinite(np.asarray(h)).all()


# ---------------------------------------------------------------------------
# real-checkpoint ingestion rehearsal (VERDICT r4 #8): the published
# checkpoints ship as sharded safetensors + *.safetensors.index.json;
# these tests exercise that exact on-disk format through the real loader
# and the header-only pre-flight audit so real-weight day cannot fail
# silently into random-init.
# ---------------------------------------------------------------------------


def _write_sharded_ckpt(tmp_path, manifest, n_shards=3,
                        index_name="model.safetensors.index.json"):
    from safetensors.numpy import save_file

    keys = sorted(manifest)
    weight_map, shards = {}, [{} for _ in range(n_shards)]
    for i, k in enumerate(keys):
        fname = f"model-{i % n_shards + 1:05d}-of-{n_shards:05d}.safetensors"
        weight_map[k] = fname
        shards[i % n_shards][k] = np.zeros(manifest[k], np.float32)
    for i, sd in enumerate(shards):
        save_file(sd, str(tmp_path / f"model-{i + 1:05d}-of-"
                                     f"{n_shards:05d}.safetensors"))
    import json as _json
    (tmp_path / index_name).write_text(_json.dumps(
        {"metadata": {"total_size": 0}, "weight_map": weight_map}))
    return weight_map


def test_sharded_index_load_and_audit(tmp_path):
    """HF sharded layout (index.json + N shards) loads through
    load_state_dict and audits clean header-only."""
    from univid_tpu.core import manifest as M
    from univid_tpu.core.checkpoint import (audit_checkpoint,
                                            collect_checkpoint_shapes,
                                            load_state_dict)
    from univid_tpu.core.config import WanDiTConfig

    cfg = WanDiTConfig(model_type="t2v", in_dim=8, out_dim=8, dim=32,
                       ffn_dim=64, freq_dim=16, text_dim=24, num_heads=4,
                       num_layers=2, text_len=8)
    man = M.wan_dit_manifest(cfg)
    _write_sharded_ckpt(tmp_path, man)
    sd = load_state_dict(str(tmp_path))
    assert set(sd) == set(man)
    shapes = collect_checkpoint_shapes(str(tmp_path))
    assert shapes == {k: tuple(v) for k, v in man.items()}
    diff = audit_checkpoint(str(tmp_path), man)
    assert not any(diff.values()), diff


def test_sharded_index_detects_corruption(tmp_path):
    """Half-downloaded / mismatched checkpoints fail loudly: a key listed
    in the index but absent from shards raises; a wrong shape and an
    extra key surface in the audit."""
    import json as _json

    import pytest
    from safetensors.numpy import save_file

    from univid_tpu.core import manifest as M
    from univid_tpu.core.checkpoint import audit_checkpoint, load_state_dict
    from univid_tpu.core.config import WanDiTConfig

    cfg = WanDiTConfig(model_type="t2v", in_dim=8, out_dim=8, dim=32,
                       ffn_dim=64, freq_dim=16, text_dim=24, num_heads=4,
                       num_layers=2, text_len=8)
    man = M.wan_dit_manifest(cfg)
    weight_map = _write_sharded_ckpt(tmp_path, man, n_shards=2)

    # audit catches shape mismatch + unexpected key (header-only)
    k0 = sorted(man)[0]
    bad = {k0: np.zeros((3, 3), np.float32),
           "stray.weight": np.zeros((2,), np.float32)}
    fname = weight_map[k0]
    # rewrite the shard holding k0 with the corrupted tensor
    from univid_tpu.core.checkpoint import read_safetensors_header
    orig = read_safetensors_header(str(tmp_path / fname))
    full = {k: np.zeros(s, np.float32) for k, (_, s) in orig.items()}
    full.update(bad)
    save_file(full, str(tmp_path / fname))
    diff = audit_checkpoint(str(tmp_path), man)
    assert any(k0 in s for s in diff["shape_mismatch"])
    # stray key is visible header-wise but NOT index-listed; the audit
    # reads via the index, so corruption shows as shape_mismatch only
    assert diff["missing"] == []

    # a key listed in the index but missing from every shard -> loud fail
    idx = tmp_path / "model.safetensors.index.json"
    m = _json.loads(idx.read_text())
    m["weight_map"]["ghost.weight"] = fname
    idx.write_text(_json.dumps(m))
    with pytest.raises(ValueError, match="absent from the shards"):
        load_state_dict(str(tmp_path))


def test_audit_checkpoint_cli(tmp_path):
    """tools/audit_checkpoint.py end-to-end against a pinned-format
    manifest json + sharded checkpoint."""
    import json as _json
    import os
    import subprocess
    import sys

    from univid_tpu.core import manifest as M
    from univid_tpu.core.config import WanDiTConfig

    cfg = WanDiTConfig(model_type="t2v", in_dim=8, out_dim=8, dim=32,
                       ffn_dim=64, freq_dim=16, text_dim=24, num_heads=4,
                       num_layers=2, text_len=8)
    man = M.wan_dit_manifest(cfg)
    mpath = tmp_path / "tiny_dit.json"
    M.save_manifest(str(mpath), man)
    ck = tmp_path / "ckpt"
    ck.mkdir()
    _write_sharded_ckpt(ck, man)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "audit_checkpoint.py"),
         "--ckpt", str(ck), "--manifest", str(mpath)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    r = _json.loads(out.stdout.strip().splitlines()[-1])
    assert r["ok"] is True and r["keys_expected"] == len(man)
