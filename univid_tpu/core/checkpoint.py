"""Checkpoint ingestion: reference torch layouts -> UniVid-TPU param trees.

Covers the reference's load surfaces (SURVEY.md §5 checkpoint/resume):
  * Wan DiT:  diffusers-style sharded safetensors / .pth
    (WanModel.from_pretrained, textimage2video.py:103)
  * Wan VAE:  raw torch .pth state dict (vae2_2.py:882)
  * UMT5:     raw torch .pth (t5.py:496)
  * BAGEL:    ema.safetensors via accelerate layout
    (model_pipeline.py:1174-1182)

Conversions: torch Linear [out, in] -> [in, out]; Conv3d/Conv2d
[O, I, k...] -> [k..., I, O]; per-layer block dicts -> stacked leaves for
the scan-over-layers forward. Mappings are exercised against synthetic
state dicts with reference key names in tests/test_checkpoint.py (real
weights are not available in this environment).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .config import T5Config, WanDiTConfig, WanModelSpec, WanVAEConfig


# ---------------------------------------------------------------------------
# loading raw state dicts
# ---------------------------------------------------------------------------


def _find_index_json(path: str):
    """HF/diffusers sharded-checkpoint index (model.safetensors.index.json
    etc.) in a checkpoint dir, or None."""
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors.index.json"):
            return os.path.join(path, fname)
    return None


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load .safetensors (single or sharded dir) or torch .pth into numpy.

    Sharded dirs honor the *.safetensors.index.json weight_map when
    present (the published Wan/UMT5/BAGEL/FLUX layouts): exactly the
    mapped shard files are read and every mapped key must materialize —
    real-weight day must not silently half-load (VERDICT r4 #8)."""
    if os.path.isdir(path):
        idx = _find_index_json(path)
        if idx is not None:
            with open(idx) as fh:
                weight_map = json.load(fh)["weight_map"]
            out = {}
            for fname in sorted(set(weight_map.values())):
                out.update(_load_safetensors(os.path.join(path, fname)))
            missing = sorted(set(weight_map) - set(out))
            if missing:
                raise ValueError(
                    f"sharded checkpoint {path}: {len(missing)} keys in "
                    f"the index are absent from the shards, first: "
                    f"{missing[:5]}")
            return out
        out = {}
        for fname in sorted(os.listdir(path)):
            if fname.endswith(".safetensors"):
                out.update(_load_safetensors(os.path.join(path, fname)))
        if out:
            return out
        for fname in sorted(os.listdir(path)):
            if fname.endswith((".pth", ".pt", ".bin")):
                out.update(_load_torch(os.path.join(path, fname)))
        return out
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    return _load_torch(path)


def read_safetensors_header(path: str) -> Dict[str, tuple]:
    """{key: (dtype_str, shape)} from a .safetensors header — 8-byte LE
    length + JSON — without reading any tensor data. Lets the audit of a
    multi-GB real checkpoint run in milliseconds."""
    import struct
    with open(path, "rb") as fh:
        (n,) = struct.unpack("<Q", fh.read(8))
        header = json.loads(fh.read(n))
    return {k: (v["dtype"], tuple(v["shape"]))
            for k, v in header.items() if k != "__metadata__"}


def collect_checkpoint_shapes(path: str) -> Dict[str, tuple]:
    """{key: shape} for a checkpoint file/dir, header-only for
    safetensors (sharded dirs via the index weight_map); torch .pth
    falls back to a full load."""
    if os.path.isdir(path):
        idx = _find_index_json(path)
        if idx is not None:
            with open(idx) as fh:
                weight_map = json.load(fh)["weight_map"]
            shapes: Dict[str, tuple] = {}
            for fname in sorted(set(weight_map.values())):
                for k, (_, shp) in read_safetensors_header(
                        os.path.join(path, fname)).items():
                    shapes[k] = shp
            missing = sorted(set(weight_map) - set(shapes))
            if missing:
                raise ValueError(
                    f"index lists {len(missing)} keys absent from shard "
                    f"headers, first: {missing[:5]}")
            return shapes
        shapes = {}
        found = False
        for fname in sorted(os.listdir(path)):
            if fname.endswith(".safetensors"):
                found = True
                shapes.update({k: s for k, (_, s) in
                               read_safetensors_header(
                                   os.path.join(path, fname)).items()})
        if found:
            return shapes
    elif path.endswith(".safetensors"):
        return {k: s for k, (_, s) in
                read_safetensors_header(path).items()}
    return {k: tuple(v.shape) for k, v in load_state_dict(path).items()}


def audit_checkpoint(path: str, manifest) -> Dict[str, list]:
    """Key+shape diff of an on-disk checkpoint against a pinned manifest
    (core/manifest.py audit_keys), header-only for safetensors. The
    pre-flight for real-weight day: run BEFORE any conversion so a
    mismatched download fails loudly, not silently into random-init
    (tools/audit_checkpoint.py is the CLI)."""
    from types import SimpleNamespace

    from .manifest import audit_keys
    shapes = collect_checkpoint_shapes(path)
    shim = {k: SimpleNamespace(shape=s) for k, s in shapes.items()}
    return audit_keys(shim, manifest)


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _load_torch(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # published SAM2 .pt checkpoints wrap the weights under "model"
    if isinstance(sd, dict) and isinstance(sd.get("model"), dict):
        sd = sd["model"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16
            else v.numpy() for k, v in sd.items()}


def _lin(sd, key, dtype):
    """torch Linear -> {'w': [in, out], 'b': [out]}."""
    p = {"w": jnp.asarray(sd[f"{key}.weight"].T, dtype)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{key}.bias"], dtype)
    return p


def _conv(sd, key, dtype):
    """torch ConvNd [O, I, k...] -> {'w': [k..., I, O], 'b': [O]}."""
    w = sd[f"{key}.weight"]
    nd = w.ndim
    w = np.transpose(w, tuple(range(2, nd)) + (1, 0))
    p = {"w": jnp.asarray(w, dtype)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{key}.bias"], dtype)
    return p


def _stack(dicts: List[dict]):
    """List of identical-structure dicts -> one dict of stacked leaves."""
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# Wan DiT
# ---------------------------------------------------------------------------


def convert_wan_dit(sd: Dict[str, np.ndarray], cfg: WanDiTConfig,
                    dtype=jnp.bfloat16):
    """WanModel state dict (model.py:294-408 naming) -> stacked params."""
    pt, ph, pw = cfg.patch_size
    # Conv3d patch embed [dim, in, pt, ph, pw] -> dense [(pt ph pw in), dim]
    w = sd["patch_embedding.weight"]
    w = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, cfg.dim)
    params = {
        "patch_embed": {"w": jnp.asarray(w, dtype),
                        "b": jnp.asarray(sd["patch_embedding.bias"],
                                         dtype)},
        "text_embedding": {
            "fc0": _lin(sd, "text_embedding.0", dtype),
            "fc1": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {
            "fc0": _lin(sd, "time_embedding.0", jnp.float32),
            "fc1": _lin(sd, "time_embedding.2", jnp.float32)},
        "time_projection": {
            "fc0": _lin(sd, "time_projection.1", jnp.float32)},
        "head": {
            "head": _lin(sd, "head.head", jnp.float32),
            "modulation": jnp.asarray(
                sd["head.modulation"].reshape(2, cfg.dim), jnp.float32)},
    }

    def attn(prefix):
        p = {k: _lin(sd, f"{prefix}.{k}", dtype) for k in "qkvo"}
        if cfg.qk_norm:
            p["norm_q"] = jnp.asarray(sd[f"{prefix}.norm_q.weight"], dtype)
            p["norm_k"] = jnp.asarray(sd[f"{prefix}.norm_k.weight"], dtype)
        return p

    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        block = {
            "self_attn": attn(f"{b}.self_attn"),
            "cross_attn": attn(f"{b}.cross_attn"),
            "ffn": {"fc0": _lin(sd, f"{b}.ffn.0", dtype),
                    "fc1": _lin(sd, f"{b}.ffn.2", dtype)},
            "modulation": jnp.asarray(
                sd[f"{b}.modulation"].reshape(6, cfg.dim), jnp.float32),
        }
        if cfg.cross_attn_norm:
            block["norm3"] = {
                "w": jnp.asarray(sd[f"{b}.norm3.weight"], dtype),
                "b": jnp.asarray(sd[f"{b}.norm3.bias"], dtype)}
        blocks.append(block)
    params["blocks"] = _stack(blocks)
    return params


def convert_wan_animate(sd: Dict[str, np.ndarray], cfg,
                        dtype=jnp.bfloat16):
    """WanAnimateModel state dict (model_animate.py:246-340 naming +
    motion_encoder/face_encoder/face_adapter submodules) -> params for
    models/wan/animate/model.py."""
    pt, ph, pw = cfg.patch_size

    def conv3d_as_dense(key, out_dim):
        w = sd[f"{key}.weight"]
        w = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, out_dim)
        return {"w": jnp.asarray(w, dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    params = {
        "patch_embed": conv3d_as_dense("patch_embedding", cfg.dim),
        "pose_patch_embed": conv3d_as_dense("pose_patch_embedding",
                                            cfg.dim),
        "text_embedding": {
            "fc0": _lin(sd, "text_embedding.0", dtype),
            "fc1": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {
            "fc0": _lin(sd, "time_embedding.0", jnp.float32),
            "fc1": _lin(sd, "time_embedding.2", jnp.float32)},
        "time_projection": {
            "fc0": _lin(sd, "time_projection.1", jnp.float32)},
        "head": {
            "head": _lin(sd, "head.head", jnp.float32),
            "modulation": jnp.asarray(
                sd["head.modulation"].reshape(2, cfg.dim), jnp.float32)},
    }
    if cfg.use_img_emb:
        params["img_emb"] = {
            "ln0": {"w": jnp.asarray(sd["img_emb.proj.0.weight"], dtype),
                    "b": jnp.asarray(sd["img_emb.proj.0.bias"], dtype)},
            "fc0": _lin(sd, "img_emb.proj.1", dtype),
            "fc1": _lin(sd, "img_emb.proj.3", dtype),
            "ln1": {"w": jnp.asarray(sd["img_emb.proj.4.weight"], dtype),
                    "b": jnp.asarray(sd["img_emb.proj.4.bias"], dtype)},
        }

    def attn(prefix, img_kv=False):
        p = {k: _lin(sd, f"{prefix}.{k}", dtype) for k in "qkvo"}
        if cfg.qk_norm:
            p["norm_q"] = jnp.asarray(sd[f"{prefix}.norm_q.weight"], dtype)
            p["norm_k"] = jnp.asarray(sd[f"{prefix}.norm_k.weight"], dtype)
        if img_kv:
            p["k_img"] = _lin(sd, f"{prefix}.k_img", dtype)
            p["v_img"] = _lin(sd, f"{prefix}.v_img", dtype)
            if cfg.qk_norm:
                p["norm_k_img"] = jnp.asarray(
                    sd[f"{prefix}.norm_k_img.weight"], dtype)
        return p

    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        block = {
            "self_attn": attn(f"{b}.self_attn"),
            "cross_attn": attn(f"{b}.cross_attn", img_kv=cfg.use_img_emb),
            "ffn": {"fc0": _lin(sd, f"{b}.ffn.0", dtype),
                    "fc1": _lin(sd, f"{b}.ffn.2", dtype)},
            "modulation": jnp.asarray(
                sd[f"{b}.modulation"].reshape(6, cfg.dim), jnp.float32),
        }
        if cfg.cross_attn_norm:
            block["norm3"] = {
                "w": jnp.asarray(sd[f"{b}.norm3.weight"], dtype),
                "b": jnp.asarray(sd[f"{b}.norm3.bias"], dtype)}
        blocks.append(block)
    params["blocks"] = _stack(blocks)

    # --- motion encoder (LIA Generator: enc.net_app.convs.* / enc.fc.* /
    # dec.direction.weight). ConvLayer is an nn.Sequential: conv weight at
    # .0 (or .1 after Blur when downsampling), FusedLeakyReLU bias last.
    def eq_conv(prefix, act=True):
        w = sd[f"{prefix}.weight"]                       # [O, I, kh, kw]
        p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32)}
        if f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)
        return p

    me = "motion_encoder.enc.net_app.convs"
    first = eq_conv(f"{me}.0.0")
    first["act_b"] = jnp.asarray(sd[f"{me}.0.1.bias"], jnp.float32)
    n_res = len({k.split(".")[4] for k in sd
                 if k.startswith(me)}) - 2  # minus first + final convs
    res_blocks = []
    for i in range(1, 1 + n_res):
        blk = {}
        c1 = eq_conv(f"{me}.{i}.conv1.0")
        c1["act_b"] = jnp.asarray(sd[f"{me}.{i}.conv1.1.bias"],
                                  jnp.float32)
        c2 = eq_conv(f"{me}.{i}.conv2.1")   # Blur at .0, conv at .1
        c2["act_b"] = jnp.asarray(sd[f"{me}.{i}.conv2.2.bias"],
                                  jnp.float32)
        blk["conv1"], blk["conv2"] = c1, c2
        blk["skip"] = eq_conv(f"{me}.{i}.skip.1")
        res_blocks.append(blk)
    final = eq_conv(f"{me}.{1 + n_res}")
    fc = []
    for i in range(5):
        fc.append({"w": jnp.asarray(sd[
            f"motion_encoder.enc.fc.{i}.weight"].T, jnp.float32),
            "b": jnp.asarray(sd[f"motion_encoder.enc.fc.{i}.bias"],
                             jnp.float32)})
    params["motion_encoder"] = {
        "first": first, "blocks": res_blocks, "final": final, "fc": fc,
        "direction": jnp.asarray(
            sd["motion_encoder.dec.direction.weight"], jnp.float32)}

    # --- face encoder (face_blocks.py FaceEncoder naming) ---------------
    def cc1d(prefix):
        w = sd[f"{prefix}.conv.weight"]                  # [O, I, k]
        return {"w": jnp.asarray(np.transpose(w, (2, 1, 0)), jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.conv.bias"], jnp.float32)}

    params["face_encoder"] = {
        "conv1_local": cc1d("face_encoder.conv1_local"),
        "conv2": cc1d("face_encoder.conv2"),
        "conv3": cc1d("face_encoder.conv3"),
        "out_proj": _lin(sd, "face_encoder.out_proj", dtype),
        "padding_tokens": jnp.asarray(sd["face_encoder.padding_tokens"],
                                      dtype),
    }

    # --- face adapter blocks ---------------------------------------------
    adapters = []
    for j in range(cfg.adapter_layers):
        b = f"face_adapter.fuser_blocks.{j}"
        adapters.append({
            "linear1_kv": _lin(sd, f"{b}.linear1_kv", dtype),
            "linear1_q": _lin(sd, f"{b}.linear1_q", dtype),
            "linear2": _lin(sd, f"{b}.linear2", dtype),
            "q_norm": jnp.asarray(sd[f"{b}.q_norm.weight"], dtype),
            "k_norm": jnp.asarray(sd[f"{b}.k_norm.weight"], dtype),
        })
    params["face_adapter"] = _stack(adapters)
    return params


# ---------------------------------------------------------------------------
# Wan video VAE
# ---------------------------------------------------------------------------


def _res_block_from(sd, prefix, dtype):
    """ResidualBlock (vae2_2.py:193-212): residual = [RMS, SiLU, conv,
    RMS, SiLU, Dropout, conv]; shortcut conv when dims differ."""
    p = {
        "norm1": jnp.asarray(sd[f"{prefix}.residual.0.gamma"].reshape(-1),
                             dtype),
        "conv1": _conv(sd, f"{prefix}.residual.2", dtype),
        "norm2": jnp.asarray(sd[f"{prefix}.residual.3.gamma"].reshape(-1),
                             dtype),
        "conv2": _conv(sd, f"{prefix}.residual.6", dtype),
    }
    if f"{prefix}.shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut", dtype)
    return p


def _vae_attn_from(sd, prefix, dtype):
    """AttentionBlock (vae2_2.py:238-277): 1x1 conv qkv/proj -> linear."""
    qkv_w = sd[f"{prefix}.to_qkv.weight"][:, :, 0, 0]  # [3C, C]
    proj_w = sd[f"{prefix}.proj.weight"][:, :, 0, 0]
    return {
        "norm": jnp.asarray(sd[f"{prefix}.norm.gamma"].reshape(-1), dtype),
        "qkv": {"w": jnp.asarray(qkv_w.T, dtype),
                "b": jnp.asarray(sd[f"{prefix}.to_qkv.bias"], dtype)},
        "proj": {"w": jnp.asarray(proj_w.T, dtype),
                 "b": jnp.asarray(sd[f"{prefix}.proj.bias"], dtype)},
    }


def convert_clip_vit(sd: Dict[str, np.ndarray], cfg,
                     dtype=jnp.float32, prefix: str = "visual."):
    """XLM-Roberta-CLIP visual tower state dict (reference animate
    clip.py:209-300 VisionTransformer naming, usually under a 'visual.'
    prefix inside the full CLIPModel checkpoint) -> params for
    models/wan/animate/clip_vit.py.

    Only the visual tower is converted: the textual XLM-R side is a
    documented dead code path (PARITY.md rescopes), and post_norm/head
    are unused by the animate use_31_block extraction
    (clip.py:293-297)."""
    g = lambda k: sd[prefix + k]  # noqa: E731

    # Conv2d patch embed [D, 3, p, p] -> linear over (p*p*3) patches in
    # the (h_patch, w_patch, channel) flatten order of clip_visual_forward
    w = np.asarray(g("patch_embedding.weight"))
    d = w.shape[0]
    w = np.transpose(w, (2, 3, 1, 0)).reshape(-1, d)
    patch = {"w": jnp.asarray(w, dtype)}
    if prefix + "patch_embedding.bias" in sd:
        patch["b"] = jnp.asarray(g("patch_embedding.bias"), dtype)

    def norm(k):
        return {"w": jnp.asarray(g(f"{k}.weight"), dtype),
                "b": jnp.asarray(g(f"{k}.bias"), dtype)}

    def layer(i):
        p = f"transformer.{i}"
        qkv_w = np.asarray(g(f"{p}.attn.to_qkv.weight"))  # [3D, D]
        qkv_b = np.asarray(g(f"{p}.attn.to_qkv.bias"))
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        return {
            "ln1": norm(f"{p}.norm1"),
            "attn": {
                "q": {"w": jnp.asarray(qw.T, dtype),
                      "b": jnp.asarray(qb, dtype)},
                "k": {"w": jnp.asarray(kw.T, dtype),
                      "b": jnp.asarray(kb, dtype)},
                "v": {"w": jnp.asarray(vw.T, dtype),
                      "b": jnp.asarray(vb, dtype)},
                "o": _lin(sd, f"{prefix}{p}.attn.proj", dtype),
            },
            "ln2": norm(f"{p}.norm2"),
            "mlp": {"fc0": _lin(sd, f"{prefix}{p}.mlp.0", dtype),
                    "fc1": _lin(sd, f"{prefix}{p}.mlp.2", dtype)},
        }

    return {
        "patch_embed": patch,
        "cls": jnp.asarray(np.asarray(g("cls_embedding")).reshape(1, d),
                           dtype),
        "pos_embed": jnp.asarray(
            np.asarray(g("pos_embedding")).reshape(-1, d), dtype),
        "pre_norm": norm("pre_norm"),
        "layers": _stack([layer(i) for i in range(cfg.num_layers)]),
    }


def load_wan_animate_checkpoint(checkpoint_dir: str, animate_cfg,
                                vae_cfg: WanVAEConfig, clip_cfg=None,
                                dtype=jnp.bfloat16):
    """(animate_params, vae_params, clip_params|None) from a reference
    WanAnimate checkpoint dir (animate.py:85-131: transformer shards +
    Wan2.1 VAE + models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth)."""
    animate_params = convert_wan_animate(load_state_dict(checkpoint_dir),
                                         animate_cfg, dtype)
    vae_path = None
    for cand in ("Wan2.1_VAE.pth", "Wan2.2_VAE.pth", "vae.pth"):
        p = os.path.join(checkpoint_dir, cand)
        if os.path.exists(p):
            vae_path = p
            break
    if vae_path is None:
        raise FileNotFoundError(f"no VAE checkpoint in {checkpoint_dir}")
    vae_params = convert_wan_vae(load_state_dict(vae_path), vae_cfg)
    clip_params = None
    if clip_cfg is not None:
        for cand in (
                "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
                "clip.pth"):
            p = os.path.join(checkpoint_dir, cand)
            if os.path.exists(p):
                clip_params = convert_clip_vit(load_state_dict(p),
                                               clip_cfg, dtype)
                break
    return animate_params, vae_params, clip_params


def convert_wan_vae(sd: Dict[str, np.ndarray], cfg: WanVAEConfig,
                    dtype=jnp.float32):
    """WanVAE_ state dict (vae2_2.py naming) -> params."""
    n_levels = len(cfg.dim_mult)

    enc = {"conv1": _conv(sd, "encoder.conv1", dtype)}
    for i in range(n_levels):
        base = f"encoder.downsamples.{i}.downsamples"
        level = {}
        for j in range(cfg.num_res_blocks):
            level[f"res{j}"] = _res_block_from(sd, f"{base}.{j}", dtype)
        down_flag = i != n_levels - 1
        if down_flag:
            r = f"{base}.{cfg.num_res_blocks}"
            t_down = cfg.temporal_downsample[i] if i < len(
                cfg.temporal_downsample) else False
            # Resample: [ZeroPad2d, Conv2d] (down)
            level["resample"] = _conv(sd, f"{r}.resample.1", dtype)
            if t_down:
                level["time_conv"] = _conv(sd, f"{r}.time_conv", dtype)
        enc[f"down{i}"] = level
    enc["mid_res1"] = _res_block_from(sd, "encoder.middle.0", dtype)
    enc["mid_attn"] = _vae_attn_from(sd, "encoder.middle.1", dtype)
    enc["mid_res2"] = _res_block_from(sd, "encoder.middle.2", dtype)
    enc["head_norm"] = jnp.asarray(sd["encoder.head.0.gamma"].reshape(-1),
                                   dtype)
    enc["head_conv"] = _conv(sd, "encoder.head.2", dtype)

    dec = {"conv1": _conv(sd, "decoder.conv1", dtype)}
    dec["mid_res1"] = _res_block_from(sd, "decoder.middle.0", dtype)
    dec["mid_attn"] = _vae_attn_from(sd, "decoder.middle.1", dtype)
    dec["mid_res2"] = _res_block_from(sd, "decoder.middle.2", dtype)
    ups = cfg.temporal_upsample
    for i in range(n_levels):
        base = f"decoder.upsamples.{i}.upsamples"
        level = {}
        for j in range(cfg.num_res_blocks + 1):
            level[f"res{j}"] = _res_block_from(sd, f"{base}.{j}", dtype)
        up_flag = i != n_levels - 1
        if up_flag:
            r = f"{base}.{cfg.num_res_blocks + 1}"
            t_up = ups[i] if i < len(ups) else False
            # Resample: [Upsample, Conv2d] (up)
            level["resample"] = _conv(sd, f"{r}.resample.1", dtype)
            if t_up:
                level["time_conv"] = _conv(sd, f"{r}.time_conv", dtype)
        dec[f"up{i}"] = level
    dec["head_norm"] = jnp.asarray(sd["decoder.head.0.gamma"].reshape(-1),
                                   dtype)
    dec["head_conv"] = _conv(sd, "decoder.head.2", dtype)

    return {"encoder": enc, "decoder": dec,
            "conv_mu": _conv(sd, "conv1", dtype),
            "conv_z": _conv(sd, "conv2", dtype)}


# ---------------------------------------------------------------------------
# UMT5 encoder
# ---------------------------------------------------------------------------


def convert_umt5(sd: Dict[str, np.ndarray], cfg: T5Config,
                 dtype=jnp.bfloat16):
    """T5Encoder state dict (t5.py naming) -> params."""
    params = {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"], dtype),
        "norm": jnp.asarray(sd["norm.weight"], dtype),
        "blocks": {},
    }
    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        blocks.append({
            "norm1": jnp.asarray(sd[f"{b}.norm1.weight"], dtype),
            "attn": {k: {"w": jnp.asarray(sd[f"{b}.attn.{k}.weight"].T,
                                          dtype)} for k in "qkvo"},
            "pos_embedding": jnp.asarray(
                sd[f"{b}.pos_embedding.embedding.weight"], dtype),
            "norm2": jnp.asarray(sd[f"{b}.norm2.weight"], dtype),
            "ffn": {
                "gate": {"w": jnp.asarray(sd[f"{b}.ffn.gate.0.weight"].T,
                                          dtype)},
                "fc1": {"w": jnp.asarray(sd[f"{b}.ffn.fc1.weight"].T,
                                         dtype)},
                "fc2": {"w": jnp.asarray(sd[f"{b}.ffn.fc2.weight"].T,
                                         dtype)},
            },
        })
    params["blocks"] = {str(i): b for i, b in enumerate(blocks)}
    return params


# ---------------------------------------------------------------------------
# BAGEL (Qwen2-MoT LLM + heads)
# ---------------------------------------------------------------------------


def convert_bagel_llm(sd: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16,
                      prefix: str = "language_model.model"):
    """Qwen2MoT state dict (qwen2_navit.py naming) -> stacked params."""
    def attn_set(base, suffix=""):
        p = {
            "q": _lin(sd, f"{base}.q_proj{suffix}", dtype),
            "k": _lin(sd, f"{base}.k_proj{suffix}", dtype),
            "v": _lin(sd, f"{base}.v_proj{suffix}", dtype),
            "o": _lin(sd, f"{base}.o_proj{suffix}", dtype),
        }
        if cfg.qk_norm:
            qn = "q_norm_moe_gen" if suffix else "q_norm"
            kn = "k_norm_moe_gen" if suffix else "k_norm"
            p["q_norm"] = jnp.asarray(sd[f"{base}.{qn}.weight"], dtype)
            p["k_norm"] = jnp.asarray(sd[f"{base}.{kn}.weight"], dtype)
        return p

    def mlp_set(base):
        return {"gate": _lin(sd, f"{base}.gate_proj", dtype),
                "up": _lin(sd, f"{base}.up_proj", dtype),
                "down": _lin(sd, f"{base}.down_proj", dtype)}

    layers = []
    for i in range(cfg.num_layers):
        b = f"{prefix}.layers.{i}"
        layer = {
            "input_ln": jnp.asarray(sd[f"{b}.input_layernorm.weight"],
                                    dtype),
            "attn": attn_set(f"{b}.self_attn"),
            "post_ln": jnp.asarray(
                sd[f"{b}.post_attention_layernorm.weight"], dtype),
            "mlp": mlp_set(f"{b}.mlp"),
        }
        if cfg.moe:
            layer["input_ln_gen"] = jnp.asarray(
                sd[f"{b}.input_layernorm_moe_gen.weight"], dtype)
            layer["attn_gen"] = attn_set(f"{b}.self_attn", "_moe_gen")
            layer["post_ln_gen"] = jnp.asarray(
                sd[f"{b}.post_attention_layernorm_moe_gen.weight"], dtype)
            layer["mlp_gen"] = mlp_set(f"{b}.mlp_moe_gen")
        layers.append(layer)

    params = {
        "embed_tokens": jnp.asarray(sd[f"{prefix}.embed_tokens.weight"],
                                    dtype),
        "layers": _stack(layers),
        "norm": jnp.asarray(sd[f"{prefix}.norm.weight"], dtype),
        "lm_head": _lin(sd, "language_model.lm_head", dtype),
    }
    if cfg.moe:
        params["norm_gen"] = jnp.asarray(sd[f"{prefix}.norm_moe_gen.weight"],
                                         dtype)
    return params


# ---------------------------------------------------------------------------
# top-level loaders
# ---------------------------------------------------------------------------


def load_wan_checkpoint(checkpoint_dir: str, spec: WanModelSpec,
                        dtype=jnp.bfloat16, strict: bool = True):
    """(dit_params, vae_params) from a reference Wan checkpoint dir.

    strict: audit key consumption — any source key the converter never
    reads raises (a renamed/new checkpoint key would otherwise silently
    leave part of the model random-init)."""
    from .manifest import audited
    dit_sd = load_state_dict(checkpoint_dir)
    dit_params, _ = audited(
        dit_sd, lambda sd: convert_wan_dit(sd, spec.dit, dtype),
        strict=strict)
    vae_path = None
    for cand in ("Wan2.2_VAE.pth", "Wan2.1_VAE.pth", "vae.pth"):
        p = os.path.join(checkpoint_dir, cand)
        if os.path.exists(p):
            vae_path = p
            break
    if vae_path is None:
        raise FileNotFoundError(f"no VAE checkpoint in {checkpoint_dir}")
    vae_params, _ = audited(
        load_state_dict(vae_path),
        lambda sd: convert_wan_vae(sd, spec.vae), strict=strict)
    return dit_params, vae_params


def load_wan_moe_checkpoint(checkpoint_dir: str, spec: WanModelSpec,
                            dtype=jnp.bfloat16):
    """((low_params, high_params), vae_params) from an A14B dual-expert
    checkpoint dir. The reference ships the two experts as
    low_noise_model/ and high_noise_model/ subfolders
    (text2video.py:93-116 loads both via WanModel.from_pretrained with
    subfolder=config.{low,high}_noise_checkpoint)."""
    low = convert_wan_dit(
        load_state_dict(os.path.join(checkpoint_dir, "low_noise_model")),
        spec.dit, dtype)
    high = convert_wan_dit(
        load_state_dict(os.path.join(checkpoint_dir, "high_noise_model")),
        spec.dit, dtype)
    vae_path = None
    for cand in ("Wan2.2_VAE.pth", "Wan2.1_VAE.pth", "vae.pth"):
        p = os.path.join(checkpoint_dir, cand)
        if os.path.exists(p):
            vae_path = p
            break
    if vae_path is None:
        raise FileNotFoundError(f"no VAE checkpoint in {checkpoint_dir}")
    vae_params = convert_wan_vae(load_state_dict(vae_path), spec.vae)
    return (low, high), vae_params


def load_projector_checkpoint(path: str, cfg, dtype=jnp.float32):
    """ContextProjector weights from a reference training_state.pt
    (inference.py:227-236 loads {'context_projector': state_dict}) or a
    bare projector state dict. torch layout: projection.0/2.{weight,bias}
    = fc0/ln0? -> reference ContextProjector (model_pipeline.py:1506-1528)
    is Sequential(Linear, LayerNorm, GELU, Dropout, Linear, LayerNorm)
    named bagel_to_t5_projector: indices 0, 1, 4, 5."""
    sd = load_state_dict(path)
    # unwrap training_state containers
    for container_key in ("context_projector", "projector",
                          "model_state_dict"):
        prefixed = {k[len(container_key) + 1:]: v for k, v in sd.items()
                    if k.startswith(container_key + ".")}
        if prefixed:
            sd = prefixed
            break
    root = ""
    for cand in ("bagel_to_t5_projector.", "projection.", ""):
        if f"{cand}0.weight" in sd:
            root = cand
            break
    return {
        "fc0": _lin(sd, f"{root}0", dtype),
        "ln0": {"w": jnp.asarray(sd[f"{root}1.weight"], dtype),
                "b": jnp.asarray(sd[f"{root}1.bias"], dtype)},
        "fc1": _lin(sd, f"{root}4", dtype),
        "ln1": {"w": jnp.asarray(sd[f"{root}5.weight"], dtype),
                "b": jnp.asarray(sd[f"{root}5.bias"], dtype)},
    }


def load_bagel_checkpoint(model_path: str, dtype=jnp.bfloat16,
                          strict: bool = True):
    """BAGEL ema.safetensors + configs -> (params, cfg, siglip cfg/params,
    tokenizer). Requires a real checkpoint directory.

    strict: the full ema key set must be consumed by the converters
    (manifest.audited) — unread keys raise instead of silently leaving
    model parts random-init."""
    from ..models.bagel.bagel import BagelConfig, init_bagel
    from ..models.bagel.qwen2_mot import Qwen2MoTConfig
    from ..models.bagel.siglip import SiglipConfig
    from ..utils.tokenizers import load_tokenizer
    from .manifest import RecordingDict

    src = load_state_dict(os.path.join(model_path, "ema.safetensors"))
    sd = RecordingDict(src)
    llm_cfg = Qwen2MoTConfig()
    cfg = BagelConfig(llm=llm_cfg)
    params = {
        "llm": convert_bagel_llm(sd, llm_cfg, dtype),
        "time_embedder": {
            "fc0": _lin(sd, "time_embedder.mlp.0", jnp.float32),
            "fc1": _lin(sd, "time_embedder.mlp.2", jnp.float32)},
        "vae2llm": _lin(sd, "vae2llm", dtype),
        "llm2vae": _lin(sd, "llm2vae", jnp.float32),
        "latent_pos_embed": jnp.asarray(sd["latent_pos_embed.pos_embed"],
                                        dtype),
        "connector": {
            "fc0": _lin(sd, "connector.fc1", dtype),
            "fc1": _lin(sd, "connector.fc2", dtype)},
        "vit_pos_embed": jnp.asarray(sd["vit_pos_embed.pos_embed"], dtype),
    }
    scfg = SiglipConfig()
    sig_params = convert_siglip(sd, scfg, dtype,
                                prefix="vit_model.vision_model")
    leftover = sorted(set(src) - sd.consumed)
    if leftover:
        msg = (f"{len(leftover)} ema.safetensors keys not consumed "
               f"(first 10: {leftover[:10]})")
        if strict:
            raise ValueError(msg + " — pass strict=False to downgrade")
        import warnings
        warnings.warn(msg)
    tokenizer = load_tokenizer(model_path)
    return params, cfg, scfg, sig_params, tokenizer


def convert_flux_ae(sd: Dict[str, np.ndarray], cfg, dtype=jnp.float32):
    """FLUX AutoEncoder state dict (BAGEL ae.safetensors,
    modeling/autoencoder.py:290-360 naming) -> init_image_vae params."""

    def gn(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def res(key):
        p = {"norm1": gn(f"{key}.norm1"),
             "conv1": _conv(sd, f"{key}.conv1", dtype),
             "norm2": gn(f"{key}.norm2"),
             "conv2": _conv(sd, f"{key}.conv2", dtype)}
        if f"{key}.nin_shortcut.weight" in sd:
            p["shortcut"] = _conv(sd, f"{key}.nin_shortcut", dtype)
        return p

    def attn(key):
        return {"norm": gn(f"{key}.norm"),
                "q": _conv(sd, f"{key}.q", dtype),
                "k": _conv(sd, f"{key}.k", dtype),
                "v": _conv(sd, f"{key}.v", dtype),
                "proj": _conv(sd, f"{key}.proj_out", dtype)}

    n_levels = len(cfg.ch_mult)
    enc = {"conv_in": _conv(sd, "encoder.conv_in", dtype)}
    for i in range(n_levels):
        level = {}
        for j in range(cfg.num_res_blocks):
            level[f"res{j}"] = res(f"encoder.down.{i}.block.{j}")
        if i != n_levels - 1:
            level["down"] = _conv(sd, f"encoder.down.{i}.downsample.conv",
                                  dtype)
        enc[f"down{i}"] = level
    enc["mid_res1"] = res("encoder.mid.block_1")
    enc["mid_attn"] = attn("encoder.mid.attn_1")
    enc["mid_res2"] = res("encoder.mid.block_2")
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out", dtype)

    dec = {"conv_in": _conv(sd, "decoder.conv_in", dtype)}
    dec["mid_res1"] = res("decoder.mid.block_1")
    dec["mid_attn"] = attn("decoder.mid.attn_1")
    dec["mid_res2"] = res("decoder.mid.block_2")
    for i in range(n_levels):
        level = {}
        for j in range(cfg.num_res_blocks + 1):
            level[f"res{j}"] = res(f"decoder.up.{i}.block.{j}")
        if i != 0:
            level["up"] = _conv(sd, f"decoder.up.{i}.upsample.conv", dtype)
        dec[f"up{i}"] = level
    dec["norm_out"] = gn("decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out", dtype)
    return {"encoder": enc, "decoder": dec}


def load_flux_ae_checkpoint(path: str, cfg=None, dtype=jnp.float32):
    """BAGEL ships the FLUX image VAE as ae.safetensors next to
    ema.safetensors (reference load_ae, autoencoder.py:339-360; wired at
    eval_understanding.py:474). -> (params, cfg)."""
    from ..models.bagel.autoencoder import ImageVAEConfig
    if cfg is None:
        cfg = ImageVAEConfig()
    if os.path.isdir(path):
        path = os.path.join(path, "ae.safetensors")
    sd = load_state_dict(path)
    return convert_flux_ae(sd, cfg, dtype), cfg


def convert_siglip2_text(sd, cfg, dtype=jnp.float32,
                         prefix: str = "text_model"):
    """HF SiglipTextTransformer -> scorer text-tower params
    (reflection/scorer.py init_siglip_text layout). The pooling head
    (text_model.head) becomes the 'proj' linear applied to the last
    token (pooling='hf_last')."""
    params = {
        "token_embed": jnp.asarray(
            sd[f"{prefix}.embeddings.token_embedding.weight"], dtype),
        "pos_embed": jnp.asarray(
            sd[f"{prefix}.embeddings.position_embedding.weight"], dtype),
        "final_ln": {
            "w": jnp.asarray(sd[f"{prefix}.final_layer_norm.weight"],
                             dtype),
            "b": jnp.asarray(sd[f"{prefix}.final_layer_norm.bias"],
                             dtype)},
        "proj": _lin(sd, f"{prefix}.head", dtype),
    }
    layers = []
    for i in range(cfg.num_layers):
        b = f"{prefix}.encoder.layers.{i}"
        layers.append({
            "ln1": {"w": jnp.asarray(sd[f"{b}.layer_norm1.weight"], dtype),
                    "b": jnp.asarray(sd[f"{b}.layer_norm1.bias"], dtype)},
            "attn": {
                "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{b}.self_attn.out_proj", dtype)},
            "ln2": {"w": jnp.asarray(sd[f"{b}.layer_norm2.weight"], dtype),
                    "b": jnp.asarray(sd[f"{b}.layer_norm2.bias"], dtype)},
            "mlp": {"fc0": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc1": _lin(sd, f"{b}.mlp.fc2", dtype)},
        })
    params["layers"] = _stack(layers)
    return params


def convert_siglip_map_head(sd, dtype=jnp.float32,
                            prefix: str = "vision_model.head"):
    """HF SiglipMultiheadAttentionPoolingHead -> map_head_forward params:
    packed torch MultiheadAttention in_proj [3d, d] split into q/k/v."""
    d = sd[f"{prefix}.probe"].shape[-1]
    w = sd[f"{prefix}.attention.in_proj_weight"]
    b = sd[f"{prefix}.attention.in_proj_bias"]
    return {
        "probe": jnp.asarray(sd[f"{prefix}.probe"], dtype),
        "q": {"w": jnp.asarray(w[:d].T, dtype),
              "b": jnp.asarray(b[:d], dtype)},
        "k": {"w": jnp.asarray(w[d:2 * d].T, dtype),
              "b": jnp.asarray(b[d:2 * d], dtype)},
        "v": {"w": jnp.asarray(w[2 * d:].T, dtype),
              "b": jnp.asarray(b[2 * d:], dtype)},
        "o": _lin(sd, f"{prefix}.attention.out_proj", dtype),
        "ln": {"w": jnp.asarray(sd[f"{prefix}.layernorm.weight"], dtype),
               "b": jnp.asarray(sd[f"{prefix}.layernorm.bias"], dtype)},
        "mlp": {"fc0": _lin(sd, f"{prefix}.mlp.fc1", dtype),
                "fc1": _lin(sd, f"{prefix}.mlp.fc2", dtype)},
    }


def load_siglip2_checkpoint(path: str, dtype=jnp.float32,
                            vision_heads: Optional[int] = None,
                            text_heads: Optional[int] = None):
    """Full HF SigLIP/SigLIP2 dual tower -> scorer parts. Sizes are
    inferred from tensor shapes; head counts come from config.json (the
    HF checkpoint layout) or the explicit arguments."""
    import json as _json

    from ..models.bagel.siglip import SiglipConfig
    from ..reflection.scorer import SiglipTextConfig

    sd = load_state_dict(path)
    cfg_dir = path if os.path.isdir(path) else os.path.dirname(path)
    cfg_json = os.path.join(cfg_dir, "config.json")
    if os.path.exists(cfg_json):
        with open(cfg_json) as f:
            hf = _json.load(f)
        vision_heads = vision_heads or hf.get("vision_config", {}).get(
            "num_attention_heads")
        text_heads = text_heads or hf.get("text_config", {}).get(
            "num_attention_heads")

    def count_layers(prefix):
        n = 0
        while f"{prefix}.encoder.layers.{n}.layer_norm1.weight" in sd:
            n += 1
        return n

    v_hidden = sd["vision_model.embeddings.patch_embedding.bias"].shape[0]
    pe = sd["vision_model.embeddings.patch_embedding.weight"]
    patch = pe.shape[-1] if pe.ndim == 4 else int(
        np.sqrt(pe.shape[1] // 3))
    n_pos = sd["vision_model.embeddings.position_embedding.weight"].shape[0]
    image_size = int(np.sqrt(n_pos)) * patch
    v_heads = vision_heads or (16 if v_hidden % 16 == 0 else 12)
    vision_cfg = SiglipConfig(
        hidden_size=v_hidden,
        intermediate_size=sd[
            "vision_model.encoder.layers.0.mlp.fc1.bias"].shape[0],
        num_layers=count_layers("vision_model"), num_heads=v_heads,
        patch_size=patch, image_size=image_size)

    t_hidden = sd["text_model.embeddings.token_embedding.weight"].shape[1]
    text_cfg = SiglipTextConfig(
        vocab_size=sd[
            "text_model.embeddings.token_embedding.weight"].shape[0],
        hidden_size=t_hidden,
        intermediate_size=sd[
            "text_model.encoder.layers.0.mlp.fc1.bias"].shape[0],
        num_layers=count_layers("text_model"),
        num_heads=text_heads or (16 if t_hidden % 16 == 0 else 12),
        max_len=sd[
            "text_model.embeddings.position_embedding.weight"].shape[0],
        proj_dim=sd["text_model.head.bias"].shape[0], pooling="hf_last")

    return {
        "vision": convert_siglip(sd, vision_cfg, dtype,
                                 prefix="vision_model"),
        "vision_cfg": vision_cfg,
        "map_head": convert_siglip_map_head(sd, dtype),
        "text": convert_siglip2_text(sd, text_cfg, dtype),
        "text_cfg": text_cfg,
        "logit_scale": (float(np.asarray(sd["logit_scale"]).reshape(-1)[0])
                        if "logit_scale" in sd else 0.0),
    }


def convert_siglip(sd, cfg, dtype=jnp.bfloat16,
                   prefix: str = "vision_model"):
    """SiglipVisionTransformer (navit) -> params. The patch embedding may
    be Conv2d [O, I, p, p] or already linearized (siglip_navit.py:167)."""
    pe_key = f"{prefix}.embeddings.patch_embedding.weight"
    w = sd[pe_key]
    if w.ndim == 4:  # conv form [O, I, p, p] -> [(p p I), O] with (h, w, c)
        w = np.transpose(w, (2, 3, 1, 0)).reshape(-1, cfg.hidden_size)
    else:  # linear [O, I*p*p] with torch (c, h, w) flatten -> reorder
        o, flat = w.shape
        p = cfg.patch_size
        w = w.reshape(o, cfg.num_channels, p, p)
        w = np.transpose(w, (2, 3, 1, 0)).reshape(-1, o)
    params = {
        "patch_embed": {
            "w": jnp.asarray(w, dtype),
            "b": jnp.asarray(
                sd[f"{prefix}.embeddings.patch_embedding.bias"], dtype)},
        "post_ln": {
            "w": jnp.asarray(sd[f"{prefix}.post_layernorm.weight"], dtype),
            "b": jnp.asarray(sd[f"{prefix}.post_layernorm.bias"], dtype)},
    }
    if f"{prefix}.embeddings.position_embedding.weight" in sd:
        params["pos_embed"] = jnp.asarray(
            sd[f"{prefix}.embeddings.position_embedding.weight"], dtype)
    layers = []
    for i in range(cfg.num_layers):
        b = f"{prefix}.encoder.layers.{i}"
        layers.append({
            "ln1": {"w": jnp.asarray(sd[f"{b}.layer_norm1.weight"], dtype),
                    "b": jnp.asarray(sd[f"{b}.layer_norm1.bias"], dtype)},
            "attn": {
                "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{b}.self_attn.out_proj", dtype)},
            "ln2": {"w": jnp.asarray(sd[f"{b}.layer_norm2.weight"], dtype),
                    "b": jnp.asarray(sd[f"{b}.layer_norm2.bias"], dtype)},
            "mlp": {"fc0": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc1": _lin(sd, f"{b}.mlp.fc2", dtype)},
        })
    params["layers"] = _stack(layers)
    return params


# ---------------------------------------------------------------------------
# SAM2 video segmenter
# ---------------------------------------------------------------------------


def convert_sam2(sd: Dict[str, np.ndarray], cfg, dtype=jnp.float32):
    """Published SAM2 checkpoint (facebookresearch/sam2
    sam2_hiera_large.pt, the model the reference preprocess builds in
    sam_utils.py:122-155) -> models/sam2 param tree. `cfg` is a
    Sam2Config. The prompt encoder's mask-input path
    (sam_prompt_encoder.mask_downscaling.*) is intentionally not
    ingested: the reference workflow prompts with points only
    (process_pipepline.py:318-341); pass it via `ignore` in audited()."""

    def ln(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def attn4(key):
        return {"q": _lin(sd, f"{key}.q_proj", dtype),
                "k": _lin(sd, f"{key}.k_proj", dtype),
                "v": _lin(sd, f"{key}.v_proj", dtype),
                "o": _lin(sd, f"{key}.out_proj", dtype)}

    def mlp(key, n):
        return {"layers": [_lin(sd, f"{key}.layers.{i}", dtype)
                           for i in range(n)]}

    def deconv(key):
        # torch ConvTranspose2d [in, out, k, k] -> HWIO [k, k, in, out]
        w = sd[f"{key}.weight"]
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1)), dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    def chw_embed(key):
        # [1, C, h, w] background/window pos embeds -> [h, w, C]
        return jnp.asarray(np.transpose(sd[key], (0, 2, 3, 1))[0], dtype)

    t = "image_encoder.trunk"
    trunk = {
        "patch_embed": _conv(sd, f"{t}.patch_embed.proj", dtype),
        "pos_embed": chw_embed(f"{t}.pos_embed"),
        "pos_embed_window": chw_embed(f"{t}.pos_embed_window"),
        "blocks": [],
    }
    for i, spec in enumerate(cfg.hiera.block_layout()):
        b = f"{t}.blocks.{i}"
        blk = {"norm1": ln(f"{b}.norm1"),
               "qkv": _lin(sd, f"{b}.attn.qkv", dtype),
               "attn_proj": _lin(sd, f"{b}.attn.proj", dtype),
               "norm2": ln(f"{b}.norm2"),
               "mlp0": _lin(sd, f"{b}.mlp.layers.0", dtype),
               "mlp1": _lin(sd, f"{b}.mlp.layers.1", dtype)}
        if spec["dim"] != spec["dim_out"]:
            blk["proj"] = _lin(sd, f"{b}.proj", dtype)
        trunk["blocks"].append(blk)
    neck = {"convs": [_conv(sd, f"image_encoder.neck.convs.{i}.conv",
                            dtype)
                      for i in range(len(cfg.hiera.channel_list))]}

    pe = "sam_prompt_encoder"
    prompt = {
        "pe_gaussian": jnp.asarray(
            sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"],
            dtype),
        "point_embeddings": jnp.asarray(np.concatenate(
            [sd[f"{pe}.point_embeddings.{i}.weight"] for i in range(4)],
            axis=0), dtype),
        "not_a_point": jnp.asarray(sd[f"{pe}.not_a_point_embed.weight"][0],
                                   dtype),
        "no_mask": jnp.asarray(sd[f"{pe}.no_mask_embed.weight"][0], dtype),
    }

    md = "sam_mask_decoder"
    tw_layers = []
    for i in range(cfg.head.transformer_depth):
        b = f"{md}.transformer.layers.{i}"
        tw_layers.append({
            "self_attn": attn4(f"{b}.self_attn"),
            "norm1": ln(f"{b}.norm1"),
            "cross_t2i": attn4(f"{b}.cross_attn_token_to_image"),
            "norm2": ln(f"{b}.norm2"),
            "mlp0": _lin(sd, f"{b}.mlp.layers.0", dtype),
            "mlp1": _lin(sd, f"{b}.mlp.layers.1", dtype),
            "norm3": ln(f"{b}.norm3"),
            "cross_i2t": attn4(f"{b}.cross_attn_image_to_token"),
            "norm4": ln(f"{b}.norm4"),
        })
    decoder = {
        "transformer": {
            "layers": tw_layers,
            "final_attn": attn4(
                f"{md}.transformer.final_attn_token_to_image"),
            "norm_final": ln(f"{md}.transformer.norm_final_attn")},
        "iou_token": jnp.asarray(sd[f"{md}.iou_token.weight"][0], dtype),
        "mask_tokens": jnp.asarray(sd[f"{md}.mask_tokens.weight"], dtype),
        "obj_score_token": jnp.asarray(
            sd[f"{md}.obj_score_token.weight"][0], dtype),
        "upscale0": deconv(f"{md}.output_upscaling.0"),
        "upscale_ln": ln(f"{md}.output_upscaling.1"),
        "upscale1": deconv(f"{md}.output_upscaling.3"),
        "hyper_mlps": [mlp(f"{md}.output_hypernetworks_mlps.{i}", 3)
                       for i in range(cfg.head.num_mask_tokens)],
        "iou_head": mlp(f"{md}.iou_prediction_head",
                        cfg.head.iou_head_depth),
        "pred_obj_score_head": mlp(f"{md}.pred_obj_score_head", 3),
        "conv_s0": _conv(sd, f"{md}.conv_s0", dtype),
        "conv_s1": _conv(sd, f"{md}.conv_s1", dtype),
    }

    me = "memory_encoder"
    nl = cfg.memory.mask_downsample_layers
    mem_enc = {
        "mask_down": [
            {"conv": _conv(sd, f"{me}.mask_downsampler.encoder.{3 * i}",
                           dtype),
             "ln": ln(f"{me}.mask_downsampler.encoder.{3 * i + 1}")}
            for i in range(nl)],
        "mask_down_final": _conv(
            sd, f"{me}.mask_downsampler.encoder.{3 * nl}", dtype),
        "pix_feat_proj": _conv(sd, f"{me}.pix_feat_proj", dtype),
        "fuser": [
            {"dwconv": _conv(sd, f"{me}.fuser.layers.{i}.dwconv", dtype),
             "norm": ln(f"{me}.fuser.layers.{i}.norm"),
             "pwconv1": _lin(sd, f"{me}.fuser.layers.{i}.pwconv1", dtype),
             "pwconv2": _lin(sd, f"{me}.fuser.layers.{i}.pwconv2", dtype),
             "gamma": jnp.asarray(sd[f"{me}.fuser.layers.{i}.gamma"],
                                  dtype)}
            for i in range(cfg.memory.fuser_layers)],
        "out_proj": _conv(sd, f"{me}.out_proj", dtype),
    }

    ma = "memory_attention"
    ma_layers = []
    for i in range(cfg.memory.num_layers):
        b = f"{ma}.layers.{i}"
        ma_layers.append({
            "self_attn": attn4(f"{b}.self_attn"),
            "cross_attn": attn4(f"{b}.cross_attn_image"),
            "linear1": _lin(sd, f"{b}.linear1", dtype),
            "linear2": _lin(sd, f"{b}.linear2", dtype),
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "norm3": ln(f"{b}.norm3"),
        })

    return {
        "trunk": trunk, "neck": neck, "prompt": prompt,
        "decoder": decoder, "mem_enc": mem_enc,
        "mem_attn": {"layers": ma_layers, "norm": ln(f"{ma}.norm")},
        "no_mem_embed": jnp.asarray(sd["no_mem_embed"], dtype),
        "no_mem_pos_enc": jnp.asarray(sd["no_mem_pos_enc"], dtype),
        "maskmem_tpos_enc": jnp.asarray(
            np.reshape(sd["maskmem_tpos_enc"],
                       (cfg.num_maskmem, 1, -1)), dtype),
        "obj_ptr_proj": mlp("obj_ptr_proj", 3),
        "no_obj_ptr": jnp.asarray(sd["no_obj_ptr"][0], dtype),
    }


def load_sam2_checkpoint(path: str, cfg=None, dtype=jnp.float32,
                         strict: bool = True):
    """(params, cfg) from a published SAM2 .pt (the reference's
    `--ckpt_path <dir>/sam2/sam2_hiera_large.pt`,
    preprocess_data.py:99-105). The .pt wraps weights under a 'model'
    key; the unused mask-input branch is audited as ignored."""
    from ..models.sam2 import Sam2Config   # deferred: core <-> models
    from .manifest import audited
    if cfg is None:
        cfg = Sam2Config()
    sd = load_state_dict(path)
    params, _ = audited(
        sd, lambda s: convert_sam2(s, cfg, dtype),
        ignore=("sam_prompt_encoder.mask_downscaling.",), strict=strict)
    return params, cfg


# ---------------------------------------------------------------------------
# FLUX.1-Kontext (transformer + HF text encoders)
# ---------------------------------------------------------------------------


def convert_flux_transformer(sd: Dict[str, np.ndarray], cfg,
                             dtype=jnp.bfloat16):
    """BFL flux1-kontext-dev.safetensors -> models.flux params.

    The reference drives this editor through diffusers
    (process_pipepline.py:36-37); we ingest the BFL single-file layout
    (img_in/txt_in/time_in/vector_in/guidance_in, double_blocks.{i}.
    {img,txt}_{mod,attn,mlp}, single_blocks.{i}.linear1/linear2/norm/
    modulation, final_layer) with double/single blocks stacked on a
    leading depth axis for the scan drivers."""

    def mlp_embed(base):
        return {"in_layer": _lin(sd, f"{base}.in_layer", dtype),
                "out_layer": _lin(sd, f"{base}.out_layer", dtype)}

    params = {
        "img_in": _lin(sd, "img_in", dtype),
        "txt_in": _lin(sd, "txt_in", dtype),
        "time_in": mlp_embed("time_in"),
        "vector_in": mlp_embed("vector_in"),
        "final_layer": {
            "linear": _lin(sd, "final_layer.linear", dtype),
            "adaLN": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = mlp_embed("guidance_in")

    def stream(base):
        return {
            "mod": _lin(sd, f"{base}_mod.lin", dtype),
            "qkv": _lin(sd, f"{base}_attn.qkv", dtype),
            "norm_q": jnp.asarray(
                sd[f"{base}_attn.norm.query_norm.scale"], dtype),
            "norm_k": jnp.asarray(
                sd[f"{base}_attn.norm.key_norm.scale"], dtype),
            "proj": _lin(sd, f"{base}_attn.proj", dtype),
            "mlp": {"fc0": _lin(sd, f"{base}_mlp.0", dtype),
                    "fc1": _lin(sd, f"{base}_mlp.2", dtype)},
        }

    params["double_blocks"] = _stack([
        {"img": stream(f"double_blocks.{i}.img"),
         "txt": stream(f"double_blocks.{i}.txt")}
        for i in range(cfg.depth_double)])
    params["single_blocks"] = _stack([
        {
            "mod": _lin(sd, f"single_blocks.{i}.modulation.lin", dtype),
            "linear1": _lin(sd, f"single_blocks.{i}.linear1", dtype),
            "norm_q": jnp.asarray(
                sd[f"single_blocks.{i}.norm.query_norm.scale"], dtype),
            "norm_k": jnp.asarray(
                sd[f"single_blocks.{i}.norm.key_norm.scale"], dtype),
            "linear2": _lin(sd, f"single_blocks.{i}.linear2", dtype),
        }
        for i in range(cfg.depth_single)])
    return params


def convert_t5_hf(sd: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16):
    """HF T5EncoderModel layout (google/t5-v1_1-xxl, FLUX's
    text_encoder_2: shared.weight + encoder.block.{i}.layer.{0,1})
    -> models.wan.t5 params (shared_pos: layer-0 relative-position
    table only)."""
    embed_key = ("shared.weight" if "shared.weight" in sd
                 else "encoder.embed_tokens.weight")
    params = {
        "token_embedding": jnp.asarray(sd[embed_key], dtype),
        "norm": jnp.asarray(sd["encoder.final_layer_norm.weight"], dtype),
        "blocks": {},
    }
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        blk = {
            "norm1": jnp.asarray(sd[f"{b}.layer.0.layer_norm.weight"],
                                 dtype),
            "attn": {k: {"w": jnp.asarray(
                sd[f"{b}.layer.0.SelfAttention.{k}.weight"].T, dtype)}
                for k in "qkvo"},
            "norm2": jnp.asarray(sd[f"{b}.layer.1.layer_norm.weight"],
                                 dtype),
            "ffn": {
                # HF gated act: act(wi_0) * wi_1
                "gate": {"w": jnp.asarray(
                    sd[f"{b}.layer.1.DenseReluDense.wi_0.weight"].T,
                    dtype)},
                "fc1": {"w": jnp.asarray(
                    sd[f"{b}.layer.1.DenseReluDense.wi_1.weight"].T,
                    dtype)},
                "fc2": {"w": jnp.asarray(
                    sd[f"{b}.layer.1.DenseReluDense.wo.weight"].T,
                    dtype)},
            },
        }
        if not cfg.shared_pos or i == 0:
            blk["pos_embedding"] = jnp.asarray(
                sd[f"{b}.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"], dtype)
        params["blocks"][str(i)] = blk
    return params


def convert_clip_text(sd: Dict[str, np.ndarray], cfg, dtype=jnp.float32):
    """HF CLIPTextModel layout (openai/clip-vit-large-patch14, FLUX's
    text_encoder) -> models.flux.clip_text params (stacked blocks)."""
    p = "text_model"

    def ln(key):
        return {"w": jnp.asarray(sd[f"{key}.weight"], dtype),
                "b": jnp.asarray(sd[f"{key}.bias"], dtype)}

    blocks = []
    for i in range(cfg.num_layers):
        b = f"{p}.encoder.layers.{i}"
        blocks.append({
            "ln1": ln(f"{b}.layer_norm1"),
            "ln2": ln(f"{b}.layer_norm2"),
            "attn": {
                "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{b}.self_attn.out_proj", dtype),
            },
            "mlp": {"fc0": _lin(sd, f"{b}.mlp.fc1", dtype),
                    "fc1": _lin(sd, f"{b}.mlp.fc2", dtype)},
        })
    return {
        "token_embedding": jnp.asarray(
            sd[f"{p}.embeddings.token_embedding.weight"], dtype),
        "position_embedding": jnp.asarray(
            sd[f"{p}.embeddings.position_embedding.weight"], dtype),
        "final_norm": ln(f"{p}.final_layer_norm"),
        "blocks": _stack(blocks),
    }


def load_kontext_checkpoint(flux_dir: str, dtype=jnp.bfloat16,
                            strict: bool = True):
    """Audited ingestion of the full Kontext editor directory
    (transformer + VAE + both text encoders); returns the param dicts
    the pipelines.kontext constructor consumes."""
    from ..models.flux import FluxConfig
    from ..models.bagel.autoencoder import ImageVAEConfig
    from ..pipelines.kontext import FLUX_T5_CONFIG
    from ..models.flux.clip_text import ClipTextConfig
    from .manifest import audited

    flux_cfg, vae_cfg = FluxConfig(), ImageVAEConfig()
    t5_cfg, clip_cfg = FLUX_T5_CONFIG, ClipTextConfig()
    sd = load_state_dict(
        os.path.join(flux_dir, "flux1-kontext-dev.safetensors"))
    flux_params, _ = audited(
        sd, lambda s: convert_flux_transformer(s, flux_cfg, dtype),
        strict=strict)
    del sd
    vae_params, _ = load_flux_ae_checkpoint(
        os.path.join(flux_dir, "ae.safetensors"), vae_cfg)
    t5_params, _ = audited(
        load_state_dict(os.path.join(flux_dir, "text_encoder_2")),
        lambda s: convert_t5_hf(s, t5_cfg, dtype),
        ignore=("encoder.embed_tokens.weight",), strict=strict)
    clip_params, _ = audited(
        load_state_dict(os.path.join(flux_dir, "text_encoder")),
        lambda s: convert_clip_text(s, clip_cfg, dtype),
        ignore=("text_model.embeddings.position_ids",), strict=strict)
    return (flux_params, flux_cfg, vae_params, vae_cfg, t5_params,
            t5_cfg, clip_params, clip_cfg)
