"""SigLIP2 frame scorer — the ICI-parallel replacement for the reference's
torchrun DDP clip ranker.

Behavioral parity with reference Siglip2Scorer
(eval_understanding.py:171-206: HF AutoModel text/image towers, normalized
embeddings, top-k by cosine) and ddp_select_topk_frames (:209-222, a
subprocess torchrun ranker). TPU redesign (BASELINE.json north star): one
dual-tower model, frames batched and sharded over the `dp` mesh axis with
a single jitted call — collectives ride ICI, no subprocesses.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import nn
from ..models.bagel.bagel import flattened_position_ids
from ..models.bagel.siglip import (
    SiglipConfig,
    image_to_patches,
    init_siglip,
    siglip_forward,
)


@dataclass(frozen=True)
class SiglipTextConfig:
    vocab_size: int = 32000
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 64
    proj_dim: int = 1024
    # "mean": mean-pool + proj (random-init mode); "hf_last": HF SigLIP
    # semantics — last (padded) token + head linear
    # (modeling_siglip SiglipTextTransformer.forward)
    pooling: str = "mean"


def init_siglip_text(key, cfg: SiglipTextConfig, param_dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + cfg.num_layers))
    d = cfg.hidden_size

    params = {
        "token_embed": nn.normal_init(next(keys), (cfg.vocab_size, d), 0.02,
                                      param_dtype),
        "pos_embed": nn.normal_init(next(keys), (cfg.max_len, d), 0.02,
                                    param_dtype),
        "final_ln": {"w": jnp.ones((d,), param_dtype),
                     "b": jnp.zeros((d,), param_dtype)},
        "proj": nn.linear_init(next(keys), d, cfg.proj_dim, bias=False,
                               init="normal", dtype=param_dtype),
    }

    def init_layer(k):
        ks = iter(jax.random.split(k, 6))
        return {
            "ln1": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
            "attn": {n: nn.linear_init(next(ks), d, d, init="normal",
                                       dtype=param_dtype)
                     for n in ("q", "k", "v", "o")},
            "ln2": {"w": jnp.ones((d,), param_dtype),
                    "b": jnp.zeros((d,), param_dtype)},
            "mlp": nn.mlp_init(next(ks), (d, cfg.intermediate_size, d),
                               init="normal", dtype=param_dtype),
        }

    params["layers"] = jax.vmap(init_layer)(
        jax.random.split(next(keys), cfg.num_layers))
    return params


def siglip_text_forward(params, cfg: SiglipTextConfig, ids: jnp.ndarray,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """ids [B, L] -> projected, L2-normalized text embedding [B, proj]."""
    from ..kernels.attention import attention

    b, l = ids.shape
    nh = cfg.num_heads
    hd = cfg.hidden_size // nh
    x = (params["token_embed"][ids]
         + params["pos_embed"][None, :l]).astype(compute_dtype)

    def layer_fn(h, layer):
        y = nn.layer_norm(h, weight=layer["ln1"]["w"].astype(h.dtype),
                          bias=layer["ln1"]["b"].astype(h.dtype))
        a = layer["attn"]
        q = nn.linear(a["q"], y, compute_dtype=compute_dtype)
        k = nn.linear(a["k"], y, compute_dtype=compute_dtype)
        v = nn.linear(a["v"], y, compute_dtype=compute_dtype)
        o = attention(q.reshape(b, l, nh, hd), k.reshape(b, l, nh, hd),
                      v.reshape(b, l, nh, hd))
        h = h + nn.linear(a["o"], o.reshape(b, l, -1),
                          compute_dtype=compute_dtype)
        y = nn.layer_norm(h, weight=layer["ln2"]["w"].astype(h.dtype),
                          bias=layer["ln2"]["b"].astype(h.dtype))
        y = nn.linear(layer["mlp"]["fc0"], y, compute_dtype=compute_dtype)
        y = nn.gelu_tanh(y)
        y = nn.linear(layer["mlp"]["fc1"], y, compute_dtype=compute_dtype)
        return h + y

    x, _ = jax.lax.scan(lambda h, lyr: (layer_fn(h, lyr), None), x,
                        params["layers"])
    x = nn.layer_norm(x, weight=params["final_ln"]["w"].astype(x.dtype),
                      bias=params["final_ln"]["b"].astype(x.dtype))
    if cfg.pooling == "hf_last":
        pooled = x[:, -1]  # last padded token (modeling_siglip semantics)
    else:
        pooled = x.mean(axis=1)
    t = nn.linear(params["proj"], pooled,
                  compute_dtype=compute_dtype).astype(jnp.float32)
    return t / jnp.linalg.norm(t, axis=-1, keepdims=True)


def map_head_forward(params, feats: jnp.ndarray, num_heads: int,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """HF SiglipMultiheadAttentionPoolingHead: learned probe cross-attends
    the patch features, layernorm + MLP residual, take the probe slot.
    feats [N, d] (one image) -> pooled [d]."""
    d = feats.shape[-1]
    hd = d // num_heads
    f = feats.astype(compute_dtype)[None]                    # [1, N, d]
    probe = params["probe"].astype(compute_dtype).reshape(1, 1, d)

    q = nn.linear(params["q"], probe, compute_dtype=compute_dtype)
    k = nn.linear(params["k"], f, compute_dtype=compute_dtype)
    v = nn.linear(params["v"], f, compute_dtype=compute_dtype)
    n = feats.shape[0]
    q = q.reshape(1, 1, num_heads, hd)
    k = k.reshape(1, n, num_heads, hd)
    v = v.reshape(1, n, num_heads, hd)
    from ..kernels.attention import attention
    o = attention(q, k, v).reshape(1, 1, d)
    h = nn.linear(params["o"], o, compute_dtype=compute_dtype)

    y = nn.layer_norm(h, weight=params["ln"]["w"].astype(compute_dtype),
                      bias=params["ln"]["b"].astype(compute_dtype))
    y = nn.linear(params["mlp"]["fc0"], y, compute_dtype=compute_dtype)
    y = nn.gelu_tanh(y)
    y = nn.linear(params["mlp"]["fc1"], y, compute_dtype=compute_dtype)
    return (h + y)[0, 0]


class Siglip2Scorer:
    """Dual-tower frame scorer with sharded batch image embedding."""

    def __init__(self, vision_params=None, vision_cfg: Optional[SiglipConfig]
                 = None, text_params=None,
                 text_cfg: Optional[SiglipTextConfig] = None,
                 tokenizer=None, image_size: int = 224, mesh=None,
                 seed: int = 0, map_head=None, compute_dtype=None):
        # bf16 matmuls on TPU (MXU native; the fp32 path runs at ~1/4
        # peak and made ranking the reflexion bottleneck — SURVEY §3.3);
        # fp32 on CPU where bf16 is emulated and the oracle-parity tests
        # run. Embeddings are L2-normalized in fp32 either way.
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 \
                if jax.default_backend() == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype
        self.vision_cfg = vision_cfg or SiglipConfig(
            hidden_size=768, intermediate_size=3072, num_layers=12,
            num_heads=12, patch_size=16, image_size=image_size)
        self.text_cfg = text_cfg or SiglipTextConfig()
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        self.vision_params = vision_params if vision_params is not None \
            else init_siglip(k1, self.vision_cfg)
        # pretrained path: MAP attention-pool head, no extra projection
        # (HF get_image_features); random-init path: mean-pool + learned
        # projection into the text proj space
        self.map_head = map_head
        self.img_proj = None if map_head is not None else nn.linear_init(
            k3, self.vision_cfg.hidden_size, self.text_cfg.proj_dim,
            bias=False, init="normal")
        self.text_params = text_params if text_params is not None \
            else init_siglip_text(k2, self.text_cfg)
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.mesh = mesh
        self._emb_imgs_jit = None
        self._emb_text_jit = None

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, tokenizer=None, mesh=None,
                        dtype=jnp.float32) -> "Siglip2Scorer":
        """Pretrained HF SigLIP/SigLIP2 dual tower (the reference loads
        AutoModel, eval_understanding.py:171-206)."""
        from ..core.checkpoint import load_siglip2_checkpoint
        parts = load_siglip2_checkpoint(path, dtype=dtype)
        if tokenizer is None:
            from ..utils.tokenizers import load_tokenizer
            tokenizer = load_tokenizer(path,
                                       seq_len=parts["text_cfg"].max_len)
        return cls(vision_params=parts["vision"],
                   vision_cfg=parts["vision_cfg"],
                   text_params=parts["text"], text_cfg=parts["text_cfg"],
                   tokenizer=tokenizer, map_head=parts["map_head"],
                   image_size=parts["vision_cfg"].image_size, mesh=mesh)

    # ------------------------------------------------------------------
    def _encode_image_batch(self, vision_params, img_proj, images):
        """images [B, S, S, 3] (uint8 or float) -> normalized [B, proj].

        uint8 input is normalized to [-1, 1] ON DEVICE: frames cross
        host->device as u8 (4x less transfer than f32 — PCIe/DMA on a
        real host, the network relay on the dev tunnel)."""
        if jnp.issubdtype(images.dtype, jnp.integer):
            images = images.astype(jnp.float32) / 127.5 - 1.0
        cfg = self.vision_cfg
        side = self.image_size // cfg.patch_size
        pos = jnp.asarray(flattened_position_ids(
            side, side, cfg.num_patches_per_side))

        def one(img):
            patches = image_to_patches(img, cfg.patch_size)
            feats = siglip_forward(vision_params, cfg, patches, pos,
                                   compute_dtype=self.compute_dtype)
            if self.map_head is not None:
                return map_head_forward(self.map_head, feats,
                                        cfg.num_heads,
                                        compute_dtype=self.compute_dtype)
            return feats.mean(axis=0)

        pooled = jax.vmap(one)(images)
        if img_proj is not None:
            pooled = nn.linear(img_proj, pooled,
                               compute_dtype=self.compute_dtype)
        pooled = pooled.astype(jnp.float32)
        return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)

    def emb_imgs(self, frames: List[np.ndarray], bs: int = 64
                 ) -> np.ndarray:
        """frames: list of [H, W, 3] uint8/float arrays; resized to the
        square scorer input; batch is sharded over `dp` when a mesh is
        set."""
        if not frames:
            return np.zeros((0, self.text_cfg.proj_dim), np.float32)
        imgs = np.stack([self._prep(f) for f in frames])
        if self._emb_imgs_jit is None:
            fn = lambda vp, pp, x: self._encode_image_batch(vp, pp, x)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                fn = jax.jit(fn, in_shardings=(
                    None, None, NamedSharding(self.mesh, P("dp"))))
            else:
                fn = jax.jit(fn)
            self._emb_imgs_jit = fn
        outs = []
        n_dev = (self.mesh.shape["dp"] if self.mesh is not None else 1)
        for i in range(0, len(imgs), bs):
            batch = imgs[i:i + bs]
            pad = (-len(batch)) % max(n_dev, 1)
            if pad:
                batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)])
            v = self._emb_imgs_jit(self.vision_params, self.img_proj,
                                   jnp.asarray(batch))
            outs.append(np.asarray(v)[: len(imgs[i:i + bs])])
        return np.concatenate(outs, axis=0)

    def _prep(self, frame: np.ndarray) -> np.ndarray:
        """HF SiglipImageProcessor-faithful host preprocessing: PIL
        BICUBIC square-stretch to [S, S, 3] in uint8 (the reference
        ranks frames through AutoProcessor, eval_understanding.py:
        171-206, whose fixed-size pipeline is resize(BICUBIC) ->
        rescale 1/255 -> normalize(0.5, 0.5)). uint8 stays uint8 — it
        crosses host->device 4x cheaper and the rescale+normalize pair
        is exactly the (x/127.5 - 1) applied on device by
        _encode_image_batch; float input is already model-space and is
        nearest-resized (PIL float paths differ per mode)."""
        f = np.asarray(frame)
        h, w = f.shape[:2]
        s = self.image_size
        if (h, w) == (s, s):
            return f
        if f.dtype == np.uint8 and f.ndim == 3 and f.shape[2] == 3:
            from PIL import Image
            return np.asarray(Image.fromarray(f).resize(
                (s, s), Image.BICUBIC))
        yi = (np.arange(s) * h // s).clip(0, h - 1)
        xi = (np.arange(s) * w // s).clip(0, w - 1)
        return f[yi][:, xi]

    def emb_text(self, q: str) -> np.ndarray:
        assert self.tokenizer is not None, "scorer needs a tokenizer"
        ids = self.tokenizer.encode(q)[: self.text_cfg.max_len]
        ids = ids + [0] * (self.text_cfg.max_len - len(ids))
        ids = jnp.asarray([ids], jnp.int32) % self.text_cfg.vocab_size
        if self._emb_text_jit is None:
            # MUST be jitted: eager op-by-op dispatch of the 27-layer
            # tower measured 11.7 s/query on the v5e vs 0.1 ms jitted —
            # this was the reflexion ranking bottleneck
            import functools
            self._emb_text_jit = jax.jit(functools.partial(
                siglip_text_forward, cfg=self.text_cfg,
                compute_dtype=self.compute_dtype))
        t = self._emb_text_jit(self.text_params, ids=ids)
        return np.asarray(t, np.float32)

    def rank_frames(self, frames: List[np.ndarray], query: str, topk: int,
                    bs: int = 64, v_emb: Optional[np.ndarray] = None
                    ) -> Tuple[List[int], List[float]]:
        """Rank frames against a text query. `v_emb` lets callers reuse
        precomputed image embeddings: the reflexion loop re-ranks the
        SAME frame pool with a refined query each round (reference
        recomputes the image tower per round, eval_understanding.py:
        198-206) — caching them makes later rounds text-tower-only."""
        if len(frames) == 0 and (v_emb is None or len(v_emb) == 0):
            return [], []
        t = self.emb_text(query)          # [1, P]
        v = v_emb if v_emb is not None \
            else self.emb_imgs(frames, bs=bs)  # [N, P]
        sims = (v @ t.T).squeeze(-1)
        k = min(topk, sims.shape[0])
        idx = np.argsort(-sims)[:k]
        return idx.tolist(), [float(sims[i]) for i in idx]
