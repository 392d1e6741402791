"""LoRA for the Wan DiT — factored param pytree, no PEFT.

Behavioral parity with reference LoRAManager (model_pipeline.py:325-835):
the six target-module strategies (:463-566) are reproduced over the same
flat module-name ordering (blocks ascending, q/k/v/o per attention), then
re-expressed for the stacked-layers layout as per-site [num_layers] masks.

Notes on faithful quirks:
  * the reference's FFN "low priority" scan matches names
    'ffn.linear1/2' which never exist in WanModel (ffn is Sequential ->
    'ffn.0'/'ffn.2'), so FFN targets are always empty — reproduced here.
  * >50 targets clamp to the first 50 of high+medium+low (:545-547).

TPU design: LoRA A/B live as stacked [num_layers, in, r]/[num_layers, r,
out] leaves with a [num_layers] selection mask folded into the scale;
`merge_lora` adds scale * A@B onto the base weights (one einsum per
site). Training differentiates through the merge with the base frozen
(jax.lax.stop_gradient), so optimizer state exists only for LoRA leaves.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import WanDiTConfig

ATTN_SITES = ["q", "k", "v", "o"]


@dataclass(frozen=True)
class LoRAConfig:
    rank: int = 16
    alpha: float = 32.0
    target_strategy: str = "wan_cross_attention"
    dropout: float = 0.0

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


# ---------------------------------------------------------------------------
# target selection (model_pipeline.py:463-566 semantics)
# ---------------------------------------------------------------------------


def select_targets(cfg: WanDiTConfig, strategy: str
                   ) -> List[Tuple[str, int]]:
    """-> list of ("cross_attn/q", layer) pairs."""
    n = cfg.num_layers
    high = [("cross_attn/" + s, i) for i in range(n) for s in ATTN_SITES]
    medium = [("self_attn/" + s, i) for i in range(n) for s in ATTN_SITES]
    low: List[Tuple[str, int]] = []  # faithful: never populated (see doc)

    if strategy == "wan_cross_attention":
        out = list(high)
        step = max(1, len(medium) // 4)
        out += medium[::step]
    elif strategy == "smart_wan_dit":
        out = list(high)
        out += [m for i, m in enumerate(medium) if i % 2 == 0]
        out += [m for i, m in enumerate(low) if i % 4 == 0][
            : max(4, len(high) // 2)]
    elif strategy == "cross_attention_only":
        out = list(high)
    elif strategy == "attention_only":
        blocks = [b for b in range(8, 21) if b < n]
        out = [("cross_attn/" + s, b) for b in blocks for s in ATTN_SITES]
    elif strategy == "minimal_cross_attention":
        blocks = [b for b in (10, 12, 14, 16, 18) if b < n]
        out = [("cross_attn/" + s, b) for b in blocks for s in ATTN_SITES]
    elif strategy == "attention_focused":
        out = list(high) + list(medium)
    else:
        out = list(high)
        out += [m for i, m in enumerate(medium) if i % 2 == 0]

    if len(out) > 50:
        out = (high + medium + low)[:50]
    return out


def site_masks(cfg: WanDiTConfig, strategy: str) -> Dict[str, np.ndarray]:
    """site -> [num_layers] float mask."""
    masks: Dict[str, np.ndarray] = {}
    for site, layer in select_targets(cfg, strategy):
        masks.setdefault(site, np.zeros(cfg.num_layers, np.float32))
        masks[site][layer] = 1.0
    return masks


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def init_lora(key, cfg: WanDiTConfig, lora_cfg: LoRAConfig,
              param_dtype=jnp.float32):
    """{'sites': {site: {'a': [L, in, r], 'b': [L, r, out],
    'mask': [L]}}}; A gaussian / B zeros (standard LoRA init)."""
    masks = site_masks(cfg, lora_cfg.target_strategy)
    d = cfg.dim
    r = lora_cfg.rank
    sites = {}
    keys = jax.random.split(key, len(masks))
    for k, (site, mask) in zip(keys, sorted(masks.items())):
        sites[site] = {
            "a": jax.random.normal(k, (cfg.num_layers, d, r),
                                   param_dtype) / np.sqrt(d),
            "b": jnp.zeros((cfg.num_layers, r, d), param_dtype),
            "mask": jnp.asarray(mask),
        }
    return {"sites": sites, "rank": r, "alpha": lora_cfg.alpha}


def trainable_sites(lora) -> Dict[str, dict]:
    """The differentiable subset of a LoRA pytree: {site: {'a', 'b'}}.
    (rank/alpha/masks are hyperparameters, not trainables — keeping them
    out lets jax.grad/optax run over this tree directly.)"""
    return {site: {"a": p["a"], "b": p["b"]}
            for site, p in lora["sites"].items()}


def with_sites(lora, sites: Dict[str, dict]):
    """Rebuild a full LoRA pytree with updated a/b leaves."""
    merged = {site: dict(p, **sites[site])
              for site, p in lora["sites"].items()}
    return dict(lora, sites=merged)


def merge_lora(params, lora, *, freeze_base: bool = False,
               sites: Optional[Dict[str, dict]] = None):
    """Base DiT params + LoRA deltas -> merged params (same pytree).

    freeze_base stops gradients into the base weights so jax.grad wrt the
    lora (or `sites`) pytree is exact LoRA training. Pass `sites` to
    substitute externally-trained a/b leaves (see trainable_sites).
    """
    scale = lora["alpha"] / lora["rank"]
    merged_blocks = dict(params["blocks"])
    base = params["blocks"]
    for site, p in lora["sites"].items():
        mod, proj = site.split("/")
        a = sites[site]["a"] if sites is not None else p["a"]
        bb = sites[site]["b"] if sites is not None else p["b"]
        w = base[mod][proj]["w"]
        if freeze_base:
            w = jax.lax.stop_gradient(w)
        delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                           bb.astype(jnp.float32))
        delta = delta * (scale * jax.lax.stop_gradient(p["mask"])
                         )[:, None, None]
        new_mod = dict(merged_blocks[mod])
        new_proj = dict(new_mod[proj])
        new_proj["w"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
        new_mod[proj] = new_proj
        merged_blocks[mod] = new_mod
    out = dict(params)
    if freeze_base:
        out = jax.tree_util.tree_map(
            lambda x: jax.lax.stop_gradient(x)
            if isinstance(x, jnp.ndarray) else x, out)
    out["blocks"] = merged_blocks
    return out


# ---------------------------------------------------------------------------
# save / load (model_pipeline.py:601-720 surface)
# ---------------------------------------------------------------------------


def save_lora(path: str, lora, lora_cfg: LoRAConfig,
              metadata: Optional[dict] = None):
    os.makedirs(path, exist_ok=True)
    flat = {}
    for site, p in lora["sites"].items():
        key = site.replace("/", ".")
        flat[f"{key}.a"] = np.asarray(p["a"])
        flat[f"{key}.b"] = np.asarray(p["b"])
        flat[f"{key}.mask"] = np.asarray(p["mask"])
    np.savez(os.path.join(path, "lora_weights.npz"), **flat)
    with open(os.path.join(path, "lora_config.json"), "w") as f:
        json.dump({"rank": lora_cfg.rank, "alpha": lora_cfg.alpha,
                   "target_strategy": lora_cfg.target_strategy}, f,
                  indent=2)
    if metadata:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)


def load_lora(path: str):
    with open(os.path.join(path, "lora_config.json")) as f:
        cfg = json.load(f)
    data = np.load(os.path.join(path, "lora_weights.npz"))
    sites: Dict[str, dict] = {}
    for key in data.files:
        name, leaf = key.rsplit(".", 1)
        site = name.replace(".", "/")
        sites.setdefault(site, {})[leaf] = jnp.asarray(data[key])
    return ({"sites": sites, "rank": cfg["rank"], "alpha": cfg["alpha"]},
            LoRAConfig(rank=cfg["rank"], alpha=cfg["alpha"],
                       target_strategy=cfg["target_strategy"]))
