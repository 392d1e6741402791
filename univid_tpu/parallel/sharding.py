"""Parameter sharding rules (GSPMD replacement for torch FSDP).

The reference wraps T5 and the DiT in torch FSDP FULL_SHARD with a
per-block wrap policy (models/wan/distributed/fsdp.py:12-36). On TPU the
same memory scaling is a NamedSharding over the `fsdp` mesh axis applied to
the parameter pytree — no wrapper class, no gather/scatter code: GSPMD
inserts all-gathers at use sites and reduce-scatters in the backward.

Tensor parallelism (absent in the reference) comes free by also sharding
the head/ffn dimension over `tp`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import AXIS_FSDP, AXIS_TP


def dit_param_sharding_rules() -> List[Tuple[str, P]]:
    """(regex over 'path/to/leaf', PartitionSpec) rules for the Wan DiT.

    Conventions: linear weights are [in, out]. FSDP shards the largest
    (usually output) dim; TP shards the head-structured dim.
    """
    # block leaves are stacked with a leading [num_layers] axis (scanned)
    return [
        # attention qkv/o projections: [L, dim, dim] — tp on heads (out
        # for qkv, in for o), fsdp on the other dim
        (r"blocks/(self_attn|cross_attn)/(q|k|v)/w$",
         P(None, AXIS_FSDP, AXIS_TP)),
        (r"blocks/(self_attn|cross_attn)/(q|k|v)/b$", P(None, AXIS_TP)),
        (r"blocks/(self_attn|cross_attn)/o/w$",
         P(None, AXIS_TP, AXIS_FSDP)),
        # ffn: fc0 [L, dim, ffn] tp on ffn; fc1 [L, ffn, dim] tp on ffn
        (r"blocks/ffn/fc0/w$", P(None, AXIS_FSDP, AXIS_TP)),
        (r"blocks/ffn/fc0/b$", P(None, AXIS_TP)),
        (r"blocks/ffn/fc1/w$", P(None, AXIS_TP, AXIS_FSDP)),
        # per-block modulation [L, 6, dim] stays REPLICATED: it is tiny
        # (~1.1 MB for the 5B) and fsdp-sharding it forced an SPMD
        # "involuntary full rematerialization" reshard inside the block
        # scan every step (the r4 dryrun Shardy warning) — replicate-cost
        # is nothing, the reshard is a per-block collective
        (r"blocks/modulation$", P()),
        # embeddings / head: fsdp the big dims
        (r"patch_embed/w$", P(None, AXIS_FSDP)),
        (r"(text_embedding|time_embedding|time_projection)/fc\d+/w$",
         P(None, AXIS_FSDP)),
        (r"head/head/w$", P(AXIS_FSDP, None)),
    ]


def bagel_llm_param_sharding_rules() -> List[Tuple[str, P]]:
    """(regex, spec) rules for the Qwen2-MoT LM (models/bagel/qwen2_mot.py
    layout): 7B in bf16 (~15 GB) does not fit one v5e chip, so the big
    matrices shard over fsdp with tp on the head/ffn-structured dims.
    Covers both the base and the *_gen (MoT) expert twins and the stacked
    [num_layers] leading axis."""
    return [
        (r"layers/attn(_gen)?/(q|k|v)/w$", P(None, AXIS_FSDP, AXIS_TP)),
        (r"layers/attn(_gen)?/(q|k|v)/b$", P(None, AXIS_TP)),
        (r"layers/attn(_gen)?/o/w$", P(None, AXIS_TP, AXIS_FSDP)),
        (r"layers/mlp(_gen)?/(gate|up)/w$", P(None, AXIS_FSDP, AXIS_TP)),
        (r"layers/mlp(_gen)?/down/w$", P(None, AXIS_TP, AXIS_FSDP)),
        (r"embed_tokens$", P(AXIS_FSDP, None)),
        (r"lm_head/w$", P(None, AXIS_FSDP)),
    ]


def flux_param_sharding_rules() -> List[Tuple[str, P]]:
    """Rules for the FLUX.1-Kontext transformer (models/flux/kontext.py
    layout; 12B in bf16 ~24 GB — needs fsdp even on v5p). Double and
    single blocks are stacked with a leading [depth] axis; qkv/linear1
    outputs and mlp hidden are head/ffn-structured (tp), the model dim
    shards over fsdp."""
    return [
        (r"double_blocks/(img|txt)/(qkv|mod)/w$",
         P(None, AXIS_FSDP, AXIS_TP)),
        (r"double_blocks/(img|txt)/(qkv|mod)/b$", P(None, AXIS_TP)),
        (r"double_blocks/(img|txt)/proj/w$",
         P(None, AXIS_TP, AXIS_FSDP)),
        (r"double_blocks/(img|txt)/mlp/fc0/w$",
         P(None, AXIS_FSDP, AXIS_TP)),
        (r"double_blocks/(img|txt)/mlp/fc0/b$", P(None, AXIS_TP)),
        (r"double_blocks/(img|txt)/mlp/fc1/w$",
         P(None, AXIS_TP, AXIS_FSDP)),
        (r"single_blocks/(linear1|mod)/w$", P(None, AXIS_FSDP, AXIS_TP)),
        (r"single_blocks/(linear1|mod)/b$", P(None, AXIS_TP)),
        (r"single_blocks/linear2/w$", P(None, AXIS_TP, AXIS_FSDP)),
        (r"(img_in|txt_in)/w$", P(None, AXIS_FSDP)),
        (r"(time_in|vector_in|guidance_in)/(in|out)_layer/w$",
         P(None, AXIS_FSDP)),
        (r"final_layer/(linear|adaLN)/w$", P(AXIS_FSDP, None)),
    ]


def t5_param_sharding_rules() -> List[Tuple[str, P]]:
    """Rules for the UMT5-XXL encoder (models/wan/t5.py layout) — the
    torch reference FSDP-wraps T5 too (textimage2video.py:87-91)."""
    return [
        (r"blocks/\d+/attn/(q|k|v)/w$", P(AXIS_FSDP, AXIS_TP)),
        (r"blocks/\d+/attn/o/w$", P(AXIS_TP, AXIS_FSDP)),
        (r"blocks/\d+/ffn/(gate|fc1)/w$", P(AXIS_FSDP, AXIS_TP)),
        (r"blocks/\d+/ffn/fc2/w$", P(AXIS_TP, AXIS_FSDP)),
        (r"token_embedding$", P(AXIS_FSDP, None)),
    ]


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def apply_sharding_rules(params, mesh: Mesh,
                         rules: List[Tuple[str, P]],
                         default: Optional[P] = None):
    """Build a sharding pytree matching `params` from regex rules."""
    default = default if default is not None else P()

    def leaf_sharding(path, leaf):
        s = path_str(path)
        for pat, spec in rules:
            if re.search(pat, s):
                # drop axes that don't divide the dim evenly
                fixed = []
                for dim, ax in zip(leaf.shape, spec):
                    if ax is None:
                        fixed.append(None)
                        continue
                    size = mesh.shape[ax] if not isinstance(ax, tuple) else 1
                    fixed.append(ax if dim % size == 0 else None)
                fixed += [None] * (len(leaf.shape) - len(fixed))
                return NamedSharding(mesh, P(*fixed))
        return NamedSharding(mesh, default)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params, mesh: Mesh, rules: List[Tuple[str, P]]):
    shardings = apply_sharding_rules(params, mesh, rules)
    return jax.device_put(params, shardings), shardings
