#!/usr/bin/env python
"""Generate the pinned real-scale checkpoint manifests under manifests/.

Families (VERDICT r3 #5): Wan2.2-TI2V-5B (DiT+VAE), Wan2.1-T2V-1.3B
(DiT+VAE), UMT5-XXL, BAGEL-7B-MoT (ema.safetensors surface), and
SigLIP2-so400m-patch14-384. Pure arithmetic — no weights are touched.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from univid_tpu.core.config import WAN_CONFIGS, T5Config  # noqa: E402
from univid_tpu.core import manifest as M  # noqa: E402
from univid_tpu.models.bagel.qwen2_mot import Qwen2MoTConfig  # noqa: E402
from univid_tpu.models.bagel.siglip import SiglipConfig  # noqa: E402
from univid_tpu.reflection.scorer import SiglipTextConfig  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "manifests")
    os.makedirs(out_dir, exist_ok=True)

    entries = {}
    for name in ("ti2v-5B", "t2v-1.3B"):
        spec = WAN_CONFIGS[name]
        entries[f"wan_{name}_dit"] = M.wan_dit_manifest(spec.dit)
        entries[f"wan_{name}_vae"] = M.wan_vae_manifest(spec.vae)
    entries["umt5_xxl"] = M.umt5_manifest(T5Config())

    llm = Qwen2MoTConfig()  # BAGEL-7B-MoT shape
    vit = SiglipConfig()    # BAGEL's NaViT tower (980/14)
    entries["bagel_7b_mot_ema"] = M.bagel_manifest(llm, vit)

    # SigLIP2-so400m-patch14-384 dual tower (HF checkpoint for the
    # reflexion frame scorer, eval_understanding.py:171-206)
    so400m_v = SiglipConfig(hidden_size=1152, intermediate_size=4304,
                            num_layers=27, num_heads=16, patch_size=14,
                            image_size=378)
    so400m_t = SiglipTextConfig(vocab_size=256000, hidden_size=1152,
                                intermediate_size=4304, num_layers=27,
                                num_heads=16, max_len=64, proj_dim=1152)
    entries["siglip2_so400m"] = M.siglip2_manifest(so400m_v, so400m_t)

    # SigLIP2-base-patch16-naflex — the reference's DEFAULT scorer
    # (eval_understanding.py:42): NaFlex variable-aspect dual tower
    from univid_tpu.reflection.naflex import (NaflexTextConfig,
                                              NaflexVisionConfig)
    entries["siglip2_naflex"] = M.siglip2_naflex_manifest(
        NaflexVisionConfig(), NaflexTextConfig())

    # SAM2 Hiera-L video model (animate preprocess segmentation,
    # sam_utils.py:122-155)
    from univid_tpu.models.sam2 import Sam2Config
    entries["sam2_hiera_large"] = M.sam2_manifest(Sam2Config())

    # FLUX.1-Kontext editor (animate preprocess canonical-pose editing,
    # process_pipepline.py:36-37): BFL transformer + HF text encoders
    from univid_tpu.models.flux import FluxConfig, ClipTextConfig
    from univid_tpu.pipelines.kontext import FLUX_T5_CONFIG
    entries["flux1_kontext_dev"] = M.flux_transformer_manifest(FluxConfig())
    entries["flux_t5_v1_1_xxl"] = M.t5_hf_manifest(FLUX_T5_CONFIG)
    entries["flux_clip_l_text"] = M.clip_text_manifest(ClipTextConfig())

    for name, man in entries.items():
        path = os.path.join(out_dir, f"{name}.json")
        M.save_manifest(path, man)
        import math
        n_params = sum(math.prod(s) if s else 1 for s in man.values())
        print(f"{name}: {len(man)} keys, {n_params / 1e9:.3f} B params "
              f"-> {path}")


if __name__ == "__main__":
    main()
