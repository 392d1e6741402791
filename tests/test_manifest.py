"""Manifest <-> converter equivalence + strict ingestion audit.

The generators in core/manifest.py are proven equivalent to the
converters in core/checkpoint.py at tiny configs: a synthetic state
dict built FROM the manifest converts successfully with every key
consumed (RecordingDict) and yields exactly the init template's
tree/shapes. The committed real-scale manifests under manifests/ are
then pinned by regenerating and diffing them.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core import checkpoint as C
from univid_tpu.core import manifest as M
from univid_tpu.core.config import T5Config, WanDiTConfig, WanVAEConfig
from univid_tpu.models.bagel.qwen2_mot import (Qwen2MoTConfig,
                                               init_qwen2_mot)
from univid_tpu.models.wan.dit import init_wan_dit
from univid_tpu.models.wan.vae_api import init_wan_vae

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sd_from_manifest(man):
    rng = np.random.default_rng(0)
    return {k: rng.standard_normal(s).astype(np.float32) if s
            else np.float32(rng.standard_normal())
            for k, s in man.items()}


def _assert_template_match(params, template):
    got = jax.tree.map(lambda x: jnp.shape(x), params)
    want = jax.tree.map(lambda x: tuple(x.shape), template)
    assert jax.tree_util.tree_structure(got) == \
        jax.tree_util.tree_structure(want)
    for (pg, g), (pw, w) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want)):
        assert g == w, f"shape mismatch at {jax.tree_util.keystr(pg)}: " \
                       f"{g} vs {w}"


def test_wan_dit_manifest_matches_converter():
    cfg = WanDiTConfig(model_type="t2v", in_dim=8, out_dim=8, dim=64,
                       ffn_dim=128, freq_dim=32, text_dim=48,
                       num_heads=4, num_layers=3, text_len=16)
    man = M.wan_dit_manifest(cfg)
    sd = _sd_from_manifest(man)
    params, leftover = M.audited(
        sd, lambda s: C.convert_wan_dit(s, cfg, jnp.float32))
    assert leftover == []
    template = jax.eval_shape(
        lambda k: init_wan_dit(k, cfg), jax.random.PRNGKey(0))
    _assert_template_match(params, template)


def test_wan_vae_manifest_matches_converter():
    cfg = WanVAEConfig(dim=16, dec_dim=24, z_dim=8,
                       dim_mult=(1, 2, 4, 4), num_res_blocks=2,
                       temporal_downsample=(False, True, True))
    man = M.wan_vae_manifest(cfg)
    sd = _sd_from_manifest(man)
    params, leftover = M.audited(
        sd, lambda s: C.convert_wan_vae(s, cfg))
    assert leftover == []
    template = jax.eval_shape(
        lambda k: init_wan_vae(k, cfg), jax.random.PRNGKey(0))
    _assert_template_match(params, template)


def test_umt5_manifest_matches_converter():
    cfg = T5Config(vocab_size=256, dim=32, dim_attn=32, dim_ffn=64,
                   num_heads=4, num_layers=2, num_buckets=8)
    man = M.umt5_manifest(cfg)
    sd = _sd_from_manifest(man)
    params, leftover = M.audited(
        sd, lambda s: C.convert_umt5(s, cfg, jnp.float32))
    assert leftover == []
    assert params["token_embedding"].shape == (256, 32)
    assert params["blocks"]["0"]["pos_embedding"].shape == (8, 4)


def test_bagel_llm_manifest_matches_converter():
    cfg = Qwen2MoTConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=96, num_layers=2,
                         num_heads=4, num_kv_heads=2)
    man = M.bagel_llm_manifest(cfg)
    sd = _sd_from_manifest(man)
    params, leftover = M.audited(
        sd, lambda s: C.convert_bagel_llm(s, cfg, jnp.float32))
    assert leftover == []
    template = jax.eval_shape(
        lambda k: init_qwen2_mot(k, cfg), jax.random.PRNGKey(0))
    # converter also emits lm_head (separate from init's tied path)
    _assert_template_match(
        {k: v for k, v in params.items() if k in template}, template)


def test_siglip2_manifest_matches_loader(tmp_path):
    """The full dual-tower manifest round-trips through
    load_siglip2_checkpoint with every key consumed."""
    from univid_tpu.models.bagel.siglip import SiglipConfig
    from univid_tpu.reflection.scorer import SiglipTextConfig

    vcfg = SiglipConfig(hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, patch_size=14,
                        image_size=28)
    tcfg = SiglipTextConfig(vocab_size=64, hidden_size=32,
                            intermediate_size=64, num_layers=2,
                            num_heads=4, max_len=16, proj_dim=32)
    man = M.siglip2_manifest(vcfg, tcfg)
    rec = M.RecordingDict(_sd_from_manifest(man))
    C.convert_siglip(rec, vcfg, jnp.float32, prefix="vision_model")
    C.convert_siglip_map_head(rec)
    C.convert_siglip2_text(rec, tcfg, jnp.float32)
    _ = rec["logit_scale"], rec["logit_bias"]
    leftover = sorted(set(rec) - rec.consumed)
    assert leftover == [], leftover


def test_bagel_ema_manifest_covers_loader_surface():
    """bagel_manifest covers everything load_bagel_checkpoint reads:
    LLM + fusion heads + NaViT tower, no leftovers."""
    from univid_tpu.models.bagel.siglip import SiglipConfig

    llm = Qwen2MoTConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=96, num_layers=2,
                         num_heads=4, num_kv_heads=2)
    vit = SiglipConfig(hidden_size=32, intermediate_size=64,
                       num_layers=2, num_heads=4, patch_size=14,
                       image_size=28)
    man = M.bagel_manifest(llm, vit)
    # adjust the fixed-size fusion heads to the tiny llm dims
    sd = _sd_from_manifest(man)
    rec = M.RecordingDict(sd)
    C.convert_bagel_llm(rec, llm, jnp.float32)
    C._lin(rec, "time_embedder.mlp.0", jnp.float32)
    C._lin(rec, "time_embedder.mlp.2", jnp.float32)
    C._lin(rec, "vae2llm", jnp.float32)
    C._lin(rec, "llm2vae", jnp.float32)
    rec["latent_pos_embed.pos_embed"]
    C._lin(rec, "connector.fc1", jnp.float32)
    C._lin(rec, "connector.fc2", jnp.float32)
    rec["vit_pos_embed.pos_embed"]
    C.convert_siglip(rec, vit, jnp.float32,
                     prefix="vit_model.vision_model")
    leftover = sorted(set(sd) - rec.consumed)
    assert leftover == [], leftover


def test_pinned_manifests_match_generators():
    """The committed real-scale JSONs regenerate identically — any
    drift between generators and pinned files fails here."""
    from univid_tpu.core.config import WAN_CONFIGS
    from univid_tpu.models.bagel.siglip import SiglipConfig
    from univid_tpu.reflection.scorer import SiglipTextConfig

    expect = {
        "wan_ti2v-5B_dit": M.wan_dit_manifest(
            WAN_CONFIGS["ti2v-5B"].dit),
        "wan_t2v-1.3B_dit": M.wan_dit_manifest(
            WAN_CONFIGS["t2v-1.3B"].dit),
        "wan_ti2v-5B_vae": M.wan_vae_manifest(
            WAN_CONFIGS["ti2v-5B"].vae),
        "wan_t2v-1.3B_vae": M.wan_vae_manifest(
            WAN_CONFIGS["t2v-1.3B"].vae),
        "umt5_xxl": M.umt5_manifest(T5Config()),
        "bagel_7b_mot_ema": M.bagel_manifest(Qwen2MoTConfig(),
                                             SiglipConfig()),
        "siglip2_so400m": M.siglip2_manifest(
            SiglipConfig(hidden_size=1152, intermediate_size=4304,
                         num_layers=27, num_heads=16, patch_size=14,
                         image_size=378),
            SiglipTextConfig(vocab_size=256000, hidden_size=1152,
                             intermediate_size=4304, num_layers=27,
                             num_heads=16, max_len=64, proj_dim=1152)),
    }
    for name, man in expect.items():
        path = os.path.join(REPO, "manifests", f"{name}.json")
        assert os.path.exists(path), f"missing pinned manifest {name}"
        pinned = M.load_manifest(path)
        assert pinned == {k: tuple(v) for k, v in man.items()}, name


def test_audit_keys_reports_diffs():
    man = {"a.weight": (4, 2), "b.weight": (3,)}
    sd = {"a.weight": np.zeros((4, 2)), "c.weight": np.zeros((1,))}
    diff = M.audit_keys(sd, man)
    assert diff["missing"] == ["b.weight"]
    assert diff["unexpected"] == ["c.weight"]
    sd["b.weight"] = np.zeros((5,))
    diff = M.audit_keys(sd, man)
    assert diff["shape_mismatch"] == ["b.weight: (5,) vs (3,)"]
    with pytest.raises(ValueError, match="does not match"):
        M.assert_checkpoint_matches(sd, man)


def test_strict_mode_raises_on_unconsumed():
    cfg = WanDiTConfig(model_type="t2v", in_dim=8, out_dim=8, dim=64,
                       ffn_dim=128, freq_dim=32, text_dim=48,
                       num_heads=4, num_layers=2, text_len=16)
    sd = _sd_from_manifest(M.wan_dit_manifest(cfg))
    sd["mystery.extra.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        M.audited(sd, lambda s: C.convert_wan_dit(s, cfg, jnp.float32))
    # non-strict downgrades to a warning
    with pytest.warns(UserWarning, match="unconsumed"):
        _, leftover = M.audited(
            sd, lambda s: C.convert_wan_dit(s, cfg, jnp.float32),
            strict=False)
    assert leftover == ["mystery.extra.weight"]


def test_siglip2_naflex_manifest_matches_converter():
    """siglip2_naflex_manifest round-trips through
    reflection.naflex.convert_naflex_checkpoint with every key consumed
    (the reference's DEFAULT scorer checkpoint surface,
    eval_understanding.py:42)."""
    from univid_tpu.reflection.naflex import (NaflexTextConfig,
                                              NaflexVisionConfig,
                                              convert_naflex_checkpoint)

    vcfg = NaflexVisionConfig(hidden_size=32, intermediate_size=64,
                              num_layers=2, num_heads=4, patch_size=4,
                              num_patches=16, max_num_patches=16)
    tcfg = NaflexTextConfig(vocab_size=64, hidden_size=32,
                            intermediate_size=64, num_layers=2,
                            num_heads=4, max_len=8, proj_dim=32)
    man = M.siglip2_naflex_manifest(vcfg, tcfg)
    rec = M.RecordingDict(_sd_from_manifest(man))
    vision, vcfg2, text, tcfg2 = convert_naflex_checkpoint(
        rec, vision_heads=4, text_heads=4)
    _ = rec["logit_scale"], rec["logit_bias"]
    leftover = sorted(set(rec) - rec.consumed)
    assert leftover == [], leftover
    assert vcfg2.patch_size == 4 and vcfg2.num_patches == 16
    assert tcfg2.proj_dim == 32
    # converted trees match the init templates leaf-for-leaf
    from univid_tpu.reflection.naflex import (init_naflex_text,
                                              init_naflex_vision)
    import jax

    tv = init_naflex_vision(jax.random.PRNGKey(0), vcfg2)
    tt = init_naflex_text(jax.random.PRNGKey(1), tcfg2)
    assert jax.tree.map(lambda a: a.shape, vision) == \
        jax.tree.map(lambda a: a.shape, tv)
    assert jax.tree.map(lambda a: a.shape, text) == \
        jax.tree.map(lambda a: a.shape, tt)
