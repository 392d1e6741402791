"""WanAnimate family tests (tiny configs): motion encoder, face encoder
temporal alignment, the animate DiT forward (pose injection, face CFG,
img-context cross attention), the i2v mask builders and the clip-by-clip
pipeline. Reference: models/wan/animate.py:36-648,
utils/modules/animate/{model_animate,motion_encoder,face_blocks,clip}.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core.config import WanVAEConfig
from univid_tpu.core.dtypes import FP32_POLICY
from univid_tpu.models.wan.animate import (
    ClipVisionConfig,
    WanAnimateConfig,
    clip_preprocess,
    clip_visual_forward,
    face_encoder_forward,
    get_motion,
    init_clip_vision,
    init_face_encoder,
    init_motion_encoder,
    init_wan_animate,
    wan_animate_forward,
)
from univid_tpu.models.wan.vae_api import init_wan_vae
from univid_tpu.pipelines.animate import (WanAnimatePipeline, get_i2v_mask,
                                          get_valid_len, inputs_padding)

TINY_CHANNELS = ((4, 16), (8, 16), (16, 8))

TINY = WanAnimateConfig(
    patch_size=(1, 2, 2), text_len=12, in_dim=12, dim=32, ffn_dim=64,
    freq_dim=16, text_dim=24, out_dim=4, num_heads=4, num_layers=5,
    motion_encoder_dim=16, clip_tokens=5, clip_dim=16, motion_size=16,
    motion_dim=4, vae_z_dim=4, face_width=8,
    motion_channels=TINY_CHANNELS)

TINY_VAE = WanVAEConfig(
    dim=8, dec_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
    temporal_downsample=(False, True, True), spatial_patch=2)


def test_motion_encoder_shapes_and_direction():
    params = init_motion_encoder(jax.random.PRNGKey(0), size=16, dim=16,
                                 motion_dim=4,
                                 channels=dict(TINY_CHANNELS))
    img = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 3))
    out = get_motion(params, img)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()
    # Direction projects through an orthonormal basis: norms bounded by
    # the alpha norms
    from univid_tpu.models.wan.animate.motion_encoder import direction
    a = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    d = direction(params, a)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, rtol=1e-4)


def test_face_encoder_temporal_alignment():
    """clip_len pixel frames -> lat_t motion rows (two stride-2 causal
    convs), heads+1 tokens per row."""
    params = init_face_encoder(jax.random.PRNGKey(0), 16, 32, num_heads=4,
                               width=8)
    for t_pix, lat_t in [(13, 4), (77, 20), (5, 2)]:
        x = jax.random.normal(jax.random.PRNGKey(1), (2, t_pix, 16))
        out = face_encoder_forward(params, x)
        assert out.shape == (2, lat_t, 5, 32), (t_pix, out.shape)


def test_clip_visual_tokens():
    cfg = ClipVisionConfig(image_size=28, patch_size=14, dim=16,
                           num_heads=2, num_layers=3)
    params = init_clip_vision(jax.random.PRNGKey(0), cfg)
    img = clip_preprocess(jnp.zeros((40, 30, 3)), cfg)
    assert img.shape == (28, 28, 3)
    toks = clip_visual_forward(params, cfg, img)
    assert toks.shape == (5, 16)  # cls + 4 patches, 31-block mode


@pytest.fixture(scope="module")
def animate_setup():
    params = init_wan_animate(jax.random.PRNGKey(0), TINY)
    # zero-init head blocks signal; randomize like a trained checkpoint
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(99), params["head"]["head"]["w"].shape)
    return params


def _fwd(params, pose=None, face=None, clip_fea=None, t_val=500.0):
    b, f_lat, hh, ww = 1, 2, 4, 4
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (b, f_lat + 1, hh, ww, TINY.in_dim))
    t = jnp.full((b,), t_val)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, TINY.text_len, TINY.text_dim))
    if clip_fea is None:
        clip_fea = jax.random.normal(jax.random.PRNGKey(3),
                                     (b, TINY.clip_tokens, TINY.clip_dim))
    if pose is None:
        pose = jax.random.normal(jax.random.PRNGKey(4),
                                 (b, f_lat, hh, ww, TINY.vae_z_dim))
    if face is None:
        face = jax.random.normal(
            jax.random.PRNGKey(5),
            (b, 5, TINY.motion_size, TINY.motion_size, 3))
    return wan_animate_forward(params, TINY, x, t, ctx, clip_fea, pose,
                               face, policy=FP32_POLICY)


def test_animate_forward_shape_and_conditioning(animate_setup):
    params = animate_setup
    base = _fwd(params)
    assert base.shape == (1, 3, 4, 4, TINY.out_dim)
    assert np.isfinite(np.asarray(base)).all()

    # pose conditions frames 1..; the reference frame (0) stays put
    pose2 = jax.random.normal(jax.random.PRNGKey(40), (1, 2, 4, 4, 4))
    out_p = _fwd(params, pose=pose2)
    assert np.abs(np.asarray(out_p) - np.asarray(base)).max() > 1e-6

    # the face video conditions via the adapter (block 0 uses it)
    face2 = -jnp.ones((1, 5, 16, 16, 3))
    out_f = _fwd(params, face=face2)
    assert np.abs(np.asarray(out_f) - np.asarray(base)).max() > 1e-6

    # CLIP image context conditions via the img kv branch
    clip2 = jnp.zeros((1, TINY.clip_tokens, TINY.clip_dim))
    out_c = _fwd(params, clip_fea=clip2)
    assert np.abs(np.asarray(out_c) - np.asarray(base)).max() > 1e-6


def test_valid_len_and_padding():
    # 100 frames, clips of 77 with 1 overlap: 77 + 76k >= 100 -> 153
    assert get_valid_len(100, 77, 1) == 77 + 76
    assert get_valid_len(77, 77, 1) == 77
    out = inputs_padding(list(range(5)), 9)
    assert out == [0, 1, 2, 3, 4, 3, 2, 1, 0]


def test_i2v_mask_semantics():
    m = np.asarray(get_i2v_mask(3, 4, 4, mask_len=1))
    assert m.shape == (1, 3, 4, 4, 4)
    assert (m[:, 0] == 1.0).all() and (m[:, 1:] == 0.0).all()
    m0 = np.asarray(get_i2v_mask(3, 4, 4, mask_len=0))
    assert (m0 == 0.0).all()


def test_animate_pipeline_clip_loop(animate_setup):
    params = animate_setup
    vae = init_wan_vae(jax.random.PRNGKey(1), TINY_VAE)
    ccfg = ClipVisionConfig(image_size=28, patch_size=14, dim=TINY.clip_dim,
                            num_heads=2, num_layers=2)
    cparams = init_clip_vision(jax.random.PRNGKey(2), ccfg)
    pipe = WanAnimatePipeline(TINY, params, TINY_VAE, vae,
                              clip_cfg=ccfg, clip_params=cparams,
                              policy=FP32_POLICY)

    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (TINY.text_len, TINY.text_dim))
    rng = np.random.default_rng(0)
    t_real, h, w = 9, 32, 32
    cond = rng.standard_normal((t_real, h, w, 3)).astype(np.float32) * .1
    face = rng.standard_normal((t_real, 16, 16, 3)).astype(np.float32) * .1
    ref = rng.standard_normal((h, w, 3)).astype(np.float32) * 0.1

    out = pipe.generate(ctx, jnp.zeros_like(ctx), cond_video=cond,
                        face_video=face, ref_image=ref, clip_len=5,
                        refert_num=1, sampling_steps=2,
                        sample_solver="dpm++", guide_scale=1.5, seed=0)
    assert out.shape == (t_real, h, w, 3)
    assert np.isfinite(out).all()


def test_convert_wan_animate_synthetic():
    """Synthetic torch-style state dict -> params that run the forward
    (layout/naming parity with model_animate.py + submodules)."""
    from univid_tpu.core.checkpoint import convert_wan_animate

    cfg = TINY
    rng = np.random.default_rng(0)
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    sd = {}

    def lin(key, i, o, bias=True):
        sd[f"{key}.weight"] = rng.standard_normal((o, i)).astype(
            np.float32) * 0.05
        if bias:
            sd[f"{key}.bias"] = np.zeros(o, np.float32)

    sd["patch_embedding.weight"] = rng.standard_normal(
        (d, cfg.in_dim, pt, ph, pw)).astype(np.float32) * 0.05
    sd["patch_embedding.bias"] = np.zeros(d, np.float32)
    sd["pose_patch_embedding.weight"] = rng.standard_normal(
        (d, cfg.vae_z_dim, pt, ph, pw)).astype(np.float32) * 0.05
    sd["pose_patch_embedding.bias"] = np.zeros(d, np.float32)
    lin("text_embedding.0", cfg.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", cfg.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, d * 6)
    lin("head.head", d, pt * ph * pw * cfg.out_dim)
    sd["head.modulation"] = rng.standard_normal((1, 2, d)).astype(
        np.float32) * 0.05
    cd = cfg.clip_dim
    sd["img_emb.proj.0.weight"] = np.ones(cd, np.float32)
    sd["img_emb.proj.0.bias"] = np.zeros(cd, np.float32)
    lin("img_emb.proj.1", cd, cd)
    lin("img_emb.proj.3", cd, d)
    sd["img_emb.proj.4.weight"] = np.ones(d, np.float32)
    sd["img_emb.proj.4.bias"] = np.zeros(d, np.float32)

    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        for mod, img in (("self_attn", False), ("cross_attn", True)):
            for k in "qkvo":
                lin(f"{b}.{mod}.{k}", d, d)
            sd[f"{b}.{mod}.norm_q.weight"] = np.ones(d, np.float32)
            sd[f"{b}.{mod}.norm_k.weight"] = np.ones(d, np.float32)
            if img:
                lin(f"{b}.{mod}.k_img", d, d)
                lin(f"{b}.{mod}.v_img", d, d)
                sd[f"{b}.{mod}.norm_k_img.weight"] = np.ones(
                    d, np.float32)
        lin(f"{b}.ffn.0", d, cfg.ffn_dim)
        lin(f"{b}.ffn.2", cfg.ffn_dim, d)
        sd[f"{b}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"{b}.norm3.bias"] = np.zeros(d, np.float32)
        sd[f"{b}.modulation"] = rng.standard_normal((1, 6, d)).astype(
            np.float32) * 0.05

    # motion encoder (size 16 -> first + 2 res blocks + final 4x4)
    ch = dict(TINY_CHANNELS)
    me = "motion_encoder.enc.net_app.convs"
    sd[f"{me}.0.0.weight"] = rng.standard_normal(
        (ch[16], 3, 1, 1)).astype(np.float32)
    sd[f"{me}.0.1.bias"] = np.zeros(ch[16], np.float32)
    cin = ch[16]
    for i, size in zip((1, 2), (8, 4)):
        cout = ch[size]
        sd[f"{me}.{i}.conv1.0.weight"] = rng.standard_normal(
            (cin, cin, 3, 3)).astype(np.float32)
        sd[f"{me}.{i}.conv1.1.bias"] = np.zeros(cin, np.float32)
        sd[f"{me}.{i}.conv2.1.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32)
        sd[f"{me}.{i}.conv2.2.bias"] = np.zeros(cout, np.float32)
        sd[f"{me}.{i}.skip.1.weight"] = rng.standard_normal(
            (cout, cin, 1, 1)).astype(np.float32)
        cin = cout
    sd[f"{me}.3.weight"] = rng.standard_normal(
        (cfg.motion_encoder_dim, cin, 4, 4)).astype(np.float32)
    for i in range(4):
        lin(f"motion_encoder.enc.fc.{i}", cfg.motion_encoder_dim,
            cfg.motion_encoder_dim)
    lin("motion_encoder.enc.fc.4", cfg.motion_encoder_dim,
        cfg.motion_dim)
    sd["motion_encoder.dec.direction.weight"] = rng.standard_normal(
        (cfg.motion_encoder_dim, cfg.motion_dim)).astype(np.float32)

    # face encoder + adapter
    w = cfg.face_width
    sd["face_encoder.conv1_local.conv.weight"] = rng.standard_normal(
        (w * 4, cfg.motion_encoder_dim, 3)).astype(np.float32) * 0.05
    sd["face_encoder.conv1_local.conv.bias"] = np.zeros(w * 4, np.float32)
    for name in ("conv2", "conv3"):
        sd[f"face_encoder.{name}.conv.weight"] = rng.standard_normal(
            (w, w, 3)).astype(np.float32) * 0.05
        sd[f"face_encoder.{name}.conv.bias"] = np.zeros(w, np.float32)
    lin("face_encoder.out_proj", w, d)
    sd["face_encoder.padding_tokens"] = np.zeros((1, 1, 1, d), np.float32)
    for j in range(cfg.adapter_layers):
        b = f"face_adapter.fuser_blocks.{j}"
        lin(f"{b}.linear1_kv", d, d * 2)
        lin(f"{b}.linear1_q", d, d)
        lin(f"{b}.linear2", d, d)
        hd = d // cfg.num_heads
        sd[f"{b}.q_norm.weight"] = np.ones(hd, np.float32)
        sd[f"{b}.k_norm.weight"] = np.ones(hd, np.float32)

    params = convert_wan_animate(sd, cfg, dtype=jnp.float32)
    out = _fwd(params)
    assert out.shape == (1, 3, 4, 4, cfg.out_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_convert_clip_vit_roundtrip():
    """convert_clip_vit (reference clip.py VisionTransformer naming,
    'visual.' prefix) reproduces an init_clip_vision tree exactly."""
    from univid_tpu.core.checkpoint import convert_clip_vit

    ccfg = ClipVisionConfig(image_size=28, patch_size=14, dim=16,
                            num_heads=2, num_layers=2)
    ref_params = init_clip_vision(jax.random.PRNGKey(5), ccfg)
    p = ccfg.patch_size
    d = ccfg.dim

    sd = {}
    w = np.asarray(ref_params["patch_embed"]["w"])  # [p*p*3, d]
    sd["visual.patch_embedding.weight"] = \
        w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
    sd["visual.cls_embedding"] = \
        np.asarray(ref_params["cls"]).reshape(1, 1, d)
    sd["visual.pos_embedding"] = \
        np.asarray(ref_params["pos_embed"])[None]
    sd["visual.pre_norm.weight"] = np.asarray(
        ref_params["pre_norm"]["w"])
    sd["visual.pre_norm.bias"] = np.asarray(ref_params["pre_norm"]["b"])
    for i in range(ccfg.num_layers):
        lyr = jax.tree_util.tree_map(lambda a: np.asarray(a[i]),
                                     ref_params["layers"])
        pre = f"visual.transformer.{i}"
        sd[f"{pre}.norm1.weight"] = lyr["ln1"]["w"]
        sd[f"{pre}.norm1.bias"] = lyr["ln1"]["b"]
        sd[f"{pre}.norm2.weight"] = lyr["ln2"]["w"]
        sd[f"{pre}.norm2.bias"] = lyr["ln2"]["b"]
        sd[f"{pre}.attn.to_qkv.weight"] = np.concatenate(
            [lyr["attn"][k]["w"].T for k in "qkv"], axis=0)
        sd[f"{pre}.attn.to_qkv.bias"] = np.concatenate(
            [lyr["attn"][k].get(
                "b", np.zeros(d, np.float32)) for k in "qkv"], axis=0)
        sd[f"{pre}.attn.proj.weight"] = lyr["attn"]["o"]["w"].T
        sd[f"{pre}.attn.proj.bias"] = lyr["attn"]["o"].get(
            "b", np.zeros(d, np.float32))
        sd[f"{pre}.mlp.0.weight"] = lyr["mlp"]["fc0"]["w"].T
        sd[f"{pre}.mlp.0.bias"] = lyr["mlp"]["fc0"].get(
            "b", np.zeros(lyr["mlp"]["fc0"]["w"].shape[1], np.float32))
        sd[f"{pre}.mlp.2.weight"] = lyr["mlp"]["fc1"]["w"].T
        sd[f"{pre}.mlp.2.bias"] = lyr["mlp"]["fc1"].get(
            "b", np.zeros(d, np.float32))

    got = convert_clip_vit(sd, ccfg, dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(6), (28, 28, 3))
    out_ref = clip_visual_forward(ref_params, ccfg, img)
    out_got = clip_visual_forward(got, ccfg, img)
    np.testing.assert_allclose(np.asarray(out_got),
                               np.asarray(out_ref), rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# XLM-Roberta CLIP text tower (clip.py:303-325 + xlm_roberta.py) —
# checkpoint-complete CLIP parity; unused by any inference pipeline
# (PARITY rescope row now closed)
# ---------------------------------------------------------------------------


def test_clip_text_matches_reference_xlm_roberta():
    import importlib.machinery
    import importlib.util
    import os

    ref_path = ("/root/reference/models/wan/utils/modules/animate/"
                "xlm_roberta.py")
    if not os.path.exists(ref_path):
        import pytest
        pytest.skip("reference tree not mounted")
    import torch

    loader = importlib.machinery.SourceFileLoader("ref_xlmr", ref_path)
    spec = importlib.util.spec_from_loader("ref_xlmr", loader)
    ref_xlmr = importlib.util.module_from_spec(spec)
    loader.exec_module(ref_xlmr)

    from univid_tpu.models.wan.animate.clip_text import (
        ClipTextXlmRobertaConfig, clip_text_forward,
        convert_clip_text_xlm_roberta, init_clip_text)

    cfg = ClipTextXlmRobertaConfig(vocab_size=64, max_seq_len=16,
                                   pad_id=1, dim=32, num_heads=4,
                                   num_layers=2, out_dim=24)

    class RefWithHead(ref_xlmr.XLMRoberta):
        """The 8-line XLMRobertaWithHead wrapper (clip.py:303-325):
        masked mean pool + bias-free GELU head."""

        def __init__(self, out_dim, **kw):
            super().__init__(**kw)
            mid = (self.dim + out_dim) // 2
            self.head = torch.nn.Sequential(
                torch.nn.Linear(self.dim, mid, bias=False),
                torch.nn.GELU(),
                torch.nn.Linear(mid, out_dim, bias=False))

        def forward(self, ids):
            x = super().forward(ids)
            mask = ids.ne(self.pad_id).unsqueeze(-1).to(x)
            x = (x * mask).sum(dim=1) / mask.sum(dim=1)
            return self.head(x)

    torch.manual_seed(0)
    ref = RefWithHead(out_dim=cfg.out_dim, vocab_size=cfg.vocab_size,
                      max_seq_len=cfg.max_seq_len, type_size=1,
                      pad_id=cfg.pad_id, dim=cfg.dim,
                      num_heads=cfg.num_heads, num_layers=cfg.num_layers,
                      post_norm=True, dropout=0.0).eval()
    # the reference prefixes the tower under `textual.` inside CLIPModel
    sd = {"textual." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    params = convert_clip_text_xlm_roberta(sd, cfg)
    # converted tree matches the init template leaf-for-leaf
    tmpl = init_clip_text(jax.random.PRNGKey(0), cfg)
    assert jax.tree.map(lambda a: a.shape, params) == \
        jax.tree.map(lambda a: a.shape, tmpl)

    ids = np.array([[5, 9, 17, 3, 2, 1, 1, 1],
                    [7, 30, 2, 1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).numpy()
    got = np.asarray(clip_text_forward(params, cfg,
                                       jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_animate_bounded_softmax_policy_parity(animate_setup):
    """bounded_softmax policy wiring on the animate model: the bound
    scalars (qk-norm gain products, self + text-kv + img-kv cross) are
    computed and passed without changing outputs (exact math; the XLA
    fallback used on CPU ignores the bound, and the Pallas kernel's
    bounded path is parity-pinned in test_attention.py)."""
    import dataclasses

    base = _fwd(animate_setup)
    pol = dataclasses.replace(FP32_POLICY, bounded_softmax=True)
    b, f_lat, hh, ww = 1, 2, 4, 4
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (b, f_lat + 1, hh, ww, TINY.in_dim))
    t = jnp.full((b,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, TINY.text_len, TINY.text_dim))
    clip_fea = jax.random.normal(jax.random.PRNGKey(3),
                                 (b, TINY.clip_tokens, TINY.clip_dim))
    pose = jax.random.normal(jax.random.PRNGKey(4),
                             (b, f_lat, hh, ww, TINY.vae_z_dim))
    face = jax.random.normal(
        jax.random.PRNGKey(5),
        (b, 5, TINY.motion_size, TINY.motion_size, 3))
    bd = wan_animate_forward(animate_setup, TINY, x, t, ctx, clip_fea,
                             pose, face, policy=pol)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(base),
                               rtol=1e-6, atol=1e-6)
