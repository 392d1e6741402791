"""BAGEL packed training tests.

(a) the packed int32 mask codes reproduce the reference
    create_sparse_mask predicate (data/data_utils.py:13-41) on a mixed
    causal/full/noise pack;
(b) bagel_packed_forward on a packed batch of mixed text+vit+vae samples
    matches running each sample alone (the per-sample-loop oracle,
    VERDICT item 9 done-condition);
(c) the PackedDataset packer produces well-formed batches with correct
    budgets, specials, rope positions, and loss bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_bagel import TINY, TINY_LLM
from univid_tpu.kernels.attention import (_packed_mask_allowed,
                                          pack_mask_codes)
from univid_tpu.models.bagel.bagel import init_bagel
from univid_tpu.models.bagel.packed import (bagel_packed_forward,
                                            build_mask_ids)
from univid_tpu.models.bagel.siglip import SiglipConfig, init_siglip
from univid_tpu.data.packed_dataset import (PackedDataConfig, PackedDataset,
                                            len2weight)


def _reference_mask(sample_lens, split_lens, attn_modes):
    """Literal numpy transcription of create_sparse_mask."""
    fn, nz = [], []
    for i, (l, mode) in enumerate(zip(split_lens, attn_modes)):
        fn.extend([i if mode in ("full", "noise") else -1] * l)
        nz.extend([i if mode == "noise" else -1] * l)
    fn = np.asarray(fn)
    nz = np.asarray(nz)
    doc = np.concatenate([np.full(l, i) for i, l in
                          enumerate(sample_lens, start=1)])
    L = len(doc)
    q = np.arange(L)[:, None]
    k = np.arange(L)[None, :]
    causal = q >= k
    full_noise = (fn[q] == fn[k]) & (fn[q] >= 0)
    remove_noise = ~((nz[k] >= 0) & (nz[q] != nz[k]))
    return (causal | full_noise) & remove_noise & (doc[q] == doc[k])


def test_packed_mask_matches_reference_predicate():
    sample_lens = [10, 8]
    split_lens = [4, 3, 3, 5, 3]
    attn_modes = ["causal", "full", "noise", "causal", "noise"]
    ref = _reference_mask(sample_lens, split_lens, attn_modes)

    doc, fn, nz = build_mask_ids(sample_lens, split_lens, attn_modes)
    codes = np.asarray(pack_mask_codes(doc, fn, nz))
    L = len(codes)
    row = np.arange(L)[:, None]
    col = np.arange(L)[None, :]
    got = np.asarray(_packed_mask_allowed(
        jnp.asarray(codes)[:, None], jnp.asarray(codes)[None, :],
        jnp.asarray(row), jnp.asarray(col)))
    np.testing.assert_array_equal(got, ref)


def _make_sample_batch(bagel_params, scfg, sig_params, packs):
    """Build a raw batch dict by hand for the given sample specs."""
    ds = PackedDataset([(lambda: iter([]), 1.0)],
                       data_config=PackedDataConfig(
                           vit_patch_size=scfg.patch_size,
                           max_num_patch_per_side=8, max_latent_size=8,
                           bos_token_id=192, eos_token_id=193,
                           start_of_image=190, end_of_image=191),
                       max_num_tokens=128)
    st = ds._fresh_status()
    for s in packs:
        st = ds.pack_sequence(s, st)
    return ds.to_batch(st, [])


def _samples():
    rng = np.random.default_rng(0)
    vit_img = rng.standard_normal((4, 4, 3)).astype(np.float32)  # 2x2=4 tok
    latent = rng.standard_normal((2, 3, TINY.patch_latent_dim)) \
        .astype(np.float32)
    s1 = {  # VLM-style: image + question + answer-with-loss
        "sequence_plan": [
            {"type": "vit_image", "enable_cfg": 0, "loss": 0,
             "special_token_loss": 0},
            {"type": "text", "enable_cfg": 0, "loss": 1,
             "special_token_loss": 0},
        ],
        "text_ids_list": [[5, 6, 7]],
        "image_list": [vit_img],
        "num_tokens": 4 + 4 + 2,
    }
    s2 = {  # T2I-style: prompt + noised vae image
        "sequence_plan": [
            {"type": "text", "enable_cfg": 0, "loss": 0,
             "special_token_loss": 0},
            {"type": "vae_image", "enable_cfg": 0, "loss": 1,
             "special_token_loss": 0},
        ],
        "text_ids_list": [[8, 9]],
        "image_list": [latent],
        "num_tokens": 3 + 6 + 2,
    }
    return s1, s2


def test_packed_forward_matches_per_sample_loop():
    scfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                        num_heads=2, patch_size=2, image_size=16)
    params = init_bagel(jax.random.PRNGKey(0), TINY)
    # zero-init llm2vae blocks the mse path signal; randomize
    params["llm2vae"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["llm2vae"]["w"].shape)
    sig = init_siglip(jax.random.PRNGKey(1), scfg)
    s1, s2 = _samples()

    def run(samples, rng):
        np.random.seed(123)  # pack_sequence draws flow timesteps
        b = _make_sample_batch(params, scfg, sig, samples)
        b = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in b.items()}
        return bagel_packed_forward(
            params, TINY, b, rng=rng, siglip_params=sig, siglip_cfg=scfg,
            compute_dtype=jnp.float32)

    rng = jax.random.PRNGKey(7)
    both = run([s1, s2], rng)
    alone1 = run([s1], rng)
    alone2 = run([s2], rng)

    # ce terms for sample 1 are identical packed vs alone
    np.testing.assert_allclose(np.asarray(both["ce"]),
                               np.asarray(alone1["ce"]), rtol=1e-4,
                               atol=1e-5)
    # sample 2's latent noise depends on the rng consumed over the packed
    # latent rows; alone2 uses the same rows (s2 packs after s1 which has
    # no latents) so the mse terms must agree
    np.testing.assert_allclose(np.asarray(both["mse"]),
                               np.asarray(alone2["mse"]), rtol=1e-4,
                               atol=1e-5)
    assert np.asarray(both["mse"]).shape[0] == 6  # 2x3 latent tokens
    assert bool(np.all(np.asarray(both["mse_mask"])))


def test_packer_budgets_and_bookkeeping():
    s1, s2 = _samples()

    def gen():
        yield dict(s1)
        yield dict(s2)
        yield dict(s1)

    ds = PackedDataset(
        [(gen, 1.0)],
        data_config=PackedDataConfig(
            vit_patch_size=2, max_num_patch_per_side=8, max_latent_size=8,
            bos_token_id=192, eos_token_id=193, start_of_image=190,
            end_of_image=191),
        expected_num_tokens=20, max_num_tokens_per_sample=64,
        max_num_tokens=128)
    batches = list(ds)
    assert len(batches) >= 1
    b = batches[0]
    assert b["seq_len"] == 128
    assert b["mask_codes"].shape == (128,)
    # vit sample: 1 soi + 4 patches + 1 eoi; text: bos+3+eos
    assert b["packed_vit_patches"].shape == (4, 2 * 2 * 3)
    assert list(b["packed_label_ids"]) == [5, 6, 7, 193]
    # ce weights: len2weight(4) for the 4 answer tokens
    np.testing.assert_allclose(b["ce_loss_weights"], len2weight(4))
    # vae rope: whole image shares one position id
    vae_pos = b["packed_position_ids"][b["packed_vae_token_indexes"]]
    assert len(set(vae_pos.tolist())) == 1


def test_distributed_iterable_sharding():
    from univid_tpu.data.packed_dataset import DistributedIterableDataset

    paths = [f"f{i}" for i in range(8)]
    r0 = DistributedIterableDataset(paths, local_rank=0, world_size=2)
    r1 = DistributedIterableDataset(paths, local_rank=1, world_size=2)
    r0.set_epoch(3)
    r1.set_epoch(3)
    a, b = list(r0), list(r1)
    assert len(a) == len(b) == 4
    assert not set(a) & set(b)
    assert set(a) | set(b) == set(paths)


def test_freeze_und_zeroes_und_expert_grads():
    """freeze_und=True (reference qwen2_navit.py freeze_und detach points)
    => und-expert weights receive EXACTLY zero gradient from the gen
    (MSE) objective, while gen-expert weights still train."""
    scfg = SiglipConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                        num_heads=2, patch_size=2, image_size=16)
    params = init_bagel(jax.random.PRNGKey(0), TINY)
    params["llm2vae"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["llm2vae"]["w"].shape)
    sig = init_siglip(jax.random.PRNGKey(1), scfg)
    s1, s2 = _samples()
    np.random.seed(123)
    b = _make_sample_batch(params, scfg, sig, [s1, s2])
    b = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in b.items()}

    def loss(p, freeze):
        out = bagel_packed_forward(p, TINY, b, rng=jax.random.PRNGKey(7),
                                   siglip_params=sig, siglip_cfg=scfg,
                                   compute_dtype=jnp.float32,
                                   freeze_und=freeze)
        return jnp.sum(out["mse"])

    g_frozen = jax.grad(lambda p: loss(p, True))(params)
    g_free = jax.grad(lambda p: loss(p, False))(params)

    layers = g_frozen["llm"]["layers"]
    for name in ("q", "k", "v", "o"):
        assert float(jnp.max(jnp.abs(layers["attn"][name]["w"]))) == 0.0, \
            f"und attn.{name} grad leaked under freeze_und"
        assert float(jnp.max(jnp.abs(
            g_free["llm"]["layers"]["attn"][name]["w"]))) > 0.0
    for name in ("gate", "up", "down"):
        assert float(jnp.max(jnp.abs(layers["mlp"][name]["w"]))) == 0.0
    assert float(jnp.max(jnp.abs(g_frozen["llm"]["norm"]))) == 0.0
    # gen experts still train under freeze_und
    assert float(jnp.max(jnp.abs(layers["attn_gen"]["q"]["w"]))) > 0.0
    assert float(jnp.max(jnp.abs(layers["mlp_gen"]["gate"]["w"]))) > 0.0
