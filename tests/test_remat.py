"""Remat-policy parity: the three remat modes of the DiT backward
(False / True / 'attn') must agree on loss and gradients.

The 'attn' mode saves the flash output (in compute dtype — see
models/wan/dit.py) and recomputes everything else; full remat
recomputes the whole block. Neither may change the math — only the
memory/time tradeoff (reference trains through flash-attn's own
recompute-free backward, model_pipeline.py:2765-3142).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core.config import WAN_CONFIGS, latent_shape
from univid_tpu.core.dtypes import FP32_POLICY
from univid_tpu.models.wan.dit import init_wan_dit, wan_dit_forward
from univid_tpu.ops.rope import build_rope_3d


@pytest.fixture(scope="module")
def setup():
    spec = WAN_CONFIGS["tiny"]
    cfg = spec.dit
    _, lf, lh, lw = latent_shape(spec, 64, 64, 9)
    pt, ph, pw = cfg.patch_size
    cos, sin = build_rope_3d(cfg.head_dim, (lf // pt, lh // ph, lw // pw))
    params = init_wan_dit(jax.random.PRNGKey(0), cfg,
                          param_dtype=jnp.float32)
    # randomize the zero-init head so gradients reach every block
    hw = params["head"]["head"]["w"]
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(9), hw.shape, hw.dtype)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, lf, lh, lw, cfg.in_dim), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.text_len, cfg.text_dim), jnp.float32)
    return cfg, params, x, t, ctx, cos, sin


def _loss_and_grads(setup, remat):
    cfg, params, x, t, ctx, cos, sin = setup

    def loss_fn(p):
        v = wan_dit_forward(p, cfg, x, t, ctx, cos, sin,
                            policy=FP32_POLICY, remat_blocks=remat)
        return jnp.mean(jnp.square(v))

    return jax.jit(jax.value_and_grad(loss_fn))(params)


def test_remat_modes_agree(setup):
    base_loss, base_grads = _loss_and_grads(setup, False)
    for mode in (True, "attn"):
        loss, grads = _loss_and_grads(setup, mode)
        np.testing.assert_allclose(loss, base_loss, rtol=1e-5)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(grads),
                jax.tree_util.tree_leaves_with_path(base_grads)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"remat={mode} grad mismatch at {pa}")
