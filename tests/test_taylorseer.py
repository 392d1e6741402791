"""TaylorSeer step-cache tests: schedule parity with the reference
cal_type bookkeeping (taylorseer.py:79-153), exact equivalence at
fresh_threshold=1, and the cached fast path producing finite, close
outputs at the default threshold (wired per CFG branch like
bagel.py:680-689)."""

import jax
import jax.numpy as jnp
import numpy as np

from univid_tpu.models.bagel.bagel import (generate_image_latent,
                                           init_gen_context,
                                           update_context_text)
from univid_tpu.ops.taylorseer import (TaylorSeerConfig, init_taylor_cache,
                                       taylor_predict, taylor_update,
                                       taylorseer_schedule)
from tests.test_bagel import TINY, bagel  # noqa: F401  (fixture)


def test_schedule_matches_reference_pattern():
    """threshold 3 / first_enhance 5: full at 0-4, then every 3rd
    (7, 10, 13...), exactly the reference counter dance."""
    s = taylorseer_schedule(14, TaylorSeerConfig())
    fulls = [i for i, f in enumerate(s["is_full"]) if f > 0]
    assert fulls == [0, 1, 2, 3, 4, 7, 10, 13]
    # taylor-step distances from last activated step
    assert s["x"][5] == 1.0 and s["x"][6] == 2.0 and s["x"][8] == 1.0
    # derivative distances at full steps: step4-step3=1, step7-step4=3
    assert s["dd"][4] == 1.0 and s["dd"][7] == 3.0
    # orders grow once step > first_enhance - 2: step 4 updates 1 order,
    # step 7 two, capped at max_order
    assert s["n_upd"][4] == 1 and s["n_upd"][7] == 2 and s["n_upd"][10] == 3


def test_taylor_update_predict_linear_feature():
    """A feature evolving linearly in the step index is extrapolated
    exactly by the order-1 factors."""
    cfg = TaylorSeerConfig(max_order=2)
    cache = init_taylor_cache((3,), cfg.max_order)
    f = lambda step: jnp.asarray([1.0, 2.0, 3.0]) * step + 5.0
    # full at step 4 with no history, full at step 7 with 1 updatable
    cache = taylor_update(cache, f(4), jnp.asarray(1.0), jnp.asarray(0))
    cache = taylor_update(cache, f(7), jnp.asarray(3.0), jnp.asarray(1))
    # predict step 9: x = 2 from activation at 7
    got = taylor_predict(cache, jnp.asarray(2.0), jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(f(9)),
                               rtol=1e-6)


def _gen(bagel, **kw):  # noqa: F811
    # llm2vae is zero-init (reference parity) which makes every velocity
    # zero on a fresh model; give it weights so the flow actually moves
    bagel = dict(bagel, llm2vae={
        "w": 0.1 * jax.random.normal(jax.random.PRNGKey(60),
                                     bagel["llm2vae"]["w"].shape),
        "b": jnp.zeros_like(bagel["llm2vae"]["b"])})
    ctx = init_gen_context(TINY, capacity=256, dtype=jnp.float32)
    ids = jnp.asarray([192, 11, 12, 193], jnp.int32)
    ctx = update_context_text(bagel, TINY, ctx, ids,
                              compute_dtype=jnp.float32)
    cfg_text_ctx = init_gen_context(TINY, capacity=256, dtype=jnp.float32)
    lat, _ = generate_image_latent(
        bagel, TINY, ctx, (16, 24), cfg_text_ctx=cfg_text_ctx,
        num_timesteps=12, cfg_text_scale=2.0, cfg_img_scale=1.0,
        compute_dtype=jnp.float32, rng=jax.random.PRNGKey(5), **kw)
    return np.asarray(lat)


def test_threshold_one_is_exact(bagel):  # noqa: F811
    """fresh_threshold=1 -> every step full -> identical output to the
    uncached loop."""
    ref = _gen(bagel)
    got = _gen(bagel, enable_taylorseer=True,
               taylorseer_cfg=TaylorSeerConfig(fresh_threshold=1))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_default_threshold_close_and_finite(bagel):  # noqa: F811
    """Default threshold=3 skips LM passes: output is finite, close to
    the exact loop, but not bit-identical (the cache is exercised)."""
    ref = _gen(bagel)
    got = _gen(bagel, enable_taylorseer=True)
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() > 0  # taylor steps actually ran
    # extrapolation quality: same ballpark as the exact solve
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.5, rel
