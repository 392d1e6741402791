"""SAM2 video segmenter: predictor surface, fixed-capacity memory bank
semantics, checkpoint manifest <-> converter equivalence, and the
animate-preprocess mask_fn adapter.

Reference parity target: the pip `sam2` package driven by
models/wan/utils/modules/animate/preprocess/{video_predictor.py:14-157,
sam_utils.py:122-155, process_pipepline.py:280-343}.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from univid_tpu.core import checkpoint as C
from univid_tpu.core import manifest as M
from univid_tpu.data.animate_preprocess import PoseMeta
from univid_tpu.models.sam2 import (Sam2Config, Sam2VideoPredictor,
                                    build_sam2_mask_fn, init_sam2,
                                    tiny_sam2_config)
from univid_tpu.models.sam2.predictor import (_fill_small_holes,
                                              _propagate_step)

CFG = tiny_sam2_config(64)


@pytest.fixture(scope="module")
def params():
    return init_sam2(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(3)
    f = rng.randint(0, 60, (6, 48, 40, 3), np.uint8)
    # a bright moving square: something for the masks to latch onto
    for t in range(6):
        f[t, 8 + 2 * t: 24 + 2 * t, 6: 22] = 230
    return f


def _add_points(pred, state, frame_idx=0):
    pts = np.array([[14.0, 16.0], [18.0, 20.0]], np.float32)
    return pred.add_new_points(state, frame_idx, 1, pts,
                               np.array([1, 1], np.int32))


def test_predictor_end_to_end(params, frames):
    pred = Sam2VideoPredictor(params, CFG)
    state = pred.init_state_v2(list(frames))
    fi, ids, mask = _add_points(pred, state)
    assert (fi, ids) == (0, [1])
    assert mask.shape == (1, 1, 48, 40)
    outs = list(pred.propagate_in_video(state))
    assert [t for t, _, _ in outs] == list(range(6))
    for _, oids, m in outs:
        assert oids == [1] and m.shape == (1, 1, 48, 40)
        assert np.isfinite(m).all()
    # frame 0 is the conditioning frame: propagation returns its
    # stored mask exactly
    np.testing.assert_array_equal(outs[0][2], mask)


def test_propagation_deterministic(params, frames):
    pred = Sam2VideoPredictor(params, CFG)

    def run():
        state = pred.init_state_v2(list(frames))
        _add_points(pred, state)
        return np.stack([m[0, 0] for _, _, m in
                         pred.propagate_in_video(state)])

    np.testing.assert_array_equal(run(), run())


def test_multiple_cond_frames(params, frames):
    pred = Sam2VideoPredictor(params, CFG)
    state = pred.init_state_v2(list(frames))
    _add_points(pred, state, 0)
    _add_points(pred, state, 3)
    outs = list(pred.propagate_in_video(state))
    assert len(outs) == 6


def test_single_point_takes_multimask_path(params, frames):
    """<=1 click routes through the multimask head (published
    _use_multimask); >=2 clicks the single-mask + stability path —
    both must produce finite masks."""
    pred = Sam2VideoPredictor(params, CFG)
    state = pred.init_state_v2(list(frames))
    _, _, m1 = pred.add_new_points(state, 0, 1,
                                   np.array([[20.0, 24.0]]),
                                   np.array([1]))
    assert np.isfinite(m1).all()


def test_key_mask_hides_invalid_bank_slots(params, frames):
    """Garbage in INVALID bank slots must not change the output — the
    fixed-capacity TPU bank is only correct if the key mask really
    masks. Run one propagate step twice: zeros vs garbage in the
    invalid slots."""
    pred = Sam2VideoPredictor(params, CFG)
    state = pred.init_state_v2(list(frames))
    _add_points(pred, state)
    bank = pred._make_bank(state, [0])
    img = jnp.asarray(state["images"][1][None])

    out_clean = _propagate_step(params, CFG, img, jnp.int32(1), bank)
    garbage = dict(bank)
    for k in ("cond_mem", "cond_ptrs", "ring_mem", "ptrs"):
        valid_key = {"cond_mem": "cond_valid", "cond_ptrs": "cond_valid",
                     "ring_mem": "ring_valid", "ptrs": "ptr_valid"}[k]
        v = np.asarray(bank[valid_key]).astype(bool)
        arr = np.asarray(bank[k]).copy()
        arr[~v] = 1e4
        garbage[k] = jnp.asarray(arr)
    out_garbage = _propagate_step(params, CFG, img, jnp.int32(1),
                                  garbage)
    for a, b in zip(out_clean, out_garbage):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_ring_staleness(params, frames):
    """A ring entry older than ring_slots frames must be masked out at
    read time: stepping at t and at t + ring_slots + 1 with the same
    single ring entry gives different conditioning."""
    pred = Sam2VideoPredictor(params, CFG)
    state = pred.init_state_v2(list(frames))
    _add_points(pred, state)
    bank = pred._make_bank(state, [0])
    img = jnp.asarray(state["images"][1][None])
    mask, ptr, mem, _ = _propagate_step(params, CFG, img, jnp.int32(1),
                                        bank)
    bank2 = pred._push(bank, 1, mem[0], ptr[0])
    fresh = _propagate_step(params, CFG, img, jnp.int32(2), bank2)[0]
    stale_t = 2 + CFG.ring_slots + CFG.ptr_ring_slots
    stale = _propagate_step(params, CFG, img, jnp.int32(stale_t),
                            bank2)[0]
    # the stale read must equal an empty-ring read at the same t
    empty = _propagate_step(params, CFG, img, jnp.int32(stale_t),
                            bank)[0]
    np.testing.assert_allclose(np.asarray(stale), np.asarray(empty),
                               atol=1e-5)
    assert not np.allclose(np.asarray(fresh), np.asarray(stale))


def test_bf16_compute_path(params, frames):
    """compute_dtype=bf16 (the TPU serving mode: bf16 matmuls, fp32
    softmax/norm islands) stays finite and close to the f32 masks."""
    import dataclasses
    cfg16 = dataclasses.replace(CFG, compute_dtype=jnp.bfloat16)
    pred32 = Sam2VideoPredictor(params, CFG)
    pred16 = Sam2VideoPredictor(params, cfg16)

    def run(pred):
        state = pred.init_state_v2(list(frames))
        _add_points(pred, state)
        return np.stack([m[0, 0] for _, _, m in
                         pred.propagate_in_video(state)])

    m32, m16 = run(pred32), run(pred16)
    assert np.isfinite(m16).all()
    # same sign pattern on the overwhelming majority of pixels
    agree = np.mean((m32 > 0) == (m16 > 0))
    assert agree > 0.98, f"bf16/f32 mask agreement {agree:.3f}"


def test_fill_small_holes():
    logits = np.full((16, 16), 2.0, np.float32)
    logits[4:6, 4:6] = -1.0          # 4-px hole -> filled
    logits[10:14, 10:14] = -1.0      # 16-px hole -> kept
    out = _fill_small_holes(logits, area=8)
    assert (out[4:6, 4:6] == 0.1).all()
    assert (out[10:14, 10:14] == -1.0).all()
    # background bigger than area is untouched
    neg = np.full((16, 16), -2.0, np.float32)
    np.testing.assert_array_equal(_fill_small_holes(neg, 8), neg)


def test_mask_fn_adapter(params):
    """build_sam2_mask_fn satisfies the animate-preprocess mask_fn
    contract: [T, H, W] uint8 from frames + PoseMeta list, prompting
    with the reference's 8 confident body joints. 12 frames -> the
    reference keyframe rule (step = T // 4) picks 4 conditioning
    frames and propagates the other 8."""
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 60, (12, 48, 40, 3), np.uint8)
    for t in range(12):
        frames[t, 8 + t: 24 + t, 6: 22] = 230
    body = np.zeros((20, 3), np.float32)
    for j, (x, y) in zip((0, 1, 2, 5, 8, 11),
                         [(14, 12), (14, 18), (10, 18), (18, 18),
                          (12, 30), (16, 30)]):
        body[j] = (x, y, 0.9)
    metas = [PoseMeta(body=body) for _ in range(len(frames))]
    mask_fn = build_sam2_mask_fn(params, CFG)
    masks = mask_fn(frames, metas)
    assert masks.shape == frames.shape[:3]
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)) <= {0, 1}


def test_manifest_matches_converter():
    man = M.sam2_manifest(CFG)
    rng = np.random.default_rng(0)
    sd = {k: rng.standard_normal(s).astype(np.float32)
          for k, s in man.items()}
    params, leftover = M.audited(
        sd, lambda s: C.convert_sam2(s, CFG, jnp.float32),
        ignore=("sam_prompt_encoder.mask_downscaling.",))
    assert leftover == []
    template = jax.eval_shape(lambda k: init_sam2(k, CFG),
                              jax.random.PRNGKey(0))
    got = jax.tree.map(lambda x: tuple(jnp.shape(x)), params)
    want = jax.tree.map(lambda x: tuple(x.shape), template)
    assert jax.tree_util.tree_structure(got) == \
        jax.tree_util.tree_structure(want)
    for (pg, g), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves_with_path(want)):
        assert g == w, f"{jax.tree_util.keystr(pg)}: {g} vs {w}"
    # converted params must actually run (layout mistakes like a
    # mis-transposed deconv would pass the shape check)
    pred = Sam2VideoPredictor(params, CFG)
    state = pred.init_state_v2([np.zeros((32, 32, 3), np.uint8)] * 2)
    _, _, m = pred.add_new_points(state, 0, 1, np.array([[16.0, 16.0]]),
                                  np.array([1]))
    assert np.isfinite(m).all()


def test_strict_audit_catches_extra_keys():
    man = M.sam2_manifest(CFG)
    rng = np.random.default_rng(0)
    sd = {k: rng.standard_normal(s).astype(np.float32)
          for k, s in man.items()}
    sd["image_encoder.trunk.blocks.99.renamed.weight"] = \
        np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        M.audited(sd, lambda s: C.convert_sam2(s, CFG, jnp.float32),
                  ignore=("sam_prompt_encoder.mask_downscaling.",))


def test_full_scale_manifest_pinned():
    """Regenerating the real-scale manifest matches the committed JSON
    (same pattern as the other model families)."""
    import json
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "manifests",
        "sam2_hiera_large.json")
    man = {k: list(v) for k, v in M.sam2_manifest(Sam2Config()).items()}
    with open(path) as f:
        pinned = json.load(f)
    assert man == pinned
