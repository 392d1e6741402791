#!/usr/bin/env python
"""SAM2 video-tracking throughput bench.

Measures the animate-preprocess segmentation hot path on the current
device at the REAL model scale (Hiera-L, 1024x1024 input, 224M params,
random weights): the fused per-frame propagate step (Hiera encode ->
memory attention over the fixed-capacity bank -> SAM head -> memory
encode) and the conditioning (clicked-frame) step.

Reference context: the pip `sam2` package the reference preprocess
drives reports ~27 fps tracking one object at 768x768 on GPU
(video_predictor.py:41-43 comment); this measures the same role on TPU
at the published 1024 eval resolution.

Prints one JSON line. Not driver-facing (the driver contract is
bench.py); run manually: `python tools/bench_sam2.py`.

Env knobs: SAM2_FRAMES (timed propagate steps, default 24),
SAM2_IMAGE_SIZE (default 1024), SAM2_DTYPE (bf16|f32 params,
default bf16).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from univid_tpu.models.sam2 import (Sam2Config, Sam2VideoPredictor,
                                        init_sam2)
    n_frames = int(os.environ.get("SAM2_FRAMES", "24"))
    size = int(os.environ.get("SAM2_IMAGE_SIZE", "1024"))
    dtype = jnp.bfloat16 if os.environ.get("SAM2_DTYPE",
                                           "bf16") == "bf16" \
        else jnp.float32
    if size != 1024:
        raise SystemExit("non-1024 sizes need a matching head/memory "
                         "grid config; use SAM2_IMAGE_SIZE=1024")
    cfg = Sam2Config(image_size=size, compute_dtype=dtype)
    params = init_sam2(jax.random.PRNGKey(0), cfg, param_dtype=dtype)
    pred = Sam2VideoPredictor(params, cfg)

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (n_frames + 2, 720, 1280, 3), np.uint8)
    state = pred.init_state_v2(list(frames))

    t0 = time.perf_counter()
    pred.add_new_points(state, 0, 1,
                        np.asarray([[640.0, 360.0], [660.0, 300.0]],
                                   np.float32),
                        np.asarray([1, 1], np.int32))
    jax.effects_barrier()
    cond_cold_s = time.perf_counter() - t0

    # warm pass compiles the propagate step; second pass is timed
    it = pred.propagate_in_video(state, max_frame_num_to_track=1)
    for _ in it:
        pass
    t0 = time.perf_counter()
    n = 0
    for _, _, _m in pred.propagate_in_video(state):
        n += 1
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    fps = (n - 1) / dt  # frame 0 is the stored cond frame

    print(json.dumps({
        "metric": "sam2_track_fps_1024",
        "value": round(fps, 2),
        "unit": "frames/s",
        "detail": {
            "frames_timed": n - 1,
            "cond_step_cold_s": round(cond_cold_s, 2),
            "param_dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
            "device": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
