"""UniVid-TPU: a TPU-native unified video model framework.

Re-implementation of the capabilities of AIGeeksGroup/UniVid (BAGEL-7B-MoT
semantic brain + Wan2.2 video diffusion renderer, fused through a trained
ContextProjector with Temperature Modality Alignment), designed from scratch
for TPU: JAX/XLA compute, Pallas kernels for attention, pjit/shard_map over
device meshes for scale.

Layout (see SURVEY.md section 7):
  core/       mesh + sharding setup, dtype policy, config tree, checkpoint io
  kernels/    pallas flash attention (segment-id varlen, block-sparse modes)
  ops/        rope, embeddings, modulation, cfg+renorm, samplers, caching
  parallel/   mesh axes; ulysses all-to-all attention; sequence sharding
  models/     wan (dit, video vae, umt5), bagel (qwen2-mot, siglip, image vae)
  pipelines/  t2v/i2v/ti2v samplers, interleave inferencer, fusion pipeline
  reflection/ siglip2 frame scorer, mmr, reflexion loop, judge/reflector
  data/       packed dataset, openvid dataset, video io
  train/      adapter/LoRA trainers (optax), losses
  cli/        inference + eval_understanding entry points
"""

__version__ = "0.1.0"
