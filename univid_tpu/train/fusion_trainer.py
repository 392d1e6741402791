"""UniVid adapter/LoRA trainer — trains exactly what the reference trains.

Behavioral parity with reference train_cross_attention_fusion
(model_pipeline.py:3232-3439) and the semantic batch path (:2528-2548):

  * trainables = {ContextProjector} (+ LoRA sites when train_lora), the
    frozen BAGEL/Wan stacks never receive gradients (:3262-3281)
  * AdamW(lr, weight_decay=1e-5, betas=(0.9, 0.999), eps=1e-8) with
    OneCycleLR (10% warmup, cosine anneal) or cosine annealing to
    lr*0.1 (:3284-3306)
  * semantic path: projector(bagel_tokens) vs UMT5 supervision features
    (cosine + L2 + diversity, projector.py parity)
  * diffusion path: VAE-encode video -> flow-matching noise -> DiT with
    LoRA-merged weights + projected context -> velocity MSE. The
    reference's ad-hoc DDPM buffers (:2312-2351) are replaced by the
    flow-matching schedule its own inference uses (SURVEY.md §3.5 notes
    the inconsistency).
  * periodic checkpoint every save_interval steps + best-model tracking
    + hard cap at max_steps=200 (:3383-3395), with FULL trainer-state
    save/resume (params + optimizer state + step/best) — the reference
    only saves LoRA weights.
"""

from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import FusionConfig, WanModelSpec
from ..models.fusion.projector import (context_projector_forward,
                                       init_context_projector,
                                       projector_training_loss)
from ..models.wan.dit import wan_dit_forward
from ..models.wan.vae_api import vae_encode
from ..ops.rope import build_rope_3d
from ..ops.samplers import add_flow_noise
from .lora import LoRAConfig, init_lora, merge_lora, trainable_sites


@dataclass(frozen=True)
class FusionTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    grad_clip: float = 1.0
    use_one_cycle_lr: bool = True
    max_steps: int = 200
    save_interval: int = 50
    log_interval: int = 10
    train_lora: bool = True
    use_semantic_alignment: bool = True
    num_train_timesteps: int = 1000


# ---------------------------------------------------------------------------
# optimizer / state
# ---------------------------------------------------------------------------


def make_fusion_optimizer(cfg: FusionTrainConfig):
    """AdamW + clip + OneCycle/cosine schedule
    (model_pipeline.py:3284-3306)."""
    if cfg.use_one_cycle_lr:
        # optax's onecycle divides by floor(pct_start * steps): keep the
        # warmup at >= 1 step or every LR is NaN
        steps = max(cfg.max_steps, 10)
        sched = optax.cosine_onecycle_schedule(
            transition_steps=steps, peak_value=cfg.learning_rate,
            pct_start=0.1)
    else:
        sched = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.max_steps,
            alpha=0.1)  # eta_min = lr * 0.1
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay),
    )


def init_fusion_train_state(key, fusion_cfg: FusionConfig,
                            train_cfg: FusionTrainConfig,
                            dit_cfg=None,
                            lora_cfg: Optional[LoRAConfig] = None):
    """Trainable pytree {'projector', 'lora'?} + optimizer + state dict."""
    k1, k2 = jax.random.split(key)
    trainable = {"projector": init_context_projector(k1, fusion_cfg)}
    lora_template = None
    if train_cfg.train_lora:
        assert dit_cfg is not None
        lora_cfg = lora_cfg or LoRAConfig()
        lora_template = init_lora(k2, dit_cfg, lora_cfg)
        # only the a/b factors are differentiable; masks/rank/alpha stay
        # in the template (passed to make_diffusion_train_step)
        trainable["lora"] = trainable_sites(lora_template)
    tx = make_fusion_optimizer(train_cfg)
    state = {"trainable": trainable, "opt": tx.init(trainable),
             "step": jnp.zeros((), jnp.int32),
             "best_loss": jnp.asarray(np.inf, jnp.float32)}
    return state, tx, lora_template


# ---------------------------------------------------------------------------
# train steps
# ---------------------------------------------------------------------------


def make_semantic_train_step(fusion_cfg: FusionConfig, tx):
    """Projector semantic-alignment step: bagel_tokens [B, L, bagel_dim],
    supervision [B, Ls, wan_dim] (UMT5 features of the same caption —
    model_pipeline.py:2418-2548)."""

    def loss_fn(trainable, bagel_tokens, supervision):
        losses = projector_training_loss(trainable["projector"],
                                         fusion_cfg, bagel_tokens,
                                         supervision)
        return losses["total_loss"], losses

    @jax.jit
    def step(state, bagel_tokens, supervision):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["trainable"], bagel_tokens, supervision)
        updates, opt = tx.update(grads, state["opt"], state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        new = dict(state, trainable=trainable, opt=opt,
                   step=state["step"] + 1,
                   best_loss=jnp.minimum(state["best_loss"], loss))
        return new, loss, aux

    return step


def make_diffusion_train_step(spec: WanModelSpec, fusion_cfg: FusionConfig,
                              train_cfg: FusionTrainConfig, tx,
                              base_dit_params, vae_params,
                              latent_grid, lora_template=None,
                              remat_blocks: bool = False,
                              policy=None):
    """LoRA + projector diffusion step (model_pipeline.py:2765-3142 role):
    video [B, T, H, W, 3] -> VAE latents -> flow noise at t -> DiT with
    LoRA-merged frozen base + projected BAGEL context -> velocity MSE.

    remat_blocks=True rematerializes each DiT block in the backward pass
    (jax.checkpoint) — required at real video resolutions (33k tokens)
    where storing every block's activations would exceed HBM; pairs with
    the O(L)-memory Pallas flash-attention backward."""
    cfg = spec.dit
    f, h, w = latent_grid
    pt, ph, pw = cfg.patch_size
    rope_cos, rope_sin = build_rope_3d(cfg.head_dim,
                                       (f // pt, h // ph, w // pw))
    # pad the token axis ONCE to the flash block multiple (same move as
    # pipelines/ti2v.py): without it every block re-pads q/k/v to 2048
    # and re-slices — and in training that copy traffic is paid in the
    # forward, the remat recompute, AND the backward
    seq_len = (f // pt) * (h // ph) * (w // pw)
    seq_pad = -(-seq_len // 2048) * 2048 if seq_len > 2048 else None

    def loss_fn(trainable, batch, base_params):
        ctx = context_projector_forward(trainable["projector"], fusion_cfg,
                                        batch["bagel_tokens"])
        if "lora" in trainable:
            params = merge_lora(base_params, lora_template,
                                freeze_base=True, sites=trainable["lora"])
        else:
            params = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            base_params)
        x0 = batch["latents"]
        noise = batch["noise"]
        t = batch["t"]
        sigma = t.astype(jnp.float32) / train_cfg.num_train_timesteps
        x_t = add_flow_noise(x0, noise, sigma[:, None, None, None, None])
        # policy note: the per-block remat boundary stores the residual
        # stream in policy.residual_dtype for every layer — fp32 costs
        # 5.6 GB at 30 layers x 33k tokens x 1536; the bf16-residual
        # policy (standard practice for bf16 transformer training)
        # halves it and is what lets the full-resolution step fit one
        # 16 GB chip (tools/bench_train.py)
        kw = {"policy": policy} if policy is not None else {}
        v_pred = wan_dit_forward(params, cfg, x_t, t, ctx, rope_cos,
                                 rope_sin, seq_pad_to=seq_pad,
                                 remat_blocks=remat_blocks, **kw)
        target = (noise - x0).astype(jnp.float32)
        return jnp.mean(jnp.square(v_pred - target))

    # the frozen base weights enter as jit ARGUMENTS, not closure
    # captures: lowering would otherwise bake them into the HLO as
    # constants (2.9 GB capture for the 1.3B — slow compile, duplicated
    # HBM; same fix as the batched-captioning path)
    @jax.jit
    def _encode(vp, video):
        return vae_encode(vp, spec.vae, video)

    def encode(video):
        return _encode(vae_params, video)

    # donate the carried train state: trainable + AdamW moments update
    # in place instead of allocating fresh buffers every step
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _step(state, batch, base_params):
        loss, grads = jax.value_and_grad(loss_fn)(state["trainable"],
                                                  batch, base_params)
        updates, opt = tx.update(grads, state["opt"], state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        new = dict(state, trainable=trainable, opt=opt,
                   step=state["step"] + 1,
                   best_loss=jnp.minimum(state["best_loss"], loss))
        return new, loss

    def step(state, batch):
        return _step(state, batch, base_dit_params)

    return step, encode


# ---------------------------------------------------------------------------
# full trainer-state checkpointing (save/resume)
# ---------------------------------------------------------------------------


def save_train_state(path: str, state) -> None:
    """Leaves as npz in tree_flatten order + scalar metadata; restoring
    requires a template state with the same structure (init + load)."""
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(os.path.join(path, "train_state.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})
    with open(os.path.join(path, "train_state.json"), "w") as f:
        json.dump({"num_leaves": len(leaves),
                   "step": int(state["step"]),
                   "best_loss": float(state["best_loss"])}, f)


def load_train_state(path: str, template_state):
    """Restore into the structure of `template_state` (built by
    init_fusion_train_state with identical configs)."""
    data = np.load(os.path.join(path, "train_state.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(template_state)
    assert len(leaves) == len(data.files), \
        f"checkpoint has {len(data.files)} leaves, template {len(leaves)}"
    restored = [jnp.asarray(data[f"leaf_{i}"]).astype(l.dtype)
                for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, restored)


# ---------------------------------------------------------------------------
# training loop (model_pipeline.py:3232-3439)
# ---------------------------------------------------------------------------


def train_cross_attention_fusion(
    dataset,
    extract_tokens: Callable[[str], jnp.ndarray],   # caption -> [L, bagel]
    t5_supervision: Callable[[str], jnp.ndarray],   # caption -> [Ls, wan]
    fusion_cfg: FusionConfig,
    train_cfg: FusionTrainConfig,
    output_dir: str,
    *,
    seed: int = 0,
    resume: bool = True,
    dit_cfg=None,
    lora_cfg: Optional[LoRAConfig] = None,
    diffusion: Optional[Dict] = None,
    log: Optional[Callable[[str], None]] = None,
) -> Dict:
    """Training loop over dataset samples. Returns {'steps', 'best_loss',
    'losses'}.

    Objective: semantic alignment (projector) by default; pass
    `diffusion={'spec': WanModelSpec, 'dit_params': ..., 'vae_params':
    ..., 'latent_grid': (f, h, w)}` to run the velocity-MSE objective
    through the LoRA-merged DiT instead — the ONLY objective whose loss
    reaches the LoRA leaves. train_lora without it would give LoRA
    exactly-zero gradients (the reference has the same quirk: its
    semantic path never touches the DiT, model_pipeline.py:3328-3373).
    Dataset samples need a 'video' [T, H, W, 3] field on the diffusion
    path.
    """
    log = log or (lambda s: None)
    if train_cfg.train_lora and diffusion is None:
        raise ValueError(
            "train_lora=True with the semantic objective trains nothing: "
            "the semantic loss never touches the DiT, so LoRA gradients "
            "are exactly zero. Pass `diffusion=...` (velocity-MSE through "
            "the LoRA-merged DiT) or set train_lora=False.")
    state, tx, lora_template = init_fusion_train_state(
        jax.random.PRNGKey(seed), fusion_cfg, train_cfg, dit_cfg=dit_cfg,
        lora_cfg=lora_cfg)
    ckpt_dir = os.path.join(output_dir, "latest")
    if resume and os.path.exists(os.path.join(ckpt_dir, "train_state.npz")):
        state = load_train_state(ckpt_dir, state)
        log(f"resumed at step {int(state['step'])}")

    if diffusion is not None:
        diff_step, encode = make_diffusion_train_step(
            diffusion["spec"], fusion_cfg, train_cfg, tx,
            diffusion["dit_params"], diffusion["vae_params"],
            diffusion["latent_grid"], lora_template=lora_template)
    else:
        sem_step = make_semantic_train_step(fusion_cfg, tx)

    rng = jax.random.PRNGKey(seed + 1)
    losses = []
    best_saved = float("inf")
    while int(state["step"]) < train_cfg.max_steps:
        for sample in dataset:
            if int(state["step"]) >= train_cfg.max_steps:
                break
            caption = sample["caption"] if isinstance(sample, dict) \
                else str(sample)
            bagel_tokens = extract_tokens(caption)[None]
            if diffusion is not None:
                latents = encode(jnp.asarray(sample["video"])[None])
                rng, k1, k2 = jax.random.split(rng, 3)
                batch = {
                    "latents": latents,
                    "bagel_tokens": bagel_tokens,
                    "noise": jax.random.normal(k1, latents.shape),
                    "t": jax.random.uniform(
                        k2, (1,), minval=0.0,
                        maxval=float(train_cfg.num_train_timesteps)),
                }
                state, loss = diff_step(state, batch)
                aux = {"semantic_loss": jnp.zeros(())}
            else:
                supervision = t5_supervision(caption)[None]
                state, loss, aux = sem_step(state, bagel_tokens,
                                            supervision)
            loss = float(loss)
            losses.append(loss)
            step = int(state["step"])
            if step % train_cfg.log_interval == 0:
                log(f"step {step}: loss={loss:.6f} "
                    f"semantic={float(aux['semantic_loss']):.6f}")
            # best-model tracking: persist every improvement, not only
            # improvements landing on a save_interval boundary
            if loss < best_saved:
                best_saved = loss
                save_train_state(os.path.join(output_dir, "best"), state)
            if step % train_cfg.save_interval == 0:
                save_train_state(ckpt_dir, state)
        if not losses:
            break  # empty dataset

    save_train_state(ckpt_dir, state)
    if train_cfg.train_lora and lora_template is not None:
        # export the trained adapter in the save_lora format the
        # inference CLI consumes (--use_lora/--lora_path; reference
        # saves lora_weights + lora_config the same way,
        # model_pipeline.py:601-720). Export the BEST-loss adapter, not
        # the loop-exit one: the reference persists weights on every
        # improvement (model_pipeline.py:3389-3392), so 'lora_best' must
        # come from best/train_state.npz when an improvement was saved.
        from .lora import save_lora, with_sites
        best_dir = os.path.join(output_dir, "best")
        export_state = state
        if os.path.exists(os.path.join(best_dir, "train_state.npz")):
            export_state = load_train_state(best_dir, state)
        trained = with_sites(lora_template,
                             export_state["trainable"]["lora"])
        save_lora(os.path.join(output_dir, "lora_best"), trained,
                  lora_cfg or LoRAConfig())
        log(f"exported LoRA adapter to {output_dir}/lora_best")
    return {"steps": int(state["step"]),
            "best_loss": float(state["best_loss"]), "losses": losses}
