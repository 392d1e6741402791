#!/usr/bin/env python
"""Micro-benchmark: flash attention kernel block-size sweep on TPU.

Run on the real chip to pick block_q/block_k for the DiT hot shapes:
  1.3B @ 480p x 81f: L=32760 (pad 32768), 12 heads, d128  (attention is
       ~68% of the 1.3B step flops — kernel MFU ~= step MFU ceiling)
  5B   @ 480p x 81f: L=8190 (pad 8192), 24 heads, d128
  5B   @ 704p x 121f: L=27280, 24 heads, d128

Prints ms + achieved TFLOP/s + MFU per variant. Env knobs:
ATTN_GEOM=1.3B|5B|5B_ref|all, ATTN_ITERS.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from univid_tpu.kernels.attention import attention

PEAK = {"tpu": 197e12, "cpu": 1e12}

GEOMS = {
    "1.3B": dict(b=2, l=32760, n=12, d=128),
    "1.3B_train": dict(b=1, l=32760, n=12, d=128),
    "5B": dict(b=2, l=8190, n=24, d=128),
    "5B_ref": dict(b=2, l=27280, n=24, d=128),
    # cross-attention shapes: long q, one 512-token kv block (text ctx)
    "cross_1.3B": dict(b=2, l=32760, n=12, d=128, lk=512),
    "cross_5B": dict(b=2, l=8190, n=24, d=128, lk=512),
}

BLOCKS = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
          (1024, 2048), (2048, 1024), (2048, 512), (2048, 2048)]


@functools.lru_cache(maxsize=4)
def _rope_tabs(l, d):
    """Fused-rope tables for the sweep (ATTN_ROPE / ATTN_KROT modes) —
    a 3D grid factorization close to the 1.3B bench shape."""
    from univid_tpu.kernels.flash_attention import build_fused_rope_tables
    from univid_tpu.ops.rope import build_rope_3d
    f = max(l // (30 * 52), 1)
    cos, sin = build_rope_3d(d, (f, 30, 52))
    return build_fused_rope_tables(jnp.asarray(cos)[:l],
                                   jnp.asarray(sin)[:l], d)


def _sync(x):
    """Force real completion: scalar D2H readback from EVERY output
    leaf. Through the TPU tunnel (axon), jax.block_until_ready is a
    no-op and dispatches whose outputs are never read are lazily elided
    — only a data-dependent readback proves an execution ran, and each
    independent output (e.g. the dq vs dkv backward kernels) needs its
    own."""
    for leaf in jax.tree.leaves(x):
        float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def bench(fn, *args, iters=5):
    """Chained timing with zero host-side ops in the loop: the previous
    output leaves are fed back as the next inputs (grad's (dq, dk, dv)
    re-enter as (q, k, v); a single output re-enters as q), so every
    output-producing kernel stays live and executions serialize on
    device; scalar readbacks from every leaf close the window. Values
    drift across iterations — timing is shape-, not value-, dependent."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        leaves = jax.tree.leaves(out)
        if len(leaves) == len(args) and all(
                l_.shape == a.shape for l_, a in zip(leaves, args)):
            out = fn(*(l_.astype(a.dtype)
                       for l_, a in zip(leaves, args)))
        elif leaves[0].shape == args[0].shape:
            out = fn(leaves[0].astype(args[0].dtype), *args[1:])
        else:
            out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _blocks():
    """ATTN_BLOCKS='2048x2048[,1024x1024...]' pins the sweep to the
    listed tiles (one compile each instead of 16 through the tunnel)."""
    env = os.environ.get("ATTN_BLOCKS", "")
    if not env:
        return BLOCKS
    return [tuple(int(t) for t in pair.split("x"))
            for pair in env.split(",")]


def sweep(name, b, l, n, d, iters, lk=None):
    key = jax.random.PRNGKey(0)
    kq, kk_, kv_ = jax.random.split(key, 3)
    lk = lk or l
    q = jax.random.normal(kq, (b, l, n, d), jnp.bfloat16)
    k = jax.random.normal(kk_, (b, lk, n, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (b, lk, n, d), jnp.bfloat16)
    flops = 4 * b * n * l * lk * d
    peak = PEAK.get(jax.default_backend(), 197e12)
    print(f"== {name}: B{b} L{l} H{n} D{d} "
          f"({flops/1e12:.1f} TFLOP/call) ==")
    for bq, bk in _blocks():
        for use_kvlen in (True, False):
            # kvlen=True is the production path whenever L doesn't
            # divide the block (the wrapper pads + masks); kvlen=False
            # isolates the mask predicate's VPU cost
            kv_len = jnp.full((b,), lk, jnp.int32) if use_kvlen else None
            # ATTN_BOUND=1: bounded-softmax kernel (static score bound
            # instead of a running max — timing is value-independent,
            # and these inputs aren't qk-normed so outputs are garbage;
            # correctness is pinned in tests/test_attention.py)
            sb = jnp.float32(float(d)) \
                if os.environ.get("ATTN_BOUND", "0") == "1" else None
            fn = jax.jit(functools.partial(
                attention, block_q=bq, block_k=bk, kv_len=kv_len,
                softmax_bf16=os.environ.get("ATTN_BF16_SOFTMAX",
                                            "0") == "1",
                qk_int8=os.environ.get("ATTN_QK_INT8", "0") == "1",
                score_bound=sb,
                # ATTN_KROT: 1 -> force on, off -> force off (reproduces
                # the per-visit-rotation baseline), unset -> auto
                cache_rot_k={"1": True, "off": False}.get(
                    os.environ.get("ATTN_KROT", "")),
                rope_tables=_rope_tabs(l, d)
                if (os.environ.get("ATTN_KROT", "") == "1"
                    or os.environ.get("ATTN_ROPE", "0") == "1")
                else None))
            try:
                dt = bench(fn, q, k, v, iters=iters)
            except Exception as e:  # noqa: BLE001
                print(f"bq={bq:4d} bk={bk:4d} kvlen={int(use_kvlen)}: "
                      f"FAIL {str(e)[:70]}")
                continue
            tf = flops / dt / 1e12
            print(f"bq={bq:4d} bk={bk:4d} kvlen={int(use_kvlen)}: "
                  f"{dt*1e3:8.2f} ms  {tf:6.1f} TF/s  "
                  f"MFU {tf / (peak / 1e12) * 100:5.1f}%")


BWD_BLOCKS = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
              (2048, 512), (512, 2048), (1024, 2048), (2048, 1024)]


def sweep_bwd(name, b, l, n, d, iters):
    """Backward-kernel sweep: times grad-of-sum through the custom_vjp.

    Reports (a) fwd+bwd wall per step and (b) the bwd-only residue after
    subtracting the residual-saving forward, with MFU against the
    two-pass backward's executed FLOPs (7 block-matmuls = 3.5x fwd)."""
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    fwd_flops = 4 * b * n * l * l * d
    bwd_flops = 3.5 * fwd_flops  # dq pass 3 matmuls + dkv pass 4
    peak = PEAK.get(jax.default_backend(), 197e12)
    print(f"== bwd {name}: B{b} L{l} H{n} D{d} "
          f"({bwd_flops/1e12:.1f} TFLOP executed/bwd) ==")

    # residual-saving forward alone (same program the vjp fwd runs —
    # attention() pads internally; block_q is capped at 1024 by the vjp)
    from univid_tpu.kernels.flash_attention import flash_attention_padded

    def fwd_padded(a, b_, c):
        pad = (-a.shape[1]) % 1024
        a, b_, c = (jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
                    for x in (a, b_, c))
        kvl = jnp.full((a.shape[0],), l, jnp.int32)
        o, lse = flash_attention_padded(a, b_, c, block_q=1024,
                                        block_k=1024, kv_len=kvl,
                                        save_residuals=True)
        # consume lse inside the program so its write can't be elided;
        # slice back to the unpadded length for clean chaining
        return o[:, :l] + (0.0 * lse[0, 0, 0]).astype(o.dtype)

    fwd_fn = jax.jit(fwd_padded)
    t_fwd = bench(fwd_fn, q, k, v, iters=iters)
    print(f"residual-saving fwd (1024,1024): {t_fwd*1e3:8.2f} ms")

    for bq, bk in BWD_BLOCKS:
        fn = jax.jit(jax.grad(lambda a, b_, c: attention(
            a, b_, c, bwd_block_q=bq, bwd_block_k=bk).astype(
                jnp.float32).sum(), argnums=(0, 1, 2)))
        try:
            dt = bench(fn, q, k, v, iters=iters)
        except Exception as e:  # noqa: BLE001
            print(f"bwd bq={bq:4d} bk={bk:4d}: FAIL {str(e)[:70]}")
            continue
        bwd_dt = dt - t_fwd
        tf = bwd_flops / bwd_dt / 1e12
        print(f"bwd bq={bq:4d} bk={bk:4d}: step {dt*1e3:8.2f} ms  "
              f"bwd-only {bwd_dt*1e3:8.2f} ms  {tf:6.1f} TF/s  "
              f"MFU {tf / (peak / 1e12) * 100:5.1f}%")


def main():
    geom = os.environ.get("ATTN_GEOM", "1.3B")
    iters = int(os.environ.get("ATTN_ITERS", "5"))
    mode = os.environ.get("ATTN_MODE", "fwd")
    names = list(GEOMS) if geom == "all" else [geom]
    for nm in names:
        if mode == "bwd":
            sweep_bwd(nm, iters=iters, **GEOMS[nm])
        else:
            sweep(nm, iters=iters, **GEOMS[nm])


if __name__ == "__main__":
    main()
