#!/usr/bin/env python
"""Micro-benchmark: flash attention kernel block-size sweep on TPU.

Run on the real chip to pick block_q/block_k for the Wan DiT hot shape
(SURVEY.md §3.1: ~33k video tokens, 12-24 heads, head_dim 128). Prints
ms + achieved TFLOP/s + MFU per variant.
"""

import functools
import time

import jax
import jax.numpy as jnp

from univid_tpu.kernels.attention import attention

PEAK = {"tpu": 197e12, "cpu": 1e12}


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    b, l, n, d = 2, 32768, 12, 128
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (b, l, n, d), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    kv_len = jnp.full((b,), l - 8, jnp.int32)
    flops = 4 * b * n * l * l * d
    peak = PEAK.get(jax.default_backend(), 197e12)

    for bq, bk in [(1024, 1024), (2048, 1024), (None, None)]:
        for use_kvlen in (True,):
            fn = jax.jit(functools.partial(
                attention, block_q=bq, block_k=bk,
                kv_len=kv_len if use_kvlen else None))
            try:
                dt = bench(fn, q, k, v)
            except Exception as e:  # noqa: BLE001
                print(f"bq={bq} bk={bk} kvlen={use_kvlen}: FAIL "
                      f"{str(e)[:80]}")
                continue
            tf = flops / dt / 1e12
            print(f"bq={bq} bk={bk} kvlen={int(use_kvlen)}: "
                  f"{dt*1e3:8.2f} ms  {tf:6.1f} TF/s  "
                  f"MFU {tf/ (peak/1e12) *100:5.1f}%")


if __name__ == "__main__":
    main()
