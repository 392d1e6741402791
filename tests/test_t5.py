"""UMT5 encoder tests: bucket table oracle, shapes, padding contract."""

import jax
import jax.numpy as jnp
import numpy as np

from univid_tpu.core.config import T5Config
from univid_tpu.models.wan.t5 import (
    encode_padded,
    init_t5_encoder,
    relative_position_buckets,
    t5_encode,
)

TINY = T5Config(vocab_size=128, dim=32, dim_attn=32, dim_ffn=64,
                num_heads=4, num_layers=2, text_len=16)


def bucket_oracle(rel, num_buckets=32, max_dist=128):
    """Independent scalar implementation of the T5 bucketing function."""
    nb = num_buckets // 2
    out = nb if rel > 0 else 0
    rel = abs(rel)
    max_exact = nb // 2
    if rel < max_exact:
        return out + rel
    import math
    large = max_exact + int(
        math.log(rel / max_exact) / math.log(max_dist / max_exact)
        * (nb - max_exact))
    return out + min(large, nb - 1)


def test_bucket_table():
    tbl = relative_position_buckets(32, 32)
    for i in [0, 1, 5, 31]:
        for j in [0, 2, 17, 31]:
            assert tbl[i, j] == bucket_oracle(j - i), (i, j)


def test_encode_shapes_finite():
    params = init_t5_encoder(jax.random.PRNGKey(0), TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 16)))
    out = t5_encode(params, TINY, ids, compute_dtype=jnp.float32)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_padding_contract():
    """Padded rows are zeroed and do not influence valid rows."""
    params = init_t5_encoder(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(1)
    ids_a = jnp.asarray(rng.integers(1, 128, (1, 16)))
    lens = jnp.asarray([10])
    out_a = encode_padded(params, TINY, ids_a, lens,
                          compute_dtype=jnp.float32)
    # zeros beyond length
    np.testing.assert_allclose(np.asarray(out_a[0, 10:]), 0.0)
    # changing padding ids must not change valid outputs
    ids_b = ids_a.at[0, 12:].set(7)
    out_b = encode_padded(params, TINY, ids_b, lens,
                          compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_a[0, :10]),
                               np.asarray(out_b[0, :10]), rtol=1e-5,
                               atol=1e-6)


def test_per_layer_bias_differs():
    """umt5 uses per-layer relative embeddings (shared_pos=False)."""
    params = init_t5_encoder(jax.random.PRNGKey(0), TINY)
    b0 = np.asarray(params["blocks"]["0"]["pos_embedding"])
    b1 = np.asarray(params["blocks"]["1"]["pos_embedding"])
    assert not np.allclose(b0, b1)
