"""Flash attention kernel vs the einsum oracle (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rag_serving_system_tpu.models.layers import (
    attention,
    causal_padding_bias,
    padding_bias,
)
from rag_serving_system_tpu.ops.attention import flash_attention


def _make(rng, b, s, hq, hk, d):
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hk, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hk, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("b,s,hq,hk,d,blk", [
    (2, 128, 4, 2, 64, 64),     # GQA group 2
    (1, 256, 2, 2, 32, 128),    # MHA, multi-block
    (2, 128, 6, 2, 32, 128),    # group 3, single k block
])
def test_flash_causal_matches_oracle(rng, b, s, hq, hk, d, blk):
    q, k, v = _make(rng, b, s, hq, hk, d)
    mask = jnp.ones((b, s), jnp.int32)
    ref = attention(q, k, v, causal_padding_bias(mask))
    out = flash_attention(q, k, v, mask, causal=True, blk_q=blk, blk_k=blk,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_left_padding(rng):
    b, s, hq, hk, d = 2, 128, 4, 2, 64
    q, k, v = _make(rng, b, s, hq, hk, d)
    mask = np.ones((b, s), np.int32)
    mask[0, :40] = 0  # row 0 left-padded
    mask = jnp.asarray(mask)
    ref = attention(q, k, v, causal_padding_bias(mask))
    out = flash_attention(q, k, v, mask, causal=True, blk_q=64, blk_k=64,
                          interpret=True)
    # compare only non-pad positions (pad rows are don't-care)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               rtol=2e-4, atol=2e-4)


def test_flash_noncausal_matches_oracle(rng):
    b, s, hq, hk, d = 2, 128, 4, 4, 64
    q, k, v = _make(rng, b, s, hq, hk, d)
    mask = np.ones((b, s), np.int32)
    mask[1, 100:] = 0  # right padding (encoder style)
    mask = jnp.asarray(mask)
    ref = attention(q, k, v, padding_bias(mask))
    out = flash_attention(q, k, v, mask, causal=False, blk_q=64, blk_k=64,
                          interpret=True)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               rtol=2e-4, atol=2e-4)


def test_flash_rejects_ragged_blocks(rng):
    q, k, v = _make(rng, 1, 96, 2, 2, 32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, jnp.ones((1, 96), jnp.int32),
                        blk_q=64, blk_k=64, interpret=True)


def test_flash_fully_masked_rows_emit_zeros():
    """A row whose keys are ALL masked must output zeros (advisor finding:
    the online-softmax degenerates to an average of V when every score is
    NEG_INF)."""
    import jax.numpy as jnp
    from rag_serving_system_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    b, s, hq, hk, d = 1, 8, 2, 2, 128
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hk, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hk, d)), dtype=jnp.float32)
    mask = jnp.zeros((b, s), dtype=jnp.int32)  # every key masked
    out = flash_attention(q, k, v, mask, causal=False, blk_q=8, blk_k=8,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
