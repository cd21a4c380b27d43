import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grove_tpu.ops.attention import (flash_attention, multi_head_attention,
                                     xla_attention)


def _rand_qkv(rng, b, s, h, d, sk=None):
    sk = sk or s
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    v = rng.normal(size=(b, sk, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_xla_attention_matches_manual(rng):
    q, k, v = _rand_qkv(rng, 2, 5, 3, 4)
    out = np.asarray(xla_attention(q, k, v))
    # manual per-head softmax attention
    qn, kn, vn = map(np.asarray, (q, k, v))
    for b in range(2):
        for h in range(3):
            logits = qn[b, :, h] @ kn[b, :, h].T / np.sqrt(4)
            p = np.exp(logits - logits.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            np.testing.assert_allclose(out[b, :, h], p @ vn[b, :, h],
                                       rtol=1e-4, atol=1e-5)


def test_xla_attention_causal_masks_future(rng):
    q, k, v = _rand_qkv(rng, 1, 6, 2, 4)
    out = xla_attention(q, k, v, causal=True)
    # first position only sees itself -> equals v normalized weight 1
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.asarray(v)[0, 0],
                               rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s,block", [(64, 16), (96, 32)])
def test_flash_matches_xla(rng, causal, s, block):
    q, k, v = _rand_qkv(rng, 2, s, 2, 8)
    want = np.asarray(xla_attention(q, k, v, causal=causal))
    got = np.asarray(flash_attention(q, k, v, causal=causal,
                                     block_q=block, block_k=block))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_causal_ragged_q(rng):
    # sq not a multiple of block_q exercises q padding
    q, k, v = _rand_qkv(rng, 1, 50, 2, 8)
    want = np.asarray(xla_attention(q, k, v, causal=True))
    got = np.asarray(flash_attention(q, k, v, causal=True,
                                     block_q=16, block_k=16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_cross_attention_longer_kv(rng):
    q, k, v = _rand_qkv(rng, 1, 32, 2, 8, sk=64)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=16, block_k=16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mha_bias_and_mask(rng):
    q, k, v = _rand_qkv(rng, 1, 4, 2, 4)
    bias = jnp.asarray(rng.normal(size=(1, 2, 4, 4)).astype(np.float32))
    mask = jnp.ones((1, 1, 4, 4), bool).at[:, :, :, -1].set(False)
    out = multi_head_attention(q, k, v, bias=bias, mask=mask)
    assert out.shape == q.shape
    # masked key contributes nothing: perturbing v[-1] leaves output unchanged
    v2 = v.at[:, -1].add(100.0)
    out2 = multi_head_attention(q, k, v2, bias=bias, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_grouped_plain_matches_xla_ragged(rng):
    """Grouped full-softmax kernel == XLA on a ragged (non-8-multiple) S:
    padded keys masked, padded query rows sliced off, grads match."""
    from grove_tpu.ops.attention import (_grouped_plain_with_vjp,
                                         grouped_plain_attention)

    q, k, v = _rand_qkv(rng, 2, 37, 4, 16)
    want = np.asarray(xla_attention(q, k, v))
    got = np.asarray(grouped_plain_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    scale = 1.0 / np.sqrt(16)

    def loss_g(q, k, v):
        return jnp.sum(_grouped_plain_with_vjp(q, k, v, scale) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale=scale) ** 2)

    g1 = jax.grad(loss_g, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_prefill_raw_matches_xla_causal_pad(rng):
    """Raw-layout one-pass prefill kernel == XLA with the serving mask
    (causal + left-pad slots masked except self-attention), and the
    trainable wrapper's grads match the XLA recompute path."""
    from grove_tpu.ops.attention import (prefill_attention_raw,
                                         prefill_attention_trainable)

    b, s, h, d = 2, 24, 4, 16
    q, k, v = _rand_qkv(rng, b, s, h, d)
    pad = jnp.asarray([0, 5], jnp.int32)

    kidx = jnp.arange(s)[None, None, None, :]
    qidx = jnp.arange(s)[None, None, :, None]
    mask = (kidx <= qidx) & ((kidx >= pad[:, None, None, None])
                             | (kidx == qidx))
    want = np.asarray(xla_attention(q, k, v, mask=mask))

    got = np.asarray(prefill_attention_raw(
        q.reshape(b, s, -1), k.reshape(b, s, -1), v.reshape(b, s, -1),
        pad, h, float(1.0 / np.sqrt(d)))).reshape(b, s, h, d)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    scale = float(1.0 / np.sqrt(d))

    def loss_raw(q, k, v):
        return jnp.sum(prefill_attention_trainable(
            q.reshape(b, s, -1), k.reshape(b, s, -1),
            v.reshape(b, s, -1), h, scale) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True,
                                     scale=scale) ** 2)

    g1 = jax.grad(loss_raw, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=5e-4)
