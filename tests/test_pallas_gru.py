"""Fused Pallas GRU parity tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sloika_tpu.nn as nn
from sloika_tpu.nn import pallas_gru


@pytest.fixture(scope="module")
def gru():
    layer = nn.Gru(8, 16, init=nn.truncated_normal(0.4), has_bias=True)
    params = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(30, 4, 8)).astype(np.float32))
    return layer, params, x


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_matches_scan(gru, reverse):
    layer, params, x = gru
    ref = layer.apply(params, x, reverse=reverse)
    out = pallas_gru.run_gru_fused(params, layer.input_proj(params, x),
                                   reverse=reverse)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)


def test_fused_masked(gru):
    layer, params, x = gru
    mask = jnp.asarray(np.arange(30)[:, None]
                       < np.array([20, 30, 11, 25])[None, :])
    ref = layer.apply(params, x, reverse=True, mask=mask)
    out = pallas_gru.run_gru_fused(params, layer.input_proj(params, x),
                                   reverse=True, mask=mask)
    d = np.abs(np.asarray(ref - out)) * np.asarray(mask)[:, :, None]
    assert d.max() < 1e-6


def test_fused_gradients_match_scan(gru):
    layer, params, x = gru

    def loss_fused(p):
        return jnp.sum(pallas_gru.run_gru_fused(
            p, layer.input_proj(p, x)) ** 2)

    def loss_ref(p):
        return jnp.sum(layer.apply(p, x) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   atol=1e-4)


def test_fused_flag_in_layer(gru):
    layer, params, x = gru
    fused_layer = nn.Gru(8, 16, has_bias=True, fused=True)
    plain = layer.apply(params, x)
    fused = fused_layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(fused),
                               atol=1e-6)


def test_fused_masked_gradients_match_scan(gru):
    """VJP through masked (variable-length) fused runs must match the scan."""
    layer, params, x = gru
    mask = jnp.asarray(np.arange(30)[:, None]
                       < np.array([20, 30, 11, 25])[None, :])

    def loss_fused(p):
        out = pallas_gru.run_gru_fused(p, layer.input_proj(p, x),
                                       reverse=True, mask=mask)
        return jnp.sum((out * mask[:, :, None]) ** 2)

    def loss_ref(p):
        out = layer.apply(p, x, reverse=True, mask=mask)
        return jnp.sum((out * mask[:, :, None]) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   atol=1e-4)


def test_batch_blocked_matches_single_block(gru):
    """Batch blocking (grid=(nB, T)) is exact: forward and gradients at
    block 2 over batch 4 match the single-block kernel and the XLA scan."""
    layer, params, x = gru
    xp = layer.input_proj(params, x)
    mask = jnp.ones(x.shape[:2], jnp.int8)
    S = params["sW2"].shape[0]
    sWT = params["sW"].reshape(2 * S, S).T
    sW2T = params["sW2"].T

    one = pallas_gru._pallas_scan(xp, mask, sWT, sW2T, False,
                                  jax.lax.Precision.HIGHEST)
    blocked = pallas_gru._pallas_scan(xp, mask, sWT, sW2T, False,
                                      jax.lax.Precision.HIGHEST, block=2)
    np.testing.assert_allclose(np.asarray(one), np.asarray(blocked),
                               atol=1e-6)

    g = jnp.ones_like(one)
    d1 = pallas_gru._pallas_scan_bwd(xp, mask, sWT, sW2T, False, g, one,
                                     jax.lax.Precision.HIGHEST)
    d2 = pallas_gru._pallas_scan_bwd(xp, mask, sWT, sW2T, False, g, blocked,
                                     jax.lax.Precision.HIGHEST, block=2)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batch_block_divisor():
    assert pallas_gru._batch_block(100) == 100
    assert pallas_gru._batch_block(512) == 512
    assert pallas_gru._batch_block(2048) == 512
    assert pallas_gru._batch_block(768) == 384
    assert pallas_gru._batch_block(509) == 509   # fits one block
    # prime > limit: no usable divisor -> full-width blocks + padding
    assert pallas_gru._batch_block(521) == 512


def test_batch_padded_matches_unpadded(gru):
    """A batch with no usable block divisor is zero-padded to a block
    multiple (padded rows masked out) — results identical to unblocked."""
    layer, params, x4 = gru
    x = jnp.concatenate([x4, x4[:, :1]], axis=1)       # B=5 (no divisor of
    assert pallas_gru._batch_block(5, 3) == 3          # 5 in [2, 3])
    xp = layer.input_proj(params, x)
    mask = jnp.ones(x.shape[:2], jnp.int8)
    S = params["sW2"].shape[0]
    sWT = params["sW"].reshape(2 * S, S).T
    sW2T = params["sW2"].T

    one = pallas_gru._pallas_scan(xp, mask, sWT, sW2T, False,
                                  jax.lax.Precision.HIGHEST)
    padded = pallas_gru._pallas_scan(xp, mask, sWT, sW2T, False,
                                     jax.lax.Precision.HIGHEST, block=3)
    assert padded.shape == one.shape
    np.testing.assert_allclose(np.asarray(one), np.asarray(padded),
                               atol=1e-6)

    g = jnp.ones_like(one)
    d1 = pallas_gru._pallas_scan_bwd(xp, mask, sWT, sW2T, False, g, one,
                                     jax.lax.Precision.HIGHEST)
    d2 = pallas_gru._pallas_scan_bwd(xp, mask, sWT, sW2T, False, g, padded,
                                     jax.lax.Precision.HIGHEST, block=3)
    for a, b in zip(d1, d2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
