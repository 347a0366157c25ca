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
