"""Fused Pallas LSTM parity tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sloika_tpu.nn as nn
from sloika_tpu.nn import pallas_lstm


def _make(peep):
    layer = nn.Lstm(8, 16, init=nn.truncated_normal(0.4), has_bias=True,
                    has_peep=peep)
    params = layer.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.RandomState(1).normal(
        size=(30, 4, 8)).astype(np.float32))
    return layer, params, x


@pytest.fixture(scope="module")
def lstm():
    return _make(peep=True)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_matches_scan(lstm, reverse):
    layer, params, x = lstm
    ref = layer.apply(params, x, reverse=reverse)
    out = pallas_lstm.run_lstm_fused(params, layer.input_proj(params, x),
                                     reverse=reverse)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-6)


def test_fused_masked(lstm):
    layer, params, x = lstm
    mask = jnp.asarray(np.arange(30)[:, None]
                       < np.array([20, 30, 11, 25])[None, :])
    ref = layer.apply(params, x, reverse=True, mask=mask)
    out = pallas_lstm.run_lstm_fused(params, layer.input_proj(params, x),
                                     reverse=True, mask=mask)
    d = np.abs(np.asarray(ref - out)) * np.asarray(mask)[:, :, None]
    assert d.max() < 1e-6


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("peep", [True, False])
def test_fused_gradients_match_scan(peep, reverse):
    layer, params, x = _make(peep)

    def loss_fused(p):
        return jnp.sum(pallas_lstm.run_lstm_fused(
            p, layer.input_proj(p, x), reverse=reverse,
            has_peep=peep) ** 2)

    def loss_ref(p):
        return jnp.sum(layer.apply(p, x, reverse=reverse) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   atol=1e-4, err_msg=k)
    if not peep:
        assert np.all(np.asarray(g1["p"]) == 0.0)


def test_fused_masked_gradients(lstm):
    layer, params, x = lstm
    mask = jnp.asarray(np.arange(30)[:, None]
                       < np.array([20, 30, 11, 25])[None, :])
    sel = jnp.asarray(np.asarray(mask)[:, :, None].astype(np.float32))

    def loss_fused(p):
        out = pallas_lstm.run_lstm_fused(p, layer.input_proj(p, x),
                                         reverse=True, mask=mask)
        return jnp.sum((out * sel) ** 2)

    def loss_ref(p):
        return jnp.sum((layer.apply(p, x, reverse=True, mask=mask) * sel) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   atol=1e-4, err_msg=k)


def test_fused_flag_in_layer(lstm):
    layer, params, x = lstm
    fused_layer = nn.Lstm(8, 16, has_bias=True, has_peep=True, fused=True)
    plain = layer.apply(params, x)
    fused = fused_layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(fused),
                               atol=1e-6)


def test_scan_peep_gradient_frozen_without_has_peep():
    """Regression: has_peep=False must not leak gradients into the zero
    peephole weights (the optimiser would silently train them)."""
    layer, params, x = _make(peep=False)
    g = jax.grad(lambda p: jnp.sum(layer.apply(p, x) ** 2))(params)
    assert np.all(np.asarray(g["p"]) == 0.0)


def test_batch_blocked_matches_single_block(lstm):
    """Batch blocking (grid=(nB, T)) is exact for forward and gradients."""
    layer, params, x = lstm
    xp = layer.input_proj(params, x)
    mask = jnp.ones(x.shape[:2], jnp.int8)
    S = params["p"].shape[1]
    sWT = params["sW"].reshape(4 * S, S).T
    p = params["p"]

    h1, c1 = pallas_lstm._pallas_scan(xp, mask, sWT, p, False)
    h2, c2 = pallas_lstm._pallas_scan(xp, mask, sWT, p, False, block=2)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)

    g = jnp.ones_like(h1)
    d1 = pallas_lstm._pallas_scan_bwd(xp, mask, sWT, p, False, g, h1, c1)
    d2 = pallas_lstm._pallas_scan_bwd(xp, mask, sWT, p, False, g, h2, c2,
                                      block=2)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
