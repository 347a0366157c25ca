"""Layer library tests.

Ports the reference's analytic layer-equivalence tests and the ``LayerTest``
conformance mixin (/root/reference/test/unit/test_layers.py:43-471) to the
functional API: run on zero and random inputs, JSON dump/decode, dump->load
round trip under parameter perturbation, gradient checks.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sloika_tpu import activations
import sloika_tpu.nn as nn

NSTEP, NFEATURES, SIZE, NBATCH = 25, 3, 64, 2


def random_orthonormal(dim, rs):
    """Random sample from SO(dim) via QR."""
    m = rs.normal(size=(dim, dim))
    q, r = np.linalg.qr(m)
    return (q * np.sign(np.diag(r))).astype(np.float32)


@pytest.fixture(scope="module")
def fixtures():
    rs = np.random.RandomState(0xDEADBEEF)
    W = rs.normal(size=(SIZE, NFEATURES)).astype(np.float32)
    b = rs.normal(size=SIZE).astype(np.float32)
    x = rs.normal(size=(NSTEP, NBATCH, NFEATURES)).astype(np.float32)
    res = x.dot(W.T) + b
    return W, b, x, res


def test_single_layer_linear(fixtures):
    W, b, x, res = fixtures
    layer = nn.FeedForward(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    params = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    np.testing.assert_allclose(layer.apply(params, x), res, atol=1e-5)


def test_single_layer_tanh(fixtures):
    W, b, x, res = fixtures
    layer = nn.FeedForward(NFEATURES, SIZE, has_bias=True)
    params = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    np.testing.assert_allclose(layer.apply(params, x), np.tanh(res), atol=1e-5)


def test_parallel_layers(fixtures):
    W, b, x, _ = fixtures
    l1 = nn.FeedForward(NFEATURES, SIZE, has_bias=True)
    l2 = nn.FeedForward(NFEATURES, SIZE, has_bias=True)
    net = nn.Parallel([l1, l2])
    p = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    res = net.apply({"sublayers": (p, p)}, x)
    np.testing.assert_allclose(res[:, :, :SIZE], res[:, :, SIZE:])


def test_simple_serial(fixtures):
    W, b, x, res0 = fixtures
    rs = np.random.RandomState(1)
    W2 = rs.normal(size=(SIZE, SIZE)).astype(np.float32)
    l1 = nn.FeedForward(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    l2 = nn.FeedForward(SIZE, SIZE, fun=activations.linear)
    net = nn.Serial([l1, l2])
    params = {"sublayers": ({"W": jnp.asarray(W), "b": jnp.asarray(b)},
                            {"W": jnp.asarray(W2), "b": jnp.zeros(SIZE)})}
    np.testing.assert_allclose(net.apply(params, x), res0.dot(W2.T),
                               atol=1e-3)


def test_reverse_of_feedforward_is_identity_transform(fixtures):
    W, b, x, _ = fixtures
    l1 = nn.FeedForward(NFEATURES, SIZE, has_bias=True)
    p = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    net = nn.Reverse(l1)
    np.testing.assert_allclose(l1.apply(p, x),
                               net.apply({"sublayer": p}, x), atol=1e-6)


def test_softmax_rows_sum_to_one(fixtures):
    W, b, x, _ = fixtures
    layer = nn.Softmax(NFEATURES, SIZE, has_bias=True)
    params = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    res = layer.apply(params, x)
    np.testing.assert_allclose(np.sum(res, axis=2), 1.0, rtol=1e-5)


def test_rnn_no_state_degenerates_to_feedforward(fixtures):
    W, b, x, res = fixtures
    layer = nn.Recurrent(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    params = {"iW": jnp.asarray(W), "sW": jnp.zeros((SIZE, SIZE)),
              "b": jnp.asarray(b)}
    np.testing.assert_allclose(layer.apply(params, x), res, atol=1e-5)


def test_rnn_no_input(fixtures):
    _, _, x, _ = fixtures
    rs = np.random.RandomState(2)
    params = {"iW": jnp.zeros((SIZE, NFEATURES)),
              "sW": jnp.asarray(rs.normal(size=(SIZE, SIZE)).astype(np.float32)),
              "b": jnp.zeros(SIZE)}
    layer = nn.Recurrent(NFEATURES, SIZE)
    np.testing.assert_allclose(layer.apply(params, x), 0.0)


def test_rnn_no_input_with_bias_unrolled(fixtures):
    _, b, x, _ = fixtures
    rs = np.random.RandomState(3)
    sW = random_orthonormal(SIZE, rs)
    layer = nn.Recurrent(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    params = {"iW": jnp.zeros((SIZE, NFEATURES)), "sW": jnp.asarray(sW),
              "b": jnp.asarray(b)}
    res = np.asarray(layer.apply(params, x))
    expect = np.zeros((NBATCH, SIZE), dtype=np.float32)
    for i in range(NSTEP):
        expect = expect.dot(sW.T) + b
        np.testing.assert_allclose(res[i], expect, atol=1e-4)


def test_birnn_symmetry(fixtures):
    _, b, x, _ = fixtures
    rs = np.random.RandomState(4)
    sW = rs.normal(size=(SIZE, SIZE)).astype(np.float32)
    p = {"iW": jnp.zeros((SIZE, NFEATURES)), "sW": jnp.asarray(sW),
         "b": jnp.asarray(b)}
    l1 = nn.Recurrent(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    l2 = nn.Recurrent(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    net = nn.birnn(l1, l2)
    params = {"sublayers": (p, {"sublayer": p})}
    res = np.asarray(net.apply(params, x))
    np.testing.assert_allclose(res[:, :, :SIZE], res[::-1, :, SIZE:], atol=1e-5)


def test_window_contents(fixtures):
    _, _, x, _ = fixtures
    WINLEN = 3
    layer = nn.Window(NFEATURES, WINLEN)
    res = np.asarray(layer.apply({}, x))
    wh = WINLEN // 2
    inner = res[wh:-wh]
    for i in range(WINLEN):
        np.testing.assert_allclose(
            inner[:, :, i * NFEATURES:(i + 1) * NFEATURES],
            x[i:NSTEP - WINLEN + 1 + i])
    # first and last rows: zero-padded window contents
    np.testing.assert_allclose(res[0, :, :NFEATURES], 0.0)
    np.testing.assert_allclose(res[0, :, NFEATURES:], x[:2].transpose(1, 0, 2).reshape(NBATCH, -1))
    np.testing.assert_allclose(res[-1, :, 2 * NFEATURES:], 0.0)


def test_studentise_moments(fixtures):
    _, _, x, _ = fixtures
    layer = nn.Studentise(NFEATURES)
    res = np.asarray(layer.apply({}, x))
    np.testing.assert_allclose(np.mean(res, axis=(0, 1)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.std(res, axis=(0, 1)), 1.0, atol=1e-4)


def test_identity(fixtures):
    _, _, x, _ = fixtures
    layer = nn.Identity(NFEATURES)
    np.testing.assert_allclose(layer.apply({}, x), x)


def test_simple_derivative(fixtures):
    W, _, x, _ = fixtures
    layer = nn.FeedForward(NFEATURES, SIZE, fun=activations.linear)
    params = {"W": jnp.asarray(W), "b": jnp.zeros(SIZE)}
    grads = jax.grad(lambda p: jnp.sum(layer.apply(p, x)))(params)
    analytic = np.sum(x, axis=(0, 1))
    for i in range(SIZE):
        np.testing.assert_allclose(grads["W"][i], analytic, rtol=1e-4)


def test_derivative_with_bias(fixtures):
    W, b, x, _ = fixtures
    layer = nn.FeedForward(NFEATURES, SIZE, has_bias=True, fun=activations.linear)
    params = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    grads = jax.grad(lambda p: jnp.sum(layer.apply(p, x)))(params)
    np.testing.assert_allclose(grads["b"], NBATCH * NSTEP, rtol=1e-5)


def test_lstm_gradient_runs(fixtures):
    _, _, x, _ = fixtures
    layer = nn.Lstm(NFEATURES, SIZE, has_bias=True, has_peep=True)
    params = layer.init(jax.random.PRNGKey(0))
    grads = jax.grad(lambda p: jnp.sum(layer.apply(p, x)))(params)
    assert grads["iW"].shape == (4, SIZE, NFEATURES)
    assert np.all(np.isfinite(np.asarray(grads["iW"])))


def test_reverse_rnn_equals_flip_run_flip(fixtures):
    """Reverse of a scan must equal the reference's flip-run-flip."""
    _, _, x, _ = fixtures
    layer = nn.Gru(NFEATURES, 16, init=nn.truncated_normal(0.3), has_bias=True)
    params = layer.init(jax.random.PRNGKey(42))
    rev = nn.Reverse(layer)
    out1 = rev.apply({"sublayer": params}, x)
    out2 = layer.apply(params, x[::-1])[::-1]
    np.testing.assert_allclose(out1, out2, atol=1e-6)


# ---------------------------------------------------------------------------
# Conformance suite: every layer must run, serialise and round-trip.
# ---------------------------------------------------------------------------

def _make_cases():
    tn = nn.truncated_normal(0.5)
    return {
        "recurrent": nn.Recurrent(12, 64, init=tn),
        "recurrent_bias": nn.Recurrent(12, 64, init=tn, has_bias=True),
        "lstm": nn.Lstm(12, 64, init=tn),
        "lstm_full": nn.Lstm(12, 64, init=tn, has_bias=True, has_peep=True),
        "lstm_cifg": nn.LstmCIFG(12, 64, init=tn),
        "lstm_o": nn.LstmO(12, 64, init=tn),
        "forget": nn.Forget(12, 64, init=tn, has_bias=True),
        "mut1": nn.Mut1(12, 64, init=tn),
        "mut2": nn.Mut2(12, 64, init=tn),
        "mut3": nn.Mut3(12, 64, init=tn),
        "gru": nn.Gru(12, 64, init=tn),
        "gru_bias": nn.Gru(12, 64, init=tn, has_bias=True),
        "scrn": nn.Scrn(12, 48, 16, init=tn),
        "genmut": nn.Genmut(12, 64, init=tn),
        "convolution": nn.Convolution(12, 32, 11, 5, init=tn, has_bias=True),
        "maxpool": nn.MaxPool(12, 5, 5),
        "window": nn.Window(12, 3),
        "feedforward": nn.FeedForward(12, 64, init=tn, has_bias=True),
        "softmax": nn.Softmax(12, 64, init=tn, has_bias=True),
        "softmax_theano": nn.SoftmaxTheano(12, 64, init=tn, has_bias=True),
        "studentise": nn.Studentise(12),
        "normaliseL1": nn.NormaliseL1(12),
        "identity": nn.Identity(12),
    }


CASES = _make_cases()


@pytest.mark.parametrize("name", sorted(CASES))
def test_conformance_run(name):
    layer = CASES[name]
    params = layer.init(jax.random.PRNGKey(7))
    for x in [np.zeros((10, 4, 12), dtype=np.float32),
              np.random.RandomState(0).uniform(size=(10, 4, 12)).astype(np.float32)]:
        out = np.asarray(layer.apply(params, x))
        assert out.shape[1] == 4
        assert out.shape[2] == layer.size
        assert np.all(np.isfinite(out))


@pytest.mark.parametrize("name", sorted(CASES))
def test_conformance_json_roundtrip(name):
    layer = CASES[name]
    params = layer.init(jax.random.PRNGKey(11))
    # structure-only dump must be valid JSON
    js = json.dumps(layer.to_json())
    json.loads(js)
    # full dump -> load must reproduce both structure and behaviour
    js_full = json.dumps(layer.to_json(params))
    layer2, params2 = nn.from_json(json.loads(js_full))
    assert layer2.size == layer.size
    x = np.random.RandomState(1).uniform(size=(10, 4, 12)).astype(np.float32)
    out1 = np.asarray(layer.apply(params, x))
    out2 = np.asarray(layer2.apply(params2, x))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


@pytest.mark.parametrize("name", sorted(CASES))
def test_conformance_properties(name):
    layer = CASES[name]
    assert isinstance(layer.insize, int)
    assert isinstance(layer.size, int)
    assert isinstance(layer.name, str)


def test_convolution_output_length():
    layer = nn.Convolution(1, 8, 11, 5, init=nn.truncated_normal(0.5))
    params = layer.init(jax.random.PRNGKey(0))
    x = np.zeros((2000, 3, 1), dtype=np.float32)
    out = layer.apply(params, x)
    assert out.shape == (400, 3, 8)  # ceil(2000/5) with 'same' padding
    assert layer.output_length(2000) == 400


def test_decode_layer_matches_numpy_oracle():
    """The in-graph forward-Viterbi layer's running scores must equal the
    numpy oracle's forward DP on log-softmaxed logits (the repo invariant:
    every device DP has a numpy oracle and a parity test)."""
    import numpy as np
    from sloika_tpu import nn
    from sloika_tpu.variables import nstate, nkmer

    k, skip_pen = 3, 1.5
    rs = np.random.RandomState(3)
    T, B = 11, 2
    x = rs.normal(size=(T, B, nstate(k))).astype(np.float32)
    layer = nn.Decode(k, skip_pen=skip_pen)
    out = np.asarray(layer.apply({}, jnp.asarray(x)))

    # numpy oracle: same max-plus forward recursion
    lp = x - np.log(np.sum(np.exp(x), axis=2, keepdims=True))
    K, n = nkmer(k), 4
    for b in range(B):
        v = lp[0, b, 1:]
        np.testing.assert_allclose(out[0, b], v, rtol=1e-5)
        for t in range(1, T):
            step_s = np.repeat(np.max(v.reshape(n, K // n), axis=0), n)
            skip_s = np.repeat(np.max(v.reshape(n * n, K // (n * n)),
                                      axis=0), n * n) - skip_pen
            v = np.maximum(lp[t, b, 1:] + np.maximum(step_s, skip_s),
                           v + lp[t, b, 0])
            np.testing.assert_allclose(out[t, b], v, rtol=1e-5, atol=1e-5)

    with pytest.raises(AssertionError):
        nn.Decode(2)
