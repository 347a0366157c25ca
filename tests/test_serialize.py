"""Serialisation round-trips across the model zoo."""
import jax
import numpy as np
import pytest

from sloika_tpu import serialize
from sloika_tpu.models import REGISTRY, build

ZOO = sorted({name for name in REGISTRY if "." not in name})


def _build(name):
    kwargs = dict(klen=4, sd=0.4)
    if "raw" in name:
        kwargs.update(nfeature=1, winlen=11,
                      stride=5 if "rgrgr" in name else 2)
    else:
        kwargs.update(nfeature=4, winlen=3, stride=1)
    return build(name, **kwargs)


@pytest.mark.parametrize("name", ZOO)
def test_checkpoint_roundtrip(name, tmp_path):
    layer = _build(name)
    params = layer.init(jax.random.PRNGKey(1))
    path = str(tmp_path / (name + ".npz"))
    serialize.save_checkpoint(path, layer, params)
    layer2, params2, opt = serialize.load_checkpoint(path)
    assert opt is None
    x = np.random.RandomState(0).normal(
        size=(40, 2, layer.insize)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)),
                               np.asarray(layer2.apply(params2, x)),
                               atol=1e-6)


@pytest.mark.parametrize("name", ZOO)
def test_model_json_roundtrip(name, tmp_path):
    layer = _build(name)
    params = layer.init(jax.random.PRNGKey(2))
    path = str(tmp_path / (name + ".json"))
    serialize.save_model_json(path, layer, params)
    layer2, params2 = serialize.load_model_json(path)
    x = np.random.RandomState(1).normal(
        size=(40, 2, layer.insize)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)),
                               np.asarray(layer2.apply(params2, x)),
                               atol=1e-6)


def test_checkpoint_with_opt_state_roundtrip(tmp_path):
    from sloika_tpu import optim
    layer = _build("tiny_gru")
    params = layer.init(jax.random.PRNGKey(3))
    opt_init, opt_update = optim.adamski()
    state = opt_init(params)
    import jax.numpy as jnp
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    params2, state = opt_update(grads, state, params, jnp.float32(1e-3))
    path = str(tmp_path / "ck.npz")
    serialize.save_checkpoint(path, layer, params2, state,
                              meta={"iteration": 1})
    _, p3, s3 = serialize.load_checkpoint(path)
    assert float(s3.count) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(state.mu),
                    jax.tree_util.tree_leaves(s3.mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
