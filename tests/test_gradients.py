"""Finite-difference gradient verification for representative cells."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sloika_tpu.nn as nn


CELLS = {
    "gru": lambda: nn.Gru(5, 8, init=nn.truncated_normal(0.4), has_bias=True,
                          fused=False),
    "lstm": lambda: nn.Lstm(5, 8, init=nn.truncated_normal(0.4),
                            has_bias=True, has_peep=True),
    # has_peep=True so the peephole leaf is differentiated (without it the
    # zero peepholes are deliberately frozen — test_pallas_lstm covers that)
    "lstm_cifg": lambda: nn.LstmCIFG(5, 8, init=nn.truncated_normal(0.4),
                                     has_bias=True, has_peep=True),
    "genmut": lambda: nn.Genmut(5, 8, init=nn.truncated_normal(0.4),
                                has_bias=True),
    "scrn": lambda: nn.Scrn(5, 6, 4, init=nn.truncated_normal(0.4)),
    "mut2": lambda: nn.Mut2(5, 8, init=nn.truncated_normal(0.4),
                            has_bias=True),
}


@pytest.mark.parametrize("name", sorted(CELLS))
def test_grad_matches_finite_differences(name):
    layer = CELLS[name]()
    params = layer.init(jax.random.PRNGKey(3))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(size=(12, 3, 5)).astype(np.float32))
    # random fixed projection so the loss touches every output
    proj = jnp.asarray(rs.normal(size=(layer.size,)).astype(np.float32))

    def loss(p):
        return jnp.sum(jnp.tanh(layer.apply(p, x)) @ proj)

    grads = jax.grad(loss)(params)
    f64 = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float64), t)
    base = float(loss(params))

    # probe a handful of random coordinates per parameter
    flat, treedef = jax.tree_util.tree_flatten(params)
    gflat = jax.tree_util.tree_leaves(grads)
    eps = 1e-2
    for leaf_idx in range(len(flat)):
        leaf = np.asarray(flat[leaf_idx])
        if leaf.size == 0:
            continue
        for _ in range(2):
            coord = tuple(rs.randint(0, s) for s in leaf.shape)
            bumped = leaf.copy()
            bumped[coord] += eps
            flat2 = list(flat)
            flat2[leaf_idx] = jnp.asarray(bumped)
            lp = float(loss(jax.tree_util.tree_unflatten(treedef, flat2)))
            bumped[coord] -= 2 * eps
            flat2[leaf_idx] = jnp.asarray(bumped)
            lm = float(loss(jax.tree_util.tree_unflatten(treedef, flat2)))
            fd = (lp - lm) / (2 * eps)
            an = float(np.asarray(gflat[leaf_idx])[coord])
            assert an == pytest.approx(fd, rel=0.1, abs=5e-3), \
                "leaf {} coord {}: analytic {} vs fd {}".format(
                    leaf_idx, coord, an, fd)
