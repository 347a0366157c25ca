"""Optimisers.

Exact functional re-implementations of /root/reference/sloika/updates.py:

* :func:`sgd` — SGD with momentum and elementwise +/-clip gradient clipping
  (updates.py:9-33)
* :func:`adamski` — "ADAMski": Adam with momentum phased in from zero at rate
  ``mrate`` (updates.py:36-89).  With ``mrate=None`` it reduces exactly to
  Adam with bias correction.
* :func:`param_sqr` — sum of squared parameters for L2 penalties
  (updates.py:92-103)

Each optimiser is a pair ``(init, update)`` over parameter pytrees;
``update(grads, state, params, lr)`` takes the current learning rate
directly, matching the reference's per-batch ``rate`` input
(train_network.py:289,308).  The reference's step-count semantics are kept
precisely: the momentum factor mixes the *old* count in its first term and
the *new* count elsewhere (updates.py:74-77).
"""
from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np

OptState = namedtuple("OptState", ["count", "mu", "nu"])
SGDState = namedtuple("SGDState", ["vel"])


def param_sqr(params):
    """Sum of squares of all parameters."""
    return sum(jnp.sum(jnp.square(p)) for p in jax.tree_util.tree_leaves(params))


def clip_grad(g, clip):
    return jnp.clip(g, -clip, clip)


def sgd(momentum, clip=5.0):
    """SGD with momentum; returns (init, update)."""
    assert momentum >= 0, "Momentum for SGD must be non-negative"

    def init(params):
        return SGDState(vel=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params, lr):
        def upd(v, g):
            return momentum * v - lr * clip_grad(g, clip)
        vel = jax.tree_util.tree_map(upd, state.vel, grads)
        new_params = jax.tree_util.tree_map(lambda p, v: p + v, params, vel)
        return new_params, SGDState(vel=vel)

    return init, update


def adamski(decay=(0.9, 0.999), epsilon=1e-8, clip=5.0, mrate=0.0005):
    """ADAMski optimiser; returns (init, update).

    :param decay: (decay1, decay2) for gradient and curvature estimates
    :param mrate: rate at which momentum ramps up from zero; None = plain Adam
    """
    d0, d1 = float(decay[0]), float(decay[1])
    assert 0.0 < d0 < 1.0 and 0.0 < d1 < 1.0, "Decay must be in (0, 1)"
    assert mrate is None or mrate > 0.0, \
        "Rate of momentum increase must be positive"

    if mrate is not None:
        m_rate = -np.float32(mrate)
        m_p = np.exp(m_rate, dtype=np.float32)
        m_k = np.float32((1.0 - d0) * d0 * m_p / (1.0 - m_p * d0))
    else:
        m_rate = np.float32(-1e30)
        m_k = np.float32(0.0)
    ld0, ld1 = np.log(d0, dtype=np.float32), np.log(d1, dtype=np.float32)

    def init(params):
        zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
        return OptState(count=jnp.zeros((), jnp.float32),
                        mu=zeros(params), nu=zeros(params))

    def update(grads, state, params, lr):
        t_old = state.count
        t_new = t_old + 1.0
        momentum_factor = (m_k * jnp.expm1(t_old * (ld0 + m_rate))
                           - jnp.expm1(t_new * ld0))
        lr_t = lr * jnp.sqrt(-jnp.expm1(t_new * ld1)) / momentum_factor
        momentum_decay = -d0 * jnp.expm1(t_new * m_rate)

        def upd_mu(m, g):
            return momentum_decay * m + (1.0 - d0) * clip_grad(g, clip)

        def upd_nu(v, g):
            return d1 * v + (1.0 - d1) * jnp.square(clip_grad(g, clip))

        mu = jax.tree_util.tree_map(upd_mu, state.mu, grads)
        nu = jax.tree_util.tree_map(upd_nu, state.nu, grads)
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + epsilon),
            params, mu, nu)
        return new_params, OptState(count=t_new, mu=mu, nu=nu)

    return init, update


def adam(decay=(0.9, 0.999), epsilon=1e-8, clip=5.0):
    """Plain Adam (ADAMski with the momentum ramp disabled)."""
    return adamski(decay=decay, epsilon=epsilon, clip=clip, mrate=None)
