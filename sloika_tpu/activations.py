"""Activation functions.

The full zoo from /root/reference/sloika/activation.py:1-116 re-expressed in
jax.numpy.  Functions are referenced *by name* in the JSON model interchange
format (reference layers.py:141 uses ``fun.__name__``), so names here must
match the reference exactly.

Three families:
  * unbounded:             linear, relu, relu_smooth, softplus, elu, exp
  * bounded, monotone:     tanh, sigmoid, erf, L1mL2, fair, retu, tanh_pm,
                           sigmoid_pm, bounded_linear
  * bounded, redescending: sin, cauchy, geman_mcclure, welsh
"""
import jax
import jax.numpy as jnp


#  Unbounded

def linear(x):
    return x


def relu(x):
    return jnp.maximum(x, 0.0)


def relu_smooth(x):
    y = jnp.clip(x, 0.0, 1.0)
    return jnp.square(y) - 2.0 * y + x + jnp.abs(x)


def softplus(x):
    """log(1 + exp(x)) computed stably for large |x|.

    Equivalent to relu(x) + log1p(exp(-|x|)) (reference activation.py:21-35).
    """
    return relu(x) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def elu(x):
    # expm1 must only see non-positive inputs: evaluated at a large positive
    # x (the unselected where branch) it overflows to inf and the where VJP's
    # 0 * inf poisons the whole gradient with NaN.  Observed fine-tuning on a
    # bundled read with a -54 MAD signal glitch.
    # (inner where, not minimum(x, 0): minimum's tie at x == 0 halves the
    # gradient there; the double-where keeps d elu/dx(0) == 1 exactly)
    pos = x > 0
    return jnp.where(pos, x, jnp.expm1(jnp.where(pos, 0.0, x)))


def exp(x):
    return jnp.exp(x)


#  Bounded and monotonic

def tanh(x):
    return jnp.tanh(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def erf(x):
    return jax.lax.erf(x)


def L1mL2(x):
    return x / jnp.sqrt(1.0 + 0.5 * jnp.square(x))


def fair(x):
    return x / (1.0 + jnp.abs(x) / 1.3998)


def retu(x):
    """Rectify then tanh."""
    return jnp.tanh(relu(x))


def tanh_pm(x):
    """Poor man's tanh: linear approximation clipped to the valid range."""
    return jnp.clip(x, -1.0, 1.0)


def sigmoid_pm(x):
    """Poor man's sigmoid: linear approximation clipped to the valid range."""
    return jnp.clip(0.5 + 0.25 * x, 0.0, 1.0)


def bounded_linear(x):
    return jnp.clip(x, -1.0, 1.0)


#  Bounded and redescending

def sin(x):
    return jnp.sin(x)


def cauchy(x):
    return x / (1.0 + jnp.square(x / 2.3849))


def geman_mcclure(x):
    return x / jnp.square(1.0 + jnp.square(x))


def welsh(x):
    return x * jnp.exp(-jnp.square(x / 2.9846))


_ALL = [linear, relu, relu_smooth, softplus, elu, exp,
        tanh, sigmoid, erf, L1mL2, fair, retu, tanh_pm, sigmoid_pm,
        bounded_linear, sin, cauchy, geman_mcclure, welsh]

#: name -> function, for JSON (de)serialisation
BY_NAME = {f.__name__: f for f in _ALL}


def by_name(name):
    """Look up an activation by its reference name."""
    return BY_NAME[name]
