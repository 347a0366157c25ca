"""Non-recurrent layers.

TPU-native equivalents of the non-recurrent layer zoo in
/root/reference/sloika/layers.py (Identity :91, FeedForward :114,
Studentise :161, NormaliseL1 :192, SoftmaxTheano :222, Softmax :268,
Window :317, Convolution :354, MaxPool :422).  Semantics (including
initialisation scaling) match the reference; implementation is pure JAX.
"""
import jax.numpy as jnp
import numpy as np

from sloika_tpu import activations
from sloika_tpu.config import jax_dtype
from sloika_tpu.nn.core import (Layer, register, zeros_init, affine,
                                activation_name, activation_from_name)
from sloika_tpu.ops import conv as convops


@register("identity")
class Identity(Layer):
    def __init__(self, insize, name="Identity"):
        self._insize = insize
        self._size = insize
        self._name = name

    def init(self, key):
        return {}

    def apply(self, params, x):
        return x

    def _json_config(self):
        return {"insize": self.insize}

    @classmethod
    def _from_json(cls, obj):
        return cls(obj.get("insize", 0)), {}


class _Affine(Layer):
    """Shared implementation of FeedForward / Softmax-style layers."""

    def __init__(self, insize, size, init=zeros_init, has_bias=False,
                 fun=activations.linear, name="Affine"):
        self._insize = insize
        self._size = size
        self._name = name
        self.has_bias = has_bias
        self.fun = fun
        self._init = init

    def init(self, key):
        import jax
        kW, kb = jax.random.split(key)
        W = self._init(kW, (self.size, self.insize)) / np.sqrt(self.size + self.insize)
        b = (self._init(kb, (self.size,)) if self.has_bias
             else jnp.zeros((self.size,), jax_dtype))
        return {"W": W, "b": b}

    def _preact(self, params, x):
        return affine(x, params["W"], params["b"])

    def _json_config(self):
        return {"size": self.size, "insize": self.insize, "bias": self.has_bias}

    @classmethod
    def _from_json(cls, obj):
        kwargs = {}
        if "activation" in obj and cls is FeedForward:
            kwargs["fun"] = activation_from_name(obj["activation"])
        layer = cls(obj["insize"], obj["size"], has_bias=obj.get("bias", False),
                    **kwargs)
        params = layer._params_from_json(obj["params"]) if "params" in obj else None
        return layer, params


@register("feed-forward")
class FeedForward(_Affine):
    """``out = f(x W^T + b)`` (reference layers.py:114-158)."""

    def __init__(self, insize, size, init=zeros_init, has_bias=False,
                 fun=activations.tanh, name="Feed-forward"):
        super().__init__(insize, size, init=init, has_bias=has_bias,
                         fun=fun, name=name)

    def apply(self, params, x):
        return self.fun(self._preact(params, x))

    def _json_config(self):
        return {"activation": activation_name(self.fun), **super()._json_config()}


@register("softmax_old")
class Softmax(_Affine):
    """Affine followed by max-shifted softmax (reference layers.py:268-314;
    JSON type ``softmax_old``)."""

    def __init__(self, insize, size, init=zeros_init, has_bias=False,
                 name="Softmax"):
        super().__init__(insize, size, init=init, has_bias=has_bias,
                         name=name)

    def apply(self, params, x):
        tmp = self._preact(params, x)
        m = jnp.max(tmp, axis=2, keepdims=True)
        out = jnp.exp(tmp - m)
        return out / jnp.sum(out, axis=2, keepdims=True)


@register("softmax")
class SoftmaxTheano(Softmax):
    """Same math as :class:`Softmax`; kept as a distinct JSON type for
    interchange with reference dumps (layers.py:222-265)."""


@register("studentise")
class Studentise(Layer):
    """Normalise each feature over the (time, batch) axes
    (reference layers.py:161-189)."""

    def __init__(self, insize, epsilon=1e-4, name="Studentise"):
        self._insize = insize
        self._size = insize
        self._name = name
        self.epsilon = epsilon

    def init(self, key):
        return {}

    def apply(self, params, x):
        m = jnp.mean(x, axis=(0, 1), keepdims=True)
        v = jnp.var(x, axis=(0, 1), keepdims=True)
        return (x - m) / jnp.sqrt(v + self.epsilon)

    def apply_with_lengths(self, params, x, lengths):
        raise NotImplementedError(
            "Studentise mixes statistics across the whole batch and is not "
            "defined for padded variable-length batches")

    def _json_config(self):
        return {"insize": self.insize}

    @classmethod
    def _from_json(cls, obj):
        return cls(obj.get("insize", 0)), {}


@register("normaliseL1")
class NormaliseL1(Layer):
    """Divide by the L1 norm over features (reference layers.py:192-219)."""

    def __init__(self, insize, epsilon=1e-4, name="Normalise"):
        self._insize = insize
        self._size = insize
        self._name = name
        self.epsilon = epsilon

    def init(self, key):
        return {}

    def apply(self, params, x):
        f = self.epsilon + jnp.sum(jnp.abs(x), axis=2, keepdims=True)
        return x / f

    def _json_config(self):
        return {"insize": self.insize}

    @classmethod
    def _from_json(cls, obj):
        return cls(obj.get("insize", 0)), {}


@register("window")
class Window(Layer):
    """Sliding window of odd width ``w`` over time; zero-padded so output
    length equals input length.  Output features are the window contents
    ordered earliest-to-latest (reference layers.py:317-351).
    """

    def __init__(self, insize, w, name="Window"):
        assert w > 0, "Window size must be positive"
        assert w % 2 == 1, "Window size should be odd"
        self._insize = insize
        self._size = w * insize
        self._name = name
        self.w = w

    def init(self, key):
        return {}

    def apply(self, params, x):
        pad = self.w // 2
        xp = jnp.pad(x, ((pad, pad), (0, 0), (0, 0)))
        ntime = x.shape[0]
        slices = [xp[i:i + ntime] for i in range(self.w)]
        return jnp.concatenate(slices, axis=2)

    def _json_config(self):
        return {"w": self.w, "insize": self.insize}

    @classmethod
    def _from_json(cls, obj):
        w = obj.get("w", obj.get("params", {}).get("w", 3))
        return cls(obj["insize"], int(w)), {}


@register("convolution")
class Convolution(Layer):
    """1-D temporal convolution, stride and padding modes per the reference
    (layers.py:354-419); lowered to XLA's native convolution.
    """

    def __init__(self, insize, size, winlen, stride=1, init=zeros_init,
                 has_bias=False, fun=activations.tanh, padding_mode='same',
                 name="Convolution"):
        self._insize = insize
        self._size = size
        self._name = name
        self.winlen = winlen
        self.stride = stride
        self.fun = fun
        self.has_bias = has_bias
        self.padding_mode = padding_mode
        self.padding = convops.calculate_padding(padding_mode, winlen)
        self._init = init

    def init(self, key):
        import jax
        kW, kb = jax.random.split(key)
        fanin = self.insize * self.winlen
        fanout = (self.size * self.winlen) / float(self.stride)
        W = self._init(kW, (self.size, self.insize, self.winlen)) / np.sqrt(fanin + fanout)
        b = (self._init(kb, (self.size,)) if self.has_bias
             else jnp.zeros((self.size,), jax_dtype))
        return {"W": W, "b": b}

    def apply(self, params, x):
        c = convops.conv_1d(x, params["W"], self.stride, self.padding) + params["b"]
        return self.fun(c)

    def output_length(self, ntime):
        return 1 + (ntime + sum(self.padding) - self.winlen) // self.stride

    def apply_with_lengths(self, params, x, lengths):
        # Zero tail padding reproduces each sequence's own 'same'-style zero
        # extension, so frames within the per-sequence output length are
        # exact; later layers mask beyond it.
        out = self.apply(params, x)
        out_lengths = 1 + (lengths + sum(self.padding) - self.winlen) // self.stride
        return out, out_lengths

    def _json_config(self):
        return {"insize": self.insize, "size": self.size,
                "winlen": self.winlen, "stride": self.stride,
                "padding_mode": self.padding_mode,
                "padding": list(self.padding),
                "bias": self.has_bias,
                "activation": activation_name(self.fun)}

    @classmethod
    def _from_json(cls, obj):
        layer = cls(obj["insize"], obj["size"], obj["winlen"],
                    stride=obj.get("stride", 1),
                    has_bias=obj.get("bias", False),
                    fun=activation_from_name(obj.get("activation", "tanh")),
                    padding_mode=_padding_mode_from_json(obj.get("padding_mode", "same")))
        params = layer._params_from_json(obj["params"]) if "params" in obj else None
        return layer, params


@register("max_pool")
class MaxPool(Layer):
    """1-D temporal max pooling (reference layers.py:422-465)."""

    def __init__(self, insize, pool_size, stride, fun=activations.linear,
                 padding_mode='same', name="MaxPooling"):
        self._insize = insize
        self._size = insize
        self._name = name
        self.pool_size = pool_size
        self.stride = stride
        self.fun = fun
        self.padding_mode = padding_mode
        self.padding = convops.calculate_padding(padding_mode, pool_size)

    def init(self, key):
        return {}

    def apply(self, params, x):
        return self.fun(convops.pool_1d(x, self.pool_size, self.stride, self.padding))

    def apply_with_lengths(self, params, x, lengths):
        out = self.apply(params, x)
        out_lengths = 1 + (lengths + sum(self.padding) - self.pool_size) // self.stride
        return out, out_lengths

    def _json_config(self):
        return {"insize": self.insize, "pool_size": self.pool_size,
                "stride": self.stride, "padding_mode": self.padding_mode,
                "padding": list(self.padding),
                "activation": activation_name(self.fun)}

    @classmethod
    def _from_json(cls, obj):
        layer = cls(obj["insize"], obj["pool_size"], obj["stride"],
                    fun=activation_from_name(obj.get("activation", "linear")),
                    padding_mode=_padding_mode_from_json(obj.get("padding_mode", "same")))
        return layer, {}


def _padding_mode_from_json(mode):
    """JSON round-trips (int, int) padding modes as lists."""
    if isinstance(mode, list):
        return tuple(mode)
    return mode
