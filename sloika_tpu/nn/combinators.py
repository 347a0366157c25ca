"""Layer combinators: Serial, Parallel, Reverse, Residual, birnn.

Equivalents of /root/reference/sloika/layers.py:1420-1629.  Unlike the
reference (whose combinator ``set_params`` are no-ops), parameters of
sublayers are first-class pytree nodes here, so (de)serialisation recurses.
"""
import jax.numpy as jnp

from sloika_tpu.nn.core import Layer, register, from_json as _layer_from_json
from sloika_tpu.nn.rnn import RNNBase


@register("reverse")
class Reverse(Layer):
    """Run a layer backwards in time (reference layers.py:1420-1450).

    For recurrent sublayers this lowers to ``lax.scan(reverse=True)`` —
    no flips, no copies; other layers get the reference's
    flip-apply-flip semantics.
    """

    def __init__(self, layer, name="Reverse"):
        self.layer = layer
        self._name = name

    @property
    def insize(self):
        return self.layer.insize

    @property
    def size(self):
        return self.layer.size

    def init(self, key):
        return {"sublayer": self.layer.init(key)}

    def apply(self, params, x):
        if isinstance(self.layer, RNNBase):
            return self.layer.apply(params["sublayer"], x, reverse=True)
        return self.layer.apply(params["sublayer"], x[::-1])[::-1]

    def apply_with_lengths(self, params, x, lengths):
        assert isinstance(self.layer, RNNBase), \
            "Reverse with variable lengths is only defined for RNN sublayers"
        import jax.numpy as jnp
        mask = jnp.arange(x.shape[0])[:, None] < lengths[None, :]
        out = self.layer.apply(params["sublayer"], x, reverse=True, mask=mask)
        return out, lengths

    def to_json(self, params=None):
        sub = self.layer.to_json(None if params is None else params["sublayer"])
        return {"type": self.json_type, "sublayer": sub}

    @classmethod
    def _from_json(cls, obj):
        sub, sub_params = _layer_from_json(obj["sublayer"])
        layer = cls(sub)
        params = None if sub_params is None else {"sublayer": sub_params}
        return layer, params


@register("parallel")
class Parallel(Layer):
    """Run layers on the same input; concatenate outputs on the feature axis
    (reference layers.py:1453-1487)."""

    def __init__(self, layers, name="Parallel"):
        assert len(layers) > 0, "A Parallel layer cannot be empty"
        self.layers = tuple(layers)
        self._name = name
        assert all(x.insize == self.insize for x in self.layers), \
            "Parallel layer has inconsistent sizes"

    @property
    def insize(self):
        return self.layers[0].insize

    @property
    def size(self):
        return sum(x.size for x in self.layers)

    def init(self, key):
        import jax
        keys = jax.random.split(key, len(self.layers))
        return {"sublayers": tuple(l.init(k) for l, k in zip(self.layers, keys))}

    def apply(self, params, x):
        outs = [l.apply(p, x) for l, p in zip(self.layers, params["sublayers"])]
        return jnp.concatenate(outs, axis=2)

    def apply_with_lengths(self, params, x, lengths):
        outs = []
        out_lengths = lengths
        for l, p in zip(self.layers, params["sublayers"]):
            y, out_lengths = l.apply_with_lengths(p, x, lengths)
            outs.append(y)
        return jnp.concatenate(outs, axis=2), out_lengths

    def to_json(self, params=None):
        if params is None:
            subs = [l.to_json(None) for l in self.layers]
        else:
            subs = [l.to_json(p) for l, p in zip(self.layers, params["sublayers"])]
        return {"type": self.json_type, "sublayers": subs}

    @classmethod
    def _from_json(cls, obj):
        pairs = [_layer_from_json(s) for s in obj["sublayers"]]
        layer = cls([p[0] for p in pairs])
        if any(p[1] is None for p in pairs):
            return layer, None
        return layer, {"sublayers": tuple(p[1] for p in pairs)}


@register("residual")
class Residual(Layer):
    """``x + layer(x)``; requires insize == size
    (reference layers.py:1490-1521, with its ``params``-returns-a-method bug
    irrelevant under the pytree design)."""

    def __init__(self, layer, name="Residual"):
        assert layer.insize == layer.size, \
            "Residual connections require input and output sizes to be equal"
        self.layer = layer
        self._name = name

    @property
    def insize(self):
        return self.layer.insize

    @property
    def size(self):
        return self.layer.size

    def init(self, key):
        return {"sublayer": self.layer.init(key)}

    def apply(self, params, x):
        return x + self.layer.apply(params["sublayer"], x)

    def apply_with_lengths(self, params, x, lengths):
        y, out_lengths = self.layer.apply_with_lengths(params["sublayer"], x,
                                                       lengths)
        return x + y, out_lengths

    def to_json(self, params=None):
        sub = self.layer.to_json(None if params is None else params["sublayer"])
        return {"type": self.json_type, "sublayer": sub}

    @classmethod
    def _from_json(cls, obj):
        sub, sub_params = _layer_from_json(obj["sublayer"])
        layer = cls(sub)
        params = None if sub_params is None else {"sublayer": sub_params}
        return layer, params


@register("serial")
class Serial(Layer):
    """Sequential composition (reference layers.py:1524-1560)."""

    def __init__(self, layers, name="Serial"):
        assert len(layers) > 0, "A Serial layer cannot be empty"
        self.layers = tuple(layers)
        self._name = name
        assert all(x.size == y.insize for x, y in zip(layers, layers[1:])), \
            "Serial layer has inconsistent sizes"

    @property
    def insize(self):
        return self.layers[0].insize

    @property
    def size(self):
        return self.layers[-1].size

    def init(self, key):
        import jax
        keys = jax.random.split(key, len(self.layers))
        return {"sublayers": tuple(l.init(k) for l, k in zip(self.layers, keys))}

    def apply(self, params, x):
        for l, p in zip(self.layers, params["sublayers"]):
            x = l.apply(p, x)
        return x

    def apply_with_lengths(self, params, x, lengths):
        for l, p in zip(self.layers, params["sublayers"]):
            x, lengths = l.apply_with_lengths(p, x, lengths)
        return x, lengths

    def to_json(self, params=None):
        if params is None:
            subs = [l.to_json(None) for l in self.layers]
        else:
            subs = [l.to_json(p) for l, p in zip(self.layers, params["sublayers"])]
        return {"type": self.json_type, "sublayers": subs}

    @classmethod
    def _from_json(cls, obj):
        pairs = [_layer_from_json(s) for s in obj["sublayers"]]
        layer = cls([p[0] for p in pairs])
        if any(p[1] is None for p in pairs):
            return layer, None
        return layer, {"sublayers": tuple(p[1] for p in pairs)}


def birnn(forward, backward, name="BiRNN"):
    """Bidirectional RNN from two cells (reference layers.py:1622-1629)."""
    return Parallel([forward, Reverse(backward)], name=name)
