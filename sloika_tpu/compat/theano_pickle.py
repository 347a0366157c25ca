"""Import reference (Theano-era) pickled models without Theano.

Reference checkpoints are pickles of whole layer objects with parameters
inside Theano shared variables (/root/reference/bin/train_network.py:145-152).
Unpickling them normally requires Theano; instead a custom ``Unpickler``
substitutes *stub* classes for every ``sloika.*``/``theano.*`` global and
captures their ``__setstate__``/``__dict__`` payloads.  Numpy arrays inside
reconstruct natively.  The captured object graph is then translated into
(sloika_tpu layer configuration, parameter pytree).

Weight layout translation: the reference stores fused gate weights flat and
*block-wise* for GRU (iW ``(3*size, insize)`` = [z; r; h], layers.py:975-977)
— reshaping to the gate-major ``(3, size, insize)`` convention used here is
exact.  Supported layer types cover the full reference zoo: everything
appearing in shipped model files (Serial/Parallel/Reverse/Residual/
Convolution/Window/FeedForward/Softmax/Gru/Lstm/LstmCIFG/LstmO/Recurrent/
MaxPool/Identity/Studentise/NormaliseL1) plus the exotic cells
(Scrn/Forget/Mut1-3/Genmut), each with a layout-parity test
(tests/test_theano_pickle.py).
"""
import io
import pickle

import jax.numpy as jnp
import numpy as np

from sloika_tpu import activations
from sloika_tpu import nn


class _Stub:
    """Generic stand-in for an unpicklable class; records state."""
    _stub_name = "?"

    def __init__(self, *args, **kwargs):
        self._stub_args = args

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state


class _StubFunction:
    """Stand-in for a module-level function referenced by a pickle global."""

    def __init__(self, module, name):
        self.module = module
        self.name = name

    def __call__(self, *a, **k):  # never called during load
        raise RuntimeError("stub function {} called".format(self.name))

    def __reduce__(self):
        return (self.__class__, (self.module, self.name))


class _RefUnpickler(pickle.Unpickler):
    _PASSTHROUGH_PREFIXES = ("numpy", "collections", "builtins", "copyreg",
                             "_codecs")

    def find_class(self, module, name):
        if module.split(".")[0] in [p.split(".")[0]
                                    for p in self._PASSTHROUGH_PREFIXES]:
            return super().find_class(module, name)
        if module.startswith("sloika.activation"):
            return _StubFunction(module, name)
        # build a distinct stub class per (module, name)
        cls = type(name, (_Stub,), {"_stub_name": "{}.{}".format(module, name),
                                    "_stub_module": module})
        return cls


def load_raw(path_or_bytes):
    """Unpickle a reference model into a stub object graph."""
    if isinstance(path_or_bytes, bytes):
        fh = io.BytesIO(path_or_bytes)
        return _RefUnpickler(fh, encoding="latin1").load()
    with open(path_or_bytes, "rb") as fh:
        return _RefUnpickler(fh, encoding="latin1").load()


# ---------------------------------------------------------------------------
# Stub graph -> sloika_tpu model
# ---------------------------------------------------------------------------

def _shared_value(sv):
    """Extract the ndarray out of a stubbed Theano shared variable."""
    # TensorSharedVariable.__getstate__ keeps a 'container' whose 'storage'
    # is a one-element list holding the value.
    container = getattr(sv, "container", None)
    if container is not None:
        storage = getattr(container, "storage", None)
        if storage is not None:
            return np.asarray(storage[0], dtype=np.float32)
    state = getattr(sv, "_stub_state", None)
    if state is not None:
        for item in _iter_arrays(state):
            return item
    raise ValueError("could not extract value from shared variable stub")


def _iter_arrays(obj, depth=0):
    if depth > 6:
        return
    if isinstance(obj, np.ndarray):
        yield obj
    elif isinstance(obj, (list, tuple)):
        for o in obj:
            yield from _iter_arrays(o, depth + 1)
    elif isinstance(obj, dict):
        for o in obj.values():
            yield from _iter_arrays(o, depth + 1)
    elif hasattr(obj, "__dict__"):
        yield from _iter_arrays(obj.__dict__, depth + 1)


def _flag(obj, name, *values):
    """Layer flag (``has_bias``/``has_peep``) from the pickled object.

    The reference stores these as plain attributes (layers.py __init__),
    so read them directly — inferring from ``np.any(values)`` misclassifies
    freshly initialised layers whose bias/peephole weights are still the
    reference's default zeros (has_peep=False would then freeze peepholes
    via stop_gradient on fine-tuning).  Value inference remains the
    fallback for exotic pickles lacking the attribute.
    """
    v = getattr(obj, name, None)
    if v is not None:
        return bool(v)
    return bool(any(np.any(x) for x in values))


def _activation(fun_stub, default):
    if fun_stub is None:
        return default
    name = getattr(fun_stub, "name", None)
    if name is None:
        return default
    return activations.by_name(name)


def _gate(obj, default=activations.sigmoid):
    return _activation(getattr(obj, "gatefun", None), default)


def convert(obj):
    """Translate a stub layer object into (layer, params)."""
    kind = type(obj).__name__

    if kind == "Serial":
        subs = [convert(l) for l in obj.layers]
        layer = nn.Serial([s[0] for s in subs])
        return layer, {"sublayers": tuple(s[1] for s in subs)}
    if kind == "Parallel":
        subs = [convert(l) for l in obj.layers]
        layer = nn.Parallel([s[0] for s in subs])
        return layer, {"sublayers": tuple(s[1] for s in subs)}
    if kind == "Reverse":
        sub, sub_p = convert(obj.layer)
        return nn.Reverse(sub), {"sublayer": sub_p}
    if kind == "Residual":
        sub, sub_p = convert(obj.layer)
        return nn.Residual(sub), {"sublayer": sub_p}

    if kind == "Convolution":
        W = _shared_value(obj.W)
        b = _shared_value(obj.b)
        size, insize, winlen = W.shape
        layer = nn.Convolution(insize, size, winlen, stride=obj.stride,
                               has_bias=_flag(obj, 'has_bias', b),
                               fun=_activation(getattr(obj, "fun", None),
                                               activations.tanh),
                               padding_mode=getattr(obj, "padding_mode", "same"))
        return layer, {"W": jnp.asarray(W), "b": jnp.asarray(b)}

    if kind in ("Softmax", "SoftmaxTheano"):
        W = _shared_value(obj.W)
        b = _shared_value(obj.b)
        cls = nn.Softmax if kind == "Softmax" else nn.SoftmaxTheano
        layer = cls(W.shape[1], W.shape[0], has_bias=_flag(obj, 'has_bias', b))
        return layer, {"W": jnp.asarray(W), "b": jnp.asarray(b)}

    if kind == "FeedForward":
        W = _shared_value(obj.W)
        b = _shared_value(obj.b)
        layer = nn.FeedForward(W.shape[1], W.shape[0],
                               has_bias=_flag(obj, 'has_bias', b),
                               fun=_activation(getattr(obj, "fun", None),
                                               activations.tanh))
        return layer, {"W": jnp.asarray(W), "b": jnp.asarray(b)}

    if kind == "Gru":
        iW = _shared_value(obj.iW)   # (3S, I) block-wise [z; r; h]
        sW = _shared_value(obj.sW)   # (2S, S) block-wise [z; r]
        sW2 = _shared_value(obj.sW2)
        b = _shared_value(obj.b)     # (3S,)
        S = sW2.shape[0]
        I = iW.shape[1]
        layer = nn.Gru(I, S, has_bias=_flag(obj, 'has_bias', b),
                       fun=_activation(getattr(obj, "fun", None),
                                       activations.tanh),
                       gatefun=_gate(obj))
        params = {"iW": jnp.asarray(iW.reshape(3, S, I)),
                  "sW": jnp.asarray(sW.reshape(2, S, S)),
                  "sW2": jnp.asarray(sW2),
                  "b": jnp.asarray(b.reshape(3, S))}
        return layer, params

    if kind == "Recurrent":
        iW = _shared_value(obj.iW)
        sW = _shared_value(obj.sW)
        b = _shared_value(obj.b)
        layer = nn.Recurrent(iW.shape[1], iW.shape[0],
                             has_bias=_flag(obj, 'has_bias', b),
                             fun=_activation(getattr(obj, "fun", None),
                                             activations.tanh))
        return layer, {"iW": jnp.asarray(iW), "sW": jnp.asarray(sW),
                       "b": jnp.asarray(b)}

    if kind in ("Lstm", "LstmCIFG", "LstmO"):
        # The reference runs these with an interleaved in-step reshape
        # (layers.py:683-691): column c of the fused matrices feeds
        # (unit c//G, gate c%G).  Permute rows to the gate-major layout.
        iW = _shared_value(obj.iW)
        sW = _shared_value(obj.sW)
        b = _shared_value(obj.b)
        p = _shared_value(obj.p)
        G = {"Lstm": 4, "LstmCIFG": 3, "LstmO": 3}[kind]
        S = iW.shape[0] // G
        I = iW.shape[1]
        if kind == "LstmO":
            # LstmO's step reshape is (-1, G, S): block-wise already
            perm = np.arange(G * S)
        else:
            # step reshape (-1, S, G): row 4*u+g is (unit u, gate g)
            perm = (np.arange(S)[None, :] * G + np.arange(G)[:, None]).reshape(-1)
        cls = {"Lstm": nn.Lstm, "LstmCIFG": nn.LstmCIFG, "LstmO": nn.LstmO}[kind]
        layer = cls(I, S, has_bias=_flag(obj, 'has_bias', b),
                    has_peep=_flag(obj, 'has_peep', p),
                    fun=_activation(getattr(obj, "fun", None), activations.tanh),
                    gatefun=_gate(obj))
        params = {"iW": jnp.asarray(iW[perm].reshape(G, S, I)),
                  "sW": jnp.asarray(sW[perm].reshape(G, S, S)),
                  "b": jnp.asarray(b[perm].reshape(G, S)),
                  "p": jnp.asarray(p)}
        return layer, params

    if kind == "Window":
        return nn.Window(obj.insize if hasattr(obj, "insize")
                         else obj._insize, obj.w), {}
    if kind == "Identity":
        return nn.Identity(getattr(obj, "_insize", 0)), {}
    if kind == "Studentise":
        return nn.Studentise(getattr(obj, "_insize", 0)), {}
    if kind == "NormaliseL1":
        return nn.NormaliseL1(getattr(obj, "_insize", 0)), {}
    if kind == "MaxPool":
        return nn.MaxPool(getattr(obj, "_insize", 0), obj.pool_size,
                          obj.stride,
                          padding_mode=getattr(obj, "padding_mode", "same")), {}

    if kind == "Scrn":
        isW = _shared_value(obj.isW)   # (slow, I)
        sfW = _shared_value(obj.sfW)   # (fast, slow)
        ifW = _shared_value(obj.ifW)   # (fast, I)
        ffW = _shared_value(obj.ffW)   # (fast, fast)
        # alpha lives in a Theano constant (unpicklable stub); recover it
        # from the non-learned decay matrix ssW = alpha * I (layers.py:545)
        ssW = _shared_value(obj.ssW)
        alpha = float(ssW[0, 0]) if ssW.size else 0.95
        layer = nn.Scrn(isW.shape[1], ifW.shape[0], isW.shape[0],
                        alpha=alpha,
                        fun=_activation(getattr(obj, "fun", None),
                                        activations.sigmoid))
        return layer, {"isW": jnp.asarray(isW), "sfW": jnp.asarray(sfW),
                       "ifW": jnp.asarray(ifW), "ffW": jnp.asarray(ffW)}

    if kind == "Forget":
        # fused weights are block-wise (step reshape (-1, 2, S),
        # layers.py:943-947): direct (2, S, fan) reshape.  The reference
        # never assigns gatefun (its documented bug), so pickles carry no
        # such attribute and the sigmoid default applies.
        iW = _shared_value(obj.iW)
        sW = _shared_value(obj.sW)
        b = _shared_value(obj.b)
        S = sW.shape[1]
        layer = nn.Forget(iW.shape[1], S, has_bias=_flag(obj, 'has_bias', b),
                          fun=_activation(getattr(obj, "fun", None),
                                          activations.tanh),
                          gatefun=_gate(obj))
        return layer, {"iW": jnp.asarray(iW.reshape(2, S, -1)),
                       "sW": jnp.asarray(sW.reshape(2, S, S)),
                       "b": jnp.asarray(b.reshape(2, S))}

    if kind in ("Mut1", "Mut2", "Mut3"):
        # per-gate matrices stored under the same names used here
        # (layers.py:1057-1066,1156-1166,1259-1270); biases are separate
        # vectors.  No layout permutation needed.
        cls = {"Mut1": nn.Mut1, "Mut2": nn.Mut2, "Mut3": nn.Mut3}[kind]
        names = list(cls._XMATS) + list(cls._HMATS)
        mats = {nm: _shared_value(getattr(obj, nm)) for nm in names}
        biases = {nm: _shared_value(getattr(obj, nm))
                  for nm in ("b_u", "b_z", "b_r", "b_h")}
        has_bias = _flag(obj, 'has_bias', *biases.values())
        layer = cls(mats["W_xu"].shape[1], mats["W_xu"].shape[0],
                    has_bias=has_bias,
                    fun=_activation(getattr(obj, "fun", None),
                                    activations.tanh),
                    gatefun=_gate(obj))
        params = {nm: jnp.asarray(v) for nm, v in mats.items()}
        params.update({nm: jnp.asarray(v) for nm, v in biases.items()})
        return layer, params

    if kind == "Genmut":
        # fused (3S, fan) weights are block-wise [u; r; z] (step reshape
        # (-1, 3, S), layers.py:1408-1417): direct reshape
        xW = _shared_value(obj.xW)
        sW = _shared_value(obj.sW)
        sW2 = _shared_value(obj.sW2)
        b = _shared_value(obj.b)
        b2 = _shared_value(obj.b2)
        S = sW2.shape[0]
        layer = nn.Genmut(xW.shape[1], S,
                          has_bias=_flag(obj, 'has_bias', b, b2),
                          fun=_activation(getattr(obj, "fun", None),
                                          activations.tanh),
                          gatefun=_gate(obj))
        return layer, {"xW": jnp.asarray(xW.reshape(3, S, -1)),
                       "sW": jnp.asarray(sW.reshape(3, S, S)),
                       "sW2": jnp.asarray(sW2),
                       "b": jnp.asarray(b.reshape(3, S)),
                       "b2": jnp.asarray(b2)}

    raise NotImplementedError("cannot convert reference layer {!r}".format(kind))


def load_model(path):
    """Load a reference pickled model as (layer, params)."""
    return convert(load_raw(path))
