"""In-graph forward-Viterbi layer.

A *working* equivalent of the reference's ``Decode`` layer
(layers.py:1563-1619, shipped broken and skipped by its own tests):
treats its input as per-step state logits, applies a log-softmax, and runs
the stay/step/skip max-plus forward recursion, emitting the running Viterbi
score vector over kmer states at every step.  Useful for streaming decoding
or as a differentiable relaxation target.
"""
import jax
import jax.numpy as jnp

from sloika_tpu.nn.core import Layer, register
from sloika_tpu.variables import nkmer, nstate, DEFAULT_NBASE


@register("decode")
class Decode(Layer):
    """Forward pass of a Viterbi decoder over kmer transducer logits.

    Input features: ``nstate(k)`` per-step logits (column 0 = stay);
    output features: ``nkmer(k)`` running Viterbi scores.
    """

    def __init__(self, k, skip_pen=0.0, nbase=DEFAULT_NBASE,
                 name="ForwardsViterbi"):
        # skip moves need nbase**2 predecessor groups inside the kmer
        # (decode_np.viterbi has the same bound); k < 3 would reshape to a
        # zero-width group or degrade skip into an unconstrained jump
        assert k >= 3, "Decode needs kmer length >= 3 for skip moves"
        self.k = k
        self.nbase = nbase
        self.skip_pen = skip_pen
        self._insize = nstate(k, nbase=nbase)
        self._size = nkmer(k, nbase=nbase)
        self._name = name

    def init(self, key):
        return {}

    def apply(self, params, x):
        K = self.size
        nstep, nskip = self.nbase, self.nbase ** 2
        lp = jax.nn.log_softmax(x, axis=2)        # (T, B, nstate)
        B = x.shape[1]

        def move_max(p, n):
            nrem = K // n
            return jnp.repeat(jnp.max(p.reshape(B, n, nrem), axis=1), n,
                              axis=1)

        def step(vscore, lp_t):
            step_s = move_max(vscore, nstep)
            skip_s = move_max(vscore, nskip) - self.skip_pen
            new = lp_t[:, 1:] + jnp.maximum(step_s, skip_s)
            new = jnp.maximum(new, vscore + lp_t[:, 0:1])
            return new, new

        v0 = lp[0][:, 1:]
        _, out = jax.lax.scan(step, v0, lp[1:])
        return jnp.concatenate([v0[None], out], axis=0)

    def _json_config(self):
        return {"k": self.k, "skip_pen": self.skip_pen, "nbase": self.nbase}

    @classmethod
    def _from_json(cls, obj):
        return cls(obj.get("k", 5), skip_pen=obj.get("skip_pen", 0.0),
                   nbase=obj.get("nbase", 4)), {}
