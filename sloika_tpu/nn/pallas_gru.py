"""Fused Pallas GRU recurrence.

The GRU scan body is three small matmuls plus elementwise gates; under an
XLA ``while`` loop each step pays fixed per-iteration overhead.  This kernel
runs the whole time loop as a Pallas ``grid=(T,)`` program: the recurrent
weights stay resident in VMEM, the hidden state lives in VMEM scratch, and
Pallas pipelines the per-step loads of the (precomputed) input projection
and the output stores.

Semantics are identical to :class:`sloika_tpu.nn.rnn.Gru` with the standard
``sigmoid``/``tanh`` gate functions (reference layers.py:1010-1021).
Differentiation is supported through a ``jax.custom_vjp`` whose backward
pass rematerialises the scan with the plain XLA implementation — the kernel
accelerates inference paths (basecalling, remapping) and leaves training
gradients bit-identical to the scan.

Enable per-layer with ``Gru(..., fused=True)`` or globally for inference
with :func:`sloika_tpu.nn.rnn` helpers; falls back to the XLA scan off-TPU
(interpret mode is used for parity tests only).
"""
from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, mask_ref, sWT_ref, sW2T_ref, out_ref, h, *, S, B,
            masked, precision):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h[:] = jnp.zeros((B, S), jnp.float32)

    lp = xp_ref[0]                      # (B, 3S)
    vS = jnp.dot(h[:], sWT_ref[:], preferred_element_type=jnp.float32,
                 precision=precision)
    vT = lp[:, :2 * S] + vS
    z = jax.nn.sigmoid(vT[:, :S])
    r = jax.nn.sigmoid(vT[:, S:])
    y = jnp.dot(r * h[:], sW2T_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    hbar = jnp.tanh(lp[:, 2 * S:] + y)
    new = z * h[:] + (1 - z) * hbar
    if masked:
        m = mask_ref[0] != 0          # (B, 1)
        new = jnp.where(m, new, h[:])
    h[:] = new
    out_ref[0] = new


def _pallas_scan(xp, mask, sWT, sW2T, reverse, precision):
    T, B, threeS = xp.shape
    S = threeS // 3
    masked = True

    if reverse:
        index_map = lambda t: (T - 1 - t, 0, 0)
    else:
        index_map = lambda t: (t, 0, 0)

    kernel = partial(_kernel, S=S, B=B, masked=masked, precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, threeS), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2 * S), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, S), index_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )(xp, mask.reshape(T, B, 1), sWT, sW2T)
    return out


def _xla_scan(xp, mask, sWT, sW2T, reverse):
    """Reference XLA implementation (identical math; used for the VJP)."""
    T, B, threeS = xp.shape
    S = threeS // 3

    def step(h, inputs):
        lp, m = inputs
        vT = lp[:, :2 * S] + h @ sWT
        z = jax.nn.sigmoid(vT[:, :S])
        r = jax.nn.sigmoid(vT[:, S:])
        hbar = jnp.tanh(lp[:, 2 * S:] + (r * h) @ sW2T)
        new = z * h + (1 - z) * hbar
        new = jnp.where(m[:, None], new, h)
        return new, new

    h0 = jnp.zeros((B, S), jnp.float32)
    _, out = jax.lax.scan(step, h0, (xp, mask), reverse=reverse)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_fused(xp, sW_pair, mask, reverse):
    """mask: int8 (T, B); pass all-ones for unmasked runs."""
    sWT, sW2T = sW_pair
    return _pallas_scan(xp, mask, sWT, sW2T, reverse,
                        jax.lax.Precision.HIGHEST)


def _fwd(xp, sW_pair, mask, reverse):
    out = gru_fused(xp, sW_pair, mask, reverse)
    return out, (xp, sW_pair, mask)


def _bwd(reverse, res, g):
    xp, sW_pair, mask = res

    def ref(xp_, pair_):
        return _xla_scan(xp_, mask.astype(bool), pair_[0], pair_[1], reverse)

    _, vjp = jax.vjp(ref, xp, sW_pair)
    dxp, dpair = vjp(g)
    return dxp, dpair, None


gru_fused.defvjp(_fwd, _bwd)


def run_gru_fused(params, xp, reverse=False, mask=None):
    """Run the fused GRU over a precomputed input projection.

    :param params: Gru parameter pytree (gate-major sW (2,S,S), sW2 (S,S))
    :param xp: (T, B, 3S) input projection (x @ iW^T + b)
    :param mask: optional (T, B) bool valid-step mask
    """
    S = params["sW2"].shape[0]
    sWT = params["sW"].reshape(2 * S, S).T
    sW2T = params["sW2"].T
    if mask is None:
        mask = jnp.ones(xp.shape[:2], jnp.int8)
    else:
        mask = mask.astype(jnp.int8)
    return gru_fused(xp, (sWT, sW2T), mask, reverse)
