"""Fused Pallas GRU recurrence.

The GRU scan body is three small matmuls plus elementwise gates; under an
XLA ``while`` loop each step pays fixed per-iteration overhead.  This kernel
runs the whole time loop as a Pallas ``grid=(batch blocks, T)`` program:
the recurrent weights stay resident in VMEM, the hidden state lives in
VMEM scratch (carried across the fast time axis, re-zeroed per batch
block), and Pallas pipelines the per-step loads of the (precomputed) input
projection and the output stores.  Batches over 512 rows are split into
blocks so the double-buffered per-step tiles stay inside scoped VMEM
(whole-batch tiles OOM'd at B=2048).

Semantics are identical to :class:`sloika_tpu.nn.rnn.Gru` with the standard
``sigmoid``/``tanh`` gate functions (reference layers.py:1010-1021).
Differentiation goes through a ``jax.custom_vjp`` whose backward pass is a
dedicated reverse-time Pallas kernel (``_bwd_kernel``): it recomputes the
gates from (xp_t, h_{t-1}) instead of saving them, carries the state
cotangent in VMEM scratch, and accumulates the recurrent-weight cotangents
in VMEM across the grid.  Gradients match the XLA scan to float32
round-off (tests/test_pallas_gru.py).

Masked-step contract: the emitted value at a masked position is the
*carried* state (the XLA scan path emits the freshly computed value
there instead) — padded-position outputs are unspecified and consumers
must mask them; parity holds on valid steps.

On by default on TPU for standard (tanh/sigmoid) GRUs of size >= 32
(measured on v5e: 1.34x the XLA-scan training step); disable with
``SLOIKA_TPU_FUSED_GRU=0`` or per-layer ``Gru(..., fused=False)``.
Off-TPU the kernels run in interpreter mode (parity tests only).
"""
from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, mask_ref, sWT_ref, sW2T_ref, out_ref, h, *, S, B,
            masked, precision):
    @pl.when(pl.program_id(1) == 0)
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


#: widest batch block one grid iteration holds in VMEM.  At 512 rows the
#: double-buffered per-step blocks stay well under the 16 MB scoped-VMEM
#: limit at any model width here (B=2048 whole-batch blocks exceeded it);
#: batch blocks are fully independent scans, so blocking is exact.
_BATCH_BLOCK = 512


def _batch_block(B, limit=None):
    """Block size for a batch of B rows.  Prefers an even divisor of B (no
    padding); a batch with only pathological divisors (e.g. 2 x prime) gets
    the full ``limit`` and the caller pads B up to a multiple — padded rows
    carry an all-zero mask so they contribute nothing to outputs or weight
    cotangents and are sliced off."""
    limit = _BATCH_BLOCK if limit is None else limit
    if B <= limit:
        return B
    # only divisors in [ceil(limit/2), limit] avoid both VMEM overflow and
    # grid serialisation; otherwise pad
    for bb in range(limit, (limit + 1) // 2 - 1, -1):
        if B % bb == 0:
            return bb
    return limit


def _pad_batch(BB, *arrays):
    """Pad axis 1 of each (T, B, ...) array up to a multiple of BB with
    zeros.  Returns (padded_B, arrays...)."""
    B = arrays[0].shape[1]
    pad = -B % BB
    if pad == 0:
        return (B,) + arrays
    out = tuple(
        jnp.concatenate(
            [a, jnp.zeros((a.shape[0], pad) + a.shape[2:], a.dtype)],
            axis=1) for a in arrays)
    return (B + pad,) + out


def _pallas_scan(xp, mask, sWT, sW2T, reverse, precision, block=None):
    T, B0, threeS = xp.shape
    S = threeS // 3
    masked = True
    BB = _batch_block(B0, block)
    B, xp, mask = _pad_batch(BB, xp, mask.reshape(T, B0, 1))

    if reverse:
        index_map = lambda b, t: (T - 1 - t, b, 0)
    else:
        index_map = lambda b, t: (t, b, 0)

    kernel = partial(_kernel, S=S, B=BB, masked=masked, precision=precision)
    out = pl.pallas_call(
        kernel,
        # time is the FASTEST axis so the hidden-state scratch carries
        # across t within one batch block (re-zeroed at t == 0)
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, threeS), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2 * S), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BB, S), index_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BB, S), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )(xp, mask, sWT, sW2T)
    return out[:, :B0] if B != B0 else out


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


def _bwd_kernel(xp_ref, hout_ref, hprev_ref, dout_ref, mask_ref, sWT_ref,
                sW2T_ref, sW_ref, sW2_ref, dxp_ref, dsWT_ref, dsW2T_ref,
                dh, dsWT_acc, dsW2T_acc, *, S, B, precision):
    """One reverse-time step of the GRU VJP.

    Recomputes the gates from (xp_t, h_{t-1}) — cheaper than saving them —
    and accumulates the weight cotangents in VMEM scratch across the grid.
    """
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        dh[:] = jnp.zeros((B, S), jnp.float32)
        dsWT_acc[:] = jnp.zeros((S, 2 * S), jnp.float32)
        dsW2T_acc[:] = jnp.zeros((S, S), jnp.float32)

    lp = xp_ref[0]
    h_prev = hprev_ref[0]
    h_t = hout_ref[0]
    m = mask_ref[0] != 0                 # (B, 1)

    # recompute forward quantities for this step
    vT = lp[:, :2 * S] + jnp.dot(h_prev, sWT_ref[:],
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
    z = jax.nn.sigmoid(vT[:, :S])
    r = jax.nn.sigmoid(vT[:, S:])
    rh = r * h_prev
    y = jnp.dot(rh, sW2T_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    hbar = jnp.tanh(lp[:, 2 * S:] + y)

    dht = dh[:] + dout_ref[0]            # total cotangent into h_t
    # masked steps copied h through: gradients flow straight to h_{t-1}
    dh_eff = jnp.where(m, dht, jnp.zeros_like(dht))

    dz = dh_eff * (h_prev - hbar) * z * (1 - z)
    dhbar = dh_eff * (1 - z)
    da = dhbar * (1 - hbar * hbar)       # a = lp[2S:] + y
    drh = jnp.dot(da, sW2_ref[:], preferred_element_type=jnp.float32,
                  precision=precision)
    dr = drh * h_prev * r * (1 - r)
    dvT = jnp.concatenate([dz, dr], axis=1)

    dh_prev = (dh_eff * z + drh * r
               + jnp.dot(dvT, sW_ref[:], preferred_element_type=jnp.float32,
                         precision=precision))
    dh_prev = dh_prev + jnp.where(m, jnp.zeros_like(dht), dht)

    dxp = jnp.concatenate([dvT, da], axis=1)
    dxp_ref[0] = jnp.where(m, dxp, jnp.zeros_like(dxp))

    dsWT_acc[:] += jnp.dot(h_prev.T, dvT,
                           preferred_element_type=jnp.float32,
                           precision=precision)
    dsW2T_acc[:] += jnp.dot(rh.T, da, preferred_element_type=jnp.float32,
                            precision=precision)
    dh[:] = dh_prev

    @pl.when(t == T - 1)
    def _final():
        dsWT_ref[0] = dsWT_acc[:]
        dsW2T_ref[0] = dsW2T_acc[:]


def _pallas_scan_bwd(xp, mask, sWT, sW2T, reverse, g, h_out, precision,
                     block=None):
    T, B0, threeS = xp.shape
    S = threeS // 3
    BB = _batch_block(B0, block)
    B, xp, mask, g, h_out = _pad_batch(BB, xp, mask.reshape(T, B0, 1), g,
                                       h_out)
    nB = B // BB
    # h_{t-1} in the *scan* order: shift h_out one step towards the scan start
    if reverse:
        h_prev = jnp.concatenate(
            [h_out[1:], jnp.zeros((1, B, S), jnp.float32)], axis=0)
        index_map = lambda b, t: (t, b, 0)           # bwd visits time 0..T-1
    else:
        h_prev = jnp.concatenate(
            [jnp.zeros((1, B, S), jnp.float32), h_out[:-1]], axis=0)
        index_map = lambda b, t: (T - 1 - t, b, 0)   # bwd visits T-1..0
    const = lambda b, t: (0, 0)
    # each batch block writes its weight cotangent to its own leading slot
    # (summed below — cross-block accumulation through HBM would race)
    wslot = lambda b, t: (b, 0, 0)

    kernel = partial(_bwd_kernel, S=S, B=BB, precision=precision)
    dxp, dsWT, dsW2T = pl.pallas_call(
        kernel,
        grid=(nB, T),
        in_specs=[
            pl.BlockSpec((1, BB, threeS), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2 * S), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * S, S), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, threeS), index_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 2 * S), wslot, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S), wslot, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, threeS), jnp.float32),
            jax.ShapeDtypeStruct((nB, S, 2 * S), jnp.float32),
            jax.ShapeDtypeStruct((nB, S, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, S), jnp.float32),
                        pltpu.VMEM((S, 2 * S), jnp.float32),
                        pltpu.VMEM((S, S), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )(xp, h_out, h_prev, g, mask, sWT, sW2T, sWT.T, sW2T.T)
    # padded rows carry mask 0: dxp is zero there and they add nothing to
    # the weight cotangents (see _bwd_kernel's dh_eff gating)
    return (dxp[:, :B0] if B != B0 else dxp), dsWT.sum(0), dsW2T.sum(0)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_fused(xp, sW_pair, mask, reverse):
    """mask: int8 (T, B); pass all-ones for unmasked runs."""
    sWT, sW2T = sW_pair
    return _pallas_scan(xp, mask, sWT, sW2T, reverse,
                        jax.lax.Precision.HIGHEST)


def _fwd(xp, sW_pair, mask, reverse):
    out = gru_fused(xp, sW_pair, mask, reverse)
    return out, (xp, sW_pair, mask, out)


def _bwd(reverse, res, g):
    xp, sW_pair, mask, h_out = res
    dxp, dsWT, dsW2T = _pallas_scan_bwd(
        xp, mask, sW_pair[0], sW_pair[1], reverse, g, h_out,
        jax.lax.Precision.HIGHEST)
    return dxp, (dsWT, dsW2T), None


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
