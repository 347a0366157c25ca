"""Fused Pallas LSTM recurrence (the pallas_gru pattern, 4-gate form).

Runs the whole time loop as a ``grid=(batch blocks, T)`` Pallas program:
the recurrent weight matrix stays resident in VMEM, the (h, c) state pair
lives in VMEM scratch (carried across the fast time axis, re-zeroed per
batch block), and Pallas pipelines the per-step loads of the precomputed
input projection and the output stores.  Batch blocks over 512 rows are
split so the double-buffered per-step blocks stay inside scoped VMEM.  Semantics are identical to
:class:`sloika_tpu.nn.rnn.Lstm` with the standard ``tanh``/``sigmoid``
gate functions, including peepholes (reference layers.py:599-697,
Currennt-compatible gate packing: 0=candidate, 1=input, 2=forget,
3=output).

Differentiation goes through a ``jax.custom_vjp`` whose backward pass is a
dedicated reverse-time kernel: it recomputes the gates from
(xp_t, h_{t-1}, c_{t-1}) instead of saving them, carries the (dh, dc)
cotangent pair in VMEM scratch, and accumulates the recurrent-weight and
peephole cotangents in VMEM across the grid.  Gradients match the XLA scan
to float32 round-off (tests/test_pallas_lstm.py).

On by default on TPU for standard-activation LSTMs of size >= 32; disable
with ``SLOIKA_TPU_FUSED_LSTM=0`` or per-layer ``Lstm(..., fused=False)``.
Off-TPU the kernels run in interpreter mode (parity tests only).
"""
from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST


def _gates(lp, h, c, sWT_ref, p_ref, S):
    """Forward gate computation shared by both kernels."""
    sumW = lp + jnp.dot(h, sWT_ref[:], preferred_element_type=jnp.float32,
                        precision=_PREC)
    g0 = sumW[:, :S]
    g1 = sumW[:, S:2 * S]
    g2 = sumW[:, 2 * S:3 * S]
    g3 = sumW[:, 3 * S:]
    f = jax.nn.sigmoid(g2 + c * p_ref[1:2, :])
    i = jax.nn.sigmoid(g1 + c * p_ref[0:1, :])
    u = jnp.tanh(g0)
    c_new = c * f + u * i
    o = jax.nn.sigmoid(g3 + c_new * p_ref[2:3, :])
    return f, i, u, c_new, o


def _fwd_step(xp_ref, mask_ref, sWT_ref, p_ref, hout_ref, cout_ref,
              h, c, S, B):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        h[:] = jnp.zeros((B, S), jnp.float32)
        c[:] = jnp.zeros((B, S), jnp.float32)

    _, _, _, c_new, o = _gates(xp_ref[0], h[:], c[:], sWT_ref, p_ref, S)
    h_new = jnp.tanh(c_new) * o
    m = mask_ref[0] != 0
    h[:] = jnp.where(m, h_new, h[:])
    c[:] = jnp.where(m, c_new, c[:])
    hout_ref[0] = h[:]
    if cout_ref is not None:
        cout_ref[0] = c[:]


def _fwd_kernel(xp_ref, mask_ref, sWT_ref, p_ref, hout_ref, cout_ref,
                h, c, *, S, B):
    _fwd_step(xp_ref, mask_ref, sWT_ref, p_ref, hout_ref, cout_ref, h, c,
              S, B)


def _fwd_kernel_nocout(xp_ref, mask_ref, sWT_ref, p_ref, hout_ref,
                       h, c, *, S, B):
    # inference-only variant: skips the (T, B, S) cell-trace HBM stream
    # that only the VJP needs
    _fwd_step(xp_ref, mask_ref, sWT_ref, p_ref, hout_ref, None, h, c, S, B)


def _pallas_scan(xp, mask, sWT, p, reverse, emit_cout=True, block=None):
    from sloika_tpu.nn.pallas_gru import _batch_block, _pad_batch
    T, B0, fourS = xp.shape
    S = fourS // 4
    BB = _batch_block(B0, block)
    B, xp, mask = _pad_batch(BB, xp, mask.reshape(T, B0, 1))

    if reverse:
        index_map = lambda b, t: (T - 1 - t, b, 0)
    else:
        index_map = lambda b, t: (t, b, 0)
    const = lambda b, t: (0, 0)

    out_spec = pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((T, B, S), jnp.float32)
    out = pl.pallas_call(
        partial(_fwd_kernel if emit_cout else _fwd_kernel_nocout, S=S, B=BB),
        # time is the FASTEST axis so the (h, c) scratch pair carries
        # across t within one batch block (re-zeroed at t == 0)
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, fourS), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, fourS), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, S), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec] if emit_cout else [out_spec],
        out_shape=[out_shape, out_shape] if emit_cout else [out_shape],
        scratch_shapes=[pltpu.VMEM((BB, S), jnp.float32),
                        pltpu.VMEM((BB, S), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )(xp, mask, sWT, p)
    if B != B0:
        out = [o[:, :B0] for o in out]
    return out if emit_cout else (out[0], None)


def _bwd_kernel(xp_ref, hprev_ref, cprev_ref, dout_ref, mask_ref,
                sWT_ref, sW_ref, p_ref, dxp_ref, dsWT_ref, dp_ref,
                dh, dc, dsWT_acc, dp_acc, *, S, B):
    """One reverse-time step of the LSTM VJP (recompute-gates form)."""
    t = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        dh[:] = jnp.zeros((B, S), jnp.float32)
        dc[:] = jnp.zeros((B, S), jnp.float32)
        dsWT_acc[:] = jnp.zeros((S, 4 * S), jnp.float32)
        dp_acc[:] = jnp.zeros((3, S), jnp.float32)

    h_prev = hprev_ref[0]
    c_prev = cprev_ref[0]
    m = mask_ref[0] != 0                       # (B, 1)

    f, i, u, c_new, o = _gates(xp_ref[0], h_prev, c_prev, sWT_ref, p_ref, S)
    tc = jnp.tanh(c_new)

    dht = dh[:] + dout_ref[0]                  # cotangent into h_t
    dct = dc[:]                                # cotangent into c_t
    dh_eff = jnp.where(m, dht, jnp.zeros_like(dht))
    dc_eff = jnp.where(m, dct, jnp.zeros_like(dct))

    do = dh_eff * tc
    dg3 = do * o * (1 - o)
    dcn = dc_eff + dh_eff * o * (1 - tc * tc) + dg3 * p_ref[2:3, :]
    du = dcn * i
    dg0 = du * (1 - u * u)
    di = dcn * u
    dg1 = di * i * (1 - i)
    df = dcn * c_prev
    dg2 = df * f * (1 - f)
    dg = jnp.concatenate([dg0, dg1, dg2, dg3], axis=1)   # (B, 4S)

    dc_prev = (dcn * f + dg1 * p_ref[0:1, :] + dg2 * p_ref[1:2, :])
    dh_prev = jnp.dot(dg, sW_ref[:], preferred_element_type=jnp.float32,
                      precision=_PREC)
    # masked steps copied (h, c) through: cotangents flow straight back
    zero = jnp.zeros_like(dht)
    dh[:] = dh_prev + jnp.where(m, zero, dht)
    dc[:] = dc_prev + jnp.where(m, zero, dct)

    dxp_ref[0] = jnp.where(m, dg, jnp.zeros_like(dg))
    dsWT_acc[:] += jnp.dot(h_prev.T, dg, preferred_element_type=jnp.float32,
                           precision=_PREC)
    dp_acc[0:1, :] += jnp.sum(dg1 * c_prev, axis=0, keepdims=True)
    dp_acc[1:2, :] += jnp.sum(dg2 * c_prev, axis=0, keepdims=True)
    dp_acc[2:3, :] += jnp.sum(dg3 * c_new, axis=0, keepdims=True)

    @pl.when(t == T - 1)
    def _final():
        dsWT_ref[0] = dsWT_acc[:]
        dp_ref[0] = dp_acc[:]


def _pallas_scan_bwd(xp, mask, sWT, p, reverse, g, h_out, c_out, block=None):
    from sloika_tpu.nn.pallas_gru import _batch_block, _pad_batch
    T, B0, fourS = xp.shape
    S = fourS // 4
    BB = _batch_block(B0, block)
    B, xp, mask, g, h_out, c_out = _pad_batch(BB, xp,
                                              mask.reshape(T, B0, 1), g,
                                              h_out, c_out)
    nB = B // BB
    zrow = jnp.zeros((1, B, S), jnp.float32)
    if reverse:
        h_prev = jnp.concatenate([h_out[1:], zrow], axis=0)
        c_prev = jnp.concatenate([c_out[1:], zrow], axis=0)
        index_map = lambda b, t: (t, b, 0)           # bwd visits time 0..T-1
    else:
        h_prev = jnp.concatenate([zrow, h_out[:-1]], axis=0)
        c_prev = jnp.concatenate([zrow, c_out[:-1]], axis=0)
        index_map = lambda b, t: (T - 1 - t, b, 0)   # bwd visits T-1..0
    const = lambda b, t: (0, 0)
    # per-block weight-cotangent slots, summed below (see pallas_gru)
    wslot = lambda b, t: (b, 0, 0)

    dxp, dsWT, dp = pl.pallas_call(
        partial(_bwd_kernel, S=S, B=BB),
        grid=(nB, T),
        in_specs=[
            pl.BlockSpec((1, BB, fourS), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, fourS), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((fourS, S), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, S), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, fourS), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, fourS), wslot, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, S), wslot, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, fourS), jnp.float32),
            jax.ShapeDtypeStruct((nB, S, fourS), jnp.float32),
            jax.ShapeDtypeStruct((nB, 3, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, S), jnp.float32),
                        pltpu.VMEM((BB, S), jnp.float32),
                        pltpu.VMEM((S, 4 * S), jnp.float32),
                        pltpu.VMEM((3, S), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )(xp, h_prev, c_prev, g, mask, sWT, sWT.T, p)
    # padded rows carry mask 0: dxp is zero there and they add nothing to
    # the weight/peephole cotangents (see _bwd_kernel's dh_eff/dc_eff gating)
    return (dxp[:, :B0] if B != B0 else dxp), dsWT.sum(0), dp.sum(0)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_fused(xp, wp_pair, mask, reverse):
    """mask: int8 (T, B); pass all-ones for unmasked runs.

    Masked-step contract: the emitted value at a masked position is the
    *carried* state (the XLA scan path emits the freshly computed value
    there instead) — padded-position outputs are unspecified and consumers
    must mask them; parity holds on valid steps.
    """
    sWT, p = wp_pair
    h_out, _ = _pallas_scan(xp, mask, sWT, p, reverse, emit_cout=False)
    return h_out


def _fwd(xp, wp_pair, mask, reverse):
    sWT, p = wp_pair
    h_out, c_out = _pallas_scan(xp, mask, sWT, p, reverse)
    return h_out, (xp, wp_pair, mask, h_out, c_out)


def _bwd(reverse, res, g):
    xp, (sWT, p), mask, h_out, c_out = res
    dxp, dsWT, dp = _pallas_scan_bwd(xp, mask, sWT, p, reverse, g, h_out,
                                     c_out)
    return dxp, (dsWT, dp), None


lstm_fused.defvjp(_fwd, _bwd)


def run_lstm_fused(params, xp, reverse=False, mask=None, has_peep=True):
    """Run the fused LSTM over a precomputed input projection.

    :param params: Lstm parameter pytree (gate-major sW (4,S,S), peepholes
        p (3,S))
    :param xp: (T, B, 4S) input projection (x @ iW^T + b)
    :param mask: optional (T, B) bool valid-step mask
    :param has_peep: when False the (identically-zero) peephole weights are
        excluded from differentiation, like the scan path
    """
    S = params["p"].shape[1]
    sWT = params["sW"].reshape(4 * S, S).T
    p = params["p"]
    if not has_peep:
        p = jax.lax.stop_gradient(p)
    if mask is None:
        mask = jnp.ones(xp.shape[:2], jnp.int8)
    else:
        mask = mask.astype(jnp.int8)
    return lstm_fused(xp, (sWT, p), mask, reverse)
