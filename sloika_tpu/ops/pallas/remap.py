"""Pallas TPU kernel for the banded sequence-remap Viterbi DP.

Production implementation of the remapping core (reference
transducer.py:14-73 map_to_sequence + viterbi_helpers.pyx:12-35
slip_update), banded to a moving window of ``W`` sequence positions around
the linear frame->position interpolation (:func:`remap_banded.band_starts`).

Like :mod:`sloika_tpu.ops.pallas.viterbi`, the DP is sequential in time, so
the kernel runs with ``grid=(T,)``: the (B, W) score window lives in VMEM
scratch across steps while Pallas double-buffers the per-step banded
emission loads and traceback stores against HBM.  The XLA-scan formulation
of the same DP (ops/remap_banded.py) is kept as the CPU/parity reference —
its per-step dynamic gathers made the remote TPU compiler pathologically
slow, which is exactly what this kernel sidesteps.

Kernel reformulation for the TPU's layout rules:

* window *emissions* are pre-gathered outside the kernel into a dense
  (T, B, W) stream (two XLA ``take_along_axis`` ops), so the kernel never
  gathers — it only shifts, compares, and adds on (B, W) tiles;
* the band schedule guarantees per-step advances ``d in {0, 1}``
  (band_starts), so window realignment is a compare/select between the
  unshifted scores and a lane-roll by one — no dynamic gather;
* the geometric-slip recurrence (a prefix max over positions) becomes a
  Hillis-Steele scan: log2(W) lane-rolls with "earlier position wins ties"
  combine, matching the reference Cython kernel's tie-breaking;
* traceback stores the int16 *position delta* to the predecessor
  (0 = stay, 1 = step, >=2 = slip distance), so the backward pass is just
  ``pos -= delta`` — no window bookkeeping on the way back.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sloika_tpu.ops.remap_jax import NEG_LARGE
from sloika_tpu.ops.remap_banded import band_starts


def _banded_kernel(slip_ref, emit_ref, stay_ref, d_ref, tb_ref, vfinal_ref,
                   vscore, *, B, W):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    emit = emit_ref[0]                       # (B, W): t=0 row is the DP init
    neg = jnp.float32(NEG_LARGE)
    slip = slip_ref[0, 0]

    @pl.when(t == 0)
    def _init():
        vscore[:] = emit
        tb_ref[0] = jnp.zeros((B, W), jnp.int16)

    @pl.when(t > 0)
    def _step():
        p = vscore[:]
        adv = d_ref[0] > 0                   # (B, 1) window advanced by one
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

        # previous scores realigned to the new window: new lane j holds the
        # score of absolute position start_t + j, i.e. old lane j + d
        p_left = jnp.where(lane == W - 1, neg, pltpu.roll(p, W - 1, 1))
        q = jnp.where(adv, p_left, p)
        # previous score of absolute position start_t + j - 1 (old lane j+d-1)
        p_right = jnp.where(lane == 0, neg, pltpu.roll(p, 1, 1))
        qm1 = jnp.where(adv, p, p_right)

        # Stay (delta 0), then step (delta 1) — strict > like the exact DP
        cs = q + stay_ref[0]
        delta = jnp.zeros((B, W), jnp.float32)
        score_step = qm1 + emit
        take = score_step > cs
        cs = jnp.where(take, score_step, cs)
        delta = jnp.where(take, 1.0, delta)

        # Slip: from_score[j] = max_{i <= j-2}(q[i] - slip*(j-1-i)) via a
        # prefix max over y[i] = q[i] + slip*i (remap_jax.slip_update)
        lanef = lane.astype(jnp.float32)
        y = q + slip * lanef
        yi = lane
        k = 1
        while k < W:
            y_s = jnp.where(lane >= k, pltpu.roll(y, k, 1), neg)
            yi_s = pltpu.roll(yi, k, 1)
            earlier = y_s >= y               # ties keep the earlier position
            y = jnp.where(earlier, y_s, y)
            yi = jnp.where(earlier, yi_s, yi)
            k *= 2
        fs = jnp.where(lane >= 2,
                       pltpu.roll(y, 2, 1) - slip * (lanef - 1.0), neg)
        score_slip = fs + emit
        take = score_slip > cs
        delta = jnp.where(take, (lane - pltpu.roll(yi, 2, 1)).astype(jnp.float32),
                          delta)
        cs = jnp.where(take, score_slip, cs)

        # positions past the row's sequence end carry NEG emissions; keep
        # their scores pinned (mirrors the exact DP's pos_mask re-masking)
        cs = jnp.where(emit <= neg * 0.5, neg, cs)
        vscore[:] = cs
        tb_ref[0] = delta.astype(jnp.int16)

    @pl.when(t == T - 1)
    def _final():
        vfinal_ref[:] = vscore[:]


def _use_interpret():
    return jax.default_backend() not in ("tpu",)


@partial(jax.jit, static_argnames=("W",))
def map_to_sequence_banded(ltrans, seq_states, slip, prior_initial,
                           prior_final, pos_mask, nframes, npos, W):
    """Pallas drop-in for remap_banded.map_to_sequence_banded (same contract,
    same band schedule — paths are bit-identical to the XLA scan).

    :param ltrans: (B, T, nstate) log posteriors (column 0 = stay)
    :param seq_states: (B, P) int32 emission state per position
    :param slip: scalar slip penalty (>= 0)
    :param prior_initial, prior_final: (B, P) log position priors
    :param pos_mask: (B, P) True for real positions
    :param nframes, npos: (B,) true frame/sequence lengths per row
    :param W: static band width
    :returns: (score (B,), path (B, T) int32 absolute sequence positions)
    """
    B, T, nstate = ltrans.shape
    P = seq_states.shape[1]
    neg = jnp.float32(NEG_LARGE)
    barange = jnp.arange(B)
    warange = jnp.arange(W, dtype=jnp.int32)

    starts = band_starts(nframes, npos, T, W)             # (T, B)
    d = jnp.diff(starts, axis=0, prepend=starts[0:1])      # (T, B) in {0,1}

    # Pre-gathered banded emission stream (T, B, W): window kmer states,
    # then per-frame log posteriors of those states; masked lanes -> NEG
    idx = starts[:, :, None] + warange[None, None, :]      # (T, B, W) abs pos
    idx_c = jnp.clip(idx, 0, P - 1)
    flat = jnp.moveaxis(idx_c, 1, 0).reshape(B, T * W)     # (B, T*W)

    def row_gather(arr):
        g = jnp.take_along_axis(arr, flat, axis=1)
        return jnp.moveaxis(g.reshape(B, T, W), 1, 0)      # (T, B, W)

    valid = row_gather(pos_mask)
    seq_w = row_gather(seq_states)
    ltrans_t = jnp.moveaxis(ltrans, 1, 0)                  # (T, B, nstate)
    emit = jnp.where(valid,
                     jnp.take_along_axis(ltrans_t, seq_w, axis=2), neg)
    stay = ltrans_t[:, :, 0:1]                             # (T, B, 1)

    # Fold the DP initialisation into the t=0 emission row:
    # init = prior_initial + max(emit_0, stay_0) on valid lanes
    p0_w = jnp.take_along_axis(prior_initial,
                               jnp.clip(idx[0], 0, P - 1), axis=1)
    init = jnp.where(valid[0], p0_w + jnp.fmax(emit[0], stay[0]), neg)
    emit = emit.at[0].set(init)

    traceback, vfinal = pl.pallas_call(
        partial(_banded_kernel, B=B, W=W),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, W), jnp.int16),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, W), jnp.float32)],
        interpret=_use_interpret(),
    )(jnp.asarray(slip, jnp.float32).reshape(1, 1), emit, stay,
      d[:, :, None].astype(jnp.int32))

    # Final-position prior and best end position
    s_last = starts[T - 1]
    p1_w = jnp.take_along_axis(
        prior_final, jnp.clip(s_last[:, None] + warange[None, :], 0, P - 1),
        axis=1)
    pscore = vfinal + p1_w
    last_w = jnp.argmax(pscore, axis=1).astype(jnp.int32)
    score = pscore[barange, last_w]
    last = s_last + last_w

    # Backtrack: delta codes make this pure arithmetic
    def back(pos, inputs):
        tb_t, s_t = inputs
        rel = jnp.clip(pos - s_t, 0, W - 1)
        delta = tb_t[barange, rel].astype(jnp.int32)
        return pos - delta, pos

    first, rest = jax.lax.scan(back, last, (traceback[1:], starts[1:]),
                               reverse=True)
    path = jnp.concatenate([first[None], rest], axis=0)    # (T, B)
    return score, path.T
