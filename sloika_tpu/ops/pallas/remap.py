"""Pallas TPU kernels for the banded sequence-remap Viterbi DP.

Production implementation of the remapping core (reference
transducer.py:14-73 map_to_sequence + viterbi_helpers.pyx:12-35
slip_update), banded to a window of ``W`` sequence positions around the
linear frame->position interpolation (remap_banded.band_starts).

Like :mod:`sloika_tpu.ops.pallas.viterbi`, the DP is sequential in time, so
the forward kernel runs with ``grid=(T,)``: the (B, W) score window lives
in VMEM scratch across steps while Pallas double-buffers the per-step
banded emission loads and traceback stores against HBM.  The XLA-scan
formulation of the same DP (ops/remap_banded.py) is the CPU/parity
reference — fed the same schedule it produces bit-identical paths; its
per-step dynamic gathers are what made it unusable on this backend.

TPU reformulation (measured: the naive (T, B, W) XLA emission gather alone
cost ~1.5 s per batch — 30x the rest of the DP combined):

* the band schedule is *block-quantised* (``band_starts_blocked``): the
  window stays fixed for ``TB``-frame blocks, so the banded emissions of a
  whole block are one exact one-hot matmul
  ``E[b,t,j] = sum_s lt[b,t,s] * [seq[b, bs_b+j] == s]`` on the MXU
  (f32 x {0,1} with HIGHEST precision selects values exactly — no gather
  anywhere, and bit-parity with the gather formulation);
* inside a block the window is static: stay = same lane, step = lane-1,
  both static rolls; at block boundaries the carried scores are realigned
  by the (per-row dynamic, <= TB) window jump via bit-decomposed
  conditional lane-rolls — log2(TB) rolls, once per TB steps;
* the geometric-slip recurrence (a prefix max over positions) is a
  Hillis-Steele scan: log2(W) lane-rolls with "earlier position wins ties"
  combine, matching the reference Cython kernel's tie-breaking;
* traceback stores the int16 *position delta* to the predecessor
  (0 = stay, 1 = step, >=2 = slip distance), so the backward pass — its own
  reverse-grid kernel — is just ``pos -= delta`` plus a lane-mask lookup.

The effective guaranteed band is ``W - TB`` positions (the fixed window
must cover the sliding band across the whole block); ``Remapper`` sizes
``W`` accordingly.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sloika_tpu.ops.remap_jax import NEG_LARGE
from sloika_tpu.ops.remap_banded import band_starts

_LOG_ETA = float(np.log(1e-10))


def block_len(W):
    """Block-quantisation length for band width ``W`` (static)."""
    return max(16, min(256, W // 2))


def band_starts_blocked(nframes, npos, T, W, TB):
    """Block-quantised band schedule: ``band_starts`` held constant within
    each ``TB``-frame block (value at the block's first frame).  Increments
    are 0 within blocks and in [0, TB] at block boundaries."""
    base = band_starts(nframes, npos, T, W)
    kidx = (jnp.arange(T) // TB) * TB
    return base[kidx]


def _banded_kernel(slip_ref, emit_ref, stay_ref, d_ref, vmask_ref, tb_ref,
                   vfinal_ref, vscore, *, B, W, TB, nbits):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    emit = emit_ref[0]                       # (B, W): t=0 row is the DP init
    neg = jnp.float32(NEG_LARGE)
    slip = slip_ref[0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    @pl.when(t == 0)
    def _init():
        vscore[:] = emit
        tb_ref[0] = jnp.zeros((B, W), jnp.int16)

    @pl.when(t > 0)
    def _step():
        p = vscore[:]                        # prev scores, previous window
        lanef = lane.astype(jnp.float32)

        # Slip prefix max in *pre-realignment* coordinates, so predecessors
        # about to fall out of the window still count (the XLA banded scan
        # computes slip_update on the previous window for the same reason):
        # y[i] = p[i] + slip*i, scanned with "earlier position wins ties"
        y = p + slip * lanef
        yi = lane
        k = 1
        while k < W:
            y_s = jnp.where(lane >= k, pltpu.roll(y, k, 1), neg)
            yi_s = pltpu.roll(yi, k, 1)
            earlier = y_s >= y
            y = jnp.where(earlier, y_s, y)
            yi = jnp.where(earlier, yi_s, yi)
            k *= 2
        # z[i] = best slip source for old position i (predecessors <= i-2,
        # still in old coordinates and old lane indices)
        z = jnp.where(lane >= 2, pltpu.roll(y, 2, 1), neg)
        zi = pltpu.roll(yi, 2, 1)

        # Shift into the new window (left by each row's jump, d in
        # [0, TB], non-zero only at block boundaries) via per-row
        # bit-decomposed power-of-two lane-rolls.  Runs every step — the
        # hit masks are all-false within blocks (d == 0 there by
        # band_starts_blocked construction), and a branch around it
        # (lax.cond) crashes the Mosaic compiler.
        d = d_ref[0]                         # (B, 1) int32
        q = p
        for bit in range(nbits):
            s = 1 << bit
            hit = (d & s) > 0
            q = jnp.where(hit, jnp.where(lane >= W - s, neg,
                                         pltpu.roll(q, W - s, 1)), q)
            z = jnp.where(hit, jnp.where(lane >= W - s, neg,
                                         pltpu.roll(z, W - s, 1)), z)
            zi = jnp.where(hit, pltpu.roll(zi, W - s, 1), zi)

        # prev score of absolute position (window_start + j - 1)
        qm1 = jnp.where(lane == 0, neg, pltpu.roll(q, 1, 1))

        # Stay (delta 0), then step (delta 1) — strict > like the exact DP
        cs = q + stay_ref[0]
        delta = jnp.zeros((B, W), jnp.float32)
        score_step = qm1 + emit
        take = score_step > cs
        cs = jnp.where(take, score_step, cs)
        delta = jnp.where(take, 1.0, delta)

        # slip from_score in new coords: z carries old-coordinate values
        # (y = score + slip*old_lane) and old lane indices, so correct both
        # by the window jump d
        fs = z - slip * (lanef - 1.0 + d.astype(jnp.float32))
        score_slip = fs + emit
        take = score_slip > cs
        delta = jnp.where(take,
                          (lane + d - zi).astype(jnp.float32), delta)
        cs = jnp.where(take, score_slip, cs)

        # pin positions past the row's sequence end (mirrors the exact DP's
        # pos_mask re-masking; the validity mask is per-block, streamed via
        # a t // TB index map)
        cs = jnp.where(vmask_ref[0] > 0, cs, neg)
        vscore[:] = cs
        tb_ref[0] = delta.astype(jnp.int16)

    @pl.when(t == T - 1)
    def _final():
        vfinal_ref[:] = vscore[:]


def _use_interpret():
    return jax.default_backend() not in ("tpu",)


def _backtrack_kernel(last_ref, tb_ref, s_ref, path_ref, pos_ref, *, B, W):
    """Reverse-order traceback: grid step i visits frame t = T-1-i (the
    index maps run the grid backwards through the HBM streams), emitting
    path[t] and carrying the predecessor position for frame t-1 in the
    ``pos`` output block (which doubles as the carry; its final value is
    path[0]).  The per-row delta lookup is a lane-mask reduction — no
    gather primitive needed on (B, W) tiles."""
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    @pl.when(i == 0)
    def _init():
        pos_ref[:] = last_ref[:]

    pos = pos_ref[:]                   # (B, 1) absolute position at frame t
    path_ref[0] = pos
    rel = jnp.clip(pos - s_ref[0], 0, W - 1)
    delta = jnp.sum(jnp.where(lane == rel, tb_ref[0].astype(jnp.int32), 0),
                    axis=1, keepdims=True)
    pos_ref[:] = pos - delta


def _backtrack(traceback, starts, last, B, W):
    """(T-1,)-grid reverse traceback; returns the (T, B) path."""
    T = traceback.shape[0]
    if T == 1:
        return last[None, :]
    rev = T - 1                                   # grid i -> frame T-1-i
    path_rest, pos0 = pl.pallas_call(
        partial(_backtrack_kernel, B=B, W=W),
        grid=(T - 1,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda i: (rev - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda i: (rev - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, 1), lambda i: (rev - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T - 1, B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(last[:, None], traceback, starts[:, :, None].astype(jnp.int32))
    # path_rest[t-1] holds frame t (t = 1..T-1); pos0 is frame 0
    path = jnp.concatenate([pos0[None, :, 0], path_rest[:, :, 0]], axis=0)
    return path


def _block_emissions(ltrans_t, seq_states, pos_mask, starts_b, W, TB):
    """Banded emissions (T, B, W) by per-block one-hot matmul (exact).

    :param ltrans_t: (T, B, nstate) *time-major* with T % TB == 0 — the
        block split is then a leading-axis reshape (a view), so the full
        (T, B, nstate) tensor is never re-laid-out in HBM (it is ~4 GB at
        remap batch 64; the old batch-major form cost several such copies
        and capped the batch at 32)
    :param starts_b: (nb, B) block window starts
    """
    T, B, nstate = ltrans_t.shape
    P = seq_states.shape[1]
    nb = T // TB
    neg = jnp.float32(NEG_LARGE)

    idxw = jnp.clip(starts_b[:, :, None] + jnp.arange(W, dtype=jnp.int32),
                    0, P - 1)                                   # (nb, B, W)
    flat = jnp.moveaxis(idxw, 1, 0).reshape(B, nb * W)
    seq_w = jnp.moveaxis(
        jnp.take_along_axis(seq_states, flat, axis=1).reshape(B, nb, W),
        1, 0)                                                   # (nb, B, W)
    valid = jnp.moveaxis(
        jnp.take_along_axis(pos_mask, flat, axis=1).reshape(B, nb, W),
        1, 0)
    # mask positions outside the row's sequence even when clipping aliased
    # them onto real positions
    valid = valid & (starts_b[:, :, None]
                     + jnp.arange(W, dtype=jnp.int32) < P)

    lt_blocks = ltrans_t.reshape(nb, TB, B, nstate)             # a view
    iota_s = jnp.arange(nstate, dtype=jnp.int32)

    def block(_, inp):
        lt_k, s_k, m_k = inp            # (TB, B, nstate), (B, W), (B, W)
        oh = (s_k[:, :, None] == iota_s[None, None, :]).astype(jnp.float32)
        e_k = jnp.einsum("tbs,bws->tbw", lt_k, oh,
                         precision=jax.lax.Precision.HIGHEST)
        return None, jnp.where(m_k[None, :, :], e_k, neg)

    _, E = jax.lax.scan(block, None, (lt_blocks, seq_w, valid))
    return E.reshape(T, B, W), valid                            # (T, B, W)


@partial(jax.jit, static_argnames=("W", "time_major"))
def map_to_sequence_banded(ltrans, seq_states, slip, prior_initial,
                           prior_final, pos_mask, nframes, npos, W,
                           time_major=False):
    """Pallas banded alignment; same contract as
    remap_banded.map_to_sequence_banded, block-quantised schedule
    (bit-identical to the XLA scan fed the same schedule).

    :param ltrans: (B, T, nstate) log posteriors (column 0 = stay) — or,
        with ``time_major``, (T, B, nstate): the model forward's native
        layout, avoiding any transpose of the multi-GB posterior in HBM
        (this is what bounds the remap batch size)
    :param seq_states: (B, P) int32 emission state per position
    :param slip: scalar slip penalty (>= 0)
    :param prior_initial, prior_final: (B, P) log position priors
    :param pos_mask: (B, P) True for real positions
    :param nframes, npos: (B,) true frame/sequence lengths per row
    :param W: static band width (guaranteed band: W - block_len(W))
    :returns: (score (B,), path (B, T) int32 absolute sequence positions)
    """
    if time_major:
        ltrans_t = ltrans
        T, B, nstate = ltrans.shape
    else:
        ltrans_t = jnp.moveaxis(ltrans, 0, 1)                   # (T, B, ns)
        B, T, nstate = ltrans.shape
    P = seq_states.shape[1]
    neg = jnp.float32(NEG_LARGE)
    barange = jnp.arange(B)
    warange = jnp.arange(W, dtype=jnp.int32)
    TB = block_len(W)

    # pad the time axis to a whole number of blocks with stay frames
    Tp = ((T + TB - 1) // TB) * TB
    if Tp != T:
        stay_row = jnp.full((nstate,), jnp.float32(_LOG_ETA)).at[0].set(0.0)
        pad = jnp.broadcast_to(stay_row, (Tp - T, B, nstate))
        ltrans_t = jnp.concatenate([ltrans_t, pad], axis=0)

    starts = band_starts_blocked(nframes, npos, Tp, W, TB)      # (Tp, B)
    starts_b = starts[::TB]                                     # (nb, B)
    d = jnp.diff(starts, axis=0, prepend=starts[0:1])           # (Tp, B)

    emit, valid = _block_emissions(ltrans_t, seq_states, pos_mask, starts_b,
                                   W, TB)
    if Tp != T:
        # padded frames are strict no-ops: NEG emissions (no step/slip can
        # be taken) + zero stay, so the padded DP equals the T-step DP
        emit = jnp.where(jnp.arange(Tp)[:, None, None] < T, emit, neg)
    stay = ltrans_t[:, :, 0:1]

    # Fold the DP initialisation into the t=0 emission row:
    # init = prior_initial + max(emit_0, stay_0) on valid lanes
    idx0 = jnp.clip(starts[0][:, None] + warange[None, :], 0, P - 1)
    p0_w = jnp.take_along_axis(prior_initial, idx0, axis=1)
    init = jnp.where(emit[0] > neg * 0.5,
                     p0_w + jnp.fmax(emit[0], stay[0]), neg)
    emit = emit.at[0].set(init)

    # W >= P: the window always covers the whole sequence, the schedule is
    # identically zero and the realign rolls can be dropped — this is the
    # *exact* DP, compiled as a Pallas kernel (the XLA exact scan takes
    # minutes to compile through the remote compiler at real read lengths)
    nbits = 0 if W >= P else max(int(TB).bit_length(), 1)
    traceback, vfinal = pl.pallas_call(
        partial(_banded_kernel, B=B, W=W, TB=TB, nbits=nbits),
        grid=(Tp,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, W), lambda t: (t // TB, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, W), jnp.int16),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, W), jnp.float32)],
        interpret=_use_interpret(),
    )(jnp.asarray(slip, jnp.float32).reshape(1, 1), emit, stay,
      d[:, :, None].astype(jnp.int32), valid.astype(jnp.int32))

    # Final-position prior and best end position.  The DP ran Tp steps; the
    # trailing pad frames are stays, which leave both scores and the path's
    # final position unchanged, so "end of padded time" == "end of read".
    s_last = starts[Tp - 1]
    p1_w = jnp.take_along_axis(
        prior_final, jnp.clip(s_last[:, None] + warange[None, :], 0, P - 1),
        axis=1)
    pscore = vfinal + p1_w
    last_w = jnp.argmax(pscore, axis=1).astype(jnp.int32)
    score = pscore[barange, last_w]
    last = s_last + last_w

    path = _backtrack(traceback, starts, last, B, W)            # (Tp, B)
    return score, path[:T].T
