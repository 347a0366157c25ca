"""Banded device-side sequence remapping.

The exact remap DP (:mod:`sloika_tpu.ops.remap_jax`) costs
O(frames x positions) per read — the associative slip scan over all ``npos``
positions dominates.  Signal-to-reference paths are near-linear (sequencing
speed is roughly constant), so restricting each frame's DP state to a moving
window of ``W`` positions centred on the linear interpolation between read
start and end cuts the work by ``npos / W`` with no measurable path change
for well-behaved reads.

Window bookkeeping: at scan step ``t`` row ``b`` covers absolute positions
``[s_b(t), s_b(t) + W)`` with ``s_b(t)`` the clamped linear ramp over that
row's true frame count and sequence length.  Between steps the window
shifts by ``d = s(t) - s(t-1)`` and the carried scores are realigned with a
per-row dynamic gather (out-of-window = -inf).  Traceback stores absolute
predecessor positions, so the backward gather only needs ``s(t)`` per step.

Use through :class:`sloika_tpu.remap.Remapper` with ``band=W``; ``band=None``
keeps the exact DP.

Two implementations share the band schedule (:func:`band_starts`):

* this module's pure-XLA scan — the CPU/parity reference;
* :mod:`sloika_tpu.ops.pallas.remap` — the production TPU kernel (the XLA
  scan's per-step dynamic gathers compile pathologically slowly through the
  remote TPU compiler; the Pallas kernel sidesteps scan lowering entirely).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sloika_tpu.ops.remap_jax import NEG_LARGE, slip_update


def band_starts(nframes, npos, T, W):
    """Band schedule: (T, B) absolute window starts, centred on the linear
    frame->position interpolation of each row.

    Monotone with per-step increments in {0, 1} (required by the Pallas
    kernel's static-shift window advance): the raw ramp ``clip(round(frac *
    (npos-1)) - W//2, 0, npos-W)`` is capped via the closed form
    ``starts_t = t + cummin_u<=t(raw_u - u)``, exact whenever the ramp slope
    ``(npos-1)/(nframes-1) <= 1`` (always true for signal remapping, where
    frames outnumber sequence positions).
    """
    t = jnp.arange(T, dtype=jnp.float32)[:, None]
    nf = jnp.maximum(nframes.astype(jnp.float32) - 1.0, 1.0)[None, :]
    npos_f = npos.astype(jnp.float32)[None, :]
    frac = jnp.minimum(t / nf, 1.0)
    centre = jnp.round(frac * (npos_f - 1.0)).astype(jnp.int32)
    hi = jnp.maximum(npos.astype(jnp.int32) - W, 0)[None, :]
    raw = jnp.clip(centre - W // 2, 0, hi)
    ti = jnp.arange(T, dtype=jnp.int32)[:, None]
    adj = jax.lax.associative_scan(jnp.minimum, raw - ti, axis=0)
    return ti + adj


@partial(jax.jit, static_argnames=("W",))
def map_to_sequence_banded(ltrans, seq_states, slip, prior_initial,
                           prior_final, pos_mask, nframes, npos, W,
                           starts=None):
    """Banded Viterbi alignment (see module docstring).

    Same contract as remap_jax.map_to_sequence plus:

    :param nframes: (B,) true frame count per row (padding frames are stays)
    :param npos: (B,) true sequence length per row
    :param W: static band width (positions)
    :param starts: optional (T, B) precomputed band schedule (monotone,
        0 <= increments < W); default :func:`band_starts`.  Used for
        bit-parity testing against the Pallas kernel's block-quantised
        schedule.
    :returns: (score (B,), path (B, T) int32 absolute sequence positions)
    """
    B, T, nstate = ltrans.shape
    P = seq_states.shape[1]
    neg = jnp.float32(NEG_LARGE)
    barange = jnp.arange(B)
    warange = jnp.arange(W, dtype=jnp.int32)

    if starts is None:
        starts = band_starts(nframes, npos, T, W)  # (T, B)

    def gather_window(arr, start):
        """Per-row gather of W consecutive entries (clamped indexing)."""
        idx = jnp.clip(start[:, None] + warange[None, :], 0, P - 1)
        return jnp.take_along_axis(arr, idx, axis=1), idx

    ltrans_t = jnp.moveaxis(ltrans, 1, 0)       # (T, B, nstate)

    s0 = starts[0]
    seq_w, idx0 = gather_window(seq_states, s0)
    emit0 = jnp.take_along_axis(ltrans_t[0], seq_w, axis=1)
    mask_w, _ = gather_window(pos_mask.astype(jnp.int32), s0)
    pri0, _ = gather_window(prior_initial, s0)
    pscore = jnp.where(mask_w > 0,
                       pri0 + jnp.fmax(emit0, ltrans_t[0][:, 0:1]), neg)

    vslip = jax.vmap(slip_update, in_axes=(0, None))

    def step(carry, inputs):
        """All predecessor lookups are done in the *previous* window's
        coordinates (index ``idx = j + d`` for new window position ``j``),
        so no transition is lost when the band advances."""
        pscore, s_prev = carry
        lt, s = inputs
        d = (s - s_prev)[:, None]                     # window shift per row

        def shifted(arr, off):
            src = warange[None, :] + d + off
            valid = (src >= 0) & (src < W)
            out = jnp.take_along_axis(arr, jnp.clip(src, 0, W - 1), axis=1)
            return jnp.where(valid, out, neg)

        seq_w, _ = gather_window(seq_states, s)
        mask_w, _ = gather_window(pos_mask.astype(jnp.int32), s)
        emit = jnp.take_along_axis(lt, seq_w, axis=1)

        # Stay: from old index j + d (same absolute position)
        vm = s[:, None] + warange[None, :]            # absolute positions
        cscore = shifted(pscore, 0) + lt[:, 0:1]
        # Step: from old index j + d - 1 (absolute position - 1)
        step_score = shifted(pscore, -1) + emit
        take = step_score > cscore
        cscore = jnp.where(take, step_score, cscore)
        vm = jnp.where(take, vm - 1, vm)
        # Slip: slip scores computed over the old window, read at j + d
        from_score, from_pos = vslip(pscore, slip)
        slip_score = shifted(from_score, 0) + emit
        slip_pos_old = jnp.take_along_axis(
            from_pos, jnp.clip(warange[None, :] + d, 0, W - 1), axis=1)
        take = slip_score > cscore
        vm = jnp.where(take, s_prev[:, None] + slip_pos_old, vm)
        cscore = jnp.where(take, slip_score, cscore)

        cscore = jnp.where(mask_w > 0, cscore, neg)
        return (cscore, s), (vm, s)

    (pscore, s_last), (vmat, starts_out) = jax.lax.scan(
        step, (pscore, s0), (ltrans_t[1:], starts[1:]))

    prif, _ = gather_window(prior_final, s_last)
    pscore = pscore + prif

    last_w = jnp.argmax(pscore, axis=1).astype(jnp.int32)
    score = pscore[barange, last_w]
    last = s_last + last_w

    def back(pos, inputs):
        vm, s = inputs
        w = jnp.clip(pos - s, 0, W - 1)
        prev = vm[barange, w]
        return prev, pos

    first, rest = jax.lax.scan(back, last, (vmat, starts_out), reverse=True)
    path = jnp.concatenate([first[None], rest], axis=0)   # (T, B)
    return score, path.T
