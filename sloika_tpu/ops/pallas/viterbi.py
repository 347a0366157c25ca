"""Pallas TPU kernel for the kmer-transducer Viterbi forward pass.

The DP is sequential in time, so the kernel runs with ``grid=(T,)`` — Pallas
TPU grids execute sequentially on a core, letting the (batch, nkmer) score
vector live in VMEM scratch across steps while Pallas double-buffers the
per-step posterior loads and traceback stores to HBM automatically.

Per step (identical math to decode_np.viterbi / decode_jax.viterbi,
reference decode.py:39-93), reformulated for the TPU's layout rules:

* the predecessor max over the ``n`` leading-base groups is an elementwise
  max over contiguous 2-D lane slices (state ``g*nrem + r`` lives at lane
  ``g*nrem + r``), with the arg-group carried by compare/select;
* the per-group results are broadcast back to all ``K`` destinations with a
  small MXU matmul against a constant 0/1 expansion matrix
  ``E[r, i] = [i // nbase == r]`` — Mosaic supports no elementwise
  lane-repeat, but a (B, nrem) x (nrem, K) matmul is essentially free;
* traceback stores a compact int8 *code* per destination instead of the
  full predecessor index: -1 = stay, g in [0, nbase) = step from group g,
  nbase + g = skip from group g.  The predecessor state is reconstructed in
  the backward gather as ``g * nrem + state // n`` — 4x less traceback
  bandwidth than int32 indices;
* the stay/blank posterior column arrives as a separate (B, 1) input so the
  kmer block stays 128-lane aligned.

VMEM budget: the batch is blocked into <= 256-row groups (outer grid
dimension), so the working set — scores scratch, double-buffered posterior
loads and traceback stores, the two expansion matrices — stays ~6 MiB
regardless of device batch size; the (T, B, K) int8 traceback streams to
HBM.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sloika_tpu import variables as sv

_ETA = 1e-10


def _expansion_matrix(nrem, K, n):
    """E[r, i] = 1 where destination i draws from group element i // n."""
    e = np.zeros((nrem, K), dtype=np.float32)
    e[np.arange(K) // n, np.arange(K)] = 1.0
    return e


def _group_max(p, n, nrem, B, E):
    """(max, arg-group) over leading-base groups, broadcast to (B, K)."""
    mx = p[:, 0:nrem]
    am = jnp.zeros((B, nrem), jnp.float32)
    for g in range(1, n):
        cand = p[:, g * nrem:(g + 1) * nrem]
        better = cand > mx
        mx = jnp.where(better, cand, mx)
        am = jnp.where(better, jnp.float32(g), am)
    # scores need the full f32 mantissa through the MXU (the default bf16
    # pass loses ~8 bits); the group indices are small integers, exact in
    # bf16, so that dot can use the fast path
    score = jnp.dot(mx, E, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    group = jnp.dot(am, E, preferred_element_type=jnp.float32)
    return score, group


def _fwd_kernel(lpk_ref, lps_ref, estep_ref, eskip_ref, tb_ref, vfinal_ref,
                vscore, *, nstep, nskip, skip_pen, K, B, take_log):
    # grid = (batch blocks, T): the last dimension iterates fastest, so each
    # batch block sweeps the whole DP (scratch re-initialised at t == 0)
    # before the next block starts
    t = pl.program_id(1)
    T = pl.num_programs(1)
    lpk = lpk_ref[0]                   # (B, K) kmer posteriors
    lps = lps_ref[0]                   # (B, 1) stay posterior
    if take_log:
        # log taken in-kernel (VPU, hidden under the posterior DMA) so the
        # caller streams raw probabilities — avoids materialising a second
        # full-size (T, B, K) log tensor in HBM
        lpk = jnp.log(lpk + _ETA)
        lps = jnp.log(lps + _ETA)

    @pl.when(t == 0)
    def _init():
        vscore[:] = lpk
        tb_ref[0] = jnp.full((B, K), -1, dtype=jnp.int8)

    @pl.when(t > 0)
    def _step():
        p = vscore[:]
        score_step, g_step = _group_max(p, nstep, K // nstep, B, estep_ref[:])
        score_skip, g_skip = _group_max(p, nskip, K // nskip, B, eskip_ref[:])
        score_skip = score_skip - skip_pen

        new = lpk + jnp.maximum(score_step, score_skip)
        code = jnp.where(score_step > score_skip, g_step,
                         jnp.float32(nstep) + g_skip)

        score_stay = p + lps
        code = jnp.where(new > score_stay, code, jnp.float32(-1))
        vscore[:] = jnp.maximum(new, score_stay)
        tb_ref[0] = code.astype(jnp.int8)

    @pl.when(t == T - 1)
    def _final():
        vfinal_ref[:] = vscore[:]


def viterbi_forward(lpost, klen, skip_pen=0.0, nbase=4, time_major=False,
                    take_log=False):
    """Pallas forward pass.

    :param lpost: (B, T, nstate) — or, with ``time_major``, (T, B, nstate) —
        posteriors, *log*-domain unless ``take_log`` (column 0 = stay).
        The time-major + take_log form is the transfer-lean production
        entry: the model forward's output feeds the kernel without a
        transpose, and the log runs in-kernel, so no second full-size
        tensor is ever materialised in HBM.
    :returns: (vfinal (B, K) final scores, traceback codes (T, B, K) int8)
    """
    if time_major:
        T, B, nst = lpost.shape
        lpost_t = lpost
    else:
        B, T, nst = lpost.shape
        lpost_t = jnp.moveaxis(lpost, 1, 0)  # (T, B, nstate)
    K = sv.nkmer(klen, nbase=nbase)
    assert nst == K + 1

    lp_kmer = lpost_t[:, :, 1:]
    lp_stay = lpost_t[:, :, 0:1]

    # block the batch so the VMEM working set (scores scratch + streamed
    # posterior/traceback buffers) stays bounded at large device batches:
    # a (512, 1024) unblocked call exceeds the ~16 MiB scoped-vmem limit
    BB = min(B, 256)
    Bp = -(-B // BB) * BB
    if Bp != B:
        lp_kmer = jnp.pad(lp_kmer, ((0, 0), (0, Bp - B), (0, 0)))
        lp_stay = jnp.pad(lp_stay, ((0, 0), (0, Bp - B), (0, 0)))
    e_step = jnp.asarray(_expansion_matrix(K // nbase, K, nbase))
    e_skip = jnp.asarray(_expansion_matrix(K // (nbase * nbase), K,
                                           nbase * nbase))

    kernel = partial(_fwd_kernel, nstep=nbase, nskip=nbase * nbase,
                     skip_pen=float(skip_pen), K=K, B=BB, take_log=take_log)
    traceback, vfinal = pl.pallas_call(
        kernel,
        grid=(Bp // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, K), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // nbase, K), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // (nbase * nbase), K), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, K), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, K), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, K), jnp.int8),
            jax.ShapeDtypeStruct((Bp, K), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, K), jnp.float32)],
        interpret=_use_interpret(),
    )(lp_kmer, lp_stay, e_step, e_skip)
    return vfinal[:B], traceback[:, :B]


def _use_interpret():
    return jax.default_backend() not in ("tpu",)


@partial(jax.jit, static_argnames=("klen", "nbase", "log", "skip_pen",
                                   "time_major"))
def viterbi(post, klen, skip_pen=0.0, log=False, nbase=4, time_major=False):
    """Drop-in replacement for decode_jax.viterbi using the Pallas forward.

    With ``time_major`` the input is (T, B, nstate) — the model forward's
    native layout — and no transpose is materialised.  Probability-domain
    input (``log=False``) has its log taken inside the kernel, so no second
    full-size log tensor touches HBM either.

    :returns: (score (B,), path (B, T) int32, moved (B, T) bool)
    """
    if time_major:
        T, B, nst = post.shape
    else:
        B, T, nst = post.shape
    K = nst - 1
    nstep = nbase
    nskip = nbase * nbase
    vfinal, traceback = viterbi_forward(post, klen, skip_pen=skip_pen,
                                        nbase=nbase, time_major=time_major,
                                        take_log=not log)

    score = jnp.max(vfinal, axis=1)
    last_state = jnp.argmax(vfinal, axis=1).astype(jnp.int32)

    def back_step(state, tb):
        c = tb[jnp.arange(B), state].astype(jnp.int32)
        prev_step = c * (K // nstep) + state // nstep
        prev_skip = (c - nstep) * (K // nskip) + state // nskip
        moved = c >= 0
        prev = jnp.where(c < nstep, prev_step, prev_skip)
        new_state = jnp.where(moved, prev, state)
        return new_state, (state, moved)

    first_state, (states, moved) = jax.lax.scan(
        back_step, last_state, traceback[1:], reverse=True)
    path = jnp.concatenate([first_state[None], states], axis=0)
    moved = jnp.concatenate([jnp.zeros((1, B), bool), moved], axis=0)
    return score, path.T, moved.T
