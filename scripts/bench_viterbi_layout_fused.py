"""Interleaved ONE-PROCESS A/B of the production fused DAC basecall
program (window + normalise + forward + Viterbi + collapse) with the two
Pallas Viterbi layouts (lanes vs sublanes), at the bench shape.

Separate-process comparisons are invalid through the tunnel (CLAUDE.md);
this builds two Basecaller programs in one process — the layout is passed
EXPLICITLY (``Basecaller(viterbi_layout=...)``): the first version of
this script flipped ``SLOIKA_TPU_VITERBI_LAYOUT`` between builds, which
the inner jit's trace cache silently ignored (both arms dispatched the
lanes kernel — the round-5 code review caught it; the committed "dead
even" verdict from that run measured lanes vs lanes).  The two layouts
are bit-identical (tests/test_pallas_viterbi.py), so this is purely a
timing decision; a cross-arm header checksum asserts both arms really
ran and agree.

Usage: python scripts/bench_viterbi_layout_fused.py [B] [rounds]
"""
import glob
import os
import sys
import time

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

import numpy as np

sys.path.insert(0, "/root/repo")

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    C = 16384
    import jax
    import jax.numpy as jnp
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle

    print("backend:", jax.default_backend(), "B =", B)
    np.asarray(jax.jit(lambda: jnp.ones(4))())

    layer, params = theano_pickle.load_model(PRETRAINED)
    reads = []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_dac(fn)
        if r is not None:
            reads.append((r[1], r[2]))

    # one device-resident flat buffer + window jobs, shared by both programs
    read_lens = [len(d) for d, _ in reads]
    S = int(np.sum(read_lens)) + C
    flat = np.zeros(S, np.int16)
    offsets = np.zeros(len(reads), np.int64)
    pos = 0
    for i, (d, _) in enumerate(reads):
        offsets[i] = pos
        flat[pos:pos + len(d)] = d
        pos += len(d)
    flat_d = jnp.asarray(flat)
    jobs = [(r, w, int(offsets[r]) + start, ln)
            for r, w, start, ln, _ in bc._window_jobs(read_lens, C, 400)]
    jobs = (jobs * (B // len(jobs) + 1))[:B]
    starts = jnp.asarray(np.array([j[2] for j in jobs], np.int32))
    lengths = jnp.asarray(np.array([j[3] for j in jobs], np.int32))
    norms = jnp.asarray(np.array([reads[j[0]][1] for j in jobs], np.float32))
    nsamp = int(np.sum([j[3] for j in jobs]))

    runs = {}
    headers = {}
    for layout in ("lanes", "sublanes"):
        caller = bc.Basecaller(layer, params, 5, batch_size=B, chunked=True,
                               chunk_size=C, overlap=400, output="bases",
                               viterbi_layout=layout)
        run = caller._forward_decode_dac(S)
        h, _ = run(caller.params, flat_d, starts, lengths, norms)
        headers[layout] = np.asarray(h)      # compile + warm
        runs[layout] = (caller.params, run)
        print("built + warmed", layout)
    # the arms must be genuinely distinct programs (host-side lowering
    # only): equal HLO means the layout knob did not reach the kernel and
    # the A/B would time the same program twice
    texts = [runs[l][1].lower(runs[l][0], flat_d, starts, lengths,
                              norms).as_text() for l in runs]
    assert texts[0] != texts[1], \
        "both arms lowered to identical HLO — layout knob ignored"
    # Header agreement is reported, NOT asserted: the Viterbi layouts are
    # bit-identical GIVEN the same posterior (verified on hardware at the
    # production (T=3277, B=512) shape), but the two fused programs are
    # separate XLA compilations whose bf16 forwards may reorder
    # reductions — ulp-level posterior differences flip occasional
    # argmax/tie decisions.  A large disagreement would still indicate a
    # real bug, so the count is printed for eyeballing.
    nrow = len(headers["lanes"])
    same = int(np.sum(np.all(headers["lanes"] == headers["sublanes"],
                             axis=1)))
    print("arms distinct (HLO differs); header rows identical: %d/%d "
          "(cross-compile bf16 forward noise accounts for the rest)"
          % (same, nrow))

    NDISP = 8
    res = {}
    for r in range(rounds):
        for layout, (p, run) in runs.items():
            t0 = time.time()
            for _ in range(NDISP):
                h, _ = run(p, flat_d, starts, lengths, norms)
            np.asarray(h)
            res.setdefault(layout, []).append((time.time() - t0) / NDISP)
    for layout, ts in res.items():
        ts = np.array(ts)
        print("{:9s} {:7.1f} ms best / {:7.1f} mean -> {:.1f} Msamples/s "
              "best ({:.1f} mean)".format(
                  layout, 1e3 * ts.min(), 1e3 * ts.mean(),
                  nsamp / ts.min() / 1e6, nsamp / ts.mean() / 1e6))
    return 0


if __name__ == "__main__":
    sys.exit(main())
