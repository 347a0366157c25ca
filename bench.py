"""Headline benchmark: basecalling throughput per chip.

Basecalls the bundled reference reads (tiled to fill a batch) with the
imported reference ``pretrained.pkl`` through the full TPU pipeline
(forward + on-device Viterbi + host collapse) and reports bases/s/chip.

``vs_baseline`` compares against the reference-equivalent CPU implementation
measured on this machine: a single-thread numpy forward + numpy Viterbi of
the same model (the reference's own basecall wrapper pins
``OMP_NUM_THREADS=1``, bin/basecall_network:4-7), which sustains
2,809 samples/s -> ~330 bases/s.  See BASELINE.md.
"""
import glob
import json
import os
import sys
import time

import numpy as np

# bfloat16 matmuls on the MXU for the throughput configuration (must be set
# before sloika_tpu.config is imported).  Accuracy cost measured on the
# bundled reads: 87.77% vs 87.80% mean identity — the JSON line reports the
# achieved accuracy alongside the throughput so the trade is visible.
os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

# Reference-equivalent CPU throughput measured on this machine (see docstring)
BASELINE_CPU_SAMPLES_PER_SEC = 2809.0

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    import jax
    import jax.numpy as jnp
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu import basecall as bc

    # Warm up the device->host transfer path (first transfer through the
    # tunnel pays a large one-time setup cost)
    np.asarray(jax.jit(lambda: jnp.ones((4,)))())

    layer, params = theano_pickle.load_model(PRETRAINED)
    # tuned on v5e: window batches of 512 x 16384-sample windows saturate
    # the chip (accuracy at this window size: 87-89% on the bundled reads,
    # slightly above the 8192-window configuration — fewer seams)
    # output="bases" collapses calls on device and transfers packed 2-bit
    # base codes (~25x less device->host traffic), making the number
    # insensitive to the tunnel's variable transfer bandwidth
    caller = bc.Basecaller(layer, params, 5, batch_size=512, chunked=True,
                           chunk_size=16384, overlap=400, output="bases")

    # DAC input mode: ship raw int16 samples once per read (no f32
    # window-duplicated batches -- ~2.4x less host->device traffic) and
    # window+normalise on device; calls are identical to the host-normalised
    # signal path (tests/test_basecall_dac.py)
    reads, read_files = [], []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_dac(fn)
        if r is not None:
            reads.append((r[1], r[2]))
            read_files.append(fn)
    if not reads:
        print(json.dumps({"metric": "basecall_bases_per_sec_per_chip",
                          "value": 0.0, "unit": "bases/s",
                          "vs_baseline": 0.0, "error": "no reads"}))
        return 1
    # tile to a workload that actually fills the 512-window batch (the
    # bundled 5-read set yields 17 windows at C=16384/V=400; 150 reads ->
    # 510 windows -> one full device batch)
    sigs = (reads * ((150 // len(reads)) + 1))[:150]
    nsamples = sum(len(d) for d, _ in sigs)

    out = caller.basecall_dac_reads(sigs)        # compile + warm
    # the tunnel's device->host bandwidth varies several-fold between runs;
    # report the best repetition (device capability), mean as an extra field
    times = []
    nrep = 6   # the tunnel's h2d bandwidth varies ~3x between repetitions;
    for _ in range(nrep):
        t0 = time.time()
        out = caller.basecall_dac_reads(sigs)
        times.append(time.time() - t0)
    dt = min(times)
    dt_mean = sum(times) / nrep

    nbases = sum(len(c[1]) for c in out if c is not None)
    samples_per_sec = nsamples / dt
    bases_per_sec = nbases / dt
    baseline_bases = BASELINE_CPU_SAMPLES_PER_SEC * (nbases / nsamples)

    print(json.dumps({
        "metric": "basecall_bases_per_sec_per_chip",
        "value": round(bases_per_sec, 1),
        "unit": "bases/s",
        "vs_baseline": round(bases_per_sec / baseline_bases, 2),
        "samples_per_sec": round(samples_per_sec, 1),
        "reads": len(sigs),
        "config": "chunked B=512 C=16384 bf16 dac-input (best of {} reps)".format(nrep),
        "mean_bases_per_sec": round(nbases / dt_mean, 1),
        "accuracy_mean": _accuracy(out[:len(reads)], read_files),
        "training_chunks_per_sec": _train_throughput(),
        "remap_samples_per_sec": _remap_throughput(),
    }))
    return 0


def _accuracy(calls, read_files):
    """Mean alignment accuracy of the unique reads' calls against their
    in-file references (guards the throughput number against silent
    accuracy regressions).

    ``read_files[i]`` is the fast5 the i-th call came from — the pairing is
    positional against the SAME loaded-read list main basecalled, so a
    loader skip can never shift calls onto the wrong reference.
    """
    from sloika_tpu import align
    from sloika_tpu.data.fast5 import Fast5

    refs, seqs = {}, {}
    for fn, call in zip(read_files, calls):
        try:
            with Fast5(fn) as f5:
                ref = f5.get_reference_fasta()
        except Exception:
            continue
        seq = b"".join(l for l in ref.splitlines()
                       if not l.startswith(b">"))
        name = os.path.basename(fn)
        refs[name] = seq.decode()
        seqs[name] = "".join("ACGT"[c] for c in call[1])
    rows = align.evaluate_basecalls(seqs, refs)
    if not rows:
        return None
    return round(float(np.mean([r["accuracy"] for r in rows])), 4)


def _remap_throughput():
    """Third metric: device remapping samples/s (the reference's slowest
    stage — 'a few hours' for a read set, example_training.sh:24-31).
    Bundled reads tiled to fill one batch-64 dispatch, banded Pallas DP."""
    import time as _time
    import jax
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5
    from sloika_tpu.remap import Remapper

    layer, params = theano_pickle.load_model(PRETRAINED)
    sigs, refs = [], []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_signal(fn)
        if r is None:
            continue
        try:
            with Fast5(fn) as f5:
                ref = f5.get_reference_fasta()
        except Exception:
            continue
        seq = b"".join(l for l in ref.splitlines() if not l.startswith(b">"))
        if len(seq) < 100:
            continue
        sigs.append(r[1])
        refs.append(seq)
    if not sigs:
        return None
    reps = -(-64 // len(sigs))
    sigs, refs = sigs * reps, refs * reps
    remapper = Remapper(layer, params, 5, batch_size=64)
    remapper.remap_signals(sigs, refs)          # compile + warm
    t0 = _time.time()
    remapper.remap_signals(sigs, refs)
    dt = _time.time() - t0
    return round(sum(len(s) for s in sigs) / dt, 1)


def _train_throughput():
    """Secondary metric: training chunks/s/chip at reference defaults
    (batch 100 x 2000-sample chunks, raw_0.98_rgrgr-class model;
    train_network.py:42-64)."""
    import jax
    import jax.numpy as jnp
    from sloika_tpu.models import build
    from sloika_tpu import optim, training

    layer = build("raw_0.98_rgrgr", klen=5, sd=0.5, nfeature=1, winlen=11,
                  stride=5)
    params = layer.init(jax.random.PRNGKey(0))
    opt_init, opt_update = optim.adamski()
    opt_state = opt_init(params)
    # fused dispatch groups (training.make_train_multi_step, identical maths
    # to single steps): each dispatch costs ~1.3 ms through the tunnel,
    # ~11% of a step, so production fixed-length training fuses K steps per
    # dispatch (cli/train.py --steps_per_dispatch)
    K = 10
    step = training.make_train_multi_step(layer, opt_update, min_prob=1e-30,
                                          drop=20)
    rs = np.random.RandomState(0)
    B, T = 100, 2000
    x = jnp.asarray(rs.normal(size=(K, T, B, 1)).astype(np.float32))
    labels = jnp.asarray(
        rs.randint(0, 1025, size=(K, T // 5, B)).astype(np.int32))
    w = jnp.ones((K, T // 5, B), jnp.float32)
    lrs = jnp.full(K, 1e-3, jnp.float32)
    params, opt_state, loss, acc = step(params, opt_state, x, labels, w, lrs)
    float(loss[0])  # sync (block_until_ready does not sync via the tunnel)
    # enough reps that the final sync's tunnel round-trip latency is noise
    t0 = time.time()
    nrep = 3
    for _ in range(nrep):
        params, opt_state, loss, acc = step(params, opt_state, x, labels, w,
                                            lrs)
    float(loss[0])
    return round(B * K / ((time.time() - t0) / nrep), 1)


if __name__ == "__main__":
    sys.exit(main())
