"""Trainer-at-reference-scale proof on synthetic data (VERDICT r4 #2).

The bundled 8 reads cannot pin ~0.4M parameters (docs/training_quality:
scratch training reaches 100% train accuracy / 0.648 holdout — a data
limit, not a trainer limit).  This experiment removes the data limit with
the signal simulator (sloika_tpu/data/simulate.py): hundreds of synthetic
reads at the reference's own training budget (50k batches of 100 chunks,
/root/reference/bin/train_network.py:42-64), through the REAL pipeline —
``chunkify raw_identity`` -> ``cli.train raw raw_0.98_rgrgr`` ->
``cli.basecall`` -> accuracy vs ground truth.

Leakage control (the round-4 lesson):
  * TRAIN reads and VAL reads are disjoint read sets over genome region A;
    checkpoint selection = best val-chunk loss (never sees test data).
  * TEST reads come from genome region B, disjoint from region A, so the
    reported accuracy cannot come from sequence memorisation either.

Success criterion: mean holdout basecall accuracy >= 0.90 (the reference's
demonstrated model class: its pretrained.pkl scores ~0.87-0.89 on real
reads; synthetic chemistry is cleaner, so >=0.9 is the right bar).

Usage: python scripts/training_quality_synth.py OUTDIR
Env knobs (CPU smoke): SLOIKA_SYNTH_NREADS/NITER/SAVE/READ_LEN/GENOME_LEN.
"""
import glob
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "float32")

sys.path.insert(0, os.path.dirname(__file__))
import training_quality_r4 as tq

KLEN = 5
N_TRAIN = int(os.environ.get("SLOIKA_SYNTH_NREADS", 1200))
N_VAL = max(2, N_TRAIN // 20)
N_TEST = int(os.environ.get("SLOIKA_SYNTH_NTEST", 12))
READ_LEN = int(os.environ.get("SLOIKA_SYNTH_READ_LEN", 6000))
GENOME_LEN = int(os.environ.get("SLOIKA_SYNTH_GENOME_LEN", 400000))
REGION_SPLIT = int(GENOME_LEN * 0.75)    # region A | region B
NITER = int(os.environ.get("SLOIKA_SYNTH_NITER", 50000))
SAVE = int(os.environ.get("SLOIKA_SYNTH_SAVE", 2500))
BATCH = int(os.environ.get("SLOIKA_SYNTH_BATCH", 100))
MIN_SELECT_ITER = min(5000, NITER)   # frame-acc bootstrap ends ~3k (CLAUDE.md)


def build_reads(outdir, fh):
    from sloika_tpu.data import simulate
    genome = simulate.random_genome(GENOME_LEN, seed=0)
    region_a, region_b = genome[:REGION_SPLIT], genome[REGION_SPLIT:]
    dirs = {}
    for tag, region, n, seed in [
            ("train", region_a, N_TRAIN, 11),
            ("val", region_a, N_VAL, 22),
            ("test", region_b, N_TEST, 33)]:
        d = os.path.join(outdir, "reads_" + tag)
        t0 = time.time()
        # same genome object is NOT passed: each set samples its region only
        levels = simulate.pore_model(KLEN)
        rs = np.random.RandomState(seed)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            read = simulate.simulate_read(region, rs, read_len=READ_LEN,
                                          kmer_len=KLEN, levels=levels)
            simulate.write_fast5(
                os.path.join(d, "synth_%s_%04d.fast5" % (tag, i)), read,
                read_number=i)
        tq.log(fh, "simulated %d %s reads (%d bases) in %.1fs"
               % (n, tag, n * READ_LEN, time.time() - t0))
        dirs[tag] = d
    return dirs


def chunkify_dir(outdir, reads_dir, tag, fh):
    from sloika_tpu.cli import chunkify as chunkify_cli
    out = os.path.join(outdir, "chunks_%s.hdf5" % tag)
    t0 = time.time()
    chunkify_cli.main([
        "raw_identity", reads_dir, out, "--chunk_len", "2000",
        "--kmer_len", str(KLEN), "--downsample_factor", "5",
        "--trim", "0", "0", "--normalisation", "per-read", "--overwrite"])
    tq.log(fh, "chunkified %s in %.1fs -> %s" % (tag, time.time() - t0, out))
    return out


def basecall_and_score(layer, params, test_dir, fh, tag):
    """Basecall every test read; score each against its true sequence."""
    from sloika_tpu import align, basecall as bc
    from sloika_tpu.data.fast5 import Fast5
    files = sorted(glob.glob(os.path.join(test_dir, "*.fast5")))
    dacs, refs = [], []
    for fn in files:
        dac = bc.load_raw_dac(fn)
        dacs.append((dac[1], dac[2]))
        with Fast5(fn) as f5:
            refs.append(f5.get_reference_fasta().decode())
    caller = bc.Basecaller(layer, params, KLEN, batch_size=8, chunked=True,
                           chunk_size=32768, overlap=800, output="bases")
    out = caller.basecall_dac_reads(dacs)
    rows = []
    for fn, ref, res in zip(files, refs, out):
        if res is None:
            rows.append({"read": os.path.basename(fn), "accuracy": None})
            continue
        _, codes = res
        seq = "".join("ACGT"[c] for c in codes)
        m = align.accuracy_metrics(os.path.basename(fn), seq,
                                   os.path.basename(fn), ref)
        rows.append({"read": os.path.basename(fn),
                     "accuracy": None if m is None else
                     round(float(m["accuracy"]), 4),
                     "called_bases": len(seq), "ref_bases": len(ref)})
    accs = [r["accuracy"] for r in rows if r["accuracy"] is not None]
    mean = round(float(np.mean(accs)), 4) if accs else None
    tq.log(fh, "basecall[%s]: mean accuracy %s over %d/%d reads"
           % (tag, mean, len(accs), len(files)))
    return {"mean_accuracy": mean, "scored": len(accs), "reads": rows}


def eval_checkpoint_curve(training_dir, save_every, niter, val_data, fh,
                          label="checkpoint %d"):
    """Validate every saved checkpoint + the final model; the ONE shared
    implementation for the main run and the continuation driver (the
    duplicate-final trimming rule must stay in lockstep between them).

    :returns: (curve rows, checkpoint paths — last entry is model_final)
    """
    from sloika_tpu import serialize, training
    curve = []
    ckpts = sorted(glob.glob(os.path.join(training_dir,
                                          "model_checkpoint_*.npz")))
    # when niter is a multiple of save_every the last periodic checkpoint
    # duplicates model_final — drop it so the curve has unique iterations
    if niter % save_every == 0 and ckpts:
        ckpts = ckpts[:-1]
    ckpts.append(os.path.join(training_dir, "model_final.npz"))
    for ck in ckpts:
        layer, params, _ = serialize.load_checkpoint(ck)
        loss, acc = training.validate(layer, params, val_data,
                                      batch_size=100, drop=20, quiet=True)
        it = tq.checkpoint_iteration(ck, save_every, niter)
        curve.append({"iteration": it, "val_loss": round(float(loss), 4),
                      "val_accuracy": round(float(acc), 4),
                      "checkpoint": ck})
        tq.log(fh, (label + ": val loss %.4f acc %.2f%%")
               % (it, loss, 100 * acc))
    return curve, ckpts


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tq_synth"
    os.makedirs(outdir, exist_ok=True)
    fh = open(os.path.join(outdir, "synth.log"), "w")
    import jax
    tq.log(fh, "backend: %s devices: %s" % (jax.default_backend(),
                                            jax.devices()))
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.ones(4))())

    dirs = build_reads(outdir, fh)
    train_h5 = chunkify_dir(outdir, dirs["train"], "train", fh)
    val_h5 = chunkify_dir(outdir, dirs["val"], "val", fh)

    from sloika_tpu.data import hdf5
    val_data = hdf5.load_labelled_chunks(val_h5)
    with __import__("h5py").File(train_h5, "r") as h5:
        n_train_chunks = len(h5["chunks"])
    tq.log(fh, "train chunks: %d  val chunks: %d"
           % (n_train_chunks, len(val_data["chunks"])))

    from sloika_tpu import serialize
    from sloika_tpu.cli import train as train_cli
    training_dir = os.path.join(outdir, "train")
    t0 = time.time()
    train_cli.main([
        "raw", "raw_0.98_rgrgr", training_dir, train_h5,
        "--niteration", str(NITER), "--batch_size", str(BATCH),
        "--steps_per_dispatch", "10", "--save_every", str(SAVE),
        "--chunk_len_range", "1.0", "1.0", "--seed", "1", "--overwrite"])
    dt = time.time() - t0
    tq.log(fh, "scratch-trained %d iterations in %.1fs (%.0f chunks/s)"
           % (NITER, dt, NITER * BATCH / dt))

    # checkpoint curve: val loss only (cheap); basecall test reads at the
    # selected checkpoint and at final
    curve, ckpts = eval_checkpoint_curve(training_dir, SAVE, NITER,
                                         val_data, fh)
    best = tq.select_best(curve, min_iteration=MIN_SELECT_ITER)
    assert best is not None, "no finite-val-loss checkpoint"
    tq.log(fh, "best val checkpoint: it %d (val loss %s)"
           % (best["iteration"], best["val_loss"]))

    layer, params, _ = serialize.load_checkpoint(best["checkpoint"])
    res_best = basecall_and_score(layer, params, dirs["test"], fh,
                                  "best_it%d" % best["iteration"])
    layer, params, _ = serialize.load_checkpoint(ckpts[-1])
    res_final = basecall_and_score(layer, params, dirs["test"], fh, "final")

    summary = {
        "n_train_reads": N_TRAIN, "n_val_reads": N_VAL,
        "n_test_reads": N_TEST, "read_len": READ_LEN,
        "genome_len": GENOME_LEN, "region_split": REGION_SPLIT,
        "train_chunks": n_train_chunks, "niteration": NITER,
        "batch_size": BATCH, "train_seconds": round(dt, 1),
        "best_iteration": best["iteration"],
        "best_val_loss": best["val_loss"],
        "val_curve": [{k: v for k, v in c.items() if k != "checkpoint"}
                      for c in curve],
        "test_best": res_best, "test_final": res_final,
    }
    with open(os.path.join(outdir, "synth_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    tq.log(fh, "summary: " + json.dumps(
        {k: summary[k] for k in ("best_iteration", "train_chunks")}
        | {"test_best": res_best["mean_accuracy"],
           "test_final": res_final["mean_accuracy"]}))
    fh.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
