"""Continue the synthetic-scale scratch run past the reference's 50k
default budget (the 50k val loss was still falling — the budget, not the
trainer or the data, was binding).  Resumes from the prior run's final
checkpoint at a reduced base rate and re-evaluates.

Usage: python scripts/training_quality_synth_continue.py PRIOR_OUTDIR \
           [extra_iterations] [rate]
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "float32")

sys.path.insert(0, os.path.dirname(__file__))
import training_quality_r4 as tq
import training_quality_synth as synth


def main():
    outdir = sys.argv[1]
    extra = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 3e-4
    save = int(os.environ.get("SLOIKA_SYNTH_SAVE", 5000))
    fh = open(os.path.join(outdir, "synth_continue.log"), "a")
    import jax
    tq.log(fh, "backend: %s" % jax.default_backend())
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.ones(4))())

    from sloika_tpu import serialize
    from sloika_tpu.cli import train as train_cli
    from sloika_tpu.data import hdf5

    train_h5 = os.path.join(outdir, "chunks_train.hdf5")
    val_data = hdf5.load_labelled_chunks(
        os.path.join(outdir, "chunks_val.hdf5"))
    init = os.path.join(outdir, "train", "model_final.npz")
    training_dir = os.path.join(outdir, "train_cont")
    t0 = time.time()
    train_cli.main([
        "raw", init, training_dir, train_h5,
        "--niteration", str(extra), "--batch_size", str(synth.BATCH),
        "--adam", str(rate), "0.9", "0.999",
        "--steps_per_dispatch", "10", "--save_every", str(save),
        "--chunk_len_range", "1.0", "1.0", "--seed", "2", "--overwrite"])
    dt = time.time() - t0
    tq.log(fh, "continued %d iterations in %.1fs (%.0f chunks/s)"
           % (extra, dt, extra * synth.BATCH / dt))

    curve, _ = synth.eval_checkpoint_curve(training_dir, save, extra,
                                           val_data, fh,
                                           label="checkpoint +%d")
    best = tq.select_best(curve)
    layer, params, _ = serialize.load_checkpoint(best["checkpoint"])
    res = synth.basecall_and_score(layer, params,
                                   os.path.join(outdir, "reads_test"), fh,
                                   "cont_best_it%d" % best["iteration"])
    summary = {"extra_iterations": extra, "rate": rate,
               "best_iteration": best["iteration"],
               "best_val_loss": best["val_loss"],
               "val_curve": [{k: v for k, v in c.items()
                              if k != "checkpoint"} for c in curve],
               "test_best": res}
    with open(os.path.join(outdir, "synth_continue_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    tq.log(fh, "summary: test accuracy %s at +%d iterations"
           % (res["mean_accuracy"], best["iteration"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
