"""Compare Viterbi-kernel strategy variants on TPU (run solo).

Parity (exact traceback + final-score equality vs the default) and timing
of the score-expansion / skip-max strategies in ops/pallas/viterbi at the
bench shape.

    python scripts/bench_viterbi_expand.py [case ...] [--batch B] [--T T]

Cases (default: highest derived): see CASES below.  Run subsets — each
case pays a slow remote compile, so a full sweep needs a generous timeout.
"""
import sys
import time

import numpy as np

# label -> (take_log, expand, unroll, skip_pen, skip_max)
CASES = {
    "highest": (True, "highest", 1, 5.0, "direct"),
    "split3": (True, "split3", 1, 5.0, "direct"),
    "bf16": (True, "bf16", 1, 5.0, "direct"),
    "reshape": (True, "reshape", 1, 5.0, "direct"),
    "reshape-derived": (True, "reshape", 1, 5.0, "derived"),
    "noskip": (True, "split3", 1, float("inf"), "direct"),
    "derived": (True, "highest", 1, 5.0, "derived"),
    "derived-split3": (True, "split3", 1, 5.0, "derived"),
    "unroll4": (True, "highest", 4, 5.0, "direct"),
}


def main():
    args = [a for a in sys.argv[1:]]
    batches, T = [128], 3277
    if "--batch" in args:
        i = args.index("--batch")
        batches = [int(b) for b in args[i + 1].split(",")]; del args[i:i + 2]
    if "--T" in args:
        i = args.index("--T")
        T = int(args[i + 1]); del args[i:i + 2]
    labels = args or ["highest", "derived"]

    import jax
    import jax.numpy as jnp
    from sloika_tpu.ops.pallas import viterbi as pv

    np.asarray(jax.jit(lambda: jnp.ones(4))())

    for B in batches:
        print("=== batch %d x T %d ===" % (B, T), flush=True)
        _run_cases(jax, jnp, pv, labels, B, T)
    return 0


def _run_cases(jax, jnp, pv, labels, B, T):
    rs = np.random.RandomState(0)
    post = rs.dirichlet(np.full(1025, 0.05), size=(T, B)).astype(np.float32)
    post = jnp.asarray(1e-5 + (1.0 - 1e-5) * post)
    lpost = jnp.log(post + 1e-10)

    results = {}
    for label in labels:
        take_log, mode, U, spen, smax = CASES[label]
        x = post if take_log else lpost
        fn = jax.jit(lambda p, m=mode, tl=take_log, u=U, sp=spen, sm=smax:
                     pv.viterbi_forward(p, 5, skip_pen=sp, time_major=True,
                                        take_log=tl, expand=m, unroll=u,
                                        skip_max=sm))
        try:
            t0 = time.time()
            vfinal, tb = fn(x)
            float(jnp.sum(vfinal))
            print("%-14s compile+run %.1f s" % (label, time.time() - t0),
                  flush=True)
        except Exception as e:
            print("%-14s FAILED: %s" % (label, str(e)[:200]), flush=True)
            continue
        # amortise the ~32 ms tunnel sync round-trip over several dispatches
        reps = 8
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                vfinal, tb = fn(x)
            float(jnp.sum(vfinal))
            ts.append((time.time() - t0) / reps)
        results[label] = (np.asarray(vfinal), np.asarray(tb))
        print("%-14s %7.1f ms (best of 3x%d; mean %.1f; %.2f us/step)" %
              (label, min(ts) * 1e3, reps, np.mean(ts) * 1e3,
               min(ts) * 1e6 / T), flush=True)

    base = labels[0]
    if base in results:
        vf0, tb0 = results[base]
        for mode, (vf, tb) in results.items():
            if mode == base:
                continue
            same_v = np.array_equal(vf0, vf)
            same_t = np.array_equal(tb0, tb)
            print("%-14s parity vs %s: vfinal %s traceback %s" %
                  (mode, base, "EXACT" if same_v else
                   "max|d|=%.3g" % np.abs(vf0 - vf).max(),
                   "EXACT" if same_t else
                   "%d codes differ" % (tb0 != tb).sum()), flush=True)


if __name__ == "__main__":
    sys.exit(main())
