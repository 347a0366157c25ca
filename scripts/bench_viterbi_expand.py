"""Compare Viterbi-kernel score-expansion strategies on TPU (run solo).

Parity (exact traceback + final-score equality) and timing of the three
expansion modes in ops/pallas/viterbi._expand_scores at the bench shape.

    python scripts/bench_viterbi_expand.py [batch] [T]
"""
import sys
import time

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 3277

    import jax
    import jax.numpy as jnp
    from sloika_tpu.ops.pallas import viterbi as pv

    np.asarray(jax.jit(lambda: jnp.ones(4))())

    rs = np.random.RandomState(0)
    post = rs.dirichlet(np.full(1025, 0.05), size=(T, B)).astype(np.float32)
    post = jnp.asarray(1e-5 + (1.0 - 1e-5) * post)

    lpost = jnp.log(post + 1e-10)

    results = {}
    cases = [("highest", True, "highest", 1, 5.0),
             ("split3", True, "split3", 1, 5.0),
             ("bf16", True, "bf16", 1, 5.0),
             ("noskip", True, "split3", 1, float("inf")),
             ("noskip-bf16", True, "bf16", 1, float("inf"))]
    for label, take_log, mode, U, spen in cases:
        x = post if take_log else lpost
        fn = jax.jit(lambda p, m=mode, tl=take_log, u=U, sp=spen:
                     pv.viterbi_forward(p, 5, skip_pen=sp, time_major=True,
                                        take_log=tl, expand=m, unroll=u))
        try:
            vfinal, tb = fn(x)
            float(jnp.sum(vfinal))
        except Exception as e:
            print("%-12s FAILED: %s" % (label, str(e)[:200]))
            continue
        ts = []
        for _ in range(4):
            t0 = time.time()
            vfinal, tb = fn(x)
            float(jnp.sum(vfinal))
            ts.append(time.time() - t0)
        results[label] = (np.asarray(vfinal), np.asarray(tb))
        print("%-12s %7.1f ms (best of 4; mean %.1f)" %
              (label, min(ts) * 1e3, np.mean(ts) * 1e3))

    if "highest" in results:
        vf0, tb0 = results["highest"]
        for mode, (vf, tb) in results.items():
            if mode == "highest":
                continue
            same_v = np.array_equal(vf0, vf)
            same_t = np.array_equal(tb0, tb)
            print("%-8s parity vs highest: vfinal %s traceback %s" %
                  (mode, "EXACT" if same_v else
                   "max|d|=%.3g" % np.abs(vf0 - vf).max(),
                   "EXACT" if same_t else
                   "%d codes differ" % (tb0 != tb).sum()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
