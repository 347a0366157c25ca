"""Interleaved A/B: lane-major (MXU expansion) vs state-major (sublane
interleave) Pallas Viterbi at the production block size.

Method (docs/PERF.md): device-resident inputs generated ON DEVICE (a
host-built (T, B, K) posterior is gigabytes — feeding it through the
tunnel at ~22-70 MB/s h2d wedges the chip; CLAUDE.md), K dispatches per
sync (scalar pull), marginal over two T sizes to cancel dispatch + sync
costs.  Run solo on the TPU.

Usage: python scripts/bench_viterbi_sm.py [B] [T_BIG] [T_SMALL]
"""
import os
import sys
import time

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from sloika_tpu.ops.pallas import viterbi as pv   # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
T_BIG = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
T_SMALL = int(sys.argv[3]) if len(sys.argv) > 3 else 256
K = 1024


from functools import partial                      # noqa: E402


@partial(jax.jit, static_argnums=(1,))
def make_post(key, T):
    x = jax.random.normal(key, (T, B, K + 1), dtype=jnp.float32)
    return jax.nn.softmax(x, axis=-1).astype(jnp.bfloat16)


def main():
    print("backend:", jax.default_backend(), "B =", B,
          "T =", T_BIG, "/", T_SMALL)
    np.asarray(jax.jit(lambda: jnp.ones(4))())   # d2h warmup

    key = jax.random.PRNGKey(0)
    post_big = make_post(key, T_BIG)
    post_small = post_big[:T_SMALL]
    tr = jax.jit(lambda p: jnp.moveaxis(p, 2, 1))
    post_big_sm = tr(post_big)
    post_small_sm = tr(post_small)

    fwd_lanes = jax.jit(lambda p: pv.viterbi_forward(
        p, 5, skip_pen=5.0, time_major=True, take_log=True))
    fwd_sub = jax.jit(lambda p: pv.viterbi_forward_sm(
        p, 5, skip_pen=5.0, take_log=True))

    # parity first (same inputs, both layouts) on the small slice
    v1, t1 = fwd_lanes(post_small)
    v2, t2 = fwd_sub(post_small_sm)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2).T)
    np.testing.assert_array_equal(np.asarray(t1),
                                  np.moveaxis(np.asarray(t2), 1, 2))
    print("parity ok (vfinal + traceback bit-identical)")

    # warm the BIG shapes too: their first execution is a multi-second
    # remote compile — inside the timed region it would inflate round 0's
    # marginal and the printed mean (the min was always valid)
    for fn, big in ((fwd_lanes, post_big), (fwd_sub, post_big_sm)):
        v, _ = fn(big)
        float(jnp.sum(v))

    res = {}
    for r in range(6):
        for name, fn, big, small in (("lanes", fwd_lanes, post_big,
                                      post_small),
                                     ("sublanes", fwd_sub, post_big_sm,
                                      post_small_sm)):
            ts = {}
            for tag, arg in (("big", big), ("small", small)):
                t0 = time.time()
                for _ in range(4):
                    v, tb = fn(arg)
                float(jnp.sum(v))
                ts[tag] = (time.time() - t0) / 4
            res.setdefault(name, []).append(
                1000.0 * (ts["big"] - ts["small"]))
    for name in ("lanes", "sublanes"):
        xs = np.array(res[name])
        us_per_step = 1000.0 * xs / (T_BIG - T_SMALL)
        print("{}: marginal {:.1f} ms best / {:.1f} ms mean over {} steps "
              "-> {:.2f} us/step best ({:.2f} mean)".format(
                  name, xs.min(), xs.mean(), T_BIG - T_SMALL,
                  us_per_step.min(), us_per_step.mean()))

    # transpose cost (the sublane layout's entry fee in the fused program),
    # marginal over the two sizes so dispatch + sync cancel
    for _ in range(2):
        y = tr(post_big)
    tts = {}
    for tag, arg in (("big", post_big), ("small", post_small)):
        t0 = time.time()
        for _ in range(4):
            y = tr(arg)
        float(jnp.sum(y[0, 0].astype(jnp.float32)))
        tts[tag] = (time.time() - t0) / 4
    print("transpose marginal ({} rows, B={}, {}): {:.2f} ms "
          "({:.2f} us/step)".format(
              T_BIG - T_SMALL, B, K + 1,
              1000.0 * (tts["big"] - tts["small"]),
              1000.0 * (tts["big"] - tts["small"]) / (T_BIG - T_SMALL)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
