"""Interleaved A/B: lane-major (MXU expansion) vs state-major (sublane
interleave) Pallas Viterbi at the bench decode shape.

Method (docs/PERF.md): device-resident inputs, K dispatches per sync
(float pull), marginal over two T sizes to cancel dispatch+sync costs.
Run solo on the TPU.  Usage: python scripts/bench_viterbi_sm.py [B]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T_BIG, T_SMALL = 2048, 512
K = 1024


def make_post(T, rs):
    # dirichlet at full size is slow on host; approximate with softmax noise
    x = rs.normal(size=(T, B, K + 1)).astype(np.float32)
    p = np.exp(x - x.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return jnp.asarray(p, dtype=jnp.bfloat16)


def main():
    rs = np.random.RandomState(0)
    print("backend:", jax.default_backend(), "B =", B)
    np.asarray(jax.jit(lambda: jnp.ones(4))())   # d2h warmup

    post_big = make_post(T_BIG, rs)
    post_small = make_post(T_SMALL, rs)
    post_big_sm = jnp.asarray(np.moveaxis(np.asarray(
        post_big, dtype=np.float32), 2, 1), dtype=jnp.bfloat16)
    post_small_sm = jnp.asarray(np.moveaxis(np.asarray(
        post_small, dtype=np.float32), 2, 1), dtype=jnp.bfloat16)

    fwd_lanes = jax.jit(lambda p: pv.viterbi_forward(
        p, 5, skip_pen=5.0, time_major=True, take_log=True))
    fwd_sub = jax.jit(lambda p: pv.viterbi_forward_sm(
        p, 5, skip_pen=5.0, take_log=True))

    # parity first (same inputs, both layouts) on a small slice
    v1, t1 = fwd_lanes(post_small)
    v2, t2 = fwd_sub(post_small_sm)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2).T)
    np.testing.assert_array_equal(np.asarray(t1),
                                  np.moveaxis(np.asarray(t2), 1, 2))
    print("parity ok (vfinal + traceback bit-identical)")

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

    # transpose cost (the sublane layout's entry fee in the fused program)
    tr = jax.jit(lambda p: jnp.moveaxis(p, 2, 1))
    for _ in range(2):
        y = tr(post_big)
    t0 = time.time()
    for _ in range(4):
        y = tr(post_big)
    float(jnp.sum(y[0, 0].astype(jnp.float32)))
    print("transpose (T={}, B={}, {}): {:.1f} ms".format(
        T_BIG, B, K + 1, 1000.0 * (time.time() - t0) / 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
