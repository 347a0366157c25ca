"""ON-HARDWARE layout parity: lanes vs sublanes fed the IDENTICAL
posterior at the production fused-program shape (T=3277 frames = C=16384
at stride 5, full kmer width).

This is the evidence behind the "bit-identical given the same input"
claim at production scale — the CPU interpreter parity tests
(tests/test_pallas_viterbi.py) cannot exercise Mosaic's hardware
lowering, and the fused-program A/B CANNOT check it (its two arms are
separate XLA compilations whose bf16 forwards reorder reductions, so
their posteriors differ in ulps and occasional argmax decisions flip —
observed 2026-08-20; scripts/bench_viterbi_layout_fused.py reports that
agreement rate instead of asserting it).

Inputs are device-generated (a host-built (T, B, K) posterior is
gigabytes through the tunnel, CLAUDE.md) and B=512 keeps the peak
footprint ~8.6 GB (posterior + its transpose + one traceback).

Run solo on the TPU.  Expected output: all three "equal: True".
"""
import os
import sys

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from sloika_tpu.ops.pallas import viterbi as pv   # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 3277
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def main():
    print("backend:", jax.default_backend(), "T =", T, "B =", B)
    np.asarray(jax.jit(lambda: jnp.ones(4))())

    @jax.jit
    def gen(key):
        # two T-halves so the f32 softmax temp stays ~3.5 GB
        h = []
        for i, k in enumerate(jax.random.split(key, 2)):
            x = jax.random.normal(k, (T // 2 + (i == 0) * (T % 2), B, 1025),
                                  dtype=jnp.float32)
            h.append(jax.nn.softmax(x, axis=-1).astype(jnp.bfloat16))
        return jnp.concatenate(h, axis=0)

    post = gen(jax.random.PRNGKey(7))
    outs = {}
    for layout in ("lanes", "sublanes"):
        s, p, m = pv.viterbi(post, 5, skip_pen=5.0, time_major=True,
                             layout=layout)
        outs[layout] = (np.asarray(s), np.asarray(p), np.asarray(m))
        print(layout, "done")
    s1, p1, m1 = outs["lanes"]
    s2, p2, m2 = outs["sublanes"]
    ok = (np.array_equal(s1, s2), np.array_equal(p1, p2),
          np.array_equal(m1, m2))
    print("score equal: %s path equal: %s moved equal: %s" % ok)
    if not all(ok):
        db = np.nonzero(~np.all(p1 == p2, axis=1))[0]
        print("differing rows:", len(db), db[:8])
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
