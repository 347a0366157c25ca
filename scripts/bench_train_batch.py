"""Training-throughput batch sweep (one process, interleaved reps).

The bench's headline training number pins the reference defaults
(B=100 x T=2000, train_network.py:42-64).  This sweep documents how far
the same fused multi-step trainer scales when the batch grows — the
recurrence latency floor (docs/PERF.md "Roofline") amortises across rows,
so larger batches should raise chunks/s until the marginal term dominates.

Usage: python scripts/bench_train_batch.py [out.json]
"""
import json
import os
import sys
import time

import numpy as np

PRETRAINED_CLASS = "raw_0.98_rgrgr"
T = 2000
K = 10          # optimiser steps per dispatch


def main():
    import jax
    import jax.numpy as jnp
    from sloika_tpu.models import build
    from sloika_tpu import optim, training

    np.asarray(jax.jit(lambda: jnp.ones(4))())   # warm the transfer path

    layer = build(PRETRAINED_CLASS, klen=5, sd=0.5, nfeature=1, winlen=11,
                  stride=5)
    opt_init, opt_update = optim.adamski()
    step = training.make_train_multi_step(layer, opt_update, min_prob=1e-30,
                                          drop=20)
    rs = np.random.RandomState(0)
    batches = [100, 200, 400, 800]
    state = {}
    for B in batches:
        params = layer.init(jax.random.PRNGKey(0))
        opt_state = opt_init(params)
        x = jnp.asarray(rs.normal(size=(K, T, B, 1)).astype(np.float32))
        labels = jnp.asarray(
            rs.randint(0, 1025, size=(K, T // 5, B)).astype(np.int32))
        w = jnp.ones((K, T // 5, B), jnp.float32)
        lrs = jnp.full(K, 1e-3, jnp.float32)
        params, opt_state, loss, acc = step(params, opt_state, x, labels,
                                            w, lrs)
        float(loss[0])                           # compile + warm + sync
        state[B] = (params, opt_state, x, labels, w, lrs)

    # Marginal timing (docs/PERF.md measurement playbook): the tunnel's
    # ~32 ms sync RTT would dominate a one-dispatch-per-sync timing (it
    # understated B=100 by ~25% in an earlier version of this sweep).
    # Time M_SMALL and M_LARGE chained dispatches per sync and divide the
    # difference — the RTT and any fixed per-sync cost cancel exactly.
    M_SMALL, M_LARGE = 2, 10

    def timed(B, m):
        params, opt_state, x, labels, w, lrs = state[B]
        t0 = time.time()
        for _ in range(m):
            params, opt_state, loss, acc = step(params, opt_state, x,
                                                labels, w, lrs)
        float(loss[0])                           # one sync for the chain
        dt = time.time() - t0
        state[B] = (params, opt_state, x, labels, w, lrs)
        return dt

    times = {B: {M_SMALL: [], M_LARGE: []} for B in batches}
    for _ in range(3):                           # interleaved rounds
        for B in batches:
            times[B][M_SMALL].append(timed(B, M_SMALL))
            times[B][M_LARGE].append(timed(B, M_LARGE))

    out = {}
    for B in batches:
        dt = (min(times[B][M_LARGE]) - min(times[B][M_SMALL])) \
            / (M_LARGE - M_SMALL)
        out[B] = {"sec_per_dispatch": round(dt, 5),
                  "chunks_per_sec": round(B * K / dt, 1),
                  "ms_per_step": round(1e3 * dt / K, 3)}
        print("train B={}: {:.0f} chunks/s ({:.2f} ms/step)".format(
            B, B * K / dt, 1e3 * dt / K), flush=True)

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_batch.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
