"""LSTM training-step micro-bench: fused Pallas cells vs XLA scan.

Measures the baseline_lstm-class train step (reference models/baseline_lstm.py
via train_network defaults, B=100 events x 500) with the fused kernel on and
off.  Run ON TPU (one TPU process at a time):

    python scripts/bench_lstm.py [fused|scan] [batch] [chunk_len]
"""
import os
import sys
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    os.environ["SLOIKA_TPU_FUSED_LSTM"] = "1" if mode == "fused" else "0"

    import jax
    import jax.numpy as jnp
    from sloika_tpu.models import build
    from sloika_tpu import optim, training

    np.asarray(jax.jit(lambda: jnp.ones(4))())   # warm transfer path

    layer = build("baseline_lstm", klen=5, sd=0.5, nfeature=4, winlen=3)
    params = layer.init(jax.random.PRNGKey(0))
    opt_init, opt_update = optim.adamski()
    opt_state = opt_init(params)
    step = training.make_train_step(layer, opt_update, min_prob=1e-30,
                                    drop=10)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(size=(T, B, 4)).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 1025, size=(T, B)).astype(np.int32))
    w = jnp.ones((T, B), jnp.float32)

    params, opt_state, loss, acc = step(params, opt_state, x, labels, w,
                                        jnp.float32(1e-3))
    float(loss)   # sync (block_until_ready does not sync through the tunnel)
    t0 = time.time()
    nrep = 30
    for _ in range(nrep):
        params, opt_state, loss, acc = step(params, opt_state, x, labels, w,
                                            jnp.float32(1e-3))
    float(loss)
    dt = (time.time() - t0) / nrep
    print("{}: {:.2f} ms/step, {:.0f} chunks/s (B={} T={})".format(
        mode, dt * 1e3, B / dt, B, T))
    return 0


if __name__ == "__main__":
    sys.exit(main())
