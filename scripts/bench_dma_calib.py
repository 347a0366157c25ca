"""Measure the tunnel's sync round-trip (the constant in every timing).

Every timing in bench_dma.py / bench_viterbi_parts.py ends with a scalar
device->host transfer (the only reliable sync through the tunnel), so each
measurement = true device time + one tunnel round trip.  Measured on this
machine: **~32 ms best, ~36 ms mean** — comparable to entire kernel
runtimes, which is why those benches dispatch several async calls per sync.

    python scripts/bench_dma_calib.py
"""
import sys
import time

import numpy as np

def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_dma import run_case
    import jax
    import jax.numpy as jnp

    np.asarray(jax.jit(lambda: jnp.ones(4))())

    # (a) pure sync cost: scalar pulled from an already-computed array
    one = jax.jit(lambda: jnp.ones((8, 128)))()
    float(jnp.sum(one))
    ts = []
    for _ in range(8):
        t0 = time.time()
        float(jnp.sum(one))
        ts.append(time.time() - t0)
    print("sync round-trip: best %.1f ms, mean %.1f ms"
          % (min(ts) * 1e3, np.mean(ts) * 1e3), flush=True)

    # (b) one DMA-probe case with the amortised timing (run_case now
    # dispatches several calls per sync, so the RTT divides out)
    run_case(32, 3, 128, 3264)
    return 0


if __name__ == "__main__":
    sys.exit(main())
