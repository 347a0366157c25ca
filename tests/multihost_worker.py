"""Worker process for the multi-host training parity test.

Usage: python multihost_worker.py <process_id> <num_processes> <coordinator>

Each process owns 4 virtual CPU devices; with 2 processes the global mesh
has 8.  All processes sample identical global batches (shared seed) and
contribute their local shard via mesh.put_host_batch — the per-host sharded
input path of training.train.  Prints the per-step losses as JSON for the
parent to compare across process counts.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    if nproc > 1:
        jax.distributed.initialize(addr, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp
    import sloika_tpu.nn as nn
    from sloika_tpu import optim, training
    from sloika_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh()
    init = nn.truncated_normal(0.4)
    layer = nn.Serial([
        nn.Gru(1, 8, init=init, has_bias=True),
        nn.Softmax(8, 65, init=init, has_bias=True),
    ])
    params = layer.init(jax.random.PRNGKey(0))
    opt_init, opt_update = optim.adamski()
    opt_state = opt_init(params)
    step = training.make_train_step(layer, opt_update, min_prob=1e-30,
                                    drop=2, mesh=mesh)
    xsh = meshlib.batch_sharding(mesh)
    lsh = meshlib.batch2_sharding(mesh)

    rs = np.random.RandomState(7)
    losses = []
    for i in range(4):
        x = rs.normal(size=(40, 8, 1)).astype(np.float32)
        labels = rs.randint(0, 65, size=(40, 8)).astype(np.int32)
        weights = np.ones_like(labels, dtype=np.float32)
        params, opt_state, loss, acc = step(
            params, opt_state,
            meshlib.put_host_batch(x, xsh),
            meshlib.put_host_batch(labels, lsh),
            meshlib.put_host_batch(weights, lsh),
            jnp.float32(1e-3))
        losses.append(round(float(loss), 6))

    # the fused multi-step trainer over the same multi-process mesh, with
    # per-host sharded stacked batches (leading steps axis unsharded)
    P = jax.sharding.PartitionSpec
    mstep = training.make_train_multi_step(layer, opt_update, min_prob=1e-30,
                                           drop=2, mesh=mesh)
    xsh_k = jax.sharding.NamedSharding(mesh, P(None, None, "data", None))
    lsh_k = jax.sharding.NamedSharding(mesh, P(None, None, "data"))
    K = 2
    xs = np.stack([rs.normal(size=(40, 8, 1)).astype(np.float32)
                   for _ in range(K)])
    ls = np.stack([rs.randint(0, 65, size=(40, 8)).astype(np.int32)
                   for _ in range(K)])
    ws = np.ones_like(ls, dtype=np.float32)
    params, opt_state, mlosses, _ = mstep(
        params, opt_state,
        meshlib.put_host_batch(xs, xsh_k, batch_axis=2),
        meshlib.put_host_batch(ls, lsh_k, batch_axis=2),
        meshlib.put_host_batch(ws, lsh_k, batch_axis=2),
        jnp.full(K, 1e-3, jnp.float32))
    losses.extend(round(float(v), 6) for v in np.asarray(mlosses))
    print("LOSSES " + json.dumps(losses))
    return 0


if __name__ == "__main__":
    sys.exit(main())
