"""Training smoke tests: loss decreases, checkpoints resume, multi-device
data-parallel step runs on the virtual mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sloika_tpu.nn as nn
from sloika_tpu import optim, training, serialize
from sloika_tpu.models import build
from sloika_tpu.parallel import mesh as meshlib


def synthetic_data(rs, nchunk=64, chunk_len=64, nfeature=4, nstate=257):
    chunks = rs.normal(size=(nchunk, chunk_len, nfeature)).astype(np.float32)
    labels = rs.randint(0, nstate, size=(nchunk, chunk_len)).astype(np.int32)
    bad = np.zeros((nchunk, chunk_len), dtype=bool)
    weights = np.ones(nchunk) / nchunk
    return {"chunks": chunks, "labels": labels, "bad": bad,
            "weights": weights, "attrs": {"kmer": 4}}


def test_loss_decreases_on_learnable_data():
    rs = np.random.RandomState(0)
    layer = build("tiny_gru", klen=4, sd=0.1, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(0))
    # learnable: labels derived from feature argmax
    data = synthetic_data(rs)
    data["labels"] = (np.argmax(data["chunks"], axis=2) + 1).astype(np.int32)

    opt_init, opt_update = optim.adamski()
    opt_state = opt_init(params)
    step = training.make_train_step(layer, opt_update, min_prob=1e-30, drop=2)

    losses = []
    for i in range(150):
        x = np.ascontiguousarray(data["chunks"].transpose(1, 0, 2))
        labels = np.ascontiguousarray(data["labels"].transpose())
        w = np.ones_like(labels, dtype=np.float32)
        params, opt_state, loss, acc = step(params, opt_state, jnp.asarray(x),
                                            jnp.asarray(labels), jnp.asarray(w),
                                            jnp.float32(1e-3))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_train_loop_and_resume(tmp_path):
    rs = np.random.RandomState(1)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(1))
    data = synthetic_data(rs)
    out = str(tmp_path / "run")

    params, opt_state = training.train(
        layer, params, data, output=out, batch_size=16, niteration=12,
        drop=2, save_every=6, quiet=True, seed=7, chunk_len_range=(0.5, 1.0))

    assert os.path.exists(os.path.join(out, "model_final.npz"))
    l2, p2, o2 = serialize.load_checkpoint(os.path.join(out, "model_final.npz"))
    assert float(o2.count) == 12.0
    x = rs.normal(size=(20, 2, 4)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)),
                               np.asarray(l2.apply(p2, x)), atol=1e-6)


def test_adamski_matches_reference_formulas():
    """One ADAMski step against hand-computed reference update maths
    (updates.py:55-87)."""
    params = {"w": jnp.asarray(np.array([1.0, -2.0], np.float32))}
    grads = {"w": jnp.asarray(np.array([0.5, -10.0], np.float32))}  # clips to -5
    d0, d1, eps, mrate, lr = 0.9, 0.999, 1e-8, 0.0005, 1e-3
    opt_init, opt_update = optim.adamski(decay=(d0, d1), epsilon=eps,
                                         mrate=mrate)
    state = opt_init(params)
    new_params, state = opt_update(grads, state, params, jnp.float32(lr))

    m_p = np.exp(-mrate)
    m_k = (1 - d0) * d0 * m_p / (1 - m_p * d0)
    ld0, ld1 = np.log(d0), np.log(d1)
    mf = m_k * np.expm1(0.0 * (ld0 - mrate)) - np.expm1(1.0 * ld0)
    lr_t = lr * np.sqrt(-np.expm1(1.0 * ld1)) / mf
    mdecay = -d0 * np.expm1(-mrate)
    gc = np.clip(np.array([0.5, -10.0]), -5, 5)
    mu = mdecay * 0 + (1 - d0) * gc
    nu = d1 * 0 + (1 - d1) * gc ** 2
    expect = np.array([1.0, -2.0]) - lr_t * mu / (np.sqrt(nu) + eps)
    np.testing.assert_allclose(np.asarray(new_params["w"]), expect, rtol=1e-5)


def test_data_parallel_step_on_virtual_mesh():
    """The sharded train step must run over 8 virtual CPU devices and agree
    with the single-device step."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = meshlib.make_mesh(8)
    rs = np.random.RandomState(2)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(2))

    opt_init, opt_update = optim.adamski()
    step_sharded = training.make_train_step(layer, opt_update, drop=2,
                                            mesh=mesh, min_prob=1e-30)
    step_single = training.make_train_step(layer, opt_update, drop=2,
                                           min_prob=1e-30)

    x = rs.normal(size=(32, 16, 4)).astype(np.float32)
    labels = rs.randint(0, 257, size=(32, 16)).astype(np.int32)
    w = np.ones_like(labels, dtype=np.float32)

    # the step donates params/opt_state, so give each call its own copy
    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
    p1, o1, loss1, acc1 = step_sharded(copy(params), opt_init(copy(params)),
                                       jnp.asarray(x), jnp.asarray(labels),
                                       jnp.asarray(w), jnp.float32(1e-3))
    p2, o2, loss2, acc2 = step_single(copy(params), opt_init(copy(params)),
                                      jnp.asarray(x), jnp.asarray(labels),
                                      jnp.asarray(w), jnp.float32(1e-3))
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multi_step_matches_repeated_single_steps():
    """K fused optimiser steps in one dispatch (lax.scan) must reproduce K
    sequential single-step dispatches exactly — same update maths, same
    batch order, per-step learning rates."""
    rs = np.random.RandomState(3)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(3))

    opt_init, opt_update = optim.adamski()
    single = training.make_train_step(layer, opt_update, drop=2,
                                      min_prob=1e-30)
    multi = training.make_train_multi_step(layer, opt_update, drop=2,
                                           min_prob=1e-30)

    K = 3
    xs = rs.normal(size=(K, 24, 8, 4)).astype(np.float32)
    labels = rs.randint(0, 257, size=(K, 24, 8)).astype(np.int32)
    w = np.ones_like(labels, dtype=np.float32)
    lrs = np.asarray([1e-3, 9e-4, 8e-4], np.float32)

    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
    p1, o1 = copy(params), opt_init(copy(params))
    losses1, accs1 = [], []
    for k in range(K):
        p1, o1, loss, acc = single(p1, o1, jnp.asarray(xs[k]),
                                   jnp.asarray(labels[k]), jnp.asarray(w[k]),
                                   jnp.float32(lrs[k]))
        losses1.append(float(loss))
        accs1.append(float(acc))
    p2, o2, losses2, accs2 = multi(copy(params), opt_init(copy(params)),
                                   jnp.asarray(xs), jnp.asarray(labels),
                                   jnp.asarray(w), jnp.asarray(lrs))
    np.testing.assert_allclose(np.asarray(losses2), losses1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(accs2), accs1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multi_step_on_virtual_mesh():
    """The fused multi-step with a leading steps axis must run sharded."""
    assert jax.device_count() >= 8
    mesh = meshlib.make_mesh(8)
    rs = np.random.RandomState(4)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(4))
    opt_init, opt_update = optim.adamski()
    multi = training.make_train_multi_step(layer, opt_update, drop=2,
                                           min_prob=1e-30, mesh=mesh)
    K = 2
    xs = rs.normal(size=(K, 24, 16, 4)).astype(np.float32)
    labels = rs.randint(0, 257, size=(K, 24, 16)).astype(np.int32)
    w = np.ones_like(labels, dtype=np.float32)
    lrs = np.full(K, 1e-3, np.float32)
    p, o, losses, accs = multi(params, opt_init(params), jnp.asarray(xs),
                               jnp.asarray(labels), jnp.asarray(w),
                               jnp.asarray(lrs))
    assert np.all(np.isfinite(np.asarray(losses)))


def test_train_loop_steps_per_dispatch_equivalence():
    """train() with fused dispatch groups (incl. a short tail: 10 = 2x4+2)
    must produce the same final parameters as the plain loop — same seed,
    same batch sequence, same update maths."""
    rs = np.random.RandomState(5)
    layer = build("tiny_gru", klen=4, sd=0.1, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(6))
    data = synthetic_data(rs)
    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)

    kw = dict(batch_size=8, chunk_len_range=(1.0, 1.0), drop=2,
              niteration=10, quiet=True, seed=11)
    p1, _ = training.train(layer, copy(params), data, **kw)
    p2, _ = training.train(layer, copy(params), data,
                           steps_per_dispatch=4, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resident_training_matches_streaming():
    """Device-resident data (on-device gather from sampler indices) must
    reproduce the streaming path: same sampler stream, same batches, same
    update maths — including the sub-K tail group, which materialises the
    drawn indices on the host."""
    rs = np.random.RandomState(11)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(7))
    data = synthetic_data(rs, nchunk=20, chunk_len=24)

    kwargs = dict(batch_size=4, chunk_len_range=(1.0, 1.0), drop=2,
                  niteration=7, steps_per_dispatch=3, seed=5, quiet=True,
                  save_every=1000)
    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
    p_res, _ = training.train(layer, copy(params), data,
                              data_on_device=True, **kwargs)
    p_str, _ = training.train(layer, copy(params), data,
                              data_on_device=False, **kwargs)
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_str)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_resident_training_on_virtual_mesh():
    """Resident gather-on-device training under a ('data',) mesh matches
    the unsharded resident run."""
    rs = np.random.RandomState(13)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(9))
    data = synthetic_data(rs, nchunk=24, chunk_len=24)
    mesh = meshlib.make_mesh(4)

    kwargs = dict(batch_size=8, chunk_len_range=(1.0, 1.0), drop=2,
                  niteration=6, steps_per_dispatch=2, seed=3, quiet=True,
                  save_every=1000, data_on_device=True)
    copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
    p_mesh, _ = training.train(layer, copy(params), data, mesh=mesh,
                               **kwargs)
    p_one, _ = training.train(layer, copy(params), data, **kwargs)
    for a, b in zip(jax.tree_util.tree_leaves(p_mesh),
                    jax.tree_util.tree_leaves(p_one)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_sgd_optimiser_and_lr_warmup(tmp_path):
    """optimiser='sgd' trains and checkpoints (SGDState round-trips), and
    lr_warmup freezes parameters while statistics calibrate."""
    rs = np.random.RandomState(5)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(5))
    data = synthetic_data(rs)
    out = str(tmp_path / "sgd")
    p2, o2 = training.train(
        layer, params, data, output=out, batch_size=16, niteration=8,
        drop=2, save_every=8, quiet=True, seed=3, optimiser="sgd",
        adam=(1e-3, 0.9, 0.999), chunk_len_range=(1.0, 1.0))
    assert isinstance(o2, optim.SGDState)
    l3, p3, o3 = serialize.load_checkpoint(
        os.path.join(out, "model_final.npz"))
    assert isinstance(o3, optim.SGDState)
    for a, b in zip(jax.tree_util.tree_leaves(o2.vel),
                    jax.tree_util.tree_leaves(o3.vel)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # warmup covering the whole run: parameters must be exactly unchanged
    # (ADAMski statistics advance, parameters don't).  Rebuild params — the
    # first train() donated the original buffers to its jitted step.
    params = layer.init(jax.random.PRNGKey(5))
    ref = jax.tree_util.tree_map(np.asarray, params)
    p4, o4 = training.train(
        layer, params, data, output=None, batch_size=16, niteration=6,
        drop=2, quiet=True, seed=3, lr_warmup=6, chunk_len_range=(1.0, 1.0))
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(o4.count) == 6.0
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(o4.nu))


def test_resumed_state_type_mismatch_restarts_optimiser(tmp_path):
    """Resuming an adamski checkpoint with optimiser='sgd' starts the
    optimiser fresh instead of crashing."""
    rs = np.random.RandomState(6)
    layer = build("tiny_gru", klen=4, sd=0.3, nfeature=4, winlen=3, stride=1)
    params = layer.init(jax.random.PRNGKey(6))
    data = synthetic_data(rs)
    opt_init, _ = optim.adamski()
    state = opt_init(params)
    p2, o2 = training.train(
        layer, params, data, output=None, batch_size=16, niteration=4,
        drop=2, quiet=True, seed=3, optimiser="sgd", opt_state=state,
        chunk_len_range=(1.0, 1.0))
    assert isinstance(o2, optim.SGDState)
