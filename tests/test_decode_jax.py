"""Parity tests: XLA decoders vs the numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from sloika_tpu.ops import decode_jax, decode_np, remap_jax, remap_np


@pytest.fixture(scope="module")
def posts():
    rs = np.random.RandomState(0xBEEF)
    return [rs.dirichlet(np.full(65, 0.1), size=30).astype(np.float32)
            for _ in range(3)]


@pytest.mark.parametrize("skip_pen", [0.0, 3.0])
def test_viterbi_parity_with_numpy(posts, skip_pen):
    batch = np.stack(posts)  # (B, T, 65)
    score, path, moved = decode_jax.viterbi(jnp.asarray(batch), 3,
                                            skip_pen=skip_pen)
    for b, post in enumerate(posts):
        ref_score, ref_path = decode_np.viterbi(post.astype(np.float64), 3,
                                                skip_pen=skip_pen)
        got = decode_jax.collapse_path(path[b], moved[b])
        assert float(score[b]) == pytest.approx(ref_score, rel=1e-4)
        np.testing.assert_array_equal(got, ref_path)


def test_viterbi_stay_padding_is_neutral(posts):
    post = posts[0]
    padded = decode_jax.stay_pad(post, 40)
    s1, p1, m1 = decode_jax.viterbi(jnp.asarray(post[None]), 3, skip_pen=1.0)
    s2, p2, m2 = decode_jax.viterbi(jnp.asarray(padded[None]), 3, skip_pen=1.0)
    got1 = decode_jax.collapse_path(p1[0], m1[0])
    got2 = decode_jax.collapse_path(p2[0], m2[0], nev=30)
    np.testing.assert_array_equal(got1, got2)


def test_viterbi_modified_bases_jax():
    seq = [13, 64, 0, 67, 85, 0, 48, 0, 0, 113, 64, 0, 100, 0, 0, 122, 0, 107]
    post = np.ones((len(seq), 126)) * 0.001
    post[range(len(seq)), seq] = 1
    post = (post / post.sum(1, keepdims=True)).astype(np.float32)
    score, path, moved = decode_jax.viterbi(jnp.asarray(post[None]), 3,
                                            skip_pen=5.0, nbase=5)
    got = decode_jax.collapse_path(path[0], moved[0])
    np.testing.assert_array_equal(got, [x - 1 for x in seq if x])


def test_argmax_path_parity(posts):
    post = posts[0]
    path, emit = decode_jax.argmax_path(jnp.asarray(post[None]))
    got = np.asarray(path[0])[np.asarray(emit[0])]
    np.testing.assert_array_equal(got, decode_np.argmax(post))


def test_slip_update_parity():
    rs = np.random.RandomState(3)
    x = rs.normal(size=64).astype(np.float32)
    for slip in [0.5, 4.0]:
        js, jp = remap_jax.slip_update(jnp.asarray(x), jnp.float32(slip))
        ns, np_pos = remap_np.slip_update(x, np.float32(slip))
        # closed-form prefix scan vs sequential accumulation: identical math,
        # different f32 rounding order
        np.testing.assert_allclose(np.asarray(js)[2:], ns[2:], rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(jp)[2:], np_pos[2:])


def test_map_to_sequence_parity():
    rs = np.random.RandomState(31)
    npos, nstate, nev = 25, 66, 40
    seq = rs.randint(1, nstate, size=npos).astype(np.int32)
    post = rs.dirichlet(np.full(nstate, 0.2), size=nev).astype(np.float32)
    from sloika_tpu.util import geometric_prior
    p0 = geometric_prior(npos, 2.0).astype(np.float32)
    p1 = geometric_prior(npos, 2.0, rev=True).astype(np.float32)

    for slip, pri in [(2.0, (None, None)), (5.0, (p0, p1))]:
        jscore, jpath = remap_jax.remap_posterior_to_sequence(
            post, seq, slip, prior_initial=pri[0], prior_final=pri[1])
        nscore, npath = remap_np.map_to_sequence(
            post, seq, slip=slip, prior_initial=pri[0], prior_final=pri[1],
            log=False)
        assert jscore == pytest.approx(float(nscore), rel=1e-4)
        np.testing.assert_array_equal(jpath, npath)


def test_map_to_sequence_batched_with_padding():
    """Two reads of different lengths decoded together must match their
    individual decodes."""
    rs = np.random.RandomState(77)
    nstate = 66
    seqs = [rs.randint(1, nstate, size=n).astype(np.int32) for n in (15, 25)]
    posts = [rs.dirichlet(np.full(nstate, 0.2), size=t).astype(np.float32)
             for t in (20, 40)]
    T, P = 40, 25
    lt = np.full((2, T, nstate), np.log(1e-10), dtype=np.float32)
    seq_pad = np.zeros((2, P), np.int32)
    mask = np.zeros((2, P), bool)
    for b in range(2):
        lt[b, :posts[b].shape[0]] = np.log(posts[b])
        stay = np.full(nstate, np.log(1e-10), np.float32)
        stay[0] = 0.0
        lt[b, posts[b].shape[0]:] = stay  # one-hot stay padding
        seq_pad[b, :len(seqs[b])] = seqs[b]
        mask[b, :len(seqs[b])] = True
    zeros = np.zeros((2, P), np.float32)
    score, path = remap_jax.map_to_sequence(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0), zeros, zeros,
        jnp.asarray(mask))
    for b in range(2):
        nscore, npath = remap_np.map_to_sequence(posts[b], seqs[b], slip=3.0,
                                                 log=False)
        tb = posts[b].shape[0]
        assert float(score[b]) == pytest.approx(float(nscore), rel=1e-4)
        np.testing.assert_array_equal(np.asarray(path[b])[:tb], npath)


def test_map_to_sequence_padding_unreachable_for_long_reads():
    """Padded sequence positions must stay unreachable even when real path
    scores are hugely negative (regression: -50000 masking was escapable)."""
    rs = np.random.RandomState(5)
    nstate, npos, nev, P = 66, 40, 15000, 64
    seq = rs.randint(1, nstate, size=npos).astype(np.int32)
    # near-uniform posteriors: total path score ~ nev * log(1/nstate) << -50000
    post = rs.dirichlet(np.full(nstate, 50.0), size=nev).astype(np.float32)
    lt = np.log(post)[None]
    seq_pad = np.zeros((1, P), np.int32)
    seq_pad[0, :npos] = seq
    mask = np.zeros((1, P), bool)
    mask[0, :npos] = True
    zeros = np.zeros((1, P), np.float32)
    score, path = remap_jax.map_to_sequence(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0), zeros,
        zeros, jnp.asarray(mask))
    path = np.asarray(path[0])
    assert float(score[0]) < -50000.0
    assert path.max() < npos
