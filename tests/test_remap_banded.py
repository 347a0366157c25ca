"""Banded remap DP parity tests against the exact DP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sloika_tpu.ops import remap_banded, remap_jax


def _make_case(rs, nframes, nposs, T, P, nstate=66, jitter=3, stay_p=0.5):
    B = len(nframes)
    lt = np.full((B, T, nstate), np.log(1e-6), dtype=np.float32)
    seq_pad = np.zeros((B, P), np.int32)
    mask = np.zeros((B, P), bool)
    for b in range(B):
        npos, tb = nposs[b], nframes[b]
        seq = rs.randint(1, nstate, size=npos).astype(np.int32)
        seq_pad[b, :npos] = seq
        mask[b, :npos] = True
        base = np.clip((np.arange(tb) * (npos - 1) // max(tb - 1, 1))
                       + rs.randint(-jitter, jitter + 1, size=tb), 0, npos - 1)
        base = np.maximum.accumulate(base)
        post = np.full((tb, nstate), 1e-4)
        for t in range(tb):
            if t > 0 and base[t] == base[t - 1] and rs.rand() < stay_p:
                post[t, 0] = 1.0
            else:
                post[t, seq[base[t]]] = 1.0
        post /= post.sum(1, keepdims=True)
        lt[b, :tb] = np.log(post)
        stay = np.full(nstate, np.log(1e-10), np.float32)
        stay[0] = 0.0
        lt[b, tb:] = stay
    return lt, seq_pad, mask


@pytest.mark.parametrize("W", [48, 64, 128])
def test_banded_matches_exact_on_near_linear_paths(W):
    rs = np.random.RandomState(11)
    nframes = np.array([400, 300, 250], np.int32)
    nposs = np.array([200, 150, 90], np.int32)
    T, P = 400, 256
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, T, P)
    zeros = np.zeros((len(nframes), P), np.float32)

    s_e, p_e = remap_jax.map_to_sequence(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0), zeros,
        zeros, jnp.asarray(mask))
    s_b, p_b = remap_banded.map_to_sequence_banded(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0), zeros,
        zeros, jnp.asarray(mask), jnp.asarray(nframes), jnp.asarray(nposs),
        W)
    for b, tb in enumerate(nframes):
        assert float(s_b[b]) == pytest.approx(float(s_e[b]), rel=1e-5)
        np.testing.assert_array_equal(np.asarray(p_b[b])[:tb],
                                      np.asarray(p_e[b])[:tb])


def test_banded_with_priors():
    from sloika_tpu.util import geometric_prior
    rs = np.random.RandomState(23)
    nframes = np.array([300], np.int32)
    nposs = np.array([150], np.int32)
    T, P, W = 300, 256, 64
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, T, P)
    p0 = np.zeros((1, P), np.float32)
    p1 = np.zeros((1, P), np.float32)
    p0[0, :150] = geometric_prior(150, 25.0)
    p1[0, :150] = geometric_prior(150, 25.0, rev=True)

    s_e, p_e = remap_jax.map_to_sequence(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0),
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask))
    s_b, p_b = remap_banded.map_to_sequence_banded(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0),
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask),
        jnp.asarray(nframes), jnp.asarray(nposs), W)
    assert float(s_b[0]) == pytest.approx(float(s_e[0]), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(p_b[0])[:300],
                                  np.asarray(p_e[0])[:300])


def test_band_narrower_than_deviation_degrades_gracefully():
    """With a band too narrow for the jitter the path stays valid (monotone,
    in range) even though it can differ from the exact one."""
    rs = np.random.RandomState(7)
    nframes = np.array([300], np.int32)
    nposs = np.array([200], np.int32)
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, 300, 256, jitter=20)
    zeros = np.zeros((1, 256), np.float32)
    s_b, p_b = remap_banded.map_to_sequence_banded(
        jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(3.0), zeros,
        zeros, jnp.asarray(mask), jnp.asarray(nframes), jnp.asarray(nposs),
        32)
    path = np.asarray(p_b[0])[:300]
    assert path.min() >= 0 and path.max() < 200
    assert np.all(np.diff(path) >= 0)
