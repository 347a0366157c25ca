"""Chunked base-emission output parity + seam-stitch correctness tests."""
import jax
import numpy as np
import pytest

import sloika_tpu.nn as nn
from sloika_tpu import basecall as bc
from sloika_tpu import bio


@pytest.fixture(scope="module")
def small_model():
    init = nn.truncated_normal(0.4)
    layer = nn.Serial([
        nn.Convolution(1, 8, 7, 2, init=init, has_bias=True),
        nn.Reverse(nn.Gru(8, 8, init=init, has_bias=True)),
        nn.Gru(8, 8, init=init, has_bias=True),
        nn.Softmax(8, 65, init=init, has_bias=True),
    ])
    params = layer.init(jax.random.PRNGKey(5))
    return layer, params


def _codes_from_states(call, klen):
    """Host-side reference collapse: states -> base codes via
    kmers_to_sequence (the path the bases mode must reproduce)."""
    kmers = bio.all_kmers(klen)
    seq = bio.kmers_to_sequence([kmers[i] for i in call], always_move=True)
    if isinstance(seq, str):
        seq = seq.encode()
    lut = np.zeros(256, np.uint8)
    for i, c in enumerate(b"ACGT"):
        lut[c] = i
    return lut[np.frombuffer(seq, dtype=np.uint8)]


def test_chunked_bases_matches_host_collapse(small_model):
    """Device base emission must equal the host-side kmers_to_sequence
    collapse of the chunked state calls, per read."""
    layer, params = small_model
    rs = np.random.RandomState(3)
    sigs = [rs.normal(size=(n,)).astype(np.float32)
            for n in (3000, 2200, 1500, 700)]
    kw = dict(batch_size=4, chunked=True, chunk_size=1000, overlap=100)
    states_caller = bc.Basecaller(layer, params, 3, **kw)
    bases_caller = bc.Basecaller(layer, params, 3, output="bases", **kw)

    st = states_caller.basecall_signals(sigs)
    ba = bases_caller.basecall_signals(sigs)
    for (ss, call), (bs, codes) in zip(st, ba):
        assert ss == pytest.approx(bs, rel=1e-5)
        np.testing.assert_array_equal(codes, _codes_from_states(call, 3))


def test_chunked_bases_single_window(small_model):
    """Reads shorter than one window must round-trip too."""
    layer, params = small_model
    rs = np.random.RandomState(8)
    sigs = [rs.normal(size=(400,)).astype(np.float32)]
    kw = dict(batch_size=2, chunked=True, chunk_size=1000, overlap=100)
    st = bc.Basecaller(layer, params, 3, **kw).basecall_signals(sigs)
    ba = bc.Basecaller(layer, params, 3, output="bases",
                       **kw).basecall_signals(sigs)
    np.testing.assert_array_equal(ba[0][1], _codes_from_states(st[0][1], 3))


def test_basecall_to_sequences_consistent(small_model):
    """basecall_to_sequences must give identical codes for states and bases
    output modes."""
    layer, params = small_model
    rs = np.random.RandomState(4)
    sigs = [rs.normal(size=(2500,)).astype(np.float32)]
    kw = dict(batch_size=2, chunked=True, chunk_size=1000, overlap=100)
    a = bc.Basecaller(layer, params, 3, **kw).basecall_to_sequences(sigs)
    b = bc.Basecaller(layer, params, 3, output="bases",
                      **kw).basecall_to_sequences(sigs)
    np.testing.assert_array_equal(a[0][1], b[0][1])


def _decode_one(layer, params, sig, klen=3):
    """Independent single-signal decode (batch 1, no padding): the simple
    spec the batched pipeline must reproduce."""
    import jax.numpy as jnp
    from sloika_tpu.ops import decode_jax
    x = jnp.asarray(sig[:, None, None])
    post = layer.apply(params, x)
    post = 1e-5 + (1 - 1e-5) * post
    _, path, moved = decode_jax.viterbi(
        jnp.moveaxis(post, 1, 0), klen, skip_pen=5.0)
    return np.asarray(path[0]), np.asarray(moved[0]).astype(bool)


def test_chunked_stitch_matches_exact_outside_seams(small_model):
    """Chunked-stitch correctness (the contract claimed in
    basecall._basecall_chunked): per-window decodes stitched by the seam
    rule — window w keeps moves in frames [V/d, (C-V)/d) — must equal the
    pipeline's chunked output verbatim; and since, for this input, every
    window's kept-core decode agrees with the full-read decode, the chunked
    output must equal exact-mode calls *exactly*.  An off-by-one in the
    f_lo/f_hi seam arithmetic shifts a move between windows and fails the
    equality."""
    layer, params = small_model
    rs = np.random.RandomState(12)
    sig = rs.normal(size=(3500,)).astype(np.float32)
    C, V, d = 1000, 100, 2
    core = C - 2 * V
    nwin = -(-max(len(sig) - 2 * V, 1) // core)

    # independent per-window decodes + documented stitch rule
    stitched = []
    agree = True
    path_g, moved_g = _decode_one(layer, params, sig)
    for w in range(nwin):
        start = w * core
        sl = sig[start:start + C]
        path_w, moved_w = _decode_one(layer, params, sl)
        f_lo = 0 if w == 0 else V // d
        f_hi = len(path_w) if w == nwin - 1 else (C - V) // d
        keep = moved_w[f_lo:f_hi].copy()
        if w == 0:
            keep[0] = True
        stitched.append(path_w[f_lo:f_hi][keep])
        g0 = start // d
        agree &= bool(np.array_equal(path_w[f_lo:f_hi],
                                     path_g[g0 + f_lo:g0 + f_hi]) and
                      np.array_equal(moved_w[f_lo:f_hi],
                                     moved_g[g0 + f_lo:g0 + f_hi]))
    stitched = np.concatenate(stitched)

    chunked = bc.Basecaller(layer, params, 3, batch_size=4, chunked=True,
                            chunk_size=C, overlap=V)
    _, chunked_calls = chunked.basecall_signals([sig])[0]
    np.testing.assert_array_equal(chunked_calls, stitched)

    # window-core decodes agree with the full-read decode for this input, so
    # the stitched result must be the exact decode, bit for bit
    assert agree, "fixture regression: window decodes no longer agree"
    exact = bc.Basecaller(layer, params, 3, batch_size=1)
    _, exact_calls = exact.basecall_signals([sig])[0]
    np.testing.assert_array_equal(chunked_calls, exact_calls)
