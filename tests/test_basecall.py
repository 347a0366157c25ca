"""Basecalling pipeline tests: masked batched forward == per-read forward,
end-to-end pretrained-model parity on bundled reads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sloika_tpu.nn as nn
from sloika_tpu import basecall as bc
from sloika_tpu import bio


@pytest.fixture(scope="module")
def small_model():
    """Conv(stride 2) + Reverse(Gru) + Gru + Softmax — the raw-model shape."""
    init = nn.truncated_normal(0.4)
    layer = nn.Serial([
        nn.Convolution(1, 8, 7, 2, init=init, has_bias=True),
        nn.Reverse(nn.Gru(8, 8, init=init, has_bias=True)),
        nn.Gru(8, 8, init=init, has_bias=True),
        nn.Softmax(8, 65, init=init, has_bias=True),
    ])
    params = layer.init(jax.random.PRNGKey(5))
    return layer, params


def test_masked_batch_equals_per_read(small_model):
    """Tail-padded batched forward with length masks must equal per-read
    unpadded forwards exactly (this is what makes batched basecalling
    correct for bidirectional models)."""
    layer, params = small_model
    rs = np.random.RandomState(0)
    sigs = [rs.normal(size=(n,)).astype(np.float32) for n in (101, 160, 57)]
    T = 160
    x = np.zeros((T, len(sigs), 1), dtype=np.float32)
    for b, s in enumerate(sigs):
        x[:len(s), b, 0] = s
    lengths = jnp.asarray([len(s) for s in sigs], dtype=jnp.int32)

    out, out_lengths = layer.apply_with_lengths(params, jnp.asarray(x), lengths)
    out = np.asarray(out)
    out_lengths = np.asarray(out_lengths)

    for b, s in enumerate(sigs):
        single = np.asarray(layer.apply(params, jnp.asarray(s[:, None, None])))
        assert out_lengths[b] == single.shape[0]
        np.testing.assert_allclose(out[:single.shape[0], b], single[:, 0],
                                   atol=2e-5)


def test_basecaller_batched_equals_single(small_model):
    layer, params = small_model
    rs = np.random.RandomState(1)
    sigs = [rs.normal(size=(n,)).astype(np.float32) for n in (500, 800, 321)]
    caller = bc.Basecaller(layer, params, 3, batch_size=3)
    batched = caller.basecall_signals(sigs)
    singles = [caller.basecall_signals([s])[0] for s in sigs]
    for (bs, bcall), (ss, scall) in zip(batched, singles):
        assert bs == pytest.approx(ss, rel=1e-4)
        np.testing.assert_array_equal(bcall, scall)


@pytest.mark.slow
def test_pretrained_model_basecall_accuracy(reference_reads):
    """The imported reference pretrained.pkl must basecall a bundled read to
    high identity against its in-file reference sequence — the round-1
    correctness anchor (BASELINE.md workload)."""
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5

    layer, params = theano_pickle.load_model(
        "/root/reference/models/pretrained.pkl")
    caller = bc.Basecaller(layer, params, 5)

    fn = [f for f in reference_reads if f.endswith("read4.fast5")][0]
    with Fast5(fn) as f5:
        ref = f5.get_reference_fasta().decode()
    name, sig = bc.load_raw_signal(fn)
    score, call = caller.basecall_signals([sig])[0]
    kmers = bio.all_kmers(5)
    seq = bio.kmers_to_sequence([kmers[i] for i in call], always_move=True)

    ident = _identity(ref, seq)
    assert ident > 0.8, "basecall identity {} too low".format(ident)

    # chunked (throughput) mode must reach the same accuracy
    chunked = bc.Basecaller(layer, params, 5, batch_size=8, chunked=True,
                            chunk_size=8000, overlap=400)
    score_c, call_c = chunked.basecall_signals([sig])[0]
    seq_c = bio.kmers_to_sequence([kmers[i] for i in call_c],
                                  always_move=True)
    ident_c = _identity(ref, seq_c)
    assert ident_c > 0.8, "chunked identity {} too low".format(ident_c)


def _identity(a, b):
    """Global-alignment identity via vectorised edit distance."""
    n, m = len(a), len(b)
    A = np.frombuffer(a.encode(), dtype=np.uint8)
    B = np.frombuffer(b.encode(), dtype=np.uint8)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (B != A[i - 1])
        best = np.minimum(prev[1:] + 1, sub)
        run = np.minimum.accumulate(best - np.arange(1, m + 1))
        cur[1:] = np.minimum(best, run + np.arange(1, m + 1) + 1)
        prev = cur
    return 1.0 - prev[-1] / max(n, m)


def test_basecaller_on_virtual_mesh(small_model):
    """Mesh-sharded basecalling over 8 virtual devices must match the
    single-device result exactly."""
    import jax
    from sloika_tpu.parallel import mesh as meshlib
    assert jax.device_count() >= 8
    layer, params = small_model
    rs = np.random.RandomState(9)
    sigs = [rs.normal(size=(n,)).astype(np.float32) for n in (500, 650, 800)]
    mesh = meshlib.make_mesh(8)
    sharded = bc.Basecaller(layer, params, 3, batch_size=8, mesh=mesh)
    plain = bc.Basecaller(layer, params, 3, batch_size=8)
    out_s = sharded.basecall_signals(sigs)
    out_p = plain.basecall_signals(sigs)
    for (ss, cs), (sp, cp) in zip(out_s, out_p):
        assert ss == pytest.approx(sp, rel=1e-4)
        np.testing.assert_array_equal(cs, cp)


def test_basecaller_chunked_on_virtual_mesh(small_model):
    import jax
    from sloika_tpu.parallel import mesh as meshlib
    layer, params = small_model
    rs = np.random.RandomState(10)
    sigs = [rs.normal(size=(n,)).astype(np.float32) for n in (2000, 3500)]
    mesh = meshlib.make_mesh(8)
    sharded = bc.Basecaller(layer, params, 3, batch_size=8, mesh=mesh,
                            chunked=True, chunk_size=1024, overlap=128)
    plain = bc.Basecaller(layer, params, 3, batch_size=8,
                          chunked=True, chunk_size=1024, overlap=128)
    out_s = sharded.basecall_signals(sigs)
    out_p = plain.basecall_signals(sigs)
    for (ss, cs), (sp, cp) in zip(out_s, out_p):
        assert ss == pytest.approx(sp, rel=1e-4)
        np.testing.assert_array_equal(cs, cp)


@pytest.mark.parametrize("siglen", [300, 1024, 1025, 1500, 2048])
def test_chunked_edge_lengths(small_model, siglen):
    """Chunked mode must handle reads shorter than, equal to, and straddling
    the window size."""
    layer, params = small_model
    rs = np.random.RandomState(siglen)
    sig = rs.normal(size=(siglen,)).astype(np.float32)
    caller = bc.Basecaller(layer, params, 3, batch_size=4, chunked=True,
                           chunk_size=1024, overlap=128)
    score, call = caller.basecall_signals([sig])[0]
    assert np.isfinite(score)
    assert call.ndim == 1
    # exact mode on the same read gives a same-ballpark call length
    exact = bc.Basecaller(layer, params, 3, batch_size=1)
    _, call_e = exact.basecall_signals([sig])[0]
    assert abs(len(call) - len(call_e)) <= max(10, 0.1 * len(call_e))


def test_studentise_model_falls_back_to_per_read_exact():
    """A model containing Studentise cannot run the batched padded path
    (whole-batch statistics are undefined under padding); the Basecaller
    must fall back to exact per-read forwards and produce calls identical
    to a manual unpadded forward + host decode (VERDICT r3 #8)."""
    from sloika_tpu.ops import decode_np

    layer = nn.Serial([nn.Studentise(4),
                       nn.FeedForward(4, 16, init=nn.truncated_normal(0.3),
                                      has_bias=True),
                       nn.Softmax(16, 257, has_bias=True)])
    params = layer.init(jax.random.PRNGKey(7))
    caller = bc.Basecaller(layer, params, 4, batch_size=4)
    assert caller.studentise_fallback
    rs = np.random.RandomState(0)
    sigs = [rs.normal(size=(60 + 17 * i, 4)).astype(np.float32)
            for i in range(3)]
    out = caller.basecall_signals(sigs)
    assert all(o is not None for o in out)
    for s, (score, call) in zip(sigs, out):
        post = np.asarray(layer.apply(params, jnp.asarray(s[:, None, :])))
        ref_post = decode_np.prepare_post(post.astype(np.float32),
                                          min_prob=caller.min_prob)
        ref_score, ref_call = decode_np.viterbi(ref_post, 4, skip_pen=5.0)
        assert list(call) == list(ref_call)
        assert score == pytest.approx(float(ref_score), rel=1e-4)


def test_studentise_model_chunked_mode_downgrades():
    """Requesting chunked/bases mode with a Studentise model downgrades to
    the exact per-read path instead of crashing."""
    layer = nn.Serial([nn.Studentise(1),
                       nn.FeedForward(1, 8, init=nn.truncated_normal(0.3)),
                       nn.Softmax(8, 257, has_bias=True)])
    params = layer.init(jax.random.PRNGKey(8))
    caller = bc.Basecaller(layer, params, 4, batch_size=2, chunked=True,
                           chunk_size=128, overlap=16, output="bases")
    assert caller.studentise_fallback
    assert not caller.chunked and caller.output == "states"
    rs = np.random.RandomState(1)
    out = caller.basecall_signals(
        [rs.normal(size=(300,)).astype(np.float32)])
    assert out[0] is not None
