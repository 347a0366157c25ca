"""Pallas banded remap kernel parity tests (CPU interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sloika_tpu.ops import remap_banded, remap_jax
from sloika_tpu.ops.pallas import remap as pallas_remap
from tests.test_remap_banded import _make_case


def _run_all(lt, seq_pad, mask, nframes, nposs, W, slip=3.0, p0=None, p1=None):
    """Exact DP, XLA banded scan fed the Pallas kernel's block-quantised
    schedule (bit-parity leg), and the Pallas kernel itself."""
    B, T, _ = lt.shape
    P = seq_pad.shape[1]
    zeros = np.zeros((B, P), np.float32)
    p0 = zeros if p0 is None else p0
    p1 = zeros if p1 is None else p1
    args = (jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(slip),
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(mask))
    s_e, p_e = remap_jax.map_to_sequence(*args)
    band_args = args + (jnp.asarray(nframes), jnp.asarray(nposs), W)
    TB = pallas_remap.block_len(W)
    starts = pallas_remap.band_starts_blocked(
        jnp.asarray(nframes), jnp.asarray(nposs), T, W, TB)
    s_x, p_x = remap_banded.map_to_sequence_banded(*band_args, starts=starts)
    s_p, p_p = pallas_remap.map_to_sequence_banded(*band_args)
    return (s_e, p_e), (s_x, p_x), (s_p, p_p)


@pytest.mark.parametrize("W", [64, 128])
def test_pallas_banded_matches_xla_banded_and_exact(W):
    """Three-way parity: the Pallas kernel must be bit-identical to the XLA
    banded scan (same schedule), and both must match the exact DP on
    near-linear paths."""
    rs = np.random.RandomState(11)
    nframes = np.array([400, 300, 250], np.int32)
    nposs = np.array([200, 150, 90], np.int32)
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, 400, 256)
    (s_e, p_e), (s_x, p_x), (s_p, p_p) = _run_all(
        lt, seq_pad, mask, nframes, nposs, W)
    np.testing.assert_array_equal(np.asarray(p_p), np.asarray(p_x))
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-6)
    for b, tb in enumerate(nframes):
        assert float(s_p[b]) == pytest.approx(float(s_e[b]), rel=1e-5)
        np.testing.assert_array_equal(np.asarray(p_p[b])[:tb],
                                      np.asarray(p_e[b])[:tb])


def test_pallas_banded_with_priors():
    from sloika_tpu.util import geometric_prior
    rs = np.random.RandomState(23)
    nframes = np.array([300], np.int32)
    nposs = np.array([150], np.int32)
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, 300, 256)
    p0 = np.zeros((1, 256), np.float32)
    p1 = np.zeros((1, 256), np.float32)
    p0[0, :150] = geometric_prior(150, 25.0)
    p1[0, :150] = geometric_prior(150, 25.0, rev=True)
    (s_e, p_e), _, (s_p, p_p) = _run_all(
        lt, seq_pad, mask, nframes, nposs, 64, p0=p0, p1=p1)
    assert float(s_p[0]) == pytest.approx(float(s_e[0]), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(p_p[0]), np.asarray(p_e[0]))


def test_pallas_banded_slips():
    """Paths containing genuine slips (position jumps >= 2) survive banding:
    exercise the in-kernel Hillis-Steele slip scan against the exact DP."""
    rs = np.random.RandomState(5)
    B, T, P, nstate = 2, 220, 256, 66
    nframes = np.array([220, 200], np.int32)
    nposs = np.array([180, 160], np.int32)
    lt = np.full((B, T, nstate), np.log(1e-6), dtype=np.float32)
    seq_pad = np.zeros((B, P), np.int32)
    mask = np.zeros((B, P), bool)
    for b in range(B):
        npos, tb = nposs[b], nframes[b]
        seq = rs.randint(1, nstate, size=npos).astype(np.int32)
        seq_pad[b, :npos] = seq
        mask[b, :npos] = True
        # path advances ~1/frame but jumps forward by 3 every 40 frames
        pos = 0
        post = np.full((tb, nstate), 1e-4)
        for t in range(tb):
            if t > 0 and t % 40 == 0:
                pos = min(pos + 3, npos - 1)
            elif t > 0 and rs.rand() < 0.8:
                pos = min(pos + 1, npos - 1)
            post[t, seq[pos]] = 1.0
        post /= post.sum(1, keepdims=True)
        lt[b, :tb] = np.log(post)
        stay = np.full(nstate, np.log(1e-10), np.float32)
        stay[0] = 0.0
        lt[b, tb:] = stay
    # narrow band: kernel must still match the XLA scan bit for bit
    (_, _), (s_x, p_x), (s_p, p_p) = _run_all(
        lt, seq_pad, mask, nframes, nposs, 64, slip=2.0)
    np.testing.assert_array_equal(np.asarray(p_p), np.asarray(p_x))
    # generous band (guaranteed band = W - block_len(W) covers the path):
    # banded must equal the exact DP including the slip jumps
    (s_e, p_e), _, (s_p, p_p) = _run_all(
        lt, seq_pad, mask, nframes, nposs, 128, slip=2.0)
    for b, tb in enumerate(nframes):
        assert float(s_p[b]) == pytest.approx(float(s_e[b]), rel=1e-5)
        np.testing.assert_array_equal(np.asarray(p_p[b])[:tb],
                                      np.asarray(p_e[b])[:tb])


def test_pallas_banded_under_shard_map():
    """The kernel partitions row-wise under shard_map (the multi-chip remap
    path, remap.Remapper(mesh=...)): per-shard results must equal the
    unsharded kernel."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS
    from sloika_tpu.parallel import mesh as meshlib

    rs = np.random.RandomState(31)
    nframes = np.array([400, 300, 250, 350], np.int32)
    nposs = np.array([200, 150, 90, 180], np.int32)
    W = 64
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, 400, 256)
    B, T, _ = lt.shape
    P = seq_pad.shape[1]
    zeros = np.zeros((B, P), np.float32)
    args = (jnp.asarray(lt), jnp.asarray(seq_pad), jnp.asarray(zeros),
            jnp.asarray(zeros), jnp.asarray(mask), jnp.asarray(nframes),
            jnp.asarray(nposs))
    slip = jnp.float32(3.0)

    def banded(lt_, ss_, p0_, p1_, pm_, nf_, np_):
        return pallas_remap.map_to_sequence_banded(
            lt_, ss_, slip, p0_, p1_, pm_, nf_, np_, W)

    s_ref, p_ref = banded(*args)
    mesh = meshlib.make_mesh(4)
    row, rowp = PS("data"), PS("data", None)
    s_sh, p_sh = shard_map(
        banded, mesh=mesh,
        in_specs=(PS("data", None, None), rowp, rowp, rowp, rowp, row, row),
        out_specs=(row, rowp), check_vma=False)(*args)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(p_sh), np.asarray(p_ref))


def test_pallas_full_window_equals_exact_dp():
    """W >= P makes the kernel the *exact* DP (the band covers every
    position; the schedule is identically zero): on fully random
    posteriors — where banding assumptions do not hold — scores and paths
    must equal remap_jax.map_to_sequence.  This is the TPU exact-remap
    path (remap.Remapper with band=None or short references)."""
    rs = np.random.RandomState(44)
    B, T, P, nstate = 3, 300, 160, 66
    nframes = np.array([300, 250, 180], np.int32)
    nposs = np.array([150, 100, 60], np.int32)
    lt = np.log(rs.dirichlet(np.ones(nstate), size=(B, T))
                ).astype(np.float32)
    seq_pad = np.zeros((B, P), np.int32)
    mask = np.zeros((B, P), bool)
    for b in range(B):
        seq_pad[b, :nposs[b]] = rs.randint(1, nstate, size=nposs[b])
        mask[b, :nposs[b]] = True
        # frames past nframes are stay-padded like the production program
        lt[b, nframes[b]:] = np.log(1e-10)
        lt[b, nframes[b]:, 0] = 0.0
    zeros = np.zeros((B, P), np.float32)
    args = (jnp.asarray(lt), jnp.asarray(seq_pad), jnp.float32(2.0),
            jnp.asarray(zeros), jnp.asarray(zeros), jnp.asarray(mask))
    s_e, p_e = remap_jax.map_to_sequence(*args)
    W = max(256, -(-P // 128) * 128)
    s_p, p_p = pallas_remap.map_to_sequence_banded(
        *args, jnp.asarray(nframes), jnp.asarray(nposs), W)
    for b in range(B):
        assert float(s_p[b]) == pytest.approx(float(s_e[b]), rel=1e-5)
        np.testing.assert_array_equal(np.asarray(p_p[b]), np.asarray(p_e[b]))


def test_time_major_entry_bit_identical():
    """The time-major entry (the Remapper's production layout — no
    transpose of the posterior in HBM) must be bit-identical to the
    batch-major entry."""
    rs = np.random.RandomState(31)
    nframes = np.array([400, 250], np.int32)
    nposs = np.array([200, 90], np.int32)
    lt, seq_pad, mask = _make_case(rs, nframes, nposs, 400, 256)
    B, T, _ = lt.shape
    zeros = np.zeros((B, 256), np.float32)
    args = (jnp.asarray(seq_pad), jnp.float32(3.0), jnp.asarray(zeros),
            jnp.asarray(zeros), jnp.asarray(mask), jnp.asarray(nframes),
            jnp.asarray(nposs), 64)
    s_b, p_b = pallas_remap.map_to_sequence_banded(jnp.asarray(lt), *args)
    s_t, p_t = pallas_remap.map_to_sequence_banded(
        jnp.asarray(np.moveaxis(lt, 0, 1)), *args, time_major=True)
    np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_t))
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(p_t))
