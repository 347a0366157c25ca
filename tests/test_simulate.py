"""Synthetic read simulator: schema round-trip through the real fast5
reader and ground-truth label correctness through the real chunkify path."""
import os

import numpy as np
import pytest

from sloika_tpu import bio
from sloika_tpu.data import simulate
from sloika_tpu.data.fast5 import Fast5


@pytest.fixture(scope="module")
def readset(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("synth"))
    genome, files = simulate.simulate_read_set(
        outdir, n_reads=3, genome_len=20000, read_len=1500, noise_sd=0.2)
    return genome, files, outdir


def test_fast5_reader_roundtrip(readset):
    genome, files, _ = readset
    with Fast5(files[0]) as f5:
        sig = f5.get_read(raw=True)
        table, attrs = f5.get_any_mapping_data("template")
        ref = f5.get_reference_fasta()
        assert f5.sample_rate == simulate.SAMPLE_RATE
    # signal length == total dwell; 1 level unit == 300 counts
    assert len(sig) == int(round(table["start"][-1] * simulate.SAMPLE_RATE
                                 + table["length"][-1] * simulate.SAMPLE_RATE))
    assert ref in genome                     # read is a genome substring
    assert attrs["direction"] == "+"
    # the reader synthesises a move column from seq_pos: all single steps
    assert np.all(table["move"][1:] == 1)
    # per-event means must equal the quantised signal means to ~quantisation
    starts = np.around(table["start"] * simulate.SAMPLE_RATE).astype(int)
    m0 = sig[starts[0]:starts[1]].mean()
    assert abs((m0 - 2000.0) / 300.0 - table["mean"][0]) < 0.01


def test_chunkify_identity_labels_reconstruct_sequence(readset, tmp_path):
    """Blank-collapsed chunk labels must decode to the exact read sequence
    (dwell_min >= stride, so no base can be lost to label downsampling)."""
    genome, files, outdir = readset
    from sloika_tpu.cli import chunkify as chunkify_cli
    out = str(tmp_path / "chunks.hdf5")
    chunkify_cli.main([
        "raw_identity", outdir, out, "--chunk_len", "500",
        "--kmer_len", "5", "--downsample_factor", "5", "--trim", "0", "0",
        "--normalisation", "per-read", "--overwrite"])
    import h5py
    with h5py.File(out, "r") as h5:
        chunks = h5["chunks"][:]
        labels = h5["labels"][:]
    assert len(chunks) >= 3 * (1500 * 5 // 500) // 2   # most signal chunked
    kmers = bio.all_kmers(5)
    # chunks of one read are written contiguously; decode read 0's chunks
    # (a kmer whose dwell spans a chunk boundary is labelled in BOTH chunks
    # — reference semantics — so decode per chunk, not concatenated)
    with Fast5(files[0]) as f5:
        ref0 = f5.get_reference_fasta().decode()
        nsamples = len(f5.get_read(raw=True))
    nchunk0 = nsamples // 500
    assert nchunk0 >= 10
    covered = 0
    for chunk_labels in labels[:nchunk0]:
        path = [int(l) for l in chunk_labels if l != 0]
        seq = bio.kmers_to_sequence([kmers[s - 1] for s in path],
                                    always_move=True)
        assert seq in ref0      # exact ground-truth labels, no decode noise
        covered += len(seq) - 4   # kmer positions
    # every chunk decodes nearly chunk_len / mean_dwell kmer positions
    assert covered > 0.9 * nchunk0 * 500 / 9.0


def test_noise_free_signal_levels_exact(readset):
    """With zero noise the signal is exactly the per-kmer level table."""
    genome = simulate.random_genome(5000, seed=3)
    rs = np.random.RandomState(0)
    read = simulate.simulate_read(genome, rs, read_len=200, noise_sd=0.0)
    levels = simulate.pore_model(5)
    expect = np.repeat(levels[read["codes"]], read["dwells"])
    np.testing.assert_allclose(read["signal"], expect, atol=1e-6)
