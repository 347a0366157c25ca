"""Native kernels + evaluation subsystem tests."""
import io

import numpy as np
import pytest

from sloika_tpu import align as align_mod
from sloika_tpu import bio, native
from sloika_tpu.data.sam import read_sam
from sloika_tpu.ops.remap_np import slip_update as np_slip


def test_native_slip_update_parity():
    rs = np.random.RandomState(11)
    x = rs.normal(size=200).astype(np.float32)
    for slip in [0.0, 1.5, 6.0]:
        cs, cp = native.slip_update(x, slip)
        ns, npos = np_slip(x, np.float32(slip))
        np.testing.assert_allclose(cs[2:], ns[2:], rtol=1e-6)
        np.testing.assert_array_equal(cp, npos)


def test_align_exact_and_errors():
    a = native.align_semiglobal("ACGTACGTAA", "TTACGTACGTAATT")
    assert (a.match, a.mismatch, a.insertion, a.deletion) == (10, 0, 0, 0)
    assert (a.rstart, a.rend) == (2, 12)
    a = native.align_semiglobal("ACGTTCGTAA", "TTACGTACGTAATT")
    assert (a.mismatch, a.insertion, a.deletion) == (1, 0, 0)
    a = native.align_semiglobal("ACGTCGTAA", "TTACGTACGTAATT")
    assert (a.insertion, a.deletion) == (0, 1)
    a = native.align_semiglobal("ACGTAACGTAA", "TTACGTACGTAATT")
    assert (a.insertion, a.deletion) == (1, 0)


def test_align_long_noisy():
    """Accuracy of a synthetically corrupted sequence must track the planted
    error rate."""
    rs = np.random.RandomState(3)
    bases = "ACGT"
    ref = "".join(rs.choice(list(bases), 3000))
    # plant ~5% errors
    q = []
    for c in ref:
        r = rs.rand()
        if r < 0.02:
            q.append(bases[rs.randint(4)])     # substitution
        elif r < 0.035:
            continue                            # deletion
        elif r < 0.05:
            q.append(c)
            q.append(bases[rs.randint(4)])     # insertion
        else:
            q.append(c)
    query = "".join(q)
    a = native.align_semiglobal(query, ref)
    assert 0.9 < a.accuracy < 0.98


def test_short_call_counts_as_unmapped():
    """Calls below bwa mem's minimum seed length (19) could never be mapped
    by the reference's evaluator (misc/align.py:46), so they must be
    excluded from accuracy statistics rather than trivially aligned —
    an all-stay decode of a junk read otherwise pollutes the mean."""
    ref = "ACGT" * 50
    assert align_mod.accuracy_metrics("q", "ACGTA", "r", ref) is None
    rows = align_mod.evaluate_basecalls({"q": "ACGTA"}, {"q": ref})
    assert rows == []
    # a mappable-length call still produces a row
    assert align_mod.accuracy_metrics("q", ref[20:60], "r", ref) is not None


def test_accuracy_metrics_strand():
    rs = np.random.RandomState(5)
    ref = "".join(rs.choice(list("ACGT"), 500))
    row = align_mod.accuracy_metrics("q", ref, "r", bio.reverse_complement(ref))
    assert row["strand"] == "-"
    assert row["accuracy"] == pytest.approx(1.0)


def test_summary_report():
    rows = [{"query": "q{}".format(i), "accuracy": 0.85 + 0.01 * i,
             "information": 1000.0} for i in range(10)]
    rep = align_mod.summary(rows, "testset")
    assert "Number of mapped reads:  10" in rep
    assert "Proportion with accuracy >90%:  0.40000" in rep


SAM_TEXT = """@HD\tVN:1.3\tSO:unsorted
@SQ\tSN:pseudo\tLN:5590
read4\t0\tpseudo\t3\t60\t5S20M2I10M3D15M4S\t*\t0\t0\t{}\t*\tNM:i:5
read5\t16\tpseudo\t100\t60\t50M\t*\t0\t0\t{}\t*\tNM:i:2
badflag\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*
""".format("A" * 56, "C" * 50)


def test_sam_parser():
    recs = list(read_sam(io.StringIO(SAM_TEXT)))
    assert len(recs) == 3
    r = recs[0]
    assert r.qname == "read4" and r.flag == 0
    assert r.reference_start == 2
    assert r.reference_end == 2 + 20 + 10 + 3 + 15
    assert r.query_length == 5 + 20 + 2 + 10 + 15 + 4
    assert r.query_alignment_start == 5
    assert r.query_alignment_end == r.query_length - 4
    assert r.tags["NM"] == 5
    bins = r.cigar_bins()
    assert bins[0] == 45 and bins[1] == 2 and bins[2] == 3


def test_get_refs_from_sam(tmp_path):
    from sloika_tpu.cli.get_refs_from_sam import get_refs
    sam = tmp_path / "test.sam"
    sam.write_text(SAM_TEXT)
    refs = {"pseudo": "ACGT" * 1500}
    out = list(get_refs(str(sam), refs, min_coverage=0.5, pad=10))
    assert len(out) == 2
    name, fasta = out[0]
    assert name == "read4.fast5"
    assert fasta.startswith(">read4\n")


def test_genome_mode_picks_best_contig(rng):
    """A call must be attributed to the contig it actually came from in a
    multi-contig reference (genome mode, reference misc/align.py:46-67)."""
    from sloika_tpu import align as align_mod
    bases = "ACGT"
    contigs = {
        "chr1": "".join(bases[i] for i in rng.randint(0, 4, 3000)),
        "chr2": "".join(bases[i] for i in rng.randint(0, 4, 3000)),
    }
    # reads: exact slices of each contig with a couple of errors
    read_a = contigs["chr1"][500:1300]
    read_b = list(contigs["chr2"][1000:1900])
    read_b[100] = "A" if read_b[100] != "A" else "C"
    read_b = "".join(read_b)
    calls = {"ra": read_a, "rb": read_b}

    rows = align_mod.evaluate_basecalls(calls, contigs, genome=True)
    by_query = {r["query"]: r for r in rows}
    assert by_query["ra"]["reference"] == "chr1"
    assert by_query["rb"]["reference"] == "chr2"
    assert by_query["ra"]["accuracy"] > 0.99
    assert by_query["rb"]["accuracy"] > 0.99
    # auto-detection: multi-record FASTA without matching names
    rows_auto = align_mod.evaluate_basecalls(calls, contigs)
    assert {r["reference"] for r in rows_auto} == {"chr1", "chr2"}


def test_acc_plot_figure(tmp_path, rng):
    from sloika_tpu import align as align_mod
    rows = [{"accuracy": a, "query": "q%d" % i, "information": 100.0}
            for i, a in enumerate(0.8 + 0.1 * rng.rand(20))]
    out = tmp_path / "plot.png"
    assert align_mod.save_acc_plot(str(out), rows, title="test")
    assert out.stat().st_size > 1000


def test_align_cli_figure(tmp_path, rng):
    from sloika_tpu.cli import align as cli_align
    bases = "ACGT"
    ref = "".join(bases[i] for i in rng.randint(0, 4, 2000))
    calls = tmp_path / "calls.fa"
    calls.write_text(">r1\n{}\n>r2\n{}\n".format(ref[100:900], ref[800:1700]))
    reffa = tmp_path / "ref.fa"
    reffa.write_text(">genome\n{}\n".format(ref))
    rc = cli_align.main(["--reference", str(reffa), "--figure_format", "png",
                         str(calls)])
    assert rc == 0
    assert (tmp_path / "calls.png").exists()
    assert (tmp_path / "calls.samacc").exists()
