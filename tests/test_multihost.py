"""Multi-host (multi-process) training parity test.

Launches coordinator + worker subprocesses running a real
``jax.distributed`` CPU runtime (4 virtual devices each, 8 global) through
``training.make_train_step`` with per-host sharded inputs
(mesh.put_host_batch / jax.make_array_from_process_local_data), and asserts
the per-step losses equal a single-process run of the same program — the
DCN-scale data-parallel path the reference never had (SURVEY.md §2.4).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""       # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)             # worker sets its own device count
    # CPU XLA has no bf16 dot: never inherit a compute-dtype override
    env.pop("SLOIKA_TPU_COMPUTE_DTYPE", None)
    return env


def _run_workers(nproc, addr):
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), addr],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=_env(),
        cwd=REPO, text=True) for pid in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, "worker failed:\n{}\n{}".format(out, err)
        outs.append(out)
    losses = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES "):
                losses.append(json.loads(line[7:]))
                break
        else:
            raise AssertionError("no LOSSES line in: " + out)
    return losses


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    addr = "127.0.0.1:{}".format(_free_port())
    multi = _run_workers(2, addr)
    # both processes observe identical (replicated) losses
    assert multi[0] == multi[1]
    single = _run_workers(1, "unused")
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-5)


BASECALL_WORKER = os.path.join(os.path.dirname(__file__),
                               "multihost_basecall_worker.py")


def _run_basecall_workers(nproc, addr, out):
    procs = [subprocess.Popen(
        [sys.executable, BASECALL_WORKER, str(pid), str(nproc), addr, out],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=_env(),
        cwd=REPO, text=True) for pid in range(nproc)]
    for p in procs:
        pout, perr = p.communicate(timeout=600)
        assert p.returncode == 0, "worker failed:\n{}\n{}".format(pout, perr)


@pytest.mark.slow
def test_two_process_basecall_matches_single_process(tmp_path):
    """The multi-host basecall input path (per-process strided read shard,
    per-host Basecaller, rank-0 merged FASTA) produces byte-identical
    output to a single-process run — the multi-host analogue of the
    reference's pool-per-host basecalling (bin/basecall_network.py:100-101).
    """
    if not os.path.exists("/root/reference/models/pretrained.pkl"):
        pytest.skip("reference pretrained model unavailable")
    single_out = str(tmp_path / "single.fa")
    multi_out = str(tmp_path / "multi.fa")
    _run_basecall_workers(1, "unused", single_out)
    addr = "127.0.0.1:{}".format(_free_port())
    _run_basecall_workers(2, addr, multi_out)
    with open(single_out) as f:
        single = f.read()
    with open(multi_out) as f:
        multi = f.read()
    assert len(single) > 0
    assert multi == single


CHUNKIFY_WORKER = os.path.join(os.path.dirname(__file__),
                               "multihost_chunkify_worker.py")


def _run_chunkify_workers(nproc, addr, out):
    procs = [subprocess.Popen(
        [sys.executable, CHUNKIFY_WORKER, str(pid), str(nproc), addr, out],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=_env(),
        cwd=REPO, text=True) for pid in range(nproc)]
    for p in procs:
        pout, perr = p.communicate(timeout=600)
        assert p.returncode == 0, "worker failed:\n{}\n{}".format(pout, perr)


@pytest.mark.slow
def test_two_process_chunkify_matches_single_process(tmp_path):
    """Multi-host chunkify (per-process strided read shard, per-read
    results gathered to rank 0, merged HDF5 in original read order)
    produces chunk/label/bad arrays identical to a single-process run."""
    from sloika_tpu.data import hdf5
    single_out = str(tmp_path / "single.hdf5")
    multi_out = str(tmp_path / "multi.hdf5")
    _run_chunkify_workers(1, "unused", single_out)
    addr = "127.0.0.1:{}".format(_free_port())
    _run_chunkify_workers(2, addr, multi_out)
    a = hdf5.load_labelled_chunks(single_out)
    b = hdf5.load_labelled_chunks(multi_out)
    assert set(a) == set(b)
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        if av.dtype == object:          # attrs dict: compare via repr
            assert repr(av) == repr(bv), k
        else:
            np.testing.assert_array_equal(av, bv, err_msg=k)


def test_gather_bytes_to_rank0_single_process():
    from sloika_tpu.parallel import multihost as mh
    assert mh.gather_bytes_to_rank0(b"abc") == [b"abc"]
    got = mh.gather_indexed_arrays([(3, {"x": np.arange(4)}),
                                    (1, {"x": np.arange(2)})])
    assert [i for i, _ in got] == [1, 3]
    np.testing.assert_array_equal(got[1][1]["x"], np.arange(4))


def test_pad_batch_helper():
    import jax.numpy as jnp
    from sloika_tpu.nn.pallas_gru import _pad_batch
    x = jnp.ones((5, 7, 3))
    m = jnp.ones((5, 7, 1), jnp.int8)
    B, xp, mp = _pad_batch(4, x, m)
    assert B == 8 and xp.shape == (5, 8, 3) and mp.shape == (5, 8, 1)
    assert float(xp[:, 7:].sum()) == 0.0 and int(mp[:, 7:].sum()) == 0
    # already a multiple: arrays returned untouched
    B2, x2 = _pad_batch(7, x)
    assert B2 == 7 and x2 is x


def _write_remap_inputs(tmp_path):
    from sloika_tpu.data.fast5 import Fast5
    refs_fa = str(tmp_path / "refs.fa")
    strand_list = str(tmp_path / "strands.txt")
    names = []
    with open(refs_fa, "wb") as out:
        for name in ["read2", "read4", "read5"]:
            fn = os.path.join("/root/reference/data/reads",
                              name + ".fast5")
            with Fast5(fn) as f5:
                fasta = f5.get_reference_fasta()
            seq = b"".join(l for l in fasta.splitlines()
                           if not l.startswith(b">"))
            out.write(b">" + name.encode() + b"\n" + seq + b"\n")
            names.append(name)
    with open(strand_list, "w") as f:
        f.write("filename\n")
        for n in names:
            f.write(n + ".fast5\n")
    return refs_fa, strand_list


def _run_remap_workers(nproc, addr, out, refs_fa, strand_list):
    procs = [subprocess.Popen(
        [sys.executable, CHUNKIFY_WORKER, str(pid), str(nproc), addr, out,
         "raw_remap", refs_fa, strand_list],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=_env(),
        cwd=REPO, text=True) for pid in range(nproc)]
    for p in procs:
        pout, perr = p.communicate(timeout=600)
        assert p.returncode == 0, "worker failed:\n{}\n{}".format(pout, perr)


@pytest.mark.slow
def test_two_process_raw_remap_matches_single_process(tmp_path):
    """Multi-host raw_remap (device remap of each process's read shard with
    the imported pretrained model, rank-0 merged HDF5 + strand TSV) is
    byte-identical to a single-process run (VERDICT r3 #6; the reference's
    distinctive capability, sloika/transducer.py:14-73)."""
    if not os.path.exists("/root/reference/models/pretrained.pkl"):
        pytest.skip("reference pretrained model unavailable")
    from sloika_tpu.data import hdf5
    refs_fa, strand_list = _write_remap_inputs(tmp_path)
    single_out = str(tmp_path / "single.hdf5")
    multi_out = str(tmp_path / "multi.hdf5")
    _run_remap_workers(1, "unused", single_out, refs_fa, strand_list)
    addr = "127.0.0.1:{}".format(_free_port())
    _run_remap_workers(2, addr, multi_out, refs_fa, strand_list)
    a = hdf5.load_labelled_chunks(single_out)
    b = hdf5.load_labelled_chunks(multi_out)
    assert set(a) == set(b)
    assert len(a["chunks"]) > 0
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        if av.dtype == object:
            assert repr(av) == repr(bv), k
        else:
            np.testing.assert_array_equal(av, bv, err_msg=k)
    with open(single_out + ".strands.txt") as f:
        single_tsv = f.read().splitlines()
    with open(multi_out + ".strands.txt") as f:
        multi_tsv = f.read().splitlines()
    assert len(single_tsv) >= 4                 # header + 3 reads
    assert len(multi_tsv) == len(single_tsv)
    header = single_tsv[0].split()
    score_col = header.index("score")
    for la, lb in zip(single_tsv, multi_tsv):
        fa, fb = la.split(), lb.split()
        for c, (va, vb) in enumerate(zip(fa, fb)):
            if c == score_col and va != vb and la is not single_tsv[0]:
                # remap scores depend on the padded batch shape (XLA
                # reduction order); identical labels, float-noise scores
                assert float(va) == pytest.approx(float(vb), rel=1e-4)
            else:
                assert va == vb, (la, lb)
