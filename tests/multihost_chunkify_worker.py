"""Worker process for the multi-host chunkify parity tests.

Usage: python multihost_chunkify_worker.py <pid> <nproc> <coordinator> <out>
           [raw_identity]
       python multihost_chunkify_worker.py <pid> <nproc> <coordinator> <out>
           raw_remap <refs.fa> <strand_list>

Initialises the distributed CPU runtime (1 local device per process) and
runs the production chunkify CLI; with nproc > 1 each process chunkifies a
strided share of the read list and rank 0 writes the merged HDF5 (and, for
raw_remap — the reference's distinctive capability,
/root/reference/sloika/tools/chunkify_raw.py:341-461 — the merged strand
TSV).  raw_remap runs the device remap of each shard with the imported
pretrained model (banded XLA on CPU).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

READS = "/root/reference/data/reads"
PRETRAINED = "/root/reference/models/pretrained.pkl"


def main():
    pid, nproc, addr, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "raw_identity"
    if nproc > 1:
        jax.distributed.initialize(addr, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc

    from sloika_tpu.cli import chunkify
    if mode == "raw_remap":
        refs_fa, strand_list = sys.argv[6], sys.argv[7]
        rc = chunkify.main(["raw_remap", READS, out, PRETRAINED, refs_fa,
                            "--chunk_len", "1000", "--kmer_len", "5",
                            "--downsample_factor", "5", "--batch", "4",
                            "--band", "200",
                            "--input_strand_list", strand_list,
                            "--output_strand_list", out + ".strands.txt",
                            "--overwrite"])
    else:
        rc = chunkify.main(["raw_identity", READS, out,
                            "--chunk_len", "1000", "--kmer_len", "5",
                            "--downsample_factor", "5", "--overwrite"])
    print("RC", rc)
    return rc


if __name__ == "__main__":
    sys.exit(main())
