"""Worker process for the multi-host chunkify parity test.

Usage: python multihost_chunkify_worker.py <pid> <nproc> <coordinator> <out>

Initialises the distributed CPU runtime (1 local device per process) and
runs the production chunkify CLI (raw_identity mode: in-file mapping
tables, no model); with nproc > 1 each process chunkifies a strided share
of the read list and rank 0 writes the merged HDF5.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

READS = "/root/reference/data/reads"


def main():
    pid, nproc, addr, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    if nproc > 1:
        jax.distributed.initialize(addr, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc

    from sloika_tpu.cli import chunkify
    rc = chunkify.main(["raw_identity", READS, out,
                        "--chunk_len", "1000", "--kmer_len", "5",
                        "--downsample_factor", "5", "--overwrite"])
    print("RC", rc)
    return rc


if __name__ == "__main__":
    sys.exit(main())
