"""Worker process for the multi-host basecall parity test.

Usage: python multihost_basecall_worker.py <pid> <nproc> <coordinator> <out>

Initialises the distributed CPU runtime (1 local device per process) and
runs the production basecall CLI; with nproc > 1 the CLI shards the read
list per process and rank 0 writes the merged FASTA.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    pid, nproc, addr, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    if nproc > 1:
        jax.distributed.initialize(addr, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc

    from sloika_tpu.cli import basecall
    rc = basecall.main(["raw", PRETRAINED, READS, "--limit", "4",
                        "--chunked", "--batch", "2", "--output", out])
    print("RC", rc)
    return rc


if __name__ == "__main__":
    sys.exit(main())
