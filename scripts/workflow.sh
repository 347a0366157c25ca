#!/usr/bin/env bash
# Canonical end-to-end workflow on the bundled reference reads
# (the reference's scripts/workflow.sh: basecall -> evaluate -> extract
# references -> remap -> train).  Runs on CPU by default; set
# SLOIKA_TPU_DEVICE=tpu to use the chip.
set -euo pipefail

READS=${READS:-/root/reference/data/reads}
PRETRAINED=${PRETRAINED:-/root/reference/models/pretrained.pkl}
WORKDIR=${WORKDIR:-$(mktemp -d /tmp/sloika_tpu_workflow.XXXX)}
DEVICE=${SLOIKA_TPU_DEVICE:-cpu}

# append (not replace): the TPU tunnel sitecustomize lives on PYTHONPATH
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"
if [ "$DEVICE" = "cpu" ]; then
    export JAX_PLATFORMS=cpu
fi

echo "* Working directory: $WORKDIR"

echo "* 1. Basecall the reads with the pretrained model"
python -m sloika_tpu.cli.basecall raw "$PRETRAINED" "$READS" \
    --batch 4 --output "$WORKDIR/calls.fa"

echo "* 2. Extract per-read references from the fast5s"
python -m sloika_tpu.cli.extract_reference "$READS" \
    --output "$WORKDIR/refs.fa"

echo "* 3. Evaluate basecall accuracy"
python -m sloika_tpu.cli.align --reference "$WORKDIR/refs.fa" \
    "$WORKDIR/calls.fa"

echo "* 4. Remap reads against their references to build training chunks"
python -m sloika_tpu.cli.chunkify raw_remap "$READS" \
    "$WORKDIR/chunks.hdf5" "$PRETRAINED" "$WORKDIR/refs.fa" \
    --chunk_len 2000 --kmer_len 5 --downsample_factor 5 \
    --output_strand_list "$WORKDIR/strands_out.txt" --overwrite

echo "* 5. Train for a few iterations"
python -m sloika_tpu.cli.train raw raw_0.98_rgrgr "$WORKDIR/training" \
    "$WORKDIR/chunks.hdf5" --niteration 3 --batch_size 4 --quiet --overwrite

echo "* 6. Validate"
python -m sloika_tpu.cli.validate "$WORKDIR/training/model_final.npz" \
    "$WORKDIR/chunks.hdf5" --batch_size 4

test -f "$WORKDIR/training/model_final.npz"
echo "* Workflow complete: $WORKDIR/training/model_final.npz"
