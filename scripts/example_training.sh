#!/usr/bin/env bash
# Full training recipe (analogue of the reference's
# scripts/example_training.sh): basecall a read set with an existing model,
# extract per-read references, remap, filter strands by remap quality, and
# train a fresh model.
set -euo pipefail

READS=${READS:-/root/reference/data/reads}
MODEL=${MODEL:-/root/reference/models/pretrained.pkl}
OUT=${OUT:-$(mktemp -d /tmp/sloika_tpu_training.XXXX)}
MODEL_DEF=${MODEL_DEF:-raw_0.98_rgrgr}
NITER=${NITER:-50000}
CHUNK=${CHUNK:-4000}

export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"
echo "* Output directory: $OUT"

echo "* Extracting per-read references"
python -m sloika_tpu.cli.extract_reference "$READS" --output "$OUT/refs.fa"

echo "* Remapping reads (batched on device)"
python -m sloika_tpu.cli.chunkify raw_remap "$READS" "$OUT/chunks.hdf5" \
    "$MODEL" "$OUT/refs.fa" \
    --chunk_len "$CHUNK" --kmer_len 5 --downsample_factor 5 \
    --output_strand_list "$OUT/strands_raw.txt" --overwrite

echo "* Filtering strands by remap quality (score/stay criteria, as in the"
echo "  reference's awk filter)"
awk 'NR==1 || ($3 < 1.0 && $4 / $2 < 0.6)' \
    "$OUT/strands_raw.txt" > "$OUT/strands_filtered.txt"

echo "* Re-chunking with the filtered strand list"
python -m sloika_tpu.cli.chunkify raw_remap "$READS" "$OUT/chunks_filtered.hdf5" \
    "$MODEL" "$OUT/refs.fa" \
    --input_strand_list "$OUT/strands_filtered.txt" \
    --chunk_len "$CHUNK" --kmer_len 5 --downsample_factor 5 \
    --output_strand_list "$OUT/strands_final.txt" --overwrite

echo "* Training $MODEL_DEF for $NITER iterations"
python -m sloika_tpu.cli.train raw "$MODEL_DEF" "$OUT/training" \
    "$OUT/chunks_filtered.hdf5" --niteration "$NITER" --overwrite

echo "* Done: $OUT/training/model_final.npz"
