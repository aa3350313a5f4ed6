#!/usr/bin/env bash
# The full RAFT-hifiasm assembly workflow (reference README.md:9-41),
# with raft_tpu as the fragmentation step. Requires hifiasm on PATH
# (external tool, not part of this framework).
#
# Usage: raft_hifiasm_workflow.sh <reads.fq.gz> <genome_size_bp> <outdir> [threads]
set -euo pipefail

READS=$1
GENOME_SIZE=$2
OUT=$3
THREADS=${4:-16}
mkdir -p "$OUT"

# 1. error-correct reads (hifiasm --write-ec)
hifiasm -o "$OUT/errorcorrect" -t"$THREADS" --write-ec "$READS" 2> "$OUT/errorcorrect.log"
EC="$OUT/errorcorrect.ec.fa"

# 2. all-vs-all overlaps (hifiasm --dbg-ovec)
hifiasm -o "$OUT/getOverlaps" -t"$THREADS" --dbg-ovec "$EC" 2> "$OUT/getOverlaps.log"
cat "$OUT"/getOverlaps.0.ovlp.paf "$OUT"/getOverlaps.1.ovlp.paf > "$OUT/overlaps.paf"

# 3. estimated coverage = total bases / genome size (README.md:22-26)
TOTAL=$(awk '/^>/{next}{n+=length($0)}END{print n}' "$EC")
COV=$(( TOTAL / GENOME_SIZE ))
echo "estimated coverage: $COV"

# 4. repeat-aware fragmentation (this framework)
python -m raft_tpu.cli -e "$COV" -o "$OUT/fragmented" "$EC" "$OUT/overlaps.paf"

# 5. final assembly on fragmented reads (-r1: one correction round)
hifiasm -o "$OUT/finalasm" -t"$THREADS" -r1 "$OUT/fragmented.reads.fasta" 2> "$OUT/finalasm.log"
echo "assembly: $OUT/finalasm.bp.p_ctg.gfa"
