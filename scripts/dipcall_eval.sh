#!/usr/bin/env bash
# Small-variant concordance of a diploid assembly: dipcall → hap.py
# against a GIAB truth set (reference counterpart: bash_scripts/dipcall.sh,
# which assumed the dipcall VCF already existed and ran hap.py in a
# shifter container; this wrapper runs both stages on bare tools).
#
# Usage: dipcall_eval.sh <hap1.fa> <hap2.fa> <ref.fa> <truth.vcf.gz> \
#                        <confident.bed> [outdir]
set -euo pipefail

HAP1=$1; HAP2=$2; REF=$3; TRUTH=$4; TRUTH_BED=$5; OUT=${6:-dipcall_eval}
mkdir -p "$OUT"

command -v run-dipcall >/dev/null || {
  echo "run-dipcall (dipcall) not found on PATH" >&2; exit 1; }

# stage 1: assembly → phased VCF (dipcall drives minimap2 + htsbox)
run-dipcall "$OUT/dip" "$REF" "$HAP1" "$HAP2" > "$OUT/dip.mak"
make -j2 -f "$OUT/dip.mak"

# stage 2: concordance vs the truth set, restricted to the intersection
# of the GIAB confident regions and dipcall's confident regions
command -v hap.py >/dev/null || {
  echo "hap.py not found on PATH; dipcall VCF is at $OUT/dip.dip.vcf.gz" >&2
  exit 1; }
if command -v bedtools >/dev/null; then
  bedtools intersect -a "$TRUTH_BED" -b "$OUT/dip.dip.bed" \
    > "$OUT/confident.bed"
else
  cp "$TRUTH_BED" "$OUT/confident.bed"
fi
hap.py "$TRUTH" "$OUT/dip.dip.vcf.gz" -f "$OUT/confident.bed" -r "$REF" \
  -o "$OUT/happy" --engine=vcfeval --pass-only
echo "concordance summary: $OUT/happy.summary.csv"
