#!/usr/bin/env bash
# Assembly QC harness (equivalents of reference bash_scripts/: quast NG50,
# yak QV, trio switch errors, asmgene completeness, minigraph NGA50).
# All external tools; run whichever are installed.
#
# Usage: eval_assembly.sh <asm.fa> <ref.fa> [reads.fq] [pat.yak] [mat.yak]
set -uo pipefail

ASM=$1; REF=$2; READS=${3:-}; PAT=${4:-}; MAT=${5:-}

command -v quast.py >/dev/null && \
  quast.py --large --min-identity 80 -t 16 -r "$REF" -o quast_out "$ASM"

if [ -n "$READS" ] && command -v yak >/dev/null; then
  yak count -b37 -t16 -o sr.yak "$READS"
  yak qv -t16 sr.yak "$ASM" > yak_qv.txt
fi

if [ -n "$PAT" ] && [ -n "$MAT" ] && command -v yak >/dev/null; then
  yak trioeval -t16 "$PAT" "$MAT" "$ASM" > switch_error.txt
fi

if command -v minigraph >/dev/null && command -v paftools.js >/dev/null; then
  minigraph -t16 -xasm -K1.9g --show-unmap=yes "$REF" "$ASM" > asm.paf
  paftools.js asmstat "${REF}.fai" asm.paf > nga50.txt
fi

if command -v minimap2 >/dev/null && command -v paftools.js >/dev/null; then
  minimap2 -cxasm10 -t16 --cs "$REF" "$ASM" > asmgene.paf
  paftools.js asmgene -a "$REF" asmgene.paf > asmgene.txt 2>/dev/null || true
fi
echo "done (ran whichever tools were available)"
