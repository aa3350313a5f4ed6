#!/usr/bin/env bash
# Assembly QC harness (equivalents of reference bash_scripts/: quast NG50,
# yak QV, trio switch errors, asmgene completeness, minigraph NGA50).
# All external tools. Unlike the reference's one-metric-one-script layout,
# this wrapper runs every metric whose tool is installed — and reports,
# per metric, whether it RAN, was SKIPPED (tool/input missing), or FAILED,
# as one machine-readable JSON line on stdout. Exit status: 0 only when at
# least one metric ran and none failed; 1 when zero metrics ran; 2 when
# any metric's tool errored. A QC run that silently did nothing must not
# look like a pass.
#
# Usage: eval_assembly.sh <asm.fa> <ref.fa> [reads.fq] [pat.yak] [mat.yak]
set -uo pipefail

ASM=$1; REF=$2; READS=${3:-}; PAT=${4:-}; MAT=${5:-}

declare -A STATUS
ran=0 failed=0

run_metric() {  # run_metric NAME CMD... — records ran/failed
  local name=$1; shift
  if "$@"; then STATUS[$name]=ran; ran=$((ran+1))
  else STATUS[$name]=failed; failed=$((failed+1)); fi
}

# contiguity stats: pure-python, always available (N50/L50 + NG50/LG50
# against the reference's total length) — guarantees at least one metric
# genuinely runs in tool-free environments
REPO_ROOT=$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)
if command -v python3 >/dev/null; then
  run_metric asm_stats bash -c \
    'PYTHONPATH="$1:${PYTHONPATH:-}" python3 -m raft_tpu.tools.asm_stats "$2" -r "$3" > asm_stats.json' \
    _ "$REPO_ROOT" "$ASM" "$REF"
else STATUS[asm_stats]=skipped; fi

# quast: NG50 / misassemblies (ref: bash_scripts/quast_pri.sh)
if command -v quast.py >/dev/null; then
  run_metric quast quast.py --large --min-identity 80 -t 16 -r "$REF" \
    -o quast_out "$ASM"
else STATUS[quast]=skipped; fi

# yak QV (ref: bash_scripts/yak_qv_*.sh)
if [ -n "$READS" ] && command -v yak >/dev/null; then
  run_metric yak_qv bash -c \
    'yak count -b37 -t16 -o sr.yak "$1" && yak qv -t16 sr.yak "$2" > yak_qv.txt' \
    _ "$READS" "$ASM"
else STATUS[yak_qv]=skipped; fi

# trio switch errors (ref: bash_scripts/switch_error.sh)
if [ -n "$PAT" ] && [ -n "$MAT" ] && command -v yak >/dev/null; then
  run_metric switch_error bash -c \
    'yak trioeval -t16 "$1" "$2" "$3" > switch_error.txt' _ "$PAT" "$MAT" "$ASM"
else STATUS[switch_error]=skipped; fi

# NGA50 via minigraph+paftools (ref: bash_scripts/minigraph.sh)
if command -v minigraph >/dev/null && command -v paftools.js >/dev/null; then
  run_metric nga50 bash -c \
    'minigraph -t16 -xasm -K1.9g --show-unmap=yes "$1" "$2" > asm.paf &&
     paftools.js asmstat "$1.fai" asm.paf > nga50.txt' _ "$REF" "$ASM"
else STATUS[nga50]=skipped; fi

# gene completeness (ref: bash_scripts/asmgene_*.sh)
if command -v minimap2 >/dev/null && command -v paftools.js >/dev/null; then
  run_metric asmgene bash -c \
    'minimap2 -cxasm10 -t16 --cs "$1" "$2" > asmgene.paf &&
     paftools.js asmgene -a "$1" asmgene.paf > asmgene.txt' _ "$REF" "$ASM"
else STATUS[asmgene]=skipped; fi

# machine-readable summary (one JSON line) + human echo
printf '{'
first=1
for m in asm_stats quast yak_qv switch_error nga50 asmgene; do
  [ $first -eq 0 ] && printf ', '
  printf '"%s": "%s"' "$m" "${STATUS[$m]}"
  first=0
done
printf ', "ran": %d, "failed": %d}\n' "$ran" "$failed"

if [ "$failed" -gt 0 ]; then
  echo "ERROR: $failed metric(s) failed" >&2; exit 2
fi
if [ "$ran" -eq 0 ]; then
  echo "ERROR: no QC tool available — zero metrics ran" >&2; exit 1
fi
