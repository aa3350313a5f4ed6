#!/usr/bin/env bash
# All-vs-all overlap generator via minimap2 — the alternative input
# producer to hifiasm --dbg-ovec (reference counterpart:
# bash_scripts/minimapAllToAllCigar.sh:6). Produces the overlaps.paf that
# raft_tpu consumes alongside the reads.
#
# Usage: minimap_ava_overlaps.sh <reads.fa[.gz]> [ont|hifi] [out.paf] [threads]
#
# Preset notes: the reference tuned ava-ont for error-corrected ONT duplex
# reads (-w 101 -k 27 -g 500 -B 8 -O 8,48 -E 4,2); ava-pb/ava-ont defaults
# work for uncorrected reads. Coordinates in the PAF are per-read forward
# strand either way, which is all the pileup consumes (strand is ignored,
# SURVEY.md §2 "dead code": paf_rec_t.rev unused).
set -euo pipefail

READS=$1
PRESET=${2:-ont}
OUT=${3:-overlaps.paf}
T=${4:-$(nproc)}

command -v minimap2 >/dev/null || {
  echo "minimap2 not found on PATH" >&2; exit 1; }

case "$PRESET" in
  ont)
    # error-corrected long reads: long windows + large k suppress the
    # repeat-seed blowup of all-vs-all mapping on corrected reads
    minimap2 -t "$T" -w 101 -k 27 -g 500 -B 8 -O 8,48 -E 4,2 \
      -cx ava-ont "$READS" "$READS" > "$OUT"
    ;;
  hifi)
    minimap2 -t "$T" -cx ava-pb -X "$READS" "$READS" > "$OUT"
    ;;
  *)
    echo "unknown preset '$PRESET' (want ont|hifi)" >&2; exit 1
    ;;
esac
echo "wrote $OUT ($(wc -l < "$OUT") overlap rows)"
