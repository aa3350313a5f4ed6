#!/usr/bin/env bash
# Smoke run (equivalent of reference run.sh:1-12): run raft_tpu on a
# reads+overlaps pair, then derive a BED of fragment genome positions
# from the simulated-mode headers.
set -euo pipefail

READS=${READS:-reads.fasta}
OVERLAPS=${OVERLAPS:-overlaps.paf}
PREFIX=${PREFIX:-output}
OUTPUTSEQ=${PREFIX}.reads.fasta

rm -f ${PREFIX}*

python -m raft_tpu.cli -e 20 -m 1.3 -o ${PREFIX} $READS $OVERLAPS

grep ">" $OUTPUTSEQ > ${OUTPUTSEQ}.headers
cat ${OUTPUTSEQ}.headers | awk -F '[=,-]' '{print $9"\t"$5"\t"$6}' \
  | sort -k 1,1 -k2,2n -k3,3nr > ${OUTPUTSEQ}.headers.bed
echo "wrote ${OUTPUTSEQ}.headers.bed"
