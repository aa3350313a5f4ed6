#!/usr/bin/env bash
# Contained-read analysis: the assembly-gap diagnosis RAFT exists to fix.
# Reference counterparts: bash_scripts/map_mm_noncontained.sh (identify
# contained reads from ava overlaps, map the non-contained remainder to
# the truth haplotypes, report truth regions left with zero exact-mapped
# coverage), bash_scripts/hifiasm_analysis.sh (which contained reads the
# assembler rescued into its raw unitig graph), and
# bash_scripts/rescued_contained_reads.sh (length of gaps the rescued
# reads still leave unresolved).
#
# Subcommands:
#   identify  <overlaps.paf> <reads.fa>                → contained.txt,
#             non-contained.txt (a read is contained when some overlap
#             covers its full span at >= MIN_IDENT% identity)
#   gaps      <reads.fa> <non-contained.txt> <hap.fa> <genome.size>
#             → nocov.merged.bed + .sum (truth regions with no exact
#             full-length mapping from non-contained reads; gaps near
#             (END_PAD bp) sequence ends are excluded)
#   rescued   <r_utg.gfa> <contained.txt>              → rescued.txt
#             (contained reads the assembler pulled back into the graph)
#
# Env knobs: MIN_IDENT (default 100), END_PAD (default 25000), T (threads).
set -euo pipefail

MIN_IDENT=${MIN_IDENT:-100}
END_PAD=${END_PAD:-25000}
T=${T:-$(nproc)}
CMD=$1; shift

identify() {
  local paf=$1 reads=$2
  # A contained in B: A's interval is its whole length, identity filter on
  # matches/alignment-length, and A strictly shorter (ties keep one copy).
  awk -v mi="$MIN_IDENT" '
    $3 == 0 && $4 == $2 && $2 < $7  && $10*100.0/$11 >= mi { print $1 }
    $8 == 0 && $9 == $7 && $7 < $2  && $10*100.0/$11 >= mi { print $6 }
  ' "$paf" | sort -u > contained.txt
  grep '^>' "$reads" | sed 's/^>//; s/[ \t].*//' | sort > all_reads.txt
  comm -23 all_reads.txt contained.txt > non-contained.txt
  echo "contained:     $(wc -l < contained.txt)"
  echo "non-contained: $(wc -l < non-contained.txt)"
}

gaps() {
  local reads=$1 keep=$2 hap=$3 gsize=$4
  command -v seqtk >/dev/null && command -v minimap2 >/dev/null \
    && command -v bedtools >/dev/null || {
      echo "needs seqtk + minimap2 + bedtools on PATH" >&2; exit 1; }
  seqtk subseq "$reads" "$keep" > non-contained.fasta
  minimap2 -t "$T" -N 50 -cx map-ont "$hap" non-contained.fasta > nc.paf
  # exact full-length mappings only: query interval == whole read and
  # matches == read length
  awk '$3 == 0 && $4 == $2 && $10 == $2 { print $6"\t"$8"\t"$9 }' nc.paf \
    | sort -k1,1 -k2,2n -k3,3nr > exactmapped.bed
  bedtools genomecov -i exactmapped.bed -g "$gsize" -bga \
    | awk '$4 == 0' > nocov.bed
  bedtools merge -d 500 -i nocov.bed > nocov.merged.bed
  # exclude sequence ends (telomeric/edge artifacts, reference pads 25 kb)
  awk -v p="$END_PAD" 'BEGIN{OFS="\t"} {
      if ($2 > p) print $1, 0, p;
      if ($2 > p) print $1, $2-p, $2 }' "$gsize" > ends.bed
  bedtools subtract -A -a nocov.merged.bed -b ends.bed > nocov.noends.bed
  awk -F'\t' '{s += $3-$2} END{print s+0}' nocov.noends.bed \
    > nocov.noends.bed.sum
  echo "uncovered truth bp (non-contained reads only): $(cat nocov.noends.bed.sum)"
}

rescued() {
  local gfa=$1 contained=$2
  # reads present in the assembler's raw unitig graph (A-lines name the
  # constituent reads) that the ava analysis had called contained
  awk -F'\t' '$1 == "A" { print $5 }' "$gfa" | sort -u > graph_reads.txt
  comm -12 graph_reads.txt <(sort -u "$contained") > rescued.txt
  echo "rescued contained reads: $(wc -l < rescued.txt)"
}

case "$CMD" in
  identify) identify "$@" ;;
  gaps)     gaps "$@" ;;
  rescued)  rescued "$@" ;;
  *) echo "usage: contained_reads.sh identify|gaps|rescued ..." >&2; exit 1 ;;
esac
