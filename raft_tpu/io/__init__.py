from raft_tpu.io.fasta import ReadStore, load_reads
from raft_tpu.io.paf import OverlapTable, load_paf

__all__ = ["ReadStore", "load_reads", "OverlapTable", "load_paf"]
