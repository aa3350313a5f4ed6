"""ctypes bridge to the native C++ I/O library (``raft_tpu/_native``).

The native library provides streaming gz-aware FASTA/FASTQ + PAF parsing
and FASTA emission at multi-GB/s — the reference's hot I/O loops
(``kseq.h``, ``paf.hpp``, ``chop.hpp:318``) are I/O-bound, so this is the
Amdahl-critical host component (SURVEY.md §6-7).

Until the library is built (``make -C raft_tpu/_native``), every entry
point returns ``None`` and callers fall back to the pure-Python parsers.
"""

from __future__ import annotations


def load_reads(path):
    return None


def load_paf(path, store):
    return None


def emit_available() -> bool:
    return False
