"""Byte-exact output emission for the four RAFT output files.

Formats (verified against the reference):

* ``<prefix>.reads.fasta``  — ``chop.hpp:250-321``: one header line + the
  whole fragment sequence on ONE line (no wrapping). Global fragment
  numbering ``read=1,2,3,...`` is a strict sequential counter across all
  reads in id order (``chop.hpp:195,319``).
* ``<prefix>.coverage.txt`` — ``repeat.hpp:105-108``:
  ``read {i} `` then ``{winStart},{cov} `` per window, newline.
* ``<prefix>.long_repeats.txt`` — ``repeat.hpp:182-185``:
  ``read {i}, `` then ``{s},{e}    `` (four trailing spaces) per interval.
* ``<prefix>.long_repeats.bed`` — ``repeat.hpp:187-199``: simulated mode
  only; genome coordinates with the reverse-strand flip.

The writers accept plain Python/numpy data so they can be fed either by
the oracle engine or by arrays gathered back from the device pipeline.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from raft_tpu.io.fasta import ReadStore
from raft_tpu.ops.oracle import Fragment
from raft_tpu.params import AlgoParams


def write_coverage(path: str, reso: int,
                   coverages: Iterable[np.ndarray]) -> None:
    with open(path, "w", buffering=1 << 20) as f:
        for i, cov in enumerate(coverages):
            parts = [f"read {i} "]
            parts += [f"{j * reso},{int(c)} " for j, c in enumerate(cov)]
            parts.append("\n")
            f.write("".join(parts))


def write_long_repeats(path: str,
                       repeats_per_read: Sequence[Sequence[tuple[int, int]]]
                       ) -> None:
    with open(path, "w", buffering=1 << 20) as f:
        for i, reps in enumerate(repeats_per_read):
            parts = [f"read {i}, "]
            parts += [f"{s},{e}    " for (s, e) in reps]
            parts.append("\n")
            f.write("".join(parts))


def write_long_repeats_bed(path: str, store: ReadStore,
                           repeats_per_read: Sequence[Sequence[tuple[int, int]]]
                           ) -> None:
    """Simulated mode only: genome-coordinate BED with reverse-strand flip
    (``repeat.hpp:187-199``). In real-reads mode the reference still creates
    the file but never writes to it."""
    with open(path, "w", buffering=1 << 20) as f:
        if store.real_reads:
            return
        for i, reps in enumerate(repeats_per_read):
            al = store.align[i]
            ch = store.chrom[i]
            sp = int(store.start_pos[i])
            ep = int(store.end_pos[i])
            for (s, e) in reps:
                if al == "forward":
                    f.write(f"{ch}\t{sp + s}\t{sp + e}\n")
                elif al == "reverse":
                    f.write(f"{ch}\t{ep - e}\t{ep - s}\n")


def fragment_header(read_num: int, store: ReadStore, i: int,
                    frag: Fragment) -> str | None:
    """Header line (without ``>``... includes it actually) for one fragment.

    Returns None when the reference writes no header (simulated mode with
    an alignment string that is neither ``forward`` nor ``reverse``,
    ``chop.hpp:293-311`` falls through both branches).
    """
    name = store.names[i]
    if store.real_reads:
        if frag.whole:
            return (f">read={read_num},{name},pos_on_original_read="
                    f"0-{frag.char_len}")
        return (f">read={read_num},{name},pos_on_original_read="
                f"{frag.star - frag.ov}-{frag.last}")
    # simulated mode
    al = store.align[i]
    sp = int(store.start_pos[i])
    ep = int(store.end_pos[i])
    suffix = name[name.rfind(","):]  # includes the comma (chop.hpp:257)
    if frag.whole:
        length = frag.char_len
        return (f">read={read_num},{al},position={sp}-{ep}"
                f",length={length}{suffix}")
    length = frag.last - frag.star + frag.ov
    if al == "forward":
        return (f">read={read_num},{al},position="
                f"{sp + frag.star - frag.ov}-{sp + frag.last}"
                f",length={length}{suffix}")
    if al == "reverse":
        return (f">read={read_num},{al},position="
                f"{ep - frag.last}-{ep - frag.star + frag.ov}"
                f",length={length}{suffix}")
    return None


def write_fragments_fasta(path: str, store: ReadStore, params: AlgoParams,
                          frags_per_read: Sequence[Sequence[Fragment]]
                          ) -> int:
    """Emit the fragmented FASTA; returns the number of fragments written."""
    blob = store.seq_blob
    off = store.seq_off
    read_num = 1
    with open(path, "wb", buffering=1 << 22) as f:
        for i, frags in enumerate(frags_per_read):
            base = int(off[i])
            for frag in frags:
                hdr = fragment_header(read_num, store, i, frag)
                if hdr is not None:
                    f.write(hdr.encode("ascii"))
                    f.write(b"\n")
                s = base + frag.char_start
                f.write(blob[s:s + frag.char_len])
                f.write(b"\n")
                read_num += 1
    return read_num - 1
