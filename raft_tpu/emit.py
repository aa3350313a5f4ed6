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
                   coverages: Sequence[np.ndarray],
                   use_native: bool = True) -> None:
    from raft_tpu.io import native
    if use_native and native.emit_available():
        n = len(coverages)
        cov_off = np.zeros(n + 1, dtype=np.int64)
        for i, cov in enumerate(coverages):
            cov_off[i + 1] = cov_off[i] + len(cov)
        cov_flat = (np.concatenate(coverages).astype(np.int32)
                    if n else np.empty(0, np.int32))
        if native.emit_coverage(path, cov_flat, cov_off, n, reso):
            return
    with open(path, "w", buffering=1 << 20) as f:
        for i, cov in enumerate(coverages):
            parts = [f"read {i} "]
            parts += [f"{j * reso},{int(c)} " for j, c in enumerate(cov)]
            parts.append("\n")
            f.write("".join(parts))


def write_long_repeats(path: str,
                       repeats_per_read: Sequence[Sequence[tuple[int, int]]],
                       use_native: bool = True) -> None:
    from raft_tpu.io import native
    if use_native and native.emit_available():
        n = len(repeats_per_read)
        rep_off = np.zeros(n + 1, dtype=np.int64)
        for i, reps in enumerate(repeats_per_read):
            rep_off[i + 1] = rep_off[i] + len(reps)
        tot = int(rep_off[-1])
        rep_s = np.empty(tot, dtype=np.int32)
        rep_e = np.empty(tot, dtype=np.int32)
        k = 0
        for reps in repeats_per_read:
            for (s, e) in reps:
                rep_s[k] = s
                rep_e[k] = e
                k += 1
        if native.emit_repeats(path, rep_s, rep_e, rep_off, n):
            return
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
                          frags_per_read: Sequence[Sequence[Fragment]],
                          use_native: bool = True) -> int:
    """Emit the fragmented FASTA; returns the number of fragments written."""
    from raft_tpu.io import native
    if use_native and native.emit_available():
        headers: list[str | None] = []
        frag_read: list[int] = []
        char_start: list[int] = []
        char_len: list[int] = []
        read_num = 1
        for i, frags in enumerate(frags_per_read):
            for frag in frags:
                headers.append(fragment_header(read_num, store, i, frag))
                frag_read.append(i)
                char_start.append(frag.char_start)
                char_len.append(frag.char_len)
                read_num += 1
        if native.emit_frags(
                path, store,
                np.asarray(frag_read, dtype=np.int32),
                np.asarray(char_start, dtype=np.int64),
                np.asarray(char_len, dtype=np.int64), headers):
            return read_num - 1

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
