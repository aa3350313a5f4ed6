"""Synthetic fixture generator for parity tests.

Generates reads + all-vs-all-style PAF overlaps with engineered
high-coverage (repeat) regions, in every input mode the reference
distinguishes (SURVEY.md §4): real vs simulated headers, symmetric vs
asymmetric PAF, FASTA vs FASTQ, plain vs gzip, multi-line sequences.
"""

from __future__ import annotations

import gzip
import random


BASES = "ACGT"


def _seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(BASES) for _ in range(n))


def make_reads(rng: random.Random, n_reads: int, len_lo: int, len_hi: int,
               simulated: bool = False) -> list[tuple[str, str]]:
    """Returns [(name, seq)]. Simulated names follow the seqrequester
    pattern the reference regex-detects (chop.hpp:101)."""
    reads = []
    gpos = 100
    for i in range(n_reads):
        L = rng.randint(len_lo, len_hi)
        if simulated:
            align = rng.choice(["forward", "reverse"])
            start = gpos
            end = start + L
            gpos = end + rng.randint(0, 1000)
            chrom = f"chr{rng.randint(1, 3)}"
            name = (f"read={i + 1},{align},position={start}-{end},"
                    f"length={L},{chrom}")
        else:
            name = f"r{i:05d}"
        reads.append((name, _seq(rng, L)))
    return reads


def make_paf(rng: random.Random, reads: list[tuple[str, str]],
             n_pairs: int, repeat_spec=None, symmetric: bool = False,
             include_self: bool = False) -> list[str]:
    """Random overlap rows; ``repeat_spec`` is a list of
    (read_idx, span_start, span_end, extra_cov) engineering high-coverage
    runs on chosen reads."""
    lines: list[str] = []
    n = len(reads)

    def row(qi, qs, qe, ti, ts, te):
        qn, q = reads[qi]
        tn, t = reads[ti]
        ml = min(qe - qs, te - ts)
        bl = max(qe - qs, te - ts)
        strand = rng.choice("+-")
        return (f"{qn}\t{len(q)}\t{qs}\t{qe}\t{strand}\t"
                f"{tn}\t{len(t)}\t{ts}\t{te}\t{ml}\t{bl}\tcm:i:{rng.randint(1,99)}")

    def rand_iv(i):
        L = len(reads[i][1])
        if L <= 1:
            return 0, max(L, 0)
        a = rng.randint(0, L - 1)
        b = rng.randint(a + 1, L)
        return a, b

    for _ in range(n_pairs):
        qi = rng.randrange(n)
        ti = rng.randrange(n)
        if not include_self and qi == ti and n > 1:
            ti = (ti + 1) % n
        qs, qe = rand_iv(qi)
        ts, te = rand_iv(ti)
        lines.append(row(qi, qs, qe, ti, ts, te))
        if symmetric:
            lines.append(row(ti, ts, te, qi, qs, qe))

    if repeat_spec:
        for (ri, lo, hi, extra) in repeat_spec:
            L = len(reads[ri][1])
            lo = max(0, min(lo, L - 1))
            hi = max(lo + 1, min(hi, L))
            for _ in range(extra):
                ti = rng.randrange(n)
                if not include_self and ti == ri and n > 1:
                    ti = (ti + 1) % n
                ts, te = rand_iv(ti)
                lines.append(row(ri, lo, hi, ti, ts, te))
                if symmetric:
                    lines.append(row(ti, ts, te, ri, lo, hi))

    if symmetric and lines:
        # guarantee record 0's mirror appears later (the detection rule,
        # chop.hpp:175-184): it already does — rows are emitted in
        # (row, mirror) pairs, so row 1 mirrors row 0.
        pass
    return lines


def write_fasta(path: str, reads, line_width: int | None = None,
                gz: bool = False, fastq: bool = False) -> None:
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for name, seq in reads:
            if fastq:
                f.write(f"@{name} some comment\n{seq}\n+\n{'I' * len(seq)}\n")
            elif line_width:
                f.write(f">{name} desc\n")
                for i in range(0, len(seq), line_width):
                    f.write(seq[i:i + line_width] + "\n")
            else:
                f.write(f">{name}\n{seq}\n")


def write_bgzf(path: str, data: bytes, block: int = 60000) -> None:
    """Write BGZF (blocked gzip with the BC extra subfield, as produced
    by bgzip/samtools): each <=64KB chunk becomes one gzip member whose
    extra field carries the total member size."""
    import struct
    import zlib
    out = bytearray()
    for i in range(0, len(data), block):
        chunk = data[i:i + block]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = co.compress(chunk) + co.flush()
        bsize = 12 + 6 + len(payload) + 8  # header+xtra, payload, trailer
        out += struct.pack("<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
        out += struct.pack("<BBHH", ord("B"), ord("C"), 2, bsize - 1)
        out += payload
        out += struct.pack("<II", zlib.crc32(chunk) & 0xFFFFFFFF,
                           len(chunk))
    # 28-byte EOF marker block
    out += bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000")
    with open(path, "wb") as f:
        f.write(bytes(out))


def write_paf(path: str, lines, gz: bool = False) -> None:
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for ln in lines:
            f.write(ln + "\n")


def standard_case(seed: int, tmpdir: str, simulated=False, symmetric=False,
                  gz=False, fastq=False, multiline=False,
                  n_reads=40, len_lo=300, len_hi=60000, n_pairs=150,
                  with_repeats=True):
    """Write a complete fixture; returns (reads_path, paf_path)."""
    rng = random.Random(seed)
    reads = make_reads(rng, n_reads, len_lo, len_hi, simulated=simulated)
    repeat_spec = []
    if with_repeats:
        for _ in range(max(2, n_reads // 6)):
            ri = rng.randrange(n_reads)
            L = len(reads[ri][1])
            if L < 2000:
                continue
            lo = rng.randint(0, L // 2)
            hi = min(L, lo + rng.randint(L // 4, L))
            repeat_spec.append((ri, lo, hi, rng.randint(30, 60)))
    lines = make_paf(rng, reads, n_pairs, repeat_spec=repeat_spec,
                     symmetric=symmetric, include_self=True)
    ext = "fastq" if fastq else "fasta"
    reads_path = f"{tmpdir}/reads.{ext}" + (".gz" if gz else "")
    paf_path = f"{tmpdir}/overlaps.paf" + (".gz" if gz else "")
    write_fasta(reads_path, reads, gz=gz, fastq=fastq,
                line_width=80 if multiline else None)
    write_paf(paf_path, lines, gz=gz)
    return reads_path, paf_path
