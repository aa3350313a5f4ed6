"""Length-bucketing of reads into dense ``[B, W]`` device batches.

The reference iterates reads one at a time (``repeat.hpp:99``,
``chop.hpp:198``); the TPU design instead pads/buckets reads by window
count into dense int32 tensors (SURVEY.md §5 "long-context" analog:
sequence *batching*, not sequence parallelism).

Shapes are quantized (W to powers of two, B and E to powers of two) so the
jit cache stays small and batches with the same quantized shape reuse a
compiled executable.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _next_pow2(x: int, lo: int = 1) -> int:
    v = lo
    while v < x:
        v <<= 1
    return v


def _next_size(x: int, lo: int = 1) -> int:
    """Next size in the {2^k, 1.5*2^k} ladder: bounds padding waste to 33%
    while keeping the number of distinct jit shapes logarithmic."""
    v = lo
    while v < x:
        h = v + (v >> 1)
        if h >= x and (v >> 1) << 1 == v:  # 1.5*2^k only for even v
            return h
        v <<= 1
    return v


def _next_size4(x: int, lo: int = 1) -> int:
    """Quarter-step ladder {2^k, 1.25*2^k, 1.5*2^k, 1.75*2^k}: bounds
    padding waste to 20%. Used for event-slot counts, where padded slots
    are transferred bytes (the scarce resource on tunneled links) —
    a slightly larger shape vocabulary is the right trade there."""
    v = lo
    while v < x:
        if (v & 3) == 0:  # quarter steps stay integral
            for q in (v + (v >> 2), v + (v >> 1), v + (v >> 1) + (v >> 2)):
                if q >= x:
                    return q
        elif v + (v >> 1) >= x and (v & 1) == 0:
            return v + (v >> 1)
        v <<= 1
    return v


@dataclasses.dataclass
class Bucket:
    """One dense batch of reads plus the events that cover them.

    Events are pre-binned to window indices (w0 = floor(lo/reso),
    w1 = floor(hi/reso), hi inclusive; w1 = -1 for empty) and stored in
    the narrowest dtype that fits (int16 when B and W allow) — host→device
    transfer bytes are the scarce resource on tunneled TPU links.
    """
    read_ids: np.ndarray   # int64 [n_used] original read ids (row order)
    B: int                 # padded batch rows
    W: int                 # padded window count
    E: int                 # padded event count
    lens: np.ndarray       # int32 [B] (0 beyond n_used)
    ev_row: np.ndarray     # int16/int32 [E] row in batch; B (=drop) when pad
    ev_w0: np.ndarray      # int16/int32 [E] first window
    ev_w1: np.ndarray      # int16/int32 [E] last window (inclusive; -1 empty)
    ev_off: np.ndarray = None  # int32 [B+1] exclusive per-row offsets —
    #   what the device actually receives instead of ev_row (rows are
    #   rebuilt on device; ev_row stays host-side for coverage rebuilds)
    n_used: int = 0


def make_buckets(lens: np.ndarray, ev_read: np.ndarray, ev_lo: np.ndarray,
                 ev_hi: np.ndarray, reso: int, **kw) -> list[Bucket]:
    """List form of :func:`iter_buckets` (see there for semantics)."""
    return list(iter_buckets(lens, ev_read, ev_lo, ev_hi, reso, **kw))


def iter_buckets(lens: np.ndarray, ev_read: np.ndarray, ev_lo: np.ndarray,
                 ev_hi: np.ndarray, reso: int,
                 min_w: int = 64, max_rows: int = 4096,
                 row_quantum: int = 8, min_rows: int = 256,
                 max_cells: int = 1 << 23, presorted: bool = False,
                 prebinned=None, e_quantum: int = 1):
    """Partition reads into window-count buckets and route each event to
    its read's bucket row. Events arrive sorted or unsorted; routing is
    pure vectorized numpy. A generator: the engine stages/dispatches each
    bucket while the next is still being built, so H2D transfer overlaps
    bucket preparation.

    Sparse buckets (< min_rows reads) merge into the next-larger W tier:
    each bucket costs a device round trip (latency-bound on tunneled
    links) and a compiled shape, so padding a few short reads further is
    cheaper than paying another dispatch.

    ``max_cells`` bounds B*W per bucket: ultralong-read tiers (large W,
    e.g. megabase ONT reads) take proportionally fewer rows per dispatch
    so device arrays stay ~``4*max_cells`` bytes regardless of read
    length distribution. (Round-2 measurement: quadrupling
    max_rows/max_cells to merge the 12 bench dispatches into ~6 did NOT
    improve end-to-end — the fetch wall is device execution + D2H
    bandwidth, not per-dispatch RPC count — so the caps stay at the
    memory-friendly defaults.)

    ``prebinned``: ``(bounds [n+1] int64, w0_all [m] int32,
    w1_all [m] int32)`` — events already read-grouped and window-binned
    (the native counting-sort path); skips the sort/searchsorted/binning
    entirely, and ``ev_read/ev_lo/ev_hi`` are ignored (pass None).

    ``e_quantum``: round every bucket's E up to a multiple of this (the
    Pallas pileup's event-block quantum, ``pileup_pallas.EB``) so the
    kernel wrapper never pads/concats on device; padded slots cost only
    their wire bytes (<1% at real event densities).
    """
    n = len(lens)
    nw = -(-lens.astype(np.int64) // reso)  # ceil; len 0 → 0 windows
    nw = np.maximum(nw, 0)

    w_bucket = np.maximum(min_w, 1 << np.ceil(
        np.log2(np.maximum(nw, 1))).astype(np.int64))
    # read → bucket key, merging sparse tiers upward
    keys = np.unique(w_bucket)
    for ki in range(len(keys) - 1):
        cnt = int((w_bucket == keys[ki]).sum())
        if 0 < cnt < min_rows:
            w_bucket[w_bucket == keys[ki]] = keys[ki + 1]
    keys = np.unique(w_bucket)

    if prebinned is not None:
        bounds, w0_all, w1_all = prebinned
        ev_counts = np.diff(bounds)
    else:
        # order events by read for slicing
        if presorted:  # caller already sorted read-major (e.g. compute_jax)
            ev_read_s, ev_lo_s, ev_hi_s = ev_read, ev_lo, ev_hi
        else:
            order = np.argsort(ev_read, kind="stable")
            ev_read_s = ev_read[order]
            ev_lo_s = ev_lo[order]
            ev_hi_s = ev_hi[order]
        bounds = np.searchsorted(ev_read_s, np.arange(n + 1))
        ev_counts = np.diff(bounds)

        # pre-bin events to window indices once, globally (vectorized)
        w0_all = ev_lo_s.astype(np.int32) // reso
        w1_all = np.where(ev_hi_s < 0, -1,
                          ev_hi_s.astype(np.int64) // reso).astype(np.int32)

    for key in keys:
        rids_all = np.nonzero(w_bucket == key)[0]
        rows_cap = max(row_quantum, min(max_rows, max_cells // int(key)))
        # one SHARED (B, E) shape for the FULL chunks of a tier: each
        # distinct jit shape costs a compile (seconds over tunneled
        # links), so same-size chunks pad to the worst of them. The tail
        # chunk (fewer rows) gets its own ladder shape instead — padding
        # a 5%-full tail to the tier shape costs real transfer bytes,
        # and the extra shape is small and cheap to compile.
        chunks = [rids_all[c0:c0 + rows_cap]
                  for c0 in range(0, len(rids_all), rows_cap)]
        full = [c for c in chunks if len(c) == rows_cap]
        B_shared = _next_size(
            max((len(c) for c in full), default=0), lo=row_quantum)
        E_shared = _next_size4(
            max((int(ev_counts[c].sum()) for c in full), default=1), lo=64)
        if e_quantum > 1:
            E_shared = -(-E_shared // e_quantum) * e_quantum
        for rids in chunks:
            n_used = len(rids)
            if n_used == rows_cap:
                B, E = B_shared, E_shared
            else:  # tail chunk: own ladder-quantized shape
                B = _next_size(n_used, lo=row_quantum)
                E = _next_size4(
                    max(int(ev_counts[rids].sum()), 1), lo=64)
                if e_quantum > 1:
                    E = -(-E // e_quantum) * e_quantum
            W = int(key)
            blens = np.zeros(B, dtype=np.int32)
            blens[:n_used] = lens[rids]

            cnt = ev_counts[rids]
            tot = int(cnt.sum())
            dt = np.int16 if (B < 32768 and W < 32768) else np.int32
            ev_row_b = np.full(E, B, dtype=dt)  # B = dropped sentinel
            ev_w0_b = np.zeros(E, dtype=dt)
            ev_w1_b = np.full(E, -1, dtype=dt)
            ev_off_b = np.full(B + 1, tot, dtype=np.int32)
            ev_off_b[0] = 0
            ev_off_b[1:n_used + 1] = np.cumsum(cnt)
            # gather each read's event slab (vectorized variable-slab copy)
            if tot:
                src = (np.repeat(bounds[rids], cnt) + np.arange(tot)
                       - np.repeat(ev_off_b[:n_used], cnt))
                ev_row_b[:tot] = np.repeat(
                    np.arange(n_used, dtype=dt), cnt)
                ev_w0_b[:tot] = w0_all[src]
                ev_w1_b[:tot] = w1_all[src]
            yield Bucket(
                read_ids=rids, B=B, W=W, E=E, lens=blens,
                ev_row=ev_row_b, ev_w0=ev_w0_b, ev_w1=ev_w1_b,
                ev_off=ev_off_b, n_used=n_used)
