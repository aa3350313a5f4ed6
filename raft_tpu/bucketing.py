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


@dataclasses.dataclass
class Bucket:
    """One dense batch of reads plus the events that cover them."""
    read_ids: np.ndarray   # int64 [n_used] original read ids (row order)
    B: int                 # padded batch rows
    W: int                 # padded window count
    E: int                 # padded event count
    lens: np.ndarray       # int32 [B] (0 beyond n_used)
    ev_row: np.ndarray     # int32 [E] row index in batch; B (=drop) when pad
    ev_lo: np.ndarray      # int32 [E]
    ev_hi: np.ndarray      # int32 [E] inclusive end
    n_used: int = 0


def make_buckets(lens: np.ndarray, ev_read: np.ndarray, ev_lo: np.ndarray,
                 ev_hi: np.ndarray, reso: int,
                 min_w: int = 64, max_rows: int = 4096,
                 row_quantum: int = 8) -> list[Bucket]:
    """Partition reads into window-count buckets and route each event to
    its read's bucket row. Events arrive sorted or unsorted; routing is
    pure vectorized numpy.
    """
    n = len(lens)
    nw = -(-lens.astype(np.int64) // reso)  # ceil; len 0 → 0 windows
    nw = np.maximum(nw, 0)

    w_bucket = np.maximum(min_w, 1 << np.ceil(
        np.log2(np.maximum(nw, 1))).astype(np.int64))
    # read → bucket key
    keys = np.unique(w_bucket)

    # order events by read for slicing
    order = np.argsort(ev_read, kind="stable")
    ev_read_s = ev_read[order]
    ev_lo_s = ev_lo[order]
    ev_hi_s = ev_hi[order]
    bounds = np.searchsorted(ev_read_s, np.arange(n + 1))
    ev_counts = np.diff(bounds)

    buckets: list[Bucket] = []
    for key in keys:
        rids_all = np.nonzero(w_bucket == key)[0]
        # chunk large buckets so B stays bounded
        for c0 in range(0, len(rids_all), max_rows):
            rids = rids_all[c0:c0 + max_rows]
            n_used = len(rids)
            B = _next_pow2(n_used, lo=row_quantum)
            W = int(key)
            blens = np.zeros(B, dtype=np.int32)
            blens[:n_used] = lens[rids]

            cnt = ev_counts[rids]
            tot = int(cnt.sum())
            E = _next_pow2(max(tot, 1), lo=64)
            ev_row_b = np.full(E, B, dtype=np.int32)  # B = dropped sentinel
            ev_lo_b = np.zeros(E, dtype=np.int32)
            ev_hi_b = np.full(E, -1, dtype=np.int32)
            # gather each read's event slab (vectorized variable-slab copy)
            if tot:
                out_off = np.concatenate([[0], np.cumsum(cnt)])
                src = (np.repeat(bounds[rids], cnt)
                       + np.arange(tot) - np.repeat(out_off[:-1], cnt))
                ev_row_b[:tot] = np.repeat(
                    np.arange(n_used, dtype=np.int32), cnt)
                ev_lo_b[:tot] = ev_lo_s[src]
                ev_hi_b[:tot] = ev_hi_s[src]
            buckets.append(Bucket(
                read_ids=rids, B=B, W=W, E=E, lens=blens,
                ev_row=ev_row_b, ev_lo=ev_lo_b, ev_hi=ev_hi_b,
                n_used=n_used))
    return buckets
