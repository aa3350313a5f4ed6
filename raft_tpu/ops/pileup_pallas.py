"""Pallas TPU pileup kernel: coverage via one-hot matmuls on the MXU.

The XLA path (``engine_jax.pileup_diff_scatter``) lowers interval
increments to a scatter, which serializes on TPU for very large event
counts. This kernel reformulates coverage as a batched matmul — the MXU's
native operation:

    cov[b, w] = Σ_e  [row(e) == b] · [w0(e) <= w <= w1(e)]
              = Rᵀ · S      with R[e, b] one-hot rows, S[e, w] interval masks

Events arrive sorted by row (``bucketing.make_buckets`` lays them out that
way), so each read-tile of ``TB`` rows owns a contiguous event slab. The
grid is (read_tile, W-stripe, event-block); per-tile slab bounds arrive as
scalar-prefetch arrays and feed the event BlockSpec index_map, so the
Pallas pipeline streams exactly the blocks overlapping each tile's slab
(block-aligned — Mosaic requires 1024-element alignment for int32 HBM
slices, hence EB=1024 and the pad-to-multiple in the wrapper). The output
block accumulates across event blocks via revisiting.

FLOP cost: 2·E·TB·W per bucket — MXU work, independent of scatter-unit
contention. Equality with the scatter path is fuzz-tested (interpret mode
on CPU; compiled on TPU via bench/--pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 1024           # event block (int32 1-D tiling quantum)
_EBR = EB // 128    # event block rows when viewed as [rows, 128]
WB = 512            # W stripe


def _kernel(e_start_ref, e_count_ref,          # scalar prefetch [n_tiles]
            rows_ref, w0_ref, w1_ref,          # [EBR, 128] event blocks
            out_ref,                           # [TB, WB] int32 (revisited)
            TB: int, wb_size: int, n_blocks: int):
    t = pl.program_id(0)
    wb = pl.program_id(1)
    eb = pl.program_id(2)

    @pl.when(eb == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    start = e_start_ref[t]
    count = e_count_ref[t]
    # UNCLAMPED block index for the guard: past-the-slab grid steps must
    # not re-run on the clamped last block. When the guard passes,
    # blk*EB < start+count <= E2, so the index_map's clamp is a no-op.
    blk = start // EB + eb
    gbase = blk * EB

    @pl.when(gbase < start + count)
    def _work():
        # events live on LANES (128 per sublane row); both factors keep
        # events on lanes and contract over them (NT matmul) — no
        # cross-lane relayouts, which Mosaic does not support.
        acc = jnp.zeros((TB, wb_size), jnp.float32)
        bi = jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 0)
        wi = wb * wb_size + jax.lax.broadcasted_iota(
            jnp.int32, (wb_size, 128), 0)
        for i in range(_EBR):
            jbase = gbase + i * 128
            eidx = jbase + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            in_slab = (eidx >= start) & (eidx < start + count)
            local = rows_ref[i:i + 1, :] - t * TB          # (1, 128)
            onehot = ((local == bi) & in_slab).astype(jnp.float32)
            w0 = w0_ref[i:i + 1, :]
            w1 = w1_ref[i:i + 1, :]
            inr = ((wi >= w0) & (wi <= w1)).astype(jnp.float32)
            acc += jax.lax.dot_general(
                onehot, inr,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[:] += acc.astype(jnp.int32)


def pileup_pallas(ev_row, ev_w0, ev_w1, cfg, ev_off=None,
                  interpret: bool = False):
    """[E] window-binned events (sorted by row; padding rows == B) →
    [B, W] int32 coverage.

    ``ev_off``: the [B+1] exclusive per-row event offset table the host
    already ships for row reconstruction. When given, per-tile slab
    bounds are a strided SLICE of it (events are row-major, so
    ``searchsorted(ev_row, t*TB) == ev_off[t*TB]``) — the O(E log B)
    device searchsorted this wrapper used to run is gone (VERDICT r2
    item 3). Callers that pre-quantize E to the EB block quantum
    (``bucketing.iter_buckets(e_quantum=EB)``) also skip the pad/concat;
    the pad below is only the fallback for unquantized shapes (e.g.
    per-shard E under shard_map)."""
    B, W, E = cfg.B, cfg.W, cfg.E
    TB = min(128, B)
    wb_size = min(WB, W)
    n_tiles = B // TB
    if B % TB or W % wb_size or W % 128:
        raise ValueError(f"pallas pileup needs B%{TB}==0 and W%128==0 "
                         f"(got B={B} W={W}); use the scatter path")

    ev_row = ev_row.astype(jnp.int32)
    ev_w0 = ev_w0.astype(jnp.int32)
    ev_w1 = ev_w1.astype(jnp.int32)

    if ev_off is not None:
        tile_edges = ev_off.astype(jnp.int32)[::TB]   # [n_tiles+1] slice
    else:
        tile_edges = jnp.searchsorted(
            ev_row, jnp.arange(0, B + TB, TB, dtype=jnp.int32)
        ).astype(jnp.int32)
    e_start = tile_edges[:-1]
    e_count = tile_edges[1:] - tile_edges[:-1]

    # fallback pad to the block quantum (sentinel events never
    # contribute: every tile's slab ends at ev_off[B] <= E)
    E2 = -(-E // EB) * EB
    pad = E2 - E
    if pad:
        ev_row = jnp.concatenate([ev_row, jnp.full(pad, B, jnp.int32)])
        ev_w0 = jnp.concatenate([ev_w0, jnp.zeros(pad, jnp.int32)])
        ev_w1 = jnp.concatenate([ev_w1, jnp.full(pad, -1, jnp.int32)])
    rows2 = ev_row.reshape(E2 // 128, 128)
    w02 = ev_w0.reshape(E2 // 128, 128)
    w12 = ev_w1.reshape(E2 // 128, 128)

    n_blocks = E2 // EB

    def ev_index(t, wb, eb, es, ec):
        # blocks overlapping tile t's slab, clamped into range; the kernel
        # recomputes the same block id and masks by the exact slab bounds
        return (jnp.minimum(es[t] // EB + eb, n_blocks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, W // wb_size, n_blocks),
        in_specs=[
            pl.BlockSpec((_EBR, 128), ev_index),
            pl.BlockSpec((_EBR, 128), ev_index),
            pl.BlockSpec((_EBR, 128), ev_index),
        ],
        out_specs=pl.BlockSpec(
            (TB, wb_size), lambda t, wb, eb, *refs: (t, wb)),
    )
    kernel = functools.partial(_kernel, TB=TB, wb_size=wb_size,
                               n_blocks=n_blocks)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        interpret=interpret,
    )(e_start, e_count, rows2, w02, w12)
