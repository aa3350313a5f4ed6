"""Pallas TPU pileup kernel: coverage via one-hot matmuls on the MXU.

The XLA path (``engine_jax.pileup_diff_scatter``) lowers interval
increments to a scatter, which serializes on TPU for very large event
counts. This kernel reformulates coverage as a batched matmul — the MXU's
native operation:

    cov[b, w] = Σ_e  [row(e) == b] · [w0(e) <= w <= w1(e)]
              = Rᵀ · S      with R[e, b] one-hot rows, S[e, w] interval masks

Events arrive sorted by row (``bucketing.make_buckets`` lays them out that
way), so each read-tile of ``TB`` rows owns a contiguous event slab.
The grid is (read_tile, event_block); per-tile slab bounds arrive as
scalar-prefetch arrays, event chunks are DMA'd from HBM, and the output
block is revisited across event blocks for accumulation.

FLOP cost: 2·E·TB·W per bucket — at TB=128 this is ~1.3 ms per 250 Gflop
on a v5e core, independent of how contended the scatter unit is.
Equality with the scatter path (and the scalar oracle) is fuzz-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(e_start_ref, e_count_ref,          # scalar prefetch [n_tiles]
            row_hbm, w0_hbm, w1_hbm,           # HBM event arrays [E]
            out_ref,                           # [TB, W] int32 (revisited)
            TB: int, EB: int, W: int):
    t = pl.program_id(0)
    eb = pl.program_id(1)

    @pl.when(eb == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    start = e_start_ref[t]
    count = e_count_ref[t]

    @pl.when(eb * EB < count)
    def _work():
        def body(rows, w0s, w1s, sem):
            base = start + eb * EB
            for src, dst, slot in ((row_hbm, rows, 0), (w0_hbm, w0s, 1),
                                   (w1_hbm, w1s, 2)):
                cp = pltpu.make_async_copy(
                    src.at[pl.ds(base, EB)], dst, sem.at[slot])
                cp.start()
            for slot, src, dst in ((0, row_hbm, rows), (1, w0_hbm, w0s),
                                   (2, w1_hbm, w1s)):
                pltpu.make_async_copy(
                    src.at[pl.ds(base, EB)], dst, sem.at[slot]).wait()

            # mask events beyond this tile's slab
            eidx = jax.lax.broadcasted_iota(jnp.int32, (EB, 1), 0)
            in_slab = (eb * EB + eidx) < count

            local = rows[:].reshape(EB, 1) - t * TB
            w0 = w0s[:].reshape(EB, 1)
            w1 = w1s[:].reshape(EB, 1)

            bi = jax.lax.broadcasted_iota(jnp.int32, (EB, TB), 1)
            onehot = ((local == bi) & in_slab).astype(jnp.float32)

            wi = jax.lax.broadcasted_iota(jnp.int32, (EB, W), 1)
            inrange = ((wi >= w0) & (wi <= w1)).astype(jnp.float32)

            contrib = jax.lax.dot_general(
                onehot, inrange,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:] += contrib.astype(jnp.int32)

        pl.run_scoped(
            body,
            rows=pltpu.VMEM((EB,), jnp.int32),
            w0s=pltpu.VMEM((EB,), jnp.int32),
            w1s=pltpu.VMEM((EB,), jnp.int32),
            sem=pltpu.SemaphoreType.DMA((3,)),
        )


def pileup_pallas(ev_row, ev_w0, ev_w1, cfg, interpret: bool = False):
    """[E] window-binned events (sorted by row; padding rows == B) →
    [B, W] int32 coverage."""
    B, W, E = cfg.B, cfg.W, cfg.E
    ev_row = ev_row.astype(jnp.int32)
    ev_w0 = ev_w0.astype(jnp.int32)
    ev_w1 = ev_w1.astype(jnp.int32)
    TB = min(128, B)
    EB = min(512, E)
    n_tiles = B // TB
    if B % TB or W % 128:
        raise ValueError(f"pallas pileup needs B%{TB}==0 and W%128==0 "
                         f"(got B={B} W={W}); use the scatter path")

    tile_edges = jnp.searchsorted(
        ev_row, jnp.arange(0, B + TB, TB, dtype=jnp.int32)).astype(jnp.int32)
    e_start = tile_edges[:-1]
    e_count = tile_edges[1:] - tile_edges[:-1]

    # slack so a chunk DMA starting anywhere in [0, E) stays in bounds
    ev_row = jnp.concatenate([ev_row, jnp.full(EB, B, jnp.int32)])
    ev_w0 = jnp.concatenate([ev_w0, jnp.zeros(EB, jnp.int32)])
    ev_w1 = jnp.concatenate([ev_w1, jnp.full(EB, -1, jnp.int32)])

    # ceil over the worst tile, static bound: all events could be one tile's
    n_eblocks = pl.cdiv(E, EB)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_eblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TB, W), lambda t, eb, *refs: (t, 0),
            memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel, TB=TB, EB=EB, W=W)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        interpret=interpret,
    )(e_start, e_count, ev_row, ev_w0, ev_w1)
