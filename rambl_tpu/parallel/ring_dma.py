"""Raw-DMA ring rotation: `pltpu.make_async_remote_copy` + DMA semaphores.

The ICI-native transport for the ring-sharded index rotation (SURVEY.md
section 2.3 "SP/CP" + section 5 "Distributed communication backend";
SNIPPETS.md 98-132 pattern). Semantically identical to
`lax.ppermute(x, axis, [(i, (i+1) % n)])` - device i's shard moves to device
i+1 - but issued as explicit chunked remote DMAs from a Pallas kernel:

- the shard stays in compiler-chosen memory (HBM for the multi-hundred-MB
  entry shards; `memory_space=ANY`) - no VMEM staging of the whole shard;
- the transfer is split into `chunks` slices whose DMAs are all in flight
  together (double-buffered: chunk c+1 streams while chunk c completes);
- completion is a per-chunk DMA-semaphore wait, not an XLA collective.

`ring_impl="dma"` in PipelineConfig selects this transport inside
parallel.ring._ring_probe; the default "ppermute" keeps the XLA collective.
Both are bitwise-identical rotations (tests/test_ring_dma.py).

The remote-DMA primitive requires a real TPU mesh; on the CPU test backend
the kernel runs in interpret mode when supported, and the tests skip with a
recorded reason otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rot_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis: str, chunks: int):
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    right = jax.lax.rem(me + 1, n)
    rows = x_ref.shape[0]
    # Mosaic DMA slices must respect the (8, 128) int32 tiling: the wrapper
    # ships a (rows, 128) view with rows % 8 == 0; chunk bounds stay
    # sublane-aligned
    h = max(8, (rows // chunks) // 8 * 8)
    dmas = []
    lo = 0
    for c in range(chunks):
        hi = rows if c == chunks - 1 else min(lo + h, rows)
        if lo >= hi:
            continue
        dma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[lo:hi],
            dst_ref=out_ref.at[lo:hi],
            send_sem=send_sem.at[c],
            recv_sem=recv_sem.at[c],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        dma.start()
        dmas.append(dma)
        lo = hi
    # drain: each wait covers this chunk's outgoing send AND the matching
    # incoming chunk from the left neighbor (SPMD symmetric program)
    for dma in dmas:
        dma.wait()


def ring_permute_dma(x: jax.Array, axis: str, *, chunks: int = 2,
                     collective_id: int = 0, interpret: bool = False):
    """Rotate `x` one hop around the `axis` ring (device i -> i+1) via raw
    remote DMAs. Call INSIDE shard_map; x is the per-device shard. Bitwise
    equal to lax.ppermute with the ring permutation.

    The shard is shipped as a lane-aligned (rows, 128) byte view (Mosaic DMA
    slices must respect the (8, 128) int32 tiling), padded to a whole tile;
    the pad bytes travel once and are dropped on the way out."""
    orig_shape, dtype = x.shape, x.dtype
    assert x.dtype.itemsize == 4, (
        "ring_permute_dma ships 32-bit words (the seed-table arrays are "
        "int32); bitcast narrower payloads on the caller side")
    flat = x.reshape(-1).view(jnp.int32) if dtype != jnp.int32 else x.reshape(-1)
    n = flat.shape[0]
    padded = -(-n // 1024) * 1024
    if padded != n:
        flat = jnp.concatenate([flat, jnp.zeros(padded - n, flat.dtype)])
    x2 = flat.reshape(-1, 128)
    kern = functools.partial(_rot_kernel, axis=axis, chunks=chunks)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((chunks,)),
            pltpu.SemaphoreType.DMA((chunks,)),
        ],
        # no collective_id: Mosaic only accepts one alongside a custom
        # barrier semaphore (get_barrier_semaphore); plain DMA-semaphore
        # waits order themselves (measured on-chip, scripts/check_ring_dma)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x2)
    out = out.reshape(-1)[:n]
    if dtype != jnp.int32:
        out = out.view(dtype)
    return out.reshape(orig_shape)


def ring_rotate(state, axis: str, impl: str = "ppermute",
                interpret: bool = False):
    """Rotate a tuple of per-device shards one hop (i -> i+1).

    impl="ppermute": one fused XLA collective (default).
    impl="dma": raw-DMA path, one Pallas collective per array (distinct
    collective ids keep the matching unambiguous)."""
    if impl == "dma":
        # Mosaic is TPU-only: on the CPU test backend route through the
        # Pallas interpreter (which models DMA semaphores) automatically
        interpret = interpret or jax.default_backend() == "cpu"
        return tuple(
            ring_permute_dma(x, axis, collective_id=i, interpret=interpret)
            for i, x in enumerate(state))
    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return tuple(jax.lax.ppermute(state, axis, perm))
