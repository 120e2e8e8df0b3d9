"""On-chip validation of the raw-DMA ring transport (parallel/ring_dma.py).

With one local chip the ring degenerates to a self-loopback (right neighbor
= me), which still exercises the full Mosaic lowering: remote-DMA descriptors,
DMA semaphores, chunked issue/drain. Passing = the kernel compiles and the
rotation is the identity, bitwise.

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

    f = jax.jit(jax.shard_map(
        lambda e, b: ring_rotate((e, b), DATA_AXIS, impl="dma"),
        mesh=mesh, in_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)), check_vma=False))
    e2, b2 = f(ent, bs)
    want_e = np.roll(np.asarray(ent).reshape(n, 4096, 4), 1, 0).reshape(-1, 4)
    want_b = np.roll(np.asarray(bs).reshape(n, 128), 1, 0).reshape(-1)
    np.testing.assert_array_equal(np.asarray(e2), want_e)
    np.testing.assert_array_equal(np.asarray(b2), want_b)
    print(f"raw-DMA ring rotation on {n} device(s): compiled + bitwise OK")


if __name__ == "__main__":
    main()
