"""Raw-DMA ring rotation (parallel/ring_dma.py) == lax.ppermute, bitwise.

The remote-DMA primitive targets real TPU meshes; on the CPU test backend it
runs through the Pallas interpreter when that supports remote DMAs. If the
interpreter rejects the primitive, the tests SKIP with the recorded reason -
the on-chip validation lives in scripts/check_ring_dma.py (run on the TPU;
results in CLAUDE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rambl_tpu.parallel.mesh import DATA_AXIS, data_mesh
from rambl_tpu.parallel.ring_dma import ring_rotate

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


def _try_dma(mesh, x, impl="dma"):
    f = jax.jit(jax.shard_map(
        lambda v: ring_rotate((v,), DATA_AXIS, impl=impl, interpret=True)[0],
        mesh=mesh, in_specs=(P(DATA_AXIS, None),),
        out_specs=P(DATA_AXIS, None), check_vma=False))
    return np.asarray(f(x))


@pytest.mark.parametrize("impl", ["dma", "dma_barrier"])
def test_dma_rotation_matches_ppermute(impl):
    mesh = data_mesh(8)
    x = jnp.arange(8 * 16 * 4, dtype=jnp.int32).reshape(8 * 16, 4)
    g = jax.jit(jax.shard_map(
        lambda v: ring_rotate((v,), DATA_AXIS, impl="ppermute")[0],
        mesh=mesh, in_specs=(P(DATA_AXIS, None),),
        out_specs=P(DATA_AXIS, None), check_vma=False))
    want = np.asarray(g(x))
    # sanity: ppermute(i -> i+1) is a block roll by one shard
    np.testing.assert_array_equal(
        want, np.roll(np.asarray(x).reshape(8, 16, 4), 1, 0).reshape(-1, 4))
    try:
        got = _try_dma(mesh, x, impl)
    except Exception as e:  # noqa: BLE001 - interpreter capability probe
        pytest.skip(f"pallas interpreter lacks remote DMA on CPU: "
                    f"{type(e).__name__}: {str(e)[:120]}")
    np.testing.assert_array_equal(got, want)


def test_ring_probe_dma_impl_matches(small_ds, small_index, small_tax, cfg):
    """Full ring-sharded seeding with ring_impl='dma' == replicated lookup."""
    import dataclasses

    from rambl_tpu.ops.seed import SeedTable
    from rambl_tpu.parallel.mesh import put_replicated, put_sharded
    from rambl_tpu.parallel.ring import build_ring_shards
    from rambl_tpu.parallel.steps import make_align_pileup_step

    mesh = data_mesh(8)
    B = 128
    cfg_dma = dataclasses.replace(cfg, ring_impl="dma")
    step = make_align_pileup_step(
        mesh, cfg_dma, small_index.n_bits, small_tax.n_nodes,
        small_ds.ref_seqs.shape[1], ring=True)
    shards = build_ring_shards(small_index, 8)
    from rambl_tpu.index.colmap import build_col_maps

    cmap = build_col_maps(small_ds.ref_seqs, small_ds.ref_lens,
                          small_ds.ref_seqs[0, : small_ds.ref_lens[0]])
    args = ([put_sharded(shards[k], mesh) for k in ("bucket_start", "entries")]
            + [put_replicated(np.asarray(x), mesh) for x in
               (small_ds.ref_seqs, small_tax.ref_taxon, small_tax.anc_path,
                small_tax.depth, cmap)])
    try:
        out = step(put_sharded(small_ds.reads[:B], mesh),
                   put_sharded(small_ds.read_lens[:B], mesh), *args)
        score_dma = np.asarray(out[3])
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"pallas remote DMA unavailable on CPU backend: "
                    f"{type(e).__name__}: {str(e)[:120]}")

    # reference: replicated-table single-device alignment
    from rambl_tpu.pipeline.align import align_batch

    table = SeedTable.from_index(small_index)
    res = align_batch(jnp.asarray(small_ds.reads[:B]),
                      jnp.asarray(small_ds.read_lens[:B]), table,
                      jnp.asarray(small_ds.ref_seqs), cfg)
    np.testing.assert_array_equal(score_dma, np.asarray(res.score))


def test_barrier_protocol_model():
    """Model-check of the dma_barrier entry protocol (ring_dma._rot_kernel
    barrier block): each device signals its LEFT and RIGHT ring neighbors'
    barrier semaphores, then waits for its own semaphore to reach 2. Checked
    over many random schedules for several ring sizes:

    - deadlock-freedom: every fair schedule terminates (signals precede
      waits in program order, so all waits are eventually satisfiable);
    - the safety property the barrier exists for: when a device passes its
      wait (and may start writing into its right neighbor's buffers), BOTH
      neighbors have already entered the kernel instance - so no remote DMA
      can land in a buffer belonging to a peer's previous kernel.

    The CPU interpreter cannot execute the Mosaic barrier semaphore itself;
    this model mirrors the kernel's neighbor arithmetic exactly (left =
    (me+n-1)%n, right = (me+1)%n, wait count 2). Hardware certification:
    scripts/check_ring_dma.py."""
    rng = np.random.default_rng(0)
    for n in (2, 3, 4, 8):
        for _ in range(200):
            # per-device program counter: 0 = not entered, 1 = entered +
            # signaled both neighbors, 2 = passed wait (may issue DMAs)
            pc = [0] * n
            sem = [0] * n
            entered_at_pass = []
            steps = 0
            while any(p < 2 for p in pc) and steps < 10_000:
                d = int(rng.integers(0, n))
                if pc[d] == 0:
                    left = (d + n - 1) % n
                    right = (d + 1) % n
                    sem[left] += 1
                    sem[right] += 1
                    if n == 2:
                        # left == right: the kernel still signals twice
                        pass
                    pc[d] = 1
                elif pc[d] == 1 and sem[d] >= 2:
                    sem[d] -= 2
                    pc[d] = 2
                    # SAFETY: both neighbors must have entered already
                    assert pc[(d + 1) % n] >= 1 and pc[(d + n - 1) % n] >= 1
                steps += 1
            assert all(p == 2 for p in pc), f"deadlock at n={n}"
            assert all(s == 0 for s in sem)  # no stray signals left behind
