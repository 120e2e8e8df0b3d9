"""Leaf-sharded (EP-analogue) cluster step == single-device, bitwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rambl_tpu.ops.seed import SeedTable
from rambl_tpu.parallel.mesh import data_mesh, put_replicated, put_sharded
from rambl_tpu.parallel.steps import make_cluster_step
from rambl_tpu.pipeline.align import align_batch
from rambl_tpu.pipeline.assemble import cluster_round0_core
from rambl_tpu.pipeline.binning import bin_batch
from rambl_tpu.pipeline.pileup import node_pileup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


def test_leaf_sharded_cluster_matches(small_ds, small_index, small_tax, cfg):
    B = 256
    table = SeedTable.from_index(small_index)
    res = align_batch(
        jnp.asarray(small_ds.reads[:B]), jnp.asarray(small_ds.read_lens[:B]),
        table, jnp.asarray(small_ds.ref_seqs), cfg,
    )
    bins = bin_batch(
        res, jnp.asarray(small_tax.ref_taxon), jnp.asarray(small_tax.anc_path),
        jnp.asarray(small_tax.depth), cfg,
    )
    counts, span = node_pileup(
        res.query, res.ref_col, bins, small_tax.n_nodes,
        small_ds.ref_seqs.shape[1],
    )
    read_count = jnp.zeros((small_tax.n_nodes + 1,), jnp.int32).at[
        jnp.where(bins >= 0, bins, small_tax.n_nodes)
    ].add(1)[:-1]

    leaves = np.unique(small_tax.ref_taxon)
    # pad to a multiple of 8 with leaf 0 (ignored below)
    NL = leaves.size
    pad = (-NL) % 8
    leaves_p = np.concatenate([leaves, np.zeros(pad, leaves.dtype)])

    anc = jnp.asarray(small_tax.anc_path)
    dep = jnp.asarray(small_tax.depth)

    cons1, kact1, nmem1, mh1 = cluster_round0_core(
        res.query, res.ref_col, bins, counts, span, read_count,
        jnp.asarray(leaves_p), anc, dep, cfg,
    )

    mesh = data_mesh(8)
    step = make_cluster_step(mesh, cfg)
    # the step consumes the STREAMED retention layout: (nb, bs, L) sharded
    # over the batch-row axis (parallel.steps.RETAIN3) + replicated bins
    from jax.sharding import NamedSharding

    from rambl_tpu.parallel.steps import RETAIN3

    nb, bs = 2, B // 2
    q_sh = jax.device_put(
        jnp.asarray(res.query).reshape(nb, bs, -1), NamedSharding(mesh, RETAIN3))
    rc_sh = jax.device_put(
        jnp.asarray(res.ref_col).astype(jnp.int16).reshape(nb, bs, -1),
        NamedSharding(mesh, RETAIN3))
    args_r = [put_replicated(np.asarray(x), mesh) for x in
              (bins, counts, span, read_count)]
    cons2, kact2, nmem2, mh2 = step(
        q_sh, rc_sh, *args_r, put_replicated(leaves_p, mesh),
        put_replicated(np.asarray(anc), mesh),
        put_replicated(np.asarray(dep), mesh),
    )

    np.testing.assert_array_equal(np.asarray(kact1)[:NL], np.asarray(kact2)[:NL])
    np.testing.assert_array_equal(np.asarray(nmem1)[:NL], np.asarray(nmem2)[:NL])
    np.testing.assert_array_equal(
        np.asarray(cons1.called)[:NL], np.asarray(cons2.called)[:NL])
    np.testing.assert_array_equal(
        np.asarray(cons1.emit)[:NL], np.asarray(cons2.emit)[:NL])
    np.testing.assert_array_equal(
        np.asarray(cons1.n_reads)[:NL], np.asarray(cons2.n_reads)[:NL])
    for a, b in zip(mh1, mh2):
        np.testing.assert_array_equal(np.asarray(a)[:NL], np.asarray(b)[:NL])
