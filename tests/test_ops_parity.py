"""Jitted ops vs NumPy oracle: bit-for-bit parity (SURVEY.md section 4.2).

The oracle is the executable spec; every jnp op must reproduce it exactly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rambl_tpu.io.pack import revcomp_codes
from rambl_tpu.oracle.align import align_reads
from rambl_tpu.oracle.binning import bin_reads
from rambl_tpu.oracle.seed import gather_windows, seed_candidates
from rambl_tpu.oracle.sw import sw_batch, traceback_batch
from rambl_tpu.ops.seed import (
    SeedTable,
    gather_windows_jax,
    revcomp_jax,
    seed_candidates_jax,
)
from rambl_tpu.ops.sw import sw_align, sw_score, sw_traceback
from rambl_tpu.pipeline.align import align_batch
from rambl_tpu.pipeline.binning import bin_batch

N = 192  # reads used in parity checks


@pytest.fixture(scope="module")
def aligned_pair(small_ds, small_index, cfg):
    """(oracle result, jitted result) on the same reads."""
    res_np = align_reads(
        small_ds.reads[:N], small_ds.read_lens[:N], small_ds.ref_seqs,
        small_index, cfg,
    )
    table = SeedTable.from_index(small_index)
    f = jax.jit(
        functools.partial(
            align_batch, table=table,
            ref_seqs=jnp.asarray(small_ds.ref_seqs), cfg=cfg,
        )
    )
    res_jx = f(small_ds.reads[:N], small_ds.read_lens[:N])
    return res_np, res_jx


def test_revcomp_parity(small_ds):
    a = revcomp_codes(small_ds.reads[:N], small_ds.read_lens[:N])
    b = np.asarray(revcomp_jax(small_ds.reads[:N], small_ds.read_lens[:N]))
    np.testing.assert_array_equal(a, b)


def test_seed_candidates_parity(small_ds, small_index, cfg):
    c_np = seed_candidates(
        small_ds.reads[:N], small_ds.read_lens[:N], small_index, cfg
    )
    table = SeedTable.from_index(small_index)
    c_jx = seed_candidates_jax(
        jnp.asarray(small_ds.reads[:N]), jnp.asarray(small_ds.read_lens[:N]),
        table, cfg,
    )
    np.testing.assert_array_equal(c_np["cand_valid"], np.asarray(c_jx["cand_valid"]))
    v = c_np["cand_valid"]
    for k in ("cand_ref", "cand_wstart", "cand_votes"):
        np.testing.assert_array_equal(c_np[k][v], np.asarray(c_jx[k])[v])
    # windows
    W = cfg.window_len
    w_np = gather_windows(small_ds.ref_seqs, c_np["cand_ref"], c_np["cand_wstart"], W)
    w_jx = np.asarray(gather_windows_jax(
        jnp.asarray(small_ds.ref_seqs), c_jx["cand_ref"], c_jx["cand_wstart"], W
    ))
    np.testing.assert_array_equal(w_np[v], w_jx[v])


def test_sw_parity(small_ds, cfg):
    rng = np.random.default_rng(5)
    B, L, W = 64, 64, 96
    q = rng.integers(0, 5, (B, L)).astype(np.int8)
    w = rng.integers(0, 5, (B, W)).astype(np.int8)
    for b in range(0, B, 2):  # plant homology
        w[b, 8 : 8 + 40] = q[b, 4:44]
    s_np, ie_np, je_np, dirp = sw_batch(q, w, cfg.scoring, want_dirs=True)
    s_jx, ie_jx, je_jx, dirs = jax.jit(
        functools.partial(sw_align, sc=cfg.scoring)
    )(q, w)
    np.testing.assert_array_equal(s_np, np.asarray(s_jx))
    np.testing.assert_array_equal(ie_np, np.asarray(ie_jx))
    np.testing.assert_array_equal(je_np, np.asarray(je_jx))
    rc_np = traceback_batch(dirp, ie_np, je_np, L)
    rc_jx = np.asarray(sw_traceback(dirs, ie_jx, je_jx, L, W))
    np.testing.assert_array_equal(rc_np, rc_jx)
    # score-only pass agrees with itself
    s2, ie2, je2 = sw_score(q, w, cfg.scoring)
    np.testing.assert_array_equal(s_np, np.asarray(s2))


def test_align_batch_parity(aligned_pair):
    res_np, res_jx = aligned_pair
    for name in ("score", "ref", "strand", "ref_col", "query",
                 "pair_score", "pair_ref", "pair_valid"):
        np.testing.assert_array_equal(
            getattr(res_np, name), np.asarray(getattr(res_jx, name)),
            err_msg=name,
        )


def test_mapping_quality_parity(aligned_pair):
    from rambl_tpu.oracle.align import mapping_quality as mq_np
    from rambl_tpu.pipeline.align import mapping_quality as mq_jx

    res_np, res_jx = aligned_pair
    a = mq_np(res_np)
    b = np.asarray(jax.jit(mq_jx)(res_jx))
    np.testing.assert_array_equal(a, b)
    # semantics: margin is bounded by the best score, 0 for unaligned reads,
    # and 0 whenever an equally-scoring hit on a different ref exists
    assert np.all(a[res_np.ref < 0] == 0)
    assert np.all(a <= res_np.score)
    other_tie = (
        res_np.pair_valid
        & (res_np.pair_ref != res_np.ref[:, None])
        & (res_np.pair_score == res_np.score[:, None])
    ).any(axis=1)
    assert np.all(a[res_np.aligned & other_tie] == 0)
    # at least some uniquely-mapped reads should carry a positive margin
    assert np.any(a > 0)


def test_bin_parity(aligned_pair, small_tax, cfg):
    res_np, res_jx = aligned_pair
    b_np = bin_reads(res_np, small_tax, cfg)
    b_jx = np.asarray(bin_batch(
        res_jx, jnp.asarray(small_tax.ref_taxon),
        jnp.asarray(small_tax.anc_path), jnp.asarray(small_tax.depth), cfg,
    ))
    np.testing.assert_array_equal(b_np, b_jx)


def test_gather_windows_twolevel_parity(small_ds, small_index, cfg):
    """The scale-proof two-level window gather (config-3 index sizes) must be
    bit-identical to the strided table AND to the off-grid element gather on
    the same on-grid candidates."""
    from rambl_tpu.ops.seed import _gather_windows_twolevel

    table = SeedTable.from_index(small_index)
    c = seed_candidates_jax(
        jnp.asarray(small_ds.reads[:N]), jnp.asarray(small_ds.read_lens[:N]),
        table, cfg,
    )
    W = cfg.window_len
    refs = jnp.asarray(small_ds.ref_seqs)
    w_table = np.asarray(gather_windows_jax(
        refs, c["cand_ref"], c["cand_wstart"], W, cfg))
    w_two = np.asarray(_gather_windows_twolevel(
        refs, c["cand_ref"], c["cand_wstart"], W, cfg))
    w_elem = np.asarray(gather_windows_jax(
        refs, c["cand_ref"], c["cand_wstart"], W, None))
    np.testing.assert_array_equal(w_two, w_table)
    v = np.asarray(c["cand_valid"])
    np.testing.assert_array_equal(w_two[v], w_elem[v])


def test_probe_chunked_vs_legacy(small_ds, small_index, cfg):
    """The full-lane chunk-row probe (pack_entries (rows, 128) layout) must
    emit the same HIT MULTISET per (read, qpos) as the legacy (n, 4)
    per-entry gather; extra slots are BIGK, so select_candidates output is
    bitwise unchanged. Covers table-end buckets, over-cap buckets and a
    sharded bucket_lo."""
    from rambl_tpu.ops.seed import (
        BIGK,
        hash_kmer_jax,
        pack_entries,
        probe,
        probe_slots,
        query_kmers_jax,
        select_candidates,
    )

    reads = jnp.asarray(small_ds.reads[:N])
    lens = jnp.asarray(small_ds.read_lens[:N])
    keys, valid = query_kmers_jax(reads, lens, cfg)
    bucket = hash_kmer_jax(keys, small_index.n_bits)

    ent_rows = pack_entries(
        small_index.entry_key, small_index.entry_ref, small_index.entry_pos)
    assert ent_rows.shape[1] == 128
    n = small_index.entry_key.shape[0]
    ent_legacy = np.zeros((n, 4), np.int32)
    ent_legacy[:, 0] = small_index.entry_key
    ent_legacy[:, 1] = small_index.entry_ref
    ent_legacy[:, 2] = small_index.entry_pos
    bs = jnp.asarray(small_index.bucket_start)

    def multisets(ck):
        return np.sort(ck, axis=-1), (ck != int(BIGK)).sum(-1)

    ck_new = np.asarray(probe(keys, valid, bucket, bs,
                              jnp.asarray(ent_rows), cfg))
    ck_old = np.asarray(probe(keys, valid, bucket, bs,
                              jnp.asarray(ent_legacy), cfg))
    assert ck_new.shape[-1] == probe_slots(cfg, ent_rows.shape)
    assert ck_old.shape[-1] == cfg.bucket_cap
    a, na = multisets(ck_new)
    b, nb = multisets(ck_old)
    np.testing.assert_array_equal(na, nb)
    # sorted hits occupy the low slots in both
    np.testing.assert_array_equal(a[..., : cfg.bucket_cap], b)

    # sharded bucket_lo: local entry slice packed to chunk rows
    lo = small_index.n_buckets // 2
    base = int(small_index.bucket_start[lo])
    loc_rows = pack_entries(small_index.entry_key[base:],
                            small_index.entry_ref[base:],
                            small_index.entry_pos[base:])
    ck_sh = np.asarray(probe(keys, valid, bucket, bs[lo:],
                             jnp.asarray(loc_rows), cfg, bucket_lo=lo))
    ck_sh_l = np.asarray(probe(keys, valid, bucket, bs[lo:],
                               jnp.asarray(ent_legacy[base:]), cfg,
                               bucket_lo=lo))
    a, na = multisets(ck_sh)
    b, nb = multisets(ck_sh_l)
    np.testing.assert_array_equal(na, nb)
    np.testing.assert_array_equal(a[..., : cfg.bucket_cap], b)
    # shard misses exactly complement the full table's hits
    assert (na > 0).sum() > 0 or small_index.n_entries == 0

    # end-to-end: candidates from the chunk-row path == oracle
    c_jx = select_candidates(jnp.asarray(ck_new), cfg)
    c_np = seed_candidates(
        small_ds.reads[:N], small_ds.read_lens[:N], small_index, cfg)
    v = c_np["cand_valid"]
    np.testing.assert_array_equal(v, np.asarray(c_jx["cand_valid"]))
    for k in ("cand_ref", "cand_wstart", "cand_votes"):
        np.testing.assert_array_equal(c_np[k][v], np.asarray(c_jx[k])[v])
