"""End-to-end assembly pipeline (oracle): the executable spec of
`rambl_tpu.pipeline.assemble` (SURVEY.md section 3.4).

Iterative reconstruction loop (SURVEY.md L7 / section 2.1):

  round 0: align reads vs the Greengenes-style reference index, bin via
           taxonomy LCA, DP-means per leaf bin, consensus per cluster;
  round t: realign all reads vs the current consensus panel (each gene its own
           leaf under the root), re-cluster, re-call consensus;
  stop when the panel's sequence set is unchanged or max_assembly_iters.

Cluster consensus uses variant-aware merging: at polymorphic columns the
cluster's own reads vote; elsewhere the whole bin's reads vote (strains share
the backbone, differ at SNPs) - this yields full-length variants immediately
rather than SNP-neighbourhood fragments.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.index.builder import build_seed_index
from rambl_tpu.index.taxonomy import TaxonomyTables, build_taxonomy_tables
from rambl_tpu.oracle.align import align_reads
from rambl_tpu.oracle.binning import bin_reads, leaf_membership
from rambl_tpu.oracle.cluster import (
    bin_pileup,
    dp_means,
    polymorphic_cols,
    read_features,
)
from rambl_tpu.oracle.consensus import call_consensus, cluster_pileup


@dataclasses.dataclass
class Gene:
    seq: np.ndarray       # int8 codes
    n_reads: int
    leaf: int             # bin node it came from (that round's taxonomy)
    cluster: int
    round_born: int
    taxon: int = 0        # ORIGINAL-taxonomy node this gene descends from

    def key(self) -> bytes:
        return self.seq.tobytes()


@dataclasses.dataclass
class AssemblyResult:
    genes: List[Gene]
    n_rounds: int
    converged: bool
    round_stats: List[dict]

    def full_length(self, cfg: PipelineConfig) -> List[Gene]:
        return [g for g in self.genes if g.seq.shape[0] >= cfg.full_len_min]


def panel_taxonomy(
    genes: List[Gene], orig_parent: np.ndarray, orig_depth: np.ndarray
) -> tuple[TaxonomyTables, np.ndarray]:
    """Taxonomy for a consensus panel: the ORIGINAL tree extended with one leaf
    per gene, attached at the gene's provenance node (Gene.taxon).

    Attaching panel leaves at their source taxon (instead of a flat root)
    keeps reads that are ambiguous between two variants of the same species
    binned at that species - without it they fall to the root and get shared
    into every bin, producing chimeric consensus (cross-species pollution).

    Returns (tables, orig_taxon_of_node): the latter maps every node of the
    extended tree back to its original-tree node (gene leaves -> their taxon).
    """
    n0 = orig_parent.shape[0]
    G = len(genes)
    parent = np.concatenate(
        [orig_parent, np.array([g.taxon for g in genes], np.int32)]
    ).astype(np.int32)
    depth = np.concatenate(
        [orig_depth, np.array([orig_depth[g.taxon] + 1 for g in genes], np.int32)]
    ).astype(np.int32)
    ref_taxon = np.arange(n0, n0 + G, dtype=np.int32)
    tables = build_taxonomy_tables(parent, depth, ref_taxon)
    orig_of = np.concatenate(
        [np.arange(n0, dtype=np.int32), np.array([g.taxon for g in genes], np.int32)]
    )
    return tables, orig_of


def pad_panel(genes: List[Gene], ref_len_max: int):
    seqs = np.full((len(genes), ref_len_max), 4, dtype=np.int8)
    lens = np.zeros((len(genes),), np.int32)
    for i, g in enumerate(genes):
        L = min(g.seq.shape[0], ref_len_max)
        seqs[i, :L] = g.seq[:L]
        lens[i] = L
    return seqs, lens


def assemble_round(
    reads: np.ndarray,
    read_lens: np.ndarray,
    ref_seqs: np.ndarray,
    ref_lens: np.ndarray,
    tables: TaxonomyTables,
    cfg: PipelineConfig,
    round_idx: int,
    orig_taxon_of_node: Optional[np.ndarray] = None,
) -> tuple[List[Gene], dict]:
    """One align -> bin -> cluster -> consensus round.

    orig_taxon_of_node maps current-tree nodes to original-taxonomy nodes for
    newborn gene provenance (identity when aligning vs the original reference).
    """
    index = build_seed_index(ref_seqs, ref_lens, k=cfg.k)
    res = align_reads(reads, read_lens, ref_seqs, index, cfg)
    bins = bin_reads(res, tables, cfg)

    leaves = np.unique(tables.ref_taxon)
    genes: List[Gene] = []
    stats = dict(
        round=round_idx,
        aligned=int(res.aligned.sum()),
        n_leaves=int(leaves.size),
        bins_used=0,
    )
    for leaf in leaves.tolist():
        members = leaf_membership(bins, leaf, tables) & res.aligned
        n_mem = int(members.sum())
        if n_mem < cfg.min_cluster_reads:
            continue
        stats["bins_used"] += 1
        # pileups use ALL members; clustering uses the first max_bin_reads
        # members by read index (the device path's static member-table cap)
        q_full = res.query[members]
        rc_full = res.ref_col[members]
        midx = np.nonzero(members)[0][: cfg.max_bin_reads]
        q = res.query[midx]
        rc = res.ref_col[midx]
        counts_bin = bin_pileup(q_full, rc_full, ref_seqs.shape[1])
        poly = polymorphic_cols(counts_bin, cfg)
        feat = read_features(q, rc, poly)
        assign, centers, K = dp_means(feat, cfg)

        counts_all, span_all = cluster_pileup(q_full, rc_full, ref_seqs.shape[1])
        poly_mask = np.zeros((ref_seqs.shape[1],), bool)
        poly_mask[poly] = True
        for k in range(K):
            mem_k = assign == k
            nk = int(mem_k.sum())
            if nk < cfg.min_cluster_reads:
                continue
            counts_k, span_k = cluster_pileup(q[mem_k], rc[mem_k], ref_seqs.shape[1])
            # trust cluster votes only with real depth AND a unique winner
            # (single stray reads / 1-vs-1 ties would otherwise flip
            # polymorphic columns arbitrarily)
            srt = np.sort(counts_k, axis=1)
            use_k = (
                poly_mask
                & (counts_k.sum(axis=1) >= cfg.min_coverage)
                & (srt[:, -1] > srt[:, -2])
            )
            counts_eff = np.where(use_k[:, None], counts_k, counts_all)
            # deletion evidence must come from the same population that voted
            # the bases, else thin cluster counts vs bin-wide span coverage
            # falsely flags every polymorphic column as deleted
            span_eff = np.where(use_k, span_k, span_all)
            seq = call_consensus(counts_eff, span_eff)
            if seq.shape[0] == 0:
                continue
            taxon = int(leaf) if orig_taxon_of_node is None else int(orig_taxon_of_node[leaf])
            genes.append(Gene(seq=seq, n_reads=nk, leaf=int(leaf),
                              cluster=k, round_born=round_idx, taxon=taxon))
    # dedupe identical sequences: keep the one with most reads
    # (ties -> earliest in (leaf asc, cluster asc) order, which is list order)
    bykey: dict[bytes, Gene] = {}
    for g in genes:
        kk = g.key()
        if kk not in bykey or g.n_reads > bykey[kk].n_reads:
            if kk in bykey:
                g = dataclasses.replace(g, n_reads=max(g.n_reads, bykey[kk].n_reads))
            bykey[kk] = g
    genes = list(bykey.values())
    # cap panel: (n_reads desc, leaf asc, cluster asc)
    genes.sort(key=lambda g: (-g.n_reads, g.leaf, g.cluster))
    genes = genes[: cfg.max_genes]
    stats["genes"] = len(genes)
    return genes, stats


def refine_round(
    reads: np.ndarray,
    read_lens: np.ndarray,
    genes: List[Gene],
    orig_parent: np.ndarray,
    orig_depth: np.ndarray,
    cfg: PipelineConfig,
    ref_len_max: int,
    round_idx: int,
) -> tuple[List[Gene], dict]:
    """One EM-style refinement round: realign reads to the panel, re-call each
    gene's consensus from its member reads, prune unsupported duplicates.

    No re-clustering here: variant discovery happens in round 0 (DP-means);
    refinement sharpens each variant. The consensus stays variant-aware:
    polymorphic columns are computed over the whole provenance group's pileup
    (columns that distinguish sibling variants), and at those columns only the
    gene's EXCLUSIVE reads vote - otherwise LCA-shared reads (which cannot
    distinguish siblings) would swamp the minority variant's signal and all
    siblings would collapse to the majority sequence. Everywhere else, all
    members (exclusive + shared) supply the conserved backbone.

    Prune rule (deterministic): within each provenance taxon group, order genes
    by (exclusive-support desc, members desc, leaf asc); keep the first, keep
    the rest only with exclusive support >= cfg.dp_spawn_min_orphans. All kept
    genes need >= cfg.min_cluster_reads members.
    """
    pseqs, plens = pad_panel(genes, ref_len_max)
    ptab, orig_of = panel_taxonomy(genes, orig_parent, orig_depth)
    index = build_seed_index(pseqs, plens, k=cfg.k)
    res = align_reads(reads, read_lens, pseqs, index, cfg)
    bins = bin_reads(res, ptab, cfg)

    stats = dict(round=round_idx, aligned=int(res.aligned.sum()),
                 n_leaves=len(genes), bins_used=0)

    # group-level polymorphic columns (per provenance taxon)
    taxa = sorted({g.taxon for g in genes})
    group_poly: dict[int, np.ndarray] = {}
    leaves_of_tax = {
        t: [ptab.ref_taxon[gi] for gi, g in enumerate(genes) if g.taxon == t]
        for t in taxa
    }
    for t in taxa:
        gm = np.zeros((reads.shape[0],), bool)
        for leaf in leaves_of_tax[t]:
            gm |= leaf_membership(bins, int(leaf), ptab)
        gm &= res.aligned
        counts_t = bin_pileup(res.query[gm], res.ref_col[gm], ref_len_max)
        pm = np.zeros((ref_len_max,), bool)
        pm[polymorphic_cols(counts_t, cfg)] = True
        group_poly[t] = pm

    refined: List[Gene] = []
    for gi, leaf in enumerate(ptab.ref_taxon.tolist()):
        members = leaf_membership(bins, leaf, ptab) & res.aligned
        excl = (bins == leaf) & res.aligned
        n_mem = int(members.sum())
        n_excl = int(excl.sum())
        if n_mem < cfg.min_cluster_reads:
            continue
        stats["bins_used"] += 1
        counts_all, span_all = cluster_pileup(
            res.query[members], res.ref_col[members], ref_len_max
        )
        counts_ex, span_ex = cluster_pileup(
            res.query[excl], res.ref_col[excl], ref_len_max
        )
        pm = group_poly[genes[gi].taxon]
        srt = np.sort(counts_ex, axis=1)
        use_ex = (
            pm
            & (counts_ex.sum(axis=1) >= cfg.min_coverage)
            & (srt[:, -1] > srt[:, -2])
        )
        counts_eff = np.where(use_ex[:, None], counts_ex, counts_all)
        # same-population deletion evidence (see assemble_round comment)
        span_eff = np.where(use_ex, span_ex, span_all)
        seq = call_consensus(counts_eff, span_eff)
        if seq.shape[0] == 0:
            continue
        refined.append(Gene(seq=seq, n_reads=n_mem, leaf=int(leaf),
                            cluster=n_excl,  # reuse field: exclusive support
                            round_born=round_idx, taxon=genes[gi].taxon))
    # prune within provenance groups
    bytax: dict[int, List[Gene]] = {}
    for g in refined:
        bytax.setdefault(g.taxon, []).append(g)
    kept: List[Gene] = []
    for tax in sorted(bytax):
        grp = sorted(bytax[tax], key=lambda g: (-g.cluster, -g.n_reads, g.leaf))
        kept.append(grp[0])
        kept.extend(g for g in grp[1:] if g.cluster >= cfg.refine_min_excl)
    # dedupe exact sequences (keep max members; ties -> group order)
    bykey: dict[bytes, Gene] = {}
    for g in kept:
        kk = g.key()
        if kk not in bykey or g.n_reads > bykey[kk].n_reads:
            bykey[kk] = g
    out = list(bykey.values())
    out.sort(key=lambda g: (-g.n_reads, g.taxon, g.leaf))
    out = out[: cfg.max_genes]
    stats["genes"] = len(out)
    return out, stats


def assemble(
    reads: np.ndarray,
    read_lens: np.ndarray,
    ref_seqs: np.ndarray,
    ref_lens: np.ndarray,
    tables: TaxonomyTables,
    cfg: PipelineConfig,
) -> AssemblyResult:
    # parent array of the original tree (for panel_taxonomy extension)
    orig_depth = tables.depth
    orig_parent = np.array(
        [int(tables.anc_path[n, max(int(orig_depth[n]) - 1, 0)]) for n in range(tables.n_nodes)],
        dtype=np.int32,
    )
    round_stats: List[dict] = []
    genes, stats = assemble_round(
        reads, read_lens, ref_seqs, ref_lens, tables, cfg, round_idx=0
    )
    round_stats.append(stats)
    seen = {tuple(sorted(g.key() for g in genes))}
    converged = False
    for it in range(1, cfg.max_assembly_iters):
        if not genes:
            break
        genes, stats = refine_round(
            reads, read_lens, genes, orig_parent, orig_depth, cfg,
            ref_len_max=ref_seqs.shape[1], round_idx=it,
        )
        round_stats.append(stats)
        new_key = tuple(sorted(g.key() for g in genes))
        # fixpoint OR cycle: refinement is deterministic, so revisiting any
        # previous panel means the loop will repeat forever - stop
        if new_key in seen:
            converged = True
            break
        seen.add(new_key)
    return AssemblyResult(
        genes=genes,
        n_rounds=len(round_stats),
        converged=converged,
        round_stats=round_stats,
    )
