"""rambl_tpu command line (SURVEY.md L1 replacement).

Subcommands:
  simulate  - generate a mock community (FASTA refs + FASTQ reads + truth)
  assemble  - run the full TPU assembly pipeline on reads vs a reference DB
  bench     - alignment/SW microbenchmarks on the local chip

`assemble` consumes a reference FASTA with a Greengenes-style taxonomy TSV
(name<TAB>k__...;p__...;...) or falls back to one leaf per reference.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from rambl_tpu.config import PRESETS, PipelineConfig
from rambl_tpu.io.fasta import read_fasta, read_fastq, write_fasta, write_fastq
from rambl_tpu.io.pack import decode_seq, encode_batch
from rambl_tpu.index.taxonomy import TaxonomyTables, build_taxonomy_tables


def _load_taxonomy(path: Optional[str], ref_names: List[str]):
    """Greengenes-style taxonomy TSV -> tree tensors; None -> flat leaves."""
    if path is None:
        n = len(ref_names)
        parent = np.zeros((n + 1,), np.int32)
        depth = np.concatenate([[0], np.ones(n)]).astype(np.int32)
        ref_taxon = np.arange(1, n + 1, dtype=np.int32)
        return build_taxonomy_tables(parent, depth, ref_taxon)
    lineages: Dict[str, List[str]] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            name, lin = line.rstrip("\n").split("\t", 1)
            lineages[name] = [x.strip() for x in lin.split(";") if x.strip()]
    parent = [0]
    depth = [0]
    node_of: Dict[tuple, int] = {(): 0}

    def node(pathq: tuple) -> int:
        if pathq in node_of:
            return node_of[pathq]
        p = node(pathq[:-1])
        nid = len(parent)
        parent.append(p)
        depth.append(len(pathq))
        node_of[pathq] = nid
        return nid

    ref_taxon = []
    for name in ref_names:
        lin = lineages.get(name, [])
        # each reference is its own leaf below its lineage
        ref_taxon.append(node(tuple(lin) + (f"__ref__{name}",)))
    return build_taxonomy_tables(
        np.asarray(parent, np.int32), np.asarray(depth, np.int32),
        np.asarray(ref_taxon, np.int32),
    )


def cmd_simulate(args) -> int:
    from rambl_tpu.data.simulate import simulate_dataset

    ds = simulate_dataset(
        n_species=args.species, refs_per_species=args.strains,
        n_reads=args.reads, seed=args.seed,
    )
    os.makedirs(args.out, exist_ok=True)
    write_fasta(os.path.join(args.out, "refs.fasta"), ds.ref_fasta())
    write_fastq(
        os.path.join(args.out, "reads.fastq"),
        [(n, decode_seq(ds.reads[i, : ds.read_lens[i]]), ds.read_quals[i])
         for i, n in enumerate(ds.read_names)],
    )
    with open(os.path.join(args.out, "taxonomy.tsv"), "w") as f:
        for i, n in enumerate(ds.ref_names):
            # full ancestor path names
            node = int(ds.ref_taxon[i])
            chain = []
            while node != 0:
                chain.append(ds.tax_name[node])
                node = int(ds.tax_parent[node])
            f.write(n + "\t" + ";".join(reversed(chain)) + "\n")
    with open(os.path.join(args.out, "truth.json"), "w") as f:
        json.dump({
            "true_ref": ds.true_ref.tolist(),
            "true_pos": ds.true_pos.tolist(),
            "true_strand": ds.true_strand.tolist(),
        }, f)
    print(f"wrote {ds.n_refs} refs / {ds.n_reads} reads to {args.out}")
    return 0


def cmd_assemble(args) -> int:
    from rambl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from rambl_tpu.utils.metrics import MetricsLogger

    cfg = PRESETS[args.preset] if args.preset else PipelineConfig()
    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_json(f.read())

    from rambl_tpu.io.loader import load_fasta_codes, load_fastq_codes, native_available

    refs = read_fasta(args.reference)  # names needed for taxonomy mapping
    ref_names = [n for n, _ in refs]
    ref_seqs, ref_lens = encode_batch([s for _, s in refs], cfg.ref_len_max)
    samples = [load_fastq_codes(p, cfg.read_len_max) for p in args.reads]
    tables = _load_taxonomy(args.taxonomy, ref_names)

    metrics = MetricsLogger(args.metrics)
    metrics.log("load", refs=len(refs), samples=len(samples),
                reads=sum(int(r.shape[0]) for r, _ in samples),
                native_loader=native_available(),
                preset=args.preset or "default")

    initial_panel = None
    if args.resume_from:
        from rambl_tpu.utils.checkpoint import config_fingerprint

        header, initial_panel = load_checkpoint(args.resume_from)
        if header["fingerprint"] != config_fingerprint(cfg):
            print("warning: checkpoint config fingerprint differs from the "
                  "active config; resuming anyway", file=sys.stderr)
        metrics.log("resume", round=header["round"], genes=len(initial_panel))

    mesh = None
    if args.mesh:
        from rambl_tpu.parallel.mesh import data_mesh, init_distributed

        init_distributed()
        mesh = data_mesh(args.mesh if args.mesh > 0 else None)
        metrics.log("mesh", devices=int(mesh.devices.size))

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    if args.oracle:
        from rambl_tpu.oracle.pipeline import assemble

        results = [assemble(r, l, ref_seqs, ref_lens, tables, cfg,
                            initial_panel=initial_panel)
                   for r, l in samples]
    elif len(samples) > 1:
        from rambl_tpu.pipeline.assemble import assemble_cohort

        results = assemble_cohort(samples, ref_seqs, ref_lens, tables, cfg,
                                  mesh=mesh)
    else:
        from rambl_tpu.pipeline.assemble import assemble_jax

        # per-round checkpoints: a crash/kill anywhere leaves the last round
        # boundary resumable (--resume-from); the final save below overwrites
        results = [assemble_jax(samples[0][0], samples[0][1], ref_seqs,
                                ref_lens, tables, cfg,
                                initial_panel=initial_panel, mesh=mesh,
                                checkpoint_path=args.checkpoint)]
    if args.profile:
        import jax

        jax.profiler.stop_trace()

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    for si, result in enumerate(results):
        for s in result.round_stats:
            metrics.log("round", sample=si, **s)
        genes = result.genes
        full = result.full_length(cfg)
        metrics.log("done", sample=si, genes=len(genes),
                    full_length=len(full), rounds=result.n_rounds,
                    converged=result.converged)
        out = args.out if len(results) == 1 else (
            args.out + f".sample{si}.fasta")
        write_fasta(out, [
            (f"gene{i}|reads={g.n_reads}|taxon={g.taxon}|len={g.seq.shape[0]}",
             decode_seq(g.seq))
            for i, g in enumerate(genes)
        ])
        if args.checkpoint:
            ck = args.checkpoint if len(results) == 1 else (
                args.checkpoint + f".sample{si}")
            # checkpoint the PRE-polish loop panel: resume continues the loop,
            # and the loop must never see polished genes (bitwise continuation)
            save_checkpoint(ck, cfg, result.panel, result.n_rounds,
                            result.round_stats)
        print(f"sample {si}: {len(genes)} genes ({len(full)} full-length) -> {out}")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    from rambl_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(prog="rambl_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("simulate", help="generate a mock community")
    s.add_argument("--out", required=True)
    s.add_argument("--species", type=int, default=20)
    s.add_argument("--strains", type=int, default=5)
    s.add_argument("--reads", type=int, default=10_000)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_simulate)

    a = sub.add_parser("assemble", help="assemble full-length 16S genes")
    a.add_argument("--reads", required=True, nargs="+",
                   help="FASTQ[.gz]; several = cohort with shared index")
    a.add_argument("--reference", required=True, help="reference FASTA[.gz]")
    a.add_argument("--taxonomy", help="taxonomy TSV (name<TAB>lineage;...)")
    a.add_argument("--out", required=True, help="output FASTA")
    a.add_argument("--preset", choices=sorted(PRESETS))
    a.add_argument("--config", help="PipelineConfig JSON file")
    a.add_argument("--oracle", action="store_true",
                   help="run the NumPy oracle instead of the TPU path")
    a.add_argument("--metrics", help="JSONL metrics output path")
    a.add_argument("--checkpoint", help="write final panel checkpoint here")
    a.add_argument("--resume-from", help="panel checkpoint to resume from: "
                   "skips discovery, continues assembly rounds on its panel")
    a.add_argument("--profile", help="dump a jax.profiler trace to this dir")
    a.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="run every stage under shard_map on an N-device "
                   "'data' mesh (-1 = all visible devices); bitwise equal "
                   "to the single-device path")
    a.set_defaults(fn=cmd_assemble)

    b = sub.add_parser("bench", help="run microbenchmarks")
    b.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
