#!/usr/bin/env python
"""Benchmark: driver config 1 (toy mock community) on the local TPU chip.

Prints ONE JSON line:
  {"metric": "reads_aligned_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md:
"published": {}), so the baseline is a documented estimate of the reference
pipeline's alignment stage: BWA-MEM sustains roughly 1.25k 100bp reads/s per
CPU thread => ~20k reads/s for a 16-thread single node, the hardware class the
reference targets. vs_baseline = value / 20_000.

Secondary metrics (SW GCUPS, batch latency) go to stderr.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import toy_dataset
from rambl_tpu.index.builder import build_seed_index
from rambl_tpu.ops.seed import SeedTable
from rambl_tpu.ops.sw import sw_score
from rambl_tpu.pipeline.align import align_batch

BWA_NODE_READS_PER_S = 20_000.0  # documented estimate, see module docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    cfg = PipelineConfig(batch_size=1024)
    ds = toy_dataset(n_reads=10_000)
    index = build_seed_index(ds.ref_seqs, ds.ref_lens, k=cfg.k)
    table = SeedTable.from_index(index)
    refs = jnp.asarray(ds.ref_seqs)

    f = jax.jit(functools.partial(align_batch, table=table, ref_seqs=refs, cfg=cfg))
    B = cfg.batch_size
    r = jnp.asarray(ds.reads[:B])
    l = jnp.asarray(ds.read_lens[:B])

    t0 = time.time()
    out = f(r, l)
    jax.block_until_ready(out)
    log(f"align compile+first: {time.time() - t0:.1f}s")

    # steady-state align throughput over the toy read set
    n_iter = 10
    t0 = time.time()
    for i in range(n_iter):
        s = (i * B) % (ds.n_reads - B)
        out = f(jnp.asarray(ds.reads[s : s + B]), jnp.asarray(ds.read_lens[s : s + B]))
    jax.block_until_ready(out)
    per = (time.time() - t0) / n_iter
    reads_per_s = B / per
    log(f"align: {per * 1000:.1f} ms/batch({B}) = {reads_per_s:.0f} reads/s/chip")

    # SW inner-loop GCUPS (score pass alone, the BWA-MEM DP replacement)
    pairs = 8192
    L, W = cfg.read_len_max, cfg.window_len
    q = jnp.asarray(ds.reads[:pairs % ds.n_reads].repeat(pairs // ds.n_reads + 1, 0)[:pairs])
    import numpy as np

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(0, 4, (pairs, W)).astype("int8"))
    g = jax.jit(functools.partial(sw_score, sc=cfg.scoring))
    jax.block_until_ready(g(q, w))
    t0 = time.time()
    for _ in range(5):
        outg = g(q, w)
    jax.block_until_ready(outg)
    sw_per = (time.time() - t0) / 5
    gcups = pairs * L * W / sw_per / 1e9
    log(f"sw_score: {sw_per * 1000:.1f} ms/{pairs} pairs = {gcups:.2f} GCUPS")

    print(json.dumps({
        "metric": "reads_aligned_per_s_per_chip",
        "value": round(float(reads_per_s), 1),
        "unit": "reads/s",
        "vs_baseline": round(float(reads_per_s) / BWA_NODE_READS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
