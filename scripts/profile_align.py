"""Per-phase device timing of the align path on the local TPU.

Each phase is measured as one large dispatch with a host fetch (the tunnel
RTT ~25ms is noted; phases are sized so device time dominates). Run:
    python scripts/profile_align.py [B]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import toy_dataset
from rambl_tpu.index.builder import build_seed_index
from rambl_tpu.ops.seed import SeedTable, seed_candidates_jax
from rambl_tpu.ops.sw import sw_align, sw_score, sw_traceback
from rambl_tpu.ops.sw_pallas import sw_score_pallas
from rambl_tpu.pipeline.align import align_batch


def t(name, f, *args):
    tc = time.time()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()  # warm
    tcompile = time.time() - tc
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()
    print(f"{name}: {(time.time() - t0) * 1e3:8.1f} ms (compile {tcompile:.0f}s)",
          flush=True)
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = PipelineConfig()
    print("building dataset...", flush=True)
    ds = toy_dataset(n_reads=B)
    index = build_seed_index(ds.ref_seqs, ds.ref_lens, k=cfg.k)
    table = SeedTable.from_index(index)
    refs = jnp.asarray(ds.ref_seqs)
    r = jnp.asarray(ds.reads[:B])
    l = jnp.asarray(ds.read_lens[:B])
    print(f"B={B} device={jax.devices()[0]}", flush=True)

    seed_f = jax.jit(functools.partial(seed_candidates_jax, table=table, cfg=cfg))
    t(f"seed      {B}", seed_f, r, l)

    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.integers(0, 4, (B, cfg.window_len)).astype(np.int8))
    score_f = jax.jit(functools.partial(sw_score, sc=cfg.scoring))
    t(f"sw_score(scan)  {B}", score_f, r, w1)
    pallas_f = jax.jit(functools.partial(sw_score_pallas, sc=cfg.scoring))
    t(f"sw_score(plls)  {B}", pallas_f, r, w1)

    al_f = jax.jit(functools.partial(sw_align, sc=cfg.scoring))
    out = t(f"sw_align(dirs)  {B}", al_f, r, w1)
    tb_f = jax.jit(lambda d, i, j: sw_traceback(d, i, j, cfg.read_len_max,
                                                cfg.window_len))
    t(f"traceback  {B}", tb_f, out[3], out[1], out[2])

    full_f = jax.jit(functools.partial(align_batch, table=table,
                                       ref_seqs=refs, cfg=cfg))
    t(f"align_batch  {B}", full_f, r, l)


if __name__ == "__main__":
    main()
