"""Isolate sw_score_pallas input-prep (cast+transpose) vs kernel cost."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from rambl_tpu.config import ScoringParams
from rambl_tpu.ops import sw_pallas
from rambl_tpu.ops.sw_pallas import TILE, _score_kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()
    print(f"{name}: {(time.time() - t0) * 1e3:8.1f} ms", flush=True)
    return out


def main():
    sc = ScoringParams()
    B, L, W = 65536, 128, 160
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 5, (B, L)).astype(np.int8))
    w = jnp.asarray(rng.integers(0, 4, (B, W)).astype(np.int8))

    def prep(q, w):
        qT = q.astype(jnp.int32).T
        wT = jnp.concatenate(
            [w.astype(jnp.int32), jnp.full((B, L + 1), 4, jnp.int32)], axis=1
        ).T
        return qT[0, :8], wT[0, :8]  # tiny fetch

    timed("prep (cast+transpose)", jax.jit(prep), q, w)

    qT = jnp.asarray(rng.integers(0, 5, (L, B)).astype(np.int32))
    wT = jnp.asarray(rng.integers(0, 4, (W + L + 1, B)).astype(np.int32))
    nb = B // TILE

    def kernel_only(qT, wT):
        kern = functools.partial(_score_kernel, sc=sc, L=L, W=W)
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((L, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((W + L + 1, TILE), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, TILE), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8, TILE), jnp.int32),
            scratch_shapes=[pltpu.VMEM((L, TILE), jnp.int32)] * 6,
        )(qT, wT)

    timed("kernel only (pre-T inputs)", jax.jit(kernel_only), qT, wT)

    timed("full sw_score_pallas", jax.jit(
        functools.partial(sw_pallas.sw_score_pallas, sc=sc)), q, w)

    cells = B * L * W
    print(f"(cells per call: {cells/1e9:.2f} G)")


if __name__ == "__main__":
    main()
