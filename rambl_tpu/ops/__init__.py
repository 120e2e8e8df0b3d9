"""Device ops: the TPU-native replacement for BWA/samtools' C hot loops.

Two implementation tiers share one interface and bit-identical semantics:

- `rambl_tpu.ops.sw` / `seed`: pure-jnp (lax.scan) versions that compile on
  any backend - the CPU test tier and the correctness reference on TPU;
- `rambl_tpu.ops.sw_pallas`: hand-written Pallas TPU kernels for the hot DP
  inner loop (SURVEY.md section 7.4.5 - batch on the lane axis).

`rambl_tpu.pipeline` picks the tier via config/platform.
"""

from rambl_tpu.ops.sw import sw_score, sw_align, sw_traceback  # noqa: F401
from rambl_tpu.ops.seed import seed_candidates_jax  # noqa: F401
