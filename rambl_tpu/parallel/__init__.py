"""Distribution layer: mesh construction + shard_map pipeline steps.

The reference is single-node with subprocess/file IPC (SURVEY.md section 2.3:
"Collectives backend: none"). Here distribution is first-class:

- 1D device mesh over axis 'data'; read batches shard along it (DP);
- the Greengenes seed index is replicated when it fits, or bucket-range
  sharded with ring rotation of index shards (the ring-attention analogue,
  SURVEY.md section 2.3 SP row) - see rambl_tpu.parallel.ring;
- per-taxon pileup/count tensors are merged with jax.lax.psum inside
  shard_map (BASELINE.json:5) - exact for integer counts, so distributed
  runs are bit-identical to single-device runs;
- multi-host: jax.distributed.initialize + the same mesh spanning all hosts
  (ICI within a slice, DCN across; the code is host-count agnostic).
"""

from rambl_tpu.parallel.mesh import data_mesh, shard_spec  # noqa: F401
from rambl_tpu.parallel.steps import make_align_pileup_step  # noqa: F401
