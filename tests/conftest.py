"""Test configuration: force an 8-device CPU JAX backend.

Per SURVEY.md section 4.2, every shard_map/psum/ring path is exercised on fake
CPU devices (`--xla_force_host_platform_device_count=8`); real-TPU runs happen
via bench.py / the driver, not pytest.

Env vars must be set before jax is imported anywhere, hence this conftest.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin (platform "axon") force-selects itself via
# JAX_PLATFORMS, so the env var alone cannot pin tests to CPU - the config
# update below can (must run before any backend is initialized).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from rambl_tpu.config import PipelineConfig  # noqa: E402
from rambl_tpu.data.simulate import simulate_dataset  # noqa: E402
from rambl_tpu.index.builder import build_seed_index  # noqa: E402
from rambl_tpu.index.taxonomy import build_taxonomy_tables  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return PipelineConfig()


@pytest.fixture(scope="session")
def small_ds():
    """Small mock community shared across tests (5 species x 2 strains)."""
    return simulate_dataset(
        n_species=5, refs_per_species=2, n_reads=600, seed=1, skewed_abundance=False
    )


@pytest.fixture(scope="session")
def small_index(small_ds, cfg):
    return build_seed_index(small_ds.ref_seqs, small_ds.ref_lens, k=cfg.k)


@pytest.fixture(scope="session")
def small_tax(small_ds):
    return build_taxonomy_tables(
        small_ds.tax_parent, small_ds.tax_depth, small_ds.ref_taxon
    )
