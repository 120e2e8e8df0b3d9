from rambl_tpu.index.builder import SeedIndex, build_seed_index  # noqa: F401
from rambl_tpu.index.taxonomy import TaxonomyTables, build_taxonomy_tables  # noqa: F401
