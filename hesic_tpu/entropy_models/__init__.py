from .codec import (CdfTables, compress_with_indexes, decompress_with_indexes,
                    gaussian_tables, tables_from_pmf)
from .entropy_models import (SCALES_LEVELS, SCALES_MAX, SCALES_MIN,
                             EntropyBottleneck, GaussianConditional,
                             GaussianMixtureConditional, build_indexes,
                             gaussian_pmf_data, get_scale_table, gmm_pmf,
                             gmm_pmf_edges,
                             standardized_cumulative, standardized_quantile)

__all__ = [
    "CdfTables",
    "compress_with_indexes",
    "decompress_with_indexes",
    "gaussian_tables",
    "tables_from_pmf",
    "SCALES_LEVELS",
    "SCALES_MAX",
    "SCALES_MIN",
    "EntropyBottleneck",
    "GaussianConditional",
    "GaussianMixtureConditional",
    "build_indexes",
    "gaussian_pmf_data",
    "get_scale_table",
    "gmm_pmf",
    "gmm_pmf_edges",
    "standardized_cumulative",
    "standardized_quantile",
]
