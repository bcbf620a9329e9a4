from hpc_suffix_array_tpu.datasets.generate import (
    generate_random_text,
    generate_repetitive_text,
    generate_dna_text,
    generate_standard_datasets,
    generate_test_fixtures,
    SMALL_FIXTURES,
)

__all__ = [
    "generate_random_text",
    "generate_repetitive_text",
    "generate_dna_text",
    "generate_standard_datasets",
    "generate_test_fixtures",
    "SMALL_FIXTURES",
]
