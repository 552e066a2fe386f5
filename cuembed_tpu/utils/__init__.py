"""Host-side utilities: synthetic data generation, problem allocation,
benchmark timing/bandwidth accounting.

The TPU analog of the reference's ``utils/`` tree (allocation, datagen,
CPU adapters) — implemented in numpy/JAX host code instead of thrust/CUDA.
"""

from cuembed_tpu.utils.datagen import PowerLawGenerator, power_law_indices
from cuembed_tpu.utils.allocation import AllocationOptions, allocate
from cuembed_tpu.utils.frequency import (
    cold_fraction,
    count_frequencies,
    frequency_order,
    reorder_table,
    tier_fractions,
)
from cuembed_tpu.utils.pipeline import InputPipeline

__all__ = [
    "PowerLawGenerator",
    "power_law_indices",
    "AllocationOptions",
    "allocate",
    "count_frequencies",
    "frequency_order",
    "reorder_table",
    "cold_fraction",
    "tier_fractions",
    "InputPipeline",
]
