"""vulkan_radix_sort_tpu — a TPU-native sort-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
jaesung-cs/vulkan_radix_sort (a Vulkan reduce-then-scan LSD radix sorter for
32-bit keys and key-value pairs). The TPU hot path is a bitonic
compare-exchange network over VMEM-resident chunks (ops/bitonic.py) — the
measured-fastest exact sort on this hardware (docs/DESIGN.md) — with a
Pallas LSD radix pipeline and lax.sort as alternative backends, a
cached-pipeline Sorter API mirroring the reference's seven vrdx* entry
points, stable key-value sorting with values as a separate 32-bit buffer,
dynamic element counts (the "indirect" path), a multi-chip distributed sort
over a jax.sharding.Mesh, a native C++ host engine, and a benchmark harness
replicating the reference's sweep/verification methodology.
"""

from .config import SortConfig, default_config
from .models.sorter import Sorter, create_sorter
from .ops import bitonic, radix, reference

__version__ = "0.4.0"

__all__ = [
    "SortConfig",
    "Sorter",
    "bitonic",
    "create_sorter",
    "default_config",
    "radix",
    "reference",
    "sort",
    "sort_key_value",
]


def sort(keys, count=None, config=None):
    """One-shot ascending sort (creates a throwaway Sorter).

    Analog of vrdxCmdSort / vrdxCmdSortIndirect (h.in:310-331).
    """
    s = Sorter(keys.shape[0], key_dtype=keys.dtype, config=config)
    return s.sort(keys, count=count)


def sort_key_value(keys, values, count=None, config=None, stable=True):
    """One-shot key-value sort (stable by default).

    Analog of vrdxCmdSortKeyValue / ...Indirect (h.in:333-342);
    stable=False is a faster extension (see Sorter.sort_key_value).
    """
    s = Sorter(keys.shape[0], key_dtype=keys.dtype, config=config)
    return s.sort_key_value(keys, values, count=count, stable=stable)
