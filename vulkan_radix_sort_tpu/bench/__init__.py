"""Benchmark & verification harness (reference L4 analog, SURVEY.md §2.4)."""

from .harness import (  # noqa: F401
    BACKENDS,
    BenchResult,
    make_backend,
    run_sweep,
    sweep_sizes,
    write_csv,
)
