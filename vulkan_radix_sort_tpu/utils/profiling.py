"""Profiling helpers — the tracing subsystem (SURVEY.md §5).

The reference instruments each sort with 15 GPU timestamps decoded into
per-stage sums (reference: src/vk_radix_sort.h.in:39-50,
bench/vulkan_benchmark.cc:318-337). The TPU equivalents here:

  * `trace(dir)` — context manager around `jax.profiler` producing an XPlane
    trace viewable in TensorBoard/Perfetto (per-kernel device timeline, the
    high-fidelity analog of timestamp queries).
  * `stage_report(keys, config)` — per-stage wall times via separately
    jitted sub-programs (Sorter.sort_timed's machinery), formatted like the
    reference bench's per-stage percentage lines (bench/bench.cc:178-186).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a device trace around a block of sorts."""
    jax.profiler.start_trace(log_dir, host_tracer_level=host_tracer_level)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_report(keys, config=None, iters: int = 5) -> str:
    """Human-readable per-stage breakdown of one sort, reference-style."""
    from ..models.sorter import Sorter

    s = Sorter(keys.shape[0], key_dtype=keys.dtype, config=config)
    t = s.sort_timed(keys, iters=iters)
    total = max(t.total_ns, 1.0)
    lines = [
        f"backend={s.backend} n={keys.shape[0]} total {t.total_ns / 1e6:9.3f} ms"
    ]
    names = (
        ("chunk", t.upsweep_ns), ("cross", t.spine_ns), ("local", t.downsweep_ns)
    ) if s.backend == "network" else (
        ("upsweep", t.upsweep_ns), ("spine", t.spine_ns),
        ("downsweep", t.downsweep_ns),
    )
    for name, ns in names:
        if ns:
            lines.append(
                f"  {name:<10} {ns / 1e6:9.3f} ms  ({100.0 * ns / total:5.1f}%)"
            )
    return "\n".join(lines)
