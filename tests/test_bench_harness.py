"""Benchmark harness tests: sweep shape, CSV schema, correctness gate."""

import numpy as np
import pytest

from vulkan_radix_sort_tpu.bench import harness


def test_sweep_sizes_matches_reference_shape():
    sizes = harness.sweep_sizes(128)
    assert sizes[0] == 1 << 18 and sizes[-1] == 1 << 25
    assert all(b > a for a, b in zip(sizes, sizes[1:]))
    assert len(sizes) == 128  # distinct at this range/step count


def test_cpu_backend_measure_and_csv(tmp_path):
    res = [
        harness.measure(harness.make_backend("cpu"), 1 << 10, s, iters=2)
        for s in ("keys", "kv")
    ]
    path = tmp_path / "out.csv"
    harness.write_csv(str(path), res)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("# version:")
    assert lines[1] == "backend,n,sort,gpu_ms,cpu_ms,gpu_gitems_s,cpu_gitems_s"
    assert len(lines) == 4


def test_correctness_gate_passes_cpu():
    harness.check_correctness(harness.make_backend("cpu"), 1 << 10)


def test_correctness_gate_catches_bad_backend():
    class Bad(harness._CpuBackend):
        name = "bad"

        def sort(self, keys):
            out = np.sort(keys)
            out[0] ^= 1
            return out

    with pytest.raises(AssertionError):
        harness.check_correctness(Bad(), 1 << 10)


def test_torch_backend_measure_and_gate():
    pytest.importorskip("torch")
    b = harness.make_backend("torch")
    harness.check_correctness(b, 1 << 10, nonstable=True)
    res = [harness.measure(b, 1 << 10, s, iters=2) for s in ("keys", "kv")]
    assert {r.sort for r in res} == {"keys", "kv"}
    assert all(r.gpu_ms > 0 for r in res)


def test_xla_backend_measure_and_gate():
    b = harness.make_backend("xla")
    harness.check_correctness(b, 1 << 12)
    res = [harness.measure(b, 1 << 12, s, iters=2) for s in ("keys", "kv")]
    assert {r.sort for r in res} == {"keys", "kv"}
    assert all(r.gpu_gitems_s > 0 for r in res)


def test_stage_split_interpret():
    """--stages analog of the reference's per-stage % lines (bench.cc:178-186)."""
    from vulkan_radix_sort_tpu.bench.__main__ import print_stage_split

    st = print_stage_split("network", steps=4, iters=1, interpret=True,
                           n=1 << 10)
    assert set(st) >= {"chunk", "cross", "local", "rounds"}
    assert st["chunk"] > 0


def test_nonstable_sweep_cpu():
    """kvns series runs on every backend (stable ones just stay stable);
    kvns + indirect is supported since the masked-value sentinel trick."""
    from vulkan_radix_sort_tpu.bench.harness import run_sweep

    results = run_sweep("cpu", steps=2, iters=2, nonstable=True,
                        n_min=1 << 10, n_max=1 << 12)
    sorts = {r.sort for r in results}
    assert sorts == {"keys", "kv", "kvns"}


def test_profile_fused_decoder(tmp_path, capsys):
    """tools/profile_fused.py: the jax.profiler XSpace wire-format decoder
    must parse a real trace and attribute per-kernel device time (on CPU
    the events are XLA:CPU thunks; on TPU the same decoder sees Mosaic
    kernels — the measured-attribution path for fused rounds)."""
    import importlib.util
    import json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "profile_fused",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "profile_fused.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["profile_fused.py", "keys", "12", "10"]
    try:
        rc = mod.main()
    finally:
        sys.argv = old
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kernels"] and out["device_total_s"] > 0
