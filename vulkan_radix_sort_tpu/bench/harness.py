"""Benchmark harness: sweep, timing, correctness gate, CSV.

Re-creates the reference benchmark methodology (reference: bench/bench.cc):
  - N sweep from 2^18 to 2^25 in linear steps, keys-only and key-value each
    (bench.cc:15-20,168); step count configurable because TPU compile time
    per padded-size bucket is nontrivial.
  - 1 warmup + `iters` timed runs, median reported (bench.cc:15-16,97-101);
    device time comes from chained-iteration marginal cost so the
    environment's fixed dispatch+sync latency divides out (the analog of
    timing GPU timestamps instead of wall clock,
    vulkan_benchmark.cc:318-337).
  - correctness gate at the first sweep point: element-wise equality against
    the CPU oracle for both keys and key-value (bench.cc:41-64,164-166),
    skippable with no_verify.
  - CSV schema `backend,n,sort,gpu_ms,cpu_ms,gpu_gitems_s,cpu_gitems_s`
    with a `# version:` comment header (bench.cc:197-203).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np

from .. import __version__
from ..config import SortConfig
from ..utils import datagen
from ..utils.timing import marginal_time, time_fn

N_MIN = 1 << 18  # reference bench.cc:17
N_MAX = 1 << 25  # reference bench.cc:18
DEFAULT_STEPS = 128  # reference bench.cc:19-20


@dataclasses.dataclass
class BenchResult:
    backend: str
    n: int
    sort: str  # 'keys' | 'kv' (stable) | 'kvns' (stable=False extension)
    gpu_ms: float  # device time (chained-iteration marginal cost)
    cpu_ms: float  # raw wall clock
    gpu_gitems_s: float
    cpu_gitems_s: float


def sweep_sizes(steps: int = DEFAULT_STEPS, n_min: int = N_MIN,
                n_max: int = N_MAX) -> list[int]:
    """Linear N sweep, deduplicated (reference bench.cc:161-163)."""
    if steps <= 1:
        return [n_max]
    xs = [n_min + (n_max - n_min) * i // (steps - 1) for i in range(steps)]
    out: list[int] = []
    for x in xs:
        if not out or x != out[-1]:
            out.append(x)
    return out


class _JaxBackend:
    """Backend running one of the framework's engines under jit."""

    def __init__(self, backend: str, config: SortConfig | None = None):
        import jax

        self.name = backend
        cfg = config or SortConfig(backend=backend)
        if cfg.backend != backend:
            cfg = dataclasses.replace(cfg, backend=backend)
        self._cfg = cfg
        self._jax = jax

    def _sorter(self, n):
        from ..models.sorter import Sorter

        return Sorter(n, config=self._cfg)

    def sort(self, keys: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        s = self._sorter(keys.shape[0])
        return np.asarray(s.sort(jnp.asarray(keys)))

    def timed_fn(self, keys: np.ndarray, values: np.ndarray | None,
                 indirect: bool = False, stable: bool = True):
        import jax.numpy as jnp

        s = self._sorter(keys.shape[0])
        if not stable and values is not None:
            if indirect:
                n = jnp.uint32(keys.shape[0])
                return (
                    lambda k, v: s._sort_pairs_count_unstable_fn(k, v, n),
                    (jnp.asarray(keys), jnp.asarray(values)),
                )
            return s._sort_pairs_unstable_fn, (
                jnp.asarray(keys), jnp.asarray(values),
            )
        if values is None:
            if indirect:
                # dynamic-count path with count == n (the reference's KV
                # bench exercises its indirect API the same way,
                # vulkan_benchmark.cc:386-388)
                n = jnp.uint32(keys.shape[0])
                return (
                    lambda k: s._sort_count_fn(k, n), (jnp.asarray(keys),)
                )
            return s._sort_fn, (jnp.asarray(keys),)
        if indirect:
            n = jnp.uint32(keys.shape[0])
            return (
                lambda k, v: s._sort_pairs_count_fn(k, v, n),
                (jnp.asarray(keys), jnp.asarray(values)),
            )
        return s._sort_pairs_fn, (jnp.asarray(keys), jnp.asarray(values))

    def sort_key_value(self, keys, values, stable: bool = True):
        import jax.numpy as jnp

        s = self._sorter(keys.shape[0])
        k, v = s.sort_key_value(
            jnp.asarray(keys), jnp.asarray(values), stable=stable
        )
        return np.asarray(k), np.asarray(v)


class _CpuBackend:
    """NumPy oracle — the reference's CPU backend (bench/cpu_benchmark.cc):
    np.sort for keys, stable argsort + gather for key-value."""

    name = "cpu"

    def sort(self, keys):
        return np.sort(keys)

    def sort_key_value(self, keys, values, stable: bool = True):
        # a stable order is also a valid answer to stable=False
        order = np.argsort(keys, kind="stable")
        return keys[order], values[order]

    def timed_fn(self, keys, values):
        if values is None:
            return (lambda k: np.sort(k)), (keys,)
        return (
            lambda k, v: (lambda o: (k[o], v[o]))(np.argsort(k, kind="stable"))
        ), (keys, values)


class _CppBackend(_CpuBackend):
    """Native C++ LSD radix engine (native/vrs_native.cpp via ctypes)."""

    name = "cpp"

    def __init__(self):
        from .. import native

        if not native.available():
            raise RuntimeError("native engine unavailable (no C++ toolchain)")
        self._native = native

    def sort(self, keys):
        return self._native.sort_u32(keys)

    def sort_key_value(self, keys, values, stable: bool = True):
        # native LSD radix is stable; valid for stable=False too
        return self._native.sort_pairs_u32(keys, values)

    def timed_fn(self, keys, values):
        # pre-copy into working buffers so the timed region contains only
        # the sort, matching the reference's CPU timing discipline
        # (bench/cpu_benchmark.cc:22-25). LSD radix work is independent of
        # input order, so re-sorting the sorted buffer on later timed
        # iterations costs the same as the first pass.
        kb = np.ascontiguousarray(keys, dtype=np.uint32).copy()
        if values is None:
            return self._native.sort_u32_inplace, (kb,)
        vb = np.ascontiguousarray(values, dtype=np.uint32).copy()
        return self._native.sort_pairs_u32_inplace, (kb, vb)


class _TorchBackend(_CpuBackend):
    """torch (CPU) comparison backend — a second independent host
    competitor beside the native C++ radix, widening the comparison set
    the way the reference benches CUB and Fuchsia beside its own sort
    (reference bench/benchmark_factory.cc:14-25). torch has no uint32
    tensors, so keys/values round-trip through int64 outside the timed
    region; only torch.sort(+gather) is timed, matching the reference's
    CPU timing discipline (bench/cpu_benchmark.cc:22-25)."""

    name = "torch"

    def __init__(self):
        import torch

        self._torch = torch

    def sort(self, keys):
        t = self._torch.from_numpy(keys.astype(np.int64))
        return self._torch.sort(t).values.numpy().astype(np.uint32)

    def sort_key_value(self, keys, values, stable: bool = True):
        torch = self._torch
        k = torch.from_numpy(keys.astype(np.int64))
        v = torch.from_numpy(values.astype(np.int64))
        s, idx = torch.sort(k, stable=True)
        return (
            s.numpy().astype(np.uint32),
            v[idx].numpy().astype(np.uint32),
        )

    def timed_fn(self, keys, values):
        torch = self._torch
        k = torch.from_numpy(keys.astype(np.int64))
        if values is None:
            return (lambda t: torch.sort(t)), (k,)
        v = torch.from_numpy(values.astype(np.int64))

        def f(kt, vt):
            s, idx = torch.sort(kt, stable=True)
            return s, vt[idx]

        return f, (k, v)


BACKENDS = ("network", "radix", "xla", "cpu", "cpp", "torch")


def make_backend(name: str, config: SortConfig | None = None):
    if name == "cpu":
        return _CpuBackend()
    if name == "cpp":
        return _CppBackend()
    if name == "torch":
        return _TorchBackend()
    if name not in BACKENDS:
        raise ValueError(f"unknown backend {name!r}; options: {BACKENDS}")
    return _JaxBackend(name, config)


def check_correctness(backend, n: int, seed: int = 0,
                      distribution: str = "uniform",
                      nonstable: bool = False) -> None:
    """Oracle diff at one size, keys and kv (reference bench.cc:41-64).

    nonstable=True additionally gates the stable=False pair path: keys must
    match the oracle exactly and the (key, value) pair multiset must be
    preserved (any order among equal keys is a valid non-stable answer).
    """
    cpu = _CpuBackend()
    keys = datagen.generate_keys(n, seed=seed, distribution=distribution)
    got = backend.sort(keys)
    want = cpu.sort(keys)
    if not np.array_equal(got, want):
        i = int(np.argmax(got != want))
        raise AssertionError(
            f"keys mismatch at n={n} index {i}: {got[i]:#x} != {want[i]:#x}"
        )
    values = np.arange(n, dtype=np.uint32)
    gk, gv = backend.sort_key_value(keys, values)
    wk, wv = cpu.sort_key_value(keys, values)
    if not (np.array_equal(gk, wk) and np.array_equal(gv, wv)):
        raise AssertionError(f"key-value mismatch at n={n}")
    if nonstable:
        gk, gv = backend.sort_key_value(keys, values, stable=False)
        if not np.array_equal(gk, wk):
            raise AssertionError(f"kvns keys mismatch at n={n}")
        got_pairs = np.sort(gk.astype(np.uint64) << 32 | gv)
        want_pairs = np.sort(
            keys.astype(np.uint64) << 32 | values.astype(np.uint64)
        )
        if not np.array_equal(got_pairs, want_pairs):
            raise AssertionError(f"kvns pair multiset mismatch at n={n}")


def measure(backend, n: int, sort: str, *, iters: int = 10, seed: int = 0,
            distribution: str = "uniform", indirect: bool = False
            ) -> BenchResult:
    """1 warmup + iters timed runs, median (reference bench.cc:66-101).

    sort: 'keys', 'kv' (stable, the reference contract) or 'kvns'
    (stable=False extension; stable backends just run their pair sort).
    """
    keys = datagen.generate_keys(n, seed=seed, distribution=distribution)
    values = (
        datagen.generate_keys(n, seed=seed + 1)
        if sort in ("kv", "kvns") else None
    )
    if isinstance(backend, _CpuBackend):
        fn, args = backend.timed_fn(keys, values)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(*args)
            ts.append(time.perf_counter() - t0)
        cpu_s = float(np.median(ts))
        gpu_s = cpu_s
    else:
        fn, args = backend.timed_fn(
            keys, values, indirect=indirect, stable=sort != "kvns"
        )
        cpu_s = time_fn(fn, *args, iters=iters, warmup=1)
        # device time via chained-iteration marginal cost: the fixed
        # dispatch+sync latency divides out (cf. GPU timestamps vs wall
        # clock in the reference, vulkan_benchmark.cc:293-303)
        gpu_s = marginal_time(fn, *args, k1=1, k2=3, iters=max(3, iters // 2))
    return BenchResult(
        backend=backend.name, n=n, sort=sort,
        gpu_ms=gpu_s * 1e3, cpu_ms=cpu_s * 1e3,
        gpu_gitems_s=n / gpu_s / 1e9, cpu_gitems_s=n / cpu_s / 1e9,
    )


def run_sweep(backend_name: str, *, steps: int = DEFAULT_STEPS,
              iters: int = 10, no_verify: bool = False,
              distribution: str = "uniform",
              config: SortConfig | None = None,
              indirect: bool = False,
              nonstable: bool = False,
              n_min: int = N_MIN, n_max: int = N_MAX,
              progress: Callable[[BenchResult], None] | None = None,
              ) -> list[BenchResult]:
    """Full sweep over N for keys and kv (reference bench.cc:151-189);
    nonstable=True adds a 'kvns' (stable=False) series."""
    backend = make_backend(backend_name, config)
    sizes = sweep_sizes(steps, n_min=n_min, n_max=n_max)
    if not no_verify:
        check_correctness(
            backend, sizes[0], distribution=distribution,
            nonstable=nonstable,
        )
    results = []
    sorts = ("keys", "kv") + (("kvns",) if nonstable else ())
    for n in sizes:
        for sort in sorts:
            r = measure(
                backend, n, sort, iters=iters, distribution=distribution,
                indirect=indirect and not isinstance(backend, _CpuBackend),
            )
            results.append(r)
            if progress:
                progress(r)
    return results


def write_csv(path: str, results: list[BenchResult]) -> None:
    """Reference CSV schema + version header (bench.cc:197-203)."""
    with open(path, "w") as f:
        f.write(f"# version: {__version__}\n")
        f.write("backend,n,sort,gpu_ms,cpu_ms,gpu_gitems_s,cpu_gitems_s\n")
        for r in results:
            f.write(
                f"{r.backend},{r.n},{r.sort},{r.gpu_ms:.6f},{r.cpu_ms:.6f},"
                f"{r.gpu_gitems_s:.6f},{r.cpu_gitems_s:.6f}\n"
            )
