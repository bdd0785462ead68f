"""The Sorter: the framework's flagship "model".

TPU-native analog of the reference host library's opaque VrdxSorter handle
plus its seven entry points (include/vk_radix_sort.h:24-81):

  vrdxCreateSorter                    -> Sorter(...) / create_sorter(...)
  vrdxDestroySorter                   -> (garbage collection)
  vrdxGetSorterStorageRequirements    -> Sorter.storage_requirements()
  vrdxGetSorterKeyValueStorageRequirements -> idem with key_value=True
  vrdxCmdSort                         -> Sorter.sort(keys)
  vrdxCmdSortIndirect                 -> Sorter.sort(keys, count=...)
  vrdxCmdSortKeyValue                 -> Sorter.sort_key_value(keys, values)
  vrdxCmdSortKeyValueIndirect         -> Sorter.sort_key_value(..., count=...)

Where the reference caches four pre-compiled Vulkan pipelines per sorter
(h.in:199-238), we cache jitted XLA executables per padded size bucket; where
it exposes temp-buffer sizing because Vulkan makes the user allocate scratch
(h.in:279-308), XLA allocates scratch internally, so storage_requirements()
is an estimator for capacity planning rather than a contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import SortConfig, default_config, round_up
from ..ops import bitonic, bitops, radix, reference
from ..utils.timing import StageTimes, marginal_time, time_fn


# measured crossovers vs lax.sort on v5e: below these sizes XLA's sort
# wins and 'auto' uses it instead. The keys cutoff was re-measured after
# sentinel-block skipping: the network wins clearly from 2^18 up (2.1-2.2
# vs 0.4-1.0 GItems/s at 2^18-2^19); below that the tunnel's timing noise
# exceeds the difference, so XLA keeps the small sizes. KV cutoffs come
# from the round-3 chip sweep (bench_results/kv_cutoff_v5e.csv): stable kv
# crosses at n=2^17 (network 0.119 vs xla 0.133 ms; 2^16 is within noise,
# 0.053 vs 0.057) and non-stable kv (kvns) wins already at 2^16
# (0.023 vs 0.059 ms).
AUTO_NETWORK_MIN_KEYS = 1 << 18
AUTO_NETWORK_MIN_KV = 1 << 17
AUTO_NETWORK_MIN_KVNS = 1 << 16


def _platform() -> str:
    try:
        return jax.devices()[0].platform
    except RuntimeError:
        return "cpu"


def _pick_backend(cfg: SortConfig, max_n: int | None = None,
                  kind: str = "keys") -> str:
    if cfg.backend != "auto":
        # 'pallas' predates the network engine; keep it as an alias for the
        # radix pipeline so older configs stay valid.
        return "radix" if cfg.backend == "pallas" else cfg.backend
    # validate `kind` before the platform check so a bad caller fails on
    # every host, not just on TPU
    cut = {"keys": AUTO_NETWORK_MIN_KEYS, "kv": AUTO_NETWORK_MIN_KV,
           "kvns": AUTO_NETWORK_MIN_KVNS}[kind]
    if _platform() != "tpu":
        return "xla"
    if max_n is not None and max_n < cut:
        return "xla"
    return "network"


def _nondecreasing(u):
    if u.shape[0] < 2:
        return jnp.bool_(True)
    return jnp.all(u[1:] >= u[:-1])


def _nonincreasing(u):
    if u.shape[0] < 2:
        return jnp.bool_(True)
    return jnp.all(u[1:] <= u[:-1])


def _adaptive_sort(u, slow):
    """Opt-in adaptive fast path (SortConfig.adaptive): one detection
    reduce spots already-sorted / reverse-sorted / constant key arrays
    (BASELINE's degenerate configs) and replaces the whole sort with an
    identity or reverse copy. Keys-only: equal keys are bitwise
    interchangeable, so a flip of a non-increasing array is a correct
    ascending sort. No reference analog — the reference always runs all
    four passes (h.in:400-502)."""
    nondec = _nondecreasing(u)
    noninc = _nonincreasing(u)
    # nested conds so the already-sorted case is a pure identity copy —
    # a single fused branch with jnp.where(nondec, a, a[::-1]) would
    # stream the flip AND the select even when nondec is known true
    return jax.lax.cond(
        nondec,
        lambda a: a,
        lambda a: jax.lax.cond(noninc, lambda b: b[::-1], slow, a),
        u,
    )


def _adaptive_sort_pairs(u, v, slow):
    """Sorted-input identity path for key-value sorts. Identity is the
    *stable* answer on non-decreasing keys (input order preserved), so it
    is valid for both stable=True and stable=False requests. Reverse
    inputs are NOT flipped here: a flip reverses equal-key ties."""
    return jax.lax.cond(
        _nondecreasing(u),
        lambda a, b: (a, b),
        slow,
        u, v,
    )


def _sort_dispatch(backend, cfg, u, count=None):
    if backend == "network":
        # count gates grid steps past the live prefix to a copy — the
        # indirect early-exit analog (reference upsweep.slang:20-22)
        return bitonic.sort_u32(u, count, chunk=cfg.chunk_keys,
                                interpret=cfg.interpret)
    if backend == "radix":
        return radix.sort_u32(u, config=cfg)
    return reference.sort_keys(u)


def _sort_pairs_dispatch(backend, cfg, u, v, stable=True, count=None):
    if backend == "network":
        return bitonic.sort_pairs_u32(
            u, v, count, chunk=cfg.chunk_carry, interpret=cfg.interpret,
            stable=stable,
        )
    # the other backends are stable by construction, which is a valid
    # (if unasked-for) answer to a stable=False request
    if backend == "radix":
        return radix.sort_pairs_u32(u, v, config=cfg)
    return reference.sort_pairs(u, v)


class Sorter:
    """Compiled, reusable radix-sort pipelines for keys up to max_n elements."""

    def __init__(
        self,
        max_n: int,
        key_dtype=jnp.uint32,
        config: SortConfig | None = None,
    ):
        if max_n <= 0:
            raise ValueError("max_n must be positive")
        self.config = config or default_config()
        self.max_n = int(max_n)
        self.key_dtype = jnp.dtype(key_dtype)
        self.wide = self.key_dtype in bitops.ENCODERS64
        if self.wide:
            # 64-bit keys (extension; the reference is uint32-only,
            # include/vk_radix_sort.h:52-81): sorted as (hi, lo) uint32
            # word pairs through the 2-array network path. Requires jax
            # x64 mode so the user-facing arrays keep their width.
            self._require_x64()
            if self.key_dtype == jnp.dtype(jnp.float64) and _platform() == "tpu":
                # XLA's TPU x64 rewriter has no lowering for the
                # f64<->u64 bitcast the order-preserving encoding needs
                # ("While rewriting computation to not contain X64
                # element types ... not implemented")
                raise NotImplementedError(
                    "float64 keys are not supported on TPU (XLA's x64 "
                    "rewriter cannot bitcast f64); use float32, or "
                    "sort on CPU"
                )
            self._encode, self._decode = bitops.ENCODERS64[self.key_dtype]
        elif self.key_dtype in bitops.ENCODERS:
            self._encode, self._decode = bitops.ENCODERS[self.key_dtype]
        else:
            raise ValueError(f"unsupported key dtype {key_dtype}")
        self.backend = _pick_backend(self.config, self.max_n)
        self.backend_kv = _pick_backend(self.config, self.max_n, kind="kv")
        self.backend_kvns = _pick_backend(self.config, self.max_n, kind="kvns")
        if self.wide and self.backend == "radix":
            raise NotImplementedError(
                "the radix backend does not support 64-bit keys; use "
                "backend='network' (or 'auto'/'xla')"
            )

    def _require_x64(self):
        """x64 must be on when wide pipelines are built AND when they are
        called: tracing the split/merge pieces with x64 off silently
        truncates uint64 operands to uint32."""
        if not jax.config.jax_enable_x64:
            raise ValueError(
                f"{self.key_dtype} keys require jax x64 mode "
                "(jax.enable_x64() context manager or "
                "jax.config.update('jax_enable_x64', True))"
            )

    # -- storage sizing (analog of h.in:279-308) ---------------------------

    def storage_requirements(self, key_value: bool = False) -> int:
        """Estimated scratch bytes XLA will hold live during a sort.

        The reference exposes exact temp sizing because Vulkan makes the
        user allocate scratch (h.in:108-115,279-308); XLA allocates
        internally, so this is a capacity-planning estimator per backend.
        """
        cfg = self.config
        if self.wide:
            # padded uint32 word buffers — (hi, lo), plus aux tiebreak and
            # value for key-value — + the 8-byte input/output arrays
            np2 = 1 << max(8, (self.max_n - 1).bit_length())
            return 4 * np2 * (4 if key_value else 2) + 2 * 8 * self.max_n
        if self.backend == "network":
            # padded (in-place aliased) key buffer, + value and index
            # buffers for the stable KV path
            np2 = 1 << max(8, (self.max_n - 1).bit_length())
            per = 4 * np2
            return per * (3 if key_value else 1)
        # radix layout (h.in:108-115): element count + histograms +
        # ping-pong key (and value) buffers
        n = round_up(self.max_n, cfg.block)
        blocks = n // cfg.block
        hist = 4 * (1 + cfg.num_passes * cfg.radix + blocks * cfg.radix)
        inout = 4 * n
        return hist + inout * (2 if key_value else 1)

    # -- compiled pipelines -------------------------------------------------

    @functools.cached_property
    def _sort_fn(self):
        cfg, backend = self.config, self.backend
        enc, dec = self._encode, self._decode

        if self.wide:
            require = self._require_x64
            if backend != "network":
                inner = jax.jit(lambda keys: dec(jnp.sort(enc(keys))))
                return lambda keys: (require(), inner(keys))[1]

            # (hi, lo)-lexicographic == uint64 order: the non-stable pair
            # path sorts the words directly. The split/merge pieces trace
            # under x64, but the Pallas word sort must trace with x64 OFF
            # (weak-typed i64 scalars otherwise leak into the Mosaic
            # kernels, which reject them) — the enable_x64(False) context
            # applies at trace time, so one jit covers the whole pipeline.
            def slow64(u):
                hi, lo = bitops.split_u64(u)
                with jax.enable_x64(False):
                    hi, lo = bitonic.sort_pairs_u32(
                        hi, lo, chunk=cfg.chunk_carry, interpret=cfg.interpret,
                        stable=False,
                    )
                return bitops.merge_u64(hi, lo)

            @jax.jit
            def inner(keys):
                u = enc(keys)
                if cfg.adaptive:
                    return dec(_adaptive_sort(u, slow64))
                return dec(slow64(u))

            return lambda keys: (require(), inner(keys))[1]

        @jax.jit
        def f(keys):
            slow = lambda u: _sort_dispatch(backend, cfg, u)  # noqa: E731
            u = enc(keys)
            if cfg.adaptive:
                return dec(_adaptive_sort(u, slow))
            return dec(slow(u))

        return f

    @functools.cached_property
    def _sort_pairs_fn(self):
        return self._make_sort_pairs_fn(True)

    @functools.cached_property
    def _sort_pairs_unstable_fn(self):
        return self._make_sort_pairs_fn(False)

    def _make_sort_pairs_fn(self, stable):
        cfg = self.config
        backend = self.backend_kv if stable else self.backend_kvns
        enc, dec = self._encode, self._decode

        if self.wide:
            require = self._require_x64

            def slow64(u, values):
                hi, lo = bitops.split_u64(u)
                with jax.enable_x64(False):
                    if backend == "network":
                        hi, lo, v = bitonic.sort_pairs_w64(
                            hi, lo, values, chunk=cfg.chunk_carry,
                            interpret=cfg.interpret, stable=stable,
                        )
                    else:
                        # stable word sort == stable u64 sort; also a valid
                        # answer to a stable=False request
                        hi, lo, v = jax.lax.sort(
                            (hi, lo, values), num_keys=2, is_stable=True
                        )
                return bitops.merge_u64(hi, lo), v

            @jax.jit
            def inner(keys, values):
                u = enc(keys)
                if cfg.adaptive:
                    k, v = _adaptive_sort_pairs(u, values, slow64)
                else:
                    k, v = slow64(u, values)
                return dec(k), v

            return lambda keys, values: (require(), inner(keys, values))[1]

        @jax.jit
        def f(keys, values):
            slow = lambda u, v: _sort_pairs_dispatch(  # noqa: E731
                backend, cfg, u, v, stable=stable
            )
            u = enc(keys)
            if cfg.adaptive:
                k, v = _adaptive_sort_pairs(u, values, slow)
            else:
                k, v = slow(u, values)
            return dec(k), v

        return f

    @functools.cached_property
    def _sort_count_fn(self):
        # keys-only output makes genuine max-valued keys bitwise
        # interchangeable with the out-of-range sentinels, so the masked
        # count path is a plain keys sort (no index tiebreak) and the
        # backend choice follows the keys crossover
        cfg, backend = self.config, self.backend
        enc, dec = self._encode, self._decode

        if self.wide:
            # sentinel = u64 max: out-of-range slots sort to the end;
            # keys-only output makes genuine max keys interchangeable with
            # sentinels, so no index tiebreak is needed
            require = self._require_x64

            @jax.jit
            def inner(keys, count):
                u = enc(keys)
                idx = jnp.arange(u.shape[0], dtype=jnp.uint32)
                in_range = idx < count
                masked = jnp.where(
                    in_range, u, jnp.uint64(0xFFFFFFFFFFFFFFFF)
                )
                hi, lo = bitops.split_u64(masked)
                with jax.enable_x64(False):
                    if backend == "network":
                        hi, lo = bitonic.sort_pairs_u32(
                            hi, lo, count, chunk=cfg.chunk_carry,
                            interpret=cfg.interpret, stable=False,
                        )
                    else:
                        hi, lo = jax.lax.sort((hi, lo), num_keys=2)
                return dec(
                    jnp.where(in_range, bitops.merge_u64(hi, lo), u)
                )

            return lambda keys, count: (require(), inner(keys, count))[1]

        @jax.jit
        def f(keys, count):
            u = enc(keys)
            n = u.shape[0]
            idx = jnp.arange(n, dtype=jnp.uint32)
            in_range = idx < count
            masked = jnp.where(in_range, u, jnp.uint32(0xFFFFFFFF))
            if backend == "xla":
                k = reference.sort_keys_count(u, count)
            else:
                # The first `count` slots of the masked keys-only sort are
                # exactly the sorted prefix: the sentinels and any genuine
                # 0xffffffff keys are indistinguishable in the output, and
                # there are exactly n-count sentinels past position
                # count-1. Same argument as the wide path above — no index
                # carry needed (formerly a 2-array (masked, idx) sort at
                # 52.6 ms vs ~23 ms at 2^25).
                k = _sort_dispatch(backend, cfg, masked, count=count)
            return dec(jnp.where(in_range, k, u))

        return f

    @functools.cached_property
    def _sort_pairs_count_fn(self):
        return self._make_sort_pairs_count_fn(True)

    @functools.cached_property
    def _sort_pairs_count_unstable_fn(self):
        return self._make_sort_pairs_count_fn(False)

    def _make_sort_pairs_count_fn(self, stable):
        cfg = self.config
        backend = self.backend_kv if stable else self.backend_kvns
        enc, dec = self._encode, self._decode

        if self.wide:
            require = self._require_x64

            @jax.jit
            def inner(keys, values, count):
                u = enc(keys)
                n = u.shape[0]
                idx = jnp.arange(n, dtype=jnp.uint32)
                in_range = idx < count
                masked = jnp.where(
                    in_range, u, jnp.uint64(0xFFFFFFFFFFFFFFFF)
                )
                # non-stable: mask values too, making sentinel pairs the
                # lexicographic maximum — genuine (max-key, max-value)
                # pairs are bitwise interchangeable with sentinels, so the
                # prefix/tail split stays exact
                mv = values if stable else jnp.where(
                    in_range, values, jnp.uint32(0xFFFFFFFF)
                )
                hi, lo = bitops.split_u64(masked)
                with jax.enable_x64(False):
                    if backend == "network":
                        hi, lo, v = bitonic.sort_pairs_w64(
                            hi, lo, mv, count, chunk=cfg.chunk_carry,
                            interpret=cfg.interpret, stable=stable,
                        )
                    else:
                        hi, lo, _, v = jax.lax.sort(
                            (hi, lo, idx, mv), num_keys=3
                        )
                k = jnp.where(in_range, bitops.merge_u64(hi, lo), u)
                return dec(k), jnp.where(in_range, v, values)

            return lambda k, v, c: (require(), inner(k, v, c))[1]

        @jax.jit
        def f(keys, values, count):
            u = enc(keys)
            n = u.shape[0]
            idx = jnp.arange(n, dtype=jnp.uint32)
            in_range = idx < count
            masked = jnp.where(in_range, u, jnp.uint32(0xFFFFFFFF))
            mv = values if stable else jnp.where(
                in_range, values, jnp.uint32(0xFFFFFFFF)
            )
            if backend == "xla":
                # stable answer, also valid for a stable=False request
                k, _, v = jax.lax.sort((masked, idx, mv), num_keys=2)
            else:
                k, v = _sort_pairs_dispatch(
                    backend, cfg, masked, mv, stable=stable, count=count
                )
            return dec(jnp.where(in_range, k, u)), jnp.where(in_range, v, values)

        return f

    # -- public API ----------------------------------------------------------

    def _check(self, keys, values=None):
        if keys.ndim != 1:
            raise ValueError("keys must be rank-1")
        if keys.shape[0] > self.max_n:
            raise ValueError(f"n={keys.shape[0]} exceeds max_n={self.max_n}")
        if keys.dtype != self.key_dtype:
            raise TypeError(f"expected key dtype {self.key_dtype}, got {keys.dtype}")
        if values is not None and values.shape != keys.shape:
            raise ValueError("values must match keys shape")

    def sort(self, keys, count=None):
        """Ascending sort. `count` (traced scalar ok) sorts only the prefix,
        leaving the tail untouched — the reference's indirect path."""
        self._check(keys)
        if count is None:
            return self._sort_fn(keys)
        return self._sort_count_fn(keys, jnp.uint32(count))

    def sort_key_value(self, keys, values, count=None, stable=True):
        """Ascending key-value sort; values ride as a separate 32-bit buffer
        per pass (reference README.md:60).

        stable=True matches the reference's std::stable_sort contract.
        stable=False is an extension beyond the reference API: the network
        backend drops the original-index carry for a ~1.4x faster sort
        whose order among equal keys is by ascending value (deterministic);
        the other backends (including the small-n auto pick) are stable by
        construction and simply return input order among equal keys — also
        a valid non-stable result. With SortConfig.adaptive, an
        already-sorted input returns unchanged on every path (input order
        among equal keys — the stable answer, and a valid non-stable one).
        """
        self._check(keys, values)
        if count is None:
            if not stable:
                return self._sort_pairs_unstable_fn(keys, values)
            return self._sort_pairs_fn(keys, values)
        if not stable:
            return self._sort_pairs_count_unstable_fn(
                keys, values, jnp.uint32(count)
            )
        return self._sort_pairs_count_fn(keys, values, jnp.uint32(count))

    # -- timing queries (analog of the 15-timestamp layout, h.in:39-50) ------

    def sort_timed(self, keys, iters: int = 10) -> StageTimes:
        t = StageTimes()
        # total: device time via the chained marginal method (the GPU
        # timestamp analog); cpu: raw wall clock including this
        # environment's fixed dispatch+sync latency (the submit->fence
        # analog, vulkan_benchmark.cc:299-302)
        t.cpu_ns = time_fn(self._sort_fn, keys, iters=iters) * 1e9
        t.total_ns = marginal_time(
            self._sort_fn, keys, iters=max(3, iters // 3)
        ) * 1e9
        if self.wide:
            if self.backend == "network":
                # the wide keys-only pipeline is a non-stable (hi, lo)
                # word-pair sort (MODE_PAIRS); split eagerly, then time
                # per-kernel with x64 off exactly as the pipeline traces
                self._require_x64()
                hi, lo = bitops.split_u64(self._encode(keys))
                with jax.enable_x64(False):
                    stage = bitonic.stage_times_pairs(
                        hi, lo, chunk=self.config.chunk_carry, iters=iters,
                        stable=False, interpret=self.config.interpret,
                    )
                t.upsweep_ns = stage["chunk"] * 1e9
                t.spine_ns = stage["cross"] * 1e9
                t.downsweep_ns = stage["local"] * 1e9
                t.extra = stage
            return t
        if self.backend == "radix":
            stage = radix.stage_times(self._encode(keys), self.config, iters=iters)
            t.upsweep_ns = stage.get("upsweep", 0.0) * 1e9
            t.spine_ns = stage.get("spine", 0.0) * 1e9
            t.downsweep_ns = stage.get("downsweep", 0.0) * 1e9
            t.extra = stage
        elif self.backend == "network":
            # stage mapping: chunk-sort plays the upsweep role (per-block
            # work), cross kernels the spine (inter-block movement), local
            # cleanup the downsweep.
            stage = bitonic.stage_times(
                self._encode(keys), chunk=self.config.chunk_keys, iters=iters,
                interpret=self.config.interpret,
            )
            t.upsweep_ns = stage["chunk"] * 1e9
            t.spine_ns = stage["cross"] * 1e9
            t.downsweep_ns = stage["local"] * 1e9
            t.extra = stage
        return t

    def sort_key_value_timed(self, keys, values, stable: bool = True,
                             iters: int = 10) -> StageTimes:
        """Per-stage timing for the key-value pipelines (the -DKEY_VALUE
        timestamp analog, h.in:39-50) — covers the packed-lazy stable
        carry, the non-stable pair carry, the big-n fallback, and the
        64-bit (w3/w4) word modes; `extra["mode"]` names which one ran."""
        self._check(keys, values)
        fn = self._sort_pairs_fn if stable else self._sort_pairs_unstable_fn
        t = StageTimes()
        t.cpu_ns = time_fn(fn, keys, values, iters=iters) * 1e9
        t.total_ns = marginal_time(
            fn, keys, values, iters=max(3, iters // 3)
        ) * 1e9
        if (self.backend_kv if stable else self.backend_kvns) != "network":
            return t
        cfg = self.config
        if self.wide:
            self._require_x64()
            hi, lo = bitops.split_u64(self._encode(keys))
            with jax.enable_x64(False):
                stage = bitonic.stage_times_w64(
                    hi, lo, values, chunk=cfg.chunk_carry, iters=iters,
                    stable=stable, interpret=cfg.interpret,
                )
        else:
            stage = bitonic.stage_times_pairs(
                self._encode(keys), values, chunk=cfg.chunk_carry, iters=iters,
                stable=stable, interpret=cfg.interpret,
            )
        t.upsweep_ns = stage["chunk"] * 1e9
        t.spine_ns = stage["cross"] * 1e9
        t.downsweep_ns = stage["local"] * 1e9
        t.extra = stage
        return t


def create_sorter(max_n: int, key_dtype=jnp.uint32, config=None, **kw) -> Sorter:
    """vrdxCreateSorter analog (h.in:141-265).

    Accepts either a ready `config=SortConfig(...)` or SortConfig fields as
    keyword arguments (`backend=`, `chunk=`, `interpret=`, ...), but not
    both. Unknown keywords raise instead of being silently dropped.
    """
    unknown = set(kw) - set(SortConfig.__dataclass_fields__)
    if unknown:
        raise TypeError(f"unknown sorter options: {sorted(unknown)}")
    if kw:
        if config is not None:
            raise TypeError(
                "pass either config= or SortConfig field keywords, not both"
            )
        config = SortConfig(**kw)
    return Sorter(max_n, key_dtype=key_dtype, config=config)
