"""Measure keys/KV 2^25 time under env-tuned kernel-split budgets.

Usage: VRS_MAX_GROUP_STAGES_KV=64 python tools/probes/tune_budgets.py kv
"""
import sys, os
import numpy as np

sys.path.insert(0, "/root/repo")
from vulkan_radix_sort_tpu.config import enable_compilation_cache
enable_compilation_cache()

import jax, jax.numpy as jnp
from vulkan_radix_sort_tpu.ops import bitonic
from vulkan_radix_sort_tpu.utils.timing import marginal_time

mode = sys.argv[1] if len(sys.argv) > 1 else "kv"
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16
n = 1 << 25
rng = np.random.default_rng(0)
keys = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
cfgstr = (f"GS={bitonic.MAX_GROUP_STAGES} GS_KV={bitonic.MAX_GROUP_STAGES_KV} "
          f"FR={bitonic.MAX_FUSED_ROWS} CAP={bitonic.FUSE_COST_CAP}")

if mode == "keys":
    kj = jnp.asarray(keys)
    fn = lambda a: bitonic.sort_u32(a, chunk=1 << chunk)
    got = np.asarray(fn(kj))
    assert np.array_equal(got, np.sort(keys)), "keys verify FAILED"
    t = marginal_time(fn, kj, k1=1, k2=4, iters=5)
    print(f"[{cfgstr}] keys 2^25 chunk=2^{chunk}: {t*1e3:.2f} ms  ({n/t/1e9:.3f} G/s)")
elif mode == "kvns":
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)
    fn = lambda a, b: bitonic.sort_pairs_u32(a, b, chunk=1 << chunk, stable=False)
    gk, gv = fn(kj, vj)
    order = np.lexsort((vals, keys))
    assert np.array_equal(np.asarray(gk), keys[order]), "kvns keys FAILED"
    assert np.array_equal(np.asarray(gv), vals[order]), "kvns vals FAILED"
    t = marginal_time(fn, kj, vj, k1=1, k2=3, iters=5)
    print(f"[{cfgstr}] kv-nonstable 2^25 chunk=2^{chunk}: {t*1e3:.2f} ms  ({n/t/1e9:.3f} G/s)")
else:
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)
    fn = lambda a, b: bitonic.sort_pairs_u32(a, b, chunk=1 << chunk)
    gk, gv = fn(kj, vj)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(gk), keys[order]), "kv keys FAILED"
    assert np.array_equal(np.asarray(gv), vals[order]), "kv vals verify FAILED"
    t = marginal_time(fn, kj, vj, k1=1, k2=3, iters=5)
    print(f"[{cfgstr}] kv 2^25 chunk=2^{chunk}: {t*1e3:.2f} ms  ({n/t/1e9:.3f} G/s)")
