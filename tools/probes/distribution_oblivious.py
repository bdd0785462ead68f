"""One compiled program, every distribution: the network is oblivious.

Times the SAME jitted sort (fixed chain lengths, zero per-distribution
recompiles) on uniform/zipf/sorted/reverse/few/constant keys at 2^25 and
writes a CSV row per distribution. This is the honest form of the
skew-robustness demonstration: identical binary, input-independent control
flow, so any timing difference is noise.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from vulkan_radix_sort_tpu.config import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
from vulkan_radix_sort_tpu.ops import bitonic
from vulkan_radix_sort_tpu.utils import datagen
from vulkan_radix_sort_tpu.utils.timing import marginal_time

n = 1 << 25
fn = lambda a: bitonic.sort_u32(a, chunk=1 << 16)
rows = []
for dist in datagen.DISTRIBUTIONS:
    keys = datagen.generate_keys(n, seed=0, distribution=dist)
    kj = jnp.asarray(keys)
    got = np.asarray(fn(kj))
    assert np.array_equal(got, np.sort(keys)), f"{dist} verify FAILED"
    t = marginal_time(fn, kj, k1=2, k2=10, iters=5)
    gs = n / t / 1e9
    rows.append((dist, t * 1e3, gs))
    print(f"{dist:8s}: {t*1e3:7.2f} ms  {gs:.3f} GItems/s", flush=True)

out = sys.argv[1] if len(sys.argv) > 1 else None
if out:
    with open(out, "w") as f:
        f.write("# network engine, n=2^25 keys, one compiled program\n")
        f.write("distribution,gpu_ms,gpu_gitems_s\n")
        for d, ms, gs in rows:
            f.write(f"{d},{ms:.6f},{gs:.6f}\n")
    print(f"wrote {out}")
