"""XLA-level costs relevant to KV: HBM-scale gather, argsort, sort_key_val."""
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from vulkan_radix_sort_tpu.utils.timing import marginal_time

N = 1 << 25
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(0, 2**31, size=N).astype(np.int32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))

# 1. big gather: values[perm]
def take_fn(v, p):
    out = jnp.take(v, p)
    return out, p
t = marginal_time(take_fn, vals, perm, k1=1, k2=3)
print(f"jnp.take 2^25: {t*1e3:.2f} ms  ({N*4/t/1e9:.1f} GB/s out)")

# 2. XLA sort_key_val (for scale reference)
keys = jnp.asarray(rng.integers(0, 2**31, size=N).astype(np.int32))
def skv(k, v):
    k2, v2 = jax.lax.sort_key_val(k, v)
    return k2, v2
t2 = marginal_time(skv, keys, vals, k1=1, k2=2)
print(f"lax.sort_key_val 2^25: {t2*1e3:.2f} ms")
