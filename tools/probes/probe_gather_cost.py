"""Measure per-element cost of gather / transpose / int8-matmul primitives.

Method: pallas kernel over a large array; kernel body applies the primitive
G times in a dependency chain. marginal cost = (T(G2)-T(G1))/(G2-G1).
"""
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys
sys.path.insert(0, "/root/repo")
from vulkan_radix_sort_tpu.utils.timing import marginal_time

N = 1 << 23  # 8M elements
R, C = 512, 128  # block = 64K elems
NBLK = N // (R * C)

def run_chain(name, body_fn, g1, g2, extra_in=None, per="elem"):
    """body_fn(x, aux, G) -> x ; measure marginal per-G cost."""
    def make(G):
        def kern(x_ref, aux_ref, o_ref):
            o_ref[...] = body_fn(x_ref[...], aux_ref[...], G)
        @jax.jit
        def f(x, aux):
            y = pl.pallas_call(
                kern,
                grid=(NBLK,),
                in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0)),
                          pl.BlockSpec((R, C), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((R, C), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((NBLK * R, C), jnp.int32),
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
            )(x, aux)
            return y, aux
        return f
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**31, size=(NBLK * R, C)).astype(np.int32))
    aux = extra_in if extra_in is not None else jnp.asarray(
        rng.integers(0, C, size=(NBLK * R, C)).astype(np.int32))
    f1, f2 = make(g1), make(g2)
    t1 = marginal_time(lambda a, b: f1(a, b), x, aux)
    t2 = marginal_time(lambda a, b: f2(a, b), x, aux)
    per_op = (t2 - t1) / (g2 - g1)
    print(f"{name}: {per_op / N * 1e12:.2f} ps/elem/op   (T{g1}={t1*1e3:.3f}ms T{g2}={t2*1e3:.3f}ms)")

# 1. baseline: min/max pair (the CE building block)
def body_minmax(x, aux, G):
    for _ in range(G):
        x = jnp.minimum(x, aux) + jnp.maximum(x, aux)
    return x
run_chain("minmax+add (2ops)", body_minmax, 4, 12)

# 2. lane gather (window 128)
def body_gather(x, idx, G):
    for _ in range(G):
        x = jnp.take_along_axis(x, idx, axis=1) + 1
    return x
run_chain("lane_gather_w128", body_gather, 4, 12)

# 3. transpose 128x128 (reshape R,C -> chunks): use (128,128) sub-tiles
def body_transpose(x, aux, G):
    for _ in range(G):
        parts = [x[i*128:(i+1)*128, :].T for i in range(R // 128)]
        x = jnp.concatenate(parts, axis=0) + 1
    return x
run_chain("transpose_128x128", body_transpose, 2, 6)

# 4. roll lane axis (reference point: measured 2.34 ps)
def body_roll(x, aux, G):
    for _ in range(G):
        x = pltpu.roll(x, 17, axis=1) + 1
    return x
run_chain("lane_roll", body_roll, 4, 12)

print("done")
