"""Probe alternative lowerings of the batched 128x128 tile transpose.

The engine's T-layout experiment needs `(R,128) -> tile-transposed` at
~1 ps/elem to pay off; the naive batched reshape+transpose measured ~12
ps/elem on-chip while a single 128x128 2D transpose measured 0.72. This
probe prices the candidates inside one sequential-grid Pallas kernel over
a 2^25 array:

  a) batched: x.reshape(G,128,128) -> jnp.transpose(0,2,1) (the current
     _tile_T)
  b) unrolled per-tile 2D transposes over static slices
  c) b, but writing through an explicit VMEM scratch slot per tile
  d) roll-free reference: plain copy (floor for the block pipeline)

Run on chip: python tools/probes/probe_transpose.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vulkan_radix_sort_tpu.utils.timing import marginal_time
from vulkan_radix_sort_tpu.config import enable_compilation_cache

N = 1 << 25
ROWS = N // 128
BLOCK = 1024  # rows per grid step (8 tiles)


def kernel_batched(x_ref, o_ref):
    x = x_ref[:]
    R = x.shape[0]
    o_ref[:] = jnp.transpose(
        x.reshape(R // 128, 128, 128), (0, 2, 1)
    ).reshape(R, 128)


def kernel_unrolled(x_ref, o_ref):
    for t in range(BLOCK // 128):
        tile = x_ref[t * 128:(t + 1) * 128, :]
        o_ref[t * 128:(t + 1) * 128, :] = tile.T


def kernel_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1  # forces a pass, defeats aliasing elision


def run(name, kernel, reps=3):
    spec = pl.BlockSpec((BLOCK, 128), lambda p: (p, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda a: pl.pallas_call(
        kernel,
        grid=(ROWS // BLOCK,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a))
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**31, size=(ROWS, 128))
        .astype(np.int32)
    )
    t = float(np.median([
        marginal_time(f, x, k1=2, k2=10, iters=4) for _ in range(reps)
    ]))
    print(json.dumps({
        "variant": name, "ms": round(t * 1e3, 3),
        "ps_per_elem": round(t / N * 1e12, 3),
    }), flush=True)
    return t


def main():
    enable_compilation_cache()
    print("devices:", jax.devices())
    run("copy+1 (floor)", kernel_copy)
    run("batched reshape/transpose", kernel_batched)
    run("unrolled static tiles", kernel_unrolled)


if __name__ == "__main__":
    main()
