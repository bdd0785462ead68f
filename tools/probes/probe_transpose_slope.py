"""Marginal in-kernel cost of one batched 128x128 tile transpose.

The earlier probe (probe_transpose.py) ran one transpose per HBM pass and
came out at the copy floor (12.4 ps/elem) — under Mosaic's DMA/compute
pipelining that only bounds the transpose's compute cost from above by the
HBM time, it does not measure it. The engine's T-layout transposes happen
MID-KERNEL on VMEM-resident data inside compute-bound kernels, so what
matters is the pure compute slope.

Method: kernels chain k in-VMEM transposes with a cheap +1 between each
(defeats T(T(x)) = x cancellation); the slope (t(k2) - t(k1)) / (k2 - k1)
is the marginal cost of one transpose + one add. The add's own slope is
measured separately and subtracted. Variants:

  a) batched: x.reshape(G,128,128) -> transpose(0,2,1)  (today's _tile_T)
  b) unrolled: per-tile 2D transposes over static 128-row slices

Block geometry matches the engine at chunk=2^16: 512 rows x 128 lanes.

Run on chip: python tools/probes/probe_transpose_slope.py
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

from vulkan_radix_sort_tpu.config import enable_compilation_cache
from vulkan_radix_sort_tpu.utils.timing import marginal_time

N = 1 << 25
ROWS = N // 128
BLOCK = 512  # rows per grid step — the engine's chunk=2^16 block
REPS = 3


def t_batched(x):
    R = x.shape[0]
    return jnp.transpose(
        x.reshape(R // 128, 128, 128), (0, 2, 1)
    ).reshape(R, 128)


def t_unrolled(x):
    R = x.shape[0]
    parts = [x[t * 128:(t + 1) * 128, :].T for t in range(R // 128)]
    return jnp.concatenate(parts, axis=0)


def make_kernel(tfn, k):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(k):
            if tfn is not None:
                x = tfn(x)
            x = x + 1
        o_ref[:] = x

    return kernel


def run_chain(tfn, k):
    spec = pl.BlockSpec((BLOCK, 128), lambda p: (p, 0),
                        memory_space=pltpu.VMEM)
    f = jax.jit(lambda a: pl.pallas_call(
        make_kernel(tfn, k),
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
    return float(np.median([
        marginal_time(f, x, k1=2, k2=10, iters=4) for _ in range(REPS)
    ]))


def slope(tfn, k1=2, k2=10):
    ta, tb = run_chain(tfn, k1), run_chain(tfn, k2)
    return (tb - ta) / (k2 - k1)


def main():
    enable_compilation_cache()
    print("devices:", jax.devices())
    add = slope(None)
    print(json.dumps({"variant": "add-only slope",
                      "ps_per_elem": round(add / N * 1e12, 3)}), flush=True)
    for name, tfn in (("batched", t_batched), ("unrolled", t_unrolled)):
        s = slope(tfn) - add
        print(json.dumps({
            "variant": f"{name} transpose slope",
            "ms_per_transpose": round(s * 1e3, 4),
            "ps_per_elem": round(s / N * 1e12, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
