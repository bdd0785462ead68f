"""Price alternative compare-exchange formulations for the keys path.

The shipped `_ce` (ops/bitonic.py) computes, per stage,

    pm = roll(x, -sh); mn = min(x, pm); mx = max(x, pm)
    out = where(up, mn, roll(mx, sh))          # variant A: dependent roll

The final roll depends on mx, serializing the stage's tail. The identity
max(x[i], x[i-sh]) == max(x, roll(x, +sh))[i] gives

    out = where(up, min(x, roll(x, -sh)), max(x, roll(x, +sh)))  # variant B

-- same op count, but both rolls are independent of the min/max, so the
VPU (and Mosaic's scheduler) can overlap them. Whether that matters at
the engine's block shapes (512x128, plenty of cross-row ILP already) is
a chip question; this probe measures chained stage runs of both variants
on the lane and sublane axes at the production geometry.

If B wins by >5% the engine's keys stage is worth rewriting (the
multi-array carry keeps A: B would need the i1 decision vector rolled,
which Mosaic lowers poorly — see docs/RADIX_INVESTIGATION.md).

Run on chip: python tools/probes/ce_variants.py
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

ROWS, LANES = 512, 128  # production chunk geometry (2^16 / 128)
STAGES = 48             # per-kernel stage chain (within compile budget)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _stage_a(x, sh, axis):
    pm = pltpu.roll(x, (-sh) % x.shape[axis], axis=axis)
    mn = jnp.minimum(x, pm)
    mx = jnp.maximum(x, pm)
    up = (_iota(x.shape, axis) & sh) == 0
    return jnp.where(up, mn, pltpu.roll(mx, sh % x.shape[axis], axis=axis))


def _stage_b(x, sh, axis):
    lo = jnp.minimum(x, pltpu.roll(x, (-sh) % x.shape[axis], axis=axis))
    hi = jnp.maximum(x, pltpu.roll(x, sh % x.shape[axis], axis=axis))
    up = (_iota(x.shape, axis) & sh) == 0
    return jnp.where(up, lo, hi)


def _chain_kernel(stage, axis, x_ref, o_ref):
    x = x_ref[:]
    sh = 1
    for _ in range(STAGES):
        x = stage(x, sh, axis)
        # cycle distances 1,2,4,...,axis_size/2 like a real merge run
        sh = sh * 2
        if sh >= x.shape[axis]:
            sh = 1
    o_ref[:] = x


def _run(stage, axis, nblocks, interpret=False):
    spec = pl.BlockSpec((ROWS, LANES), lambda p: (p, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_chain_kernel, stage, axis),
        grid=(nblocks,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * ROWS, LANES), jnp.int32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )


def main():
    enable_compilation_cache()
    interpret = jax.devices()[0].platform != "tpu"
    print("devices:", jax.devices(), "interpret:", interpret)
    nblocks = 64  # 64 * 512 * 128 = 2^22 elements per pass
    n = nblocks * ROWS * LANES
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 2**31, size=(nblocks * ROWS, LANES), dtype=np.int64)
        .astype(np.int32)
    )
    out = {}
    for axis, name in ((1, "lane"), (0, "sublane")):
        for stage, label in ((_stage_a, "A_dep_roll"), (_stage_b, "B_indep")):
            f = jax.jit(lambda a, s=stage, ax=axis: _run(s, ax, nblocks,
                                                         interpret)(a))
            f(x).block_until_ready()
            t = marginal_time(f, x, k1=2, k2=8, iters=4)
            ps = t / (n * STAGES) * 1e12
            out[f"{name}_{label}_ps_per_elem_stage"] = round(ps, 3)
            print(json.dumps({name: label, "ps/elem/stage": round(ps, 3)}),
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
