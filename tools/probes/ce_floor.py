"""CE-stage floor artifact: measure, on-chip, the cost of a pure chain of
compare-exchange stages over a 2^25 array — the lower bound that the
network engine's 325-stage pipeline is judged against.

docs/PERFORMANCE.md derives the engine's ceiling as 325 stage-passes x
~75 us/stage; this probe MEASURES that floor instead of extrapolating it:
it runs a Pallas kernel that is nothing but S back-to-back CE stages (the
exact roll+min/max+select structure of ops/bitonic._ce, same VMEM blocking,
in/out aliased) and reports ps/elem/stage for

  - a pure lane-axis chain (distance < 128),
  - a pure sublane-axis chain (distance >= 128),
  - the engine's actual lane/sublane mix (154 lane / 171 sublane of 325),

plus the implied floor for a full 2^25 sort: floor_ms = 325 * N * mix_cost.
Run on the real chip: python tools/probes/ce_floor.py
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vulkan_radix_sort_tpu.ops import bitonic
from vulkan_radix_sort_tpu.utils.timing import marginal_time
from vulkan_radix_sort_tpu.config import enable_compilation_cache

N = 1 << 25
BLOCK_ROWS = 1024  # (1024, 128) VMEM blocks, same order as the engine
LANES = 128


def _chain_body(dists, refs):
    (x_ref, o_ref) = refs
    x = x_ref[:]
    shape = x.shape
    for d in dists:
        if d < LANES:
            axis, sh = 1, d
        else:
            axis, sh = 0, d // LANES
        up = (jax.lax.broadcasted_iota(jnp.int32, shape, axis) & sh) == 0
        (x,) = bitonic._ce([x], 1, axis, sh, up)
    o_ref[:] = x


def chain_fn(dists):
    body = functools.partial(_chain_body, dists)
    rows = N // LANES

    @jax.jit
    def f(a):
        spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda p: (p, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            lambda *refs: body(refs),
            grid=(rows // BLOCK_ROWS,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=bitonic.VMEM_LIMIT,
            ),
        )(a)

    return f


def measure(name, dists, x, reps=3):
    f = chain_fn(tuple(dists))
    ts = [marginal_time(f, x, k1=2, k2=8, iters=4) for _ in range(reps)]
    t = float(np.median(ts))
    per_stage = t / len(dists)
    ps_elem = per_stage / N * 1e12
    print(json.dumps({
        "chain": name,
        "stages": len(dists),
        "s_per_stage": per_stage,
        "ps_per_elem_per_stage": round(ps_elem, 3),
    }))
    return per_stage


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 2**31, size=(N // LANES, LANES)).astype(np.int32)
    )

    # 24-stage chains keep compile time sane while amortizing block loads
    lane_d = [1, 2, 4, 8, 16, 32, 64, 32] * 3
    subl_d = [128 * d for d in (1, 2, 4, 8, 16, 32, 64, 128)] * 3
    # engine mix: 154 lane / 171 sublane of 325 -> 11 lane + 13 sublane
    mix_d = ([1, 2, 4, 8, 16, 32, 64, 1, 2, 4, 8]
             + [128 * d for d in (1, 2, 4, 8, 16, 32, 64, 128, 1, 2, 4, 8, 16)])

    t_lane = measure("lane", lane_d, x)
    t_subl = measure("sublane", subl_d, x)
    t_mix = measure("engine-mix", mix_d, x)

    floor_ms = 325 * t_mix * 1e3
    print(json.dumps({
        "floor_325_stages_ms": round(floor_ms, 2),
        "floor_gitems_s": round(N / (325 * t_mix) / 1e9, 3),
        "note": "pure-chain floor at the engine's lane/sublane mix; the "
                "shipped pipeline adds merge-structure masks/negation and "
                "kernel-split HBM passes on top",
    }))


if __name__ == "__main__":
    main()
