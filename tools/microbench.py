"""Microbenchmarks of candidate TPU primitives for the sort engine.

Calibrates the design constants SURVEY.md §7 needs: VPU elementwise-op
throughput (compare-exchange chains), MXU one-hot rank/permute matmul cost,
pltpu.roll throughput, and streamed HBM copy bandwidth through a sequential
Pallas grid. The harness chains K kernel invocations inside one jitted
fori_loop and reports the marginal cost between two K values, so the large
fixed dispatch+sync latency of this environment (~63 ms) cancels out.

Run on the real chip:  python tools/microbench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _sync(out):
    leaves = jax.tree.leaves(out)
    for leaf in leaves:
        jax.block_until_ready(leaf)
    if leaves:
        # pull one element to host: the axon tunnel acks block_until_ready
        # before the device is actually done
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])


def _timeit(fn, *args, iters=5):
    _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append((time.perf_counter() - t0))
    return float(np.median(ts))


def marginal(step_fn, x, k1=4, k2=20, iters=5):
    """Seconds per step_fn application, dispatch overhead cancelled.

    step_fn must map x -> same shape/dtype as x.
    """

    def looped(k):
        @jax.jit
        def f(a):
            return jax.lax.fori_loop(0, k, lambda _, c: step_fn(c), a)

        return f

    t1 = _timeit(looped(k1), x, iters=iters)
    t2 = _timeit(looped(k2), x, iters=iters)
    return (t2 - t1) / (k2 - k1)


def seq_kernel(kern, rb, rows, dtype=jnp.int32, n_in=1):
    spec = pl.BlockSpec((rb, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)

    def call(x):
        return pl.pallas_call(
            kern,
            grid=(rows // rb,),
            in_specs=[spec] * n_in,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), dtype),
        )(*((x,) * n_in))

    return call


def bench_memcpy(n=1 << 25, rb=512):
    rows = n // LANES
    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    t = marginal(seq_kernel(kern, rb, rows), x)
    print(f"stream copy+1 rb={rb}: {t*1e3:8.3f} ms  {2*n*4/t/1e9:7.1f} GB/s")


def bench_ce_chain(n=1 << 24, stages=32, rb=512):
    rows = n // LANES

    def kern(x_ref, o_ref):
        x = x_ref[:]
        m = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) & 1) == 0
        for s in range(stages):
            d = 1 + (s % 7)
            r = pltpu.roll(x, d, axis=1)
            lo = jnp.minimum(x, r)
            hi = jnp.maximum(x, r)
            x = jnp.where(m, lo, hi)
        o_ref[:] = x

    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)
    t = marginal(seq_kernel(kern, rb, rows), x)
    per = t / stages / n
    print(
        f"CE stage (roll+min+max+sel): {per*n*1e3:8.4f} ms/stage/{n>>20}M "
        f"= {per*1e12:6.2f} ps/elem = {per*0.94e9*1024:6.2f} eops@1024/cyc-units"
    )


def bench_roll(n=1 << 24, steps=32, axis=1, rb=512):
    rows = n // LANES

    def kern(x_ref, o_ref):
        x = x_ref[:]
        for s in range(steps):
            x = pltpu.roll(x, 1 + (s % 5), axis=axis)
        o_ref[:] = x

    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)
    t = marginal(seq_kernel(kern, rb, rows), x)
    print(f"roll axis={axis}: {t/steps/n*1e12:6.2f} ps/elem")


def bench_varroll(n=1 << 24, rb=256):
    """per-row variable lane rotation via 7-step log-shift."""
    rows = n // LANES

    def kern(x_ref, o_ref):
        x = x_ref[:]
        sh = x & 127
        for k in range(7):
            bit = (sh >> k) & 1
            r = pltpu.roll(x, 1 << k, axis=1)
            x = jnp.where(bit > 0, r, x)
        o_ref[:] = x

    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)
    t = marginal(seq_kernel(kern, rb, rows), x)
    print(f"varroll 7-step: {t/n*1e12:6.2f} ps/elem")


def _subsort_kern_factory(rb, dt, radix=16, do_permute=True):
    acc_t = jnp.int32 if dt == jnp.int8 else jnp.float32

    def kern(x_ref, o_ref):
        k = x_ref[:]
        d = (k >> 4) & (radix - 1)
        d3 = jnp.broadcast_to(d[None], (radix, rb, LANES)).reshape(
            radix * rb, LANES)
        bucket = jax.lax.broadcasted_iota(
            jnp.int32, (radix * rb, LANES), 0) // rb
        oh = (d3 == bucket).astype(dt)
        upper = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        ).astype(dt)
        csum = jax.lax.dot_general(
            oh, upper, (((1,), (0,)), ((), ())), preferred_element_type=acc_t
        ).astype(jnp.float32)
        tails = csum[:, LANES - 1:]
        bi = tails
        s = 1
        while s < radix * rb:
            sh = pltpu.roll(bi, s, axis=0)
            rowsid = jax.lax.broadcasted_iota(jnp.int32, bi.shape, 0)
            bi = bi + jnp.where(rowsid >= s, sh, jnp.zeros_like(bi))
            s *= 2
        base = bi - tails
        contrib = oh.astype(jnp.float32) * (csum + (base - 1.0))
        dst = contrib.reshape(radix, rb, LANES).sum(axis=0).astype(jnp.int32)
        if not do_permute:
            o_ref[:] = dst
            return
        dstrow = dst // LANES
        dstlane = dst % LANES
        rowoh = (dstrow[None] == jax.lax.broadcasted_iota(
            jnp.int32, (rb, rb, LANES), 0)).astype(dt)
        laneoh = (dstlane[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (rb, LANES, LANES), 2)).astype(dt)
        rhs = laneoh.reshape(rb * LANES, LANES)
        acc = jnp.zeros((rb, LANES), jnp.int32)
        for p in range(4):
            byte = ((k >> (8 * p)) & 255).astype(dt)
            lhs = (rowoh * byte[None]).reshape(rb, rb * LANES)
            outp = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            acc = acc | (outp.astype(jnp.int32) << (8 * p))
        o_ref[:] = acc

    return kern


def bench_subsort(n=1 << 23, rb=16, dt=jnp.bfloat16, do_permute=True):
    rows = n // LANES
    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)
    kern = _subsort_kern_factory(rb, dt, do_permute=do_permute)
    t = marginal(seq_kernel(kern, rb, rows), x, k1=2, k2=8)
    what = "subsort" if do_permute else "rank-only"
    print(f"4-bit {what} {dt.__name__} rb={rb}: {t/n*1e12:7.2f} ps/key "
          f"-> {n/t/1e9:6.2f} Gkey/s")


def bench_lane_gather(n=1 << 24, rb=512, reps=16):
    """Dynamic lane gather (take_along_axis axis=1) — lowers in Mosaic as of
    jax 0.9; measured 3.65 ps/elem (see docs/RADIX_INVESTIGATION.md)."""
    import numpy as np

    rows = n // LANES
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, LANES, size=(rows, LANES)),
        jnp.int32,
    )
    spec = pl.BlockSpec((rb, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)

    def kern(x_ref, i_ref, o_ref):
        x = x_ref[...]
        i = i_ref[...]
        for _ in range(reps):
            x = jnp.take_along_axis(x, i, axis=1) + 1
        o_ref[...] = x

    def call(x):
        return pl.pallas_call(
            kern, grid=(rows // rb,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        )(x, idx)

    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)
    t = marginal(call, x, k1=8, k2=72)
    print(f"lane gather x{reps} rb={rb}: {t/n/reps*1e12:7.2f} ps/elem/gather")


def bench_transpose(n=1 << 24, rb=512, reps=16):
    """128x128 i32 transpose in-kernel — 0.72 ps/elem measured."""
    rows = n // LANES
    spec = pl.BlockSpec((rb, LANES), lambda p: (p, 0), memory_space=pltpu.VMEM)

    def kern(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(reps):
            parts = [
                x[i * 128:(i + 1) * 128, :].T for i in range(x.shape[0] // 128)
            ]
            x = jnp.concatenate(parts, axis=0) + 1
        o_ref[...] = x

    def call(x):
        return pl.pallas_call(
            kern, grid=(rows // rb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        )(x)

    x = jnp.arange(n, dtype=jnp.int32).reshape(rows, LANES)
    t = marginal(call, x, k1=8, k2=72)
    print(f"transpose 128x128 x{reps}: {t/n/reps*1e12:7.2f} ps/elem/transpose")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    bench_memcpy(rb=512)
    bench_memcpy(rb=1024)
    bench_ce_chain()
    bench_roll(axis=1)
    bench_roll(axis=0)
    bench_varroll()
    bench_subsort(rb=16, dt=jnp.bfloat16, do_permute=False)
    bench_subsort(rb=16, dt=jnp.bfloat16)
    bench_subsort(rb=16, dt=jnp.int8)
    bench_subsort(rb=32, dt=jnp.bfloat16)
    bench_subsort(rb=8, dt=jnp.bfloat16)
    try:
        bench_lane_gather()
        bench_transpose()
    except Exception as e:  # older Mosaic without gather lowering
        print(f"gather/transpose probes unavailable: {e}")
