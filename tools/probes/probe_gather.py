"""Probe Mosaic support for dynamic gathers inside Pallas TPU kernels."""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def attempt(name, fn):
    try:
        r = fn()
        print(f"{name}: OK {r}")
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name}: FAIL {msg}")

rng = np.random.default_rng(0)

# 1. lane-axis gather (axis=-1) per-row indices
def lane_gather():
    def k(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)
    x = np.arange(8*128, dtype=np.int32).reshape(8,128)
    idx = rng.integers(0, 128, size=(8,128)).astype(np.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x, idx)
    return bool(np.array_equal(np.asarray(out), np.take_along_axis(x, idx, axis=1)))
attempt("lane_gather_8x128", lane_gather)

# 2. bigger lane gather (256,128)
def lane_gather_big():
    def k(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)
    x = rng.integers(0, 2**31, size=(256,128)).astype(np.int32)
    idx = rng.integers(0, 128, size=(256,128)).astype(np.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,128), jnp.int32))(x, idx)
    return bool(np.array_equal(np.asarray(out), np.take_along_axis(x, idx, axis=1)))
attempt("lane_gather_256x128", lane_gather_big)

# 3. sublane-axis gather (axis=0)
def sublane_gather():
    def k(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)
    x = np.arange(8*128, dtype=np.int32).reshape(8,128)
    idx = rng.integers(0, 8, size=(8,128)).astype(np.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x, idx)
    return bool(np.array_equal(np.asarray(out), np.take_along_axis(x, idx, axis=0)))
attempt("sublane_gather_8x128", sublane_gather)

# 3b. sublane-axis gather taller (64,128)
def sublane_gather_tall():
    def k(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)
    x = np.arange(64*128, dtype=np.int32).reshape(64,128)
    idx = rng.integers(0, 64, size=(64,128)).astype(np.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64,128), jnp.int32))(x, idx)
    return bool(np.array_equal(np.asarray(out), np.take_along_axis(x, idx, axis=0)))
attempt("sublane_gather_64x128", sublane_gather_tall)

# 4. dynamic vector scatter: o_ref[idx] = x ? via .at set -> one_hot free alt
def scatter_probe():
    def k(x_ref, idx_ref, o_ref):
        x = x_ref[...]
        idx = idx_ref[...]
        o_ref[...] = jnp.zeros_like(x).at[0, idx[0]].set(x[0])
    x = np.arange(8*128, dtype=np.int32).reshape(8,128)
    idx = rng.permutation(128).astype(np.int32).reshape(1,128).repeat(8,0)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x, idx)
    return "ran"
attempt("lane_scatter_at_set", scatter_probe)

# 5. transpose in-kernel (needed for 2-step permutation)
def transpose_probe():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].T
    x = rng.integers(0, 2**31, size=(128,128)).astype(np.int32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128,128), jnp.int32))(x)
    return bool(np.array_equal(np.asarray(out), x.T))
attempt("transpose_128x128_i32", transpose_probe)
