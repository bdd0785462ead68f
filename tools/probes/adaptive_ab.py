"""Chip A/B for the adaptive fast paths (SortConfig.adaptive).

Measures, at n = 2^25 on the real chip (all outputs bitwise-verified
before timing):
  - keys on sorted / reverse / constant inputs with adaptive=True
    (expected: memcpy-speed, BASELINE's degenerate configs)
  - keys + stable kv on uniform input, adaptive=True vs False
    (the detection-pass overhead on the headline path)
  - stable kv on sorted-with-duplicates input, adaptive=True

Run on chip: python tools/probes/adaptive_ab.py [log2n]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import SortConfig, enable_compilation_cache
    from vulkan_radix_sort_tpu.models.sorter import Sorter
    from vulkan_radix_sort_tpu.utils.datagen import generate_keys, generate_values
    from vulkan_radix_sort_tpu.utils.timing import median_marginal_time

    enable_compilation_cache()
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)

    t3 = median_marginal_time

    adaptive = Sorter(n, config=SortConfig(adaptive=True))
    plain = Sorter(n, config=SortConfig(adaptive=False))

    # The chained marginal-timing loop feeds each sort's own output back
    # in, so from iteration 2 the input IS sorted and the adaptive sorter
    # takes the fast path — chaining the raw sort mis-measures the
    # detection overhead on unsorted inputs (first queue5e run did this).
    # For the uniform rows, both sorters are therefore timed through the
    # SAME de-sorting perturbation (one multiply-xor VPU pass that makes
    # every chained iteration's input pseudo-random); the adaptive
    # overhead on unsorted data is the A/B delta under that wrapper.
    mix = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)) ^ jnp.uint32(0x9E3779B9)

    def perturbed(sort_fn):
        return lambda a: sort_fn(a ^ mix)

    for dist in ("sorted", "reverse", "constant", "uniform"):
        keys = generate_keys(n, seed=3, distribution=dist)
        kj = jnp.asarray(keys)
        expect = np.sort(keys)
        assert np.array_equal(np.asarray(adaptive.sort(kj)), expect), dist
        if dist == "uniform":
            row = {
                "path": "keys_uniform_perturbed",
                "adaptive_ms": round(t3(perturbed(adaptive.sort), kj) * 1e3, 3),
                "plain_ms": round(t3(perturbed(plain.sort), kj) * 1e3, 3),
            }
        else:
            # degenerate inputs: chaining is representative (sorted stays
            # sorted; the output of the reverse/constant first pass is
            # sorted, the same detect+copy cost class)
            row = {"path": f"keys_{dist}",
                   "adaptive_ms": round(t3(adaptive.sort, kj) * 1e3, 3)}
            if dist == "sorted":
                assert np.array_equal(np.asarray(plain.sort(kj)), expect)
                row["plain_ms"] = round(t3(plain.sort, kj) * 1e3, 3)
        print(json.dumps(row), flush=True)

    vals = generate_values(n, seed=5)
    vj = jnp.asarray(vals)
    for dist in ("sorted", "uniform"):
        keys = generate_keys(n, seed=4, distribution=dist)
        if dist == "sorted":
            keys = np.sort(keys >> np.uint32(14))  # heavy duplicates
        kj = jnp.asarray(keys)
        order = np.argsort(keys, kind="stable")
        gk, gv = adaptive.sort_key_value(kj, vj)
        assert np.array_equal(np.asarray(gk), keys[order]), dist
        assert np.array_equal(np.asarray(gv), vals[order]), dist
        if dist == "uniform":
            # same chaining hazard as keys: perturb the keys (values can
            # chain as-is — their order never feeds detection)
            def pkv(sort_fn):
                return lambda a, b: sort_fn(a ^ mix, b)

            row = {
                "path": "kv_uniform_perturbed",
                "adaptive_ms": round(
                    t3(pkv(adaptive.sort_key_value), kj, vj) * 1e3, 3),
                "plain_ms": round(
                    t3(pkv(plain.sort_key_value), kj, vj) * 1e3, 3),
            }
        else:
            row = {
                "path": f"kv_{dist}",
                "adaptive_ms": round(
                    t3(adaptive.sort_key_value, kj, vj) * 1e3, 3),
            }
        print(json.dumps(row), flush=True)
    print("adaptive paths verified")


if __name__ == "__main__":
    main()
