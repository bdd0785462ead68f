"""Benchmark CLI (reference bench/bench.cc:117-147 analog).

Usage:
    python -m vulkan_radix_sort_tpu.bench <backend> [-o results.csv]
        [--steps K] [--iters I] [--no-verify] [--distribution D]

Backends: network (bitonic CE engine), radix (Pallas LSD), xla (lax.sort),
cpu (NumPy oracle). The reference's `--validation` flag maps to Pallas
interpret mode via --interpret.
"""

import argparse
import sys

from ..config import SortConfig
from ..utils import datagen
from .harness import BACKENDS, DEFAULT_STEPS, run_sweep, write_csv


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vulkan_radix_sort_tpu.bench")
    p.add_argument("backend", choices=BACKENDS)
    p.add_argument("-o", "--output", default=None, help="CSV output path")
    p.add_argument("--steps", type=int, default=DEFAULT_STEPS,
                   help="sweep step count (reference uses 128)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--no-verify", action="store_true",
                   help="skip the oracle-diff gate (reference --no-verify)")
    p.add_argument("--distribution", default="uniform",
                   choices=list(datagen.DISTRIBUTIONS))
    p.add_argument("--interpret", action="store_true",
                   help="run Pallas kernels interpreted (validation mode)")
    p.add_argument("--indirect", action="store_true",
                   help="route sorts through the dynamic-count path "
                        "(reference indirect API, vulkan_benchmark.cc:386)")
    p.add_argument("--nonstable", action="store_true",
                   help="also sweep the stable=False key-value path "
                        "(reported as sort type 'kvns')")
    p.add_argument("--stages", action="store_true",
                   help="also print the per-stage split at the largest N "
                        "(network backend; analog of the reference's "
                        "upsweep/spine/downsweep %% lines, bench.cc:178-186)")
    p.add_argument("--adaptive", action="store_true",
                   help="enable the adaptive fast paths (sorted / reverse / "
                        "constant inputs skip the engine; one extra "
                        "detection pass on everything else)")
    args = p.parse_args(argv)

    from ..config import enable_compilation_cache

    enable_compilation_cache()
    cfg = SortConfig(backend=args.backend, interpret=args.interpret,
                     adaptive=args.adaptive)

    def progress(r):
        print(
            f"[{r.backend}] n={r.n:>9} {r.sort:<4} "
            f"{r.gpu_ms:9.3f} ms  {r.gpu_gitems_s:7.3f} GItems/s",
            flush=True,
        )

    results = run_sweep(
        args.backend, steps=args.steps, iters=args.iters,
        no_verify=args.no_verify, distribution=args.distribution,
        config=cfg, indirect=args.indirect, nonstable=args.nonstable,
        progress=progress,
    )
    if args.output:
        write_csv(args.output, results)
        print(f"wrote {args.output}")

    if args.stages:
        print_stage_split(args.backend, steps=args.steps, iters=args.iters,
                          interpret=args.interpret)
    return 0


def print_stage_split(backend: str, *, steps: int, iters: int,
                      interpret: bool = False, n: int | None = None) -> dict:
    """Per-stage split of one keys sort at the largest sweep N.

    The network's stages are chunk (VMEM chunk sort), cross (inter-block
    merge distances) and local (per-block cleanup) — the analog of the
    reference's per-pass upsweep/spine/downsweep timestamp decode
    (vulkan_benchmark.cc:318-337, printed at bench.cc:178-186).
    """
    if backend not in ("network", "auto"):
        print(f"[{backend}] stage split only available for the network backend")
        return {}
    import jax.numpy as jnp

    from ..ops import bitonic
    from .harness import sweep_sizes

    if n is None:
        n = sweep_sizes(steps=steps)[-1]
    keys = datagen.generate_keys(n, seed=0)
    st = bitonic.stage_times(jnp.asarray(keys), iters=iters,
                             interpret=interpret)
    tot = st["chunk"] + st["cross"] + st["local"]
    parts = "  ".join(
        f"{name} {st[name] * 1e3:8.3f} ms ({st[name] / tot * 100:4.1f}%)"
        for name in ("chunk", "cross", "local")
    )
    print(f"[network] stages at n={n}: {parts}  "
          f"[{st['rounds']} merge rounds, sum {tot * 1e3:.3f} ms]")
    # exact per-dispatch (pallas_call) times — the 15-timestamp analog
    for name, t in st.get("kernels", []):
        print(f"[network]   {name:<14} {t * 1e3:8.3f} ms")
    return st


if __name__ == "__main__":
    sys.exit(main())
