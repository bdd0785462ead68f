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
    args = p.parse_args(argv)

    from ..config import enable_compilation_cache

    enable_compilation_cache()
    cfg = SortConfig(backend=args.backend, interpret=args.interpret)

    def progress(r):
        print(
            f"[{r.backend}] n={r.n:>9} {r.sort:<4} "
            f"{r.gpu_ms:9.3f} ms  {r.gpu_gitems_s:7.3f} GItems/s",
            flush=True,
        )

    results = run_sweep(
        args.backend, steps=args.steps, iters=args.iters,
        no_verify=args.no_verify, distribution=args.distribution,
        config=cfg, indirect=args.indirect, progress=progress,
    )
    if args.output:
        write_csv(args.output, results)
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
