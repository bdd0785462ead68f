"""CLI for the distributed phase-fraction / weak-scaling report.

Produces the JSON artifact the scaling targets are judged against
(bench_results/scaling_<platform>.json). On this environment the CPU mesh
is the multi-chip proxy (forced host devices); on a real pod the same
command measures true ICI fractions.

Usage:
    python tools/scaling_report.py --m 65536 --devices 1,2,4,8 [--cpu]
    python tools/scaling_report.py --phase-n 1048576 --mesh 8 [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=1 << 16,
                   help="elements per device (weak scaling)")
    p.add_argument("--devices", default=None,
                   help="comma list of mesh sizes (default: 1,2,4,.. up to available)")
    p.add_argument("--phase-n", type=int, default=None,
                   help="also run a single phase_report at this global n")
    p.add_argument("--mesh", type=int, default=None,
                   help="mesh size for --phase-n (default: all devices)")
    p.add_argument("--cpu", action="store_true",
                   help="force an 8-device CPU host mesh")
    p.add_argument("--overlap", action="store_true")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args(argv)

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.parallel import distributed, scaling

    enable_compilation_cache()
    out = {"platform": jax.devices()[0].platform,
           "n_devices_available": len(jax.devices())}

    if args.phase_n:
        mesh = distributed.make_mesh(args.mesh)
        out["phase_report"] = scaling.phase_report(
            mesh, args.phase_n, overlap=args.overlap
        )
    else:
        counts = (
            [int(d) for d in args.devices.split(",")]
            if args.devices else None
        )
        out["weak_scaling"] = scaling.scaling_report(
            args.m, device_counts=counts
        )

    print(json.dumps(out, indent=2, default=float))
    path = args.output or os.path.join(
        os.path.dirname(__file__), "..", "bench_results",
        f"scaling_{out['platform']}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, default=float)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
