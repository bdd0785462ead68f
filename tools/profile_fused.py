"""Decode a jax.profiler trace of the FUSED sort pipeline into per-kernel
device times — retiring stage_times' fused-round proration estimate with
the real in-stream execution (the analog of the reference's in-command-
buffer timestamps, src/vk_radix_sort.h.in:39-50, decoded in
bench/vulkan_benchmark.cc:318-337).

stage_times times each pallas_call as its own jitted program; this tool
instead traces ONE execution of the shipped fused program and reads the
per-kernel device durations out of the XLA profiler's XSpace, so fused
rounds get measured attribution, not stage-count proration.

Usage:
    python tools/profile_fused.py [keys|kv|kvns] [log2_n] [chunk_log2]

Prints one JSON line: total device-time by kernel, sorted descending.
"""

import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------------------
# Minimal protobuf wire-format decoder for the XSpace trace. The environment
# ships no xplane_pb2 bindings, and the tool only needs four field paths:
#   XSpace.planes(1) -> XPlane{name(2), lines(3), event_metadata(4)}
#   XLine.events(4) -> XEvent{metadata_id(1), duration_ps(3)}
#   event_metadata map entry -> XEventMetadata{id(1), name(2)}
# Field numbers from tsl/profiler/protobuf/xplane.proto (public schema).
# ---------------------------------------------------------------------------

def _fields(buf):
    """Yield (field_number, wire_type, value) from a protobuf message."""
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]; i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fnum, wt, v
        elif wt == 2:  # length-delimited
            ln = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fnum, wt, buf[i:i + ln]
            i += ln
        elif wt == 1:
            yield fnum, wt, buf[i:i + 8]; i += 8
        elif wt == 5:
            yield fnum, wt, buf[i:i + 4]; i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _device_events(space_bytes):
    """{event_name: [total_ps, count]} over device planes of an XSpace."""
    totals = {}
    for fnum, wt, plane in _fields(space_bytes):
        if fnum != 1 or wt != 2:
            continue
        pname, lines, ev_names = "", [], {}
        for pf, pw, pv in _fields(plane):
            if pf == 2 and pw == 2:
                pname = pv.decode("utf-8", "replace")
            elif pf == 3 and pw == 2:
                lines.append(pv)
            elif pf == 4 and pw == 2:  # map<int64, XEventMetadata> entry
                mid, meta = 0, b""
                for mf, mw, mv in _fields(pv):
                    if mf == 1 and mw == 0:
                        mid = mv
                    elif mf == 2 and mw == 2:
                        meta = mv
                name = ""
                for ef, ew, ev in _fields(meta):
                    if ef == 2 and ew == 2:
                        name = ev.decode("utf-8", "replace")
                ev_names[mid] = name
        # TPU device planes are named like '/device:TPU:0'; CPU runs land
        # on '/host:CPU' — accept both so the tool is smoke-testable off-TPU
        if "TPU" not in pname and "CPU" not in pname:
            continue
        for line in lines:
            for lf, lw, lv in _fields(line):
                if lf != 4 or lw != 2:
                    continue
                mid, dur = 0, 0
                for ef, ew, ev in _fields(lv):
                    if ef == 1 and ew == 0:
                        mid = ev
                    elif ef == 3 and ew == 0:
                        dur = ev
                name = ev_names.get(mid, str(mid))
                t = totals.setdefault(name, [0, 0])
                t[0] += dur
                t[1] += 1
    return totals


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "keys"
    if kind not in ("keys", "kv", "kvns"):
        print(json.dumps({"error": f"unknown kind {kind!r}; use keys|kv|kvns"}))
        return 2
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    chunk = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 16)
    n = 1 << log2n

    import jax
    import jax.numpy as jnp

    from vulkan_radix_sort_tpu.config import enable_compilation_cache
    from vulkan_radix_sort_tpu.ops import bitonic

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    keys = jnp.asarray(
        rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    )
    # interpret off-TPU so the decode path is smoke-testable in CI (the
    # CPU trace has host-side pallas-interpret events instead of Mosaic
    # kernels, but the XSpace wire format and decoder are identical)
    interp = jax.devices()[0].platform != "tpu"
    if kind == "keys":
        fn = jax.jit(lambda k: bitonic.sort_u32(k, chunk=chunk,
                                                interpret=interp))
        args = (keys,)
    else:
        vals = jnp.asarray(np.arange(n, dtype=np.uint32))
        stable = kind == "kv"
        fn = jax.jit(lambda k, v: bitonic.sort_pairs_u32(
            k, v, chunk=chunk, stable=stable, interpret=interp))
        args = (keys, vals)

    jax.block_until_ready(fn(*args))  # compile outside the trace

    tmp = tempfile.mkdtemp(prefix="vrs_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(3):
            jax.block_until_ready(fn(*args))

    pbs = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        print(json.dumps({"error": f"no xplane.pb under {tmp}"}))
        return 1
    with open(pbs[0], "rb") as f:
        totals = _device_events(f.read())
    rows = sorted(
        ((name, ps / 1e12 / 3, cnt // 3) for name, (ps, cnt) in totals.items()
         if ps > 0),
        key=lambda r: -r[1],
    )
    out = {
        "kind": kind, "n": n, "chunk": chunk,
        "kernels": [
            {"name": name, "s_per_sort": round(s, 6), "calls": cnt}
            for name, s, cnt in rows[:40]
        ],
        "device_total_s": round(sum(r[1] for r in rows), 6),
        "trace_dir": tmp,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
