"""Falsifiable projection of distributed-sort scaling on real TPU meshes.

The BASELINE >=80% scaling-efficiency target has no multi-chip hardware to
measure against in this environment, so this tool publishes the next best
thing: a per-phase time projection built ONLY from

  (a) exact, countable work — bitonic stage counts per element for the
      local sort and the merge re-sort (the network is oblivious, so stage
      count x measured per-stage cost IS the time, no distribution term),
  (b) chip-measured constants — per-stage-pass per-element cost and the
      HBM streaming rate from docs/PERFORMANCE.md (v5e, round-2 table),
  (c) public interconnect specs — v5e ICI (2-D torus, ~45 GB/s per link
      per direction) and a 200 Gbps/host DCN NIC,
  (d) the exchange's exact byte volumes (uniform keys: (D-1)/D of each
      shard moves; the DCN fraction is (H-1)/H — the same accounting
      `scaling.dcn_report` measures from the live exchange plan).

Every row is falsifiable: run `parallel.scaling.phase_report` /
`scaling_report` on the real mesh and diff phase by phase.

Usage: python tools/scaling_projection.py [--write-doc]
"""

import argparse
import json
import math
import os

# ---- measured single-chip constants (v5e, docs/PERFORMANCE.md) ----------
# round-4 refresh: the T-layout engine runs keys at 14.7 ms / 325
# stage-passes at 2^25 under pure defaults (bench.py r4, chip_queue.log
# r4_bench_defaults) — the round-2 constant was 24.7 ms pre-T
TAU_STAGE_S = 14.7e-3 / (325 * (1 << 25))  # s per element per stage-pass
HBM_STREAM_GBS = 342e9                     # measured sequential-grid copy
# ---- public interconnect specs ------------------------------------------
ICI_LINK_GBS = 45e9     # v5e ICI, per link per direction (2-D torus)
DCN_HOST_GBS = 25e9     # 200 Gbps NIC per host
KEY_BYTES = 4


def full_sort_stages(n: int) -> int:
    """Bitonic network stage-passes over n elements (n padded to pow2)."""
    b = max(1, math.ceil(math.log2(max(n, 2))))
    return b * (b + 1) // 2


def merge_stage_elems(buffer_n: int, genuine_n: int, slot: int,
                      chunk: int = 1 << 16) -> float:
    """Element-stage-passes of the slotted merge re-sort
    (bitonic.merge_slots_*): per round, cross stages run over the whole
    slot buffer (groups mix genuine and fill blocks) while local stages
    skip pure-fill blocks via the SMEM validity gate (_merge_rounds count
    tracking) — only ~genuine_n elements pay them."""
    C = min(slot, chunk)
    lc = int(math.log2(C))
    nrounds = int(math.log2(buffer_n // C))
    r_start = int(math.log2(slot // C)) + 1
    cross = sum(r for r in range(r_start, nrounds + 1)) * buffer_n
    local = (nrounds - r_start + 1) * lc * genuine_n
    return cross + local


def a2a_torus_s(v_bytes: float, dims: tuple) -> float:
    """All-to-all of v bytes per chip on a multi-dim torus, axis-decomposed:
    per bidirectional ring of k chips the average link load is v*k/8 per
    direction (each pair routes the short way; mean distance k/4, two
    directions), so T = sum_axis v * k_axis / (8 * W_link_dir)."""
    return sum(v_bytes * k / (8 * ICI_LINK_GBS) for k in dims)


def project(m: int, dims: tuple, hosts: int = 1, merge_resort: bool = True,
            overlap: bool = True, chunk: int = 1 << 16) -> dict:
    """Per-chip phase times for a weak-scaled sort of D*m keys."""
    D = 1
    for k in dims:
        D *= k
    t_local = TAU_STAGE_S * m * full_sort_stages(m)

    v = m * KEY_BYTES * (D - 1) / D          # bytes leaving each chip
    t_ici = a2a_torus_s(v, dims)
    t_dcn = 0.0
    if hosts > 1:
        # cross-host fraction (H-1)/H of each shard rides the host NIC;
        # chips_per_host shards share it (dcn_report measures this volume
        # exactly from the live plan)
        per_host = (D // hosts) * m * KEY_BYTES * (hosts - 1) / hosts
        t_dcn = per_host / DCN_HOST_GBS

    if merge_resort:
        slot = max(256, 1 << math.ceil(math.log2(2 * m / D)))
        buf = D * slot if D * slot >= 2 * m else 2 * m
        nslots = buf // slot
        t_resort = TAU_STAGE_S * merge_stage_elems(buf, m, slot, chunk)
        # odd-slot reversal: one read+write pass over the slot buffer
        t_resort += 2 * buf * KEY_BYTES / HBM_STREAM_GBS
        # unfused rounds: 2 HBM round trips per round — only binds if the
        # memory time exceeds the compute time (it does not at v5e rates)
        rounds = int(math.log2(nslots))
        t_mem = rounds * 4 * buf * KEY_BYTES / HBM_STREAM_GBS
        t_resort = max(t_resort, t_mem)
    else:
        t_resort = TAU_STAGE_S * m * full_sort_stages(m)

    t_exchange = t_ici + t_dcn
    if overlap:
        # the source-split exchange hides the collective behind the
        # re-sort of the first half, bounded by what there is to hide
        t_total = t_local + t_resort + max(0.0, t_exchange - t_resort / 2)
    else:
        t_total = t_local + t_exchange + t_resort

    t1 = TAU_STAGE_S * m * full_sort_stages(m)  # one chip sorting m
    # comparison sorts are O(n log n): a single device sorting D*m pays
    # full_sort_stages(D*m) per element, so the log-factor-adjusted ideal
    # for weak scaling is t1 * L(D*m)/L(m), not t1 itself. Both are shown.
    adj = full_sort_stages(D * m) / full_sort_stages(m)
    return {
        "m_per_chip": m,
        "mesh": "x".join(map(str, dims)),
        "chips": D,
        "hosts": hosts,
        "merge_resort": merge_resort,
        "overlap": overlap,
        "local_sort_ms": round(t_local * 1e3, 2),
        "exchange_ici_ms": round(t_ici * 1e3, 2),
        "exchange_dcn_ms": round(t_dcn * 1e3, 2),
        "resort_ms": round(t_resort * 1e3, 2),
        "total_ms": round(t_total * 1e3, 2),
        "gitems_s": round(D * m / t_total / 1e9, 3),
        "weak_eff_naive": round(t1 / t_total, 3),
        "weak_eff_nlogn": round(t1 * adj / t_total, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write-doc", action="store_true")
    args = ap.parse_args()

    rows = []
    # BASELINE config 5: 2^30 keys over v5e-16 (4x4 torus, one ICI domain)
    m16 = (1 << 30) // 16
    for mr, ov in ((False, False), (True, False), (True, True)):
        rows.append(project(m16, (4, 4), hosts=1, merge_resort=mr,
                            overlap=ov))
    # DCN tier example: 2 hosts x 8 chips, ICI within, NIC across
    rows.append(project(m16, (4, 4), hosts=2, merge_resort=True,
                        overlap=True))
    # small-scale sanity row matching the CPU-mesh proxy shape
    rows.append(project(1 << 21, (8,), hosts=1, merge_resort=True,
                        overlap=False))

    for r in rows:
        print(json.dumps(r))

    if args.write_doc:
        doc = os.path.join(os.path.dirname(__file__), "..", "docs",
                           "SCALING_PROJECTION.md")
        hdr = ("| mesh | design | local | ICI | DCN | re-sort | total | "
               "GItems/s | eff (naive) | eff (nlogn) |\n|" + "---|" * 10
               + "\n")
        lines = []
        for r in rows:
            design = ("merge+overlap" if r["merge_resort"] and r["overlap"]
                      else "merge" if r["merge_resort"] else "full re-sort")
            lines.append(
                f"| {r['mesh']} (H={r['hosts']}) | {design} "
                f"| {r['local_sort_ms']} ms | {r['exchange_ici_ms']} "
                f"| {r['exchange_dcn_ms']} | {r['resort_ms']} "
                f"| {r['total_ms']} | {r['gitems_s']} "
                f"| {r['weak_eff_naive']} | {r['weak_eff_nlogn']} |"
            )
        with open(doc, "w") as f:
            f.write(DOC_PREAMBLE + hdr + "\n".join(lines) + DOC_EPILOGUE)
        print("wrote", os.path.normpath(doc))


DOC_PREAMBLE = """# Scaling projection — distributed sort on real TPU meshes

Generated by `tools/scaling_projection.py` (edit there, rerun with
`--write-doc`). No multi-chip hardware exists in this environment; this is
the falsifiable stand-in for the BASELINE >=80% scaling target, built from

- **exact stage counts** (the network is oblivious: stage count x
  per-stage cost IS the runtime, no distribution variance),
- **chip-measured constants**: 1.349 ps/elem/stage-pass (the round-4
  T-layout engine: 14.7 ms / 325 stage-passes at 2^25 under pure
  defaults, chip_queue.log r4_bench_defaults; the round-2/3 projections
  used the pre-T 2.266) and 342 GB/s HBM streaming,
- **public interconnect specs**: v5e ICI 2-D torus at ~45 GB/s per link
  per direction; 200 Gbps host NIC for DCN,
- **exact exchange volumes**: uniform keys move (D-1)/D of each shard;
  the cross-host fraction is (H-1)/H (`scaling.dcn_report` measures the
  same accounting from the live plan — diff against these numbers).

To falsify on hardware: run `parallel.scaling.phase_report(mesh, n)` (it
reports `full_merge_s` alongside the full-re-sort pipeline) and compare
phase by phase. Per-chip m = 2^26 (BASELINE config 5: 2^30 keys/v5e-16).

**Efficiency columns.** `naive` = t(1 chip sorting m) / t(D). `nlogn`
credits the comparison-sort lower bound: one device sorting D*m pays
L(D*m)/L(m) more stage-passes per element (L(n) = log2(n)(log2(n)+1)/2),
so the ideal distributed time is t1 * L(Dm)/L(m). The 80% target is
assessed against `nlogn` — the naive column penalizes every comparison
sort for growing total n, which no partitioning scheme can evade.

"""

DOC_EPILOGUE = """

## Reading

- The **merge re-sort** (slotted exchange + merge-rounds-only re-sort,
  `bitonic.merge_slots_*`) replaces the full 351-stage re-sort of m with
  merge rounds over the 2m slot buffer, and the SMEM validity gate skips
  the local stages of pure-fill blocks (~half the buffer), leaving ~38
  cross stages over 2m + ~64 local stages over m — the single biggest
  projected scaling lever, implemented and CPU-mesh-tested today
  (`tests/test_distributed.py::TestMergeResort`).
- **merge+overlap** additionally hides the collective behind the half
  merges (`overlap=True` + `merge_resort`: two slotted half-exchanges,
  each merge-finished — implemented, same test class). The naive metric
  cannot reach 80% for any comparison sort at D=16 (L(2^30)/L(2^26) =
  1.32 of inherent extra work).
- **Round-4 shift: the re-sort is now HBM-bound.** The T layout cut the
  compute constant 1.68x, so the merge re-sort's floor is no longer its
  stage count but its memory traffic (unfused rounds pay 2 read+write
  passes over the 2m slot buffer each, plus the odd-slot reversal pass)
  — 25.1 ms of the 56.9 ms total. Aggregate throughput projects HIGHER
  than round 3 (13.7 -> 18.9 GItems/s, 1.56x the reference's
  single-GPU 12.07 headline) while nlogn efficiency drops 0.90 -> 0.74,
  below the 80% bar. The candidate levers and their round-4 status:
  a manual-DMA local kernel that skips fill-gated blocks' round trips
  is implemented (`VRS_DMA_GATE`) and chip-correct but MEASURED SLOWER
  (5.67 vs 5.37 ms on the 2^24 single-chip proxy, chip_queue.log
  r4_merge_dmagate) — without double buffering the lost copy/compute
  overlap outweighs the skipped traffic, so the default stays off and
  a round-5 attempt needs prefetch-next-live-block pipelining; fusing
  the odd-slot reversal into the exchange's send-buffer build (flip at
  the source, mirrored offsets) saves 2 buffer passes and remains
  unbuilt. The modeled combination (~51 ms / 0.83 eff / 21 GItems/s)
  is therefore a design target, not an implemented number.
- The DCN row shows the 2-host NIC tier dominating the exchange; the
  hierarchical router's consolidation (H-1 messages/chip) keeps the
  volume at the exact (H-1)/H fraction shown.
- CPU-mesh `phase_report` numbers are a correctness proxy only: interpret
  per-kernel overhead inverts the merge-vs-full comparison at toy sizes
  (full_merge_s > full_s there); the chip numbers above are what the
  design targets. First hardware window: run the falsification commands
  above and replace this paragraph with measurements.
"""


if __name__ == "__main__":
    main()
