"""Analytic roofline accounting for the hot kernels (VERDICT r2 item 3).

BASELINE.json's bar is "speed-of-light bitpack throughput"; that claim is
unfalsifiable without an op/byte model and chip peaks.  This module counts
the fused windowed-search kernel's VPU lane-ops and HBM bytes analytically
(from the kernel's own loop structure, ops/pallas_kernels.fused_search_select)
and turns a measured ms/page into utilization percentages.

Chip peaks (TPU v5e / "v5 lite", public figures):
  * VPU: 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12 int32
    lane-ops/s (the scaling-book VPU model; popcount/xor/add each count 1).
  * HBM: 819 GB/s.
These are PEAKS for back-to-back independent lane ops; real kernels also
spend issue slots on loads/stores/selects, so 30-50% is a strong number
for a selection-heavy kernel.
"""

from __future__ import annotations

V5E_VPU_LANE_OPS = 8 * 128 * 4 * 0.94e9   # ~3.85e12 int32 lane-ops/s
V5E_HBM_BYTES = 819e9


def field_packing(W: int) -> int:
    """Fields per uint32 lane in the fused search (pallas_kernels)."""
    return next((k for k in (4, 3, 2) if W * k <= 32 and W % k == 0), 1)


# Full-[wh, We] elementwise/select/reduce ops per tile, counted from the
# source.  The round-3 packed-priority selection
# (pallas_kernels._selection_packed_group): key construction ~7 (masks,
# orders, min), dp/inv/stop 4, priority packing ~8, the single min
# reduction ~1 — ranks and candidate counts are closed-form scalar
# arithmetic, so they cost no grid ops at all.  (The round-2 masked-grid
# selection was ~40: ~10 separate reductions.)
SELECTION_LANE_OPS = 20


def fused_search_model(*, W: int, R: int, rows: int, cols: int) -> dict:
    """Analytic per-page op/byte counts for fused_search_select.

    Mirrors the kernel's actual loop structure: tile groups evaluate
    STATIC x-chunked band slices (pallas_kernels.plan_groups), so the
    per-group work is (3*nit + SEL) * wh * span — not the full band width
    the round-3 kernel paid."""
    from ..ops.pallas_kernels import plan_groups
    ny = -(-rows // W)
    nx = -(-cols // W)
    wh = R + 1
    We = nx * W
    He = ny * W + max(0, wh - (ny * W - W + 1))
    k = field_packing(W)
    nit = W // k
    dist_ops = 3 * nit                      # xor + popcount + add per field
    _, groups = plan_groups(nx, W, R, We, wh)
    row_ops = sum((dist_ops + SELECTION_LANE_OPS) * Gs * wh * span
                  for _, Gs, _, span in groups)
    lane_ops = ny * row_ops
    # HBM: packed field plane written + read for band gather, bands written
    # + read by the kernel, trow/scalars/outputs negligible
    plane = He * We * 4
    bands = ny * (R + nit) * We * 4
    hbm_bytes = 2 * plane + 2 * bands
    return dict(lane_ops=lane_ops, hbm_bytes=hbm_bytes, fields_per_lane=k,
                dist_ops_per_tile=dist_ops,
                selection_ops_per_tile=SELECTION_LANE_OPS)


def utilization(model: dict, seconds_per_page: float) -> dict:
    """Measured time -> achieved rates and peak percentages."""
    ops_s = model["lane_ops"] / seconds_per_page
    bts_s = model["hbm_bytes"] / seconds_per_page
    return dict(
        vpu_lane_ops_per_s=round(ops_s / 1e12, 3),
        vpu_util_pct=round(100.0 * ops_s / V5E_VPU_LANE_OPS, 1),
        hbm_gbps=round(bts_s / 1e9, 2),
        hbm_util_pct=round(100.0 * bts_s / V5E_HBM_BYTES, 2),
        bound="vpu" if ops_s / V5E_VPU_LANE_OPS
        > bts_s / V5E_HBM_BYTES else "hbm",
    )
