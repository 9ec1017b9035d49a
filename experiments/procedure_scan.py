"""Measurement-PROCEDURE scan for the reference's published 0.49% L2.

The parameter-space scan (docs/VALIDATION.md: transport_coeff x c_f)
brackets the reference algorithm at 1.08-2.1% L2 — a factor >2 above its
fix-log claim (/root/reference/README.md:147-152). The remaining loophole
is the measurement procedure itself: the fix-log's metric code is
unpublished, so its bin count, slice choice, averaging window, and
accumulation precision are all unknown. This scan closes that loophole by
re-measuring ONE f64 oracle trajectory (reference-exact semantics,
native/sph_oracle.cpp) under every plausible combination:

  * bin count: 12 / 20 / DH/dp (the driver's n_bins, SPH_Poiseuille.m:234)
    / 2x DH/dp
  * state: final (t=20) profile vs time-averaged over the last 2.5/5/10 s
    of output-point snapshots (the monitor cadence, SPH_Poiseuille.m:297)
  * slice: full channel vs the mid-channel slice |x-DL/2| <= max(dp,h)
    with periodic distance (the M12 monitor slice, SPH_Poiseuille.m:593)
  * L2 accumulation: float64 vs float32

Usage:  python experiments/procedure_scan.py [dp] [end_time]
Writes a markdown table to stdout (pasted into docs/VALIDATION.md) and
the raw grid to /tmp/procedure_scan_dp{dp}.json.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from run_oracle_sim import run  # noqa: E402

from sph_poiseuille_flow_tpu.config import derive_config  # noqa: E402
from sph_poiseuille_flow_tpu.utils import postprocess as pp  # noqa: E402


def l2_under(cfg, snaps, n_bins, window_s, mid_slice, f32):
    """L2 of the trajectory's profile under one procedure combination.
    ``snaps``: list of (t, x, y, vx) fluid snapshots at output points."""
    t_end = snaps[-1][0]
    use = [s for s in snaps if s[0] > t_end - window_s - 1e-9] \
        if window_s else [snaps[-1]]
    w = max(cfg.dp, cfg.h)
    profiles = []
    for (t, x, y, vx) in use:
        if mid_slice:
            dx = np.abs(x - cfg.DL / 2.0)
            dx = np.minimum(dx, cfg.DL - dx)   # periodic distance
            m = dx <= w
            y, vx = y[m], vx[m]
        y_mid, u_mean = pp.binned_profile_mean(y, vx, 0.0, cfg.DH, n_bins)
        profiles.append(u_mean)
    u = np.nanmean(np.stack(profiles), axis=0)
    u_ex = cfg.analytic_u(y_mid)
    if f32:
        u = u.astype(np.float32)
        u_ex = u_ex.astype(np.float32)
        valid = ~np.isnan(u)
        num = np.sum((u[valid] - u_ex[valid]) ** 2, dtype=np.float32)
        den = np.sum(u_ex[valid] ** 2, dtype=np.float32)
        return float(np.sqrt(num / den))
    return pp.compute_l2_error(u, u_ex)


def main(dp=0.04, end_time=20.0):
    cfg = derive_config(DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1,
                        U_bulk=0.666667, c_f=15.0, end_time=end_time,
                        output_interval=0.5, sort_interval=100,
                        restart_from_file=False)
    snaps = []
    run(dp=dp, end_time=end_time, output_interval=0.5,
        log=lambda m: print(m, file=sys.stderr),
        snapshot=lambda t, x, y, vx: snaps.append((t, x, y, vx)))

    nb_ref = cfg.n_bins
    grid = []
    print(f"\n### Procedure scan, oracle f64, dp={dp}, {end_time} s "
          f"({len(snaps)} snapshots)\n")
    print("| bins | state | slice | L2 accum | L2 |")
    print("|---|---|---|---|---|")
    best = (1e9, None)
    for n_bins in sorted({12, 20, nb_ref, 2 * nb_ref}):
        for window in (0.0, 2.5, 5.0, 10.0):
            for mid in (False, True):
                for f32 in (False, True):
                    l2 = l2_under(cfg, snaps, n_bins, window, mid, f32)
                    state = "final" if window == 0 else f"avg {window:g}s"
                    row = dict(n_bins=int(n_bins), state=state,
                               slice="mid" if mid else "full",
                               accum="f32" if f32 else "f64",
                               l2_pct=round(100 * l2, 4))
                    grid.append(row)
                    if l2 < best[0]:
                        best = (l2, row)
                    print(f"| {n_bins} | {state} | {row['slice']} "
                          f"| {row['accum']} | {100 * l2:.3f}% |")
    print(f"\nbest combination: {best[1]} -> {100 * best[0]:.3f}%")
    n_le = sum(1 for r in grid if r["l2_pct"] <= 0.5)
    print(f"combinations at or under 0.49-0.5%: {n_le} / {len(grid)}")
    out = f"/tmp/procedure_scan_dp{dp:g}.json"
    with open(out, "w") as f:
        json.dump(dict(dp=dp, end_time=end_time, grid=grid,
                       best=best[1]), f, indent=1)
    print(f"raw grid -> {out}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(dp=float(a[0]) if a else 0.04,
         end_time=float(a[1]) if len(a) > 1 else 20.0)
