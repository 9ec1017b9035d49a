"""nx=40 decision sequence for the fused-engine shipping config.

At nx=40 (cell_x = 3dp exactly) the static capacity formula still says
K=14, but the pristine x window holds only 3 lattice columns (vs 4 at
nx=32's 3.75dp), so the clustering headroom is K - 9 = 5 slots instead
of K - 12 = 2 — the hypothesis is that K=14 (which Mosaic compiles,
unlike 16/17 at these shapes) is SAFE at nx=40 where K=15 overflowed at
nx=32.

Sequence (each stage bounded; run on the real TPU):
  1. compile + short-speed probe K=14 @ nx=40  (vs pitfall: compile hang)
  2. same for K=15 @ nx=40 (fallback capacity)
  3. speed reference: K=18 @ nx=32 (the safe nx=32 config)
Occupancy over the full 20 s is measured separately by
probe_occupancy.py (0.025 0.3 18 40).

Usage: python experiments/probe_nx40.py [stage]
  stage 1/2/3 runs one stage (so a Mosaic hang can be timed out per
  stage from the shell); no arg runs all three.
"""
import sys

sys.path.insert(0, ".")

from experiments.sweep_chunklen import probe  # noqa: E402


def main(stage=None):
    stages = {
        1: dict(dp=0.025, skin_mul=0.3, rebuild_every=128, K=14,
                nx_force=40),
        2: dict(dp=0.025, skin_mul=0.3, rebuild_every=128, K=15,
                nx_force=40),
        3: dict(dp=0.025, skin_mul=0.3, rebuild_every=128, K=18,
                nx_force=32),
    }
    for s, kw in stages.items():
        if stage is not None and s != stage:
            continue
        probe(**kw)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
