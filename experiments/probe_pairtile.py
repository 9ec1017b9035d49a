"""Pair-granularity CSR microbenchmark: the measured rejection.

VERDICT round 2 asked for ONE pair-tile (CSR-block) prototype before
concluding that no sparser-than-dense layout exists on TPU. The repo
already contains the gather-granularity prototype — the packed-gather
``Engine`` (stepper.py) builds per-particle neighbor rows and gathers
per pair; it measures 20-25x slower than the dense cell layout at
matched physics (README perf table). This probe measures the remaining
TPU-expressible variant: an in-kernel pair tile where each (8, 128) tile
of directed pairs gathers its endpoints via one-hot matmul (the only
vectorized arbitrary-index gather Mosaic supports) and scatter-adds
results the same way.

It times, at the bench scale (dp=0.025: n~=5.6k total, ~168k directed
pairs within cutoff):

  a) ``take``:   XLA-native row gather x[idx] for both endpoints,
                 force-kernel flops, and segment-sum scatter (sorted i)
                 — the XLA CSR step an optimizer would hope for.
  b) ``onehot``: the same gathers as f32-precision one-hot matmuls
                 (what an in-Pallas pair-tile kernel must lower to).

Compare against the dense fused engine's TOTAL step (~0.105 ms at this
scale, docs/SCALING.md): if either gather path alone exceeds it, pair-
granularity CSR is dead on this hardware regardless of how little
compute the pair bodies do.

Usage: python experiments/probe_pairtile.py [n_pairs] [n_particles]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(n_pairs: int = 168_000, n: int = 5_632, n_loop: int = 200):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # endpoints sorted by i (what a rebuild would produce): segment ids
    # for the scatter are then contiguous
    i_idx = np.sort(rng.integers(0, n, n_pairs)).astype(np.int32)
    j_idx = rng.integers(0, n, n_pairs).astype(np.int32)
    state = rng.standard_normal((n, 4)).astype(np.float32)  # x y vx vy

    def force(si, sj):
        d = si[:, :2] - sj[:, :2]
        r2 = (d * d).sum(-1) + 1e-6
        w = jnp.exp(-r2)  # stand-in pair kernel, ~10 flops
        return w[:, None] * (si[:, 2:] - sj[:, 2:])

    @jax.jit
    def step_take(state, i_idx, j_idx):
        def body(k, s):
            si = s[i_idx]              # (P, 4) row gather
            sj = s[j_idx]
            f = force(si, sj)          # (P, 2)
            acc = jax.ops.segment_sum(f, i_idx, num_segments=n)
            return s.at[:, 2:].add(1e-6 * acc)
        return jax.lax.fori_loop(0, n_loop, body, state)

    tiles = n_pairs // 1024

    @jax.jit
    def step_onehot(state, i_idx, j_idx):
        ii = i_idx[: tiles * 1024].reshape(tiles, 1024)
        jj = j_idx[: tiles * 1024].reshape(tiles, 1024)
        cols = jnp.arange(n, dtype=jnp.int32)

        def body(k, s):
            def tile(t, acc):
                oh_i = (ii[t][:, None] == cols[None, :]).astype(jnp.float32)
                oh_j = (jj[t][:, None] == cols[None, :]).astype(jnp.float32)
                hi = jax.lax.Precision.HIGHEST
                si = jnp.dot(oh_i, s, precision=hi)   # (1024, 4) gather
                sj = jnp.dot(oh_j, s, precision=hi)
                f = force(si, sj)
                # scatter-add via transposed one-hot
                return acc + jnp.dot(oh_i.T, f, precision=hi)
            acc = jax.lax.fori_loop(0, tiles, tile,
                                    jnp.zeros((n, 2), jnp.float32))
            return s.at[:, 2:].add(1e-6 * acc)
        return jax.lax.fori_loop(0, n_loop, body, state)

    for name, fn in (("take", step_take), ("onehot", step_onehot)):
        s = jnp.asarray(state)
        out = fn(s, jnp.asarray(i_idx), jnp.asarray(j_idx))
        jax.block_until_ready(out)          # compile + warm
        t0 = time.perf_counter()
        out = fn(s, jnp.asarray(i_idx), jnp.asarray(j_idx))
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / n_loop
        print(f"{name}: {ms:.4f} ms/step for {n_pairs} directed pairs "
              f"({n} particles) on {jax.devices()[0].platform}", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 168_000, int(a[1]) if len(a) > 1 else 5_632)
