"""Fixed-cost probe: thread the carry through the call so nothing hoists."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nyp, K, nxh = 20, 18, 37
halo = (nyp, K, nxh)

def make_fn(n_in, n_out, shape, scratch=18, write_all=False):
    def kernel(*refs):
        # read input0 + write output0 so both DMAs are real
        v = refs[0][(0,) * (len(shape) - 2)][0, 0]
        if write_all:
            for j in range(n_in, n_in + n_out):
                refs[j][...] = jnp.full(shape, 0.0, jnp.float32) + v
        else:
            refs[n_in][...] = jnp.full(shape, 0.0, jnp.float32) + v
    def fn(carry_in, extras):
        return pl.pallas_call(
            kernel, grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * n_out,
            scratch_shapes=[pltpu.VMEM((162, 128), jnp.float32)
                            for _ in range(scratch)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100*1024*1024),
        )(carry_in, *extras)
    return fn

N = 300
def timed(n_in, n_out, shape, **kw):
    fn = make_fn(n_in, n_out, shape, **kw)
    extras = tuple(jnp.ones(shape, jnp.float32) for _ in range(n_in - 1))
    @jax.jit
    def run(c):
        def body(i, c):
            outs = fn(c, extras)
            return c + 0.0 * outs[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, N, body, c)
    c0 = jnp.ones(shape, jnp.float32)
    out = run(c0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = run(c0); jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N * 1e3

print(f"1in/1out (20,18,37):            {timed(1, 1, halo):.4f} ms")
print(f"9in/1out (20,18,37):            {timed(9, 1, halo):.4f} ms")
print(f"9in/17out write1 (20,18,37):    {timed(9, 17, halo):.4f} ms")
print(f"9in/17out writeALL (20,18,37):  {timed(9, 17, halo, write_all=True):.4f} ms")
print(f"1in/1out 2D (360,37):           {timed(1, 1, (nyp*K, nxh)):.4f} ms")
print(f"1in/1out 2D (360,128):          {timed(1, 1, (nyp*K, 128)):.4f} ms")
print(f"9in/17out writeALL 2D (360,37): {timed(9, 17, (nyp*K, nxh), write_all=True):.4f} ms")
print(f"1in/1out stacked (26,20,18,37) writeALL: {timed(1, 1, (26,)+halo, write_all=True):.4f} ms")
