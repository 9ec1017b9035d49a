import sys, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n_in = int(sys.argv[1]); n_out = int(sys.argv[2]); N = 300
shape = (20, 18, 37)
def kernel(*refs):
    v = refs[0][0][0, 0]
    refs[n_in][...] = jnp.full(shape, 0.0, jnp.float32) + v
def fn(c, extras):
    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * n_out,
        scratch_shapes=[pltpu.VMEM((162, 128), jnp.float32) for _ in range(18)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(c, *extras)
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
print(f"n_in={n_in} n_out={n_out}: {(time.perf_counter()-t0)/N*1e3:.4f} ms")
