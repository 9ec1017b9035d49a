import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 300
def timed(shape, scratch, label, sshape=(162,128)):
    def kernel(*refs):
        v = refs[0][(0,) * (len(shape) - 2)][0, 0]
        refs[1][...] = jnp.full(shape, 0.0, jnp.float32) + v
    def fn(c):
        return pl.pallas_call(
            kernel, grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)],
            scratch_shapes=[pltpu.VMEM(sshape, jnp.float32)
                            for _ in range(scratch)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(c)
    @jax.jit
    def run(c):
        def body(i, c):
            outs = fn(c)
            return c + 0.0 * outs[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, N, body, c)
    c0 = jnp.ones(shape, jnp.float32)
    out = run(c0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = run(c0); jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter()-t0)/N*1e3:.4f} ms")

timed((360, 37), 0,  "2D (360,37), scratch 0 ")
timed((360, 37), 1,  "2D (360,37), scratch 1 ")
timed((360, 37), 18, "2D (360,37), scratch 18")
timed((20,18,37), 0, "3D (20,18,37), scratch 0")
timed((20,18,37), 18,"3D (20,18,37), scratch 18")
timed((8, 128), 0,   "2D (8,128), scratch 0  ")
timed((360, 37), 18, "2D + tiny scratch", sshape=(8,128))
