import sys, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1]; N = 300
shape = (20, 18, 37)
tiny = (8, 128)

def call(ins, out_shape, alias=None):
    n_in = len(ins)
    def kernel(*refs):
        v = refs[0][0][0, 0]
        refs[n_in][...] = jnp.full(out_shape, 0.0, jnp.float32) + v
    kw = {}
    if alias is not None:
        kw["input_output_aliases"] = alias
    return pl.pallas_call(
        kernel, grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        **kw,
    )(*ins)

c0 = jnp.ones(shape, jnp.float32)
ex = jnp.ones(shape, jnp.float32)
ext = jnp.ones(tiny, jnp.float32)

if mode == "both_carried":
    @jax.jit
    def run(c, d):
        def body(i, cd):
            c, d = cd
            outs = call((c, d), shape)
            return (c + 0.0 * outs[0].reshape(-1)[0], outs[0])
        return jax.lax.fori_loop(0, N, body, (c, d))
    args = (c0, ex)
elif mode == "const_second":
    @jax.jit
    def run(c):
        def body(i, c):
            outs = call((c, ex), shape)
            return c + 0.0 * outs[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, N, body, c)
    args = (c0,)
elif mode == "tiny_second":
    @jax.jit
    def run(c):
        def body(i, c):
            outs = call((c, ext), shape)
            return c + 0.0 * outs[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, N, body, c)
    args = (c0,)
elif mode == "alias0":
    @jax.jit
    def run(c):
        def body(i, c):
            outs = call((c, ex), shape, alias={0: 0})
            return outs[0]
        return jax.lax.fori_loop(0, N, body, c)
    args = (c0,)
elif mode == "second_passed_via_carry":
    @jax.jit
    def run(c, d):
        def body(i, cd):
            c, d = cd
            outs = call((c, d), shape)
            return (c + 0.0 * outs[0].reshape(-1)[0], d)
        return jax.lax.fori_loop(0, N, body, (c, d))
    args = (c0, ex)

out = run(*args); jax.block_until_ready(out)
t0 = time.perf_counter(); out = run(*args); jax.block_until_ready(out)
print(f"{mode}: {(time.perf_counter()-t0)/N*1e3:.4f} ms")
