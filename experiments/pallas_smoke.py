"""Pallas-on-axon smoke test: confirms Mosaic kernels compile and run through
the relay (PALLAS_AXON_REMOTE_COMPILE). Verified 2026-08-17: OK."""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2 + 1


@jax.jit
def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


if __name__ == "__main__":
    x = jnp.arange(1024, dtype=jnp.int32).reshape(8, 128)
    print("pallas OK:", jax.device_get(f(x))[0, :3])
