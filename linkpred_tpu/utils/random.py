"""Random number generation.

Reference parity: ``xorshift32_engine`` (`/root/reference/inc/_random.hxx:11-42`) —
provided both as a host generator (bit-exact with the reference's sequence) and as
a vectorized JAX step for device-side streams.  The experiment harness itself uses
`numpy.random.Generator` / `jax.random` with explicit seeds (the reference seeds
from ``random_device``, `main.cxx:194-195` — we make reproducibility the default).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["Xorshift32", "xorshift32_step"]


class Xorshift32:
    """Bit-exact ``xorshift32_engine``: x ^= x<<13; x ^= x>>17; x ^= x<<5."""

    MIN = 0
    MAX = 0xFFFFFFFF

    def __init__(self, seed: int = 1):
        self.state = np.uint32(seed if seed else 1)

    def __call__(self) -> int:
        x = self.state
        x ^= np.uint32(x << np.uint32(13))
        x ^= np.uint32(x >> np.uint32(17))
        x ^= np.uint32(x << np.uint32(5))
        self.state = x
        return int(x)


def xorshift32_step(state):
    """One vectorized xorshift32 step over a uint32 array (device-side streams:
    one independent generator per lane)."""
    x = state.astype(jnp.uint32)
    x = x ^ (x << 13)
    x = x ^ (x >> 17)
    x = x ^ (x << 5)
    return x
