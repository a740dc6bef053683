"""ASCII luminance ramp head.

Replicates GetASCIICharacter (RayTracing.cu:26-39) and the 68-character ramp
(RayTracing.h:97-115): shading value -> ramp index, with index 0 (space)
reserved for misses and the clamp floor of 1 so a lit surface never prints
an empty cell.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Exact ramp of RayTracing.h:100-115 (68 characters, ' ' first).
ASCII_RAMP = (
    " .`^\",:;Il!i><~+_-?*]["
    "}{1)(|/tfjrxnuvczmwXYUJCLqpdbkhao#%ZO8B$0QM&W@"
)
NUM_ASCII = len(ASCII_RAMP)
assert NUM_ASCII == 68

# uint8 lookup table for the encoder (index -> ASCII byte).
ASCII_BYTES = bytes(ASCII_RAMP, "ascii")


def ascii_indices(shading: jax.Array, depth: jax.Array, far: float) -> jax.Array:
    """Vectorized GetASCIICharacter: index = clamp(ceil(s * 67), 1, 67),
    0 for misses (depth > far). The reference clamps to NUM_ASCII (68,
    RayTracing.cu:36) which can never exceed 67 for s <= 1; we clamp to 67
    so out-of-range inputs stay in-table instead of reading past the ramp.
    """
    idx = jnp.ceil(shading * (NUM_ASCII - 1)).astype(jnp.int32)
    idx = jnp.clip(idx, 1, NUM_ASCII - 1)
    return jnp.where(depth > far, 0, idx)
