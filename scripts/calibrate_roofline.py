"""Microbenchmark the VPU primitives the roofline model weights.

VERDICT r3 missing #1: the roofline's constants (VPU_OPS_PER_S, per-
primitive weights) were asserted from one FMA-chain microbench plus
guesses, and the bench's own no-credit check measured the unculled
forward at 163% of the modeled ceiling - a self-refuting model. This
script measures every weighted primitive ON THE CHIP:

  - each op runs register-resident inside a Pallas kernel: the loop
    carry is NCHAIN independent [8, 1024] f32 blocks (8 vregs each), so
    every op application offers NCHAIN*8 independent vreg instructions
    - enough ILP to saturate the VPU issue pipes rather than measure
    their latency (a dependent single chain measures ~0.9 T/s; this
    harness measures ~3.4 T/s for FMA = dual-issue at ~1.7 GHz, flat
    when NCHAIN doubles -> it is the throughput ceiling);
  - the body applies the op DEPTH times per fori iteration so the VMEM
    load/store of the carry is amortized away;
  - the remote-tunnel dispatch floor (~2.5 ms, does not pipeline) is
    cancelled by SLOPE timing: the same chain at two iteration counts,
    min-of-reps time difference / iteration difference;
  - transcendental bodies pair the op with a stabilizing FMA
    (u(x)*a+b keeps the value in the op's sweet domain forever) and
    the op's cost is the slope difference vs the pure-FMA chain.

Output: a JSON dict of measured per-op costs in FMA-slots and the FMA
issue rate, which rtwc_tpu/utils/roofline.py pins as its machine
constants. Run on the axon TPU; CPU runs are refused.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 1024)      # 8 vregs per chain
NCHAIN = 4             # independent chains -> 32-way vreg ILP
ELEMS = SHAPE[0] * SHAPE[1] * NCHAIN
DEPTH = 16             # op applications per chain per loop iteration
I1, I2 = 8192, 32768


def _chain_kernel(body_fn, iters, x_ref, *o_refs):
    # Slightly different constants per chain so no two chains are CSE-able.
    def step(i, xs):
        for _ in range(DEPTH):
            xs = tuple(body_fn(x, 1.0 + 1e-4 * k) for k, x in enumerate(xs))
        return xs

    init = tuple(x_ref[:] * (1.0 + 0.01 * k) for k in range(NCHAIN))
    out = jax.lax.fori_loop(0, iters, step, init)
    for o_ref, o in zip(o_refs, out):
        o_ref[:] = o


def build(body_fn, iters):
    kern = functools.partial(_chain_kernel, body_fn, iters)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct(SHAPE, jnp.float32)] * NCHAIN,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * NCHAIN,
        )(x)

    return run


def _time(fn, x, reps=5) -> float:
    float(jnp.ravel(fn(x)[0])[0])  # compile; D2H read = true sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        float(jnp.ravel(out[0])[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(body_fn, x) -> float:
    """Seconds per single op-application over all NCHAIN blocks."""
    t1 = _time(build(body_fn, I1), x)
    t2 = _time(build(body_fn, I2), x)
    return (t2 - t1) / ((I2 - I1) * DEPTH)


def main() -> None:
    if jax.default_backend() != "tpu":
        sys.exit("calibrate_roofline.py must run on the TPU "
                 f"(backend={jax.default_backend()})")

    x = jnp.full(SHAPE, 0.6, jnp.float32)

    # Support chain: one FMA (also every op body's domain stabilizer).
    # The per-chain constant c (1 + k*1e-4) keeps chains distinct.
    fma = lambda x, c: x * (0.999 * c) + 6.0e-4

    # (name, body, n_extra_ops): body = stabilizing FMA + n_extra
    # applications of the op; cost = (slope(body) - slope(fma)) / n_extra.
    cases = [
        ("mul", lambda x, c: (x * c) * 0.999 + 6.0e-4, 1),
        ("add", lambda x, c: (x + (c - 1.0)) * 0.999 + 6.0e-4, 1),
        ("max", lambda x, c: jnp.maximum(x, 0.1 * c) * 0.999 + 6.0e-4, 1),
        ("abs", lambda x, c: jnp.abs(x) * (0.999 * c) + 6.0e-4, 1),
        ("select", lambda x, c: jnp.where(x > 0.5, x, 0.5 * c) * 0.999 + 6.0e-4, 2),
        ("exp", lambda x, c: jnp.exp(x) * (0.25 * c) + 0.1, 1),
        ("log", lambda x, c: jnp.log(x) * (-0.5 * c) + 0.3, 1),
        ("rsqrt", lambda x, c: jax.lax.rsqrt(x) * (0.5 * c) + 0.2, 1),
        ("sqrt", lambda x, c: jnp.sqrt(x) * (0.8 * c) + 0.1, 1),
        ("div", lambda x, c: ((0.7 * c) / x) * 0.5 + 0.2, 1),
        ("logistic", lambda x, c: jax.nn.sigmoid(x) * (0.8 * c) + 0.1, 1),
        ("tanh", lambda x, c: jnp.tanh(x) * (0.8 * c) + 0.2, 1),
    ]

    s_fma = slope(fma, x)
    fma_rate = ELEMS / s_fma
    out = {
        "shape": SHAPE,
        "nchain": NCHAIN,
        "depth": DEPTH,
        "fma_ops_per_s": round(fma_rate, -6),
        "slots": {},
    }
    print(f"# fma: {fma_rate/1e12:.3f} T elem-ops/s "
          f"({s_fma*1e9:.3f} ns per {NCHAIN}x{SHAPE} app)", file=sys.stderr)
    for name, body, n in cases:
        s = slope(body, x)
        slots = max(0.0, (s - s_fma) / n / s_fma)
        out["slots"][name] = round(slots, 3)
        print(f"# {name:9s}: slope {s*1e9:8.3f} ns/app  "
              f"-> {slots:6.2f} extra FMA-slots", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
