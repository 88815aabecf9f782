"""Pallas TPU kernel for the voice-bank block renderer.

Fuses the whole per-block pipeline of models/voicebank.py — uint32 NCO phase,
closed-form linear AHDSR envelope, sine, amplitude — and the MXU mixdown into
one kernel, so the (V, B) signal tile lives only in VMEM (never spilled to
HBM between the elementwise stage and the matmul).

Grid: one program per time block. Per program:
  - per-voice params (small (V, k) tables) sit in VMEM, broadcast over lanes
  - phases are exact modular uint32 arithmetic (wraps are defined behavior)
  - sig (V, B) is built on the VPU, then (B, C) = sig^T @ gains on the MXU

Curves are LINEAR (the common case — synth programs with eased envelopes take
the XLA path in models/voicebank.py, which supports every curve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fastmath


def _kernel(fp_ref, ip_ref, up_ref, gains_ref, out_ref, *, block_size: int):
    b = pl.program_id(0)
    V = fp_ref.shape[0]
    B = block_size

    k_i = jax.lax.broadcasted_iota(jnp.int32, (V, B), 1)
    k = k_i.astype(jnp.float32)
    k_u = pltpu.bitcast(k_i, jnp.uint32)

    press_i = ip_ref[:, 0][:, None]
    release_i = ip_ref[:, 1][:, None]
    inc_fix = up_ref[:, 0][:, None]
    phase0_fix = up_ref[:, 1][:, None]

    amp = fp_ref[:, 0][:, None]
    A = fp_ref[:, 1][:, None]
    H = fp_ref[:, 2][:, None]
    D = fp_ref[:, 3][:, None]
    R = fp_ref[:, 4][:, None]
    S = fp_ref[:, 5][:, None]
    top = fp_ref[:, 6][:, None]
    skipped = fp_ref[:, 7][:, None] > 0.5

    b0_i = b * block_size
    tp = (b0_i - press_i).astype(jnp.float32) + k
    trm = (b0_i - release_i).astype(jnp.float32) + k

    va = jnp.clip((tp + 1.0) / A, 0.0, 1.0)
    vd = 1.0 + (S - 1.0) * jnp.clip((tp - A - H + 1.0) / jnp.maximum(D, 1.0), 0.0, 1.0)
    pressed = jnp.where(tp < A, va,
                        jnp.where(tp < A + H, 1.0,
                                  jnp.where(tp < A + H + D, vd, S)))
    rel = top * (1.0 - jnp.clip((trm + 1.0) / R, 0.0, 1.0))
    env = jnp.where((tp < 0) | skipped, 0.0,
                    jnp.where(trm < 0, pressed,
                              jnp.where(trm + 1.0 < R, rel, 0.0)))

    # exact NCO: ((b0 - press + 1) + k) * inc + phase0 in uint32 (mod 2**32)
    b0_u = jnp.uint32(b0_i)
    base_u = b0_u - press_i.astype(jnp.uint32) + jnp.uint32(1)
    ph_u = (base_u + k_u) * inc_fix + phase0_fix
    # Mosaic has no uint32->f32 cast; bitcast to int32 instead. The sign flip
    # shifts the phase by exactly one period (2 rad/pi), which sin() ignores.
    ph_i = pltpu.bitcast(ph_u, jnp.int32)
    phases = ph_i.astype(jnp.float32) * jnp.float32(2.0 ** -31)  # in [-1, 1)
    sig = amp * env * fastmath.sinpi_principal(phases)

    out_ref[:, :] = jax.lax.dot_general(
        sig, gains_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit,
                   static_argnames=("block_size", "n_blocks", "interpret"))
def render_blocks_pallas(fp, ip, up, gains, *, block_size: int, n_blocks: int,
                         interpret: bool = False):
    """Pallas voice-bank renderer: returns (n_blocks*block_size, C) float32.

    Same array contract as voicebank.voicebank_blocks_impl (LINEAR curves).
    The grid is sub-blocked to keep the fused (V, B) tile within VMEM.
    """
    V, C = gains.shape
    total = block_size * n_blocks
    # (V, B) f32 tiles: keep a handful of intermediates under ~8 MB VMEM.
    # B is the lane axis of the (V, B) tiles and the sublane axis of the
    # (B, C) output block, so keep it a multiple of 256 (Mosaic requires the
    # output block's second-to-last dim % 8 == 0).
    auto = max(512, ((1 << 19) // max(V, 1)) & ~255)
    block_size = min(block_size, auto)
    if block_size % 8:
        block_size = max(512, block_size & ~255)
    n_blocks = (total + block_size - 1) // block_size
    kern = functools.partial(_kernel, block_size=block_size)
    grid = (n_blocks,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, fp.shape[1]), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, 2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, 2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((V, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_size, C), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block_size, C), jnp.float32),
        interpret=interpret,
    )(fp.astype(jnp.float32), ip, up, gains.astype(jnp.float32))
    return out


def pack_envelope_fields(fp8):
    """voicebank packs [amp, A, H, D, R, S, top, skip]; the kernel reads the
    same order — passthrough hook for layout changes."""
    return fp8
