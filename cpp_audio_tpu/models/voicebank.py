"""The voice-bank kernel: batched sine-family note rendering.

This is the flagship compute path: every enveloped sine partial in the system
(sine::Synth voices, MultiEnveloped harmonics — gen.crtp/gen.sine/audioelement
composition stacks) is one ROW of a (V, T) tile. Per time block the kernel is
pure elementwise math + one MXU matmul for the mixdown:

    phase  = wrap(origin[v,b] + k*inc[v])            # k = 0..B-1 in-block index
    env    = closed-form AHDSR(tp0[v,b] + k, ...)    # see ops/envelopes.py
    sig    = amp[v] * env * sin(pi*phase)
    out    = sig^T @ gains                           # (B,V)@(V,C) on the MXU

Numerical design: all O(V*T) work is float32. Phase uses a fixed-point NCO
(numerically controlled oscillator): uint32 phase where the full 2-unit
(rad/pi) circle is 2**32 counts. uint32 multiply-add wraps exactly, the
per-(voice, block) phase origins are computed in exact integer arithmetic on
the host, so phase error is bounded by one block's increment quantization
(~1e-5 rad, < -95 dB) at ANY render length and frequency — no f64 needed
anywhere (TPUs have no native f64). Envelope time offsets tp0/tr0 are exact
in f32 for renders < 2**24 samples (~6 min at 44.1 kHz); beyond that envelope
*boundaries* may jitter by <= 1 sample (inaudible; phases are unaffected).

Envelope curves are STATIC python values when uniform across the bank (the
usual case — a synth program fixes its curves), letting XLA fold the easing
functions; per-voice curve arrays fall back to select-over-curves.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import envelopes, oscillators
from ..utils.interp import Itp, ease, ease_select

NEVER = float(2**62)


@dataclass
class VoiceBank:
    """Host-side SoA description of all partials to render.

    All arrays shape (V,) float64 unless noted. A row is one enveloped sine.
    """

    press: np.ndarray        # absolute first-attack sample
    release: np.ndarray      # absolute release-start sample (NEVER if none)
    increment: np.ndarray    # angle increment (rad/pi) = 2f/sr
    phase0: np.ndarray       # start angle (rad/pi) at the press sample
    amp: np.ndarray          # linear amplitude (volume*aliasing etc.)
    gains: np.ndarray        # (V, C) mixdown gains
    attack: np.ndarray
    hold: np.ndarray
    decay: np.ndarray
    release_len: np.ndarray
    sustain: np.ndarray
    attack_itp: int | np.ndarray = int(Itp.LINEAR)
    decay_itp: int | np.ndarray = int(Itp.LINEAR)
    release_itp: int | np.ndarray = int(Itp.LINEAR)
    auto_release: bool = False

    @property
    def n_rows(self) -> int:
        return len(self.press)


def _host_envelope_derived(bank: VoiceBank):
    """Host f64 precompute of effective envelope params + release top value."""
    min_change = 2.5 * 2.0 / np.maximum(np.abs(bank.increment), 1e-9)
    A = np.maximum(np.maximum(bank.attack, min_change), 1.0)
    H = np.maximum(bank.hold, 0.0)
    has_decay = bank.sustain < 0.999999
    S = np.where(has_decay, np.clip(bank.sustain, 0.0, 1.0), 1.0)
    D = np.where(has_decay, np.maximum(np.maximum(bank.decay, min_change), 1.0), 0.0)
    R = np.maximum(np.maximum(bank.release_len, min_change), 1.0)

    release = bank.release.copy()
    if bank.auto_release:
        release = np.minimum(release, bank.press + A + H + D)
    skipped = release <= bank.press

    # value at the sample before release (the release 'top', audioelement.h:836-841)
    def host_ease(codes, x):
        x = np.clip(x, 0.0, 1.0)
        if isinstance(codes, (int, np.integer)):
            return np.asarray(ease(Itp(int(codes)), x))
        return np.asarray(ease_select(codes, x))

    tp_rel = release - 1.0 - bank.press
    va = host_ease(bank.attack_itp, (tp_rel + 1.0) / A)
    vd = 1.0 + (S - 1.0) * host_ease(bank.decay_itp, (tp_rel - A - H + 1.0) / np.maximum(D, 1.0))
    top = np.where(tp_rel < A, va,
                   np.where(tp_rel < A + H, 1.0, np.where(tp_rel < A + H + D, vd, S)))
    top = np.where(np.isfinite(top), top, 0.0)
    return A, H, D, R, S, release, skipped, top


def _static_itp(codes):
    """Return an int if the curve codes are uniform, else None."""
    if isinstance(codes, (int, np.integer)):
        return int(codes)
    arr = np.asarray(codes)
    if arr.size and (arr == arr.flat[0]).all():
        return int(arr.flat[0])
    return None


def voicebank_blocks_impl(origin_fix, tp0, tr0, inc_fix, amp, gains,
                          A, H, D, R, S, skipped, top,
                          a_codes, d_codes, r_codes,
                          *, block_size: int, a_itp, d_itp, r_itp, out_dtype: str):
    """Render all blocks. origin_fix: (V, n_blocks) uint32 NCO phase origins;
    inc_fix: (V,) uint32 NCO increments; tp0/tr0: (V, n_blocks) envelope time
    offsets. Returns (nb, B, C).

    Un-jitted so parallel/mesh.py can wrap it in shard_map (voice sharding).
    """
    wdt = jnp.dtype(out_dtype)
    k = jnp.arange(block_size, dtype=wdt)
    k_u = jnp.arange(block_size, dtype=jnp.uint32)
    nco_scale = jnp.asarray(2.0 ** -31, wdt)  # uint32 counts -> rad/pi units

    def ease_a(x):
        return ease(a_itp, x) if a_itp is not None else ease_select(a_codes[:, None], x)

    def ease_d(x):
        return ease(d_itp, x) if d_itp is not None else ease_select(d_codes[:, None], x)

    def ease_r(x):
        return ease(r_itp, x) if r_itp is not None else ease_select(r_codes[:, None], x)

    Ae, He, De, Re, Se = (x[:, None] for x in (A, H, D, R, S))
    topE = top[:, None]
    skippedE = skipped[:, None]
    ampE = amp[:, None]
    incE = inc_fix[:, None]

    def one_block(carry):
        origin_b, tp0_b, tr0_b = carry
        tp = tp0_b[:, None] + k[None, :]
        trm = tr0_b[:, None] + k[None, :]  # t - release
        va = ease_a((tp + 1.0) / Ae)
        vd = 1.0 + (Se - 1.0) * ease_d((tp - Ae - He + 1.0) / jnp.maximum(De, 1.0))
        pressed = jnp.where(
            tp < Ae, va, jnp.where(tp < Ae + He, 1.0, jnp.where(tp < Ae + He + De, vd, Se))
        )
        rel = topE * (1.0 - ease_r((trm + 1.0) / Re))
        env = jnp.where(
            (tp < 0) | skippedE,
            0.0,
            jnp.where(trm < 0, pressed, jnp.where(trm + 1.0 < Re, rel, 0.0)),
        )
        # NCO: exact modular phase accumulation in uint32
        ph_u = origin_b[:, None] + k_u[None, :] * incE
        phases = ph_u.astype(wdt) * nco_scale
        sig = ampE * env * oscillators.sine(phases)
        return oscillators.mixdown(sig, gains)

    return jax.lax.map(one_block, (origin_fix.T, tp0.T, tr0.T))


_voicebank_blocks = jax.jit(
    voicebank_blocks_impl,
    static_argnames=("block_size", "a_itp", "d_itp", "r_itp", "out_dtype"),
)


def prepare_bank_arrays(bank: VoiceBank, n_samples: int, block_size: int,
                        dtype: str = "float32"):
    """Host-side f64 precompute shared by single-chip and sharded renderers.

    Returns (array_args tuple for voicebank_blocks_impl, static kwargs dict,
    n_blocks).
    """
    V = bank.n_rows
    nb = (n_samples + block_size - 1) // block_size
    A, H, D, R, S, release, skipped, top = _host_envelope_derived(bank)

    # exact integer NCO setup: 2**32 counts per full circle (2 rad/pi units)
    TWO32 = 1 << 32
    inc_fix = np.round(bank.increment * (TWO32 / 2.0)).astype(np.int64) % TWO32
    phase0_fix = np.round(bank.phase0 * (TWO32 / 2.0)).astype(np.int64) % TWO32
    press_i = bank.press.astype(np.int64)
    b0_i = np.arange(nb, dtype=np.int64) * block_size
    # phase of sample t is (t - press + 1) * inc + phase0, all mod 2**32, exact
    origin_fix = (
        (b0_i[None, :] - press_i[:, None] + 1) * inc_fix[:, None] + phase0_fix[:, None]
    ) % TWO32

    b0 = b0_i.astype(np.float64)
    tp0 = b0[None, :] - bank.press[:, None]
    tr0 = b0[None, :] - release[:, None]
    # clamp far-out offsets so f32 keeps sign + comparisons exact
    LIM = 1e12
    tp0 = np.clip(tp0, -LIM, LIM)
    tr0 = np.clip(tr0, -LIM, LIM)

    cast = lambda x: jnp.asarray(np.asarray(x, np.dtype(dtype)))
    codes = lambda c: jnp.asarray(np.broadcast_to(np.asarray(c, np.int32), (V,)))
    args = (
        jnp.asarray(origin_fix.astype(np.uint32)), cast(tp0), cast(tr0),
        jnp.asarray(inc_fix.astype(np.uint32)), cast(bank.amp),
        cast(bank.gains), cast(A), cast(H), cast(D), cast(R), cast(S),
        jnp.asarray(skipped), cast(top),
        codes(bank.attack_itp), codes(bank.decay_itp), codes(bank.release_itp),
    )
    statics = dict(
        block_size=block_size,
        a_itp=_static_itp(bank.attack_itp),
        d_itp=_static_itp(bank.decay_itp),
        r_itp=_static_itp(bank.release_itp),
    )
    return args, statics, nb


def render_bank(bank: VoiceBank, n_samples: int, *, block_size: int = 32768,
                dtype: str = "float32") -> np.ndarray:
    """Offline render of a VoiceBank -> (n_samples, C) numpy array."""
    args, statics, nb = prepare_bank_arrays(bank, n_samples, block_size, dtype)
    out = _voicebank_blocks(*args, out_dtype=dtype, **statics)
    return np.asarray(out).reshape(nb * block_size, -1)[:n_samples]
