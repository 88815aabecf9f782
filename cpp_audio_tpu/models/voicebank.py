"""The voice-bank kernel: batched sine-family note rendering.

This is the flagship compute path: every enveloped sine partial in the system
(sine::Synth voices, MultiEnveloped harmonics — gen.crtp/gen.sine/audioelement
composition stacks) is one ROW of a (V, T) tile. Per time block the kernel is
pure elementwise math + one MXU matmul for the mixdown:

    phase  = NCO(press, inc)[k]                      # exact uint32 fixed point
    env    = closed-form AHDSR(t - press, ...)       # see ops/envelopes.py
    sig    = amp[v] * env * sin(pi*phase)
    out    = sig^T @ gains                           # (B,V)@(V,C) on the MXU

Numerical design: all O(V*T) work is float32. Phase uses a fixed-point NCO
(numerically controlled oscillator): uint32 phase where the full 2-unit
(rad/pi) circle is 2**32 counts. Integer multiply-add wraps exactly (modular
arithmetic), so phase error is bounded by the increment quantization within
one block (~1e-5 rad, < -95 dB) at ANY render length and frequency — no f64
anywhere (TPUs have no native f64). Envelope time offsets are int32 sample
arithmetic, exact up to 2**31 samples (~13 h at 44.1 kHz).

Host -> device traffic is 4 small arrays per render (per-voice packed floats,
per-voice ints, mix gains, curve codes); all per-block offsets are derived
on device from the block index. Envelope curves are STATIC python values when
uniform across the bank (a synth program fixes its curves), letting XLA fold
the easing functions; per-voice curve arrays fall back to select-over-curves.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import oscillators
from ..utils.interp import Itp, ease, ease_np, ease_select

NEVER = float(2**62)
_I32_FAR = np.int32(2**31 - 2**24)  # "never" clamp that survives int32 block offsets


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
    min_change = np.floor(0.5 + 2.5 * 2.0 / np.maximum(np.abs(bank.increment), 1e-9))
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
        if isinstance(codes, (int, np.integer)):
            return ease_np(Itp(int(codes)), x)
        codes = np.asarray(codes)
        out = np.empty(np.broadcast(codes, x).shape)
        for k in np.unique(codes):
            m = codes == k
            out[m] = ease_np(Itp(int(k)), np.broadcast_to(x, out.shape)[m])
        return out

    tp_rel = release - 1.0 - bank.press
    va = host_ease(bank.attack_itp, (tp_rel + 1.0) / A)
    vd = 1.0 + (S - 1.0) * host_ease(bank.decay_itp, (tp_rel - A - H + 1.0) / np.maximum(D, 1.0))
    top = np.where(tp_rel < A, va,
                   np.where(tp_rel < A + H, 1.0, np.where(tp_rel < A + H + D, vd, S)))
    top = np.where(np.isfinite(top), top, 0.0)
    return A, H, D, R, S, release, skipped, top


def retuned_phase0(press, t_change, phase0_old: float,
                   inc_old: float, inc_new: float) -> float:
    """Start angle that makes a frequency change at `t_change` PHASE-
    CONTINUOUS under the kernel's exact uint32 NCO arithmetic (phase counts
    at sample t = (t - press + 1)*inc_fix + phase0_fix mod 2^32): the new
    (inc, phase0) pair reproduces the old phase at the last old-increment
    step, so sample t_change advances from it by one new-increment step —
    the reference's setAngleIncrements retune (Phased, audioelement.h:
    1439-1448; NoteChange path gen.crtp.h:595-618)."""
    TWO32 = 1 << 32
    half = TWO32 >> 1
    io = int(np.round(inc_old * half)) % TWO32
    inew = int(np.round(inc_new * half)) % TWO32
    p0 = int(np.round(phase0_old * half)) % TWO32
    steps = int(t_change) - int(press)  # old-increment steps before t_change
    return ((steps * io + p0 - steps * inew) % TWO32) / half


def _static_itp(codes):
    """Return an int if the curve codes are uniform, else None."""
    if isinstance(codes, (int, np.integer)):
        return int(codes)
    arr = np.asarray(codes)
    if arr.size and (arr == arr.flat[0]).all():
        return int(arr.flat[0])
    return None


# packed float field order
_F_AMP, _F_A, _F_H, _F_D, _F_R, _F_S, _F_TOP, _F_SKIP = range(8)
N_FIELDS = 8


# Block execution strategy: "map" (default) runs blocks through a lax.map
# loop; "vmap" renders all blocks as parallel lanes (blocks are independent
# closed forms), saving ~0.2 ms/step of loop overhead (~0.8 ms on the df32
# chain). vmap is NOT the default because the lane-batched program rounds
# f32 differently from the per-block one, which breaks batch-vs-single
# bit-parity in noise-floor regimes (min_volume=0 note churn,
# tests/test_device_tracker_autotune.py::test_batch_chain_min_volume_zero
# — found by the round-5 serial suite run). Read at import/trace time.
BLOCKS_VMAP = os.environ.get("CPP_AUDIO_SYNTH_BLOCKS", "map") == "vmap"


def voicebank_blocks_impl(fp, ip, up, gains, codes,
                          *, block_size: int, n_blocks: int,
                          a_itp, d_itp, r_itp, out_dtype: str,
                          block_offset=0):
    """Render n_blocks blocks of block_size samples. Returns (nb, B, C).

    fp:    (V, N_FIELDS) working-dtype packed per-voice floats
    ip:    (V, 2) int32 [press, release] (clamped to +-_I32_FAR)
    up:    (V, 2) uint32 [inc_fix, phase0_fix] NCO words
    gains: (V, C) mix gains
    codes: (V, 3) int32 easing codes (used when a/d/r_itp is None)
    block_offset: index of the first block (may be traced — the compact
    per-block path renders one offset block per lax.map step)

    Un-jitted so parallel/mesh.py can wrap it in shard_map (voice sharding).
    """
    def one_block(b):
        return _render_block(b + block_offset, fp, ip, up, gains, codes,
                             block_size=block_size, a_itp=a_itp, d_itp=d_itp,
                             r_itp=r_itp, out_dtype=out_dtype)

    if BLOCKS_VMAP:
        # blocks are independent (closed-form phases/envelopes): vmap runs
        # them as parallel lanes instead of a sequential while loop whose
        # per-step overhead (~0.2 ms) dominates at ~11 blocks per render
        return jax.vmap(one_block)(jnp.arange(n_blocks))
    return jax.lax.map(one_block, jnp.arange(n_blocks))


def _render_block(b, fp, ip, up, gains, codes, *, block_size: int,
                  a_itp, d_itp, r_itp, out_dtype: str):
    """One (V, block_size) synth tile mixed to (block_size, C) — the shared
    body of the dense and per-block-compacted renderers."""
    wdt = jnp.dtype(out_dtype)
    k = jnp.arange(block_size, dtype=wdt)[None, :]
    k_u = jnp.arange(block_size, dtype=jnp.uint32)[None, :]
    nco_scale = jnp.asarray(2.0 ** -31, wdt)  # uint32 counts -> rad/pi units

    press_i = ip[:, 0]
    release_i = ip[:, 1]
    inc_fix = up[:, 0][:, None]
    phase0_fix = up[:, 1]

    def col(i):
        return fp[:, i][:, None]

    ampE, Ae, He, De, Re, Se, topE, skipE = (
        col(i) for i in (_F_AMP, _F_A, _F_H, _F_D, _F_R, _F_S, _F_TOP, _F_SKIP)
    )
    skippedE = skipE > 0.5
    gains_w = gains.astype(wdt)

    def ease_a(x):
        return ease(a_itp, x) if a_itp is not None else ease_select(codes[:, 0:1], x)

    def ease_d(x):
        return ease(d_itp, x) if d_itp is not None else ease_select(codes[:, 1:2], x)

    def ease_r(x):
        return ease(r_itp, x) if r_itp is not None else ease_select(codes[:, 2:3], x)

    b0_i = (b * block_size).astype(jnp.int32)
    # int32 sample arithmetic (wraps only for the NEVER clamp, where the
    # sign still keeps the voice inactive)
    tp0 = (b0_i - press_i).astype(wdt)[:, None]
    tr0 = (b0_i - release_i).astype(wdt)[:, None]
    tp = tp0 + k
    trm = tr0 + k  # t - release
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
    # exact NCO phase: ((b0 - press + 1) + k) * inc + phase0, all mod 2**32
    b0_u = (b * block_size).astype(jnp.uint32)
    base_u = (b0_u - press_i.astype(jnp.uint32) + jnp.uint32(1))[:, None]
    ph_u = (base_u + k_u) * inc_fix + phase0_fix[:, None]
    phases = ph_u.astype(wdt) * nco_scale
    sig = ampE * env * oscillators.sine(phases)
    return oscillators.mixdown(sig, gains_w)


def compact_block_args(args, statics):
    """Per-block active-voice compaction of prepare_bank_arrays output.

    A voice contributes to block b only if its envelope can be nonzero
    there: press < block_end and release + R > block_start (the AHDSR is
    identically zero outside [press, release + R - 1], models above /
    reference include/audioelement.h:960-999). On sparse schedules most
    (voice, block) tiles are silent — the bench workload renders 64 voices
    x 11 blocks but only ~48 voices ever touch one block — so gathering
    each block's active voices into a (n_blocks, V_max) table cuts the
    synth kernel's voice-lanes by the same ratio. V_max is the max active
    count over blocks, padded to a multiple of 8 lanes with inert rows
    (skip=1, press=+FAR). Host-side and exact: dropped rows are exact
    zeros; only the mixdown's f32 summation order changes.

    Returns ((fpb, ipb, upb, gainsb, codesb), statics) with a leading
    n_blocks axis on every array.
    """
    fp, ip, up, gains, codes = (np.asarray(a) for a in args)
    B = statics["block_size"]
    nb = statics["n_blocks"]
    press = ip[:, 0].astype(np.float64)
    release = ip[:, 1].astype(np.float64)
    R = fp[:, _F_R].astype(np.float64)
    skip = fp[:, _F_SKIP] > 0.5
    lists = [np.nonzero((press < (b + 1) * B)
                        & (release + R > b * B) & ~skip)[0]
             for b in range(nb)]
    vmax = max(8, -(-max((len(a) for a in lists), default=1) // 8) * 8)

    def gather(src, fill):
        out = np.full((nb, vmax) + src.shape[1:], fill, src.dtype)
        for b, idx in enumerate(lists):
            out[b, : len(idx)] = src[idx]
        return out

    fpb = gather(fp, 0.0)
    for b, idx in enumerate(lists):  # inert pad rows
        fpb[b, len(idx):, _F_SKIP] = 1.0
        fpb[b, len(idx):, _F_A] = 1.0
        fpb[b, len(idx):, _F_R] = 1.0
    ipb = gather(ip, _I32_FAR)
    upb = gather(up, 0)
    gainsb = gather(gains, 0.0)
    codesb = gather(codes, 0)
    return (fpb, ipb, upb, gainsb, codesb), statics


def voicebank_blocks_compact_impl(fpb, ipb, upb, gainsb, codesb,
                                  *, block_size: int, n_blocks: int,
                                  a_itp, d_itp, r_itp, out_dtype: str):
    """voicebank_blocks_impl over per-block compacted voice tables
    (compact_block_args): lax.map carries each block's own (V_max, ...)
    parameter rows alongside the block index."""
    def one(xs):
        b, fp, ip, up, gains, codes = xs
        return _render_block(b, fp, ip, up, gains, codes,
                             block_size=block_size, a_itp=a_itp, d_itp=d_itp,
                             r_itp=r_itp, out_dtype=out_dtype)

    xs = (jnp.arange(n_blocks), fpb, ipb, upb, gainsb, codesb)
    if BLOCKS_VMAP:
        return jax.vmap(one)(xs)
    return jax.lax.map(one, xs)


_voicebank_blocks = jax.jit(
    voicebank_blocks_impl,
    static_argnames=("block_size", "n_blocks", "a_itp", "d_itp", "r_itp", "out_dtype"),
)


def prepare_bank_arrays(bank: VoiceBank, n_samples: int, block_size: int,
                        dtype: str = "float32"):
    """Host-side precompute shared by single-chip and sharded renderers.

    Returns (array_args tuple for voicebank_blocks_impl, static kwargs dict).
    """
    A, H, D, R, S, release, skipped, top = _host_envelope_derived(bank)

    TWO32 = 1 << 32
    inc_fix = np.round(bank.increment * (TWO32 / 2.0)).astype(np.int64) % TWO32
    phase0_fix = np.round(bank.phase0 * (TWO32 / 2.0)).astype(np.int64) % TWO32
    press_i = np.clip(bank.press, -_I32_FAR, _I32_FAR).astype(np.int64)
    release_i = np.clip(release, -_I32_FAR, _I32_FAR).astype(np.int64)

    fp = np.stack(
        [bank.amp, A, H, D, R, S, top, skipped.astype(np.float64)], axis=1
    ).astype(np.dtype(dtype))
    ip = np.stack([press_i, release_i], axis=1).astype(np.int32)
    up = np.stack([inc_fix, phase0_fix], axis=1).astype(np.uint32)
    codes3 = np.stack(
        [np.broadcast_to(np.asarray(c, np.int32), (bank.n_rows,))
         for c in (bank.attack_itp, bank.decay_itp, bank.release_itp)], axis=1
    )
    args = (
        jnp.asarray(fp), jnp.asarray(ip), jnp.asarray(up),
        jnp.asarray(bank.gains, np.dtype(dtype)), jnp.asarray(codes3),
    )
    statics = dict(
        block_size=block_size,
        n_blocks=(n_samples + block_size - 1) // block_size,
        a_itp=_static_itp(bank.attack_itp),
        d_itp=_static_itp(bank.decay_itp),
        r_itp=_static_itp(bank.release_itp),
    )
    return args, statics


def render_bank(bank: VoiceBank, n_samples: int, *, block_size: int = 32768,
                dtype: str = "float32", use_pallas: str = "auto") -> np.ndarray:
    """Offline render of a VoiceBank -> (n_samples, C) numpy array.

    use_pallas: 'auto' takes the fused Pallas TPU kernel
    (ops/pallas_voicebank.py) when eligible (TPU backend, float32, uniform
    LINEAR envelope curves); 'never'/'always' force the path.
    """
    args, statics = prepare_bank_arrays(bank, n_samples, block_size, dtype)
    nb = statics["n_blocks"]
    linear = all(statics[k] == int(Itp.LINEAR) for k in ("a_itp", "d_itp", "r_itp"))
    # very wide banks would blow the fused kernel's VMEM budget (each (V, B)
    # tile shrinks B below a useful lane width) — the XLA path handles them
    eligible = linear and dtype == "float32" and bank.n_rows <= 1024
    if use_pallas == "auto":
        import jax

        eligible = eligible and jax.default_backend() == "tpu"
    if (use_pallas == "always") or (use_pallas == "auto" and eligible):
        from ..ops.pallas_voicebank import render_blocks_pallas

        fp, ip, up, gains, _codes = args
        out = render_blocks_pallas(fp, ip, up, gains, block_size=block_size,
                                   n_blocks=nb)
        return np.asarray(out)[:n_samples]
    out = _voicebank_blocks(*args, out_dtype=dtype, **statics)
    return np.asarray(out).reshape(nb * block_size, -1)[:n_samples]


def _slice_bank(bank: VoiceBank, idx: np.ndarray, pad_rows: int,
                time_shift: float) -> VoiceBank:
    """Sub-bank of `idx` rows, shifted by -time_shift, padded with inert rows.

    Shifting press/release (and the render window) together is exact: both
    the NCO phase (phase0 + (t - press + 1)*inc) and the envelope depend only
    on t - press / t - release.
    """
    def take(a, fill=0.0):
        a = np.asarray(a)
        if a.ndim == 0:
            return a
        out = np.full((pad_rows,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(idx)] = a[idx]
        return out

    def take_itp(c):
        return int(c) if isinstance(c, (int, np.integer)) else take(c, int(Itp.LINEAR))

    # floor BEFORE shifting: prepare_bank_arrays truncates toward zero, so a
    # fractional press that turns negative after the shift would otherwise
    # round the other way (one-sample offset vs the dense render)
    return VoiceBank(
        press=np.floor(take(bank.press, NEVER)) - time_shift,
        release=np.floor(take(bank.release, NEVER)) - time_shift,
        increment=take(bank.increment, 1.0),
        phase0=take(bank.phase0),
        amp=take(bank.amp),
        gains=take(bank.gains),
        attack=take(bank.attack, 1.0),
        hold=take(bank.hold),
        decay=take(bank.decay, 1.0),
        release_len=take(bank.release_len, 1.0),
        sustain=take(bank.sustain, 1.0),
        attack_itp=take_itp(bank.attack_itp),
        decay_itp=take_itp(bank.decay_itp),
        release_itp=take_itp(bank.release_itp),
        auto_release=bank.auto_release,
    )


def render_bank_sparse(bank: VoiceBank, n_samples: int, *,
                       segment_size: int = 1 << 18, block_size: int = 32768,
                       dtype: str = "float32", use_pallas: str = "auto",
                       dense_rows: int = 256) -> np.ndarray:
    """render_bank for long, sparse schedules (rain streams, sonified files,
    whole scores): partition the timeline into segments and render each with
    only the voices whose [press, release+R] interval overlaps it.

    The dense kernel is O(V * T); with many short notes spread over a long
    piece this is O(sum_seg V_active(seg) * segment) — the TPU-native
    equivalent of the reference's voice pool reusing 127 slots
    (gen.crtp.h:221-225) instead of one slot per note ever played.
    Row counts are padded to power-of-two buckets to bound compile count.
    """
    V = bank.n_rows
    if V <= dense_rows or n_samples <= segment_size:
        return render_bank(bank, n_samples, block_size=block_size,
                           dtype=dtype, use_pallas=use_pallas)
    min_change = np.floor(0.5 + 2.5 * 2.0 / np.maximum(np.abs(bank.increment), 1e-9))
    R = np.maximum(np.maximum(bank.release_len, min_change), 1.0)
    end = np.minimum(bank.release, float(n_samples)) + R + 2.0
    C = bank.gains.shape[1]
    out = np.zeros((n_samples, C), dtype=np.dtype(dtype))
    seg_block = min(block_size, segment_size)
    for t0 in range(0, n_samples, segment_size):
        t1 = min(n_samples, t0 + segment_size)
        idx = np.nonzero((bank.press < t1) & (end > t0))[0]
        if idx.size == 0:
            continue
        rows = max(8, 1 << int(np.ceil(np.log2(idx.size))))
        sub = _slice_bank(bank, idx, rows, float(t0))
        seg = render_bank(sub, segment_size, block_size=seg_block,
                          dtype=dtype, use_pallas=use_pallas)
        out[t0:t1] += seg[: t1 - t0]
    return out
