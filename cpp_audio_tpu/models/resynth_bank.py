"""Tracked-note renderer: voices with control-rate frequency/volume targets.

This is the TPU-native ResynthElement (source/rt.resynth.lib.cpp:6-19):
    StereoPanned< VolumeAdjusted< Enveloped< FreqCtrl_< Sine,
        InterpolatedFreq >, AHDSR > > >
Every analysis stride the pitch tracker retargets a voice's frequency and
volume (NoteChange). Per stride the reference then:
  - glides frequency from the previous value to the target exponentially in
    pitch over exactly `stride` samples (InterpolatedFreq with the
    PROPORTIONAL_VALUE_DERIVATIVE trick, include/audioelement.h:2706-2817;
    setup(stride, LINEAR) in ResynthElementInitializer,
    rt.resynth.lib.cpp:106-110)
  - low-passes the volume toward the target with per-sample speed capped at
    max_filter_increment = 2/stride (rt.resynth.lib.cpp:100-104 +
    BaseVolumeAdjusted::step, audioelement.h:1195-1216)

Measured delta vs the reference (tests/test_reference_oracle.py::
TestInterpolatedFreqOracle, against the COMPILED reference code): the
reference steps a discrete proportional recurrence whose next glide starts
from the last *emitted* value (*f_result); this model glides continuously
from the previous *target*. Frequency deviation stays < 0.05% relative
(< 1 cent) per retarget — the from-value chain is a nonlinear per-note
sequential recurrence that would force a frame-serial scan and defeat the
frame-parallel tracker (a measured 2-3x whole-chain win), so the
approximation is kept deliberately.

Closed forms per control frame (f(t) = from * exp(lambda*t),
lambda = ln(to/from)/stride):
  phase advance  Dphi(k) = (from/lambda) * expm1(lambda * k)
  volume         v(k)    = target + (v_boundary - target) * (1-alpha)^(k+1)
so the whole tile is elementwise — no per-sample recurrence. Frame-boundary
phases and volumes are tiny recurrences computed exactly on the host in f64.

Layout: like the reference's fixed 127-voice pool (rt.resynth.lib.cpp:208),
notes are packed into polyphony SLOTS. The kernel renders (n_slots, stride)
per control frame — work is proportional to polyphony x time, not to the
total number of tracked notes (which can be 10-100x larger).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import envelopes, oscillators
from ..utils.interp import Itp

# max frames per lax.map step in _render_slots. Chunks are sized by ceil
# division so short renders run as ONE un-padded vmap (the 60 s bench table
# is 673 frames: one chunk, no loop, no pad — measured 3.32 vs 3.74 ms for
# 128-frame chunks whose padding adds 14% dead frames on a v5e). XLA fuses
# the per-frame body into the mixdown dot, so the nominal (C, P, stride)
# intermediate is never materialized.
_RENDER_CHUNK = 1024

NEVER_FRAME = 10**9
# packed per-(frame, slot) field order
(_F_INC, _F_RATIO, _F_PHB, _F_VTGT, _F_VB, _F_ALPHA, _F_TP0, _F_TR0,
 _F_TOP, _F_A, _F_H, _F_D, _F_SUS, _F_R, _F_GL, _F_GR) = range(16)
N_FIELDS = 16


@dataclass
class TrackedNote:
    """One tracked voice: control-point trail on the analysis grid.

    frames[i] is (control_frame_index, frequency_hz, volume); the first entry
    is the NoteOn. release_frame is the control frame of the NoteOff
    (NEVER_FRAME if the note still plays at the end).
    """

    frames: list
    release_frame: int = NEVER_FRAME
    pan: float = 0.0
    # start angle (rad/pi) assigned at NoteOn; None = draw from the slot
    # packer's sequential pool (stable draw_indexing assigns it here)
    phase: float | None = None


@dataclass(frozen=True)
class TrackedRenderConfig:
    sample_rate: int
    stride: int                     # samples per control frame
    start_sample: int = 0           # absolute sample of control frame 0
    ahdsr: envelopes.AHDSR = None   # type: ignore[assignment]
    n_channels: int = 2
    n_slots: int = 128              # polyphony (reference: 127 voices)
    dtype: str = "float32"
    # oracle replay: start angles in rad/pi consumed per packed note in
    # note-on order (mersenne<SEEDED::Yes> stream, gen.crtp.h:152);
    # None = numpy RNG(0)
    phase_draw_values: object = None

    def __post_init__(self):
        if self.ahdsr is None:
            # rt.resynth defaults: 0s AHDSR, sustain 1 (rt.resynth.lib.cpp:957-961)
            # -> 1ms floors via AllowZeroAttack::No
            object.__setattr__(
                self, "ahdsr",
                envelopes.AHDSR(attack=0, hold=0, decay=0, release=0, sustain=1.0,
                                attack_itp=int(Itp.LINEAR), decay_itp=int(Itp.LINEAR),
                                release_itp=int(Itp.LINEAR)).with_min_dt(self.sample_rate),
            )


def _note_windows(notes, n_frames, config):
    """Per-note effective frame window [f0, f1) incl. the release tail,
    plus effective envelope params (reference floors: 1 ms + 2.5 periods)."""
    sr = config.sample_rate
    S = config.stride
    a = config.ahdsr
    min_dt = sr / 1000.0
    sus_raw = float(np.asarray(a.sustain))
    has_decay = sus_raw < 0.999999
    sus = min(max(sus_raw, 0.0), 1.0) if has_decay else 1.0
    wins = []
    for note in notes:
        f0 = note.frames[0][0]
        init_inc = 2.0 * note.frames[0][1] / sr
        min_change = np.floor(0.5 + 2.5 * 2.0 / max(abs(init_inc), 1e-9))
        A = max(float(np.max(np.asarray(a.attack))), min_dt, min_change, 1.0)
        H = max(float(np.max(np.asarray(a.hold))), 0.0)
        D = max(float(np.max(np.asarray(a.decay))), min_dt, min_change, 1.0) if has_decay else 0.0
        R = max(float(np.max(np.asarray(a.release))), min_dt, min_change, 1.0)
        rel_f = min(note.release_frame, n_frames)
        # active until release + R samples
        f1 = min(n_frames, rel_f + int(np.ceil(R / S)) + 1)
        wins.append((f0, f1, A, H, D, sus, R, rel_f))
    return wins


def _build_slot_tables(notes: list[TrackedNote], n_frames: int,
                       config: TrackedRenderConfig):
    """Pack notes into polyphony slots; emit (n_frames, n_slots, N_FIELDS)."""
    P = config.n_slots
    S = config.stride
    sr = config.sample_rate
    sus = float(np.asarray(config.ahdsr.sustain))

    table = np.zeros((n_frames, P, N_FIELDS))
    table[:, :, _F_INC] = 1e-6
    table[:, :, _F_A] = 1.0
    table[:, :, _F_D] = 0.0
    table[:, :, _F_SUS] = 1.0
    table[:, :, _F_R] = 1.0
    table[:, :, _F_TP0] = -1e9  # inactive: tp < 0 -> env 0

    wins = _note_windows(notes, n_frames, config)
    slot_free_at = np.zeros(P, dtype=np.int64)  # frame at which slot is free
    order = np.argsort([w[0] for w in wins], kind="stable")
    rng = np.random.default_rng(0)
    phase_vals = (None if config.phase_draw_values is None
                  else np.asarray(config.phase_draw_values, np.float64))
    phase_i = 0
    FAR = 1e12

    def env_pressed(tp, A, H, D, sus):
        if tp < A:
            return min(max((tp + 1.0) / A, 0.0), 1.0)
        if tp < A + H:
            return 1.0
        if D and tp < A + H + D:
            return 1.0 + (sus - 1.0) * min((tp - A - H + 1.0) / D, 1.0)
        return sus

    for ni in order:
        note = notes[ni]
        f0, f1, A, H, D, sus, R, rel_f = wins[ni]
        if f0 >= n_frames or f1 <= f0:
            continue
        cand = np.nonzero(slot_free_at <= f0)[0]
        if len(cand) == 0:
            continue  # polyphony exceeded: drop (reference onDroppedNote)
        slot = int(cand[0])
        slot_free_at[slot] = f1

        press = f0 * S
        release = note.release_frame * S if note.release_frame < NEVER_FRAME else FAR
        top = env_pressed(release - 1.0 - press, A, H, D, sus) if release < FAR else sus

        th = 0.25 * np.pi * (note.pan + 1.0)
        gl, gr = np.cos(th), np.sin(th)

        # control trail across the note's frames
        if note.phase is not None:
            phase = float(note.phase) % 2.0  # stable draw_indexing
        elif phase_vals is not None and phase_i < len(phase_vals):
            phase = float(phase_vals[phase_i]) % 2.0
            phase_i += 1
        else:
            phase = rng.uniform(0.0, 2.0)  # DefaultStartPhase::Random
            phase_i += 1
        i = 0
        cur_f, cur_v = note.frames[0][1], note.frames[0][2]
        prev_inc = 2.0 * cur_f / sr
        vol_b = cur_v  # volume filter inits at target
        for c in range(f0, f1):
            if i + 1 < len(note.frames) and note.frames[i + 1][0] <= c:
                i += 1
                cur_f, cur_v = note.frames[i][1], note.frames[i][2]
            inc_to = 2.0 * cur_f / sr
            inc_from = prev_inc if c > f0 else inc_to
            ratio = np.log(inc_to / inc_from) if inc_to != inc_from else 0.0
            inc_eff = min(2.0 / S, abs(inc_to))
            alpha = 1.0 - np.exp(-np.pi * inc_eff)

            row = table[c, slot]
            row[_F_INC] = inc_from
            row[_F_RATIO] = ratio
            row[_F_PHB] = phase
            row[_F_VTGT] = cur_v
            row[_F_VB] = vol_b
            row[_F_ALPHA] = alpha
            row[_F_TP0] = c * S - press
            row[_F_TR0] = max(c * S - release, -FAR)
            row[_F_TOP] = top
            row[_F_A] = A
            row[_F_H] = H
            row[_F_D] = D
            row[_F_SUS] = sus
            row[_F_R] = R
            row[_F_GL] = gl
            row[_F_GR] = gr

            # advance boundary state exactly (f64 host)
            dphi = (inc_from / (ratio / S)) * np.expm1(ratio) if ratio else S * inc_from
            phase = (phase + dphi) % 2.0
            vol_b = cur_v + (vol_b - cur_v) * (1.0 - alpha) ** S
            prev_inc = inc_to
    return table


@functools.partial(jax.jit, static_argnames=("stride", "n_channels", "dtype",
                                             "split", "min_block",
                                             "channel_major"))
def _render_slots(table, *, stride: int, n_channels: int, dtype: str,
                  split: int = 48, min_block: int = 64,
                  channel_major: bool = False):
    """(n_frames, P, N_FIELDS) -> (n_frames, stride, C).

    Slot tables pack active rows first (both the host builders and the
    device tracker), so when P > `split` the upper slots are usually all
    empty: render them under a lax.cond that skips the work entirely unless
    some row is live (polyphony above `split` voices). split=48 covers the
    bench workload's measured peak of 48 concurrent rows (notes + release
    tails) with zero fired conds; heavier polyphony fires the cond and
    recurses in further `split`-row ladder steps. A finer per-16-slot cond
    ladder was measured NET-NEGATIVE on a v5e: each FIRED lax.cond carries
    ~0.4-0.9 ms of branch-dispatch overhead vs ~0.3 ms for the 16-slot
    render it gates — unfired conds are nearly free, which is why one
    boundary just above typical polyphony wins. (min_block is kept for API
    compatibility; the vmapped batch path passes it to signal no inner
    conds, which the single coarse split already satisfies.)
    """
    if table.shape[1] > split:
        lo = _render_slots(table[:, :split], stride=stride,
                           n_channels=n_channels, dtype=dtype, split=split,
                           channel_major=channel_major)
        hi_tab = table[:, split:]
        live = jnp.any((hi_tab[:, :, _F_VTGT] != 0)
                       | (hi_tab[:, :, _F_VB] != 0))
        hi = jax.lax.cond(
            live,
            lambda t: _render_slots(t, stride=stride, n_channels=n_channels,
                                    dtype=dtype, split=split,
                                    channel_major=channel_major),
            lambda t: jnp.zeros_like(lo), hi_tab)
        return lo + hi
    wdt = jnp.dtype(dtype)
    S = stride
    k = jnp.arange(S, dtype=wdt)[None, :]
    # 17-field tables carry the df32 lo limb of the row increment
    # (analysis/device_tracker._build_tables_parallel_df): the per-sample
    # phase advance is then computed to ~1e-9 cycles instead of f32's
    # ~1e-5 at multi-cycle strides — the last ~-85 dB render error term
    # (tools/fidelity_budget.py case F).
    df_phase = table.shape[2] >= 17

    def one_frame(tab):
        tab = tab.astype(wdt)
        df = df_phase and wdt == jnp.float32
        if df:
            # 3-D (slot, k1, k0) lane layout (see the phase split below):
            # EVERYTHING stays in this layout through the mixdown — an
            # earlier flat-reshape variant broke XLA's render mega-fusion
            # (a materialized phase tensor + a 510 MB layout copy before
            # the mixdown dot, +2.5 ms on a v5e)
            # B1 = 128: the k0 axis is the MINOR dim of every lane tensor —
            # it must fill the TPU's 128-lane tiles (B1 = 63 measured ~2x
            # slower: half of every (8,128) tile padded dead)
            B1 = 128
            n1 = -(-S // B1)
            col = lambda i: tab[:, i][:, None, None]
            k1i = jnp.arange(n1, dtype=wdt)[None, :, None]
            k0i = jnp.arange(B1, dtype=wdt)[None, None, :]
            kk = B1 * k1i + k0i
        else:
            col = lambda i: tab[:, i][:, None]
            kk = k
        (incf, ratio, phb, vtgt, vb, alpha, tp0, tr0, top, A, H, D, sus, R) = (
            col(i) for i in range(14))
        gains = tab[:, _F_GL:_F_GR + 1]

        lam = ratio / S
        small = jnp.abs(ratio) < 1e-7
        if df:
            from ..ops import df32 as dfm

            inclo = col(16)
            # adv = incf*(k+1)*(1 + x*h(x)), x = lam*(k+1): the linear part
            # (k+1)*INC spans up to ~hundreds of cycles and needs df32 mod-2
            # — but NOT per sample. Split k+1 = B1*k1 + (k0+1): the coarse
            # advance B1*k1*INC runs in df32 mod 2 on the B1x-decimated
            # (P, n1, 1) grid (a ~55-flop df32 mod per COARSE lane instead
            # of per sample — this elementwise block was the df32 chain's
            # single largest fusion, 4.6 ms vs the f32 chain's 2.4 on a
            # v5e); the fine advance (k0+1)*INC stays under ~B1 cycles, so
            # plain f32 keeps its absolute error below ~2^-24*B1*inc
            # (~3e-6 rad/pi worst at Nyquist-grade increments, -100 dB-class
            # on rendered audio; measured -117.8 dB vs the f64 renderer on
            # synthetic tables). The glide correction term is small
            # (<= a few cycles) and runs in f32: h(x) = (expm1(x)/x - 1)/x
            # as a degree-8 series — glide ratios are bounded by the
            # tracker's max_track_pitches.
            ch_, cl_ = dfm.mod2(dfm.mul_f32((incf, inclo),
                                            jnp.float32(B1) * k1i))
            fine = (k0i + 1.0) * incf + (k0i + 1.0) * inclo
            lin = phb + ch_ + (cl_ + fine)
            x = lam * (kk + 1.0)
            h32 = (0.5 + x * (1.0 / 6.0 + x * (1.0 / 24.0 + x * (
                1.0 / 120.0 + x * (1.0 / 720.0 + x * (1.0 / 5040.0 + x * (
                    1.0 / 40320.0 + x * (1.0 / 362880.0
                                         + x / 3628800.0))))))))
            corr = jnp.where(small, 0.0, incf * (kk + 1.0) * (x * h32))
            phases = oscillators.wrap_phase(lin + corr)
        else:
            if df_phase:
                incf = incf + col(16)  # f64 verification render of a df table
            adv = jnp.where(
                small, incf * (kk + 1.0),
                (incf / jnp.where(small, 1.0, lam))
                * jnp.expm1(lam * (kk + 1.0)),
            )
            phases = oscillators.wrap_phase(phb + adv)
        # power(1-alpha, k+1) lowers to exp((k+1)*log(1-alpha)) per ELEMENT;
        # the log operand is a per-slot scalar — hoist it so the lane loop
        # pays one exp, not exp+log, per slot-sample
        if df:
            # same range split as the phases: exp((k+1)c) =
            # exp(B1*k1*c) * exp((k0+1)c) — two decimated exps + one
            # multiply per lane instead of a transcendental per lane
            lnap = jnp.log1p(-alpha)
            e1 = jnp.exp((jnp.float32(B1) * k1i) * lnap)
            e0 = jnp.exp((k0i + 1.0) * lnap)
            vol = vtgt + (vb - vtgt) * (e1 * e0)
        else:
            vol = vtgt + (vb - vtgt) * jnp.exp((kk + 1.0)
                                               * jnp.log1p(-alpha))
        tp = tp0 + kk
        trm = tr0 + kk
        va = jnp.clip((tp + 1.0) / A, 0.0, 1.0)
        vd = 1.0 + (sus - 1.0) * jnp.clip((tp - A - H + 1.0) / jnp.maximum(D, 1.0),
                                          0.0, 1.0)
        pressed = jnp.where(
            tp < A, va, jnp.where(tp < A + H, 1.0, jnp.where(tp < A + H + D, vd, sus))
        )
        rel = top * (1.0 - jnp.clip((trm + 1.0) / R, 0.0, 1.0))
        env = jnp.where(tp < 0, 0.0, jnp.where(trm < 0, pressed, rel))
        # anti-alias gain at the frame-midpoint increment (a per-slot scalar):
        # within one ~90 ms frame the increment moves a fraction of a
        # semitone, and the gain is exactly 1 below ~0.45*Nyquist anyway —
        # per-sample evaluation would cost one exp per lane-sample
        mid_inc = incf * jnp.exp(lam * (S * 0.5))
        aliasing = oscillators.freq_aliasing_multiplicator(mid_inc)
        sig = vol * env * aliasing * oscillators.sine(phases)
        if channel_major:
            # (C, S) mixdown: the fused chain keeps the long time axis minor
            # so XLA never has to transpose the (T, 2) result into the
            # channel-major output layout it prefers (a ~1 ms whole-render
            # copy on a v5e)
            # precision=HIGHEST: the default f32 matmul on TPU is bf16-grade
            # and this is the FINAL op — it was injecting ~-53 dB into every
            # render (round-4 isolation: CPU f32 kernel -127 dB vs f64, TPU
            # same graph -53 dB until this fix)
            if df:
                # 3-D lanes contract directly (free dims a,b flatten inside
                # the dot); only the small (C, n1*B1) RESULT reshapes
                out = jnp.einsum("pab,pc->cab", sig, gains,
                                 preferred_element_type=sig.dtype,
                                 precision=jax.lax.Precision.HIGHEST)
                return out.reshape(out.shape[0], -1)[:, :S]
            return jnp.einsum("ps,pc->cs", sig, gains,
                              preferred_element_type=sig.dtype,
                              precision=jax.lax.Precision.HIGHEST)
        if df:
            sig = sig.reshape(sig.shape[0], -1)[:, :S]
        return oscillators.mixdown(sig, gains)

    # chunked map: lax.map alone would run n_frames tiny sequential device
    # steps (per-step dispatch dominates); an unchunked vmap of a very long
    # render would put GB-scale buffers in flight. Ceil division picks the
    # fewest equal chunks <= _RENDER_CHUNK so short renders are ONE un-padded
    # vmap and long ones pad by at most one chunk's worth across the run.
    n = table.shape[0]
    n_chunks = -(-n // _RENDER_CHUNK)
    C = -(-n // n_chunks)
    pad = n_chunks * C - n
    tp = jnp.pad(table, ((0, pad), (0, 0), (0, 0)))
    chunks = tp.reshape(-1, C, *tp.shape[1:])
    if n_chunks == 1:
        out = jax.vmap(one_frame)(chunks[0])[None]
    else:
        out = jax.lax.map(jax.vmap(one_frame), chunks)
    if channel_major:
        # (nc, C, ch, S) -> (ch, nc, C, S) -> (ch, n, S): time stays the
        # minor axis throughout
        out = jnp.moveaxis(out, 2, 0)
        return out.reshape(out.shape[0], -1, S)[:, :n]
    return out.reshape(-1, *out.shape[2:])[:n]


def render_table(table: np.ndarray, config: TrackedRenderConfig,
                 device_out: bool = False) -> np.ndarray:
    """Render a prebuilt (total_frames, n_slots, N_FIELDS) control table
    (from _build_slot_tables or the fused C++ builder,
    native/pitchpipe.cpp pitchpipe_run_offline)."""
    total_frames = table.shape[0]
    dt = np.dtype(config.dtype)
    out = _render_slots(jnp.asarray(table, dt), stride=config.stride,
                        n_channels=config.n_channels, dtype=config.dtype)
    body = out.reshape(total_frames * config.stride, -1)
    if config.n_channels != body.shape[1]:
        body = body[:, : config.n_channels]
    if device_out:
        padded = jnp.pad(body, ((config.start_sample, 0), (0, 0)))
        return padded
    body = np.asarray(body)
    lead = np.zeros((config.start_sample, body.shape[1]), body.dtype)
    return np.concatenate([lead, body], axis=0)


def render_tracked(notes: list[TrackedNote], n_frames: int,
                   config: TrackedRenderConfig, tail_frames: int = 8,
                   device_out: bool = False) -> np.ndarray:
    """Render tracked notes -> (start_sample + (n_frames+tail)*stride, C).

    device_out=True returns the jax array without a host transfer (for
    pipelines that keep post-processing on device)."""
    total_frames = n_frames + tail_frames
    table = _build_slot_tables(notes, total_frames, config)
    return render_table(table, config, device_out=device_out)
