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

Closed forms per control frame (f(t) = from * exp(lambda*t),
lambda = ln(to/from)/stride):
  phase advance  Dphi(k) = (from/lambda) * expm1(lambda * k)
  volume         v(k)    = target + (v_boundary - target) * (1-alpha)^(k+1)
so the whole (voices, stride) tile is elementwise — no per-sample recurrence.
Frame-boundary phases and volumes are tiny (V, n_frames) recurrences computed
exactly on the host in f64.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import envelopes, oscillators
from ..utils.interp import Itp
from ..ops.filters import alpha_from_angle_increment

NEVER_FRAME = 10**9


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


@dataclass(frozen=True)
class TrackedRenderConfig:
    sample_rate: int
    stride: int                     # samples per control frame
    start_sample: int = 0           # absolute sample of control frame 0
    ahdsr: envelopes.AHDSR = None   # type: ignore[assignment]
    n_channels: int = 2
    dtype: str = "float32"

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


def _build_tables(notes: list[TrackedNote], n_frames: int, config: TrackedRenderConfig,
                  pad_to: int = 8):
    """Dense (V, n_frames) from/to freq + volume-target tables + boundaries."""
    V = max(pad_to, ((len(notes) + pad_to - 1) // pad_to) * pad_to)
    S = config.stride
    sr = config.sample_rate

    freq_to = np.ones((V, n_frames))
    vol_tgt = np.zeros((V, n_frames))
    press_f = np.full(V, NEVER_FRAME, dtype=np.int64)
    release_f = np.full(V, NEVER_FRAME, dtype=np.int64)
    pan = np.zeros(V)

    for v, note in enumerate(notes):
        assert note.frames, "empty tracked note"
        f0 = note.frames[0][0]
        press_f[v] = f0
        release_f[v] = note.release_frame
        pan[v] = note.pan
        cur_freq, cur_vol = note.frames[0][1], note.frames[0][2]
        i = 0
        for c in range(f0, n_frames):
            if i + 1 < len(note.frames) and note.frames[i + 1][0] <= c:
                i += 1
                cur_freq, cur_vol = note.frames[i][1], note.frames[i][2]
            freq_to[v, c] = cur_freq
            vol_tgt[v, c] = cur_vol

    # glide endpoints: 'from' is the previous frame's target (the glide always
    # completes within one stride); the first frame starts at its own target
    freq_from = np.concatenate([freq_to[:, :1], freq_to[:, :-1]], axis=1)
    first = np.arange(n_frames)[None, :] == press_f[:, None]
    freq_from = np.where(first, freq_to, freq_from)
    # before press: hold own target (inactive anyway, envelope = 0)
    inactive = np.arange(n_frames)[None, :] < press_f[:, None]
    freq_from = np.where(inactive, freq_to, freq_from)

    inc_from = 2.0 * freq_from / sr
    inc_to = 2.0 * freq_to / sr
    ratio = np.log(inc_to / inc_from)
    lam = ratio / S  # exponential-in-pitch rate; 0 when from == to
    # per-frame phase advance (rad/pi): (inc_from/lam)*expm1(lam*S), limit S*inc
    with np.errstate(divide="ignore", invalid="ignore"):
        dphi = np.where(np.abs(ratio) < 1e-12, S * inc_from,
                        (inc_from / np.where(lam == 0, 1.0, lam)) * np.expm1(ratio))
    # boundary phase: random start (DefaultStartPhase::Random) at press frame
    rng = np.random.default_rng(0)
    phase_at_press = rng.uniform(0.0, 2.0, V)
    cum = np.cumsum(dphi, axis=1) - dphi  # phase advance accumulated before frame c
    cum_at_press = np.take_along_axis(cum, np.minimum(press_f, n_frames - 1)[:, None], axis=1)
    phase_b = np.mod(phase_at_press[:, None] + cum - cum_at_press, 2.0)

    # volume boundary recurrence: alpha from capped increment
    inc_eff = np.minimum(2.0 / S, np.abs(inc_to))
    alpha = 1.0 - np.exp(-np.pi * inc_eff)
    decay_s = (1.0 - alpha) ** S
    vol_b = np.zeros((V, n_frames))
    prev = np.zeros(V)
    started = np.zeros(V, dtype=bool)
    for c in range(n_frames):
        is_press = press_f == c
        prev = np.where(is_press, vol_tgt[:, c], prev)  # filter inits at target
        started |= is_press
        vol_b[:, c] = prev
        prev = vol_tgt[:, c] + (prev - vol_tgt[:, c]) * decay_s[:, c]

    th = 0.25 * np.pi * (pan + 1.0)
    gains = np.stack([np.cos(th), np.sin(th)], axis=1)[:, : config.n_channels]
    if config.n_channels == 1:
        gains = np.ones((V, 1))

    return dict(
        inc_from=inc_from, lam_ratio=ratio, dphi=dphi, phase_b=phase_b,
        vol_tgt=vol_tgt, vol_b=vol_b, alpha=alpha, gains=gains,
        # press/release are relative to control frame 0 (the zero lead of
        # start_sample samples is prepended after rendering)
        press=press_f * S,
        release=np.minimum(release_f, NEVER_FRAME) * S,
        press_f=press_f,
    )


@functools.partial(jax.jit, static_argnames=("stride", "n_frames", "dtype"))
def _render_tracked(inc_from, lam_ratio, phase_b, vol_tgt, vol_b, alpha, gains,
                    fp, ip, *, stride: int, n_frames: int, dtype: str):
    wdt = jnp.dtype(dtype)
    S = stride
    k = jnp.arange(S, dtype=wdt)[None, :]

    press_i = ip[:, 0]
    release_i = ip[:, 1]
    A, H, D, R, Sus, top, skipped = (fp[:, i][:, None] for i in range(7))
    skipped_b = skipped > 0.5

    def one_frame(c):
        incf = inc_from[:, c][:, None]
        ratio = lam_ratio[:, c][:, None]
        lam = ratio / S
        # phase advance after k+1 samples of the glide
        small = jnp.abs(ratio) < 1e-7
        adv = jnp.where(
            small,
            incf * (k + 1.0),
            (incf / jnp.where(small, 1.0, lam)) * jnp.expm1(lam * (k + 1.0)),
        )
        phases = oscillators.wrap_phase(phase_b[:, c][:, None] + adv)
        # volume one-pole toward target
        a = alpha[:, c][:, None]
        vol = vol_tgt[:, c][:, None] + (
            (vol_b[:, c] - vol_tgt[:, c])[:, None] * jnp.power(1.0 - a, k + 1.0)
        )
        # envelope (linear curves; rt.resynth uses LINEAR, lib.cpp:75-80)
        t0 = (c * S).astype(jnp.int32)
        tp = (t0 - press_i).astype(wdt)[:, None] + k
        trm = (t0 - release_i).astype(wdt)[:, None] + k
        va = (tp + 1.0) / A
        vd = 1.0 + (Sus - 1.0) * jnp.clip((tp - A - H + 1.0) / jnp.maximum(D, 1.0), 0.0, 1.0)
        pressed = jnp.where(
            tp < A, jnp.clip(va, 0.0, 1.0),
            jnp.where(tp < A + H, 1.0, jnp.where(tp < A + H + D, vd, Sus)),
        )
        rel = top * (1.0 - jnp.clip((trm + 1.0) / R, 0.0, 1.0))
        env = jnp.where(
            (tp < 0) | skipped_b, 0.0,
            jnp.where(trm < 0, pressed, jnp.where(trm + 1.0 < R, rel, 0.0)),
        )
        # aliasing gain on the instantaneous increment
        inst_inc = incf * jnp.exp(lam * (k + 0.5))
        aliasing = oscillators.freq_aliasing_multiplicator(inst_inc)
        sig = vol * env * aliasing * oscillators.sine(phases)
        return oscillators.mixdown(sig, gains)

    return jax.lax.map(one_frame, jnp.arange(n_frames))


def render_tracked(notes: list[TrackedNote], n_frames: int,
                   config: TrackedRenderConfig, tail_frames: int = 8) -> np.ndarray:
    """Render tracked notes -> (start_sample + (n_frames+tail)*stride, C).

    tail_frames extends the render so releases triggered near the end decay.
    """
    total_frames = n_frames + tail_frames
    t = _build_tables(notes, total_frames, config)
    V = t["gains"].shape[0]
    sr = config.sample_rate

    # envelope params with reference floors: >= 1ms (AllowZeroAttack::No) and
    # >= 2.5 periods of the initial frequency (Enveloped min-change)
    a = config.ahdsr
    vec = lambda x: np.broadcast_to(np.asarray(x, np.float64), (V,)).copy()
    init_inc = t["inc_from"][np.arange(V), np.minimum(t["press_f"], total_frames - 1)]
    min_change = 2.5 * 2.0 / np.maximum(np.abs(init_inc), 1e-9)
    min_dt = sr / 1000.0
    A = np.maximum(np.maximum(vec(a.attack), min_dt), np.maximum(min_change, 1.0))
    H = np.maximum(vec(a.hold), 0.0)
    sus = vec(a.sustain)
    has_decay = sus < 0.999999
    Sus = np.where(has_decay, np.clip(sus, 0, 1), 1.0)
    D = np.where(has_decay, np.maximum(np.maximum(vec(a.decay), min_dt), min_change), 0.0)
    R = np.maximum(np.maximum(vec(a.release), min_dt), min_change)

    press = t["press"].astype(np.float64)
    release = t["release"].astype(np.float64)
    skipped = release <= press
    tp_rel = release - 1.0 - press
    # linear curves for top value
    va = np.clip((tp_rel + 1.0) / A, 0.0, 1.0)
    vd = 1.0 + (Sus - 1.0) * np.clip((tp_rel - A - H + 1.0) / np.maximum(D, 1.0), 0.0, 1.0)
    top = np.where(tp_rel < A, va, np.where(tp_rel < A + H, 1.0,
                   np.where(tp_rel < A + H + D, vd, Sus)))

    fp = np.stack([A, H, D, R, Sus, top, skipped.astype(np.float64)], axis=1)
    LIM = 2**31 - 2**24
    ip = np.stack([np.clip(press, -LIM, LIM), np.clip(release, -LIM, LIM)], axis=1).astype(np.int32)

    dt = np.dtype(config.dtype)
    out = _render_tracked(
        jnp.asarray(t["inc_from"], dt), jnp.asarray(t["lam_ratio"], dt),
        jnp.asarray(t["phase_b"], dt), jnp.asarray(t["vol_tgt"], dt),
        jnp.asarray(t["vol_b"], dt), jnp.asarray(t["alpha"], dt),
        jnp.asarray(t["gains"], dt), jnp.asarray(fp, dt), jnp.asarray(ip),
        stride=config.stride, n_frames=total_frames, dtype=config.dtype,
    )
    body = np.asarray(out).reshape(total_frames * config.stride, -1)
    lead = np.zeros((config.start_sample, body.shape[1]), body.dtype)
    return np.concatenate([lead, body], axis=0)
