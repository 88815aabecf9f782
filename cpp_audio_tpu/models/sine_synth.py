"""Polyphonic sine synthesizer — the reference `sine::Synth` (gen.sine path).

Reference composition per voice (include/gen.sine.h:5-45 over
include/audioelement.h):
    VolumeAdjusted< Enveloped< SineOscillatorAlgo, AHDSREnvelope > >
with NoteOn setting volume = baseVolume * velocity (gen.crtp.h:425) and
`SynthImpl::setupAudioElement` configuring equal-loudness params
(low_index=5 → 63 Hz, log_ratio=0.8, level=30 phon; gen.sine.h:10-21) which
take effect when the element is loudness-compensated
(LoudnessVolumeAdjusted, audioelement.h:1275-1316).

TPU-native design: all voices render as one (V, T) tile per time block —
phase in closed form, envelope in closed form, constant-power stereo mixdown
as a matmul. Blocks are *independent* (no carried state: constant-frequency
notes have analytic phase), so the block loop is `lax.map` and shards freely.

Precision: within a block, phases are computed in the working dtype from a
per-block origin computed in float64 (a (V,)-sized array per block — cheap
even with TPU f64 emulation). This keeps phase error ~1e-5 rad over arbitrary
render lengths, i.e. artifacts below -90 dB, without paying f64 on the hot
(V, T) tile.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from ..core.voices import NoteSchedule
from ..ops import envelopes, oscillators
from ..utils import loudness
from ..utils.convert import freq_to_angle_increment

# reference include/audioelement.h:1270 + sound.h:84 (sine base volume 1.0)
REDUCE_UNADJUSTED_VOLUMES = 0.1
SINE_BASE_VOLUME = REDUCE_UNADJUSTED_VOLUMES * 1.0


@dataclass(frozen=True)
class SineSynthConfig:
    sample_rate: int = 44100
    ahdsr: envelopes.AHDSR = None  # type: ignore[assignment]
    n_channels: int = 2
    # LoudnessVolumeAdjusted (True) vs VolumeAdjusted (False) element
    loudness_compensation: bool = False
    loudness_low_index: int = 5   # 63 Hz (gen.sine.h:15)
    loudness_log_ratio: float = 0.8
    loudness_level: float = 30.0
    base_volume: float = SINE_BASE_VOLUME
    block_size: int = 8192
    dtype: str = "float32"

    def __post_init__(self):
        if self.ahdsr is None:
            object.__setattr__(
                self, "ahdsr",
                envelopes.AHDSR(attack=1000, hold=0, decay=1000, release=10000,
                                sustain=0.7).with_min_dt(self.sample_rate),
            )


def _voice_volumes(config: SineSynthConfig, schedule: NoteSchedule) -> np.ndarray:
    if config.loudness_compensation:
        # LoudnessVolumeAdjusted: volume comes from the equal-loudness contour
        # (set in setAngleIncrements, audioelement.h:1291-1298), which
        # overwrites the velocity-based target set earlier in NoteOn.
        vol = np.asarray(
            loudness.equal_loudness_volume_from_freq(
                schedule.frequency,
                low_index=config.loudness_low_index,
                log_ratio=config.loudness_log_ratio,
                level=config.loudness_level,
            )
        )
        return np.where(schedule.velocity > 0, vol, 0.0)
    return config.base_volume * schedule.velocity


def _stereo_gains(pan: np.ndarray, n_channels: int) -> np.ndarray:
    """Constant-power pan (reference include/stereo.h): gains = cos/sin(pi/4*(pan+1))."""
    if n_channels == 1:
        return np.ones((len(pan), 1))
    th = 0.25 * np.pi * (pan + 1.0)
    g = np.zeros((len(pan), n_channels))
    g[:, 0] = np.cos(th)
    g[:, 1] = np.sin(th)
    return g


@functools.partial(jax.jit, static_argnames=("block_size", "n_blocks", "dtype"))
def _render_blocks(press, release, inc, phase0, volume, gains,
                   attack, hold, decay, sustain, rel,
                   attack_itp, decay_itp, release_itp,
                   *, block_size: int, n_blocks: int, dtype: str):
    """Render n_blocks consecutive blocks; returns (n_blocks, block_size, C)."""
    wdt = jnp.dtype(dtype)
    params = envelopes.AHDSR(
        attack=attack[:, None], attack_itp=attack_itp[:, None], hold=hold[:, None],
        decay=decay[:, None], decay_itp=decay_itp[:, None], release=rel[:, None],
        release_itp=release_itp[:, None], sustain=sustain[:, None],
    )
    min_change = envelopes.min_change_duration_from_increment(inc)[:, None].astype(wdt)
    aliasing = oscillators.freq_aliasing_multiplicator(inc).astype(wdt)
    amp = (volume.astype(wdt) * aliasing)[:, None]
    inc_w = inc.astype(wdt)
    k = jnp.arange(1, block_size + 1, dtype=wdt)

    def one_block(b):
        t0 = (b * block_size).astype(jnp.float64)
        # per-block phase origin in f64: (V,) only
        origin = jnp.mod((t0 - press) * inc + phase0, 2.0).astype(wdt)
        phases = oscillators.wrap_phase(origin[:, None] + k[None, :] * inc_w[:, None])
        t = t0.astype(wdt) + k - 1.0
        env = envelopes.ahdsr_envelope(
            t[None, :], params, press.astype(wdt)[:, None],
            release.astype(wdt)[:, None], min_change=min_change, dtype=wdt,
        )
        sig = amp * env * oscillators.sine(phases)
        return oscillators.mixdown(sig, gains.astype(wdt))

    return jax.lax.map(one_block, jnp.arange(n_blocks))


def render_schedule(schedule: NoteSchedule, n_samples: int,
                    config: SineSynthConfig) -> np.ndarray:
    """Offline render of a note schedule -> float array (n_samples, n_channels)."""
    V = schedule.n_rows
    volume = _voice_volumes(config, schedule)
    gains = _stereo_gains(schedule.pan, config.n_channels)
    inc = freq_to_angle_increment(schedule.frequency, config.sample_rate)
    a = config.ahdsr

    def vec(x, dt=np.float64):
        return np.broadcast_to(np.asarray(x, dt), (V,)).copy()

    B = config.block_size
    n_blocks = (n_samples + B - 1) // B
    out = _render_blocks(
        jnp.asarray(schedule.press), jnp.asarray(schedule.release),
        jnp.asarray(inc), jnp.asarray(schedule.phase),
        jnp.asarray(volume, dtype=config.dtype), jnp.asarray(gains, dtype=config.dtype),
        jnp.asarray(vec(a.attack)), jnp.asarray(vec(a.hold)), jnp.asarray(vec(a.decay)),
        jnp.asarray(vec(a.sustain)), jnp.asarray(vec(a.release)),
        jnp.asarray(vec(a.attack_itp, np.int32)), jnp.asarray(vec(a.decay_itp, np.int32)),
        jnp.asarray(vec(a.release_itp, np.int32)),
        block_size=B, n_blocks=n_blocks, dtype=config.dtype,
    )
    out = np.asarray(out).reshape(n_blocks * B, -1)[:n_samples]
    return out


def render_to_wav(schedule: NoteSchedule, n_samples: int, config: SineSynthConfig,
                  path) -> np.ndarray:
    from ..utils import wav

    out = render_schedule(schedule, n_samples, config)
    wav.write_wav(path, out, config.sample_rate)
    return out
