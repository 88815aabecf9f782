"""SoundEngine voice programs (reference include/gen.voice.h:700-810).

Presets are stored in natural units (the reference normalizes them into
[0,1] float arrays via Limits<>; the normalized Program plumbing lives in
core/params.py — these tables are the denormalized source of truth).

Common defaults from make_common (gen.voice.h:477-533): gain 2, loudness
level 30 phon, loudness compensation 1.0, loudness ref freq index 5 (63 Hz),
center octaves 1..8, filters order per preset.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from ..utils.interp import Itp


class Mode(enum.Enum):
    BIRDS = "birds"
    ROBOTS = "robots"
    SWEEP = "sweep"
    WIND = "wind"


class FreqXfade(enum.Enum):
    NO = "no"
    NON_TRIVIAL = "non_trivial"
    ALL = "all"


@dataclass(frozen=True)
class VoiceProgram:
    name: str
    mode: Mode
    # markov
    start_node: int = 0
    pre_tries: int = 0
    min_path_length: int = 1
    additional_tries: int = 0
    articulative_pause_seconds: float = 0.0
    # ramps
    interpolation: int = int(Itp.LINEAR)
    freq_scatter: float = 0.0
    length_ms: float = 93.0
    length_exponent: float = 2.0
    length_exponent_scatter: float = 0.5
    xfade_seconds: float = 0.0295
    phase_ratio1: float = 0.0
    phase_ratio2: float = 0.0
    # robot
    d1: float = 0.0
    d2: float = 0.0
    harmonic_attenuation: float = 0.0
    # birds
    xfade_freq: FreqXfade = FreqXfade.NO
    freq_transition_seconds: float = 0.14
    freq_interpolation: int = int(Itp.EASE_OUT_EXPO)
    # sweep
    low_freq: float = 0.0
    high_freq: float = 0.0
    # loudness / mix
    gain: float = 2.0
    loudness_level: float = 30.0
    loudness_compensation: float = 1.0
    loudness_ref_freq_index: int = 5
    sine_gain: float = 1.0
    # wind
    filter_order: int = 1
    bp_width_min: float = 0.0
    bp_width_max: float = 0.0
    center_octave_min: float = 1.0
    center_octave_max: float = 8.0
    center_short_term_ratio: float = 0.0
    seconds_slow_iter_long: float = 1.0   # denormalized seconds
    seconds_slow_iter_short: float = 1.0
    pink_lp_gain: float = 0.0
    pink_bp_gain: float = 0.0
    pink_br_gain: float = 0.0
    preferred_seeds: tuple = ()


def _bird(name, start_node, pre_tries, min_path_length, additional_tries, itp_i,
          freq_scat, length, length_med_exp, length_scale_exp,
          articulative_pause, xfade, xfade_freq, freq_xfade, freq_i, seeds=()):
    return VoiceProgram(
        name=name, mode=Mode.BIRDS, start_node=start_node, pre_tries=pre_tries,
        min_path_length=min_path_length, additional_tries=additional_tries,
        articulative_pause_seconds=articulative_pause, interpolation=itp_i,
        freq_scatter=freq_scat, length_ms=length, length_exponent=length_med_exp,
        length_exponent_scatter=length_scale_exp, xfade_seconds=xfade,
        xfade_freq=xfade_freq, freq_transition_seconds=freq_xfade,
        freq_interpolation=freq_i, preferred_seeds=tuple(seeds),
    )


def _robot(name, start_node, pre_tries, min_path_length, additional_tries,
           articulative_pause, itp_i, freq_scat, length, length_med_exp,
           length_scale_exp, xfade, d1, d2, har_att):
    return VoiceProgram(
        name=name, mode=Mode.ROBOTS, start_node=start_node, pre_tries=pre_tries,
        min_path_length=min_path_length, additional_tries=additional_tries,
        articulative_pause_seconds=articulative_pause, interpolation=itp_i,
        freq_scatter=freq_scat, length_ms=length, length_exponent=length_med_exp,
        length_exponent_scatter=length_scale_exp, xfade_seconds=xfade,
        d1=d1, d2=d2, harmonic_attenuation=har_att,
    )


def _sweep(name, itp_i, length, length_med_exp, xfade, low, high):
    return VoiceProgram(
        name=name, mode=Mode.SWEEP, interpolation=itp_i, length_ms=length,
        length_exponent=length_med_exp, length_exponent_scatter=0.0,
        xfade_seconds=xfade, low_freq=low, high_freq=high, min_path_length=1,
    )


MAX_SECONDS_SLOW_ITER = 2.268  # gen.voice.h:624


def _noise_wind(name, filter_order, bp_width, bp_center, n_slow_iter, **kw):
    return VoiceProgram(
        name=name, mode=Mode.WIND, min_path_length=6,
        interpolation=int(Itp.PROPORTIONAL_VALUE_DERIVATIVE), freq_scatter=0.12,
        length_ms=93.3, length_exponent=2.0, length_exponent_scatter=0.5,
        xfade_seconds=0.0499, filter_order=filter_order,
        bp_width_min=bp_width[0], bp_width_max=bp_width[1],
        center_octave_min=bp_center[0], center_octave_max=bp_center[1],
        seconds_slow_iter_long=n_slow_iter,
        pink_bp_gain=1.0, pink_br_gain=0.0, sine_gain=0.0,
        **kw,
    )


def _sine_wind(name, bp_center, short_center_ratio, slow_long, slow_short):
    return VoiceProgram(
        name=name, mode=Mode.WIND, min_path_length=6,
        interpolation=int(Itp.LINEAR), freq_scatter=0.12, length_ms=93.3,
        length_exponent=2.0, length_exponent_scatter=0.5, xfade_seconds=0.0499,
        filter_order=1, loudness_compensation=1.0, sine_gain=0.1,
        center_octave_min=bp_center[0], center_octave_max=bp_center[1],
        center_short_term_ratio=short_center_ratio,
        seconds_slow_iter_long=slow_long, seconds_slow_iter_short=slow_short,
    )


def _mixed_wind(name, filter_order, bp_width, bp_center, n_slow_iter):
    p = _noise_wind(name, filter_order, bp_width, bp_center, n_slow_iter,
                    loudness_compensation=0.0)
    return VoiceProgram(**{**p.__dict__, "sine_gain": 0.01})


CIRC = int(Itp.EASE_INOUT_CIRC)
IN_EXPO = int(Itp.EASE_IN_EXPO)
OUT_EXPO = int(Itp.EASE_OUT_EXPO)
INOUT_EXPO = int(Itp.EASE_INOUT_EXPO)
LIN = int(Itp.LINEAR)
X = FreqXfade

# reference gen.voice.h:700-810
BIRD_PROGRAMS = [
    _bird("Standard & Cute bird", 0, 0, 1, 0, CIRC, 0.0, 93.0, 2.0, 0.5,
          0.02267, 0.0295, X.NO, 0.14, OUT_EXPO, [32, 48, 69, 180, 218, 240]),
    _bird("Scat bird", 0, 0, 3, 17, CIRC, 0.015, 10.0, 2.0, 0.5,
          0.0445, 0.0177, X.NON_TRIVIAL, 0.363, INOUT_EXPO,
          [4, 5, 23, 26, 34, 48, 58, 68, 73, 74, 75, 80, 85, 88, 109, 116, 124,
           125, 131, 141, 146, 165, 181, 205, 213, 214, 227, 232, 249]),
    _bird("Rhythmic bird", 1, 0, 3, 11, CIRC, 0.0, 19.8, 2.0, 0.0,
          0.03188, 0.01138, X.ALL, 0.0182, INOUT_EXPO,
          [19, 29, 32, 36, 38, 48, 79, 106, 112, 116, 123, 147, 162, 195, 213,
           247, 248, 250]),
    _bird("Slow bird", 0, 2, 1, 0, IN_EXPO, 0.0, 73.7, 2.0, 0.5,
          0.02267, 0.0295, X.NO, 0.14, OUT_EXPO, [63, 70, 83, 91, 110, 160, 197]),
    _bird("BiTone bird", 1, 0, 2, 0, IN_EXPO, 0.414, 78.6, 2.0, 0.5,
          0.09755, 0.0295, X.NO, 0.14, OUT_EXPO,
          [5, 15, 27, 31, 49, 58, 72, 74, 96, 108, 147, 149, 171, 174, 180, 194,
           199, 205, 252]),
    _bird("Happy bird 1", 1, 0, 4, 0, IN_EXPO, 0.414, 78.6, 2.0, 0.5,
          0.1326, 0.0454, X.NO, 0.14, OUT_EXPO,
          [119, 141, 149, 159, 88, 32, 45, 168, 206]),
    _bird("Happy bird 2", 1, 0, 4, 0, IN_EXPO, 0.414, 63.9, 1.19, 1.0,
          0.1326, 0.0454, X.NO, 0.14, OUT_EXPO,
          [8, 20, 23, 60, 76, 113, 143, 168, 169, 178, 180, 208, 217, 231]),
    _bird("Laughing bird", 1, 0, 2, 0, IN_EXPO, 0.414, 78.6, 2.0, 0.5,
          0.2193, 0.0295, X.ALL, 0.0725, OUT_EXPO,
          [20, 31, 39, 36, 37, 47, 68, 89, 94, 105, 108, 136, 144, 145, 148,
           161, 172, 174, 212, 246, 249]),
    _bird("Talkative bird", 0, 0, 6, 0, CIRC, 0.12, 93.3, 2.0, 0.5,
          0.152, 0.05, X.NON_TRIVIAL, 0.0998, OUT_EXPO,
          [9, 28, 33, 38, 53, 54, 83, 114, 117, 122, 131, 162, 168, 171, 187,
           196, 216, 220]),
]

ROBOT_PROGRAMS = [
    _robot("R2D2", 0, 0, 1, 1, 0.0835, LIN, 0.0, 19.8, 2.1, 0.39, 0.0053,
           6, 12, 0.98),
    _robot("Communication", 0, 0, 16, 14, 0.03188, CIRC, 0.0, 10.0, 1.89, 1.0,
           0.0053, 6, 10, 0.98),
]

SWEEP_PROGRAMS = [
    _sweep("Sweep 1", LIN, 73.0, 5.0, 0.0109, 0.0009, 20000.0),
    _sweep("Fullrange", LIN, 500.0, 5.0, 0.0109, 0.000226, 20000.0),
]

WIND_PROGRAMS = [
    _noise_wind("Medium wind in trees", 1, (0.0, 0.0), (1.0, 8.0), 2.268),
    _noise_wind("Steady wind", 4, (1.3, 1.3), (5.2, 5.5), 0.09),
    _noise_wind("Strong wind", 4, (3.8, 3.8), (1.0, 8.0), 2.268),
    _noise_wind("Vinyl cracks", 89, (3.45, 5.0), (8.1, 8.1), 0.000748),
    _noise_wind("Small animal eating", 61, (0.0, 5.0), (8.1, 8.1), 0.000227),
    _noise_wind("Heavy rain in a car", 33, (3.45, 5.0), (8.1, 8.1), 0.000227),
    _noise_wind("Light rain in a car", 89, (3.45, 5.0), (8.1, 8.1), 0.000227),
    _noise_wind("Heavy rain", 13, (5.0, 5.0), (7.8, 8.0), 0.000283),
    _noise_wind("Light rain", 13, (3.45, 3.45), (8.0, 8.3), 0.000227),
    _noise_wind("Bubbles", 129, (2.45, 3.25), (4.8, 8.3), 0.0229),
    _noise_wind("Earth rumbling", 30, (1.95, 5.0), (2.5, 3.2), 0.1589),
    _sine_wind("Sine wind", (4.6, 6.8), 0.2, 2.268, 0.0005),
    _sine_wind("Kettle whistle pure", (7.5, 7.7), 0.0, 0.0005, 0.0005),
    _mixed_wind("Kettle whistle mixed", 7, (0.9, 0.9), (7.5, 7.7), 0.00716),
]

PROGRAMS = {
    Mode.BIRDS: BIRD_PROGRAMS,
    Mode.ROBOTS: ROBOT_PROGRAMS,
    Mode.SWEEP: SWEEP_PROGRAMS,
    Mode.WIND: WIND_PROGRAMS,
}


def get_program(mode: Mode, index_or_name) -> VoiceProgram:
    progs = PROGRAMS[mode]
    if isinstance(index_or_name, int):
        return progs[index_or_name]
    for p in progs:
        if p.name == index_or_name:
            return p
    raise KeyError(index_or_name)
