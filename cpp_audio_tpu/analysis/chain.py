"""Fused offline chain: synth -> analysis peaks -> vocoder in ONE device program.

The separate-stage pipeline (models/voicebank.py render + analysis/resynth.py
analyze + analysis/vocoder.py vocode) pays one host->device dispatch round
trip per stage — significant when the host is attached over a slow link (and
still measurable over PCIe). This module traces the whole chain into a single
jitted program:

    voice-bank blocks -> mono mixdown -> sliding Gaussian STFT -> device
    top-k peak extraction, and (in the same program) the O(n) vocoder of the
    mixdown against a carrier.

so one dispatch computes everything the host tracker needs, one D2H moves the
(frames, k) peak arrays, the fused C++ tracker (native/pitchpipe.cpp
pitchpipe_run_offline) builds the slot control table, and a second dispatch
renders the tracked notes. Semantics are identical to the separate stages
(tests/test_chain.py pins this).

Reference scope: this is RtResynth's offline job loop (source/
rt.resynth.lib.cpp:1185-1235 — input -> analysis -> resynth synth + vocoder)
re-architected as two device programs + one host call instead of a
sample-by-sample duplex loop.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# df32 analysis implementation: "hybrid" (f32-select + MXU direct-DFT df32
# re-eval, ops/dfft_hybrid.py) or "ladder" (full df32 Stockham FFT,
# ops/dfft.py). Env override for on-hardware A/B.
DF_ANALYSIS_MODE = os.environ.get("CPP_AUDIO_DF_ANALYSIS", "hybrid")

from ..models import resynth_bank, voicebank
from ..ops import stft as stft_ops
from . import resynth as resynth_mod
from . import vocoder as vocoder_mod


@functools.partial(jax.jit, static_argnames=(
    "n", "block_size", "n_blocks", "a_itp", "d_itp", "r_itp", "dtype",
    "window_size", "stride", "fft_len", "k", "sample_rate",
    "mod_window", "voc_stride", "car_fft", "n_mod_frames",
    "vol_mod", "vol_car", "vol_voc", "use_matmul_dft", "edges_t",
    "mod_mode", "mod_shape"))
def _fused_analyze_vocode(fp, ip, up, gains, codes, window, carrier, edges,
                          bm_car, rows, *, n: int, block_size: int,
                          n_blocks: int, a_itp, d_itp, r_itp, dtype: str,
                          window_size: int, stride: int, fft_len: int, k: int,
                          sample_rate: int, mod_window: int, voc_stride: int,
                          car_fft: int, n_mod_frames: int, vol_mod: float,
                          vol_car: float, vol_voc: float,
                          use_matmul_dft: bool = False, edges_t=None,
                          mod_mode=None, mod_shape: str = "gaussian"):
    # 1. synth render + mono mixdown (stays on device). 3-D fp means
    # per-block compacted voice tables (voicebank.compact_block_args —
    # silent (voice, block) tiles dropped host-side)
    if fp.ndim == 3:
        out = voicebank.voicebank_blocks_compact_impl(
            fp, ip, up, gains, codes, block_size=block_size,
            n_blocks=n_blocks, a_itp=a_itp, d_itp=d_itp, r_itp=r_itp,
            out_dtype=dtype)
    else:
        out = voicebank.voicebank_blocks_impl(
            fp, ip, up, gains, codes, block_size=block_size,
            n_blocks=n_blocks, a_itp=a_itp, d_itp=d_itp, r_itp=r_itp,
            out_dtype=dtype)
    mono = out.reshape(-1, out.shape[-1])[:n].sum(axis=1)

    # 2. analysis: sliding Gaussian STFT -> device top-k peaks
    sq = stft_ops._stft_sqmag(mono, window.astype(mono.dtype),
                              window_size=window_size, stride=stride,
                              fft_length=fft_len, use_matmul_dft=use_matmul_dft)
    freq, mag = stft_ops._top_peaks(sq, sample_rate=sample_rate,
                                    fft_length=fft_len, k=k)

    # 3. vocoder of the mixdown against the carrier (O(n) modulator path;
    # edges_t static enables the decimated band-ifft implementation)
    amps = vocoder_mod._modulator_band_amps_fast(
        mono, edges if edges_t is None else edges_t, window=mod_window,
        stride=voc_stride, n_frames=n_mod_frames, sample_rate=sample_rate,
        mode=mod_mode, shape=mod_shape)
    vocoded = vocoder_mod._carrier_vocode(
        carrier, amps[rows], bm_car, stride=voc_stride, fft_len=car_fft,
        use_matmul_dft=use_matmul_dft)
    out_len = vocoded.shape[0]
    mix = (vol_voc * vocoded + vol_mod * mono[:out_len]
           + vol_car * carrier[:out_len])
    return freq, mag, mix


@functools.partial(jax.jit, static_argnames=(
    "n", "block_size", "n_blocks", "a_itp", "d_itp", "r_itp",
    "window_size", "stride", "fft_len", "k", "sample_rate",
    "mod_window", "voc_stride", "car_fft", "n_mod_frames",
    "vol_mod", "vol_car", "vol_voc", "use_matmul_dft", "edges_t",
    "mod_mode", "mod_shape", "df_mode"))
def _fused_analyze_vocode_df(fp, ip, up, gains, codes, whi, wlo, shi, slo,
                             carrier, edges, bm_car, rows, *, n: int,
                             block_size: int, n_blocks: int, a_itp, d_itp,
                             r_itp, window_size: int, stride: int,
                             fft_len: int, k: int, sample_rate: int,
                             mod_window: int, voc_stride: int, car_fft: int,
                             n_mod_frames: int, vol_mod: float,
                             vol_car: float, vol_voc: float,
                             use_matmul_dft: bool = False, edges_t=None,
                             mod_mode=None, mod_shape: str = "gaussian",
                             df_mode: str = "hybrid"):
    """df32-analysis variant of _fused_analyze_vocode: the synth renders and
    the vocoder runs in f32 (already ~-130 dB vs f64 —
    tools/fidelity_budget.py), while the STFT + QIFFT peaks are double-grade:
    df_mode="hybrid" (default) selects peaks from the f32 rfft spectrum and
    re-evaluates only the selected bins in compensated double-f32
    (ops/dfft_hybrid.py — MXU direct DFT, ~3x cheaper than the ladder);
    df_mode="ladder" computes the full df32 STFT (ops/dfft.py,
    ops/stft._top_peaks_df, ~1e-11 relative vs host f64).
    Returns ((freq_hi, freq_lo, mag_hi, mag_lo), vocoder_mix)."""
    from ..ops import dfft, dfft_hybrid

    if fp.ndim == 3:
        out = voicebank.voicebank_blocks_compact_impl(
            fp, ip, up, gains, codes, block_size=block_size,
            n_blocks=n_blocks, a_itp=a_itp, d_itp=d_itp, r_itp=r_itp,
            out_dtype="float32")
    else:
        out = voicebank.voicebank_blocks_impl(
            fp, ip, up, gains, codes, block_size=block_size,
            n_blocks=n_blocks, a_itp=a_itp, d_itp=d_itp, r_itp=r_itp,
            out_dtype="float32")
    mono = out.reshape(-1, out.shape[-1])[:n].sum(axis=1)

    if df_mode == "hybrid":
        freq4 = dfft_hybrid.hybrid_peaks_df32(
            mono, whi, wlo, shi, slo, window_size=window_size, stride=stride,
            fft_length=fft_len, sample_rate=sample_rate, k=k)
    else:
        sq = dfft.stft_sqmag_df32_arrays(mono, whi, wlo, shi, slo,
                                         window_size=window_size,
                                         stride=stride, fft_length=fft_len)
        freq4 = stft_ops._top_peaks_df(sq[0], sq[1], sample_rate=sample_rate,
                                       fft_length=fft_len, k=k)

    amps = vocoder_mod._modulator_band_amps_fast(
        mono, edges if edges_t is None else edges_t, window=mod_window,
        stride=voc_stride, n_frames=n_mod_frames, sample_rate=sample_rate,
        mode=mod_mode, shape=mod_shape)
    vocoded = vocoder_mod._carrier_vocode(
        carrier, amps[rows], bm_car, stride=voc_stride, fft_len=car_fft,
        use_matmul_dft=use_matmul_dft)
    out_len = vocoded.shape[0]
    mix = (vol_voc * vocoded + vol_mod * mono[:out_len]
           + vol_car * carrier[:out_len])
    return freq4, mix


def autotune_device_arrays_df(rconfig):
    """Numeric autotune tables as df32 (hi, lo) pairs for the df tracker."""
    from . import autotune as at

    tables = at.autotune_tables(use_autotune=rconfig.use_autotune,
                                **rconfig.autotune_kwargs)

    def pair(x, shape=None):
        x64 = np.asarray(x, np.float64) if x is not None else np.zeros(shape)
        hi = x64.astype(np.float32)
        lo = (x64 - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo)

    root = pair(None, ())
    scale = pair(None, (8,))
    equid = pair(None, (7,))
    allowed = pair(None, (0,))
    if tables["kind"] == "scale":
        root = pair(tables["root_pitch"])
        scale = pair(tables["scale"])
        equid = pair(tables["equidistant"])
    elif tables["kind"] == "allowed":
        allowed = pair(np.asarray(tables["allowed"], np.float64))
    return tables["kind"], (root, scale, equid, allowed)


def autotune_device_arrays(rconfig, dtype=jnp.float32):
    """Numeric autotune tables as device arrays for the device tracker:
    (root (), scale (8,), equidistant (7,), allowed (A,)). Dummy zeros for
    the unused kind (analysis/autotune.autotune_tables provides the values,
    reference rt.resynth.lib.autotune.cpp:89-142 / rt.resynth.lib.cpp:
    1761-1873)."""
    from . import autotune as at

    tables = at.autotune_tables(use_autotune=rconfig.use_autotune,
                                **rconfig.autotune_kwargs)
    root = jnp.zeros((), dtype)
    scale = jnp.zeros((8,), dtype)
    equid = jnp.zeros((7,), dtype)
    allowed = jnp.zeros((0,), dtype)
    if tables["kind"] == "scale":
        root = jnp.asarray(tables["root_pitch"], dtype)
        scale = jnp.asarray(tables["scale"], dtype)
        equid = jnp.asarray(tables["equidistant"], dtype)
    elif tables["kind"] == "allowed":
        allowed = jnp.asarray(np.asarray(tables["allowed"], np.float64), dtype)
    return tables["kind"], (root, scale, equid, allowed)


def tracker_config_kwargs(rconfig, rcfg) -> dict:
    """The device tracker's config-derived kwargs (shared by every fused
    path; the context-dependent total_frames / stride / sample_rate keys are
    supplied by each caller)."""
    a = rcfg.ahdsr
    from . import autotune as at

    at_kind = at.autotune_tables(use_autotune=rconfig.use_autotune,
                                 **rconfig.autotune_kwargs)["kind"]
    return dict(
        harmonize_pre=rconfig.pitch_harmonize_pre_autotune,
        harmonize_post=rconfig.pitch_harmonize_post_autotune,
        harmonize_semantics=rconfig.harmonize_semantics,
        draw_indexing=rconfig.draw_indexing,
        autotune_kind=at_kind,
        autotune_max_pitch=rconfig.autotune_max_pitch,
        autotune_tolerance=rconfig.autotune_tolerance_pitches,
        max_voices=rconfig.max_voices, n_slots=rcfg.n_slots,
        nearby_distance=rconfig.nearby_distance_tones,
        min_volume=rconfig.min_volume,
        max_track_pitches=rconfig.max_track_pitches,
        pitch_method={"INTERVAL_CENTER": 0, "MAX_VOLUME": 1,
                      "PONDERATE_BY_VOLUME": 2}[rconfig.pitch_method.name],
        volume_method={"MAX_VOLUME": 0, "SUM_VOLUMES": 1}[
            rconfig.volume_method.name],
        analysis_volume=rconfig.analysis_volume,
        shift_pre=rconfig.pitch_shift_pre_autotune,
        shift_post=rconfig.pitch_shift_post_autotune,
        stereo_spread=rconfig.stereo_spread,
        attack=float(np.max(np.asarray(a.attack))),
        hold=float(np.max(np.asarray(a.hold))),
        decay=float(np.max(np.asarray(a.decay))),
        sustain=float(np.asarray(a.sustain)),
        release=float(np.max(np.asarray(a.release))))


@dataclass
class OfflineChainResult:
    resynth: object       # (samples, 2) device array
    vocoded: object       # (m,) device array (vocoder mix of the mixdown)
    n_frames: int
    dropped: object = 0   # dropped-NoteOn count (device scalar in device mode)


def run_offline_chain(bank: voicebank.VoiceBank, n_samples: int,
                      rconfig: resynth_mod.ResynthConfig,
                      vparams: vocoder_mod.VocoderParams, carrier,
                      *, block_size: int = 1 << 15) -> OfflineChainResult:
    """Render `bank`, resynthesize its mono mixdown, and vocode it — with
    exactly two device dispatches and one (frames, k) D2H transfer.

    Requires the native library (falls back to the separate-stage pipeline
    when unavailable)."""
    from .. import native as nat

    sr = rconfig.sample_rate
    dtype = rconfig.dtype
    args, statics = voicebank.prepare_bank_arrays(bank, n_samples, block_size,
                                                  dtype)
    args, statics = voicebank.compact_block_args(args, statics)

    # analysis statics
    window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(rconfig.window_size)
    k = rconfig.max_voices + 1

    # vocoder statics (mirrors vocoder.vocode host-side setup)
    S = vparams.stride
    W = vparams.modulator_window
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = vparams.band_freqs()
    bm_car = vocoder_mod._band_matrix(edges, car_fft // 2 + 1, sr / car_fft)
    n_mod_frames = max(0, (n_samples - W) // S + 1)
    n_car_frames = max(0, (n_samples - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0,
                   max(n_mod_frames - 1, 0))

    wdt = jnp.float32 if dtype == "float32" else jnp.float64
    carrier_dev = jnp.asarray(carrier, wdt)[:n_samples]

    freq, mag, vocoded = _fused_analyze_vocode(
        *args, jnp.asarray(window, wdt), carrier_dev, jnp.asarray(edges, wdt),
        jnp.asarray(bm_car, wdt), jnp.asarray(rows),
        n=n_samples, dtype=dtype, window_size=rconfig.window_size,
        stride=rconfig.stride, fft_len=fft_len, k=k, sample_rate=sr,
        mod_window=W, voc_stride=S, car_fft=car_fft,
        n_mod_frames=n_mod_frames, vol_mod=float(vparams.volume_modulator),
        vol_car=float(vparams.volume_carrier),
        vol_voc=float(vparams.volume_vocoded),
        use_matmul_dft=stft_ops.use_matmul_dft_default(wdt),
        edges_t=tuple(float(e) for e in edges),
        mod_shape=vparams.modulator_window_shape, **statics)

    # host: fused C++ tracking + slot tables, then the render dispatch
    freq_h = np.asarray(freq)
    mag_h = np.asarray(mag)
    n_frames = int(freq_h.shape[0])
    rcfg = resynth_mod._render_config(rconfig)
    native_sem_ok = (rconfig.harmonize_semantics == "reference"
                     or (rconfig.pitch_harmonize_pre_autotune == 0.0
                         and rconfig.pitch_harmonize_post_autotune == 0.0))
    if nat.available() and rconfig.draw_indexing != "stable" and native_sem_ok:
        table = resynth_mod.build_tables_native(freq_h, mag_h, rconfig,
                                                n_frames + 8, rcfg)
        stereo = resynth_bank.render_table(table, rcfg, device_out=True)
    else:
        peaks = stft_ops.top_peaks_to_lists(freq_h, mag_h)
        notes, _stats, _dropped = resynth_mod.track(peaks, rconfig,
                                                    prefer_native=False)
        stereo = resynth_bank.render_tracked(notes, n_frames, rcfg,
                                             device_out=True)
    return OfflineChainResult(resynth=stereo, vocoded=vocoded,
                              n_frames=n_frames)


_TRACKER_STATICS = (
    "total_frames", "max_voices", "n_slots", "nearby_distance", "min_volume",
    "max_track_pitches", "pitch_method", "volume_method", "analysis_volume",
    "shift_pre", "shift_post", "stereo_spread", "attack", "hold", "decay",
    "sustain", "release", "harmonize_pre", "harmonize_post", "autotune_kind",
    "autotune_max_pitch", "autotune_tolerance", "harmonize_semantics",
    "draw_indexing")


def _tracker_call_kwargs(kw, at_arrays):
    return dict(
        total_frames=kw["total_frames"], stride=kw["render_stride"],
        sample_rate=kw["sample_rate"], max_voices=kw["max_voices"],
        n_slots=kw["n_slots"], nearby_distance=kw["nearby_distance"],
        min_volume=kw["min_volume"],
        max_track_pitches=kw["max_track_pitches"],
        pitch_method=kw["pitch_method"], volume_method=kw["volume_method"],
        analysis_volume=kw["analysis_volume"], shift_pre=kw["shift_pre"],
        shift_post=kw["shift_post"], stereo_spread=kw["stereo_spread"],
        attack=kw["attack"], hold=kw["hold"], decay=kw["decay"],
        sustain=kw["sustain"], release=kw["release"],
        harmonize_pre=kw["harmonize_pre"],
        harmonize_post=kw["harmonize_post"],
        autotune_kind=kw["autotune_kind"],
        autotune_max_pitch=kw["autotune_max_pitch"],
        autotune_tolerance=kw["autotune_tolerance"],
        harmonize_semantics=kw.get("harmonize_semantics", "merged"),
        draw_indexing=kw.get("draw_indexing", "sequential"),
        autotune_arrays=at_arrays)


@functools.partial(jax.jit, static_argnames=(
    "n", "block_size", "n_blocks", "a_itp", "d_itp", "r_itp", "dtype",
    "window_size", "stride", "fft_len", "k", "sample_rate",
    "mod_window", "voc_stride", "car_fft", "n_mod_frames",
    "vol_mod", "vol_car", "vol_voc", "use_matmul_dft", "edges_t", "mod_mode",
    "mod_shape", "render_stride", "start_sample") + _TRACKER_STATICS)
def _fused_single_dispatch(fp, ip, up, gains, codes, window, carrier, edges,
                           bm_car, rows, loud_pitches, loud_spl, pan_draws,
                           phase_draws, at_root, at_scale, at_equid,
                           at_allowed, **kw):
    """The ENTIRE offline chain as one XLA program: synth -> STFT -> peaks ->
    device tracker -> tracked-note render, plus the vocoder. No host round
    trips; returns (stereo, vocoded, dropped) device arrays."""
    from . import device_tracker

    freq, mag, mix = _fused_analyze_vocode(
        fp, ip, up, gains, codes, window, carrier, edges, bm_car, rows,
        **{f: kw[f] for f in (
            "n", "block_size", "n_blocks", "a_itp", "d_itp", "r_itp", "dtype",
            "window_size", "stride", "fft_len", "k", "sample_rate",
            "mod_window", "voc_stride", "car_fft", "n_mod_frames", "vol_mod",
            "vol_car", "vol_voc", "use_matmul_dft") if f in kw},
        edges_t=kw.get("edges_t"), mod_mode=kw.get("mod_mode"),
        mod_shape=kw.get("mod_shape", "gaussian"))
    table, dropped = device_tracker.build_tables_device(
        freq, mag, loud_pitches, loud_spl, pan_draws, phase_draws,
        **_tracker_call_kwargs(kw, (at_root, at_scale, at_equid, at_allowed)))
    # channel-major render: XLA wants the long time axis minor in the output
    # layout, and a (T, 2) result costs a ~1 ms whole-render transpose copy.
    # The output stays FRAMED (2, F, S): flattening (F, S) -> (F*S,) on
    # device is a ~1 ms tile-relayout while (S=3969 is not tile-aligned);
    # the host consumer flattens for free (numpy reshape is a view) via
    # assemble_framed_stereo().
    out = resynth_bank._render_slots(table, stride=kw["render_stride"],
                                     n_channels=2, dtype=kw["dtype"],
                                     channel_major=True)
    return out[:2], mix, dropped


@functools.partial(jax.jit, static_argnames=(
    "n", "block_size", "n_blocks", "a_itp", "d_itp", "r_itp",
    "window_size", "stride", "fft_len", "k", "sample_rate",
    "mod_window", "voc_stride", "car_fft", "n_mod_frames",
    "vol_mod", "vol_car", "vol_voc", "use_matmul_dft", "edges_t", "mod_mode",
    "mod_shape", "render_stride", "start_sample",
    "df_mode", "emit") + _TRACKER_STATICS)
def _fused_single_dispatch_df(fp, ip, up, gains, codes, whi, wlo, shi, slo,
                              carrier, edges, bm_car, rows,
                              lp_hi, lp_lo, ls_hi, ls_lo, pan_draws,
                              phase_draws, at_root_hi, at_root_lo,
                              at_scale_hi, at_scale_lo, at_equid_hi,
                              at_equid_lo, at_allowed_hi, at_allowed_lo,
                              **kw):
    """The df32-fidelity single-dispatch chain: synth -> df32 STFT/peaks ->
    df32 tracker -> df-phase render (+ f32 vocoder), one XLA program. The
    rendered audio matches the host f64 pipeline below -80 dB
    (tools/fidelity_budget.py) while all arithmetic stays f32 on the VPU."""
    from . import device_tracker

    freq4, mix = _fused_analyze_vocode_df(
        fp, ip, up, gains, codes, whi, wlo, shi, slo, carrier, edges,
        bm_car, rows,
        **{f: kw[f] for f in (
            "n", "block_size", "n_blocks", "a_itp", "d_itp", "r_itp",
            "window_size", "stride", "fft_len", "k", "sample_rate",
            "mod_window", "voc_stride", "car_fft", "n_mod_frames", "vol_mod",
            "vol_car", "vol_voc", "use_matmul_dft") if f in kw},
        edges_t=kw.get("edges_t"), mod_mode=kw.get("mod_mode"),
        mod_shape=kw.get("mod_shape", "gaussian"),
        df_mode=kw.get("df_mode", "hybrid"))
    tk = _tracker_call_kwargs(kw, None)
    tk.pop("autotune_arrays")
    table, dropped = device_tracker.build_tables_device_df(
        *freq4, (lp_hi, lp_lo), (ls_hi, ls_lo), pan_draws, phase_draws,
        autotune_arrays_df=((at_root_hi, at_root_lo),
                            (at_scale_hi, at_scale_lo),
                            (at_equid_hi, at_equid_lo),
                            (at_allowed_hi, at_allowed_lo)), **tk)
    if kw.get("emit") == "table":
        # note-level e2e metric path (tools/note_metrics.py): expose the
        # tracker's slot control table instead of rendering it
        return table, mix, dropped
    out = resynth_bank._render_slots(table, stride=kw["render_stride"],
                                     n_channels=2, dtype="float32",
                                     channel_major=True)
    return out[:2], mix, dropped


def _df_pair_np(x64):
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    return (jnp.asarray(hi),
            jnp.asarray((x64 - hi.astype(np.float64)).astype(np.float32)))


def prepare_offline_chain_device(bank: voicebank.VoiceBank, n_samples: int,
                                 rconfig: resynth_mod.ResynthConfig,
                                 vparams: vocoder_mod.VocoderParams, carrier,
                                 *, block_size: int = 1 << 15, draws=None,
                                 mod_mode=None, emit: str = "render"):
    """Build the device-resident argument set for the single-dispatch chain
    and return (step, n_frames): `step()` dispatches ONE fused device program
    (synth -> STFT -> peaks -> tracker -> render + vocoder) over the
    prestaged arrays and returns (stereo (2, F, S) CHANNEL-MAJOR FRAMED,
    vocoded_mix, dropped) device arrays without any host transfer.
    Channel-major keeps the long time axis minor — a (T, 2) result would pay
    a ~1 ms layout transpose on a v5e — and the framed (F, S) time axis
    avoids a ~1 ms on-device tile relayout (S is not 128-aligned); hosts
    flatten/transpose for free (numpy views, see assemble_framed_stereo).
    This is the production serving loop: call step() back to back and drain
    outputs asynchronously.

    draws: optional (pan_draws, phase_draws) device-resident pools (reuse
    them across calls to skip the H2D); defaults to host numpy pools matching
    the host tracker's RNG sequence.
    """
    from ..utils import loudness

    sr = rconfig.sample_rate
    dtype = rconfig.dtype
    analysis_df = dtype == "df32"
    if analysis_df:
        dtype = "float32"
    args, statics = voicebank.prepare_bank_arrays(bank, n_samples, block_size,
                                                  dtype)
    args, statics = voicebank.compact_block_args(args, statics)
    window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(rconfig.window_size)
    k = rconfig.max_voices + 1
    S = vparams.stride
    W = vparams.modulator_window
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = vparams.band_freqs()
    bm_car = vocoder_mod._band_matrix(edges, car_fft // 2 + 1, sr / car_fft)
    n_mod_frames = max(0, (n_samples - W) // S + 1)
    n_car_frames = max(0, (n_samples - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0,
                   max(n_mod_frames - 1, 0))
    wdt = jnp.float32 if dtype == "float32" else jnp.float64
    carrier_dev = jnp.asarray(carrier, wdt)[:n_samples]

    n_frames = max(0, (n_samples - rconfig.window_size) // rconfig.stride + 1)
    total_frames = n_frames + 8
    rcfg = resynth_mod._render_config(rconfig)
    a = rcfg.ahdsr
    li = loudness.phons_to_index(60.0)
    if draws is None:
        cap = n_frames * rconfig.max_voices + 16
        draws = resynth_mod.draw_pools(rconfig, cap)
    pan_draws, phase_draws = draws

    import jax

    if analysis_df:
        # df32-fidelity chain: window + unit-sine scale + ISO loudness +
        # autotune tables all as (hi, lo) pairs of their f64 values
        w64 = np.asarray(window, np.float64)
        scale64 = (2.0 / float(np.sum(w64))) ** 2
        whi, wlo = _df_pair_np(w64)
        shi, slo = _df_pair_np(scale64)
        lp = _df_pair_np(np.asarray(loudness.PITCHES, np.float64))
        ls = _df_pair_np(np.asarray(loudness.ELVS[li], np.float64))
        _at_kind, at_p = autotune_device_arrays_df(rconfig)
        all_args = jax.device_put((
            *args, whi, wlo, shi, slo, carrier_dev, jnp.asarray(edges, wdt),
            jnp.asarray(bm_car, wdt), jnp.asarray(rows), lp[0], lp[1],
            ls[0], ls[1], jnp.asarray(pan_draws, jnp.float32),
            jnp.asarray(phase_draws, jnp.float32),
            at_p[0][0], at_p[0][1], at_p[1][0], at_p[1][1],
            at_p[2][0], at_p[2][1], at_p[3][0], at_p[3][1]))
        kw = dict(
            n=n_samples, window_size=rconfig.window_size,
            stride=rconfig.stride, fft_len=fft_len, k=k, sample_rate=sr,
            mod_window=W, voc_stride=S, car_fft=car_fft,
            n_mod_frames=n_mod_frames,
            vol_mod=float(vparams.volume_modulator),
            vol_car=float(vparams.volume_carrier),
            vol_voc=float(vparams.volume_vocoded),
            use_matmul_dft=stft_ops.use_matmul_dft_default(wdt),
            edges_t=tuple(float(e) for e in edges), mod_mode=mod_mode,
            mod_shape=vparams.modulator_window_shape,
            df_mode=DF_ANALYSIS_MODE, emit=emit,
            total_frames=total_frames, render_stride=rcfg.stride,
            start_sample=rcfg.start_sample,
            **tracker_config_kwargs(rconfig, rcfg), **statics)

        def step():
            return _fused_single_dispatch_df(*all_args, **kw)

        def cost_analysis():
            """XLA cost analysis of the compiled fused program (flops /
            bytes accessed), for bench.py's MFU rows."""
            return _fused_single_dispatch_df.lower(
                *all_args, **kw).compile().cost_analysis()

        def compiled_text():
            return _fused_single_dispatch_df.lower(
                *all_args, **kw).compile().as_text()

        step.cost_analysis = cost_analysis
        step.compiled_text = compiled_text
        return step, n_frames

    _at_kind, at_arrays = autotune_device_arrays(rconfig, wdt)
    all_args = jax.device_put((
        *args, jnp.asarray(window, wdt), carrier_dev, jnp.asarray(edges, wdt),
        jnp.asarray(bm_car, wdt), jnp.asarray(rows),
        jnp.asarray(np.asarray(loudness.PITCHES), wdt),
        jnp.asarray(np.asarray(loudness.ELVS[li]), wdt),
        jnp.asarray(pan_draws, jnp.float32),
        jnp.asarray(phase_draws, jnp.float32), *at_arrays))
    kw = dict(
        n=n_samples, dtype=dtype, window_size=rconfig.window_size,
        stride=rconfig.stride, fft_len=fft_len, k=k, sample_rate=sr,
        mod_window=W, voc_stride=S, car_fft=car_fft,
        n_mod_frames=n_mod_frames, vol_mod=float(vparams.volume_modulator),
        vol_car=float(vparams.volume_carrier),
        vol_voc=float(vparams.volume_vocoded),
        use_matmul_dft=stft_ops.use_matmul_dft_default(wdt),
        edges_t=tuple(float(e) for e in edges), mod_mode=mod_mode,
        mod_shape=vparams.modulator_window_shape,
        total_frames=total_frames, render_stride=rcfg.stride,
        start_sample=rcfg.start_sample,
        **tracker_config_kwargs(rconfig, rcfg), **statics)

    def step():
        return _fused_single_dispatch(*all_args, **kw)

    def cost_analysis():
        return _fused_single_dispatch.lower(
            *all_args, **kw).compile().cost_analysis()

    step.cost_analysis = cost_analysis
    return step, n_frames


def df32_analysis_peaks(bank: voicebank.VoiceBank, n_samples: int,
                        rconfig: resynth_mod.ResynthConfig,
                        vparams: vocoder_mod.VocoderParams, carrier,
                        *, block_size: int = 1 << 15):
    """The df32 chain's ANALYSIS stage alone: synth -> df32 STFT -> df32
    peaks, returning (freq, mag_db) as (n_frames, k) f64 numpy arrays
    (hi + lo recombined). Used by bench.py's same-peaks fidelity row: these
    exact peaks feed the host f64 tracker+renderer so the comparison
    isolates tracking+rendering numerics from backend-chaotic noise-floor
    local-maxima churn (see tools/bench_fidelity_host.py)."""
    sr = rconfig.sample_rate
    args, statics = voicebank.prepare_bank_arrays(bank, n_samples,
                                                  block_size, "float32")
    args, statics = voicebank.compact_block_args(args, statics)
    window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(rconfig.window_size)
    k = rconfig.max_voices + 1
    S = vparams.stride
    W = vparams.modulator_window
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = vparams.band_freqs()
    bm_car = vocoder_mod._band_matrix(edges, car_fft // 2 + 1, sr / car_fft)
    n_mod_frames = max(0, (n_samples - W) // S + 1)
    n_car_frames = max(0, (n_samples - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0,
                   max(n_mod_frames - 1, 0))
    w64 = np.asarray(window, np.float64)
    scale64 = (2.0 / float(np.sum(w64))) ** 2
    whi, wlo = _df_pair_np(w64)
    shi, slo = _df_pair_np(scale64)
    freq4, _mix = _fused_analyze_vocode_df(
        *args, whi, wlo, shi, slo,
        jnp.asarray(carrier, jnp.float32)[:n_samples],
        jnp.asarray(edges, jnp.float32), jnp.asarray(bm_car, jnp.float32),
        jnp.asarray(rows),
        n=n_samples, window_size=rconfig.window_size, stride=rconfig.stride,
        fft_len=fft_len, k=k, sample_rate=sr, mod_window=W, voc_stride=S,
        car_fft=car_fft, n_mod_frames=n_mod_frames,
        vol_mod=float(vparams.volume_modulator),
        vol_car=float(vparams.volume_carrier),
        vol_voc=float(vparams.volume_vocoded),
        use_matmul_dft=stft_ops.use_matmul_dft_default(jnp.float32),
        edges_t=tuple(float(e) for e in edges),
        mod_shape=vparams.modulator_window_shape,
        df_mode=DF_ANALYSIS_MODE, **statics)
    fh, fl, mh, ml = (np.asarray(x, np.float64) for x in freq4)
    return fh + fl, mh + ml


def df32_chain_table(bank: voicebank.VoiceBank, n_samples: int,
                     rconfig: resynth_mod.ResynthConfig,
                     vparams: vocoder_mod.VocoderParams, carrier,
                     *, block_size: int = 1 << 15, draws=None) -> np.ndarray:
    """The df32 chain's TRACKER OUTPUT: the (total_frames, n_slots, 16) slot
    control table the renderer consumes — the note-level ground truth of a
    device run, for tools/note_metrics.py's affirmative e2e comparison
    against the host f64 pipeline's table."""
    assert rconfig.dtype == "df32"
    step, _n_frames = prepare_offline_chain_device(
        bank, n_samples, rconfig, vparams, carrier, block_size=block_size,
        draws=draws, emit="table")
    table, _mix, _dropped = step()
    return np.asarray(table, np.float64)


def host_chain_table(bank: voicebank.VoiceBank, n_samples: int,
                     rconfig: resynth_mod.ResynthConfig,
                     vparams: vocoder_mod.VocoderParams, carrier,
                     *, block_size: int = 1 << 15) -> np.ndarray:
    """The host pipeline's slot table for the same workload: synth render ->
    analysis peaks -> host tracker -> slot table (the front of
    run_offline_chain without the render dispatch)."""
    from .. import native as nat

    sr = rconfig.sample_rate
    dtype = rconfig.dtype
    args, statics = voicebank.prepare_bank_arrays(bank, n_samples, block_size,
                                                  dtype)
    args, statics = voicebank.compact_block_args(args, statics)
    window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(rconfig.window_size)
    k = rconfig.max_voices + 1
    S = vparams.stride
    W = vparams.modulator_window
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = vparams.band_freqs()
    bm_car = vocoder_mod._band_matrix(edges, car_fft // 2 + 1, sr / car_fft)
    n_mod_frames = max(0, (n_samples - W) // S + 1)
    n_car_frames = max(0, (n_samples - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0,
                   max(n_mod_frames - 1, 0))
    wdt = jnp.float32 if dtype == "float32" else jnp.float64
    freq, mag, _voc = _fused_analyze_vocode(
        *args, jnp.asarray(window, wdt),
        jnp.asarray(carrier, wdt)[:n_samples], jnp.asarray(edges, wdt),
        jnp.asarray(bm_car, wdt), jnp.asarray(rows), n=n_samples, dtype=dtype,
        window_size=rconfig.window_size, stride=rconfig.stride,
        fft_len=fft_len, k=k, sample_rate=sr, mod_window=W, voc_stride=S,
        car_fft=car_fft, n_mod_frames=n_mod_frames,
        vol_mod=float(vparams.volume_modulator),
        vol_car=float(vparams.volume_carrier),
        vol_voc=float(vparams.volume_vocoded),
        use_matmul_dft=stft_ops.use_matmul_dft_default(wdt),
        edges_t=tuple(float(e) for e in edges),
        mod_shape=vparams.modulator_window_shape, **statics)
    freq_h = np.asarray(freq, np.float64)
    mag_h = np.asarray(mag, np.float64)
    n_frames = int(freq_h.shape[0])
    rcfg = resynth_mod._render_config(rconfig)
    if nat.available() and rconfig.draw_indexing != "stable":
        return np.asarray(resynth_mod.build_tables_native(
            freq_h, mag_h, rconfig, n_frames + 8, rcfg), np.float64)
    peaks = stft_ops.top_peaks_to_lists(freq_h, mag_h)
    notes, _stats, _dropped = resynth_mod.track(peaks, rconfig,
                                                prefer_native=False)
    return np.asarray(resynth_bank._build_slot_tables(
        notes, n_frames + 8, rcfg), np.float64)


def run_offline_chain_device(bank: voicebank.VoiceBank, n_samples: int,
                             rconfig: resynth_mod.ResynthConfig,
                             vparams: vocoder_mod.VocoderParams, carrier,
                             *, block_size: int = 1 << 15,
                             draws=None) -> OfflineChainResult:
    """Single-dispatch offline chain: the device-resident tracker
    (analysis/device_tracker.py) replaces the host pitch pipeline, so the
    whole synth->resynth->vocode graph runs as ONE device program with zero
    host round trips. Covers the reference's full default config space
    including autotune (scale/chord/intervals) and harmonize."""
    step, n_frames = prepare_offline_chain_device(
        bank, n_samples, rconfig, vparams, carrier,
        block_size=block_size, draws=draws)
    framed, mix, dropped = step()
    # the fused program emits channel-major FRAMED (2, F, S); the
    # convenience wrapper restores the (T, 2) contract on the host
    # (outside the hot serving loop; the flatten is a free numpy view)
    rcfg = resynth_mod._render_config(rconfig)
    flat = assemble_framed_stereo(framed, rcfg.start_sample)
    return OfflineChainResult(resynth=flat.T, vocoded=mix,
                              n_frames=n_frames, dropped=dropped)


def assemble_framed_stereo(framed, start_sample: int) -> np.ndarray:
    """Host assembly of the fused chain's framed output: (C, F, S) device
    array -> (C, start_sample + F*S) numpy. The flatten is a numpy view;
    only the leading-silence pad copies."""
    a = np.asarray(framed)
    flat = a.reshape(a.shape[0], -1)
    if start_sample:
        flat = np.concatenate(
            [np.zeros((a.shape[0], start_sample), a.dtype), flat], axis=1)
    return flat


@functools.partial(jax.jit, static_argnames=(
    "n", "dtype", "window_size", "stride", "fft_len", "k", "sample_rate",
    "use_matmul_dft", "render_stride", "start_sample") + _TRACKER_STATICS)
def _fused_resynth_from_signal(mono, window, loud_pitches, loud_spl,
                               pan_draws, phase_draws, at_root, at_scale,
                               at_equid, at_allowed, **kw):
    """Single-dispatch analysis->resynthesis of a PROVIDED mono signal
    (the rt.resynth.job WAV path): STFT -> device peaks -> device tracker ->
    tracked-note render, one XLA program, no host round trips."""
    from . import device_tracker

    mono = mono[: kw["n"]]
    sq = stft_ops._stft_sqmag(mono, window.astype(mono.dtype),
                              window_size=kw["window_size"],
                              stride=kw["stride"], fft_length=kw["fft_len"],
                              use_matmul_dft=kw["use_matmul_dft"])
    freq, mag = stft_ops._top_peaks(sq, sample_rate=kw["sample_rate"],
                                    fft_length=kw["fft_len"], k=kw["k"])
    table, dropped = device_tracker.build_tables_device(
        freq, mag, loud_pitches, loud_spl, pan_draws, phase_draws,
        **_tracker_call_kwargs(kw, (at_root, at_scale, at_equid, at_allowed)))
    out = resynth_bank._render_slots(table, stride=kw["render_stride"],
                                     n_channels=2, dtype=kw["dtype"],
                                     channel_major=True)
    body = out.reshape(out.shape[0], -1)[:2]
    # channel-major avoids XLA's (T, 2)-output transpose copy; the host
    # consumer transposes for free (numpy view)
    return jnp.pad(body, ((0, 0), (kw["start_sample"], 0))), dropped


def resynthesize_signal_device(signal, rconfig) -> "jnp.ndarray":
    """Device-resident resynthesis of a mono signal (one dispatch), covering
    autotune and harmonize configs.

    Returns the stereo jax array (caller np.asarray()s it to fetch).
    """
    from ..utils import loudness

    sr = rconfig.sample_rate
    n = int(np.shape(signal)[0])
    window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(rconfig.window_size)
    k = rconfig.max_voices + 1
    n_frames = max(0, (n - rconfig.window_size) // rconfig.stride + 1)
    total_frames = n_frames + 8
    rcfg = resynth_mod._render_config(rconfig)
    a = rcfg.ahdsr
    li = loudness.phons_to_index(60.0)
    cap = n_frames * rconfig.max_voices + 16
    pan, phase = resynth_mod.draw_pools(rconfig, cap)
    wdt = jnp.float32 if rconfig.dtype == "float32" else jnp.float64
    _at_kind, at_arrays = autotune_device_arrays(rconfig, wdt)
    stereo, _dropped = _fused_resynth_from_signal(
        jnp.asarray(signal, wdt), jnp.asarray(window, wdt),
        jnp.asarray(np.asarray(loudness.PITCHES), wdt),
        jnp.asarray(np.asarray(loudness.ELVS[li]), wdt),
        jnp.asarray(pan, jnp.float32), jnp.asarray(phase, jnp.float32),
        *at_arrays,
        n=n, dtype=rconfig.dtype, window_size=rconfig.window_size,
        stride=rconfig.stride, fft_len=fft_len, k=k, sample_rate=sr,
        use_matmul_dft=stft_ops.use_matmul_dft_default(wdt),
        total_frames=total_frames, render_stride=rcfg.stride,
        start_sample=rcfg.start_sample,
        **tracker_config_kwargs(rconfig, rcfg))
    return jnp.transpose(stereo)  # fused program is channel-major (2, T)


def prepare_offline_chain_device_batch(banks, n_samples: int,
                                       rconfig: resynth_mod.ResynthConfig,
                                       vparams: vocoder_mod.VocoderParams,
                                       carrier, *, block_size: int = 1 << 15,
                                       draws=None):
    """Batched serving: render B independent jobs per dispatch.

    Same chain as prepare_offline_chain_device, vmapped over jobs — the
    tracker's many small (frames, lanes) ops are latency-bound on one job, so
    batching raises per-chip throughput well beyond B-fold amortization of
    dispatch cost. The violation fallback and the upper-slot render cond are
    hoisted above the vmap (a cond under vmap executes both branches).

    banks: list of VoiceBank (same n_samples/config per job).
    carrier: (n,) shared or (B, n) per-job.
    Returns (step, n_frames); step() -> (stereo (B, T, 2), vocoded (B, m),
    dropped (B,)).
    """
    import jax

    from ..utils import loudness
    from . import device_tracker

    B = len(banks)
    sr = rconfig.sample_rate
    dtype = rconfig.dtype
    statics = None
    arrs = [[] for _ in range(5)]
    for bank in banks:
        args, statics = voicebank.prepare_bank_arrays(bank, n_samples,
                                                      block_size, dtype)
        for i, a in enumerate(args):
            arrs[i].append(np.asarray(a))
    batched_args = [jnp.asarray(np.stack(a)) for a in arrs]

    window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
    fft_len = stft_ops.fft_length_for(rconfig.window_size)
    k = rconfig.max_voices + 1
    S = vparams.stride
    W = vparams.modulator_window
    car_fft = stft_ops.fft_length_for(2 * S)
    edges = vparams.band_freqs()
    bm_car = vocoder_mod._band_matrix(edges, car_fft // 2 + 1, sr / car_fft)
    n_mod_frames = max(0, (n_samples - W) // S + 1)
    n_car_frames = max(0, (n_samples - 2 * S) // S + 1)
    offset = max(0, -(-(W - 2 * S) // S))
    rows = np.clip(np.arange(n_car_frames) - offset, 0,
                   max(n_mod_frames - 1, 0))
    wdt = jnp.float32 if dtype == "float32" else jnp.float64
    carrier = np.asarray(carrier)
    if carrier.ndim == 1:
        carrier = np.broadcast_to(carrier[:n_samples], (B, n_samples))
    carrier_dev = jnp.asarray(carrier[:, :n_samples], wdt)

    n_frames = max(0, (n_samples - rconfig.window_size) // rconfig.stride + 1)
    total_frames = n_frames + 8
    rcfg = resynth_mod._render_config(rconfig)
    a = rcfg.ahdsr
    li = loudness.phons_to_index(60.0)
    if draws is None:
        cap = n_frames * rconfig.max_voices + 16
        draws = resynth_mod.draw_pools(rconfig, cap)
    pan_draws = jnp.asarray(draws[0], jnp.float32)
    phase_draws = jnp.asarray(draws[1], jnp.float32)
    window_dev = jnp.asarray(window, wdt)
    edges_dev = jnp.asarray(edges, wdt)
    bm_dev = jnp.asarray(bm_car, wdt)
    rows_dev = jnp.asarray(rows)
    loud_p = jnp.asarray(np.asarray(loudness.PITCHES), wdt)
    loud_s = jnp.asarray(np.asarray(loudness.ELVS[li]), wdt)

    av_kw = dict(n=n_samples, dtype=dtype, window_size=rconfig.window_size,
                 stride=rconfig.stride, fft_len=fft_len, k=k, sample_rate=sr,
                 mod_window=W, voc_stride=S, car_fft=car_fft,
                 n_mod_frames=n_mod_frames,
                 vol_mod=float(vparams.volume_modulator),
                 vol_car=float(vparams.volume_carrier),
                 vol_voc=float(vparams.volume_vocoded),
                 use_matmul_dft=stft_ops.use_matmul_dft_default(wdt),
                 edges_t=tuple(float(e) for e in edges),
        mod_shape=vparams.modulator_window_shape, **statics)
    _at_kind, at_arrays = autotune_device_arrays(rconfig, wdt)
    tr_kw = dict(
        total_frames=total_frames, stride=rcfg.stride, sample_rate=float(sr),
        autotune_arrays=at_arrays, **tracker_config_kwargs(rconfig, rcfg))

    from ..models.resynth_bank import _F_VB, _F_VTGT

    @jax.jit
    def batch_step(fp, ip, up, gains, codes, car):
        freq, mag, mix = jax.vmap(
            lambda f_, i_, u_, g_, c_, cr_: _fused_analyze_vocode(
                f_, i_, u_, g_, c_, window_dev, cr_, edges_dev, bm_dev,
                rows_dev, **av_kw)
        )(fp, ip, up, gains, codes, car)
        table, dropped = device_tracker.build_tables_device_batch(
            freq, mag, loud_p, loud_s, pan_draws, phase_draws, **tr_kw)
        # min_block=split disables the per-16-slot cond ladder: conds under
        # vmap execute both branches, so the batch hoists ONE coarse split
        split = 64
        lo = jax.vmap(lambda t: resynth_bank._render_slots(
            t[:, :split], stride=rcfg.stride, n_channels=2, dtype=dtype,
            split=split, min_block=split))(table)
        hi_tab = table[:, :, split:]
        live = jnp.any((hi_tab[..., _F_VTGT] != 0) | (hi_tab[..., _F_VB] != 0))
        hi = jax.lax.cond(
            live,
            lambda t: jax.vmap(lambda tt: resynth_bank._render_slots(
                tt, stride=rcfg.stride, n_channels=2, dtype=dtype,
                split=split, min_block=split))(t),
            lambda t: jnp.zeros_like(lo), hi_tab)
        out = (lo + hi).reshape(B, total_frames * rcfg.stride, -1)[:, :, :2]
        stereo = jnp.pad(out, ((0, 0), (rcfg.start_sample, 0), (0, 0)))
        return stereo, mix, dropped

    def step():
        return batch_step(*batched_args, carrier_dev)

    return step, n_frames
