"""Device-mesh sharding of the voice bank.

The reference has no multi-device concept — its parallelism is threads + lock
free queues in one process (SURVEY §2.9). The TPU-native analog: the voice
axis is data-parallel. Each chip renders its shard of the voice bank and the
"mix to output bus" (the reference's serial `buffer[i] += voice.imag()`,
gen.crtp.h:350-378) becomes a `psum` over the mesh — an ICI all-reduce of the
(T, C) block, which is tiny compared to the per-voice work, so scaling is
near-linear.

Time blocks stay replicated (they are embarrassingly parallel too, so a 2-D
mesh ('v', 't') can shard blocks as well for very long renders; the 't' axis
needs no collective at all since constant-frequency voices carry no state
across blocks).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.voices import NoteSchedule
from ..models import sine_synth, voicebank


def default_mesh(n_devices: int | None = None, axis: str = "v") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def pad_voice_axis(schedule: NoteSchedule, multiple: int) -> NoteSchedule:
    """Pad schedule rows so the voice axis divides the mesh size."""
    from ..core.voices import NEVER, round_up

    rows = round_up(schedule.n_rows, multiple)
    if rows == schedule.n_rows:
        return schedule
    pad = rows - schedule.n_rows

    def ext(a, fill):
        return np.concatenate([a, np.full(pad, fill, dtype=a.dtype)])

    return NoteSchedule(
        ext(schedule.press, NEVER), ext(schedule.release, NEVER),
        ext(schedule.frequency, 1.0), ext(schedule.velocity, 0.0),
        ext(schedule.pan, 0.0), ext(schedule.phase, 0.0), schedule.n_notes,
    )


def make_sharded_renderer(mesh: Mesh, *, dtype: str, **statics):
    """Jitted voice-bank renderer with the voice axis sharded over mesh axis 'v'.

    Takes the arrays produced by voicebank.prepare_bank_arrays; returns the
    replicated (n_blocks, block_size, C) output (psum over voice shards).
    """

    def shard_fn(*args):
        partial = voicebank.voicebank_blocks_impl(*args, out_dtype=dtype, **statics)
        return jax.lax.psum(partial, "v")

    in_specs = tuple([P("v")] * 5)
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs, out_specs=P())
    return jax.jit(fn)


def render_bank_sharded(bank: voicebank.VoiceBank, n_samples: int, *,
                        block_size: int = 32768, dtype: str = "float32",
                        mesh: Mesh | None = None) -> np.ndarray:
    """Multi-chip version of voicebank.render_bank."""
    if mesh is None:
        mesh = default_mesh()
    args, statics = voicebank.prepare_bank_arrays(bank, n_samples, block_size, dtype)
    fn = make_sharded_renderer(mesh, dtype=dtype, **statics)
    out = fn(*args)
    nb = statics["n_blocks"]
    return np.asarray(out).reshape(nb * block_size, -1)[:n_samples]


def stft_sqmag_sharded(signal, window, stride: int, mesh: Mesh | None = None,
                       fft_length: int | None = None):
    """Frames-axis-sharded STFT: each device FFTs its shard of analysis
    frames (embarrassingly parallel — the reference's analysis thread becomes
    a mesh dimension). Returns (n_frames_padded, n_bins); caller trims.
    """
    import jax.numpy as jnp

    from ..ops import stft as stft_ops

    if mesh is None:
        mesh = default_mesh()
    n_dev = mesh.devices.size
    signal = jnp.asarray(signal)
    window = jnp.asarray(window, signal.dtype)
    ws = int(window.shape[0])
    if fft_length is None:
        fft_length = stft_ops.fft_length_for(ws)
    n = signal.shape[0]
    n_frames = max(0, (n - ws) // stride + 1)
    n_pad = ((n_frames + n_dev - 1) // n_dev) * n_dev
    starts = (jnp.arange(n_pad) * stride).clip(0, max(n - ws, 0))

    def shard_fn(starts_shard, sig, win):
        idx = starts_shard[:, None] + jnp.arange(ws)[None, :]
        frames = sig[idx] * win[None, :]
        spec = jnp.fft.rfft(frames, n=fft_length)
        scale = 2.0 / jnp.sum(win)
        return (jnp.abs(spec) ** 2 * scale**2).astype(sig.dtype)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P("v"), P(), P()), out_specs=P("v"))
    return jax.jit(fn)(starts, signal, window)[:n_frames]


def stft_sqmag_sharded_halo(signal, window, stride: int,
                            mesh: Mesh | None = None,
                            fft_length: int | None = None):
    """Sequence-parallel STFT where the SIGNAL ITSELF is time-sharded: each
    device holds one contiguous sample chunk and FFTs the frames that start
    inside it; windows straddling a shard boundary read a one-window halo
    `ppermute`d from the next device. Unlike stft_sqmag_sharded (replicated
    signal), per-device memory and interconnect traffic are O(n/n_dev + ws)
    — the layout for signals too long for one chip's HBM.

    Per-shard frame counts differ by at most one, so shards compute a fixed
    capacity of frames and a host-precomputed index map reassembles the
    global frame order after the all_gather (rows are (n_frames, bins) —
    control-sized). Returns (n_frames, n_bins).
    """
    import jax.numpy as jnp

    from ..ops import stft as stft_ops

    if mesh is None:
        mesh = default_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    signal = jnp.asarray(signal)
    window = jnp.asarray(window, signal.dtype)
    ws = int(window.shape[0])
    if fft_length is None:
        fft_length = stft_ops.fft_length_for(ws)
    n = int(signal.shape[0])
    n_frames = max(0, (n - ws) // stride + 1)
    Ls = -(-n // n_dev)  # samples per shard
    sig_pad = jnp.concatenate(
        [signal, jnp.zeros((n_dev * Ls - n,), signal.dtype)])

    # host-side frame -> (shard, local slot) assignment
    g_starts = np.arange(n_frames) * stride
    shard_of = np.minimum(g_starts // Ls, n_dev - 1)
    counts = np.bincount(shard_of, minlength=n_dev)
    Flc = max(1, int(counts.max()))
    local_starts = np.zeros((n_dev, Flc), np.int32)
    flat_index = np.zeros(n_frames, np.int64)
    for d in range(n_dev):
        gs = np.nonzero(shard_of == d)[0]
        local_starts[d, : len(gs)] = g_starts[gs] - d * Ls
        flat_index[gs] = d * Flc + np.arange(len(gs))

    def shard_fn(sig_shard, starts_loc, win):
        sig_shard = sig_shard.reshape(-1)   # (Ls,)
        starts_loc = starts_loc.reshape(-1)  # (Flc,)
        # halo: receive the NEXT shard's first ws samples (the wrap-around
        # pair feeds shard n_dev-1 garbage it never reads: its frame starts
        # satisfy start + ws <= n)
        halo = jax.lax.ppermute(
            sig_shard[:ws], axis,
            perm=[(d, (d - 1) % n_dev) for d in range(n_dev)])
        ext = jnp.concatenate([sig_shard, halo])
        idx = starts_loc[:, None] + jnp.arange(ws)[None, :]
        frames = ext[idx] * win[None, :]
        scale = 2.0 / jnp.sum(win)
        spec = jnp.fft.rfft(frames, n=fft_length)
        return (jnp.abs(spec) ** 2 * scale**2).astype(sig_shard.dtype)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis), P()), out_specs=P(axis))
    sq = jax.jit(fn)(sig_pad, jnp.asarray(local_starts).reshape(-1), window)
    return sq.reshape(n_dev * Flc, -1)[jnp.asarray(flat_index)]


def render_schedule_sharded(schedule: NoteSchedule, n_samples: int,
                            config: sine_synth.SineSynthConfig,
                            mesh: Mesh | None = None) -> np.ndarray:
    """Multi-chip version of models.sine_synth.render_schedule."""
    if mesh is None:
        mesh = default_mesh()
    schedule = pad_voice_axis(schedule, mesh.devices.size)
    bank = sine_synth.bank_from_schedule(schedule, config)
    return render_bank_sharded(
        bank, n_samples, block_size=config.block_size, dtype=config.dtype, mesh=mesh
    )


class _ChainSetup:
    """Analysis/vocoder/tracker statics shared by every sharded-chain
    builder (mirrors the host-side setup of chain.prepare_offline_chain_device)."""

    def __init__(self, rconfig, vparams, n_samples: int, frame_pad: int,
                 total_pad: int):
        from ..analysis import resynth as resynth_mod
        from ..analysis import vocoder as vocoder_mod
        from ..analysis.chain import tracker_config_kwargs
        from ..ops import stft as stft_ops
        from ..utils import loudness

        self.sr = sr = rconfig.sample_rate
        self.window = stft_ops.gaussian_window(rconfig.window_size, sigmas=4.0)
        self.fft_len = stft_ops.fft_length_for(rconfig.window_size)
        self.k = rconfig.max_voices + 1
        self.n_frames = max(
            0, (n_samples - rconfig.window_size) // rconfig.stride + 1)
        # frame counts padded so every device gets equal frame shards
        self.Fp = ((self.n_frames + frame_pad - 1) // frame_pad) * frame_pad
        self.total_frames = (
            (self.n_frames + 8 + total_pad - 1) // total_pad) * total_pad
        self.rcfg = resynth_mod._render_config(rconfig)
        self.li = loudness.phons_to_index(60.0)

        self.mod_shape = vparams.modulator_window_shape
        self.S = S = vparams.stride
        self.W = W = vparams.modulator_window
        self.car_fft = stft_ops.fft_length_for(2 * S)
        self.edges = np.asarray(vparams.band_freqs())
        self.bm_car = vocoder_mod._band_matrix(
            self.edges, self.car_fft // 2 + 1, sr / self.car_fft)
        self.n_mod_frames = max(0, (n_samples - W) // S + 1)
        n_car_frames = max(0, (n_samples - 2 * S) // S + 1)
        offset = max(0, -(-(W - 2 * S) // S))
        self.vrows = np.clip(np.arange(n_car_frames) - offset, 0,
                             max(self.n_mod_frames - 1, 0))
        self.tr_kw = dict(
            total_frames=self.total_frames, stride=self.rcfg.stride,
            sample_rate=float(sr), **tracker_config_kwargs(rconfig, self.rcfg))


def _chain_setup(rconfig, vparams, n_samples: int, *, frame_pad: int,
                 total_pad: int) -> _ChainSetup:
    return _ChainSetup(rconfig, vparams, n_samples, frame_pad, total_pad)


def make_sharded_chain(mesh: Mesh, n_samples: int, rconfig, vparams,
                       *, block_size: int = 1 << 15, axis: str = "v"):
    """The FULL offline chain (synth -> STFT/peaks -> tracker -> tracked
    render + vocoder) as one sharded program over `mesh`:

      * synth: voice-axis data parallel, mono mixdown = `psum` over ICI
        (the reference's "+= voice" bus, gen.crtp.h:350-378);
      * STFT + peak extraction: frame-axis parallel (sequence parallelism —
        analysis frames are independent), peaks `all_gather`ed (tiny
        (frames, k) arrays ride ICI);
      * pitch tracker: replicated (control-sized work, (frames, lanes) ops);
      * tracked-note slot render: frame-axis parallel again (table rows are
        self-contained per frame), output `all_gather`ed;
      * vocoder: replicated fast path.

    Returns (step(args...), prepare(bank) -> args): jit-compiled shard_map
    over the mesh. Only the no-autotune/no-harmonize config subset (same as
    chain.run_offline_chain_device).
    """
    import jax.numpy as jnp

    from ..analysis import device_tracker
    from ..analysis import vocoder as vocoder_mod
    from ..models import resynth_bank
    from ..ops import stft as stft_ops
    from ..utils import loudness

    n_dev = mesh.devices.size
    cs = _chain_setup(rconfig, vparams, n_samples, frame_pad=n_dev,
                      total_pad=n_dev)
    sr, window, fft_len, k, n_frames = (cs.sr, cs.window, cs.fft_len, cs.k,
                                        cs.n_frames)
    Fp, total_frames, rcfg, li = cs.Fp, cs.total_frames, cs.rcfg, cs.li
    S, W, car_fft, edges, bm_car = cs.S, cs.W, cs.car_fft, cs.edges, cs.bm_car
    mod_shape = cs.mod_shape
    n_mod_frames, vrows, tr_kw = cs.n_mod_frames, cs.vrows, cs.tr_kw
    wdt = jnp.float32

    def shard_fn(fp, ip, up, gains, codes, starts_shard, carrier, loud_p,
                 loud_s, pan_draws, phase_draws, **statics):
        # 1. voice-sharded synth; the output bus is an ICI all-reduce
        out = voicebank.voicebank_blocks_impl(fp, ip, up, gains, codes,
                                              out_dtype="float32", **statics)
        mono = jax.lax.psum(
            out.reshape(-1, out.shape[-1])[:n_samples].sum(axis=1), axis)

        # 2. frame-sharded STFT + device top-k peaks
        win = jnp.asarray(window, wdt)
        idx = starts_shard[:, None] + jnp.arange(rconfig.window_size)[None, :]
        frames = mono[idx] * win[None, :]
        scale = 2.0 / jnp.sum(win)
        spec = jnp.fft.rfft(frames, n=fft_len)
        sq = (jnp.abs(spec) ** 2 * scale**2).astype(wdt)
        freq_sh, mag_sh = stft_ops._top_peaks(sq, sample_rate=sr,
                                              fft_length=fft_len, k=k)
        freq = jax.lax.all_gather(freq_sh, axis).reshape(Fp, -1)[:n_frames]
        mag = jax.lax.all_gather(mag_sh, axis).reshape(Fp, -1)[:n_frames]

        # 3. replicated tracker -> (total_frames, P, 16) control table
        table, dropped = device_tracker.build_tables_device(
            freq, mag, loud_p, loud_s, pan_draws, phase_draws, **tr_kw)

        # 4. frame-sharded tracked-note render
        Fl = total_frames // n_dev
        me = jax.lax.axis_index(axis)
        my_rows = jax.lax.dynamic_slice_in_dim(table, me * Fl, Fl, axis=0)
        out_rows = resynth_bank._render_slots(my_rows, stride=rcfg.stride,
                                              n_channels=2, dtype="float32")
        stereo = jax.lax.all_gather(out_rows, axis).reshape(
            total_frames * rcfg.stride, -1)[:, :2]
        stereo = jnp.pad(stereo, ((rcfg.start_sample, 0), (0, 0)))

        # 5. replicated vocoder fast path on the mono bus
        amps = vocoder_mod._modulator_band_amps_fast(
            mono, tuple(float(e) for e in edges), window=W, stride=S,
            n_frames=n_mod_frames, sample_rate=sr, shape=mod_shape)
        voc = vocoder_mod._carrier_vocode(
            carrier, amps[jnp.asarray(vrows)], jnp.asarray(bm_car, wdt),
            stride=S, fft_len=car_fft)
        return stereo, voc, dropped

    def prepare(bank):
        args, statics = voicebank.prepare_bank_arrays(
            bank, n_samples, block_size, "float32")
        cap = n_frames * rconfig.max_voices + 16
        pan = np.random.default_rng(rconfig.seed).uniform(-1, 1, cap)
        phase = np.random.default_rng(0).uniform(0, 2, cap)
        starts = (np.arange(Fp) * rconfig.stride).clip(
            0, max(n_samples - rconfig.window_size, 0))
        import jax.numpy as jnp

        fixed = (jnp.asarray(starts, np.int32),)
        consts = (jnp.asarray(np.asarray(loudness.PITCHES), wdt),
                  jnp.asarray(np.asarray(loudness.ELVS[li]), wdt),
                  jnp.asarray(pan, jnp.float32),
                  jnp.asarray(phase, jnp.float32))
        return args, fixed, consts, statics

    def build(bank, carrier):
        import functools

        import jax.numpy as jnp

        args, fixed, consts, statics = prepare(bank)
        fn = jax.shard_map(
            functools.partial(shard_fn, **statics), mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            # the replicated tracker mixes all_gather'ed (varying) inputs
            # into an unvarying scan carry — sound here, so skip vma typing
            check_vma=False)
        jfn = jax.jit(fn)
        carrier_dev = jnp.asarray(carrier, wdt)[:n_samples]

        def step():
            return jfn(*args, *fixed, carrier_dev, *consts)

        # expose the compiled HLO so callers (dryrun_multichip) can assert
        # the collective SCHEDULE hasn't silently grown: one psum mixdown +
        # the peak/stereo all_gathers, nothing per-frame or per-voice
        def compiled_text():
            return jfn.lower(*args, *fixed, carrier_dev,
                             *consts).compile().as_text()

        step.compiled_text = compiled_text
        return step

    return build


def default_mesh_2d(nv: int, nf: int) -> Mesh:
    """2-D ('v', 'f') mesh: voice-data-parallel x time/frame-sequence-
    parallel. Uses the first nv*nf devices."""
    devs = np.array(jax.devices()[: nv * nf]).reshape(nv, nf)
    return Mesh(devs, ("v", "f"))


def make_sharded_chain_2d(mesh: Mesh, n_samples: int, rconfig, vparams,
                          *, block_size: int = 1 << 15):
    """The full offline chain over a 2-D ('v', 'f') mesh — the tensor axes
    map to DIFFERENT mesh axes per stage:

      * synth: voices sharded over 'v' AND render blocks sharded over 'f'
        (each (v, f) shard renders its voice slice of its time slice via
        `block_offset`); the mono bus is a `psum` over 'v' followed by an
        `all_gather` of the time shards over 'f' (analysis windows straddle
        time-shard boundaries; a halo `ppermute` of one window would
        suffice for window << shard and is the bandwidth-optimal variant);
      * STFT/peaks + tracked-note render: frames sharded over the FLATTENED
        ('v', 'f') product (sequence parallelism over all chips);
      * tracker + vocoder: replicated (control-sized).

    Same config subset as make_sharded_chain. Voice rows must divide the
    'v' axis size.
    """
    import functools

    import jax.numpy as jnp

    from ..analysis import device_tracker
    from ..analysis import vocoder as vocoder_mod
    from ..models import resynth_bank, voicebank
    from ..ops import stft as stft_ops
    from ..utils import loudness

    assert mesh.axis_names == ("v", "f"), mesh.axis_names
    nv, nf = mesh.devices.shape
    n_dev = nv * nf
    cs = _chain_setup(rconfig, vparams, n_samples, frame_pad=n_dev,
                      total_pad=n_dev)
    sr, window, fft_len, k, n_frames = (cs.sr, cs.window, cs.fft_len, cs.k,
                                        cs.n_frames)
    Fp, total_frames, rcfg, li = cs.Fp, cs.total_frames, cs.rcfg, cs.li
    S, W, car_fft, edges, bm_car = cs.S, cs.W, cs.car_fft, cs.edges, cs.bm_car
    mod_shape = cs.mod_shape
    n_mod_frames, vrows, tr_kw = cs.n_mod_frames, cs.vrows, cs.tr_kw
    wdt = jnp.float32

    def shard_fn(fp, ip, up, gains, codes, starts_shard, carrier, loud_p,
                 loud_s, pan_draws, phase_draws, *, nb_local, **statics):
        # 1. (voice-slice x time-slice) synth; psum over 'v' builds the
        # mono bus per time shard, all_gather over 'f' assembles the signal
        f_idx = jax.lax.axis_index("f")
        out = voicebank.voicebank_blocks_impl(
            fp, ip, up, gains, codes, out_dtype="float32",
            block_offset=f_idx * nb_local,
            **{**statics, "n_blocks": nb_local})
        Ls = nb_local * statics["block_size"]
        mono_local = jax.lax.psum(
            out.reshape(Ls, -1).sum(axis=1), "v")
        gidx = f_idx * Ls + jnp.arange(Ls)
        mono_local = jnp.where(gidx < n_samples, mono_local, 0.0)
        mono = jax.lax.all_gather(mono_local, "f").reshape(-1)[:n_samples]

        # 2. frame-sharded STFT + peaks over the flattened ('v','f') product
        win = jnp.asarray(window, wdt)
        idx = starts_shard[:, None] + jnp.arange(rconfig.window_size)[None, :]
        frames = mono[idx] * win[None, :]
        scale = 2.0 / jnp.sum(win)
        spec = jnp.fft.rfft(frames, n=fft_len)
        sq = (jnp.abs(spec) ** 2 * scale**2).astype(wdt)
        freq_sh, mag_sh = stft_ops._top_peaks(sq, sample_rate=sr,
                                              fft_length=fft_len, k=k)
        freq = jax.lax.all_gather(freq_sh, ("v", "f")).reshape(
            Fp, -1)[:n_frames]
        mag = jax.lax.all_gather(mag_sh, ("v", "f")).reshape(
            Fp, -1)[:n_frames]

        # 3. replicated tracker
        table, dropped = device_tracker.build_tables_device(
            freq, mag, loud_p, loud_s, pan_draws, phase_draws, **tr_kw)

        # 4. tracked-note render, frame rows over the flattened product
        Fl = total_frames // n_dev
        me = jax.lax.axis_index("v") * nf + jax.lax.axis_index("f")
        my_rows = jax.lax.dynamic_slice_in_dim(table, me * Fl, Fl, axis=0)
        out_rows = resynth_bank._render_slots(my_rows, stride=rcfg.stride,
                                              n_channels=2, dtype="float32")
        stereo = jax.lax.all_gather(out_rows, ("v", "f")).reshape(
            total_frames * rcfg.stride, -1)[:, :2]
        stereo = jnp.pad(stereo, ((rcfg.start_sample, 0), (0, 0)))

        # 5. replicated vocoder (decimated fast modulator)
        amps = vocoder_mod._modulator_band_amps_fast(
            mono, tuple(float(e) for e in edges), window=W, stride=S,
            n_frames=n_mod_frames, sample_rate=sr, shape=mod_shape)
        voc = vocoder_mod._carrier_vocode(
            carrier, amps[jnp.asarray(vrows)], jnp.asarray(bm_car, wdt),
            stride=S, fft_len=car_fft)
        return stereo, voc, dropped

    def build(bank, carrier):
        args, statics = voicebank.prepare_bank_arrays(
            bank, n_samples, block_size, "float32")
        nb = statics["n_blocks"]
        nb_local = -(-nb // nf)
        cap = n_frames * rconfig.max_voices + 16
        pan = np.random.default_rng(rconfig.seed).uniform(-1, 1, cap)
        phase = np.random.default_rng(0).uniform(0, 2, cap)
        starts = (np.arange(Fp) * rconfig.stride).clip(
            0, max(n_samples - rconfig.window_size, 0))
        fn = jax.shard_map(
            functools.partial(shard_fn, nb_local=nb_local, **statics),
            mesh=mesh,
            in_specs=(P("v"), P("v"), P("v"), P("v"), P("v"),
                      P(("v", "f")), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)  # replicated tracker over gathered inputs
        jfn = jax.jit(fn)
        carrier_dev = jnp.asarray(carrier, wdt)[:n_samples]
        consts = (jnp.asarray(starts, np.int32), carrier_dev,
                  jnp.asarray(np.asarray(loudness.PITCHES), wdt),
                  jnp.asarray(np.asarray(loudness.ELVS[li]), wdt),
                  jnp.asarray(pan, jnp.float32),
                  jnp.asarray(phase, jnp.float32))

        def step():
            return jfn(*args, *consts)

        return step

    return build


def make_pipelined_chain(mesh_a: Mesh, mesh_b: Mesh, n_samples: int, rconfig,
                         vparams, *, block_size: int = 1 << 15):
    """Pipeline parallelism across jobs: stage 1 (voice-DP synth ->
    frame-SP STFT/peaks -> vocoder) runs on `mesh_a` while stage 2
    (replicated tracker -> frame-SP tracked render) of the PREVIOUS job runs
    on `mesh_b`. The natural cut point is the peak lists — a tiny
    (frames, k) x2 transfer between device groups per job (the reference's
    analysis-thread -> synth handoff, rt.resynth.lib.cpp:1670-1759, as a
    device-group boundary).

    Returns (stage1, stage2): stage1(bank, carrier) -> (freq, mag, vocoded)
    on mesh_a; stage2(freq, mag) -> (stereo, dropped) on mesh_b. Drive them
    with render_jobs_pipelined (or your own loop — JAX async dispatch
    overlaps the two groups).
    """
    import functools

    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from ..analysis import device_tracker
    from ..analysis import vocoder as vocoder_mod
    from ..models import resynth_bank, voicebank
    from ..ops import stft as stft_ops
    from ..utils import loudness

    na, nb_dev = mesh_a.devices.size, mesh_b.devices.size
    cs = _chain_setup(rconfig, vparams, n_samples, frame_pad=na,
                      total_pad=nb_dev)
    sr, window, fft_len, k, n_frames = (cs.sr, cs.window, cs.fft_len, cs.k,
                                        cs.n_frames)
    Fp, total_frames, rcfg, li = cs.Fp, cs.total_frames, cs.rcfg, cs.li
    S, W, car_fft, edges, bm_car = cs.S, cs.W, cs.car_fft, cs.edges, cs.bm_car
    mod_shape = cs.mod_shape
    n_mod_frames, vrows, tr_kw = cs.n_mod_frames, cs.vrows, cs.tr_kw
    wdt = jnp.float32
    ax_a = mesh_a.axis_names[0]
    ax_b = mesh_b.axis_names[0]

    def stage1_fn(fp, ip, up, gains, codes, starts_shard, carrier, **statics):
        out = voicebank.voicebank_blocks_impl(fp, ip, up, gains, codes,
                                              out_dtype="float32", **statics)
        mono = jax.lax.psum(
            out.reshape(-1, out.shape[-1])[:n_samples].sum(axis=1), ax_a)
        win = jnp.asarray(window, wdt)
        idx = starts_shard[:, None] + jnp.arange(rconfig.window_size)[None, :]
        frames = mono[idx] * win[None, :]
        scale = 2.0 / jnp.sum(win)
        spec = jnp.fft.rfft(frames, n=fft_len)
        sq = (jnp.abs(spec) ** 2 * scale**2).astype(wdt)
        freq_sh, mag_sh = stft_ops._top_peaks(sq, sample_rate=sr,
                                              fft_length=fft_len, k=k)
        freq = jax.lax.all_gather(freq_sh, ax_a).reshape(Fp, -1)[:n_frames]
        mag = jax.lax.all_gather(mag_sh, ax_a).reshape(Fp, -1)[:n_frames]
        amps = vocoder_mod._modulator_band_amps_fast(
            mono, tuple(float(e) for e in edges), window=W, stride=S,
            n_frames=n_mod_frames, sample_rate=sr, shape=mod_shape)
        voc = vocoder_mod._carrier_vocode(
            carrier, amps[jnp.asarray(vrows)], jnp.asarray(bm_car, wdt),
            stride=S, fft_len=car_fft)
        return freq, mag, voc

    def stage2_fn(freq, mag, loud_p, loud_s, pan_draws, phase_draws):
        table, dropped = device_tracker.build_tables_device(
            freq, mag, loud_p, loud_s, pan_draws, phase_draws, **tr_kw)
        Fl = total_frames // nb_dev
        me = jax.lax.axis_index(ax_b)
        my_rows = jax.lax.dynamic_slice_in_dim(table, me * Fl, Fl, axis=0)
        out_rows = resynth_bank._render_slots(my_rows, stride=rcfg.stride,
                                              n_channels=2, dtype="float32")
        stereo = jax.lax.all_gather(out_rows, ax_b).reshape(
            total_frames * rcfg.stride, -1)[:, :2]
        stereo = jnp.pad(stereo, ((rcfg.start_sample, 0), (0, 0)))
        return stereo, dropped

    cap = n_frames * rconfig.max_voices + 16
    pan = np.random.default_rng(rconfig.seed).uniform(-1, 1, cap)
    phase = np.random.default_rng(0).uniform(0, 2, cap)
    repl_b = NamedSharding(mesh_b, P())
    consts_b = tuple(
        jax.device_put(jnp.asarray(c), repl_b)
        for c in (np.asarray(loudness.PITCHES, np.float32),
                  np.asarray(loudness.ELVS[li], np.float32),
                  pan.astype(np.float32), phase.astype(np.float32)))
    jfn2 = jax.jit(jax.shard_map(
        stage2_fn, mesh=mesh_b,
        in_specs=(P(), P(), P(), P(), P(), P()), out_specs=(P(), P()),
        check_vma=False))

    def stage2(freq, mag):
        freq = jax.device_put(freq, repl_b)
        mag = jax.device_put(mag, repl_b)
        return jfn2(freq, mag, *consts_b)

    repl_a = NamedSharding(mesh_a, P())
    starts = (np.arange(Fp) * rconfig.stride).clip(
        0, max(n_samples - rconfig.window_size, 0))
    _jit1 = {}

    def stage1(bank, carrier):
        args, statics = voicebank.prepare_bank_arrays(
            bank, n_samples, block_size, "float32")
        key = repr(sorted(statics.items()))
        if key not in _jit1:
            _jit1[key] = jax.jit(jax.shard_map(
                functools.partial(stage1_fn, **statics), mesh=mesh_a,
                in_specs=(P(ax_a), P(ax_a), P(ax_a), P(ax_a), P(ax_a),
                          P(ax_a), P()),
                out_specs=(P(), P(), P()), check_vma=False))
        carrier_dev = jax.device_put(
            jnp.asarray(np.asarray(carrier)[:n_samples], wdt), repl_a)
        return _jit1[key](*args, jnp.asarray(starts, np.int32), carrier_dev)

    return stage1, stage2


def render_jobs_pipelined(banks, n_samples: int, rconfig, vparams, carriers,
                          *, block_size: int = 1 << 15, devices=None):
    """Two-stage pipeline over the device list: the first half runs stage 1
    (synth/analysis/vocoder) of job k while the second half runs stage 2
    (tracker/render) of job k-1 — JAX async dispatch overlaps the groups;
    only the tiny peak lists cross the group boundary.

    Returns a list of (stereo, vocoded, dropped) per job.
    """
    devs = list(devices if devices is not None else jax.devices())
    half = max(1, len(devs) // 2)
    mesh_a = Mesh(np.array(devs[:half]), ("v",))
    mesh_b = Mesh(np.array(devs[half:half * 2]), ("f",))
    stage1, stage2 = make_pipelined_chain(mesh_a, mesh_b, n_samples, rconfig,
                                          vparams, block_size=block_size)
    outs = []
    pending = None  # (vocoded, (freq, mag)) of the previous job
    for job in list(zip(banks, carriers)) + [None]:
        fut1 = stage1(*job) if job is not None else None
        if pending is not None:
            voc_prev, (freq_prev, mag_prev) = pending
            stereo, dropped = stage2(freq_prev, mag_prev)
            outs.append((stereo, voc_prev, dropped))
        if fut1 is not None:
            freq, mag, voc = fut1
            pending = (voc, (freq, mag))
        else:
            pending = None
    return outs


def render_jobs_farm(banks, n_samples: int, rconfig, vparams, carriers,
                     *, n_groups: int = 2, block_size: int = 1 << 15,
                     devices=None):
    """Job-level parallelism (the DCN/'farm-style batch rendering' analog,
    SURVEY §2.9/§5.8): partition the devices into `n_groups` independent
    sub-meshes, build the voice-sharded chain once per group, and
    round-robin the (bank, carrier) jobs over the groups. JAX's async
    dispatch overlaps the groups' device work; results are fetched in job
    order. Independent jobs need no cross-group collectives at all — this
    is the multi-host layout where only hosts talk DCN.

    Returns a list of (stereo, vocoded, dropped) per job.
    """
    devs = list(devices if devices is not None else jax.devices())
    per = len(devs) // n_groups
    assert per >= 1, (len(devs), n_groups)
    meshes = [Mesh(np.array(devs[g * per:(g + 1) * per]), ("v",))
              for g in range(n_groups)]
    builders = [make_sharded_chain(m, n_samples, rconfig, vparams,
                                   block_size=block_size) for m in meshes]
    steps = [builders[j % n_groups](bank, car)
             for j, (bank, car) in enumerate(zip(banks, carriers))]
    return [s() for s in steps]
