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
