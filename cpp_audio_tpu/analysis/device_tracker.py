"""Device-resident pitch tracking: the whole analysis->render control path on TPU.

The host pitch pipeline (analysis/pitch.py, native/pitchpipe.cpp) forces two
host<->device round trips per offline render: peaks D2H, control table H2D.
This module re-architects the tracker as device code so the full chain
(synth -> STFT -> peaks -> track -> slot table -> render) is ONE XLA program:

  * frame-local stages (pitch conversion, nearby-peak aggregation, reduction,
    perceived-loudness ordering) are BATCHED over all frames — no recurrence;
    aggregation's greedy grouping runs as boolean matrix squaring of the
    jump graph on the MXU (general gathers/scatters are near-scalar on TPU,
    so ALL cross-lane data movement here is one-hot batched matmuls);
  * the cross-frame state machine itself is FRAME-PARALLEL
    (`_build_tables_parallel`): absent voice-cap drops the played set
    entering frame f is exactly frame f-1's valid tuned pitches, so the
    reference's two-pointer matching (rt.resynth.lib.algo.cpp:256-305)
    becomes a per-frame-pair batch, note identity becomes pointer doubling
    over match links, and the per-voice phase/volume boundary recurrences
    become carried modular sums / affine compositions in the same doubling.
    An exact violation predicate (cap drop possible, slot overflow, overlong
    release tail) falls back via `lax.cond` to a faithful `lax.scan` state
    machine (`_track_step`) over frames;
  * both paths emit the SAME (total_frames, n_slots, 16) control table the
    host builders produce (models/resynth_bank.py field order).

Semantics match PitchTracker/native pitchpipe exactly for the supported
config subset (no autotune, no harmonize; shifts allowed): same greedy
aggregation (rt.resynth.lib.algo.cpp:124-184), same reductions, same loudness
ordering (ISO-226 60-phon weights), same voice-cap drop policy, same slot
packing order, and the same RNG draw order when given the host's pan/phase
draw pools (pan per accepted NoteOn in event order; phase per slotted note in
pack order). Differences: boundary recurrences run in f32 on device (host
uses f64), and the envelope `top` field is written from the release frame on
(the host writes it across the whole note since it packs after tracking) —
both render-equivalent; tests compare rendered audio.

Reference: RtResynth::step pipeline (source/rt.resynth.lib.cpp:1670-1759),
synthesize_sounds event policy (:265-382).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FAR = 1e12
_PITCH_EPSILON = 1e-4  # rt.resynth.lib.algo.cpp:3
_SCAN_UNROLL = 1  # tuned on hardware; see bench notes
_NF = 16
(_F_INC, _F_RATIO, _F_PHB, _F_VTGT, _F_VB, _F_ALPHA, _F_TP0, _F_TR0,
 _F_TOP, _F_A, _F_H, _F_D, _F_SUS, _F_R, _F_GL, _F_GR) = range(_NF)


def _pitch_of_freq(freq):
    return 69.0 + 12.0 * jnp.log2(freq / 440.0)


def _freq_of_pitch(pitch):
    return 440.0 * jnp.exp2((pitch - 69.0) / 12.0)


def _harmonize_lanes(tpitch, tvol, h: float):
    """Device harmonize_pitches (rt.resynth.lib.algo.cpp:318-371): add a
    +h-halftones copy of every pitch; a copy within PITCH_EPSILON of an
    existing pitch merges its volume into it instead. Doubles the lane count
    (F, k) -> (F, 2k), output re-sorted ascending with inf padding.

    The reference searches the *growing* vector with a lower_bound whose
    sorted precondition its own appends break (algo.cpp:338-348), so its
    search can MISS a true-closest original once any copy was appended; the
    host paths (pitch.py, native/pitchpipe.cpp) reproduce that probe
    sequence exactly (pinned by tests/test_reference_oracle.py). This device
    kernel merges by true closest instead: the two differ only when a copy
    lands within PITCH_EPSILON (1e-4 halftones) of an original AND an
    earlier copy was appended — an eps-exact configuration (e.g. harmonize
    by exactly 12 over octave content). Copy-vs-copy merges remain
    impossible (copies inherit the > nearby_distance spacing of their
    sources).
    """
    F, k = tpitch.shape
    fdt = tpitch.dtype
    valid = jnp.isfinite(tpitch)
    hp = jnp.where(valid, tpitch + h, jnp.inf)
    # |original_j - copy_i|, invalid originals pushed to +inf
    pj = jnp.where(valid, tpitch, FAR)[:, None, :]
    dist = jnp.abs(pj - jnp.where(valid, hp, -FAR)[:, :, None])  # (F, i, j)
    mind = jnp.min(dist, axis=-1)
    merge = valid & (mind <= _PITCH_EPSILON)
    # first (lowest-j) original attaining the min — reference std::min_element
    is_min = dist <= mind[..., None]
    lane = jnp.arange(k)
    first_j = jnp.min(jnp.where(is_min, lane[None, None, :], k), axis=-1)
    oh = ((first_j[..., None] == lane[None, None, :]) & merge[..., None]
          ).astype(fdt)
    vol_add = jnp.einsum("fij,fi->fj", oh, tvol,
                         precision=jax.lax.Precision.HIGHEST)
    new_vol = jnp.where(valid & ~merge, tvol, 0.0)
    new_pitch = jnp.where(valid & ~merge, hp, jnp.inf)
    cat_p = jnp.concatenate([tpitch, new_pitch], axis=-1)
    cat_v = jnp.concatenate([tvol + vol_add, new_vol], axis=-1)
    key = jnp.where(jnp.isfinite(cat_p), cat_p, jnp.inf)
    _, out_p, out_v = jax.lax.sort((key, cat_p, cat_v), dimension=-1,
                                   num_keys=1)
    return out_p, out_v


def _harmonize_lanes_reference(tpitch, tvol, h: float):
    """Device harmonize_pitches with the reference's PROBE-EXACT semantics
    (rt.resynth.lib.algo.cpp:318-371): for each original pitch i (in
    ascending order), probe the GROWING vector with std::lower_bound's exact
    midpoint sequence + the find_closest_pitch neighbor comparison
    (rt.resynth.lib.autotune.cpp:189-218), merging the copy's volume into
    the probed element when within PITCH_EPSILON, else appending it. The
    appends break lower_bound's sorted precondition, so the probe can MISS
    a true-closest original — duplicate eps-equal pitches survive, and a
    copy reads its source's CURRENT volume (post-merge aliasing). Matches
    analysis/pitch.harmonize_pitches(semantics="reference") exactly.

    Sequential by construction (each probe sees earlier appends): a
    lax.scan over the k original lanes with a fixed-iteration binary
    search; all dynamic indexing is one-hot compare+sum (gathers run
    near-scalar on TPU). ~k sequential steps — used only when a config
    selects reference-semantics harmonize; the batched merged-intent
    `_harmonize_lanes` remains the default kernel.

    (F, k) sorted pitches (+inf pad) -> (F, 2k) sorted, stable (the
    reference merge_sort_step of the two sorted runs == a stable sort).
    """
    F, k = tpitch.shape
    fdt = tpitch.dtype
    n2 = 2 * k
    valid = jnp.isfinite(tpitch)
    sz = jnp.sum(valid, axis=-1).astype(jnp.int32)          # (F,)
    ap0 = jnp.concatenate(
        [jnp.where(valid, tpitch, jnp.inf),
         jnp.full((F, k), jnp.inf, fdt)], axis=-1)
    av0 = jnp.concatenate(
        [jnp.where(valid, tvol, 0.0).astype(fdt),
         jnp.zeros((F, k), fdt)], axis=-1)
    lanes = jnp.arange(n2)
    n_iter = int(np.ceil(np.log2(n2 + 1)))

    def gather(arr, idx):  # (F, n2), (F,) -> (F,): one-hot compare+sum
        return jnp.sum(jnp.where(lanes[None, :] == idx[:, None], arr, 0.0),
                       axis=-1)

    def body(carry, i):
        ap, av, cnt = carry
        active = i < sz                                    # (F,)
        idx_i = jnp.full((F,), i, jnp.int32)
        hp = gather(ap, idx_i) + h
        # std::lower_bound midpoint trace over [0, cnt)
        lo = jnp.zeros((F,), jnp.int32)
        hi = cnt
        for _ in range(n_iter):
            cond = lo < hi
            mid = (lo + hi) // 2
            less = gather(ap, mid) < hp
            lo = jnp.where(cond & less, mid + 1, lo)
            hi = jnp.where(cond & ~less, mid, hi)
        # find_closest_pitch neighbor comparison (f32/f64 per lane dtype)
        at_end = lo >= cnt
        at_beg = lo == 0
        d_lo = jnp.abs(hp - gather(ap, jnp.minimum(lo, cnt - 1)))
        d_prev = jnp.abs(hp - gather(ap, jnp.maximum(lo - 1, 0)))
        idx = jnp.where(at_end, cnt - 1,
                        jnp.where(at_beg, 0,
                                  jnp.where(d_lo < d_prev, lo, lo - 1)))
        merge = (jnp.abs(gather(ap, idx) - hp) <= _PITCH_EPSILON) & active
        append = (~merge) & active
        pvol = gather(av, idx_i)   # CURRENT volume (post-merge aliasing)
        oh_idx = lanes[None, :] == idx[:, None]
        av = av + jnp.where(merge[:, None] & oh_idx, pvol[:, None], 0.0)
        oh_cnt = lanes[None, :] == cnt[:, None]
        ap = jnp.where(append[:, None] & oh_cnt, hp[:, None], ap)
        av = jnp.where(append[:, None] & oh_cnt, pvol[:, None], av)
        cnt = cnt + append.astype(jnp.int32)
        return (ap, av, cnt), None

    (ap, av, _cnt), _ = jax.lax.scan(body, (ap0, av0, sz),
                                     jnp.arange(k, dtype=jnp.int32))
    key = jnp.where(jnp.isfinite(ap), ap, jnp.inf)
    _, out_p, out_v = jax.lax.sort((key, ap, av), dimension=-1, num_keys=1)
    return out_p, out_v


def _autotune_lanes(tpitch, tvol, at_root, at_scale, at_equid, at_allowed, *,
                    kind: str, max_pitch: float, tolerance: float):
    """Device autotune_pitches (rt.resynth.lib.algo.cpp:191-229 +
    autotune.cpp:89-142): snap each pitch to the allowed set, keep the
    original when it (or its snap) exceeds max_pitch, drop entries farther
    than `tolerance` from their snap, merge coincident outputs (within
    PITCH_EPSILON — exact for snapped values, which land on a discrete grid).
    """
    fdt = tpitch.dtype
    valid = jnp.isfinite(tpitch)
    p = jnp.where(valid, tpitch, 0.0)
    if kind == "scale":
        # octave-folded closest scale degree (MusicalScalePitches::
        # closest_pitch, autotune.cpp:89-142; int() truncation replicated)
        od = (p - at_root) / 12.0
        oct_t = jnp.where(od >= 0, jnp.trunc(od), jnp.trunc(od) - 1.0)
        rel = p - oct_t * 12.0 - at_root
        idx = jnp.sum(rel[..., None] >= at_equid[None, None, :], axis=-1)
        oh = (idx[..., None] == jnp.arange(at_scale.shape[0])[None, None, :]
              ).astype(fdt)
        snap = jnp.einsum("fkj,j->fk", oh, at_scale,
                          precision=jax.lax.Precision.HIGHEST)
        tp = p - (rel - snap)
        transform_ok = jnp.ones_like(valid)
    else:  # "allowed": closest element of a sorted list, ties -> lower
        if at_allowed.shape[0] == 0:
            return (jnp.full_like(tpitch, jnp.inf), jnp.zeros_like(tvol))
        dist = jnp.abs(p[..., None] - at_allowed[None, None, :])
        mind = jnp.min(dist, axis=-1)
        cand = jnp.where(dist <= mind[..., None], at_allowed[None, None, :],
                         jnp.inf)
        tp = jnp.min(cand, axis=-1)
        transform_ok = jnp.ones_like(valid)
    use_tp = (p <= max_pitch) & (tp <= max_pitch) & transform_ok
    snapped = jnp.where(use_tp, tp, p)
    keep = valid & (jnp.abs(snapped - p) <= tolerance)
    out_p = jnp.where(keep, snapped, jnp.inf)
    out_v = jnp.where(keep, tvol, 0.0)
    # merge coincident consecutive outputs: sort, then group within eps
    sp, sv = jax.lax.sort((out_p, out_v), dimension=-1, num_keys=1)
    fin = jnp.isfinite(sp)
    prev = jnp.concatenate([jnp.full_like(sp[:, :1], -jnp.inf), sp[:, :-1]],
                           axis=-1)
    boundary = ~fin | (sp - prev >= _PITCH_EPSILON)
    gid = jnp.cumsum(boundary.astype(jnp.int32), axis=-1) - 1
    lane = jnp.arange(sp.shape[-1])
    oh_g = ((gid[..., None] == lane[None, None, :]) & fin[..., None]
            ).astype(fdt)
    gvol = jnp.einsum("fjg,fj->fg", oh_g, sv,
                      precision=jax.lax.Precision.HIGHEST)
    gp = jnp.min(jnp.where((oh_g > 0.5), sp[..., None], jnp.inf), axis=1)
    return gp, jnp.where(jnp.isfinite(gp), gvol, 0.0)


@functools.partial(jax.jit, static_argnames=(
    "d", "min_volume", "pitch_method", "volume_method", "shift_pre",
    "shift_post", "analysis_volume", "harmonize_pre", "harmonize_post",
    "autotune_kind", "autotune_max_pitch", "autotune_tolerance",
    "harmonize_semantics"))
def _frame_local(freq, mag_db, loud_pitches, loud_spl, at_root, at_scale,
                 at_equid, at_allowed, *, d: float,
                 min_volume: float, pitch_method: int, volume_method: int,
                 shift_pre: float, shift_post: float, analysis_volume: float,
                 harmonize_pre: float = 0.0, harmonize_post: float = 0.0,
                 autotune_kind: str = "off",
                 autotune_max_pitch: float = 150.0,
                 autotune_tolerance: float = 100.0,
                 harmonize_semantics: str = "merged"):
    """Batched frame-local pipeline: peaks -> (tuned pitch, volume, order),
    running the reference stage order shift(pre) -> harmonize(pre) ->
    autotune -> shift(post) -> harmonize(post)
    (RtResynth::step, rt.resynth.lib.cpp:1676-1727).

    freq/mag_db: (F, k) frequency-sorted peak arrays (-inf mag = invalid).
    Returns (F, k') tuned pitch (+inf pad), volume (0 pad), loudness order —
    k' doubles per enabled harmonize stage.
    """
    k = freq.shape[-1]
    valid = jnp.isfinite(mag_db) & (freq > 0) & jnp.isfinite(freq)
    pitch = jnp.where(valid, _pitch_of_freq(jnp.maximum(freq, 1e-9)), jnp.inf)
    vol = jnp.where(valid, jnp.power(10.0, mag_db / 20.0), 0.0)

    # Greedy nearby grouping (rt.resynth.lib.algo.cpp:124-184) without
    # gathers/scatters (near-scalar on TPU): compare-all jump counts, then
    # boundary reachability by BOOLEAN MATRIX SQUARING of the jump graph on
    # the MXU, then one-hot segment reductions.
    fdt = pitch.dtype
    nxt = jnp.sum((pitch[:, None, :] <= pitch[:, :, None] + d)
                  & valid[:, None, :], axis=-1)  # (F, k) first idx beyond group
    lane = jnp.arange(k)
    J = (nxt[:, :, None] == lane[None, None, :]).astype(jnp.float32)
    reach = jnp.zeros((pitch.shape[0], k), jnp.float32).at[:, 0].set(1.0)
    steps = max(1, int(np.ceil(np.log2(k))))
    for _ in range(steps):
        reach = jnp.minimum(
            reach + jnp.einsum("fj,fjl->fl", reach, J), 1.0)
        J = jnp.minimum(jnp.einsum("fjm,fml->fjl", J, J), 1.0)
    bound = reach > 0.5
    gid = jnp.cumsum(bound.astype(jnp.int32), axis=-1) - 1

    pz = jnp.where(valid, pitch, 0.0)
    oh_g = (gid[:, :, None] == lane[None, None, :]).astype(jnp.float32)
    sums = jnp.einsum("fjg,fjc->fgc", oh_g,
                      jnp.stack([vol, pz * vol, valid.astype(fdt)], axis=-1),
                      precision=jax.lax.Precision.HIGHEST)
    sum_vol, sum_pv, count = sums[..., 0], sums[..., 1], sums[..., 2]
    in_g = oh_g > 0.5  # (F, j, g) membership
    max_vol = jnp.max(jnp.where(in_g, vol[:, :, None], 0.0), axis=1)
    min_p = jnp.min(jnp.where(in_g & valid[:, :, None],
                              pitch[:, :, None], jnp.inf), axis=1)
    max_p = jnp.max(jnp.where(in_g & valid[:, :, None],
                              pitch[:, :, None], -jnp.inf), axis=1)
    # first (lowest-pitch) element attaining the group max volume
    maxv_of_lane = jnp.einsum("fjg,fg->fj", oh_g, max_vol,
                              precision=jax.lax.Precision.HIGHEST)
    is_max = vol >= maxv_of_lane
    pitch_at_max = jnp.min(
        jnp.where(in_g & (valid & is_max)[:, :, None],
                  pitch[:, :, None], jnp.inf), axis=1)

    if volume_method == 0:  # MAX_VOLUME
        gvol = max_vol
    else:  # SUM_VOLUMES
        gvol = sum_vol
    if pitch_method == 0:  # INTERVAL_CENTER
        gpitch = 0.5 * (min_p + max_p)
    elif pitch_method == 1:  # MAX_VOLUME
        gpitch = pitch_at_max
    else:  # PONDERATE_BY_VOLUME
        gpitch = sum_pv / jnp.maximum(sum_vol, 1e-30)
    keep = (gvol >= min_volume) & (count > 0)

    # multi-operand sort carries the volumes with the pitch key — an
    # argsort + two take_along_axis gathers runs near-scalar on TPU
    key = jnp.where(keep, gpitch + shift_pre, jnp.inf)
    tpitch, tvol = jax.lax.sort((key, jnp.where(keep, gvol, 0.0)),
                                dimension=-1, num_keys=1)
    hfn = (_harmonize_lanes_reference if harmonize_semantics == "reference"
           else _harmonize_lanes)
    if harmonize_pre:
        tpitch, tvol = hfn(tpitch, tvol, harmonize_pre)
    if autotune_kind != "off":
        tpitch, tvol = _autotune_lanes(
            tpitch, tvol, at_root, at_scale, at_equid, at_allowed,
            kind=autotune_kind, max_pitch=autotune_max_pitch,
            tolerance=autotune_tolerance)
    if shift_post:
        tpitch = jnp.where(jnp.isfinite(tpitch), tpitch + shift_post, tpitch)
    if harmonize_post:
        tpitch, tvol = hfn(tpitch, tvol, harmonize_post)

    # perceived-loudness order (60 phon): stable descending vol/loudness.
    # interp over the 29-point ISO table via compare-all + one-hot matmul
    # (jnp.interp lowers to general gathers)
    x = jnp.where(jnp.isfinite(tpitch), tpitch, loud_pitches[-1])
    x = jnp.clip(x, loud_pitches[0], loud_pitches[-1])
    nlp = loud_pitches.shape[0]
    seg = jnp.clip(jnp.sum(x[..., None] >= loud_pitches[None, None, :],
                           axis=-1) - 1, 0, nlp - 2)  # (F, k) segment idx
    oh_s = (seg[..., None] == jnp.arange(nlp - 1)[None, None, :]).astype(fdt)
    P_ = jax.lax.Precision.HIGHEST  # values must survive (bf16 default)
    x0 = jnp.einsum("fks,s->fk", oh_s, loud_pitches[:-1], precision=P_)
    x1 = jnp.einsum("fks,s->fk", oh_s, loud_pitches[1:], precision=P_)
    y0 = jnp.einsum("fks,s->fk", oh_s, loud_spl[:-1], precision=P_)
    y1 = jnp.einsum("fks,s->fk", oh_s, loud_spl[1:], precision=P_)
    tfr = jnp.where(x1 > x0, (x - x0) / jnp.maximum(x1 - x0, 1e-30), 0.0)
    spl = y0 + tfr * (y1 - y0)
    w = tvol / spl
    loud_order = jnp.argsort(-w, axis=-1, stable=True)
    volume = analysis_volume * tvol
    return tpitch, volume, loud_order


def _track_step(carry, xs, *, k: int, P: int, Q: int, statics):
    """One analysis frame: events + slot bookkeeping + table-row emission."""
    (pl_pitch, pl_slot, st, pan_ctr, phase_ctr, dropped) = carry
    (st_state, st_f1, st_press, st_release, st_top, st_A, st_H, st_D, st_R,
     st_gl, st_gr, st_phase, st_volb, st_previnc, st_curinc, st_curvol) = st
    tpitch, volume, loud_order, f_idx, is_data = xs
    (S, sr, maxd, max_voices, attack, hold, decay, sustain, release,
     stereo_spread, total_frames, pan_draws, phase_draws,
     stable_draws) = statics
    wdt = tpitch.dtype  # f32 serving / f64 verification (see module doc)
    fS = f_idx.astype(wdt) * np.asarray(S, wdt)
    min_dt = sr / 1000.0
    has_decay = sustain < 0.999999
    sus = min(max(sustain, 0.0), 1.0) if has_decay else 1.0

    # (b) two-pointer tracking (rt.resynth.lib.algo.cpp:256-305). With
    # lb/ub = the played-index windows of each tuned pitch, the reference
    # loop reduces to the integer recurrence
    #   c_j = max(it_j, lb_j); matched_j = c_j < ub_j; it_{j+1} = c_j + m_j.
    # Evaluated carry-lookahead style: blocks of B lanes tabulate their
    # composed pointer map over all Q+1 pointer values in parallel (the map
    # is a monotone integer staircase, so Q+1 grid points determine it),
    # block carries chain through 1-element gathers, then every block
    # resolves its lanes from its incoming pointer — dependency depth
    # B + k/B instead of k.
    tvalid = jnp.isfinite(tpitch) & is_data
    lb = jnp.searchsorted(pl_pitch, tpitch - maxd).astype(jnp.int32)
    ub_raw = jnp.searchsorted(pl_pitch, tpitch + maxd,
                              side="right").astype(jnp.int32)
    ub = jnp.where(tvalid, ub_raw, -1)  # invalid lanes never match
    B = 8
    assert k % B == 0, "tracker lane count must be a multiple of 8"
    nb = k // B
    lb2 = lb.reshape(nb, B)
    ub2 = ub.reshape(nb, B)
    # phase 1: each block's pointer map over the full grid
    v = jnp.broadcast_to(jnp.arange(Q + 1, dtype=jnp.int32), (nb, Q + 1))
    for i in range(B):
        c = jnp.maximum(v, lb2[:, i:i + 1])
        v = c + (c < ub2[:, i:i + 1]).astype(jnp.int32)
    # phase 2: chain the block carries
    x = jnp.int32(0)
    xs_in = []
    for b in range(nb):
        xs_in.append(x)
        x = v[b, jnp.clip(x, 0, Q)]
    x_in = jnp.stack(xs_in)  # (nb,)
    # phase 3: resolve lanes inside each block from its incoming pointer
    vv = x_in
    cs_cols, m_cols = [], []
    for i in range(B):
        c = jnp.maximum(vv, lb2[:, i])
        m = c < ub2[:, i]
        cs_cols.append(c)
        m_cols.append(m)
        vv = c + m.astype(jnp.int32)
    cs = jnp.stack(cs_cols, axis=1).reshape(k)
    matched = jnp.stack(m_cols, axis=1).reshape(k)
    match = jnp.where(matched, cs, Q)  # (k,) played index or Q
    cont = jnp.zeros((Q + 1,), jnp.bool_).at[match].set(True, mode="drop")[:Q]
    pl_valid = jnp.isfinite(pl_pitch)

    # (a) free expired release tails
    st_state = jnp.where((st_state == 2) & (f_idx >= st_f1), 0, st_state)

    # (c) note offs: playing, not continued (only on data frames)
    off = pl_valid & ~cont & is_data
    off_slot = jnp.where(off & (pl_slot >= 0), pl_slot, P)
    rel_sample = fS
    # envelope value the release starts from (env_pressed at release-1)
    tp = rel_sample - 1.0 - st_press
    va = jnp.clip((tp + 1.0) / st_A, 0.0, 1.0)
    vd = 1.0 + (sus - 1.0) * jnp.clip((tp - st_A - st_H + 1.0)
                                      / jnp.maximum(st_D, 1.0), 0.0, 1.0)
    top_now = jnp.where(tp < st_A, va,
                        jnp.where(tp < st_A + st_H, 1.0,
                                  jnp.where((st_D > 0) & (tp < st_A + st_H + st_D),
                                            vd, sus)))
    f1_now = jnp.minimum(np.int32(total_frames),
                         f_idx + jnp.ceil(st_R / S).astype(jnp.int32) + 1)
    off_any = jnp.zeros((P + 1,), jnp.bool_).at[off_slot].set(True, mode="drop")[:P]
    st_state = jnp.where(off_any, 2, st_state)
    st_release = jnp.where(off_any, rel_sample, st_release)
    st_top = jnp.where(off_any, top_now, st_top)
    st_f1 = jnp.where(off_any, f1_now, st_f1)

    # (d) note changes: matched tuned retarget their slot's freq/volume and
    # update the played pitch
    ch_slot_idx = pl_slot[jnp.clip(match, 0, Q - 1)]  # (k,)
    ch_ok = matched & (ch_slot_idx >= 0)
    ch_slot = jnp.where(ch_ok, ch_slot_idx, P)
    new_inc = 2.0 * _freq_of_pitch(tpitch) / sr
    st_curinc = st_curinc.at[ch_slot].set(
        jnp.where(ch_ok, new_inc.astype(st_curinc.dtype), 0), mode="drop")
    st_curvol = st_curvol.at[ch_slot].set(
        jnp.where(ch_ok, volume.astype(st_curvol.dtype), 0), mode="drop")
    pl_pitch = pl_pitch.at[jnp.where(matched, match, Q)].set(
        jnp.where(matched, tpitch, 0), mode="drop")

    # (e) note ons, loudest-first among unmatched with volume > 0
    is_on = tvalid & ~matched & (volume > 0)
    on_l = is_on[loud_order]  # in loudness order
    rank_l = jnp.cumsum(on_l.astype(jnp.int32)) - 1
    active_before = jnp.sum(cont.astype(jnp.int32))
    allowed_l = on_l & (active_before + rank_l < max_voices)
    dropped = dropped + jnp.sum((on_l & ~allowed_l).astype(jnp.int32))
    r_alloc_l = jnp.cumsum(allowed_l.astype(jnp.int32)) - 1
    n_allowed = jnp.sum(allowed_l.astype(jnp.int32))

    free = st_state == 0
    # ascending free-slot ids by rank (host picks the first free slot):
    # scatter slot id to its free-rank position — no sort needed
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    free_by_rank = jnp.zeros((P + 1,), jnp.int32).at[
        jnp.where(free, free_rank, P)].set(jnp.arange(P, dtype=jnp.int32),
                                           mode="drop")[:P]
    n_free = jnp.sum(free.astype(jnp.int32))
    got_slot_l = allowed_l & (r_alloc_l < n_free)
    slot_l = jnp.where(got_slot_l,
                       free_by_rank[jnp.clip(r_alloc_l, 0, P - 1)], -1)
    # phase draws go to slotted notes in pack order (= allocation order here)
    r_slot_l = jnp.cumsum(got_slot_l.astype(jnp.int32)) - 1
    n_slotted = jnp.sum(got_slot_l.astype(jnp.int32))

    on_pitch_l = tpitch[loud_order]
    on_vol_l = volume[loud_order]
    on_inc_l = (2.0 * _freq_of_pitch(on_pitch_l) / sr).astype(wdt)
    if stable_draws:
        # position-keyed draws (ResynthConfig.draw_indexing="stable"):
        # index = frame * max_voices + accepted-on rank. A flipped note
        # decision then perturbs ONLY that note's pan/phase instead of
        # shifting every later note's sequential draw (which decorrelates
        # the whole remaining render — the f32-vs-f64 and TPU-vs-CPU
        # cascade measured in round 4, docs/PERF_NOTES.md).
        base_idx = f_idx.astype(jnp.int32) * np.int32(max_voices)
        pan_idx = base_idx + r_alloc_l
        phase_idx = base_idx + r_alloc_l
    else:
        pan_idx = pan_ctr + r_alloc_l
        phase_idx = phase_ctr + r_slot_l
    pan_l = stereo_spread * pan_draws[
        jnp.clip(pan_idx, 0, pan_draws.shape[0] - 1)]
    th_l = (0.25 * np.pi) * (pan_l + 1.0)
    phase0_l = phase_draws[
        jnp.clip(phase_idx, 0, phase_draws.shape[0] - 1)]
    min_change_l = jnp.floor(0.5 + 2.5 * 2.0 / jnp.maximum(jnp.abs(on_inc_l), 1e-9))
    A_l = jnp.maximum(jnp.maximum(np.asarray(max(attack, min_dt, 1.0), wdt),
                                  min_change_l), 1.0)
    D_l = (jnp.maximum(jnp.maximum(np.asarray(max(decay, min_dt, 1.0), wdt),
                                   min_change_l), 1.0)
           if has_decay else jnp.zeros_like(A_l))
    R_l = jnp.maximum(jnp.maximum(np.asarray(max(release, min_dt, 1.0), wdt),
                                  min_change_l), 1.0)

    tgt = jnp.where(got_slot_l, slot_l, P)
    def put(arr, vals):
        return arr.at[tgt].set(jnp.where(got_slot_l, vals.astype(arr.dtype), 0),
                               mode="drop")
    st_state = st_state.at[tgt].set(jnp.where(got_slot_l, 1, 0), mode="drop")
    st_f1 = st_f1.at[tgt].set(
        jnp.where(got_slot_l, np.int32(total_frames), 0), mode="drop")
    st_press = put(st_press, jnp.broadcast_to(fS, (k,)))
    st_release = put(st_release, jnp.full((k,), FAR, wdt))
    st_top = put(st_top, jnp.full((k,), sus, wdt))
    st_A = put(st_A, A_l)
    st_H = put(st_H, jnp.full((k,), max(hold, 0.0), wdt))
    st_D = put(st_D, D_l)
    st_R = put(st_R, R_l)
    st_gl = put(st_gl, jnp.cos(th_l))
    st_gr = put(st_gr, jnp.sin(th_l))
    st_phase = put(st_phase, phase0_l)
    st_volb = put(st_volb, on_vol_l)
    st_previnc = put(st_previnc, on_inc_l)
    st_curinc = put(st_curinc, on_inc_l)
    st_curvol = put(st_curvol, on_vol_l)

    # (f) played-set update: keep continued, add accepted ons, stable-sorted
    # by pitch (kept-before-new on ties = std::stable_sort of the appended
    # list). Both sides are sorted, so a rank-based merge replaces the sort:
    # position(kept_i) = i' + #news strictly below; position(new_j) = j' +
    # #kept at-or-below.
    keep_pitch = jnp.where(cont, pl_pitch, jnp.inf)
    keep_slot = jnp.where(cont, pl_slot, -1)
    # compact kept (remove dead, preserve order) so ranks line up
    krank = jnp.cumsum(cont.astype(jnp.int32)) - 1
    kpos = jnp.where(cont, krank, Q)
    kc_pitch = jnp.full((Q + 1,), jnp.inf, pl_pitch.dtype).at[kpos].set(
        keep_pitch, mode="drop")[:Q]
    kc_slot = jnp.full((Q + 1,), -1, jnp.int32).at[kpos].set(
        keep_slot, mode="drop")[:Q]
    # news sorted by pitch WITHOUT a sort: scatter the loudness-order masks
    # back to pitch order (tpitch is already ascending), then compact
    allowed_p = jnp.zeros((k,), jnp.bool_).at[loud_order].set(allowed_l)
    slot_p = jnp.full((k,), -1, jnp.int32).at[loud_order].set(slot_l)
    nrank = jnp.cumsum(allowed_p.astype(jnp.int32)) - 1
    tgtpos = jnp.where(allowed_p, nrank, k)
    nb_pitch = jnp.full((k + 1,), jnp.inf, pl_pitch.dtype).at[tgtpos].set(
        jnp.where(allowed_p, tpitch, jnp.inf), mode="drop")[:k]
    nb_slot = jnp.full((k + 1,), -1, jnp.int32).at[tgtpos].set(
        slot_p, mode="drop")[:k]
    posA = jnp.arange(Q, dtype=jnp.int32) + jnp.searchsorted(
        nb_pitch, kc_pitch, side="left").astype(jnp.int32)
    posB = jnp.arange(k, dtype=jnp.int32) + jnp.searchsorted(
        kc_pitch, nb_pitch, side="right").astype(jnp.int32)
    merged_pitch = jnp.full((Q + k,), jnp.inf, pl_pitch.dtype)
    merged_pitch = merged_pitch.at[posA].set(kc_pitch, mode="drop")
    merged_pitch = merged_pitch.at[posB].set(nb_pitch, mode="drop")
    merged_slot = jnp.full((Q + k,), -1, jnp.int32)
    merged_slot = merged_slot.at[posA].set(kc_slot, mode="drop")
    merged_slot = merged_slot.at[posB].set(nb_slot, mode="drop")
    pl_pitch = merged_pitch[:Q]
    pl_slot = merged_slot[:Q]
    pan_ctr = pan_ctr + n_allowed
    phase_ctr = phase_ctr + n_slotted

    # (g) emit this frame's (P, 16) table rows, then advance recurrences
    emit = (st_state > 0) & (f_idx < st_f1)
    inc_to = st_curinc
    inc_from = st_previnc
    ratio = jnp.where(inc_to == inc_from, 0.0,
                      jnp.log(jnp.maximum(inc_to, 1e-30)
                              / jnp.maximum(inc_from, 1e-30)))
    alpha = 1.0 - jnp.exp(-np.pi * jnp.minimum(np.asarray(2.0 / S, wdt),
                                               jnp.abs(inc_to)))
    rows = [
        jnp.where(emit, inc_from, 1e-6),
        jnp.where(emit, ratio, 0.0),
        jnp.where(emit, st_phase, 0.0),
        jnp.where(emit, st_curvol, 0.0),
        jnp.where(emit, st_volb, 0.0),
        jnp.where(emit, alpha, 0.0),
        jnp.where(emit, fS - st_press, -1e9),
        jnp.where(emit, jnp.maximum(fS - st_release, -FAR), 0.0),
        jnp.where(emit, st_top, 0.0),
        jnp.where(emit, st_A, 1.0),
        jnp.where(emit, st_H, 0.0),
        jnp.where(emit, st_D, 0.0),
        jnp.where(emit, jnp.full((P,), sus, wdt), 1.0),
        jnp.where(emit, st_R, 1.0),
        jnp.where(emit, st_gl, 0.0),
        jnp.where(emit, st_gr, 0.0),
    ]
    row_block = jnp.stack(rows, axis=-1).astype(wdt)

    lam = ratio / S
    dphi = jnp.where(ratio == 0.0, S * inc_from,
                     inc_from / jnp.where(lam == 0, 1.0, lam)
                     * jnp.expm1(ratio))
    st_phase = jnp.where(emit, (st_phase + dphi) % 2.0, st_phase)
    st_volb = jnp.where(emit,
                        st_curvol + (st_volb - st_curvol)
                        * jnp.power(1.0 - alpha, np.asarray(S, wdt)),
                        st_volb)
    st_previnc = jnp.where(emit, inc_to, st_previnc)

    st = (st_state.astype(jnp.int32), st_f1.astype(jnp.int32), st_press,
          st_release, st_top, st_A, st_H, st_D, st_R, st_gl, st_gr, st_phase,
          st_volb, st_previnc, st_curinc, st_curvol)
    carry = (pl_pitch, pl_slot.astype(jnp.int32), st,
             pan_ctr.astype(jnp.int32), phase_ctr.astype(jnp.int32),
             dropped.astype(jnp.int32))
    return carry, row_block


def _match_parallel(tpitch, tvalid, maxd, Q: int):
    """Per-frame two-pointer matching f-1 -> f, batched over ALL frames.

    Valid when the played set before frame f equals frame f-1's valid tuned
    pitches (no voice-cap drops, min_volume > 0) — the violation predicate in
    build_tables_device guards this. Returns (matched, match_prev) (F, k).
    """
    F, k = tpitch.shape
    prev = jnp.concatenate(
        [jnp.full((1, k), jnp.inf, tpitch.dtype), tpitch[:-1]], axis=0)
    # compare-all searchsorted: one (F, k, k) compare beats per-step binary
    # searches by a wide margin on TPU
    lb = jnp.sum(prev[:, None, :] < (tpitch - maxd)[:, :, None],
                 axis=-1).astype(jnp.int32)
    ub = jnp.sum(prev[:, None, :] <= (tpitch + maxd)[:, :, None],
                 axis=-1).astype(jnp.int32)
    ub = jnp.where(tvalid, ub, -1)
    B = 8
    nb = k // B
    lb2 = lb.reshape(F, nb, B)
    ub2 = ub.reshape(F, nb, B)
    v = jnp.broadcast_to(jnp.arange(Q + 1, dtype=jnp.int32), (F, nb, Q + 1))
    for i in range(B):
        c = jnp.maximum(v, lb2[:, :, i:i + 1])
        v = c + (c < ub2[:, :, i:i + 1]).astype(jnp.int32)
    # chain the per-block pointer maps: one-hot dot instead of a gather
    # (x stays one-hot over the Q+1 grid; v rows are the staircase tables)
    qgrid = jnp.arange(Q + 1, dtype=jnp.int32)
    x = jnp.zeros((F,), jnp.int32)
    xs_in = []
    for b in range(nb):
        xs_in.append(x)
        oh_x = (jnp.clip(x, 0, Q)[:, None] == qgrid[None, :]).astype(
            jnp.float32)
        x = jnp.round(jnp.einsum("fq,fq->f", oh_x,
                                 v[:, b, :].astype(jnp.float32))
                      ).astype(jnp.int32)
    vv = jnp.stack(xs_in, axis=1)  # (F, nb)
    cs_cols, m_cols = [], []
    for i in range(B):
        c = jnp.maximum(vv, lb2[:, :, i])
        m = c < ub2[:, :, i]
        cs_cols.append(c)
        m_cols.append(m)
        vv = c + m.astype(jnp.int32)
    cs = jnp.stack(cs_cols, axis=-1).reshape(F, k)
    matched = jnp.stack(m_cols, axis=-1).reshape(F, k)
    return matched, jnp.where(matched, cs, 0)


def _build_tables_parallel(tpitch, volume, loud_order, is_data, pan_draws,
                           phase_draws, *, S, sr, maxd, max_voices, P, Q,
                           attack, hold, decay, sustain, release,
                           stereo_spread, total_frames, t_max, tail_E=16,
                           stable_draws: bool = False):
    """Frame-PARALLEL tracker: same table as the `_track_step` scan, built
    from batched (F, k) array ops (no per-frame scan).

    The cross-frame recurrence collapses because, absent voice-cap drops, the
    played set entering frame f is exactly frame f-1's valid tuned pitches:
    matching becomes frame-local (vmapped two-pointer), note identity becomes
    pointer-doubling over match links, and the per-voice phase/volume boundary
    recurrences become carried sums/affine compositions in the same doubling.
    Returns (table, violation) — `violation` True means an assumption broke
    (cap drop possible, slot-table overflow, release tail longer than t_max)
    and the caller must use the scan path instead.
    """
    F, k = tpitch.shape
    # working dtype follows the peaks: f32 on the serving path, f64 in
    # verification mode (CPU; the f64 test pins exact host-set parity)
    f32 = tpitch.dtype
    cst = lambda x: np.asarray(x, f32)
    min_dt = sr / 1000.0
    has_decay = sustain < 0.999999
    sus = min(max(sustain, 0.0), 1.0) if has_decay else 1.0
    attack_eff = cst(max(attack, min_dt, 1.0))
    decay_eff = cst(max(decay, min_dt, 1.0))
    release_eff = cst(max(release, min_dt, 1.0))
    hold_eff = cst(max(hold, 0.0))

    tvalid = jnp.isfinite(tpitch) & is_data[:, None]
    n_valid = jnp.sum(tvalid.astype(jnp.int32), axis=-1)
    viol = jnp.any(n_valid > max_voices)
    viol |= jnp.any(tvalid & ~(volume > 0))

    matched, match_prev = _match_parallel(tpitch, tvalid, maxd, Q)
    alive = tvalid
    f_iota = jnp.arange(F, dtype=jnp.int32)[:, None]
    lane_iota = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :],
                                 (F, k))
    prec = jax.lax.Precision.HIGHEST

    def lane_take(idx_f32, stack):
        """stack (F,k,C); idx (F,k) f32 lane ids -> stack[f, idx[f,i], :].

        One-hot batched matmul on the MXU — general gathers execute
        near-scalar on TPU (150+ ms for this function when written with
        advanced indexing)."""
        oh = (idx_f32[..., None]
              == jnp.arange(k, dtype=f32)[None, None, :]).astype(f32)
        return jnp.einsum("fij,fjc->fic", oh, stack, precision=prec)

    def lane_scatter(idx, vals):
        """out[f, i] = sum_j [idx[f,j] == i] * vals[f,j]  (permutation use)."""
        oh = (idx[..., None]
              == jnp.arange(k, dtype=idx.dtype)[None, None, :]).astype(f32)
        return jnp.einsum("fji,fj->fi", oh, vals.astype(f32), precision=prec)

    fin = lambda a: jnp.where(jnp.isfinite(a), a, 0.0).astype(f32)

    # per-lane local values
    inc_to = (2.0 * _freq_of_pitch(tpitch) / sr).astype(f32)
    prev_inc = jnp.concatenate([inc_to[:1], inc_to[:-1]], axis=0)
    pi_got = lane_take(match_prev.astype(f32), fin(prev_inc)[..., None])
    inc_from = jnp.where(matched, pi_got[..., 0], inc_to)
    ratio = jnp.where(inc_to == inc_from, 0.0,
                      jnp.log(jnp.maximum(inc_to, 1e-30)
                              / jnp.maximum(inc_from, 1e-30))).astype(f32)
    alpha = (1.0 - jnp.exp(-np.pi * jnp.minimum(np.float32(2.0 / S),
                                                jnp.abs(inc_to)))).astype(f32)
    lam = ratio / np.float32(S)
    dphi_loc = jnp.where(ratio == 0.0, np.float32(S) * inc_from,
                         inc_from / jnp.where(lam == 0, 1.0, lam)
                         * jnp.expm1(ratio)).astype(f32)
    q_loc = jnp.power(1.0 - alpha, np.float32(S)).astype(f32)
    c_loc = volume.astype(f32)
    b_loc = (1.0 - q_loc) * c_loc

    # birth-lane values (as if every lane were a birth; gathered later)
    min_change = jnp.floor(0.5 + 2.5 * 2.0
                           / jnp.maximum(jnp.abs(inc_to), 1e-9)).astype(f32)
    A_b = jnp.maximum(jnp.maximum(attack_eff, min_change), 1.0)
    D_b = (jnp.maximum(jnp.maximum(decay_eff, min_change), 1.0)
           if has_decay else jnp.zeros_like(A_b))
    R_b = jnp.maximum(jnp.maximum(release_eff, min_change), 1.0)
    on_mask = tvalid & ~matched & (volume > 0)
    on_l = lane_take(loud_order.astype(f32),
                     on_mask.astype(f32)[..., None])[..., 0] > 0.5
    r_l = jnp.cumsum(on_l.astype(jnp.int32), axis=-1) - 1
    rank_p = jnp.round(lane_scatter(loud_order, r_l.astype(f32))
                       ).astype(jnp.int32)
    n_ons = jnp.sum(on_l.astype(jnp.int32), axis=-1)
    if stable_draws:
        # position-keyed: frame * max_voices + on-rank (see _track_step)
        base = jnp.arange(tpitch.shape[0], dtype=jnp.int32) \
            * np.int32(max_voices)
    else:
        base = jnp.cumsum(n_ons) - n_ons
    draw_idx = base[:, None] + rank_p
    # one 2-wide gather instead of two: general gathers on TPU pay per
    # INDEX, not per element, and both pools share draw_idx
    pools = jnp.stack([pan_draws[:phase_draws.shape[0]],
                       phase_draws[:pan_draws.shape[0]]], axis=-1)
    got_draws = pools[jnp.clip(draw_idx, 0, pools.shape[0] - 1)]
    pan = cst(stereo_spread) * got_draws[..., 0]
    th = cst(0.25 * np.pi) * (pan + 1.0)
    gl_b = jnp.cos(th).astype(f32)
    gr_b = jnp.sin(th).astype(f32)
    ph0_b = got_draws[..., 1]
    vol_b = volume.astype(f32)

    # chains: pointer doubling with carried phase sum + affine volume map.
    def roll_down(a, n, pad_block):
        return jnp.concatenate([pad_block, a[:F - n]], axis=0)

    # accumulate phase advances MOD 2 (rad/pi full circle): raw dphi can be
    # hundreds of cycles per frame, and a raw sum over a long note would sink
    # below f32 resolution (the scan path wraps every frame for the same
    # reason)
    dphi_m = jnp.mod(dphi_loc, 2.0)
    # init gather of frame f-1 values at match_prev (one einsum)
    prev_stack = jnp.stack([fin(dphi_m), fin(q_loc), fin(b_loc)], axis=-1)
    prev_stack = jnp.concatenate([jnp.zeros((1, k, 3), f32),
                                  prev_stack[:-1]], axis=0)
    got = lane_take(match_prev.astype(f32), prev_stack)
    mf = matched.astype(f32)
    # state channels: 0 done, 1 lane, 2 off, 3 sumd, 4 Ac, 5 Bc,
    # 6..12 payload at birth: [ph0, vol, A, D, R, gl, gr]
    st = jnp.stack([
        1.0 - mf,
        jnp.where(matched, match_prev, lane_iota).astype(f32),
        mf,
        mf * got[..., 0],
        jnp.where(matched, got[..., 1], 1.0),
        mf * got[..., 2],
        fin(ph0_b), fin(vol_b), fin(A_b), fin(D_b), fin(R_b),
        fin(gl_b), fin(gr_b),
    ], axis=-1)  # (F, k, 13)
    identity_pad = jnp.concatenate([
        jnp.ones((1, k, 1), f32),                          # done
        jnp.arange(k, dtype=f32)[None, :, None],           # lane
        jnp.zeros((1, k, 2), f32),                         # off, sumd
        jnp.ones((1, k, 1), f32),                          # Ac
        jnp.zeros((1, k, 8), f32),                         # Bc + payload
    ], axis=-1)
    step_len = 1
    while step_len < F:
        pad = jnp.broadcast_to(identity_pad,
                               (min(step_len, F), k, st.shape[-1]))
        rolled = roll_down(st, min(step_len, F), pad)
        anc = lane_take(st[..., 1], rolled)
        done = st[..., 0:1] > 0.5
        lane_n = anc[..., 1]
        off_n = st[..., 2] + anc[..., 2]
        sum_n = jnp.mod(st[..., 3] + anc[..., 3], 2.0)
        Ac_n = st[..., 4] * anc[..., 4]
        Bc_n = st[..., 4] * anc[..., 5] + st[..., 5]
        comp = jnp.concatenate([
            jnp.stack([anc[..., 0], lane_n, off_n, sum_n, Ac_n, Bc_n],
                      axis=-1),
            anc[..., 6:],
        ], axis=-1)
        st = jnp.where(done, st, comp)
        step_len *= 2
    off = jnp.round(st[..., 2]).astype(jnp.int32)
    sumd = st[..., 3]
    Ac, Bc = st[..., 4], st[..., 5]
    bf = f_iota - off          # (F, k) birth frame
    press = bf.astype(f32) * np.float32(S)
    ph0_n, vol_n = st[..., 6], st[..., 7]
    A_n, D_n, R_n = st[..., 8], st[..., 9], st[..., 10]
    gl_n, gr_n = st[..., 11], st[..., 12]
    phase_start = jnp.mod(ph0_n + sumd, 2.0).astype(f32)
    volb_start = (Ac * vol_n + Bc).astype(f32)

    fS = f_iota.astype(f32) * np.float32(S)
    # ---- alive rows ----
    alive_rows = jnp.stack([
        inc_from, ratio, phase_start, c_loc, volb_start, alpha,
        fS - press,
        jnp.maximum(fS - np.float32(FAR), -np.float32(FAR))
        * jnp.ones_like(press),
        jnp.full((F, k), sus, f32),
        A_n, jnp.full((F, k), hold_eff, f32), D_n,
        jnp.full((F, k), sus, f32), R_n, gl_n, gr_n,
    ], axis=-1)  # (F, k, 16)
    n_alive = jnp.sum(alive.astype(jnp.int32), axis=-1)
    a_rank = jnp.cumsum(alive.astype(jnp.int32), axis=-1) - 1
    a_tgt = jnp.where(alive, a_rank, P)

    def slot_scatter(tgt, rows, mask):
        """rows (F,k,16) -> (F,P,16) at per-frame slot `tgt` (one-hot MXU)."""
        oh = ((tgt[..., None] == jnp.arange(P, dtype=tgt.dtype)[None, None, :])
              & mask[..., None]).astype(f32)
        vals = jnp.where(mask[..., None] & jnp.isfinite(rows), rows, 0.0)
        contrib = jnp.einsum("fkp,fkc->fpc", oh, vals, precision=prec)
        return contrib, jnp.sum(oh, axis=1)

    defaults = jnp.asarray([1e-6, 0.0, 0.0, 0.0, 0.0, 0.0, -1e9, 0.0, 0.0,
                            1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0], f32)

    # ---- tail rows (release after the chain ends) ----
    cont_prev = lane_scatter(match_prev, mf) > 0.5
    has_succ = jnp.concatenate(
        [cont_prev[1:], jnp.zeros((1, k), jnp.bool_)], axis=0)
    end = alive & ~has_succ
    nxt_data = jnp.concatenate(
        [is_data[1:], jnp.zeros((1,), jnp.bool_)])[:, None]
    has_off = end & nxt_data
    rel = jnp.where(has_off, (f_iota.astype(f32) + 1.0) * np.float32(S),
                    np.float32(FAR))
    tp_r = rel - 1.0 - press
    va = jnp.clip((tp_r + 1.0) / A_n, 0.0, 1.0)
    vd = 1.0 + (sus - 1.0) * jnp.clip((tp_r - A_n - hold_eff + 1.0)
                                      / jnp.maximum(D_n, 1.0), 0.0, 1.0)
    top_now = jnp.where(tp_r < A_n, va,
                        jnp.where(tp_r < A_n + hold_eff, 1.0,
                                  jnp.where((D_n > 0)
                                            & (tp_r < A_n + hold_eff + D_n),
                                            vd, sus)))
    top_tail = jnp.where(has_off, top_now, sus).astype(f32)
    f1 = jnp.where(
        has_off,
        jnp.minimum(np.int32(total_frames),
                    f_iota + 1 + jnp.ceil(R_n / np.float32(S)).astype(jnp.int32)
                    + 1),
        jnp.where(end, np.int32(total_frames), 0))
    t_need = jnp.where(end, f1 - (f_iota + 1), 0)
    viol |= jnp.any(t_need > t_max)

    # END lanes (where a tail starts) are sparse — typically a handful per
    # frame out of k lanes. Pre-compact them to E lanes per frame with a
    # small one-hot scatter BEFORE fanning out over t offsets: the final
    # (F, t_max*E, P) slot contraction then does ~k/E times less work than
    # the un-compacted (F, t_max*k, P) one (measured ~1.5 ms on the bench
    # shapes on a v5e, where k=72 post-harmonize padding and t_max=16).
    # More than E simultaneous note-ends in one frame trips the violation
    # predicate and falls back to the exact scan path, like the other caps.
    E = min(k, tail_E)
    n_end = jnp.sum(end.astype(jnp.int32), axis=-1)
    viol |= jnp.any(n_end > E)
    e_rank = jnp.cumsum(end.astype(jnp.int32), axis=-1) - 1
    e_tgt = jnp.where(end, e_rank, E)
    end_src = jnp.stack([
        inc_to, jnp.mod(phase_start + dphi_m, 2.0), q_loc, c_loc,
        volb_start, alpha, press, rel, top_tail, A_n, D_n, R_n, gl_n, gr_n,
        t_need.astype(f32), jnp.ones((F, k), f32),
    ], axis=-1)  # (F, k, 16) per-end-lane tail sources + is_end marker
    oh_e = ((e_tgt[..., None] == jnp.arange(E, dtype=e_tgt.dtype)
             [None, None, :]) & end[..., None]).astype(f32)
    end_c = jnp.einsum(
        "fke,fkc->fec", oh_e,
        jnp.where(end[..., None] & jnp.isfinite(end_src), end_src, 0.0),
        precision=prec)  # (F, E, 16) compacted end lanes
    ch = lambda i: end_c[..., i]

    # Tail rows for ALL t offsets at once: stack the t shifted views of each
    # compacted end-lane array (one concat per source), then compute every
    # row field as a single batched (t_max, F, E) op — a per-t python loop
    # would emit ~18 small ops per offset.
    def shifted_stack(a, fill):
        ap = jnp.concatenate(
            [jnp.full((t_max,) + a.shape[1:], fill, a.dtype), a[:F - 1]],
            axis=0)
        return jnp.stack([ap[t_max - 1 - t: t_max - 1 - t + F]
                          for t in range(t_max)], axis=0)  # (t_max, F, E)

    t_iota = jnp.arange(t_max, dtype=f32)[:, None, None]
    # mask: t < t_need of the END lane, shifted to frame f_end + 1 + t
    m_all = (shifted_stack(ch(15), 0.0) > 0.5) & (
        t_iota < shifted_stack(ch(14), 0.0))
    inc_e = shifted_stack(ch(0), 0.0)
    step_m = jnp.mod(np.float32(S) * inc_e, 2.0)
    # t * (S*inc mod 2) mod 2 == t*S*inc mod 2 for integer t, and keeps
    # every operand small enough for f32
    phase_g = jnp.mod(shifted_stack(ch(1), 0.0) + t_iota * step_m, 2.0)
    q_e = shifted_stack(ch(2), 0.0)
    qp = jnp.power(q_e, t_iota + 1.0)
    c_e = shifted_stack(ch(3), 0.0)
    volb_g = qp * shifted_stack(ch(4), 0.0) + (1.0 - qp) * c_e
    gS = fS[:, :1][None]  # (1, F, 1) frame g sample offset
    zeros_tfe = jnp.zeros((t_max, F, E), f32)
    rows_all = jnp.stack([
        inc_e, zeros_tfe, phase_g.astype(f32), c_e, volb_g.astype(f32),
        shifted_stack(ch(5), 0.0),
        jnp.broadcast_to(gS, (t_max, F, E)) - shifted_stack(ch(6), 0.0),
        jnp.maximum(gS - shifted_stack(ch(7), np.float32(FAR)),
                    -np.float32(FAR)),
        shifted_stack(ch(8), 0.0), shifted_stack(ch(9), 0.0),
        jnp.full((t_max, F, E), hold_eff, f32), shifted_stack(ch(10), 0.0),
        jnp.full((t_max, F, E), sus, f32), shifted_stack(ch(11), 0.0),
        shifted_stack(ch(12), 0.0), shifted_stack(ch(13), 0.0),
    ], axis=-1)  # (t_max, F, E, 16)
    tm = jnp.moveaxis(m_all, 0, 1).reshape(F, t_max * E)
    t_rank = jnp.cumsum(tm.astype(jnp.int32), axis=-1) - 1 + n_alive[:, None]
    viol |= jnp.any(n_alive + jnp.sum(tm.astype(jnp.int32), axis=-1) > P)
    # ONE (F, k + t_max*E, P) one-hot contraction places the alive rows AND
    # every tail offset at once: per-offset (F, k, P) scatters are
    # (128x64)x(128x16) batched matmuls — far below MXU granularity — and
    # alive + tail ranks are gapless so they share the contraction
    rows_flat = jnp.moveaxis(rows_all, 0, 1).reshape(F, t_max * E, _NF)
    comb_tgt = jnp.concatenate([a_tgt.astype(jnp.int32),
                                jnp.where(tm, t_rank, P)], axis=1)
    comb_rows = jnp.concatenate([alive_rows, rows_flat], axis=1)
    comb_mask = jnp.concatenate([alive, tm], axis=1)
    contrib, cover = slot_scatter(comb_tgt, comb_rows, comb_mask)
    table = contrib + defaults[None, None, :] * (1.0 - cover)[..., None]
    return table, viol


def default_autotune_arrays(dtype=jnp.float32):
    """Dummy autotune table arrays for autotune_kind='off'."""
    return (jnp.zeros((), dtype), jnp.zeros((8,), dtype),
            jnp.zeros((7,), dtype), jnp.zeros((0,), dtype))


def _prep_lanes(freq, mag_db, loud_pitches, loud_spl, at_args, kw):
    """Lane padding + frame-local pipeline + tail-frame padding."""
    F, k = freq.shape
    if k % 8:  # tracker lanes work in blocks of 8
        padk = 8 - k % 8
        freq = jnp.pad(freq, ((0, 0), (0, padk)))
        mag_db = jnp.pad(mag_db, ((0, 0), (0, padk)),
                         constant_values=-jnp.inf)
        k += padk
    if at_args is None:
        at_args = default_autotune_arrays(freq.dtype)
    tpitch, volume, loud_order = _frame_local(
        freq, mag_db, loud_pitches, loud_spl, *at_args,
        d=kw["nearby_distance"],
        min_volume=kw["min_volume"], pitch_method=kw["pitch_method"],
        volume_method=kw["volume_method"], shift_pre=kw["shift_pre"],
        shift_post=kw["shift_post"], analysis_volume=kw["analysis_volume"],
        harmonize_pre=kw.get("harmonize_pre", 0.0),
        harmonize_post=kw.get("harmonize_post", 0.0),
        autotune_kind=kw.get("autotune_kind", "off"),
        autotune_max_pitch=kw.get("autotune_max_pitch", 150.0),
        autotune_tolerance=kw.get("autotune_tolerance", 100.0),
        harmonize_semantics=kw.get("harmonize_semantics", "merged"))
    k = tpitch.shape[-1]  # harmonize stages double the lane count
    # extend through the render tail (no analysis data there: no events,
    # recurrences keep running — matches the host packer's f1 windows)
    pad = kw["total_frames"] - F
    if pad > 0:
        tpitch = jnp.pad(tpitch, ((0, pad), (0, 0)), constant_values=jnp.inf)
        volume = jnp.pad(volume, ((0, pad), (0, 0)))
        loud_order = jnp.pad(loud_order, ((0, pad), (0, 0)))
    is_data = jnp.arange(kw["total_frames"]) < F
    return tpitch, volume, loud_order, is_data, k


def _parallel_tables(tpitch, volume, loud_order, is_data, pan_draws,
                     phase_draws, kw, k, n_data_frames):
    """(table, violation) via the frame-parallel tracker."""
    sr_f = float(kw["sample_rate"])
    min_dt = sr_f / 1000.0
    release_eff = max(float(kw["release"]), min_dt, 1.0)
    # release length R is floored at 2.5 periods of the note; the lowest
    # peak an STFT can produce is ~bin 1 (a few Hz), so budget tails for
    # a 2 Hz ghost note, capped at 32 frames (longer tails: rare configs,
    # exact fallback via the violation predicate)
    min_change_floor = 2.5 * sr_f / 2.0
    total_frames = kw["total_frames"]
    t_max = int(min(total_frames, 32,
                    np.ceil(max(release_eff, min_change_floor)
                            / float(kw["stride"])) + 2))
    t_max = max(t_max, min(total_frames - n_data_frames, 32), 1)
    wdt = tpitch.dtype
    return _build_tables_parallel(
        tpitch, volume.astype(wdt), loud_order, is_data,
        jnp.asarray(pan_draws, wdt),
        jnp.asarray(phase_draws, wdt),
        S=float(kw["stride"]), sr=sr_f, maxd=float(kw["max_track_pitches"]),
        max_voices=int(kw["max_voices"]), P=kw["n_slots"], Q=128,
        attack=float(kw["attack"]), hold=float(kw["hold"]),
        decay=float(kw["decay"]), sustain=float(kw["sustain"]),
        release=float(kw["release"]),
        stereo_spread=float(kw["stereo_spread"]),
        total_frames=int(total_frames), t_max=t_max,
        stable_draws=kw.get("draw_indexing", "sequential") == "stable")


def _scan_tables(tpitch, volume, loud_order, is_data, pan_draws,
                 phase_draws, kw, k):
    """(table, dropped) via the sequential scan tracker."""
    P = kw["n_slots"]
    Q = 128
    total_frames = kw["total_frames"]
    statics = (float(kw["stride"]), float(kw["sample_rate"]),
               float(kw["max_track_pitches"]), int(kw["max_voices"]),
               float(kw["attack"]), float(kw["hold"]), float(kw["decay"]),
               float(kw["sustain"]), float(kw["release"]),
               float(kw["stereo_spread"]), int(total_frames),
               jnp.asarray(pan_draws, tpitch.dtype),
               jnp.asarray(phase_draws, tpitch.dtype),
               kw.get("draw_indexing", "sequential") == "stable")
    carry0 = _scan_carry0(P, Q, tpitch.dtype)
    step = functools.partial(_track_step, k=k, P=P, Q=Q, statics=statics)
    xs = (tpitch, volume, loud_order,
          jnp.arange(total_frames, dtype=jnp.int32), is_data)
    carry, table = jax.lax.scan(step, carry0, xs, unroll=_SCAN_UNROLL)
    return table, carry[-1]


def build_tables_device_batch(freq, mag_db, loud_pitches, loud_spl,
                              pan_draws, phase_draws, **kw):
    """Batched-serving variant: freq/mag are (B, F, k); returns
    ((B, total_frames, n_slots, 16), (B,) dropped).

    The frame-parallel tracker vmaps over jobs; the violation cond is
    hoisted ABOVE the vmap (any job violating sends the whole batch down the
    vmapped scan — under vmap a cond would execute both branches for every
    job). min_volume <= 0 routes the whole batch down the scan path (the
    parallel tracker's played-set identity needs min_volume > 0).
    """
    B, F, _ = freq.shape
    n_data = F
    autotune_arrays = kw.pop("autotune_arrays", None)

    def prep_one(fr, mg):
        return _prep_lanes(fr, mg, loud_pitches, loud_spl, autotune_arrays,
                           kw)[:4]

    tpitch, volume, loud_order, is_data = jax.vmap(prep_one)(freq, mag_db)
    k = tpitch.shape[-1]
    is_data0 = is_data[0]

    def scan_all(_):
        return jax.vmap(
            lambda tp, vo, lo: _scan_tables(tp, vo, lo, is_data0, pan_draws,
                                            phase_draws, kw, k)
        )(tpitch, volume, loud_order)

    if kw["min_volume"] <= 0:
        return scan_all(None)

    def par_one(tp, vo, lo):
        return _parallel_tables(tp, vo, lo, is_data0, pan_draws,
                                phase_draws, kw, k, n_data)

    tables, viols = jax.vmap(par_one)(tpitch, volume, loud_order)

    return jax.lax.cond(
        jnp.any(viols), scan_all,
        lambda _: (tables, jnp.zeros((B,), jnp.int32)), None)


def _scan_carry0(P, Q, pitch_dtype):
    wdt = pitch_dtype  # float carries follow the peaks' working dtype
    st = (jnp.zeros((P,), jnp.int32),                    # state
          jnp.zeros((P,), jnp.int32),                    # f1
          jnp.zeros((P,), wdt),                          # press
          jnp.full((P,), FAR, wdt),                      # release
          jnp.ones((P,), wdt),                           # top
          jnp.ones((P,), wdt),                           # A
          jnp.zeros((P,), wdt),                          # H
          jnp.zeros((P,), wdt),                          # D
          jnp.ones((P,), wdt),                           # R
          jnp.zeros((P,), wdt),                          # gl
          jnp.zeros((P,), wdt),                          # gr
          jnp.zeros((P,), wdt),                          # phase
          jnp.zeros((P,), wdt),                          # volb
          jnp.zeros((P,), wdt),                          # previnc
          jnp.zeros((P,), wdt),                          # curinc
          jnp.zeros((P,), wdt))                          # curvol
    return (jnp.full((Q,), jnp.inf, pitch_dtype),
            jnp.full((Q,), -1, jnp.int32),
            st, jnp.int32(0), jnp.int32(0), jnp.int32(0))


def build_tables_device(freq, mag_db, loud_pitches, loud_spl, pan_draws,
                        phase_draws, *, total_frames: int, stride: int,
                        sample_rate: float, max_voices: int, n_slots: int,
                        nearby_distance: float, min_volume: float,
                        max_track_pitches: float, pitch_method: int,
                        volume_method: int, analysis_volume: float,
                        shift_pre: float, shift_post: float,
                        stereo_spread: float, attack: float, hold: float,
                        decay: float, sustain: float, release: float,
                        harmonize_pre: float = 0.0, harmonize_post: float = 0.0,
                        autotune_kind: str = "off",
                        autotune_max_pitch: float = 150.0,
                        autotune_tolerance: float = 100.0,
                        autotune_arrays=None,
                        harmonize_semantics: str = "merged",
                        draw_indexing: str = "sequential",
                        _force_scan: bool = False):
    """(F, k) device peak arrays -> ((total_frames, n_slots, 16) table,
    dropped-NoteOn count), entirely on device (jit-traceable).

    autotune_kind: 'off' | 'scale' | 'allowed' with autotune_arrays =
    (root_pitch (), scale (8,), equidistant (7,), allowed (A,)) — see
    chain.autotune_device_config / analysis.autotune.autotune_tables."""
    F = freq.shape[0]
    if max_voices > 127:
        raise ValueError("device tracker supports max_voices <= 127")
    kw = dict(
        total_frames=total_frames, stride=stride, sample_rate=sample_rate,
        max_voices=max_voices, n_slots=n_slots,
        nearby_distance=nearby_distance, min_volume=min_volume,
        max_track_pitches=max_track_pitches, pitch_method=pitch_method,
        volume_method=volume_method, analysis_volume=analysis_volume,
        shift_pre=shift_pre, shift_post=shift_post,
        stereo_spread=stereo_spread, attack=attack, hold=hold, decay=decay,
        sustain=sustain, release=release,
        harmonize_pre=harmonize_pre, harmonize_post=harmonize_post,
        autotune_kind=autotune_kind, autotune_max_pitch=autotune_max_pitch,
        autotune_tolerance=autotune_tolerance,
        harmonize_semantics=harmonize_semantics,
        draw_indexing=draw_indexing)
    tpitch, volume, loud_order, is_data, k = _prep_lanes(
        freq, mag_db, loud_pitches, loud_spl, autotune_arrays, kw)

    def _scan_path(_):
        return _scan_tables(tpitch, volume, loud_order, is_data, pan_draws,
                            phase_draws, kw, k)

    if min_volume > 0 and not _force_scan:
        # frame-parallel fast path; exact-violation predicate falls back to
        # the scan (lax.cond compiles both, runs one)
        tbl_p, viol = _parallel_tables(tpitch, volume, loud_order, is_data,
                                       pan_draws, phase_draws, kw, k, F)
        return jax.lax.cond(viol, _scan_path,
                            lambda _: (tbl_p, jnp.int32(0)), None)
    return _scan_path(None)


# =========================================================================
# df32 (compensated double-f32) tracker mode
# =========================================================================
# The f32 tracker above is the fast serving path; this section re-runs the
# SAME semantics with every decision quantity and recurrence carried as
# (hi, lo) df32 pairs (ops/df32.py), fed by df32 STFT peaks
# (ops/stft._top_peaks_df). Purpose (measured in tools/fidelity_budget.py):
# the f32 tracker's pitch/threshold comparisons and phase/volume boundary
# recurrences diverge from the host f64 tracker by enough to flip note
# decisions (which shifts the sequential RNG draw counters and decorrelates
# the whole render) and to drift per-voice phases to ~-45 dB. In df32 every
# decision margin is ~1e-11 relative and boundary phases track f64 to
# ~1e-9, putting the rendered audio below the -80 dB budget vs the host f64
# pipeline while staying pure f32 on the VPU.
#
# The emitted control table gains a 17th field (_F_INC_LO): the lo limb of
# the per-row angle increment, consumed by models/resynth_bank._render_slots
# (df-phase render path). Violation fallbacks route to the f32 scan path
# with a zero 17th field (fidelity degrades to f32 there; the benched
# default config never trips it).

from ..ops import df32 as _dfm

_NF_DF = 17
_F_INC_LO = 16


def _dfc(x64: float):
    """f64 scalar -> (hi, lo) np.float32 constants."""
    hi = np.float32(x64)
    return hi, np.float32(np.float64(x64) - np.float64(hi))


def _dfc_arr(x64):
    x64 = np.asarray(x64, np.float64)
    hi = x64.astype(np.float32)
    return jnp.asarray(hi), jnp.asarray((x64 - hi.astype(np.float64)
                                         ).astype(np.float32))


def _df_lt(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] < b[1]))


def _df_le(a, b):
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def _df_where(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))


def _df_zero_like(h):
    return (jnp.zeros_like(h), jnp.zeros_like(h))


def _df_prefix_incl(pair, axis=-1):
    """Inclusive df32 prefix sum along `axis` by shift-doubling (log depth)."""
    hi, lo = pair
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    s = 1
    while s < n:
        zh = jnp.zeros(hi.shape[:-1] + (s,), hi.dtype)
        sh = jnp.concatenate([zh, hi[..., :-s]], axis=-1)
        sl = jnp.concatenate([zh, lo[..., :-s]], axis=-1)
        hi, lo = _dfm.add((hi, lo), (sh, sl))
        s *= 2
    return jnp.moveaxis(hi, -1, axis), jnp.moveaxis(lo, -1, axis)


def _pitch_of_freq_df(freq):
    """69 + 12*log2(f/440) in df32."""
    p = _dfm.mul(_dfm.log2(_dfm.div(freq, (np.float32(440.0), np.float32(0.0)))),
                 (np.float32(12.0), np.float32(0.0)))
    return _dfm.add_f32(p, np.float32(69.0))


def _freq_of_pitch_df(pitch):
    """440 * 2^((p-69)/12) in df32."""
    e = _dfm.div(_dfm.add_f32(pitch, np.float32(-69.0)),
                 (np.float32(12.0), np.float32(0.0)))
    return _dfm.mul_f32(_dfm.exp2(e), np.float32(440.0))


def _df_max_masked(pair, mask, axis):
    """Lexicographic df32 max over `axis` where mask (else -inf)."""
    h = jnp.where(mask, pair[0], -jnp.inf)
    mh = jnp.max(h, axis=axis)
    at = mask & (pair[0] == jnp.expand_dims(mh, axis))
    ml = jnp.max(jnp.where(at, pair[1], -jnp.inf), axis=axis)
    ml = jnp.where(jnp.isfinite(ml), ml, 0.0)
    return mh, ml


def _df_min_masked(pair, mask, axis):
    h = jnp.where(mask, pair[0], jnp.inf)
    mh = jnp.min(h, axis=axis)
    at = mask & (pair[0] == jnp.expand_dims(mh, axis))
    ml = jnp.min(jnp.where(at, pair[1], jnp.inf), axis=axis)
    ml = jnp.where(jnp.isfinite(ml), ml, 0.0)
    return mh, ml


def _harmonize_lanes_df(tp, tv, h: float):
    """df32 _harmonize_lanes: merge decisions on hi (PITCH_EPSILON = 1e-4 is
    10^3 above df32 noise), values carried as pairs."""
    F, k = tp[0].shape
    h_hi, h_lo = _dfc(h)
    valid = jnp.isfinite(tp[0])
    hp = _df_where(valid, _dfm.add(tp, (jnp.full_like(tp[0], h_hi),
                                        jnp.full_like(tp[0], h_lo))),
                   (jnp.full_like(tp[0], jnp.inf), jnp.zeros_like(tp[0])))
    pj = jnp.where(valid, tp[0], FAR)[:, None, :]
    dist = jnp.abs(pj - jnp.where(valid, hp[0], -FAR)[:, :, None])
    mind = jnp.min(dist, axis=-1)
    merge = valid & (mind <= _PITCH_EPSILON)
    is_min = dist <= mind[..., None]
    lane = jnp.arange(k)
    first_j = jnp.min(jnp.where(is_min, lane[None, None, :], k), axis=-1)
    oh = ((first_j[..., None] == lane[None, None, :]) & merge[..., None]
          ).astype(jnp.float32)
    add_hi = jnp.einsum("fij,fi->fj", oh, tv[0],
                        precision=jax.lax.Precision.HIGHEST)
    add_lo = jnp.einsum("fij,fi->fj", oh, tv[1],
                        precision=jax.lax.Precision.HIGHEST)
    merged_v = _dfm.add(tv, (add_hi, add_lo))
    new_v = _df_where(valid & ~merge, tv, _df_zero_like(tv[0]))
    new_p = _df_where(valid & ~merge, hp,
                      (jnp.full_like(tp[0], jnp.inf), jnp.zeros_like(tp[0])))
    cat_p = tuple(jnp.concatenate([a, b], axis=-1)
                  for a, b in zip(tp, new_p))
    cat_v = tuple(jnp.concatenate([a, b], axis=-1)
                  for a, b in zip(merged_v, new_v))
    key = jnp.where(jnp.isfinite(cat_p[0]), cat_p[0], jnp.inf)
    srt = jax.lax.sort((key, cat_p[1], cat_p[0], cat_v[0], cat_v[1]),
                       dimension=-1, num_keys=2)
    return (srt[2], srt[1]), (srt[3], srt[4])


def _harmonize_lanes_reference_df(tp, tv, h: float):
    """df32 `_harmonize_lanes_reference`: the std::lower_bound probe trace +
    merge decisions run on hi components (PITCH_EPSILON = 1e-4 is 10^3
    above df32 noise, same convention as _harmonize_lanes_df); pitch and
    volume values are carried and accumulated as (hi, lo) pairs."""
    F, k = tp[0].shape
    n2 = 2 * k
    h_hi, h_lo = _dfc(h)
    valid = jnp.isfinite(tp[0])
    inf = jnp.full((F, k), jnp.inf, tp[0].dtype)
    zero = jnp.zeros((F, k), tp[0].dtype)
    sz = jnp.sum(valid, axis=-1).astype(jnp.int32)
    ap0 = (jnp.concatenate([jnp.where(valid, tp[0], jnp.inf), inf], -1),
           jnp.concatenate([jnp.where(valid, tp[1], 0.0), zero], -1))
    av0 = (jnp.concatenate([jnp.where(valid, tv[0], 0.0), zero], -1),
           jnp.concatenate([jnp.where(valid, tv[1], 0.0), zero], -1))
    lanes = jnp.arange(n2)
    n_iter = int(np.ceil(np.log2(n2 + 1)))

    def gather(arr, idx):
        return jnp.sum(jnp.where(lanes[None, :] == idx[:, None], arr, 0.0),
                       axis=-1)

    def gather_df(pair, idx):
        return gather(pair[0], idx), gather(pair[1], idx)

    def body(carry, i):
        ap, av, cnt = carry
        active = i < sz
        idx_i = jnp.full((F,), i, jnp.int32)
        pi = gather_df(ap, idx_i)
        hp = _dfm.add(pi, (jnp.full_like(pi[0], h_hi),
                           jnp.full_like(pi[1], h_lo)))
        lo = jnp.zeros((F,), jnp.int32)
        hi = cnt
        for _ in range(n_iter):
            cond = lo < hi
            mid = (lo + hi) // 2
            less = gather(ap[0], mid) < hp[0]
            lo = jnp.where(cond & less, mid + 1, lo)
            hi = jnp.where(cond & ~less, mid, hi)
        at_end = lo >= cnt
        at_beg = lo == 0
        d_lo = jnp.abs(hp[0] - gather(ap[0], jnp.minimum(lo, cnt - 1)))
        d_prev = jnp.abs(hp[0] - gather(ap[0], jnp.maximum(lo - 1, 0)))
        idx = jnp.where(at_end, cnt - 1,
                        jnp.where(at_beg, 0,
                                  jnp.where(d_lo < d_prev, lo, lo - 1)))
        merge = (jnp.abs(gather(ap[0], idx) - hp[0]) <= _PITCH_EPSILON) \
            & active
        append = (~merge) & active
        pvol = gather_df(av, idx_i)
        oh_m = merge[:, None] & (lanes[None, :] == idx[:, None])
        av = _dfm.add(av, (jnp.where(oh_m, pvol[0][:, None], 0.0),
                           jnp.where(oh_m, pvol[1][:, None], 0.0)))
        oh_c = append[:, None] & (lanes[None, :] == cnt[:, None])
        ap = (jnp.where(oh_c, hp[0][:, None], ap[0]),
              jnp.where(oh_c, hp[1][:, None], ap[1]))
        av = (jnp.where(oh_c, pvol[0][:, None], av[0]),
              jnp.where(oh_c, pvol[1][:, None], av[1]))
        cnt = cnt + append.astype(jnp.int32)
        return (ap, av, cnt), None

    (ap, av, _cnt), _ = jax.lax.scan(body, (ap0, av0, sz),
                                     jnp.arange(k, dtype=jnp.int32))
    key = jnp.where(jnp.isfinite(ap[0]), ap[0], jnp.inf)
    srt = jax.lax.sort((key, ap[1], ap[0], av[0], av[1]), dimension=-1,
                       num_keys=2)
    return (srt[2], srt[1]), (srt[3], srt[4])


def _autotune_lanes_df(tp, tv, at_root, at_scale, at_equid, at_allowed, *,
                       kind: str, max_pitch: float, tolerance: float):
    """df32 _autotune_lanes: snap decisions on hi values (grid snapping is
    coarse), snapped OUTPUT pitches carried as df32 built from the df32
    grid tables so downstream matching stays f64-grade.

    at_* arrive as ((hi, lo)) pairs from chain.autotune_device_arrays_df."""
    F, k = tp[0].shape
    valid = jnp.isfinite(tp[0])
    p = _df_where(valid, tp, _df_zero_like(tp[0]))
    if kind == "scale":
        root = (at_root[0], at_root[1])
        od_hi = (p[0] - root[0]) / 12.0
        oct_t = jnp.where(od_hi >= 0, jnp.trunc(od_hi), jnp.trunc(od_hi) - 1.0)
        rel = _dfm.sub(_dfm.sub(p, (oct_t * 12.0, jnp.zeros_like(oct_t))),
                       (jnp.broadcast_to(root[0], p[0].shape),
                        jnp.broadcast_to(root[1], p[0].shape)))
        idx = jnp.sum(rel[0][..., None] >= at_equid[0][None, None, :], axis=-1)
        ns = at_scale[0].shape[0]
        ohs = (idx[..., None] == jnp.arange(ns)[None, None, :]).astype(
            jnp.float32)
        prec = jax.lax.Precision.HIGHEST
        snap = (jnp.einsum("fkj,j->fk", ohs, at_scale[0], precision=prec),
                jnp.einsum("fkj,j->fk", ohs, at_scale[1], precision=prec))
        tpn = _dfm.sub(p, _dfm.sub(rel, snap))
        transform_ok = jnp.ones_like(valid)
    else:
        if at_allowed[0].shape[0] == 0:
            return ((jnp.full_like(tp[0], jnp.inf), jnp.zeros_like(tp[0])),
                    _df_zero_like(tv[0]))
        dist = jnp.abs(p[0][..., None] - at_allowed[0][None, None, :])
        mind = jnp.min(dist, axis=-1)
        is_c = dist <= mind[..., None]
        cand_hi = jnp.where(is_c, at_allowed[0][None, None, :], jnp.inf)
        tp_hi = jnp.min(cand_hi, axis=-1)
        at_c = is_c & (at_allowed[0][None, None, :] == tp_hi[..., None])
        tp_lo = jnp.min(jnp.where(at_c, at_allowed[1][None, None, :],
                                  jnp.inf), axis=-1)
        tpn = (tp_hi, jnp.where(jnp.isfinite(tp_lo), tp_lo, 0.0))
        transform_ok = jnp.ones_like(valid)
    use_tp = (p[0] <= max_pitch) & (tpn[0] <= max_pitch) & transform_ok
    snapped = _df_where(use_tp, tpn, p)
    keep = valid & (jnp.abs(_dfm.sub(snapped, p)[0]) <= tolerance)
    out_p = _df_where(keep, snapped,
                      (jnp.full_like(tp[0], jnp.inf), jnp.zeros_like(tp[0])))
    out_v = _df_where(keep, tv, _df_zero_like(tv[0]))
    srt = jax.lax.sort((out_p[0], out_p[1], out_v[0], out_v[1]),
                       dimension=-1, num_keys=2)
    sp = (srt[0], srt[1])
    sv = (srt[2], srt[3])
    fin = jnp.isfinite(sp[0])
    prev = jnp.concatenate([jnp.full_like(sp[0][:, :1], -jnp.inf),
                            sp[0][:, :-1]], axis=-1)
    boundary = ~fin | (sp[0] - prev >= _PITCH_EPSILON)
    gid = jnp.cumsum(boundary.astype(jnp.int32), axis=-1) - 1
    lane = jnp.arange(sp[0].shape[-1])
    prec = jax.lax.Precision.HIGHEST
    oh_g = ((gid[..., None] == lane[None, None, :]) & fin[..., None]
            ).astype(jnp.float32)
    gv = (jnp.einsum("fjg,fj->fg", oh_g, sv[0], precision=prec),
          jnp.einsum("fjg,fj->fg", oh_g, sv[1], precision=prec))
    in_g = oh_g > 0.5
    gp = _df_min_masked((sp[0][..., None] * jnp.ones_like(oh_g),
                         sp[1][..., None] * jnp.ones_like(oh_g)),
                        in_g[..., :], axis=1)
    ok = jnp.isfinite(gp[0])
    return ((gp[0], jnp.where(ok, gp[1], 0.0)),
            _df_where(ok, gv, _df_zero_like(gv[0])))


def _frame_local_df(freq, mag_db, loud_pitches_df, loud_spl_df, at_args, *,
                    d: float, min_volume: float, pitch_method: int,
                    volume_method: int, shift_pre: float, shift_post: float,
                    analysis_volume: float, harmonize_pre: float = 0.0,
                    harmonize_post: float = 0.0, autotune_kind: str = "off",
                    autotune_max_pitch: float = 150.0,
                    autotune_tolerance: float = 100.0,
                    harmonize_semantics: str = "merged"):
    """df32 `_frame_local`: same stage order, every pitch/volume and every
    comparison carried as (hi, lo) pairs so decisions match the host f64
    pipeline to ~1e-11 relative. freq/mag_db are df32 pairs (F, k).

    Group volume/pitch sums use df32 PREFIX-SUM DIFFERENCES over the sorted
    lanes (groups are contiguous) — the one-hot einsum used by the f32 path
    would round the member sum in f32 accumulate.
    """
    prec = jax.lax.Precision.HIGHEST
    F, k = freq[0].shape
    valid = jnp.isfinite(mag_db[0]) & (freq[0] > 0) & jnp.isfinite(freq[0])
    safe_f = _df_where(valid, freq, (jnp.full_like(freq[0], 1.0),
                                     jnp.zeros_like(freq[0])))
    pitch = _df_where(valid, _pitch_of_freq_df(safe_f),
                      (jnp.full_like(freq[0], jnp.inf),
                       jnp.zeros_like(freq[0])))
    vol = _df_where(valid,
                    _dfm.pow10(_dfm.div(mag_db, (np.float32(20.0),
                                                 np.float32(0.0)))),
                    _df_zero_like(freq[0]))

    # greedy nearby grouping: df32 compare-all jump counts, then the same
    # boolean matrix squaring as the f32 path (graph ops are exact)
    d_hi, d_lo = _dfc(d)
    pd = _dfm.add(pitch, (jnp.full_like(pitch[0], d_hi),
                          jnp.full_like(pitch[0], d_lo)))
    le = _df_le((pitch[0][:, None, :], pitch[1][:, None, :]),
                (pd[0][:, :, None], pd[1][:, :, None]))
    nxt = jnp.sum(le & valid[:, None, :], axis=-1)
    lane = jnp.arange(k)
    J = (nxt[:, :, None] == lane[None, None, :]).astype(jnp.float32)
    reach = jnp.zeros((F, k), jnp.float32).at[:, 0].set(1.0)
    steps = max(1, int(np.ceil(np.log2(k))))
    for _ in range(steps):
        reach = jnp.minimum(reach + jnp.einsum("fj,fjl->fl", reach, J), 1.0)
        J = jnp.minimum(jnp.einsum("fjm,fml->fjl", J, J), 1.0)
    bound = reach > 0.5
    gid = jnp.cumsum(bound.astype(jnp.int32), axis=-1) - 1

    # segment sums by df32 prefix difference (groups are contiguous lanes)
    vz = _df_where(valid, vol, _df_zero_like(vol[0]))
    pz = _df_where(valid, pitch, _df_zero_like(pitch[0]))
    pv = _dfm.mul(pz, vz)
    ps_v = _df_prefix_incl(vz)
    ps_pv = _df_prefix_incl(pv)
    is_last = jnp.concatenate(
        [gid[:, 1:] != gid[:, :-1], jnp.ones((F, 1), bool)], axis=-1)
    oh_last = ((gid[..., None] == lane[None, None, :]) & is_last[..., None]
               ).astype(jnp.float32)

    def seg_from_prefix(ps):
        end = (jnp.einsum("fjg,fj->fg", oh_last, ps[0], precision=prec),
               jnp.einsum("fjg,fj->fg", oh_last, ps[1], precision=prec))
        start = tuple(jnp.concatenate([jnp.zeros((F, 1), jnp.float32),
                                       v[:, :-1]], axis=-1) for v in end)
        return _dfm.sub(end, start)

    sum_vol = seg_from_prefix(ps_v)
    sum_pv = seg_from_prefix(ps_pv)
    count = jnp.einsum(
        "fjg,fj->fg", (gid[..., None] == lane[None, None, :]).astype(
            jnp.float32), valid.astype(jnp.float32), precision=prec)

    in_g = (gid[..., None] == lane[None, None, :])  # (F, j, g)
    big = lambda pair: (pair[0][..., None] + jnp.zeros((1, 1, k), jnp.float32),
                        pair[1][..., None] + jnp.zeros((1, 1, k), jnp.float32))
    max_vol = _df_max_masked(big(vol), in_g & valid[:, :, None], axis=1)
    min_p = _df_min_masked(big(pitch), in_g & valid[:, :, None], axis=1)
    max_p = _df_max_masked(big(pitch), in_g & valid[:, :, None], axis=1)
    # first (lowest-pitch) member attaining the group max volume
    maxv_lane = (jnp.einsum("fjg,fg->fj", in_g.astype(jnp.float32),
                            max_vol[0], precision=prec),
                 jnp.einsum("fjg,fg->fj", in_g.astype(jnp.float32),
                            max_vol[1], precision=prec))
    is_max = ~_df_lt(vol, maxv_lane)
    pitch_at_max = _df_min_masked(
        big(pitch), in_g & (valid & is_max)[:, :, None], axis=1)

    if volume_method == 0:
        gvol = max_vol
    else:
        gvol = sum_vol
    if pitch_method == 0:
        gpitch = _dfm.scale_pow2(_dfm.add(min_p, max_p), np.float32(0.5))
    elif pitch_method == 1:
        gpitch = pitch_at_max
    else:
        denom = _df_where(sum_vol[0] > 1e-30, sum_vol,
                          (jnp.full_like(sum_vol[0], 1e-30),
                           jnp.zeros_like(sum_vol[0])))
        gpitch = _dfm.div(sum_pv, denom)
    mv_hi, mv_lo = _dfc(min_volume)
    keep = (~_df_lt(gvol, (jnp.full_like(gvol[0], mv_hi),
                           jnp.full_like(gvol[0], mv_lo)))) & (count > 0)

    sp_hi, sp_lo = _dfc(shift_pre)
    keyp = _dfm.add(gpitch, (jnp.full_like(gpitch[0], sp_hi),
                             jnp.full_like(gpitch[0], sp_lo)))
    key = _df_where(keep, keyp, (jnp.full_like(gpitch[0], jnp.inf),
                                 jnp.zeros_like(gpitch[0])))
    gv = _df_where(keep, gvol, _df_zero_like(gvol[0]))
    srt = jax.lax.sort((key[0], key[1], gv[0], gv[1]), dimension=-1,
                       num_keys=2)
    tpitch = (srt[0], jnp.where(jnp.isfinite(srt[0]), srt[1], 0.0))
    tvol = (srt[2], srt[3])

    hfn_df = (_harmonize_lanes_reference_df
              if harmonize_semantics == "reference" else _harmonize_lanes_df)
    if harmonize_pre:
        tpitch, tvol = hfn_df(tpitch, tvol, harmonize_pre)
    if autotune_kind != "off":
        tpitch, tvol = _autotune_lanes_df(
            tpitch, tvol, *at_args, kind=autotune_kind,
            max_pitch=autotune_max_pitch, tolerance=autotune_tolerance)
    if shift_post:
        s2h, s2l = _dfc(shift_post)
        shifted = _dfm.add(tpitch, (jnp.full_like(tpitch[0], s2h),
                                    jnp.full_like(tpitch[0], s2l)))
        tpitch = _df_where(jnp.isfinite(tpitch[0]), shifted, tpitch)
    if harmonize_post:
        tpitch, tvol = hfn_df(tpitch, tvol, harmonize_post)

    kk = tpitch[0].shape[-1]
    # perceived-loudness weights in df32 (ISO table interp); order by
    # (w_hi, w_lo) lexicographic descending, stable
    lp, ls = loud_pitches_df, loud_spl_df
    nlp = lp[0].shape[0]
    x = _df_where(jnp.isfinite(tpitch[0]), tpitch,
                  (jnp.broadcast_to(lp[0][-1], tpitch[0].shape),
                   jnp.broadcast_to(lp[1][-1], tpitch[0].shape)))
    lo_b = (jnp.broadcast_to(lp[0][0], x[0].shape),
            jnp.broadcast_to(lp[1][0], x[0].shape))
    hi_b = (jnp.broadcast_to(lp[0][-1], x[0].shape),
            jnp.broadcast_to(lp[1][-1], x[0].shape))
    x = _df_where(_df_lt(x, lo_b), lo_b, x)
    x = _df_where(_df_lt(hi_b, x), hi_b, x)
    ge = ~_df_lt((x[0][..., None], x[1][..., None]),
                 (lp[0][None, None, :], lp[1][None, None, :]))
    seg = jnp.clip(jnp.sum(ge, axis=-1) - 1, 0, nlp - 2)
    oh_s = (seg[..., None] == jnp.arange(nlp - 1)[None, None, :]).astype(
        jnp.float32)
    pick = lambda tab, sl: (
        jnp.einsum("fks,s->fk", oh_s, tab[0][sl], precision=prec),
        jnp.einsum("fks,s->fk", oh_s, tab[1][sl], precision=prec))
    x0 = pick(lp, slice(None, -1))
    x1 = pick(lp, slice(1, None))
    y0 = pick(ls, slice(None, -1))
    y1 = pick(ls, slice(1, None))
    dx = _dfm.sub(x1, x0)
    tfr = _df_where(dx[0] > 0,
                    _dfm.div(_dfm.sub(x, x0),
                             _df_where(dx[0] > 0, dx,
                                       (jnp.ones_like(dx[0]),
                                        jnp.zeros_like(dx[0])))),
                    _df_zero_like(dx[0]))
    spl = _dfm.add(y0, _dfm.mul(tfr, _dfm.sub(y1, y0)))
    w = _dfm.div(tvol, _df_where(spl[0] != 0, spl,
                                 (jnp.ones_like(spl[0]),
                                  jnp.zeros_like(spl[0]))))
    iota = jnp.broadcast_to(jnp.arange(kk, dtype=jnp.int32)[None, :],
                            (F, kk))
    osrt = jax.lax.sort((-w[0], -w[1], iota), dimension=-1, num_keys=2)
    loud_order = osrt[2]
    av_hi, av_lo = _dfc(analysis_volume)
    volume = _dfm.mul(tvol, (jnp.full_like(tvol[0], av_hi),
                             jnp.full_like(tvol[0], av_lo)))
    return tpitch, volume, loud_order


def _match_parallel_df(tp, tvalid, maxd: float, Q: int):
    """df32 `_match_parallel`: the lb/ub windows come from df32 compares, so
    boundary ties match the host f64 tracker's decisions."""
    F, k = tp[0].shape
    md_hi, md_lo = _dfc(maxd)
    prev = tuple(jnp.concatenate(
        [jnp.full((1, k), jnp.inf if i == 0 else 0.0, jnp.float32), v[:-1]],
        axis=0) for i, v in enumerate(tp))
    lowd = _dfm.add(tp, (jnp.full_like(tp[0], -md_hi),
                         jnp.full_like(tp[0], -md_lo)))
    highd = _dfm.add(tp, (jnp.full_like(tp[0], md_hi),
                          jnp.full_like(tp[0], md_lo)))
    pj = (prev[0][:, None, :], prev[1][:, None, :])
    lb = jnp.sum(_df_lt(pj, (lowd[0][:, :, None], lowd[1][:, :, None])),
                 axis=-1).astype(jnp.int32)
    ub = jnp.sum(_df_le(pj, (highd[0][:, :, None], highd[1][:, :, None])),
                 axis=-1).astype(jnp.int32)
    ub = jnp.where(tvalid, ub, -1)
    B = 8
    nb = k // B
    lb2 = lb.reshape(F, nb, B)
    ub2 = ub.reshape(F, nb, B)
    v = jnp.broadcast_to(jnp.arange(Q + 1, dtype=jnp.int32), (F, nb, Q + 1))
    for i in range(B):
        c = jnp.maximum(v, lb2[:, :, i:i + 1])
        v = c + (c < ub2[:, :, i:i + 1]).astype(jnp.int32)
    qgrid = jnp.arange(Q + 1, dtype=jnp.int32)
    x = jnp.zeros((F,), jnp.int32)
    xs_in = []
    for b in range(nb):
        xs_in.append(x)
        oh_x = (jnp.clip(x, 0, Q)[:, None] == qgrid[None, :]).astype(
            jnp.float32)
        x = jnp.round(jnp.einsum("fq,fq->f", oh_x,
                                 v[:, b, :].astype(jnp.float32))
                      ).astype(jnp.int32)
    vv = jnp.stack(xs_in, axis=1)
    cs_cols, m_cols = [], []
    for i in range(B):
        c = jnp.maximum(vv, lb2[:, :, i])
        m = c < ub2[:, :, i]
        cs_cols.append(c)
        m_cols.append(m)
        vv = c + m.astype(jnp.int32)
    cs = jnp.stack(cs_cols, axis=-1).reshape(F, k)
    matched = jnp.stack(m_cols, axis=-1).reshape(F, k)
    return matched, jnp.where(matched, cs, 0)


def _build_tables_parallel_df(tp, vol, loud_order, is_data, pan_draws,
                              phase_draws, *, S, sr, maxd, max_voices, P, Q,
                              attack, hold, decay, sustain, release,
                              stereo_spread, total_frames, t_max, tail_E=16,
                              stable_draws: bool = False):
    """df32 frame-parallel tracker: `_build_tables_parallel` with every
    frequency increment, boundary phase, and volume-filter recurrence
    carried as (hi, lo) pairs. Emits a (total_frames, P, 17) table — field
    16 (_F_INC_LO) is the lo limb of the row's angle increment, consumed by
    the df-phase render path (models/resynth_bank._render_slots)."""
    F, k = tp[0].shape
    f32 = jnp.float32
    cst = lambda x: np.asarray(x, f32)
    prec = jax.lax.Precision.HIGHEST
    min_dt = sr / 1000.0
    has_decay = sustain < 0.999999
    sus = min(max(sustain, 0.0), 1.0) if has_decay else 1.0
    atk_p = _dfc(max(attack, min_dt, 1.0))
    dcy_p = _dfc(max(decay, min_dt, 1.0))
    rel_p = _dfc(max(release, min_dt, 1.0))
    hold_eff = cst(max(hold, 0.0))
    S_f = np.float32(S)
    PI = _dfc(np.pi)

    tvalid = jnp.isfinite(tp[0]) & is_data[:, None]
    n_valid = jnp.sum(tvalid.astype(jnp.int32), axis=-1)
    viol = jnp.any(n_valid > max_voices)
    viol |= jnp.any(tvalid & ~(vol[0] > 0))

    matched, match_prev = _match_parallel_df(tp, tvalid, maxd, Q)
    alive = tvalid
    f_iota = jnp.arange(F, dtype=jnp.int32)[:, None]
    lane_iota = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :],
                                 (F, k))

    def lane_take(idx_f32, stack):
        oh = (idx_f32[..., None]
              == jnp.arange(k, dtype=f32)[None, None, :]).astype(f32)
        return jnp.einsum("fij,fjc->fic", oh, stack, precision=prec)

    def lane_scatter(idx, vals):
        oh = (idx[..., None]
              == jnp.arange(k, dtype=idx.dtype)[None, None, :]).astype(f32)
        return jnp.einsum("fji,fj->fi", oh, vals.astype(f32), precision=prec)

    fin = lambda a: jnp.where(jnp.isfinite(a), a, 0.0).astype(f32)
    fin2 = lambda p: (fin(p[0]), fin(p[1]))

    # per-lane df32 values
    safe_tp = _df_where(jnp.isfinite(tp[0]), tp,
                        (jnp.full_like(tp[0], 100.0),
                         jnp.zeros_like(tp[0])))
    freq = _freq_of_pitch_df(safe_tp)
    inc_to = _dfm.div(_dfm.scale_pow2(freq, np.float32(2.0)),
                      (np.float32(sr), np.float32(0.0)))
    prev_inc = tuple(jnp.concatenate([v[:1], v[:-1]], axis=0)
                     for v in inc_to)
    pi_stack = jnp.stack([fin(prev_inc[0]), fin(prev_inc[1])], axis=-1)
    got_pi = lane_take(match_prev.astype(f32), pi_stack)
    inc_from = _df_where(matched, (got_pi[..., 0], got_pi[..., 1]), inc_to)
    same = (inc_to[0] == inc_from[0]) & (inc_to[1] == inc_from[1])
    guard = lambda p: _df_where(p[0] > 1e-30, p,
                                (jnp.full_like(p[0], 1e-30),
                                 jnp.zeros_like(p[0])))
    ratio = _df_where(same, _df_zero_like(tp[0]),
                      _dfm.log(_dfm.div(guard(inc_to), guard(inc_from))))
    # alpha / q / b in df32: m = min(2/S, |inc|); q = exp(-pi*m*S) written
    # directly (the host's (1-alpha)^S equals it to ~1e-13)
    two_S = _dfc(2.0 / S)
    m_inc = _df_where(_df_lt(_dfm.abs_df(inc_to),
                             (jnp.full_like(tp[0], two_S[0]),
                              jnp.full_like(tp[0], two_S[1]))),
                      _dfm.abs_df(inc_to),
                      (jnp.full_like(tp[0], two_S[0]),
                       jnp.full_like(tp[0], two_S[1])))
    pim = _dfm.mul(m_inc, (jnp.full_like(tp[0], PI[0]),
                           jnp.full_like(tp[0], PI[1])))
    alpha = _dfm.neg(_dfm.expm1(_dfm.neg(pim)))
    lq = _dfm.mul_f32(_dfm.neg(pim), S_f)       # log(q)
    q_loc = _dfm.exp(lq)
    c_loc = vol
    b_loc = _dfm.mul(_dfm.neg(_dfm.expm1(lq)), c_loc)   # (1-q)*c
    # dphi = inc_from*S*(1 + ratio*h(ratio)), h = (expm1(r)/r - 1)/r series
    rh = ratio[0]
    h32 = (0.5 + rh * (1.0 / 6.0 + rh * (1.0 / 24.0 + rh * (
        1.0 / 120.0 + rh * (1.0 / 720.0 + rh * (1.0 / 5040.0 + rh * (
            1.0 / 40320.0 + rh * (1.0 / 362880.0 + rh / 3628800.0))))))))
    g_pair = _dfm.mul_f32(ratio, h32.astype(f32))
    incS = _dfm.mul_f32(inc_from, S_f)
    dphi = _df_where(same, incS,
                     _dfm.mul(incS, _dfm.add_f32(g_pair, np.float32(1.0))))
    dphi_m = _dfm.mod2(dphi)

    # birth-lane values
    abs_inc = _dfm.abs_df(inc_to)
    abs_inc = _df_where(abs_inc[0] > 1e-9, abs_inc,
                        (jnp.full_like(tp[0], 1e-9), jnp.zeros_like(tp[0])))
    min_change = _dfm.floor(_dfm.add_f32(
        _dfm.div((jnp.full_like(tp[0], 5.0), jnp.zeros_like(tp[0])),
                 abs_inc), np.float32(0.5)))
    bA = lambda base: _dfm.max_df(
        _dfm.max_df((jnp.full_like(tp[0], base[0]),
                     jnp.full_like(tp[0], base[1])), min_change),
        (jnp.ones_like(tp[0]), jnp.zeros_like(tp[0])))
    A_b = bA(atk_p)
    D_b = bA(dcy_p) if has_decay else _df_zero_like(tp[0])
    R_b = bA(rel_p)
    on_mask = tvalid & ~matched & (vol[0] > 0)
    on_l = lane_take(loud_order.astype(f32),
                     on_mask.astype(f32)[..., None])[..., 0] > 0.5
    r_l = jnp.cumsum(on_l.astype(jnp.int32), axis=-1) - 1
    rank_p = jnp.round(lane_scatter(loud_order, r_l.astype(f32))
                       ).astype(jnp.int32)
    n_ons = jnp.sum(on_l.astype(jnp.int32), axis=-1)
    if stable_draws:
        # position-keyed: frame * max_voices + on-rank (see _track_step)
        base = jnp.arange(tp[0].shape[0], dtype=jnp.int32) \
            * np.int32(max_voices)
    else:
        base = jnp.cumsum(n_ons) - n_ons
    draw_idx = base[:, None] + rank_p
    pools = jnp.stack([pan_draws[:phase_draws.shape[0]],
                       phase_draws[:pan_draws.shape[0]]], axis=-1)
    got_draws = pools[jnp.clip(draw_idx, 0, pools.shape[0] - 1)]
    pan = cst(stereo_spread) * got_draws[..., 0]
    th = cst(0.25 * np.pi) * (pan + 1.0)
    gl_b = jnp.cos(th).astype(f32)
    gr_b = jnp.sin(th).astype(f32)
    ph0_b = got_draws[..., 1]
    vol_b = vol

    def roll_down(a, n, pad_block):
        return jnp.concatenate([pad_block, a[:F - n]], axis=0)

    # chains: pointer doubling with df32 carried phase sum + affine volume
    prev_stack = jnp.stack([fin(dphi_m[0]), fin(dphi_m[1]),
                            fin(q_loc[0]), fin(q_loc[1]),
                            fin(b_loc[0]), fin(b_loc[1])], axis=-1)
    prev_stack = jnp.concatenate([jnp.zeros((1, k, 6), f32),
                                  prev_stack[:-1]], axis=0)
    got = lane_take(match_prev.astype(f32), prev_stack)
    mf = matched.astype(f32)
    # channels: 0 done, 1 lane, 2 off, 3-4 sumd, 5-6 Ac, 7-8 Bc,
    # 9..16 payload [ph0, vol_hi, vol_lo, A, D, R, gl, gr]
    st = jnp.stack([
        1.0 - mf,
        jnp.where(matched, match_prev, lane_iota).astype(f32),
        mf,
        mf * got[..., 0], mf * got[..., 1],
        jnp.where(matched, got[..., 2], 1.0),
        jnp.where(matched, got[..., 3], 0.0),
        mf * got[..., 4], mf * got[..., 5],
        fin(ph0_b), fin(vol_b[0]), fin(vol_b[1]),
        fin(A_b[0]), fin(D_b[0]), fin(R_b[0]),
        fin(gl_b), fin(gr_b),
    ], axis=-1)  # (F, k, 17)
    identity_pad = jnp.concatenate([
        jnp.ones((1, k, 1), f32),
        jnp.arange(k, dtype=f32)[None, :, None],
        jnp.zeros((1, k, 3), f32),                 # off, sumd pair
        jnp.ones((1, k, 1), f32),                  # Ac hi
        jnp.zeros((1, k, 11), f32),                # Ac lo, Bc pair, payload
    ], axis=-1)
    step_len = 1
    while step_len < F:
        pad = jnp.broadcast_to(identity_pad,
                               (min(step_len, F), k, st.shape[-1]))
        rolled = roll_down(st, min(step_len, F), pad)
        anc = lane_take(st[..., 1], rolled)
        done = st[..., 0:1] > 0.5
        lane_n = anc[..., 1]
        off_n = st[..., 2] + anc[..., 2]
        sum_n = _dfm.mod2(_dfm.add((st[..., 3], st[..., 4]),
                                   (anc[..., 3], anc[..., 4])))
        stAc = (st[..., 5], st[..., 6])
        Ac_n = _dfm.mul(stAc, (anc[..., 5], anc[..., 6]))
        Bc_n = _dfm.add(_dfm.mul(stAc, (anc[..., 7], anc[..., 8])),
                        (st[..., 7], st[..., 8]))
        comp = jnp.concatenate([
            jnp.stack([anc[..., 0], lane_n, off_n, sum_n[0], sum_n[1],
                       Ac_n[0], Ac_n[1], Bc_n[0], Bc_n[1]], axis=-1),
            anc[..., 9:],
        ], axis=-1)
        st = jnp.where(done, st, comp)
        step_len *= 2
    off = jnp.round(st[..., 2]).astype(jnp.int32)
    sumd = (st[..., 3], st[..., 4])
    Ac = (st[..., 5], st[..., 6])
    Bc = (st[..., 7], st[..., 8])
    bf = f_iota - off
    press = bf.astype(f32) * S_f
    ph0_n = st[..., 9]
    vol_n = (st[..., 10], st[..., 11])
    A_n, D_n, R_n = st[..., 12], st[..., 13], st[..., 14]
    gl_n, gr_n = st[..., 15], st[..., 16]
    phase_start = _dfm.mod2(_dfm.add((ph0_n, jnp.zeros_like(ph0_n)), sumd))
    volb_start = _dfm.add(_dfm.mul(Ac, vol_n), Bc)

    fS = f_iota.astype(f32) * S_f
    alive_rows = jnp.stack([
        inc_from[0], ratio[0], phase_start[0], c_loc[0], volb_start[0],
        alpha[0],
        fS - press,
        jnp.maximum(fS - np.float32(FAR), -np.float32(FAR))
        * jnp.ones_like(press),
        jnp.full((F, k), sus, f32),
        A_n, jnp.full((F, k), hold_eff, f32), D_n,
        jnp.full((F, k), sus, f32), R_n, gl_n, gr_n,
        inc_from[1],
    ], axis=-1)  # (F, k, 17)
    n_alive = jnp.sum(alive.astype(jnp.int32), axis=-1)
    a_rank = jnp.cumsum(alive.astype(jnp.int32), axis=-1) - 1
    a_tgt = jnp.where(alive, a_rank, P)

    def slot_scatter(tgt, rows, mask):
        oh = ((tgt[..., None] == jnp.arange(P, dtype=tgt.dtype)[None, None, :])
              & mask[..., None]).astype(f32)
        vals = jnp.where(mask[..., None] & jnp.isfinite(rows), rows, 0.0)
        contrib = jnp.einsum("fkp,fkc->fpc", oh, vals, precision=prec)
        return contrib, jnp.sum(oh, axis=1)

    defaults = jnp.asarray([1e-6, 0.0, 0.0, 0.0, 0.0, 0.0, -1e9, 0.0, 0.0,
                            1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0], f32)

    # ---- release tails ----
    cont_prev = lane_scatter(match_prev, mf) > 0.5
    has_succ = jnp.concatenate(
        [cont_prev[1:], jnp.zeros((1, k), jnp.bool_)], axis=0)
    end = alive & ~has_succ
    nxt_data = jnp.concatenate(
        [is_data[1:], jnp.zeros((1,), jnp.bool_)])[:, None]
    has_off = end & nxt_data
    rel = jnp.where(has_off, (f_iota.astype(f32) + 1.0) * S_f,
                    np.float32(FAR))
    tp_r = rel - 1.0 - press
    va = jnp.clip((tp_r + 1.0) / A_n, 0.0, 1.0)
    vd = 1.0 + (sus - 1.0) * jnp.clip((tp_r - A_n - hold_eff + 1.0)
                                      / jnp.maximum(D_n, 1.0), 0.0, 1.0)
    top_now = jnp.where(tp_r < A_n, va,
                        jnp.where(tp_r < A_n + hold_eff, 1.0,
                                  jnp.where((D_n > 0)
                                            & (tp_r < A_n + hold_eff + D_n),
                                            vd, sus)))
    top_tail = jnp.where(has_off, top_now, sus).astype(f32)
    f1 = jnp.where(
        has_off,
        jnp.minimum(np.int32(total_frames),
                    f_iota + 1 + jnp.ceil(R_n / S_f).astype(jnp.int32)
                    + 1),
        jnp.where(end, np.int32(total_frames), 0))
    t_need = jnp.where(end, f1 - (f_iota + 1), 0)
    viol |= jnp.any(t_need > t_max)

    E = min(k, tail_E)
    n_end = jnp.sum(end.astype(jnp.int32), axis=-1)
    viol |= jnp.any(n_end > E)
    e_rank = jnp.cumsum(end.astype(jnp.int32), axis=-1) - 1
    e_tgt = jnp.where(end, e_rank, E)
    ph_end = _dfm.mod2(_dfm.add(phase_start, dphi_m))
    step_m = _dfm.mod2(_dfm.mul_f32(inc_to, S_f))
    # 20 channels per end lane: [inc pair, ph_end pair, step pair, lq pair,
    #  volb pair, c pair, alpha, press, rel, top, A, D, R, gl, gr, t_need]
    end_src = jnp.stack([
        inc_to[0], inc_to[1], ph_end[0], ph_end[1], step_m[0], step_m[1],
        lq[0], lq[1], volb_start[0], volb_start[1], c_loc[0], c_loc[1],
        alpha[0], press, rel, top_tail, A_n, D_n, R_n, gl_n, gr_n,
        t_need.astype(f32), jnp.ones((F, k), f32),
    ], axis=-1)  # (F, k, 23) + is_end marker
    oh_e = ((e_tgt[..., None] == jnp.arange(E, dtype=e_tgt.dtype)
             [None, None, :]) & end[..., None]).astype(f32)
    end_c = jnp.einsum(
        "fke,fkc->fec", oh_e,
        jnp.where(end[..., None] & jnp.isfinite(end_src), end_src, 0.0),
        precision=prec)  # (F, E, 23)
    ch = lambda i: end_c[..., i]

    def shifted_stack(a, fill):
        ap = jnp.concatenate(
            [jnp.full((t_max,) + a.shape[1:], fill, a.dtype), a[:F - 1]],
            axis=0)
        return jnp.stack([ap[t_max - 1 - t: t_max - 1 - t + F]
                          for t in range(t_max)], axis=0)  # (t_max, F, E)

    t_iota = jnp.arange(t_max, dtype=f32)[:, None, None]
    m_all = (shifted_stack(ch(22), 0.0) > 0.5) & (
        t_iota < shifted_stack(ch(21), 0.0))
    inc_e = (shifted_stack(ch(0), 0.0), shifted_stack(ch(1), 0.0))
    ph_e = (shifted_stack(ch(2), 0.0), shifted_stack(ch(3), 0.0))
    st_e = (shifted_stack(ch(4), 0.0), shifted_stack(ch(5), 0.0))
    lq_e = (shifted_stack(ch(6), 0.0), shifted_stack(ch(7), 0.0))
    phase_g = _dfm.mod2(_dfm.add(ph_e, _dfm.mod2(
        _dfm.mul_f32(st_e, t_iota))))
    qp = _dfm.exp(_dfm.mul_f32(lq_e, t_iota + 1.0))
    volb_e = (shifted_stack(ch(8), 0.0), shifted_stack(ch(9), 0.0))
    c_e = (shifted_stack(ch(10), 0.0), shifted_stack(ch(11), 0.0))
    one_m_qp = _dfm.neg(_dfm.expm1(_dfm.mul_f32(lq_e, t_iota + 1.0)))
    volb_g = _dfm.add(_dfm.mul(qp, volb_e), _dfm.mul(one_m_qp, c_e))
    gS = fS[:, :1][None]
    zeros_tfe = jnp.zeros((t_max, F, E), f32)
    rows_all = jnp.stack([
        inc_e[0], zeros_tfe, phase_g[0], c_e[0], volb_g[0],
        shifted_stack(ch(12), 0.0),
        jnp.broadcast_to(gS, (t_max, F, E)) - shifted_stack(ch(13), 0.0),
        jnp.maximum(gS - shifted_stack(ch(14), np.float32(FAR)),
                    -np.float32(FAR)),
        shifted_stack(ch(15), 0.0), shifted_stack(ch(16), 0.0),
        jnp.full((t_max, F, E), hold_eff, f32), shifted_stack(ch(17), 0.0),
        jnp.full((t_max, F, E), sus, f32), shifted_stack(ch(18), 0.0),
        shifted_stack(ch(19), 0.0), shifted_stack(ch(20), 0.0),
        inc_e[1],
    ], axis=-1)  # (t_max, F, E, 17)
    tm = jnp.moveaxis(m_all, 0, 1).reshape(F, t_max * E)
    t_rank = jnp.cumsum(tm.astype(jnp.int32), axis=-1) - 1 + n_alive[:, None]
    viol |= jnp.any(n_alive + jnp.sum(tm.astype(jnp.int32), axis=-1) > P)
    rows_flat = jnp.moveaxis(rows_all, 0, 1).reshape(F, t_max * E, _NF_DF)
    comb_tgt = jnp.concatenate([a_tgt.astype(jnp.int32),
                                jnp.where(tm, t_rank, P)], axis=1)
    comb_rows = jnp.concatenate([alive_rows, rows_flat], axis=1)
    comb_mask = jnp.concatenate([alive, tm], axis=1)
    contrib, cover = slot_scatter(comb_tgt, comb_rows, comb_mask)
    table = contrib + defaults[None, None, :] * (1.0 - cover)[..., None]
    return table, viol


def _prep_lanes_df(freq4, loud_pitches_df, loud_spl_df, at_args, kw):
    """df32 lane padding + frame-local pipeline + tail-frame padding.
    freq4 = (freq_hi, freq_lo, mag_hi, mag_lo)."""
    fh, fl_, mh, ml = freq4
    F, k = fh.shape
    if k % 8:
        padk = 8 - k % 8
        fh = jnp.pad(fh, ((0, 0), (0, padk)))
        fl_ = jnp.pad(fl_, ((0, 0), (0, padk)))
        mh = jnp.pad(mh, ((0, 0), (0, padk)), constant_values=-jnp.inf)
        ml = jnp.pad(ml, ((0, 0), (0, padk)))
    tp, vol, loud_order = _frame_local_df(
        (fh, fl_), (mh, ml), loud_pitches_df, loud_spl_df, at_args,
        d=kw["nearby_distance"], min_volume=kw["min_volume"],
        pitch_method=kw["pitch_method"], volume_method=kw["volume_method"],
        shift_pre=kw["shift_pre"], shift_post=kw["shift_post"],
        analysis_volume=kw["analysis_volume"],
        harmonize_pre=kw.get("harmonize_pre", 0.0),
        harmonize_post=kw.get("harmonize_post", 0.0),
        autotune_kind=kw.get("autotune_kind", "off"),
        autotune_max_pitch=kw.get("autotune_max_pitch", 150.0),
        autotune_tolerance=kw.get("autotune_tolerance", 100.0),
        harmonize_semantics=kw.get("harmonize_semantics", "merged"))
    k = tp[0].shape[-1]
    pad = kw["total_frames"] - tp[0].shape[0]
    if pad > 0:
        tp = (jnp.pad(tp[0], ((0, pad), (0, 0)), constant_values=jnp.inf),
              jnp.pad(tp[1], ((0, pad), (0, 0))))
        vol = tuple(jnp.pad(v, ((0, pad), (0, 0))) for v in vol)
        loud_order = jnp.pad(loud_order, ((0, pad), (0, 0)))
    is_data = jnp.arange(kw["total_frames"]) < F
    return tp, vol, loud_order, is_data, k


def build_tables_device_df(freq_hi, freq_lo, mag_hi, mag_lo, loud_pitches_df,
                           loud_spl_df, pan_draws, phase_draws, *,
                           autotune_arrays_df=None, _force_scan=False, **kw):
    """df32 tracker entry: (F, k) df32 peak pairs -> ((total_frames, P, 17)
    table, dropped), fully on device. The 17-field table routes the render
    down the df-phase path (_render_slots auto-detects the field count).

    loud_pitches_df/loud_spl_df: ((hi, lo)) pairs of the f64 ISO tables.
    autotune_arrays_df: ((root), (scale), (equid), (allowed)) df32 pairs.
    Violation fallbacks (cap drops, slot overflow, long tails) route to the
    f32 scan state machine with a zero INC_LO field — exact event semantics,
    f32-grade phases (the benched default config never trips it)."""
    F = freq_hi.shape[0]
    if kw["max_voices"] > 127:
        raise ValueError("device tracker supports max_voices <= 127")
    if autotune_arrays_df is None:
        z = lambda *s: (jnp.zeros(s, jnp.float32), jnp.zeros(s, jnp.float32))
        autotune_arrays_df = (z(), z(8), z(7), z(0))
    tp, vol, loud_order, is_data, k = _prep_lanes_df(
        (freq_hi, freq_lo, mag_hi, mag_lo), loud_pitches_df, loud_spl_df,
        autotune_arrays_df, kw)

    def _scan_path(_):
        table16, dropped = _scan_tables(tp[0], vol[0], loud_order, is_data,
                                        pan_draws, phase_draws, kw, k)
        table17 = jnp.concatenate(
            [table16, jnp.zeros(table16.shape[:-1] + (1,), table16.dtype)],
            axis=-1)
        return table17, dropped

    if kw["min_volume"] > 0 and not _force_scan:
        sr_f = float(kw["sample_rate"])
        min_dt = sr_f / 1000.0
        release_eff = max(float(kw["release"]), min_dt, 1.0)
        min_change_floor = 2.5 * sr_f / 2.0
        total_frames = kw["total_frames"]
        t_max = int(min(total_frames, 32,
                        np.ceil(max(release_eff, min_change_floor)
                                / float(kw["stride"])) + 2))
        t_max = max(t_max, min(total_frames - F, 32), 1)
        tbl_p, viol = _build_tables_parallel_df(
            tp, vol, loud_order, is_data,
            jnp.asarray(pan_draws, jnp.float32),
            jnp.asarray(phase_draws, jnp.float32),
            S=float(kw["stride"]), sr=sr_f,
            maxd=float(kw["max_track_pitches"]),
            max_voices=int(kw["max_voices"]), P=kw["n_slots"], Q=128,
            attack=float(kw["attack"]), hold=float(kw["hold"]),
            decay=float(kw["decay"]), sustain=float(kw["sustain"]),
            release=float(kw["release"]),
            stereo_spread=float(kw["stereo_spread"]),
            total_frames=int(total_frames), t_max=t_max,
            stable_draws=kw.get("draw_indexing",
                                "sequential") == "stable")
        return jax.lax.cond(viol, _scan_path,
                            lambda _: (tbl_p, jnp.int32(0)), None)
    return _scan_path(None)
