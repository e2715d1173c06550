"""On-device waveform augmentation: additive noise / music / babble at SNR,
RIR reverberation, speed perturbation.

Replaces the reference's augmentation machinery — steps/data/
augment_data_dir.py + reverberate_data_dir.py, which rewrite wav.scp entries
into `wav-reverberate` C++ pipe commands executed per-utterance at feature
time (SURVEY §2.5) — with batched jittable ops that run just before the
fused frontend, so augmented features never touch the disk.

Semantics preserved from wav-reverberate:
- additive signals are tiled/cropped to the target length at a random start
  offset and scaled to an exact SNR in dB against the signal energy
  (run.sh:136-144 SNR grids: noise 15:10:5:0, music 15:10:8:5,
  babble 20:17:15:13, babble mixes 3-7 speech sources);
- RIR convolution via rFFT, output shifted so the direct path (RIR peak)
  stays time-aligned (--shift-output=true) and power-normalized to the dry
  signal's energy (--normalize-output default);
- speed perturbation by sox-style resampling (factors 0.9/1.0/1.1,
  utils/perturb_data_dir_speed.sh) implemented as linear interpolation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _energy(x: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.arange(x.shape[-1]) < length
    return jnp.sum((x * mask) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=())
def add_noise_snr(signal: jnp.ndarray, sig_len: jnp.ndarray,
                  noise: jnp.ndarray, noise_len: jnp.ndarray,
                  snr_db: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Mix one noise source into one signal at an exact SNR.

    signal (N,), noise (M,) with true lengths; the noise is read circularly
    from `start` so any start offset and length work under static shapes.
    """
    n = signal.shape[-1]
    idx = (start + jnp.arange(n)) % jnp.maximum(noise_len, 1)
    tiled = noise[idx]
    e_sig = jnp.maximum(_energy(signal, sig_len), 1e-10)
    e_noise = jnp.maximum(_energy(tiled, sig_len), 1e-10)
    scale = jnp.sqrt(e_sig / (e_noise * 10.0 ** (snr_db / 10.0)))
    mask = jnp.arange(n) < sig_len
    return signal + scale * tiled * mask


@jax.jit
def reverberate(signal: jnp.ndarray, sig_len: jnp.ndarray,
                rir: jnp.ndarray, rir_len: jnp.ndarray) -> jnp.ndarray:
    """FFT convolution with an impulse response; direct-path aligned and
    power-normalized (wav-reverberate --shift-output --normalize-output)."""
    n = signal.shape[-1]
    m = rir.shape[-1]
    fft_n = 1
    while fft_n < n + m:
        fft_n *= 2
    rir_mask = jnp.arange(m) < rir_len
    rir = rir * rir_mask
    S = jnp.fft.rfft(signal, fft_n)
    H = jnp.fft.rfft(rir, fft_n)
    wet_full = jnp.fft.irfft(S * H, fft_n)
    # shift so the RIR's peak (direct path) maps t→t
    peak = jnp.argmax(jnp.abs(rir))
    idx = jnp.arange(n) + peak
    wet = wet_full[idx]
    e_dry = jnp.maximum(_energy(signal, sig_len), 1e-10)
    e_wet = jnp.maximum(_energy(wet, sig_len), 1e-10)
    out = wet * jnp.sqrt(e_dry / e_wet)
    return out * (jnp.arange(n) < sig_len)


def speed_perturb(signal: np.ndarray, factor: float) -> np.ndarray:
    """sox speed semantics: playback-rate change (resample, new length
    n/factor).  Host-side numpy: this runs once per utterance at dataset
    build, not in the jit path."""
    n = len(signal)
    new_n = int(round(n / factor))
    pos = np.arange(new_n) * factor
    i0 = np.clip(pos.astype(np.int64), 0, n - 1)
    i1 = np.clip(i0 + 1, 0, n - 1)
    frac = (pos - i0).astype(signal.dtype)
    return signal[i0] * (1 - frac) + signal[i1] * frac


@functools.partial(jax.jit, static_argnames=("n",))
def tile_pool(mats: jnp.ndarray, lens: jnp.ndarray, n: int) -> jnp.ndarray:
    """Circularly extend each pool row to L+n samples so ANY circular window
    [start, start+n) with start < row_len becomes one contiguous
    dynamic_slice.  General gathers are catastrophic on TPU — this pays one
    gather per (pool, n) shape instead of one per batch row per step."""
    idx = jnp.arange(mats.shape[1] + n)

    def row(m, l):
        return m[idx % jnp.maximum(l, 1)]

    return jax.vmap(row)(mats, lens)


class WavAugmenter:
    """Random augmentation policy over a batch, reference SNR grids.

    Draws one of {none, noise, music, babble, reverb} per utterance
    (augment_data_dir.py composes a 2x corpus: clean + one augmentation each;
    run.sh:162-164) and applies it on device in ONE dispatch per (B, N)
    bucket: a vmapped ``lax.switch`` over rows.  The reference fans
    per-utterance wav-reverberate pipes over nj=30 CPU jobs
    (steps/data/augment_data_dir.py:71-118 + local/make_fbank.sh:118-126);
    here the pools live in device HBM (uploaded once) and the host only
    ships tiny per-row plan vectors (kind, source index, SNR, start).

    Babble semantics match wav-reverberate: each of the 3-7 speech sources
    is mixed at its own grid SNR measured against the CLEAN signal — no
    aggregate-SNR compensation.
    """

    SNR = {"noise": (15.0, 10.0, 5.0, 0.0),
           "music": (15.0, 10.0, 8.0, 5.0),
           "babble": (20.0, 17.0, 15.0, 13.0)}
    MAX_BABBLE = 7

    def __init__(self, noise: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 music: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 speech: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 rirs: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 seed: int = 0, snr: Optional[dict] = None,
                 rir_probs: Optional[np.ndarray] = None,
                 rvb_noise: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 reverb_planner=None):
        """Each pool is (padded matrix (K, L), lengths (K,)).  `snr`
        overrides the per-kind SNR grids (DataConfig.snr_*).

        RIR-set extensions (reverberate_data_dir.py semantics, wired by
        recipes.rir):
        - rir_probs: per-RIR draw probabilities (the room→RIR two-stage
          draw collapses to this, see recipes/rir.py docstring); uniform
          when absent;
        - rvb_noise: a second additive pool reserved for noises COMPOSED
          with the reverb branch (iso/point-source RIR-set noises);
        - reverb_planner: a recipes.rir.ReverbPlanner — when set, each
          'reverb' row's RIR + noise draw comes from planner.draw()
          (room-linked iso noises, fg/bg SNR cycles, max-noises-per-minute)
          instead of the plain uniform RIR draw.
        """
        if snr:
            self.SNR = {**type(self).SNR,
                        **{k: tuple(float(x) for x in v)
                           for k, v in snr.items()}}
        self.pools = {}
        self._host_lens = {}
        for name, p in (("noise", noise), ("music", music),
                        ("babble", speech), ("rvb_noise", rvb_noise)):
            if p is not None:
                self.pools[name] = (jnp.asarray(p[0], jnp.float32),
                                    jnp.asarray(p[1], jnp.int32))
                self._host_lens[name] = np.asarray(p[1], np.int64)
        self.rirs = None
        if rirs is not None:
            self.rirs = (jnp.asarray(rirs[0], jnp.float32),
                         jnp.asarray(rirs[1], jnp.int32))
        self.rir_probs = None
        if rir_probs is not None:
            rp = np.asarray(rir_probs, np.float64)
            self.rir_probs = rp / rp.sum()
        self.reverb_planner = reverb_planner
        self.rng = np.random.default_rng(seed)
        from collections import OrderedDict

        self._tiled = OrderedDict()  # (kind, n) -> tiled pool matrix, LRU
        self._tiled_bytes = 0
        self.tile_budget_bytes = 2 << 30  # HBM ceiling for tiled pools
        self._fns = {}     # n -> jitted vmapped row dispatcher

    def set_pool(self, kind: str, pool: Tuple[np.ndarray, np.ndarray]) -> None:
        """Swap a pool's backing shard (full-corpus rotation,
        recipes.augment_dir.AugmentPools.load).  The new shard must keep
        the previous shard's (K, L) shape — fixed shapes are what makes
        rotation free of recompiles (the compiled batch fns take the tiled
        pools as ARGUMENTS of a fixed shape)."""
        assert kind in self.pools, kind
        mats, lens = pool
        old_shape = self.pools[kind][0].shape
        assert tuple(mats.shape) == tuple(old_shape), (kind, mats.shape,
                                                       old_shape)
        self.pools[kind] = (jnp.asarray(mats, jnp.float32),
                            jnp.asarray(lens, jnp.int32))
        self._host_lens[kind] = np.asarray(lens, np.int64)
        for key in [k for k in self._tiled if k[0] == kind]:
            self._tiled_bytes -= self._tile_cost(key[0], key[1])
            del self._tiled[key]

    def _tile_cost(self, kind: str, n: int) -> int:
        mats = self.pools[kind][0]
        return int(mats.shape[0] * (mats.shape[1] + n) * 4)

    def kinds(self):
        out = [k for k in self.pools if k != "rvb_noise"]
        if self.rirs is not None:
            out.append("reverb")
        return out

    def _tiled_pool(self, kind: str, n: int) -> jnp.ndarray:
        """Byte-accounted LRU over the tiled pool copies: evict the
        least-recently-used tiles until the new one fits under
        tile_budget_bytes (replaces round 2's blunt clear-at-8-entries —
        full-corpus shards made per-entry sizes too uneven for a count
        bound)."""
        key = (kind, n)
        if key in self._tiled:
            self._tiled.move_to_end(key)
            return self._tiled[key]
        cost = self._tile_cost(kind, n)
        while self._tiled and self._tiled_bytes + cost > self.tile_budget_bytes:
            old_key, _ = self._tiled.popitem(last=False)
            self._tiled_bytes -= self._tile_cost(old_key[0], old_key[1])
        mats, lens = self.pools[kind]
        self._tiled[key] = tile_pool(mats, lens, n)
        self._tiled_bytes += cost
        return self._tiled[key]

    def _build_fn(self, n: int, names):
        """Jitted (B, n) batch augmenter; branch order = [clean] + names.

        Tiled pools and RIRs enter as ARGUMENTS (a tuple in add_names
        order), not closure constants — jit would bake captured arrays into
        the compiled program, pinning one full pool copy per bucket length
        in HBM with no way to evict (the _tiled cache would free nothing).
        As arguments they live only in the evictable _tiled dict."""
        S = self.MAX_BABBLE
        add_names = [k for k in names if k != "reverb"]
        kind_idx = {k: i for i, k in enumerate(add_names)}
        has_rvb_noise = "rvb_noise" in self.pools

        # trace-time gate: the per-noise room convolution only enters the
        # compiled program when the planner draws noise RIRs — the dry
        # regimes (MUSAN tables, room_convolve_noises=False) pay nothing
        noise_conv = (has_rvb_noise and self.reverb_planner is not None
                      and getattr(self.reverb_planner,
                                  "room_convolve_noises", False))

        def batch_fn(tiled, rvb_tiled, rmats, rlens, sigs, lengths, codes,
                     srcs, startss, snrss, sig_startss, durss, nrirss,
                     n_srcs):
            def row_fn(sig, length, code, src, starts, snrs, sig_starts,
                       durs, nrirs, n_src):
                ar = jnp.arange(n)
                mask = (ar < length).astype(sig.dtype)
                e_sig = jnp.maximum(_energy(sig, length), 1e-10)

                def scaled(kind, i):
                    t = jax.lax.dynamic_slice(
                        tiled[kind_idx[kind]], (src[i], starts[i]), (1, n))[0]
                    e_n = jnp.maximum(_energy(t, length), 1e-10)
                    return jnp.sqrt(
                        e_sig / (e_n * 10.0 ** (snrs[i] / 10.0))) * t

                def additive(kind):
                    return lambda: sig + scaled(kind, 0) * mask

                def babble():
                    def body(i, acc):
                        on = jnp.where(i < n_src, 1.0, 0.0)
                        return acc + on * scaled("babble", i)

                    acc = jax.lax.fori_loop(0, S, body, jnp.zeros_like(sig))
                    return sig + acc * mask

                def reverb():
                    # wav-reverberate composition: reverberated (power-
                    # normalized) speech + additive RIR-set noises at their
                    # fg/bg SNRs measured against the signal energy (post-
                    # normalization wet energy == dry energy).  Columns
                    # 1..n_src-1 of the plan arrays hold the noises; the
                    # noise window is [sig_start, sig_start+dur) — bg/iso
                    # noises get dur<0 = the whole utterance (circular
                    # extension = wav-reverberate --duration repetition),
                    # fg noises keep their own duration at a random start
                    # (AddPointSourceNoise :219-227).
                    wet = reverberate(sig, length, rmats[src[0]],
                                      rlens[src[0]])
                    if not has_rvb_noise:
                        return wet

                    def body(i, acc):
                        on = jnp.where(i < n_src, 1.0, 0.0)
                        t = jax.lax.dynamic_slice(
                            rvb_tiled, (src[i], starts[i]), (1, n))[0]
                        d = jnp.where(durs[i] < 0, length, durs[i])
                        w = ((ar >= sig_starts[i])
                             & (ar < sig_starts[i] + d)
                             & (ar < length)).astype(sig.dtype)
                        if noise_conv:
                            # AddPointSourceNoise (:215-226): the point-
                            # source noise is wav-reverberated with an RIR
                            # from the speech's room before mixing; its
                            # power normalization cancels under the power-
                            # ratio SNR scale below, so only the temporal/
                            # spectral smearing survives — as in the
                            # reference.  The conv input is WINDOWED first
                            # (t·w): a fg noise at start s0 must echo its
                            # own clip, not the circular tail the tiled row
                            # holds before s0; the re-window below then
                            # truncates the conv tail like wav-reverberate's
                            # length-preserving output.  nrir<0 (iso noises,
                            # dry regime) keeps the raw row.
                            k = jnp.maximum(nrirs[i], 0)
                            wet_t = reverberate(t * w, length,
                                                rmats[k], rlens[k])
                            t = jnp.where(nrirs[i] >= 0, wet_t, t)
                        # wav-reverberate AddNoise scales by the POWER
                        # (mean-square) ratio over each signal's own
                        # duration — for fg noises shorter than the
                        # utterance that differs from an energy ratio by
                        # sqrt(d/len)
                        n_w = jnp.maximum(jnp.sum(w), 1.0)
                        p_n = jnp.maximum(jnp.sum((t * w) ** 2) / n_w, 1e-10)
                        p_sig = e_sig / jnp.maximum(
                            length.astype(sig.dtype), 1.0)
                        scale = jnp.sqrt(
                            p_sig / (p_n * 10.0 ** (snrs[i] / 10.0)))
                        return acc + on * scale * t * w

                    acc = jax.lax.fori_loop(1, S, body, jnp.zeros_like(sig))
                    return wet + acc

                branches = [lambda: sig]
                for name in names:
                    branches.append({"babble": babble, "reverb": reverb}.get(
                        name, additive(name)))
                return jax.lax.switch(code, branches)

            return jax.vmap(row_fn)(sigs, lengths, codes, srcs, startss,
                                    snrss, sig_startss, durss, nrirss,
                                    n_srcs)

        return jax.jit(batch_fn)

    def _draw_plan(self, codes: np.ndarray, names, lengths: np.ndarray):
        """Host-side plan vectors for one batch:
        (src, starts, snrs, sig_starts, durs, n_src)."""
        B = len(codes)
        S = self.MAX_BABBLE
        src = np.zeros((B, S), np.int32)
        starts = np.zeros((B, S), np.int32)
        snrs = np.zeros((B, S), np.float32)
        sig_starts = np.zeros((B, S), np.int32)
        durs = np.full((B, S), -1, np.int32)
        nrirs = np.full((B, S), -1, np.int32)  # noise-RIR index; -1 = dry
        n_src = np.ones(B, np.int32)
        for ci, name in enumerate(names):
            rows = np.where(codes == ci + 1)[0]
            if rows.size == 0:
                continue
            if name == "reverb":
                if self.reverb_planner is not None:
                    nl = self._host_lens.get("rvb_noise")
                    for r in rows:
                        # slot cap passed into the draw so the planner's
                        # cyclic SNR iterators never advance for noises the
                        # S-slot mix couldn't hold (planner.cap_hits counts
                        # utterances where the cap bound)
                        plan = self.reverb_planner.draw(int(lengths[r]), nl,
                                                        max_slots=S - 1)
                        if plan is None:  # dry: delta RIR, no noises
                            src[r, 0] = len(self.rirs[1]) - 1
                            continue
                        # rir=-1 (noises only) → the delta-RIR identity row
                        # appended by recipes.augment_dir (index K-1)
                        src[r, 0] = (plan.rir if plan.rir >= 0
                                     else len(self.rirs[1]) - 1)
                        assert len(plan.noises) <= S - 1
                        for i, (ni, snr, s0, d, nrir) in enumerate(
                                plan.noises, start=1):
                            src[r, i] = ni
                            snrs[r, i] = snr
                            sig_starts[r, i] = s0
                            durs[r, i] = d
                            nrirs[r, i] = nrir
                            # align tiled row so tiled[start+t] =
                            # noise[(t - s0) mod len]
                            L = max(int(nl[ni]), 1) if nl is not None else 1
                            starts[r, i] = (L - s0 % L) % L
                        n_src[r] = 1 + len(plan.noises)
                elif self.rir_probs is not None:
                    src[rows, 0] = self.rng.choice(
                        len(self.rirs[1]), rows.size,
                        p=self.rir_probs).astype(np.int32)
                else:
                    src[rows, 0] = self.rng.integers(0, len(self.rirs[1]),
                                                     rows.size)
                continue
            lens = self._host_lens[name]
            cols = S if name == "babble" else 1
            if name == "babble":
                n_src[rows] = self.rng.integers(3, 8, rows.size)
            k = self.rng.integers(0, len(lens), (rows.size, cols)).astype(np.int32)
            src[rows, :cols] = k
            starts[rows, :cols] = self.rng.integers(
                0, np.maximum(lens[k], 1)).astype(np.int32)
            snrs[rows, :cols] = self.rng.choice(self.SNR[name],
                                                (rows.size, cols))
        return src, starts, snrs, sig_starts, durs, nrirs, n_src

    def __call__(self, wavs: np.ndarray, lengths: np.ndarray,
                 kinds=None, device_out: bool = False) -> np.ndarray:
        """Augment a (B, N) batch; one kind per row.

        kinds: optional per-row kind names ('none' = keep clean), e.g. from a
        utt2aug table; drawn uniformly over {clean} + available kinds when
        absent.  Unavailable kinds (no pool loaded) pass through clean.
        device_out=True returns the device array without a host round trip —
        use it when the result feeds another device computation (the
        frontend), which matters on hosts with slow transfer links."""
        names = self.kinds()
        if not names:
            return jnp.asarray(wavs) if device_out else np.asarray(wavs)
        B, n = wavs.shape
        if kinds is None:
            draw = self.rng.integers(0, len(names) + 1, size=B)
            codes = np.where(draw == len(names), 0, draw + 1).astype(np.int32)
        else:
            code_of = {k: i + 1 for i, k in enumerate(names)}
            codes = np.asarray([code_of.get(k, 0) for k in kinds], np.int32)
        if not codes.any():
            return jnp.asarray(wavs) if device_out else np.asarray(wavs)
        src, starts, snrs, sig_starts, durs, nrirs, n_src = self._draw_plan(
            codes, names, np.asarray(lengths))
        if n not in self._fns:
            self._fns[n] = self._build_fn(n, names)
        tiled = tuple(self._tiled_pool(k, n) for k in names if k != "reverb")
        if "rvb_noise" in self.pools:
            rvb_tiled = self._tiled_pool("rvb_noise", n)
        else:  # unused dummy (reverb branch skips the noise loop)
            rvb_tiled = jnp.zeros((1, 1), jnp.float32)
        if self.rirs is not None:
            rmats, rlens = self.rirs
        else:  # unused dummy (no reverb branch without RIRs)
            rmats = jnp.zeros((1, 1), jnp.float32)
            rlens = jnp.ones((1,), jnp.int32)
        out = self._fns[n](tiled, rvb_tiled, rmats, rlens,
                           jnp.asarray(wavs, jnp.float32),
                           jnp.asarray(lengths, jnp.int32),
                           jnp.asarray(codes), jnp.asarray(src),
                           jnp.asarray(starts), jnp.asarray(snrs),
                           jnp.asarray(sig_starts), jnp.asarray(durs),
                           jnp.asarray(nrirs), jnp.asarray(n_src))
        return out if device_out else np.asarray(out)
