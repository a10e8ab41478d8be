"""End-to-end synthesis pipeline: text + face image -> 16 kHz waveform.

Library equivalent of the reference's inference entry (inference.py:22-185):
face -> SyncNet embedding, text -> interspersed symbol IDs, FaceTTS
encode/decode, HiFi-GAN vocoder.  TPU-first: static shape buckets per
(text-length, mel-length) pair; each bucket compiles once and is cached.
"""

import hashlib
import weakref
from collections import OrderedDict
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facegantts_tpu.config import Config
from facegantts_tpu.models.facetts import FaceTTS
from facegantts_tpu.models.hifigan import HiFiGANGenerator
from facegantts_tpu.ops.align import fix_len_compatibility
from facegantts_tpu.text import CMUDict, intersperse, text_to_sequence


def load_face(path: str, image_size: int = 224) -> np.ndarray:
    """PNG/JPG -> (H, W, 3) float32 in BGR channel order, 0..255 scale.

    The reference feeds raw cv2.imread output (BGR, uint8 0..255) straight
    into SyncNet (inference.py:90-93); we reproduce that convention so
    pretrained weights see the same distribution."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((image_size, image_size), Image.BILINEAR)
    rgb = np.asarray(img, dtype=np.float32)
    return rgb[..., ::-1].copy()  # -> BGR


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return fix_len_compatibility(n)


class Synthesizer:
    """Holds model/vocoder params and compiled per-bucket programs."""

    def __init__(
        self,
        cfg: Config,
        params=None,
        vocoder_params=None,
        cmudict: Optional[CMUDict] = None,
        seed: int = 0,
        mesh=None,
    ):
        """``mesh``: optional 1-D ``data`` `jax.sharding.Mesh` (see
        parallel/mesh.py).  When set, params are replicated across it and
        ``synthesize_batch`` shards every bucket dispatch's batch dimension
        over the axis — scale-out inference on a pod slice, the serving
        counterpart of the training data-parallelism (batches are padded
        up to a mesh-size multiple, so with padding the per-row noise
        draws differ from the unmeshed run; without padding they are
        identical).  Single-utterance ``synthesize`` stays replicated —
        batch 1 cannot shard."""
        self.cfg = cfg
        self.mesh = mesh
        self.model = FaceTTS.from_config(cfg)
        self.vocoder = HiFiGANGenerator(in_channels=cfg.n_mels)
        self.cmu = cmudict
        rng = jax.random.PRNGKey(seed)
        if params is None:
            # random init — runs the full pipeline without checkpoints.
            # `params` is the full variables dict (params + batch_stats).
            # The conditioning example must match cfg.spk_emb: a face image
            # or a mel clip (reference face_tts.py:108-114).
            # UNDER JIT, like train.init_state: eager flax init dispatches
            # the graph op-by-op, and on the tunneled TPU each tiny op costs
            # a ~0.4-1.4 s throwaway compile that the persistent cache
            # refuses to keep (<2 s entries) — measured 200-430 s of "cold
            # start" per fresh process, the r3 bench's 429.9 s mystery
            # (BENCH_NOTES r4).  One jitted init program is cacheable and
            # cheap.
            x = jnp.ones((1, 8), jnp.int32)
            spk0 = (jnp.zeros((1, cfg.n_mels, 16))
                    if cfg.spk_emb == "speech"
                    else jnp.zeros((1, 224, 224, 3)))
            params = jax.jit(
                lambda r: self.model.init(
                    r, x, jnp.array([8]), 2, 16, 1.0, False, spk0, 1.0, r,
                )
            )(rng)
        if vocoder_params is None:
            vocoder_params = jax.jit(
                lambda r: self.vocoder.init(r, jnp.zeros((1, cfg.n_mels, 16)))
            )(rng)["params"]
        if mesh is not None:
            from facegantts_tpu.parallel import replicated

            rep = replicated(mesh)
            params = jax.tree.map(lambda a: jax.device_put(a, rep), params)
            vocoder_params = jax.tree.map(
                lambda a: jax.device_put(a, rep), vocoder_params
            )
        self.params = params
        self.vocoder_params = vocoder_params
        # duration cache: (ids, face content digest) -> exact mel frames.
        # Duration prediction is deterministic (no sampling in the encoder),
        # so a repeated (text, face) pair always yields the same length —
        # caching it lets synthesize() run the fully fused one-dispatch path
        # with no mid-pipeline host sync (a full round-trip saved per
        # utterance on remote/tunneled TPUs).  Content-keyed and LRU-bounded:
        # a long-running serving process cannot grow without bound, and the
        # entries pin no device arrays.
        self._ty_cache: OrderedDict = OrderedDict()
        self._ty_cache_max = 4096
        # id(device array) -> (weakref, content digest) for faces uploaded
        # via prepare_face; the weakref detects id() reuse after gc.
        self._face_digests: dict = {}

    # ------------------------------------------------------------ compiled
    @lru_cache(maxsize=None)
    def _encode_fn(self, tx: int):
        def fn(variables, x, x_len, face):
            return self.model.apply(
                variables, x, x_len, face, self.cfg.length_scale,
                method=FaceTTS.encode,
            )

        return jax.jit(fn)

    @lru_cache(maxsize=None)
    def _decode_fn(self, tx: int, ty: int, n_timesteps: int, temperature: float, stoc: bool):
        """Diffusion decode only (mel out, no vocoder) — the streaming
        path's first stage.  Mirrors _decode_vocode_fn's cfg.use_bf16
        casting exactly so both paths draw the SAME diffusion noise
        (jax.random.normal samples depend on the requested dtype)."""
        use_bf16 = bool(self.cfg.use_bf16)

        def fn(variables, mu_x, w_ceil, x_mask, y_lengths, spk_e, rng):
            if use_bf16:
                cast = lambda t: jax.tree.map(  # noqa: E731
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, t
                )
                variables = cast(variables)
                mu_x, w_ceil, x_mask, spk_e = (
                    t.astype(jnp.bfloat16) for t in (mu_x, w_ceil, x_mask, spk_e)
                )
            mu_y, dec, attn, y_len = self.model.apply(
                variables, mu_x, w_ceil, x_mask, y_lengths, spk_e,
                n_timesteps, ty, temperature, stoc, rng,
                method=FaceTTS.decode,
            )
            return mu_y, dec.astype(jnp.float32), attn, y_len

        return jax.jit(fn)

    @lru_cache(maxsize=None)
    def _decode_vocode_fn(self, tx: int, ty: int, n_timesteps: int, temperature: float, stoc: bool):
        """Fused diffusion + vocoder: one dispatch, no intermediate host sync.

        With cfg.use_bf16 the U-Net/vocoder weights and activations run in
        bfloat16 on the MXU (outputs cast back to f32); flip use_bf16=0 for
        bit-level parity with the reference's f32 pipeline."""
        use_bf16 = bool(self.cfg.use_bf16)

        def fn(variables, voc_params, mu_x, w_ceil, x_mask, y_lengths, spk_e, rng):
            if use_bf16:
                cast = lambda t: jax.tree.map(  # noqa: E731
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, t
                )
                variables = cast(variables)
                voc_params = cast(voc_params)
                mu_x, w_ceil, x_mask, spk_e = (
                    t.astype(jnp.bfloat16) for t in (mu_x, w_ceil, x_mask, spk_e)
                )
            _, dec, _, y_len = self.model.apply(
                variables, mu_x, w_ceil, x_mask, y_lengths, spk_e,
                n_timesteps, ty, temperature, stoc, rng,
                method=FaceTTS.decode,
            )
            wav = self.vocoder.apply({"params": voc_params}, dec)
            return wav.astype(jnp.float32), dec.astype(jnp.float32), y_len

        return jax.jit(fn)

    @lru_cache(maxsize=None)
    def _vocode_fn(self, ty: int):
        """Vocoder-only dispatch; honors cfg.use_bf16 like the fused path
        (weights + mel cast to bfloat16, waveform returned f32)."""
        use_bf16 = bool(self.cfg.use_bf16)

        def fn(params, mel):
            if use_bf16:
                params = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, params
                )
                mel = mel.astype(jnp.bfloat16)
            return self.vocoder.apply({"params": params}, mel).astype(jnp.float32)

        return jax.jit(fn)

    @lru_cache(maxsize=None)
    def _synth_full_fn(self, tx: int, ty: int, n_timesteps: int, temperature: float, stoc: bool):
        """Fully fused text+face -> wav: ONE device dispatch, zero
        mid-pipeline host syncs.  Usable whenever the mel bucket `ty` is
        known up front (duration cache hit) — the per-dispatch round-trip
        latency of remote/tunneled TPUs then counts once instead of twice."""
        use_bf16 = bool(self.cfg.use_bf16)

        def fn(variables, voc_params, x, x_len, face, rng):
            mu_x, w_ceil, x_mask, y_lengths, spk_e = self.model.apply(
                variables, x, x_len, face, self.cfg.length_scale,
                method=FaceTTS.encode,
            )
            if use_bf16:
                cast = lambda t: jax.tree.map(  # noqa: E731
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, t
                )
                variables = cast(variables)
                voc_params = cast(voc_params)
                mu_x, w_ceil, x_mask, spk_e = (
                    t.astype(jnp.bfloat16) for t in (mu_x, w_ceil, x_mask, spk_e)
                )
            _, dec, _, y_len = self.model.apply(
                variables, mu_x, w_ceil, x_mask, y_lengths, spk_e,
                n_timesteps, ty, temperature, stoc, rng,
                method=FaceTTS.decode,
            )
            wav = self.vocoder.apply({"params": voc_params}, dec)
            return wav.astype(jnp.float32), dec.astype(jnp.float32), y_len

        return jax.jit(fn)

    # ------------------------------------------------------------- public
    @lru_cache(maxsize=4096)
    def encode_text(self, text: str) -> np.ndarray:
        """text -> interspersed symbol ids; memoized (the frontend's cleaner
        + CMU lookups are pure, and serving workloads repeat prompts)."""
        seq = text_to_sequence(text, dictionary=self.cmu)
        if self.cfg.add_blank:
            seq = intersperse(seq)
        return np.asarray(seq, dtype=np.int32)

    @staticmethod
    def _face_digest(face: np.ndarray) -> str:
        return hashlib.blake2b(
            np.ascontiguousarray(face, np.float32).tobytes(), digest_size=16
        ).hexdigest()

    def prepare_face(self, face: np.ndarray) -> jax.Array:
        """Upload a face image once; pass the result to repeated synthesize
        calls to skip the per-call 600 KB host->device transfer."""
        arr = jnp.asarray(np.asarray(face, np.float32)[None])
        if len(self._face_digests) > 512:  # prune dead weakrefs
            self._face_digests = {
                k: v for k, v in self._face_digests.items() if v[0]() is not None
            }
        self._face_digests[id(arr)] = (weakref.ref(arr), self._face_digest(face))
        return arr

    def _pad_rows(self, n: int) -> int:
        """Batch rows after padding to a mesh-size multiple (no-op unmeshed)."""
        if self.mesh is None:
            return n
        d = self.mesh.size
        return -(-n // d) * d

    def _place(self, *arrays):
        """Shard batch-leading arrays over the mesh's data axis (no-op
        unmeshed); GSPMD propagates the sharding through the jitted
        programs and inserts the collectives."""
        if self.mesh is None:
            return arrays
        from facegantts_tpu.parallel import batch_sharding

        sh = batch_sharding(self.mesh)
        return tuple(jax.device_put(a, sh) for a in arrays)

    def update_params(self, params=None, vocoder_params=None) -> None:
        """Swap in new weights without rebuilding the Synthesizer: the
        compiled per-bucket programs are shape-keyed, so same-shaped params
        reuse them with zero retracing (the in-training evaluator swaps the
        live generator weights in every eval interval).  The duration cache
        is invalidated — new weights predict new durations."""
        if self.mesh is not None:
            from facegantts_tpu.parallel import replicated

            rep = replicated(self.mesh)
            place = lambda t: jax.tree.map(  # noqa: E731
                lambda a: jax.device_put(a, rep), t
            )
        else:
            place = lambda t: t  # noqa: E731
        if params is not None:
            self.params = place(params)
        if vocoder_params is not None:
            self.vocoder_params = place(vocoder_params)
        self._ty_cache.clear()

    def synthesize(
        self,
        text,
        face,
        n_timesteps: Optional[int] = None,
        temperature: Optional[float] = None,
        stoc: bool = False,
        seed: int = 0,
        return_mel: bool = True,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """One utterance -> (waveform float32 [-1,1], log-mel (n_mels, T)).

        `text` is a sentence, or a precomputed int array of (interspersed)
        symbol ids — the in-training evaluator feeds ids straight from
        packed shards.  `face` may be a numpy image or a device array from
        prepare_face."""
        cfg = self.cfg
        n_timesteps = n_timesteps or cfg.timesteps
        temperature = cfg.temperature if temperature is None else temperature

        ids = self.encode_text(text) if isinstance(text, str) else np.asarray(text, np.int32)
        tx = pick_bucket(len(ids), cfg.text_buckets)
        x = np.zeros((1, tx), np.int32)
        x[0, : len(ids)] = ids
        x_len = np.array([len(ids)], np.int32)
        if isinstance(face, jax.Array):
            face_b = face
            ent = self._face_digests.get(id(face_b))
            digest = ent[1] if ent is not None and ent[0]() is face_b else None
        else:
            digest = self._face_digest(face)
            face_b = self.prepare_face(face)

        rng = jax.random.PRNGKey(seed)
        # content-keyed duration cache; faces of unknown provenance (device
        # arrays not from prepare_face) skip it rather than pin/mis-key
        cache_key = (ids.tobytes(), digest) if digest is not None else None
        cached_frames = self._ty_cache.get(cache_key) if cache_key else None
        if cached_frames is not None:
            self._ty_cache.move_to_end(cache_key)
            # fused fast path: bucket known, single dispatch, no mid sync
            ty = pick_bucket(cached_frames, cfg.mel_buckets)
            wav, dec, y_len = self._synth_full_fn(tx, ty, n_timesteps, temperature, stoc)(
                self.params, self.vocoder_params, jnp.asarray(x),
                jnp.asarray(x_len), face_b, rng,
            )
        else:
            mu_x, w_ceil, x_mask, y_lengths, spk_e = self._encode_fn(tx)(
                self.params, jnp.asarray(x), jnp.asarray(x_len), face_b
            )
            # the only mid-pipeline host sync: one scalar to pick the Ty bucket
            frames = int(np.ceil(float(y_lengths[0])))
            if cache_key is not None:
                self._ty_cache[cache_key] = frames
                if len(self._ty_cache) > self._ty_cache_max:
                    self._ty_cache.popitem(last=False)
            ty = pick_bucket(frames, cfg.mel_buckets)
            wav, dec, y_len = self._decode_vocode_fn(tx, ty, n_timesteps, temperature, stoc)(
                self.params, self.vocoder_params, mu_x, w_ceil, x_mask, y_lengths,
                spk_e, rng,
            )
        if return_mel:
            wav, y_len, dec = jax.device_get((wav, y_len, dec))
        else:
            wav, y_len = jax.device_get((wav, y_len))
        n_frames = int(y_len[0])
        out = np.clip(wav[0][: n_frames * self.cfg.hop_len], -1.0, 1.0)
        mel = dec[0][:, :n_frames] if return_mel else None
        return out, mel

    def stream_vocode(self, mel, chunk_frames: int = 64,
                      margin: Optional[int] = None):
        """Tiled (streaming) vocoding: yield waveform chunks for a log-mel
        of ANY length using ONE compiled vocoder executable of static window
        size — exact, not approximate.

        HiFi-GAN is fully convolutional, so an output sample depends only on
        mel frames within ``vocoder.margin_frames()`` of its own frame.
        Each window covers ``margin + chunk + margin`` frames; the emitted
        region stays >= margin frames from a window edge unless that edge is
        a true signal edge (first window left-aligned, last window
        right-aligned), which reproduces the full-signal 'SAME' padding.
        The concatenated chunks equal a single full-mel vocoder call
        (tests/test_synthesis.py), while time-to-first-audio drops from
        vocode(T) to vocode(window) and arbitrary mel lengths stop minting
        new executables.

        ``mel``: (n_mels, T) or (1, n_mels, T), numpy or device array,
        trimmed to the true length.  Yields float32 host chunks in order.
        """
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        T = mel.shape[-1]
        hop = self.cfg.hop_len
        M = self.vocoder.margin_frames() if margin is None else margin
        S = chunk_frames + 2 * M
        if T <= S:  # short utterance: one call is already minimal
            wav = jax.device_get(self._vocode_fn(T)(self.vocoder_params, mel))
            yield np.clip(wav[0], -1.0, 1.0).astype(np.float32)
            return
        fn = self._vocode_fn(S)
        for e in range(0, T, chunk_frames):
            p = max(0, min(e - M, T - S))
            wav = fn(self.vocoder_params, jax.lax.dynamic_slice_in_dim(mel, p, S, 2))
            lo, hi = e - p, min(e + chunk_frames, T) - p
            out = jax.device_get(wav)[0, lo * hop:hi * hop]
            yield np.clip(out, -1.0, 1.0).astype(np.float32)

    def synthesize_streaming(
        self,
        text,
        face,
        n_timesteps: Optional[int] = None,
        temperature: Optional[float] = None,
        stoc: bool = False,
        seed: int = 0,
        chunk_frames: int = 64,
    ):
        """Streaming synthesize: yield waveform chunks as they are vocoded.

        The encoder + diffusion decoder run first (the score-based sampler
        needs the whole mel), then the vocoder streams via
        :meth:`stream_vocode` — first audio arrives after one window-sized
        vocoder call instead of a full-utterance one.  The concatenation of
        the yielded chunks is sample-exact with vocoding the same mel in one
        call.  Serving counterpart: serve.py /synthesize_stream."""
        cfg = self.cfg
        n_timesteps = n_timesteps or cfg.timesteps
        temperature = cfg.temperature if temperature is None else temperature

        ids = self.encode_text(text) if isinstance(text, str) else np.asarray(text, np.int32)
        tx = pick_bucket(len(ids), cfg.text_buckets)
        x = np.zeros((1, tx), np.int32)
        x[0, : len(ids)] = ids
        x_len = np.array([len(ids)], np.int32)
        face_b = face if isinstance(face, jax.Array) else self.prepare_face(face)

        mu_x, w_ceil, x_mask, y_lengths, spk_e = self._encode_fn(tx)(
            self.params, jnp.asarray(x), jnp.asarray(x_len), face_b
        )
        frames = int(np.ceil(float(y_lengths[0])))
        ty = pick_bucket(frames, cfg.mel_buckets)
        _, dec, _, y_len = self._decode_fn(tx, ty, n_timesteps, temperature, stoc)(
            self.params, mu_x, w_ceil, x_mask, y_lengths, spk_e,
            jax.random.PRNGKey(seed),
        )
        n_frames = int(jax.device_get(y_len)[0])
        yield from self.stream_vocode(dec[:, :, :n_frames], chunk_frames)

    def synthesize_batch(
        self,
        texts: List,
        face,
        n_timesteps: Optional[int] = None,
        temperature: Optional[float] = None,
        stoc: bool = False,
        seed: int = 0,
    ) -> List[np.ndarray]:
        """Throughput mode: synthesize many utterances with ONE face in
        batched device dispatches (one per (tx, ty) bucket pair), amortizing
        the per-dispatch round trip and filling the MXU with batch work.

        Returns wavs in input order."""
        cfg = self.cfg
        n_timesteps = n_timesteps or cfg.timesteps
        temperature = cfg.temperature if temperature is None else temperature
        face_b = face if isinstance(face, jax.Array) else self.prepare_face(face)

        all_ids = [
            self.encode_text(t) if isinstance(t, str) else np.asarray(t, np.int32)
            for t in texts
        ]
        # encode everything in per-tx-bucket batches to learn mel lengths
        by_tx: dict = {}
        for i, ids in enumerate(all_ids):
            by_tx.setdefault(pick_bucket(len(ids), cfg.text_buckets), []).append(i)

        wavs: List[Optional[np.ndarray]] = [None] * len(texts)
        for tx, idxs in by_tx.items():
            b = len(idxs)
            bp = self._pad_rows(b)  # mesh: round up to a mesh-size multiple
            x = np.zeros((bp, tx), np.int32)
            x_len = np.zeros((bp,), np.int32)
            for r, i in enumerate(idxs):
                x[r, : len(all_ids[i])] = all_ids[i]
                x_len[r] = len(all_ids[i])
            for r in range(b, bp):  # well-formed padding: clone row 0
                x[r], x_len[r] = x[0], x_len[0]
            face_rep = (
                jnp.broadcast_to(face_b, (bp, *face_b.shape[1:]))  # on-device
                if self.mesh is None
                else np.broadcast_to(np.asarray(face_b), (bp, *face_b.shape[1:]))
            )
            mu_x, w_ceil, x_mask, y_lengths, spk_e = self._encode_fn(tx)(
                self.params, *self._place(x, x_len, face_rep)
            )
            frames = np.ceil(np.asarray(y_lengths)).astype(np.int32)
            # one decode dispatch per mel bucket within this tx bucket
            by_ty: dict = {}
            for r, i in enumerate(idxs):
                by_ty.setdefault(pick_bucket(int(frames[r]), cfg.mel_buckets), []).append(r)
            for ty, rows in by_ty.items():
                n_real = len(rows)
                rows = rows + rows[:1] * (self._pad_rows(n_real) - n_real)
                sel = jnp.asarray(np.asarray(rows, np.int32))
                rng = jax.random.PRNGKey(seed)
                wav, _, y_len = self._decode_vocode_fn(
                    tx, ty, n_timesteps, temperature, stoc
                )(
                    self.params, self.vocoder_params,
                    *self._place(
                        mu_x[sel], w_ceil[sel], x_mask[sel], y_lengths[sel],
                        spk_e[sel],
                    ),
                    rng,
                )
                wav, y_len = jax.device_get((wav, y_len))
                for k, r in enumerate(rows[:n_real]):
                    n = int(y_len[k]) * cfg.hop_len
                    wavs[idxs[r]] = np.clip(wav[k][:n], -1.0, 1.0)
        return wavs  # type: ignore[return-value]

    def synthesize_file(
        self, texts: List[str], face_path: str, out_dir: str, tag: str = "face", **kw
    ) -> List[str]:
        """Reference batch mode: list of sentences x one face -> wav files
        (inference.py:162-185 naming: {tag}_sample_{i}.wav)."""
        import os

        from facegantts_tpu.utils.audio import save_wav

        face = load_face(face_path, self.cfg.image_size)
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for i, text in enumerate(texts):
            wav, _ = self.synthesize(text, face, **kw)
            p = os.path.join(out_dir, f"{tag}_sample_{i}.wav")
            save_wav(p, wav, self.cfg.sample_rate)
            paths.append(p)
        return paths
