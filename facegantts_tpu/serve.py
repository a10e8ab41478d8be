"""HTTP synthesis server: text (+ face) -> 16 kHz wav over the wire.

Production-serving front end for :class:`facegantts_tpu.synthesis.Synthesizer`
— the piece the reference leaves to offline scripts (its inference.py:22-185
only batch-writes wavs to disk).  Stdlib-only (http.server + json + wave):
nothing to install on a TPU host.

Design notes:
- One Synthesizer per process; its per-bucket compile cache, content-keyed
  duration LRU, and fused single-dispatch path were built for exactly this
  long-running use (synthesis.py).  Requests are served by a thread pool
  (ThreadingHTTPServer) but synthesis itself is serialized by a lock: the
  process drives ONE accelerator, and interleaving dispatches from Python
  threads only adds host contention on a 1-core host.
- ``warmup_buckets=1`` pre-compiles every (text, mel) bucket pair at
  startup so no user request pays a compile.
- Faces may be sent per request (base64 PNG/JPG) or default to the face
  configured with ``test_faceimg`` (the reference's custom-inference mode,
  reference config.py:154-158).

Endpoints:
  GET  /health            -> {"status": "ok", platform, requests, rtf}
  POST /synthesize        {"text": str, "face_b64"?: str, "n_timesteps"?,
                           "temperature"?, "seed"?} -> audio/wav bytes
                           (or JSON {"wav_b64", "sample_rate"} with
                           {"format": "json"})
  POST /synthesize_stream {"text": str, "face_b64"?, "chunk_frames"?, ...}
                          -> chunked-transfer raw s16le PCM (sample rate in
                          the X-Sample-Rate header); audio starts flowing
                          after one vocoder window instead of the full
                          utterance, and the byte stream is sample-exact
                          with /synthesize (Synthesizer.stream_vocode)
  POST /synthesize_batch  {"texts": [str], "face_b64"?, ...} ->
                           {"wavs_b64": [...], "sample_rate": N}

Usage:
  python serve.py port=8080 resume_from=<ckpt> vocoder_ckpt=<hifigan.pt> \
      test_faceimg=test/face.png [warmup_buckets=1] [serve_mesh=1]

``serve_mesh=1`` builds a data mesh over all local devices and shards
``/synthesize_batch`` dispatches across it (scale-out serving on a pod
slice; see Synthesizer's ``mesh`` parameter).
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from facegantts_tpu.config import Config, default_config, parse_cli_overrides


def wav_bytes(wav: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] -> RIFF/WAV int16 PCM bytes."""
    pcm = (np.clip(np.asarray(wav, np.float32), -1.0, 1.0) * 32767).astype(
        np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class SynthesisService:
    """Synthesizer + default face + serving stats behind one lock."""

    def __init__(self, cfg: Config, params=None, vocoder_params=None,
                 cmudict=None, default_face: Optional[np.ndarray] = None,
                 mesh=None):
        from facegantts_tpu.synthesis import Synthesizer

        self.cfg = cfg
        self.synth = Synthesizer(
            cfg, params=params, vocoder_params=vocoder_params,
            cmudict=cmudict, mesh=mesh,
        )
        if default_face is None:
            default_face = np.zeros((cfg.image_size, cfg.image_size, 3), np.float32)
        self.default_face = self.synth.prepare_face(default_face)
        self.lock = threading.Lock()
        self.requests = 0
        self.audio_seconds = 0.0
        self.busy_seconds = 0.0

    def decode_face(self, face_b64: Optional[str]):
        if not face_b64:
            return self.default_face
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(face_b64)))
        img = img.convert("RGB").resize(
            (self.cfg.image_size, self.cfg.image_size), Image.BILINEAR
        )
        # BGR 0..255, the SyncNet input convention (synthesis.load_face)
        face = np.asarray(img, np.float32)[..., ::-1].copy()
        return self.synth.prepare_face(face)

    def warmup(self) -> int:
        """Compile every (tx, ty) bucket pair (fused path) upfront."""
        from facegantts_tpu.synthesis import Synthesizer  # noqa: F401

        cfg = self.cfg
        n = 0
        for tx in cfg.text_buckets:
            for ty in cfg.mel_buckets:
                self.synth._synth_full_fn(
                    tx, ty, cfg.timesteps, cfg.temperature, False
                )
                n += 1
        return n

    def synthesize(self, text, face, **kw) -> np.ndarray:
        t0 = time.monotonic()
        with self.lock:
            wav, _ = self.synth.synthesize(text, face, return_mel=False, **kw)
        self.busy_seconds += time.monotonic() - t0
        self.requests += 1
        self.audio_seconds += len(wav) / self.cfg.sample_rate
        return wav

    def synthesize_streaming(self, text, face, chunk_frames: int = 64, **kw):
        """Yield float32 wav chunks under the service lock (generator is
        fully drained inside the lock: one accelerator, one dispatch
        stream)."""
        t0 = time.monotonic()
        total = 0
        with self.lock:
            for chunk in self.synth.synthesize_streaming(
                text, face, chunk_frames=chunk_frames, **kw
            ):
                total += len(chunk)
                yield chunk
        self.busy_seconds += time.monotonic() - t0
        self.requests += 1
        self.audio_seconds += total / self.cfg.sample_rate

    def synthesize_batch(self, texts, face, **kw):
        t0 = time.monotonic()
        with self.lock:
            wavs = self.synth.synthesize_batch(texts, face, **kw)
        self.busy_seconds += time.monotonic() - t0
        self.requests += len(texts)
        self.audio_seconds += sum(len(w) for w in wavs) / self.cfg.sample_rate
        return wavs

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "platform": jax.devices()[0].platform,
            "requests": self.requests,
            "audio_seconds": round(self.audio_seconds, 3),
            # serving-side RTF: busy time per generated audio second
            "rtf": round(self.busy_seconds / self.audio_seconds, 4)
            if self.audio_seconds
            else None,
        }


class _Handler(BaseHTTPRequestHandler):
    service: SynthesisService  # set by make_server
    # HTTP/1.1: required for Transfer-Encoding: chunked on
    # /synthesize_stream; every other endpoint sends Content-Length, so
    # keep-alive framing stays correct.
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("SERVE_VERBOSE"):
            super().log_message(fmt, *args)

    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            self._json(200, self.service.health())
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            return self._json(400, {"error": f"bad JSON: {e}"})
        try:
            if self.path == "/synthesize":
                return self._synthesize(req)
            if self.path == "/synthesize_stream":
                return self._synthesize_stream(req)
            if self.path == "/synthesize_batch":
                return self._synthesize_batch(req)
            return self._json(404, {"error": f"unknown path {self.path}"})
        except (KeyError, TypeError, ValueError) as e:
            return self._json(400, {"error": str(e)})

    @staticmethod
    def _sampling_kw(req: dict) -> dict:
        kw = {}
        if "n_timesteps" in req:
            kw["n_timesteps"] = int(req["n_timesteps"])
        if "temperature" in req:
            kw["temperature"] = float(req["temperature"])
        if "seed" in req:
            kw["seed"] = int(req["seed"])
        return kw

    def _synthesize(self, req: dict):
        text = req["text"]
        face = self.service.decode_face(req.get("face_b64"))
        wav = self.service.synthesize(text, face, **self._sampling_kw(req))
        sr = self.service.cfg.sample_rate
        if req.get("format") == "json":
            return self._json(
                200,
                {
                    "wav_b64": base64.b64encode(wav_bytes(wav, sr)).decode(),
                    "sample_rate": sr,
                    "seconds": round(len(wav) / sr, 3),
                },
            )
        body = wav_bytes(wav, sr)
        self.send_response(200)
        self.send_header("Content-Type", "audio/wav")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _synthesize_stream(self, req: dict):
        """Chunked-transfer streaming: raw little-endian int16 PCM mono,
        flushed chunk by chunk as the tiled vocoder emits audio (exact —
        the concatenation equals /synthesize's samples; see
        Synthesizer.stream_vocode).  Sample rate is in the X-Sample-Rate
        header; clients play as they read."""
        text = req["text"]
        face = self.service.decode_face(req.get("face_b64"))
        chunk_frames = int(req.get("chunk_frames", 64))
        gen = self.service.synthesize_streaming(
            text, face, chunk_frames=chunk_frames, **self._sampling_kw(req)
        )
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("X-Sample-Rate", str(self.service.cfg.sample_rate))
        self.send_header("X-PCM-Format", "s16le")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        try:
            for chunk in gen:
                pcm = (np.clip(chunk, -1.0, 1.0) * 32767).astype("<i2").tobytes()
                self.wfile.write(f"{len(pcm):x}\r\n".encode())
                self.wfile.write(pcm)
                self.wfile.write(b"\r\n")
                self.wfile.flush()
            self.wfile.write(b"0\r\n\r\n")
        finally:
            # client disconnect mid-stream: release the service lock now,
            # not at GC time
            gen.close()

    def _synthesize_batch(self, req: dict):
        texts = req["texts"]
        if not isinstance(texts, list) or not texts:
            raise ValueError("texts must be a non-empty list")
        face = self.service.decode_face(req.get("face_b64"))
        wavs = self.service.synthesize_batch(texts, face, **self._sampling_kw(req))
        sr = self.service.cfg.sample_rate
        return self._json(
            200,
            {
                "wavs_b64": [
                    base64.b64encode(wav_bytes(w, sr)).decode() for w in wavs
                ],
                "sample_rate": sr,
            },
        )


def make_server(service: SynthesisService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    host = overrides.pop("host", "0.0.0.0")
    port = int(overrides.pop("port", 8080))
    warmup = int(overrides.pop("warmup_buckets", 0))
    use_mesh = int(overrides.pop("serve_mesh", 0))
    vocoder_ckpt = overrides.pop("vocoder_ckpt", "")
    cfg = default_config(overrides=overrides)

    from facegantts_tpu.synthesis import load_face
    from facegantts_tpu.text.cmudict import default_cmudict
    from facegantts_tpu.train import checkpoint as ck

    params = None
    if cfg.resume_from and os.path.exists(cfg.resume_from):
        print(f"######## Loading checkpoint from {cfg.resume_from}")
        if os.path.isdir(cfg.resume_from):
            params = ck.restore_generator_variables(cfg.resume_from)
        else:
            p, stats = ck.import_facetts(cfg.resume_from)
            params = {"params": p, "batch_stats": stats}
    vocoder_params = ck.import_hifigan(vocoder_ckpt) if vocoder_ckpt else None
    cmu = default_cmudict(cfg.cmudict_path)
    face = (
        load_face(cfg.test_faceimg, cfg.image_size)
        if os.path.exists(cfg.test_faceimg)
        else None
    )

    mesh = None
    if use_mesh:
        from facegantts_tpu.parallel import create_mesh

        mesh = create_mesh()  # batch endpoints shard over all local chips
        print(f"######## Data-parallel serving over {mesh.size} devices")
    service = SynthesisService(
        cfg, params=params, vocoder_params=vocoder_params, cmudict=cmu,
        default_face=face, mesh=mesh,
    )
    if warmup:
        n = service.warmup()
        print(f"######## Warmed {n} bucket programs")
    server = make_server(service, host, port)
    print(f"######## Serving on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
