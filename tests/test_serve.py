"""HTTP serving tests (facegantts_tpu/serve.py): health, single and batch
synthesis over a live socket, per-request faces, JSON format, error paths,
and serving stats."""

import base64
import http.client
import io
import json
import threading
import wave

import numpy as np
import pytest

from facegantts_tpu.config import default_config
from facegantts_tpu.serve import SynthesisService, make_server, wav_bytes
from tests.test_train import TINY


# slow tier: each test compiles full synthesis programs (~75 s setup on this host)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    # use_bf16=0: the streaming-parity test below asserts 1-LSB agreement
    # between /synthesize and /synthesize_stream, which needs both paths
    # on the f32 pipeline (bf16 tiling parity is covered, with a looser
    # tolerance, in tests/test_synthesis.py)
    cfg = default_config(env=dict(TINY, use_gan="0", use_bf16="0", spk_emb="face")).replace(
        text_buckets=(16,), mel_buckets=(64,),
    )
    service = SynthesisService(cfg)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service
    srv.shutdown()
    srv.server_close()


def _request(srv, method, path, body=None):
    conn = http.client.HTTPConnection(*srv.server_address)
    conn.request(
        method, path,
        body=json.dumps(body) if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def _parse_wav(data: bytes):
    with wave.open(io.BytesIO(data), "rb") as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        return w.getframerate(), np.frombuffer(
            w.readframes(w.getnframes()), np.int16
        )


def test_health(server):
    srv, service = server
    resp, data = _request(srv, "GET", "/health")
    assert resp.status == 200
    h = json.loads(data)
    assert h["status"] == "ok" and "platform" in h


def test_synthesize_wav_response(server):
    srv, service = server
    before = service.requests
    resp, data = _request(srv, "POST", "/synthesize", {"text": "hello world"})
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "audio/wav"
    sr, pcm = _parse_wav(data)
    assert sr == service.cfg.sample_rate
    assert len(pcm) > 0 and len(pcm) % service.cfg.hop_len == 0
    assert service.requests == before + 1
    h = json.loads(_request(srv, "GET", "/health")[1])
    assert h["requests"] >= 1 and h["audio_seconds"] > 0 and h["rtf"] > 0


def test_synthesize_json_format_and_determinism(server):
    srv, _ = server
    req = {"text": "hello world", "format": "json", "seed": 7}
    r1 = json.loads(_request(srv, "POST", "/synthesize", req)[1])
    r2 = json.loads(_request(srv, "POST", "/synthesize", req)[1])
    assert r1["sample_rate"] == r2["sample_rate"]
    assert r1["wav_b64"] == r2["wav_b64"]  # same seed -> same audio
    _, pcm = _parse_wav(base64.b64decode(r1["wav_b64"]))
    assert abs(len(pcm) / r1["sample_rate"] - r1["seconds"]) < 0.01


def test_per_request_face(server):
    srv, _ = server
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.full((64, 64, 3), 128, np.uint8)
    ).save(buf, format="PNG")
    face_b64 = base64.b64encode(buf.getvalue()).decode()
    base = {"text": "hello world", "format": "json", "seed": 0}
    with_face = json.loads(
        _request(srv, "POST", "/synthesize", dict(base, face_b64=face_b64))[1]
    )
    without = json.loads(_request(srv, "POST", "/synthesize", base)[1])
    # a different face conditions the speaker embedding -> different audio
    assert with_face["wav_b64"] != without["wav_b64"]


def test_synthesize_batch(server):
    srv, service = server
    resp, data = _request(
        srv, "POST", "/synthesize_batch",
        {"texts": ["hello world", "a much longer test sentence"]},
    )
    assert resp.status == 200
    out = json.loads(data)
    assert len(out["wavs_b64"]) == 2
    for b in out["wavs_b64"]:
        sr, pcm = _parse_wav(base64.b64decode(b))
        assert sr == service.cfg.sample_rate and len(pcm) > 0


def test_error_paths(server):
    srv, _ = server
    resp, data = _request(srv, "POST", "/synthesize", {})  # missing text
    assert resp.status == 400
    resp, _ = _request(srv, "GET", "/nope")
    assert resp.status == 404
    resp, _ = _request(srv, "POST", "/synthesize_batch", {"texts": []})
    assert resp.status == 400
    # malformed JSON body
    conn = http.client.HTTPConnection(*srv.server_address)
    conn.request("POST", "/synthesize", body="{not json",
                 headers={"Content-Type": "application/json"})
    assert conn.getresponse().status == 400
    conn.close()


def test_warmup_compiles_all_buckets(server):
    srv, service = server
    assert service.warmup() == len(service.cfg.text_buckets) * len(
        service.cfg.mel_buckets
    )


def test_wav_bytes_roundtrip():
    y = np.sin(np.linspace(0, 40 * np.pi, 1600)).astype(np.float32) * 0.5
    sr, pcm = _parse_wav(wav_bytes(y, 16000))
    assert sr == 16000 and len(pcm) == 1600
    np.testing.assert_allclose(pcm / 32767.0, y, atol=1e-3)


def test_synthesize_stream_matches_synthesize(server):
    srv, service = server
    body = {"text": "hello world", "seed": 7}
    resp, data = _request(srv, "POST", "/synthesize", body)
    assert resp.status == 200
    sr, ref_pcm = _parse_wav(data)

    resp, data = _request(srv, "POST", "/synthesize_stream",
                          {**body, "chunk_frames": 16})
    assert resp.status == 200
    assert resp.getheader("X-Sample-Rate") == str(sr)
    assert resp.getheader("X-PCM-Format") == "s16le"
    got = np.frombuffer(data, "<i2")  # http.client de-chunks for us

    m = service.synth.vocoder.margin_frames() * service.cfg.hop_len
    assert len(got) == len(ref_pcm)
    # exact away from /synthesize's bucket-padding tail; |diff| <= 1 LSB
    # from independent float->int16 rounding of equal-up-to-eps floats
    assert np.abs(got[:-m].astype(np.int32)
                  - ref_pcm[:-m].astype(np.int32)).max() <= 1
