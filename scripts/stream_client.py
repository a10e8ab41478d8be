#!/usr/bin/env python
"""Minimal /synthesize_stream client: plays chunks as they arrive (or saves
to a wav), printing time-to-first-audio — the metric the streaming endpoint
exists to minimize.

Usage:
  python scripts/stream_client.py host=127.0.0.1 port=8080 \
      text="hello world" [out=stream.wav] [chunk_frames=64] [face=path.png]
"""

import base64
import http.client
import json
import sys
import time
import wave


def main(argv=None):
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    host, port = kv.get("host", "127.0.0.1"), int(kv.get("port", "8080"))
    body = {"text": kv.get("text", "hello world"),
            "chunk_frames": int(kv.get("chunk_frames", "64"))}
    if "seed" in kv:
        body["seed"] = int(kv["seed"])
    if "face" in kv:
        body["face_b64"] = base64.b64encode(open(kv["face"], "rb").read()).decode()

    conn = http.client.HTTPConnection(host, port)
    t0 = time.monotonic()
    conn.request("POST", "/synthesize_stream", body=json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200, resp.read()[:500]
    sr = int(resp.getheader("X-Sample-Rate", "16000"))

    pcm, first = b"", None
    while True:
        chunk = resp.read(4096)
        if not chunk:
            break
        if first is None:
            first = time.monotonic() - t0
            print(f"first audio after {first*1000:.0f} ms")
        pcm += chunk
    total = time.monotonic() - t0
    secs = len(pcm) / 2 / sr
    print(f"{secs:.2f}s audio in {total*1000:.0f} ms "
          f"(RTF {total/max(secs,1e-9):.3f}, TTFA {first*1000:.0f} ms)")

    out = kv.get("out", "stream.wav")
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
