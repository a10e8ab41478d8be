"""Compare f32 vs bf16 inference latency and mel deviation."""

import time

import numpy as np

from facegantts_tpu.config import default_config
from facegantts_tpu.synthesis import Synthesizer, load_face
from facegantts_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    face_np = load_face("test/face.png")
    text = "The quick brown fox jumps over the lazy dog near the river bank."
    mel_f32 = None
    for bf16 in (0, 1):
        cfg = default_config(env={}, overrides={"use_bf16": bf16})
        s = Synthesizer(cfg)
        face = s.prepare_face(face_np)
        wav, mel = s.synthesize(text, face, seed=0)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            s.synthesize(text, face, seed=1, return_mel=False)
            times.append(time.perf_counter() - t0)
        print(f"bf16={bf16}: median {np.median(times)*1000:.1f} ms", flush=True)
        if bf16 == 0:
            mel_f32 = mel
        else:
            d = np.abs(mel - mel_f32)
            print(f"mel diff vs f32: mean {d.mean():.4f} max {d.max():.4f} "
                  f"(mel range ~[-11, 2])", flush=True)


if __name__ == "__main__":
    main()
