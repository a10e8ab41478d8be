"""Per-stage synthesis timing on the current default device."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from facegantts_tpu.config import default_config
from facegantts_tpu.synthesis import Synthesizer, load_face
from facegantts_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    cfg = default_config(env={})
    s = Synthesizer(cfg)
    face = load_face("test/face.png")
    text = "The quick brown fox jumps over the lazy dog near the river bank."
    t0 = time.perf_counter()
    s.synthesize(text, face)
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    from facegantts_tpu.synthesis import pick_bucket

    ids = s.encode_text(text)
    tx = pick_bucket(len(ids), cfg.text_buckets)
    x = np.zeros((1, tx), np.int32)
    x[0, : len(ids)] = ids
    xj, xl = jnp.asarray(x), jnp.asarray(np.array([len(ids)], np.int32))
    fb = jnp.asarray(face[None])

    enc = s._encode_fn(tx)
    out = jax.block_until_ready(enc(s.params, xj, xl, fb))
    t0 = time.perf_counter()
    for _ in range(20):
        out = enc(s.params, xj, xl, fb)
    jax.block_until_ready(out)
    print("encode: %.1f ms" % ((time.perf_counter() - t0) / 20 * 1000), flush=True)

    mu_x, w_ceil, x_mask, y_lengths, spk_e = out
    ty = 436
    dec = s._decode_fn(tx, ty, 10, 1.5, False)
    r = jax.random.PRNGKey(0)
    d = jax.block_until_ready(dec(s.params, mu_x, w_ceil, x_mask, y_lengths, spk_e, r))
    t0 = time.perf_counter()
    for _ in range(20):
        d = dec(s.params, mu_x, w_ceil, x_mask, y_lengths, spk_e, r)
    jax.block_until_ready(d)
    print("decode(10 steps): %.1f ms" % ((time.perf_counter() - t0) / 20 * 1000), flush=True)

    voc = s._vocode_fn(ty)
    w = jax.block_until_ready(voc(s.vocoder_params, d[1]))
    t0 = time.perf_counter()
    for _ in range(20):
        w = voc(s.vocoder_params, d[1])
    jax.block_until_ready(w)
    print("vocoder: %.1f ms" % ((time.perf_counter() - t0) / 20 * 1000), flush=True)

    t0 = time.perf_counter()
    for i in range(10):
        s.synthesize(text, face, seed=i)
    print("full synth: %.1f ms" % ((time.perf_counter() - t0) / 10 * 1000), flush=True)


if __name__ == "__main__":
    main()
