"""Ahead-of-time model export: self-contained StableHLO synthesis programs.

Serializes the fully fused text+face -> (wav, mel, y_len) program — weights
baked in as constants — via ``jax.export`` so serving hosts need only JAX
(any version understanding the stable calling convention) plus these
artifacts: no model code, no checkpoint imports, no Python tracing at
startup.  One program per (text, mel) bucket pair, same static-shape
strategy as live serving (synthesis.Synthesizer), plus a manifest
describing shapes and sampling settings.

The reference has no deployment story beyond running inference.py from the
repo (reference inference.py:22-185); this is the TPU-native equivalent of
an inference engine's compiled model bundle.

Usage:
  python -m facegantts_tpu.export out_dir=exported/ \
      [resume_from=<ckpt>] [vocoder_ckpt=<hifigan.pt>] [platforms=tpu] \
      [key=value config overrides]

Load side:  ``load_bundle(out_dir)`` -> {(tx, ty): callable}, each
``fn(x, x_len, face, seed) -> (wav, mel, y_len)``.
"""

import json
import os
import sys
from typing import Dict, Optional, Tuple

import numpy as np

MANIFEST = "manifest.json"


def export_bundle(synth, out_dir: str, platforms: Optional[Tuple[str, ...]] = None,
                  n_timesteps: Optional[int] = None,
                  temperature: Optional[float] = None) -> Dict:
    """Export every (tx, ty) bucket pair of a Synthesizer to ``out_dir``.

    Weights (generator + vocoder) are captured as constants; the exported
    signature is ``(x (1,tx) i32, x_len (1,) i32, face (1,224,224,3) f32,
    seed () i32)``."""
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    cfg = synth.cfg
    n_timesteps = n_timesteps or cfg.timesteps
    temperature = cfg.temperature if temperature is None else temperature
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    for tx in cfg.text_buckets:
        for ty in cfg.mel_buckets:
            fused = synth._synth_full_fn(tx, ty, n_timesteps, temperature, False)
            params, voc = synth.params, synth.vocoder_params

            def fn(x, x_len, face, seed):
                rng = jax.random.PRNGKey(seed)
                return fused(params, voc, x, x_len, face, rng)

            args = (
                jax.ShapeDtypeStruct((1, tx), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            exp = jex.export(jax.jit(fn), platforms=platforms)(*args)
            name = f"synth_tx{tx}_ty{ty}.jaxexp"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize())
            entries.append({"tx": tx, "ty": ty, "file": name,
                            "platforms": list(exp.platforms)})
            print(f"exported ({tx}, {ty}) -> {name} "
                  f"[{', '.join(exp.platforms)}]")
    manifest = {
        "entries": entries,
        "n_timesteps": n_timesteps,
        "temperature": temperature,
        "length_scale": cfg.length_scale,
        "sample_rate": cfg.sample_rate,
        "hop_len": cfg.hop_len,
        "n_mels": cfg.n_mels,
        "add_blank": bool(cfg.add_blank),
        "signature": "fn(x(1,tx) i32, x_len(1,) i32, face(1,224,224,3) f32 "
                     "BGR 0..255, seed() i32) -> (wav, mel, y_len)",
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_bundle(out_dir: str) -> Tuple[Dict, Dict]:
    """(manifest, {(tx, ty): callable}) from an exported bundle."""
    from jax import export as jex

    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    fns = {}
    for e in manifest["entries"]:
        with open(os.path.join(out_dir, e["file"]), "rb") as f:
            exp = jex.deserialize(f.read())
        fns[(e["tx"], e["ty"])] = exp.call
    return manifest, fns


def main(argv=None):
    from facegantts_tpu.config import default_config, parse_cli_overrides
    from facegantts_tpu.synthesis import Synthesizer

    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    out_dir = overrides.pop("out_dir", "exported")
    platforms = overrides.pop("platforms", "")
    vocoder_ckpt = overrides.pop("vocoder_ckpt", "")
    cfg = default_config(overrides=overrides)

    params = vocoder_params = None
    if cfg.resume_from and os.path.exists(cfg.resume_from):
        from facegantts_tpu.train import checkpoint as ck

        if os.path.isdir(cfg.resume_from):
            params = ck.restore_generator_variables(cfg.resume_from)
        else:
            p, stats = ck.import_facetts(cfg.resume_from)
            params = {"params": p, "batch_stats": stats}
    if vocoder_ckpt:
        from facegantts_tpu.train import checkpoint as ck

        vocoder_params = ck.import_hifigan(vocoder_ckpt)
    synth = Synthesizer(cfg, params=params, vocoder_params=vocoder_params)
    export_bundle(
        synth, out_dir,
        platforms=tuple(platforms.split(",")) if platforms else None,
    )
    print(f"bundle written to {out_dir}")


if __name__ == "__main__":
    main()
