"""First-contact drill for the REAL external pretrained artifacts.

The four artifacts the reference depends on (facetts_lrs3.pt, syncnet_ckpt,
bshall hifigan-16k, utmos22_strong — facegantts_tpu/weights.py ARTIFACTS)
are unreachable on this air-gapped image, so their importers have only ever
ingested replica state_dicts.  This script makes the day the files arrive a
ONE-COMMAND validation instead of an integration project (VERDICT r4 next
#5): pin -> verify -> import -> the full reference inference recipe
(inference.py:47-79,119-133: T=10, temperature 1.5, length_scale 0.91 on
test/text.txt + test/face.png) -> objective evaluation -> a written report.

Usage:
  python scripts/first_contact.py facetts=<facetts_lrs3.pt> \
      hifigan=<hifigan16k.pt> [syncnet=<syncnet.pt>] [utmos=<utmos22.pt>] \
      [pin=1] [out=first_contact_out] [ground_truth_dir=<gt wavs>] \
      [any Config key=value override...]

- ``pin=1``: trust-on-first-use — record each file's SHA256 into
  assets/weight_pins.json before verifying (omit once pins are committed).
- With ``ground_truth_dir`` the full evaluation/evaluate.py protocol runs
  and eval_output.txt lands in <out>/evaluation; otherwise only MOS (with
  the utmos artifact if given) is scored on the synthesized wavs.
- Every run writes <out>/FIRST_CONTACT.md: artifact hashes, import stats,
  synthesis stats, metric results, and backend provenance.

Rehearsed end-to-end in CI with replica .pt files:
tests/test_first_contact.py.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT_KEYS = {"facetts": "facetts_lrs3", "syncnet": "syncnet",
                 "hifigan": "hifigan_16k", "utmos": "utmos22_strong"}


def _tree_stats(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    n = sum(int(np.prod(np.shape(l))) for l in leaves)
    return len(leaves), n


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    paths = {k: kv.pop(k) for k in list(ARTIFACT_KEYS) if k in kv}
    do_pin = kv.pop("pin", "0") == "1"
    out_dir = kv.pop("out", "first_contact_out")
    if "facetts" not in paths or "hifigan" not in paths:
        raise SystemExit(
            "need at least facetts=<path> and hifigan=<path> "
            f"(got {sorted(paths)}); see module docstring"
        )

    from facegantts_tpu import weights
    from facegantts_tpu.config import default_config

    cfg = default_config(overrides=kv)
    os.makedirs(out_dir, exist_ok=True)
    report = ["# First contact report", ""]
    t_start = time.time()

    # ---------------------------------------------------- 1. pin + verify
    digests = {}
    for short, path in paths.items():
        name = ARTIFACT_KEYS[short]
        if do_pin:
            d = weights.pin(name, path)
            print(f"pinned {name}: {d}")
        digests[name] = weights.verify(name, path)
        report.append(f"- `{name}`: `{paths[short]}` sha256 "
                      f"`{digests[name]}` [verified against pin]")
    report.append("")

    # ------------------------------------------------------- 2. importers
    from facegantts_tpu.train import checkpoint as ck

    params, batch_stats = ck.import_facetts(paths["facetts"])
    n_leaves, n_params = _tree_stats(params)
    print(f"facetts import: {n_leaves} leaves, {n_params/1e6:.2f} M params")
    report.append(f"- facetts import: {n_leaves} leaves, "
                  f"{n_params/1e6:.2f} M params (GAN/feature_extractor keys "
                  "stripped, strict=False semantics — reference "
                  "train.py:110-121)")

    if "syncnet" in paths:
        s_params, s_stats = weights.load_verified("syncnet", paths["syncnet"])
        params["syncnet"] = s_params
        batch_stats["syncnet"] = s_stats
        report.append("- syncnet: standalone ckpt OVERRODE the facetts "
                      "checkpoint's syncnet subtree (reference "
                      "syncnet_hifigan.py:87-99 name-matching load)")

    vocoder_params = weights.load_verified("hifigan_16k", paths["hifigan"])
    vn, vp = _tree_stats(vocoder_params)
    report.append(f"- hifigan import: {vn} leaves, {vp/1e6:.2f} M params "
                  "(weight norm folded)")

    mos_ckpt = paths.get("utmos", "")
    if mos_ckpt:
        weights.verify("utmos22_strong", mos_ckpt)
        cfg = cfg.replace(mos_ckpt=mos_ckpt)
        report.append("- utmos22_strong: wired as cfg.mos_ckpt")

    # -------------------------------------- 3. reference inference recipe
    from facegantts_tpu.synthesis import Synthesizer, load_face
    from facegantts_tpu.utils.audio import save_wav

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    synth = Synthesizer(cfg, params=variables, vocoder_params=vocoder_params)
    face = synth.prepare_face(load_face(cfg.test_faceimg))
    texts = [ln.strip() for ln in open(cfg.test_txt) if ln.strip()]
    wav_dir = os.path.join(out_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    t0 = time.time()
    total_audio = 0.0
    for i, text in enumerate(texts):
        wav, _ = synth.synthesize(text, face, seed=i)
        save_wav(os.path.join(wav_dir, f"utt_{i:03d}.wav"), wav,
                 cfg.sample_rate)
        total_audio += len(wav) / cfg.sample_rate
    synth_s = time.time() - t0
    line = (f"synthesized {len(texts)} utterances / {total_audio:.1f}s audio "
            f"in {synth_s:.1f}s (T={cfg.timesteps}, temperature="
            f"{cfg.temperature}, length_scale={cfg.length_scale})")
    print(line)
    report += ["", f"- {line}", f"- wavs: `{wav_dir}`"]

    # ------------------------------------------------------ 4. evaluation
    if cfg.ground_truth_dir:
        from facegantts_tpu.evaluation import metrics as M
        from facegantts_tpu.evaluation.evaluate import evaluate_pairs

        header = []
        results = evaluate_pairs(wav_dir, cfg.ground_truth_dir,
                                 cfg.replace(syncnet_ckpt=paths.get("syncnet")),
                                 header_out=header)
        eval_dir = os.path.join(out_dir, "evaluation")
        os.makedirs(eval_dir, exist_ok=True)
        text = M.format_eval_output(results)
        with open(os.path.join(eval_dir, "eval_output.txt"), "w") as f:
            f.write("".join(h + "\n" for h in header) + text)
        report += ["", "## Evaluation (full reference protocol)", "```"]
        report += header + [text.rstrip(), "```"]
    else:
        from facegantts_tpu.evaluation.utmos import make_mos_predictor
        from facegantts_tpu.utils.audio import load_wav

        mos = make_mos_predictor(cfg.mos_ckpt)
        scores = []
        for f in sorted(os.listdir(wav_dir)):
            wav, sr = load_wav(os.path.join(wav_dir, f))
            scores.append(float(mos(wav, sr)))
        line = (f"MOS ({type(mos).__name__}) over {len(scores)} wavs: "
                f"mean {np.mean(scores):.3f} min {np.min(scores):.3f}")
        print(line)
        report += ["", "## MOS only (no ground_truth_dir given)", f"- {line}"]

    report += ["", f"_total {time.time()-t_start:.1f}s_", ""]
    rp = os.path.join(out_dir, "FIRST_CONTACT.md")
    with open(rp, "w") as f:
        f.write("\n".join(report))
    print(f"report: {rp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
