"""Regenerate tests/golden/e2e_golden.npz — the committed torch-produced
end-to-end parity artifact (see tests/test_e2e_parity.py).

Builds the full torch replica of the reference pipeline
(tests/torch_replica.py) at the reduced-width DIMS from the parity test,
runs the exact reference inference recipe (T=10, temperature 1.5,
length_scale 0.91 — /root/reference/inference.py:125-133), and stores:

- ``sd:<key>``: the encoder.* / decoder.estimator.* state_dict arrays
  (the multi-MB syncnet trunk is NOT stored; its import parity is covered
  by tests/test_import.py — instead the computed speaker EMBEDDING is)
- ``x``, ``x_len``, ``spk``, ``noise``: the shared inputs
- ``mel``, ``y_lengths``: the torch pipeline's output

Usage:  python scripts/make_e2e_golden.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_e2e_parity import (  # noqa: E402
    GOLDEN, RECIPE, Y_MAX, _inputs, _stable_torch_replica,
)
from tests.torch_replica import torch_inference  # noqa: E402


def main():
    tmodel = _stable_torch_replica()
    x, x_len, face, noise = _inputs()
    mel, y_lengths, spk = torch_inference(
        tmodel, torch.from_numpy(x).long(), torch.from_numpy(x_len).long(),
        torch.from_numpy(face).permute(0, 3, 1, 2).contiguous(),
        RECIPE["n_timesteps"], Y_MAX, RECIPE["temperature"],
        RECIPE["length_scale"], noise,
    )
    mel = np.asarray(mel, np.float32)
    assert np.isfinite(mel).all(), (
        "torch replica produced a non-finite mel — the reverse ODE blew up; "
        "lower tests.test_e2e_parity.EST_SCALE and retry")
    payload = {
        "x": x, "x_len": x_len, "spk": spk.astype(np.float32),
        "noise": noise, "mel": mel,
        "y_lengths": y_lengths,
    }
    for k, v in tmodel.state_dict().items():
        if k.startswith(("encoder.", "decoder.estimator.")):
            payload[f"sd:{k}"] = v.detach().cpu().numpy()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **payload)
    size = os.path.getsize(GOLDEN) / 1e6
    print(f"wrote {GOLDEN} ({size:.2f} MB, y_lengths={y_lengths.tolist()})")


if __name__ == "__main__":
    main()
