"""CI smoke test for scripts/parity_check.py (the end-to-end
reference-parity harness, BASELINE.md north-star 3): drives the script
with replica weights in an orbax checkpoint, verifies the self-parity
pass, and that a perturbed reference trips the tolerance gate."""

import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "n_enc_channels=16", "filter_channels=32", "filter_channels_dp=16",
    "n_enc_layers=1", "dec_dim=8", "vid_emb_dim=32", "timesteps=2",
]


# slow tier: subprocess runs re-compile the synthesis pipeline (~110 s)
pytestmark = pytest.mark.slow


def _run_script(args):
    argv_backup = sys.argv[:]
    sys.argv = ["parity_check.py"] + args
    try:
        runpy.run_path(os.path.join(REPO, "scripts", "parity_check.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv_backup


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Tiny-model TrainState in an orbax dir (replica weights)."""
    import jax
    import jax.numpy as jnp

    from facegantts_tpu.config import default_config
    from facegantts_tpu.train import Batch, checkpoint as ck, init_state

    cfg = default_config(env={k.split("=")[0]: k.split("=")[1] for k in TINY})
    rng = np.random.default_rng(0)
    batch = Batch(
        x=jnp.asarray(rng.integers(1, 100, (1, 8)), jnp.int32),
        x_len=jnp.asarray([8], jnp.int32),
        y=jnp.asarray(rng.standard_normal((1, cfg.n_mels, 32)), jnp.float32),
        y_len=jnp.asarray([32], jnp.int32),
        spk=jnp.asarray(rng.standard_normal((1, 224, 224, 3)) * 0.1, jnp.float32),
    )
    state = init_state(cfg.replace(use_gan=0), jax.random.PRNGKey(0), batch)
    d = str(tmp_path_factory.mktemp("parity") / "ckpt")
    ck.save_checkpoint(d, state, step=1, keep=1)
    return d


def test_parity_check_self_and_gate(tiny_ckpt, tmp_path):
    txt = tmp_path / "text.txt"
    txt.write_text("hello world\n")
    out_a = str(tmp_path / "run_a")
    common = TINY + [
        f"resume_from={tiny_ckpt}",
        f"test_txt={txt}",
        f"test_faceimg={os.path.join(REPO, 'test', 'face.png')}",
    ]

    # 1) produce outputs (no ref_dir)
    _run_script(common + [f"output_dir={out_a}"])
    assert os.path.exists(os.path.join(out_a, "sample_0.npy"))
    assert os.path.exists(os.path.join(out_a, "sample_0.wav"))

    # 2) self-parity: same seed, same weights -> identical mels
    out_b = str(tmp_path / "run_b")
    _run_script(common + [f"output_dir={out_b}", f"ref_dir={out_a}", "tol=1e-6"])

    # 3) a perturbed reference must trip the gate
    bad = tmp_path / "bad_ref"
    bad.mkdir()
    mel = np.load(os.path.join(out_a, "sample_0.npy"))
    np.save(str(bad / "sample_0.npy"), mel + 3.0)
    with pytest.raises(SystemExit, match="parity FAILED"):
        _run_script(common + [f"output_dir={str(tmp_path / 'run_c')}",
                              f"ref_dir={bad}", "tol=1.0"])
