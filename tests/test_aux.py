"""Tests for the auxiliary subsystems added for SURVEY §2/§5 parity:
MOS prediction (UTMOS surface), checkpoint migration, LRS2 preparation
suite, CFD face cropping, and profiling hooks."""

import os
import wave

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# MOS prediction (evaluation/utmos.py)
# ---------------------------------------------------------------------------

def _tone(sr=16000, secs=1.0, f0=150.0, harmonics=8):
    t = np.arange(int(sr * secs)) / sr
    w = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, harmonics + 1))
    return (0.5 * w / np.max(np.abs(w))).astype(np.float32)


def test_dsp_mos_orders_degradations():
    from facegantts_tpu.evaluation.utmos import DSPMOSPredictor

    sr = 16000
    mos = DSPMOSPredictor()
    clean = _tone(sr)
    noise = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.5
    clipped = np.clip(clean * 8.0, -1.0, 1.0)
    s_clean, s_noise, s_clip = mos(clean, sr), mos(noise, sr), mos(clipped, sr)
    assert 1.0 <= s_noise < s_clean <= 5.0
    assert s_clip < s_clean
    # deterministic
    assert mos(clean, sr) == s_clean


def test_mos_features_ranges():
    from facegantts_tpu.evaluation.utmos import mos_features

    f = mos_features(_tone(), 16000)
    assert set(f) == {"clarity", "clipping", "flatness", "silence", "bandwidth"}
    assert all(0.0 <= v <= 1.0 for v in f.values()), f
    # silence-only input
    z = mos_features(np.zeros(16000, np.float32), 16000)
    assert z["silence"] >= 0.0


def test_mos_factory_fallback(tmp_path):
    from facegantts_tpu.evaluation.utmos import (
        DSPMOSPredictor, LinearHeadMOSPredictor, make_mos_predictor,
    )

    assert isinstance(make_mos_predictor(None), DSPMOSPredictor)
    assert isinstance(make_mos_predictor(str(tmp_path / "missing.pt")), DSPMOSPredictor)

    torch = pytest.importorskip("torch")
    ckpt = tmp_path / "head.pt"
    torch.save({"head.weight": torch.ones(1, 5), "head.bias": torch.zeros(1)}, str(ckpt))
    p = make_mos_predictor(str(ckpt))
    assert isinstance(p, LinearHeadMOSPredictor)
    score = p(_tone(), 16000)
    assert 1.0 <= score <= 5.0


# ---------------------------------------------------------------------------
# checkpoint migration (migrate_checkpoint.py)
# ---------------------------------------------------------------------------

def test_fix_lightning_version(tmp_path):
    torch = pytest.importorskip("torch")
    from facegantts_tpu.migrate_checkpoint import fix_lightning_version

    src, dst = tmp_path / "old.ckpt", tmp_path / "new.ckpt"
    torch.save({"state_dict": {}}, str(src))
    fix_lightning_version(str(src), str(dst))
    out = torch.load(str(dst), weights_only=False)
    assert "pytorch-lightning_version" in out


# ---------------------------------------------------------------------------
# LRS2 preparation suite (data/lrs2_prep.py)
# ---------------------------------------------------------------------------

def _write_wav(path, secs, sr=16000):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(str(path), "w") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.zeros(int(sr * secs), np.int16).tobytes())


def test_media_duration_wav(tmp_path):
    from facegantts_tpu.data.lrs2_prep import media_duration

    p = tmp_path / "a.wav"
    _write_wav(p, 2.0)
    assert abs(media_duration(str(p)) - 2.0) < 1e-6
    assert media_duration(str(tmp_path / "missing.wav")) == 0.0


def test_load_mapping_and_filelist(tmp_path):
    from facegantts_tpu.data.lrs2_prep import load_filelist, load_mapping

    m = tmp_path / "map.txt"
    m.write_text(
        "PROCESSED: a/b/6330311066473698535/00011.mp4 -> "
        "out/spk00001/00011.mp4 | conf=0.9\n"
        "FAILED: x/y.mp4 -> nothing\n"
    )
    mapping = load_mapping(str(m))
    assert mapping == {"6330311066473698535/00011": "spk00001/00011"}

    fl = tmp_path / "list.txt"
    fl.write_text("6330311066473698535/00011 extra-field\nspkA/00001\n")
    assert load_filelist(str(fl)) == {"6330311066473698535/00011", "spkA/00001"}


def test_filelists_count_check(tmp_path):
    from facegantts_tpu.data.lrs2_prep import (
        check_format, count_speakers, write_filelists,
    )

    root = tmp_path / "lrs2"
    for split, spk, clip in [("train", "s1", "c1"), ("train", "s1", "c2"),
                             ("train", "s2", "c1"), ("val", "s3", "c1")]:
        p = root / "mp4" / split / spk / f"{clip}.mp4"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"")
    counts = write_filelists(str(root))
    assert counts["train"] == 3 and counts["val"] == 1 and counts["test"] == 0
    listed = (root / "datalist" / "lrs2_train_long.list").read_text().split()
    assert listed == ["s1/c1", "s1/c2", "s2/c1"]

    sc = count_speakers(str(root))
    assert sc["train"] == (2, 3) and sc["val"] == (1, 1)

    # empty unmatched dirs -> clean check
    (root / "unmatched" / "too_short").mkdir(parents=True)
    assert check_format(str(root)) == []
    # a long clip placed in too_short must be flagged (wav stands in for mp4
    # duration via the unified media_duration; mp4-named empty file reads 0s,
    # so craft the violation through a missing transcript instead)
    (root / "unmatched" / "too_short" / "sX_c9.mp4").write_bytes(b"")
    errors = check_format(str(root))
    assert any("missing txt" in e for e in errors)


def test_speaker_matching_logic():
    from facegantts_tpu.data.lrs2_prep import match_speaker, weighted_mean_embedding

    rng = np.random.default_rng(0)
    a = rng.standard_normal(64)
    a /= np.linalg.norm(a)
    b = rng.standard_normal(64)
    b /= np.linalg.norm(b)

    # weighted mean favors the higher-quality crop
    m = weighted_mean_embedding(np.stack([a, b]), [100.0, 1.0])
    assert m @ a > m @ b
    assert weighted_mean_embedding(np.zeros((0, 64)), []) is None

    # same embedding matches, orthogonal one doesn't
    sid, d = match_speaker([a], a)
    assert sid == 0 and d < 0.05
    sid, _ = match_speaker([a], b)
    assert sid == -1
    assert match_speaker([], a) == (-1, float("inf"))


def test_blur_score_orders_sharpness():
    from facegantts_tpu.data.lrs2_prep import laplacian_blur_score

    rng = np.random.default_rng(0)
    sharp = rng.integers(0, 255, (64, 64)).astype(np.float64)
    blurred = np.full((64, 64), 128.0)
    assert laplacian_blur_score(sharp) > laplacian_blur_score(blurred)


# ---------------------------------------------------------------------------
# CFD face cropping (data/cfd_crop.py)
# ---------------------------------------------------------------------------

def test_cfd_crop_fallback(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from facegantts_tpu.data.cfd_crop import (
        center_square_crop, crop_faces, process_dir, thumbnail,
    )

    img = np.random.default_rng(0).integers(0, 255, (600, 800, 3)).astype(np.uint8)
    th = thumbnail(img, 500)
    assert max(th.shape[:2]) == 500
    sq = center_square_crop(img)
    assert sq.shape[0] == sq.shape[1] == 600

    src = tmp_path / "src"
    src.mkdir()
    cv2.imwrite(str(src / "noise.jpg"), img)
    # noise has no face: strict finds nothing, fallback center-crops
    assert crop_faces(str(src / "noise.jpg"), strict=True) == []
    n = process_dir(str(src), str(tmp_path / "out"), size=224)
    assert n == 1
    out = cv2.imread(str(tmp_path / "out" / "noise_face0.png"))
    assert out.shape == (224, 224, 3)


# ---------------------------------------------------------------------------
# profiling (utils/profiling.py)
# ---------------------------------------------------------------------------

def test_step_timer_stats():
    from facegantts_tpu.utils.profiling import StepTimer

    t = StepTimer(window=8)
    assert t.stats() == {}
    for _ in range(3):
        t.tic()
        t.toc()
    s = t.stats()
    assert s["step_time_median_s"] >= 0.0
    assert s["steps_per_sec"] > 0.0


def test_step_profiler_noop_and_window(tmp_path):
    from facegantts_tpu.utils.profiling import StepProfiler

    # disabled: no dir
    p = StepProfiler("", 0, 5)
    for i in range(10):
        p.step(i)
    p.close()

    # enabled: must create a trace dump without crashing
    d = str(tmp_path / "trace")
    p = StepProfiler(d, 1, 1)
    import jax
    import jax.numpy as jnp

    for i in range(3):
        p.step(i)
        jnp.square(jnp.ones(8)).block_until_ready()
    p.close()
    assert os.path.isdir(d) and os.listdir(d)


# ---------------------------------------------------------------------------
# hyperopt CEM mode (hyperopt.py)
# ---------------------------------------------------------------------------

def test_cem_converges_on_quadratic(tmp_path):
    from facegantts_tpu.hyperopt import cem_search

    target = 3e-4

    def fake_run(params, work_dir):
        return (np.log(params["learning_rate"]) - np.log(target)) ** 2

    spec = {"learning_rate": {"min": 1e-6, "max": 1e-1, "log": True},
            "loss_type": {"choices": ["hinge", "mse"]}}
    results = cem_search(spec, {}, str(tmp_path), generations=5,
                         population=12, seed=0, run=fake_run)
    best = min(results, key=lambda r: r["composite"])
    # CEM should land within ~3x of the optimum in log-space
    assert abs(np.log(best["params"]["learning_rate"]) - np.log(target)) < 1.2
    assert os.path.exists(tmp_path / "results.json")
    # later generations concentrate near the optimum
    last_gen = [r for r in results if r["generation"] == 4]
    assert np.median([r["composite"] for r in last_gen]) < 4.0


# ---------------------------------------------------------------------------
# orbax checkpoint round-trip (train/checkpoint.py)
# ---------------------------------------------------------------------------

def test_orbax_roundtrip_and_generator_restore(tmp_path):
    import jax
    import jax.numpy as jnp

    from facegantts_tpu.train import checkpoint as ck
    from facegantts_tpu.train.state import TrainState

    state = TrainState(
        step=jnp.asarray(5, jnp.int32),
        params={"encoder": {"w": jnp.arange(4.0)}},
        opt_state={"mu": {"encoder": {"w": jnp.zeros(4)}}},
        model_state={"batch_stats": {"syncnet": {"m": jnp.ones(2)}}},
    )
    d = str(tmp_path / "ckpt")
    ck.save_checkpoint(d, state, step=5, keep=2)

    target = jax.tree.map(np.zeros_like, state)
    restored = ck.restore_checkpoint(d, target)
    assert int(restored.step) == 5
    np.testing.assert_allclose(restored.params["encoder"]["w"], np.arange(4.0))

    # inference-side restore: no target pytree required
    variables = ck.restore_generator_variables(d)
    np.testing.assert_allclose(variables["params"]["encoder"]["w"], np.arange(4.0))
    np.testing.assert_allclose(variables["batch_stats"]["syncnet"]["m"], np.ones(2))


def test_orbax_roundtrip_fsdp_sharded_state(tmp_path):
    """cfg.fsdp=1 states hold SHARDED jax.Arrays (parallel/mesh.py
    fsdp_spec); orbax must save them (gathering across the mesh) and the
    resume path (train/loop.py warm_start -> restore to a host template ->
    shard_state(fsdp=True)) must reproduce the exact values and layout."""
    import jax
    import jax.numpy as jnp

    from facegantts_tpu.parallel import shard_state
    from facegantts_tpu.parallel.mesh import create_mesh
    from facegantts_tpu.train import checkpoint as ck
    from facegantts_tpu.train.state import TrainState

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs virtual CPU devices")
    mesh = create_mesh(cpus[:4])

    host = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.arange(32.0).reshape(8, 4), "b": jnp.ones(3)},
        opt_state={"mu": {"w": jnp.full((8, 4), 0.5), "b": jnp.zeros(3)}},
        model_state={},
    )
    sharded = shard_state(mesh, host, fsdp=True)
    assert not sharded.params["w"].sharding.is_fully_replicated

    d = str(tmp_path / "ckpt")
    ck.save_checkpoint(d, sharded, step=7, keep=1)

    # resume: restore into a HOST template (as warm_start does), then re-shard
    target = jax.tree.map(np.zeros_like, host)
    restored = ck.restore_checkpoint(d, target)
    assert int(restored.step) == 7
    np.testing.assert_allclose(restored.params["w"], np.arange(32.0).reshape(8, 4))
    np.testing.assert_allclose(restored.opt_state["mu"]["w"], np.full((8, 4), 0.5))
    resharded = shard_state(mesh, restored, fsdp=True)
    assert not resharded.params["w"].sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(resharded.params["w"]),
                               np.arange(32.0).reshape(8, 4))


def test_checkpoint_policy_metric_ranked_eviction(tmp_path):
    """Top-k retention evicts the WORST checkpoint by metric, not the
    oldest (reference ModelCheckpoint save_top_k=3 on val/total_loss,
    train.py:48-60), keeps epoch snapshots, and names the best
    (custom_callbacks.py:110-163,288-304)."""
    import jax.numpy as jnp

    from facegantts_tpu.train import checkpoint as ck
    from facegantts_tpu.train.state import TrainState

    def mk_state(step):
        return TrainState(
            step=jnp.asarray(step, jnp.int32),
            params={"w": jnp.full(3, float(step))},
            opt_state={"mu": {"w": jnp.zeros(3)}},
            model_state={},
        )

    work = str(tmp_path / "run")
    with ck.CheckpointPolicy(work, keep_top_k=2, snapshot_epochs=(0,)) as pol:
        # epoch 0: loss 5.0 (also snapshotted); epoch 1: loss 1.0 (best);
        # epoch 2: loss 3.0 -> the WORST (5.0, the oldest's metric is not
        # what protects it) must be evicted, keeping steps 20 and 30
        pol.save_epoch(mk_state(10), 10, 0, {"total_loss": 5.0})
        pol.save_epoch(mk_state(20), 20, 1, {"total_loss": 1.0})
        improved = pol.save_epoch(mk_state(30), 30, 2, {"total_loss": 3.0})
        assert not improved
        pol.save_step(mk_state(35), 35)
        assert pol.best_name == "best_epoch_1_step_20"
    kept = sorted(
        int(d) for d in os.listdir(os.path.join(work, "checkpoints")) if d.isdigit()
    )
    assert kept == [20, 30], kept  # 10 evicted by metric, though 20 is older
    assert os.path.isdir(os.path.join(work, "snapshots", "epoch_0", "10"))
    assert os.path.isdir(os.path.join(work, "last", "35"))
    best = ck.restore_checkpoint(os.path.join(work, "best"), mk_state(0))
    assert int(best.step) == 20
    np.testing.assert_allclose(best.params["w"], np.full(3, 20.0))


# ---------------------------------------------------------------------------
# trainer robustness helpers (train/loop.py)
# ---------------------------------------------------------------------------

def test_early_stopping_patience():
    from facegantts_tpu.train.loop import EarlyStopping

    es = EarlyStopping(patience=2, min_delta=0.01)
    assert not es.update(1.0)
    assert not es.update(0.5)     # improvement resets
    assert not es.update(0.5)     # bad 1
    assert not es.update(0.499)   # bad 2 (< min_delta improvement)
    assert es.update(0.5)         # bad 3 > patience -> stop


def test_divergence_watchdog():
    from facegantts_tpu.train.loop import DivergenceWatchdog

    wd = DivergenceWatchdog(patience=3)
    bad = {"total_loss": float("nan")}
    good = {"total_loss": 1.0}
    assert not wd.update(bad) and not wd.update(bad)
    assert not wd.update(good)    # recovery resets the streak
    assert not wd.update(bad) and not wd.update(bad)
    assert wd.update(bad)         # 3rd consecutive -> halt


def test_reformat_split_reorganization(tmp_path, monkeypatch):
    import facegantts_tpu.data.lrs2_prep as prep

    src = tmp_path / "src"
    for spk, clip in [("spk00001", "c1"), ("spk00001", "c2"), ("spk00002", "c3")]:
        d = src / spk
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{clip}.mp4").write_bytes(b"x")
        (d / f"{clip}.txt").write_text(f"Text: hello {clip}")

    mapping = {
        "orig/c1": "spk00001/c1",   # train, long enough
        "orig/c2": "spk00001/c2",   # train, too short
        "orig/c3": "spk00002/c3",   # val
        "orig/c4": "spk00009/c9",   # in no filelist -> unmatched (missing src)
    }
    durations = {"c1": 5.0, "c2": 0.5, "c3": 2.0}
    monkeypatch.setattr(
        prep, "media_duration",
        lambda p: durations.get(os.path.basename(p).split(".")[0], 0.0),
    )
    dest = tmp_path / "dest"
    counts = prep.reformat(
        str(src), str(dest),
        {"train": {"orig/c1", "orig/c2"}, "val": {"orig/c3"}, "test": set()},
        mapping,
    )
    assert counts["placed"] == 2 and counts["too_short"] == 1
    # layout consumed by data/preprocess.py: txt+mp4 in trainval/<spk>/
    assert (dest / "trainval" / "spk00001" / "c1.txt").exists()
    assert (dest / "trainval" / "spk00001" / "c1.mp4").exists()
    assert (dest / "mp4" / "train" / "spk00001" / "c1.mp4").exists()
    assert (dest / "mp4" / "val" / "spk00002" / "c3.mp4").exists()
    assert (dest / "unmatched" / "too_short" / "spk00001_c2.mp4").exists()
    assert (dest / "unmatched" / "too_short" / "spk00001_c2.txt").exists()
    assert not (dest / "mp4" / "train" / "spk00001" / "c2.mp4").exists()


def test_schedule_variants():
    import numpy as np

    from facegantts_tpu.config import default_config
    from facegantts_tpu.train.optim import build_schedule

    for sel in ("constant", "cosine", "linear", 2.0):
        cfg = default_config(overrides=dict(
            decay_power=sel, learning_rate=1e-3, warmup_steps=10, max_steps=100,
        ))
        sched = build_schedule(cfg)
        # warmup ramps from ~0 to lr
        assert float(sched(0)) < float(sched(9)) <= 1e-3 + 1e-9
        mid = float(sched(50))
        end = float(sched(99))
        assert 0.0 <= end <= mid <= 1e-3 + 1e-9
        if sel == "constant":
            assert abs(mid - 1e-3) < 1e-9 and abs(end - 1e-3) < 1e-9
        else:
            assert end < 1e-3  # decaying schedules decay (poly to end_lr)


# ---------------------------------------------------------------------------
# audio io + config override surfaces
# ---------------------------------------------------------------------------

def test_wav_roundtrip_int16(tmp_path):
    from facegantts_tpu.utils.audio import load_wav, save_wav

    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.7 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    save_wav(p, wav, sr)
    back, sr2 = load_wav(p)
    assert sr2 == sr and len(back) == len(wav)
    # int16 quantization tolerance
    assert float(np.max(np.abs(back - wav))) < 2.0 / 32768 + 1e-6
    # out-of-range input is clipped, not wrapped
    save_wav(p, wav * 4.0, sr)
    clipped, _ = load_wav(p)
    assert float(np.max(np.abs(clipped))) <= 1.0


def test_config_env_and_cli_overrides(monkeypatch):
    from facegantts_tpu.config import default_config, parse_cli_overrides

    # env override (reference config.py:10-181 semantics)
    cfg = default_config(env={"batch_size": "32", "use_gan": "1"})
    assert cfg.batch_size == 32 and cfg.use_gan == 1
    # CLI key=value parsing
    o = parse_cli_overrides(["learning_rate=5e-5", "timesteps=4", "id=run7"])
    cfg = default_config(overrides=o)
    assert cfg.learning_rate == 5e-5 and cfg.timesteps == 4 and cfg.id == "run7"
    # dict-style access parity with the reference's _config["key"]
    assert cfg["timesteps"] == 4 and cfg.get("missing", 9) == 9
    # derived values (reference config.py:69,145)
    assert cfg.out_size == 128 and cfg.n_feats == cfg.n_mels


# ---------------------------------------------------------------------------
# checksum-pinned external-weight entry points (facegantts_tpu/weights.py)


def test_weights_pin_verify_roundtrip(tmp_path, monkeypatch):
    """verify() refuses unpinned and mismatched files; pin() is
    trust-on-first-use and guards re-pinning (VERDICT r3 next-step #10)."""
    import pytest

    from facegantts_tpu import weights

    pins = tmp_path / "weight_pins.json"
    monkeypatch.setenv("FACEGANTTS_WEIGHT_PINS", str(pins))
    f = tmp_path / "syncnet.pt"
    f.write_bytes(b"pretend-checkpoint")

    # first contact: no pin recorded -> hard refusal with instructions
    with pytest.raises(RuntimeError, match="first contact"):
        weights.verify("syncnet", str(f))
    digest = weights.pin("syncnet", str(f))
    assert weights.verify("syncnet", str(f)) == digest

    # corruption -> refusal
    f.write_bytes(b"pretend-checkpoint-tampered")
    with pytest.raises(RuntimeError, match="mismatch"):
        weights.verify("syncnet", str(f))
    # re-pin requires force
    with pytest.raises(RuntimeError, match="force"):
        weights.pin("syncnet", str(f))
    weights.pin("syncnet", str(f), force=True)
    assert weights.verify("syncnet", str(f))

    # unknown artifact names are rejected outright
    with pytest.raises(KeyError):
        weights.verify("nonsense", str(f))


def test_weights_cli_list_and_importers_resolve(tmp_path, monkeypatch, capsys):
    """Every registered importer must resolve to a callable, and the CLI
    lists all four reference artifacts (SURVEY.md C27/C28)."""
    from facegantts_tpu import weights

    for name, meta in weights.ARTIFACTS.items():
        assert callable(weights._resolve(meta["importer"])), name
    assert set(weights.ARTIFACTS) == {
        "facetts_lrs3", "syncnet", "hifigan_16k", "utmos22_strong"
    }
    monkeypatch.setenv("FACEGANTTS_WEIGHT_PINS", str(tmp_path / "p.json"))
    assert weights.main(["list"]) == 0
    out = capsys.readouterr().out
    assert "facetts_lrs3" in out and "<unpinned>" in out


def test_labeler_quality_measured_envelope():
    """Clustering quality of the production re-ID assignment loop on the
    synthetic identity fixture (VERDICT r3 next-step #8; numbers recorded
    in PARITY.md).  Healthy regime (inter-identity distance ~0.5 > base
    threshold 0.40 > clip-mean deviation): perfect clustering.  Identities
    closer than the base threshold collapse — the documented calibration
    contract of label_speakers(base_threshold=...)."""
    import numpy as np

    import scripts.labeler_benchmark as lb

    rng = np.random.default_rng(0)
    # healthy: near-orthogonal identities, moderate frame noise
    clips, n_ident, inter_d = lb.make_fixture(rng, intra_noise=0.8, inter_spread=1.0)
    assert inter_d > 0.45
    assignment, n_clusters = lb.run_assignment(clips)
    purity, prec, rec, f1 = lb.score(assignment)
    assert n_clusters == n_ident
    assert purity == 1.0 and f1 > 0.99

    # out-of-envelope: identities closer than the acceptance threshold
    clips, n_ident, inter_d = lb.make_fixture(rng, intra_noise=0.4, inter_spread=0.4)
    assert inter_d < 0.40  # inside the base threshold -> collapse expected
    _, n_clusters = lb.run_assignment(clips)
    assert n_clusters < n_ident  # documents the failure mode the threshold guards
