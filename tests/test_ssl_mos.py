"""Parity tests for the UTMOS-strong SSL MOS architecture + importer
(evaluation/ssl_mos.py) against a torch replica: HF transformers
Wav2Vec2Model (the SSL stack the real UTMOS22 checkpoint contains,
reference evaluation/eval.py:209-211) plus a torch LSTM/linear head."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_torch_replica(seed=0):
    """Tiny wav2vec2 (HF) + UTMOS head in torch, eval mode."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(seed)
    cfg = Wav2Vec2Config(
        hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False, hidden_act="gelu",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    w2v = Wav2Vec2Model(cfg).eval()

    cond = 6
    head = torch.nn.ModuleDict({
        "domain_emb": torch.nn.Embedding(1, cond),
        "judge_emb": torch.nn.Embedding(1, cond),
        "blstm": torch.nn.LSTM(24 + 2 * cond, 10, batch_first=True,
                               bidirectional=True),
        "projection": torch.nn.Sequential(
            torch.nn.Linear(20, 32), torch.nn.ReLU(),
            torch.nn.Dropout(0.0), torch.nn.Linear(32, 1),
        ),
    }).eval()
    return w2v, head


def _torch_forward(w2v, head, wav):
    with torch.no_grad():
        feat = w2v(torch.as_tensor(wav)).last_hidden_state  # (B, T, H)
        b, t, _ = feat.shape
        dom = head["domain_emb"].weight[0].expand(b, t, -1)
        jud = head["judge_emb"].weight[0].expand(b, t, -1)
        x = torch.cat([feat, dom, jud], dim=-1)
        x, _ = head["blstm"](x)
        scores = head["projection"](x)[..., 0]
        return (scores.mean(dim=1) * 2.0 + 3.0).numpy()


def _export_state_dict(w2v, head):
    sd = {}
    for k, v in w2v.state_dict().items():
        if k == "masked_spec_embed":
            continue
        sd["wav2vec2." + k] = v
    for k, v in head.state_dict().items():
        sd[k.replace("blstm.", "blstm.").replace("projection.", "projection.")] = v
    return sd


@pytest.mark.slow
def test_utmos_strong_import_parity():
    """Torch replica and imported JAX model agree on MOS outputs."""
    from facegantts_tpu.evaluation.ssl_mos import (
        SSLMOSPredictor, import_utmos_strong, model_from_params,
    )

    w2v, head = _tiny_torch_replica()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 800)).astype(np.float32) * 0.1

    ref = _torch_forward(w2v, head, wav)

    # head count is not recoverable from weight shapes — the tiny replica
    # uses 2 (wav2vec2-base's 12 doesn't divide 24 usefully), so pass it
    params, info = import_utmos_strong(_export_state_dict(w2v, head))
    model = model_from_params(params, heads=2)
    assert model.hidden == 24 and model.layers == 2 and model.heads == 2
    assert model.conv_dims == (16, 16)

    got = np.asarray(model.apply({"params": params}, wav))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    # importer accounted for every torch tensor it should understand
    unmapped = [k for k in info["unmapped"] if "num_batches_tracked" not in k]
    assert unmapped == [], unmapped

    # predictor surface: resamples and returns a float
    pred = SSLMOSPredictor(params, model)
    val = pred(wav[0], 16000)
    assert abs(val - ref[0]) < 1e-3
    val8k = pred(wav[0][::2], 8000)
    assert np.isfinite(val8k)


def test_make_mos_predictor_detects_ssl_checkpoint(tmp_path):
    from facegantts_tpu.evaluation.ssl_mos import SSLMOSPredictor
    from facegantts_tpu.evaluation.utmos import make_mos_predictor

    w2v, head = _tiny_torch_replica()
    ckpt = tmp_path / "utmos_tiny.pt"
    torch.save(_export_state_dict(w2v, head), str(ckpt))
    pred = make_mos_predictor(str(ckpt))
    assert isinstance(pred, SSLMOSPredictor)
    wav = np.random.default_rng(1).standard_normal(800).astype(np.float32)
    assert np.isfinite(pred(wav, 16000))
