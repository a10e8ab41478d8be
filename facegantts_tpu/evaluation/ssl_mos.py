"""SSL-based MOS prediction: the UTMOS22 "strong learner" architecture in
JAX, with a torch checkpoint importer.

The reference reports UTMOS from the ``tarepan/SpeechMOS`` torch.hub export
of the UTokyo-SaruLab VoiceMOS'22 strong learner
(/root/reference/evaluation/eval.py:209-211).  That model is:

    raw 16 kHz wave
      -> wav2vec2 BASE encoder (models/wav2vec2.py)        (B, T, 768)
      -> concat [features, domain embedding, judge (listener) embedding]
                                                           (B, T, 1024)
      -> 1-layer bidirectional LSTM, hidden 512            (B, T, 1024)
      -> Linear 1024 -> 2048 -> ReLU -> Linear 2048 -> 1   (B, T, 1)
      -> mean over frames * 2 + 3                          MOS in [1, 5]

(The hub export pins the single training domain and the mean-judge
embedding, so inference needs no ids.)  Weights live on an external hub
and cannot be fetched on an air-gapped pod — but given the file, the
importer below maps torch state_dicts in HuggingFace wav2vec2 naming
(``feature_extractor.conv_layers...``, ``encoder.layers.N.attention...``)
or fairseq naming (``self_attn``, ``fc1/fc2``) onto this architecture,
folding weight-norm on the positional conv.  ``make_mos_predictor``
(evaluation/utmos.py) auto-detects such checkpoints and prefers this
backend over the DSP proxy.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from facegantts_tpu.models.wav2vec2 import Wav2Vec2Encoder


class BiLSTM(nn.Module):
    """1-layer bidirectional LSTM with torch gate order/semantics
    (gates [i, f, g, o]; b = bias_ih + bias_hh folded at import)."""

    hidden: int

    def _direction(self, x: jnp.ndarray, tag: str, reverse: bool) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w_ih = self.param(f"w_ih_{tag}", nn.initializers.lecun_normal(),
                          (in_dim, 4 * self.hidden))
        w_hh = self.param(f"w_hh_{tag}", nn.initializers.orthogonal(),
                          (self.hidden, 4 * self.hidden))
        b = self.param(f"b_{tag}", nn.initializers.zeros, (4 * self.hidden,))

        def step(carry, xt):
            h, c = carry
            z = xt @ w_ih + h @ w_hh + b
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h = nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        xs = x.transpose(1, 0, 2)  # (T, B, In)
        if reverse:
            xs = xs[::-1]
        b0 = jnp.zeros((x.shape[0], self.hidden), x.dtype)
        _, hs = jax.lax.scan(step, (b0, b0), xs)
        if reverse:
            hs = hs[::-1]
        return hs.transpose(1, 0, 2)  # (B, T, H)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = self._direction(x, "fwd", reverse=False)
        bwd = self._direction(x, "bwd", reverse=True)
        return jnp.concatenate([fwd, bwd], axis=-1)


class UTMOSStrong(nn.Module):
    """UTMOS22 strong-learner head over a wav2vec2 encoder."""

    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    conv_dims: Tuple[int, ...] = (512,) * 7
    cond_dim: int = 128  # domain + judge embeddings (pinned at inference)
    blstm_hidden: int = 512
    proj_hidden: int = 2048
    pos_kernel: int = 128
    pos_groups: int = 16

    def setup(self):
        self.wav2vec2 = Wav2Vec2Encoder(
            hidden=self.hidden, layers=self.layers, heads=self.heads,
            ffn=self.ffn, conv_dims=self.conv_dims,
            pos_kernel=self.pos_kernel, pos_groups=self.pos_groups,
            name="ssl",
        )
        self.domain_emb = self.param(
            "domain_emb", nn.initializers.normal(1.0), (self.cond_dim,)
        )
        self.judge_emb = self.param(
            "judge_emb", nn.initializers.normal(1.0), (self.cond_dim,)
        )
        self.blstm = BiLSTM(self.blstm_hidden, name="blstm")
        self.proj_in = nn.Dense(self.proj_hidden, name="proj_in")
        self.proj_out = nn.Dense(1, name="proj_out")

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) float waveform at 16 kHz -> (B,) MOS in [1, 5]."""
        feat = self.wav2vec2(wav)  # (B, T, H)
        b, t, _ = feat.shape
        cond = jnp.concatenate([self.domain_emb, self.judge_emb])
        cond = jnp.broadcast_to(cond, (b, t, cond.shape[0])).astype(feat.dtype)
        x = jnp.concatenate([feat, cond], axis=-1)
        x = self.blstm(x)
        x = nn.relu(self.proj_in(x))
        scores = self.proj_out(x)[..., 0]  # (B, T)
        return jnp.mean(scores, axis=-1) * 2.0 + 3.0


# ---------------------------------------------------------------------------
# torch state_dict import
# ---------------------------------------------------------------------------

_PREFIXES = ("model.", "ssl_model.model.", "ssl_model.", "wav2vec2.",
             "ssl.", "feature_extractors.0.", "encoder_model.")


def _strip(key: str) -> str:
    changed = True
    while changed:
        changed = False
        for p in _PREFIXES:
            if key.startswith(p):
                key = key[len(p):]
                changed = True
    return key


def _t(a) -> np.ndarray:
    return np.asarray(a.detach().cpu().numpy() if hasattr(a, "detach") else a)


def _fold_weight_norm(sd: Dict[str, np.ndarray], base: str) -> Optional[np.ndarray]:
    """Return the effective conv weight for `base`, folding weight-norm
    (weight_g/weight_v, or torch>=2 parametrizations.original0/1)."""
    if base + ".weight" in sd:
        return _t(sd[base + ".weight"])
    pairs = [
        (base + ".weight_g", base + ".weight_v"),
        (base + ".parametrizations.weight.original0",
         base + ".parametrizations.weight.original1"),
    ]
    for gk, vk in pairs:
        if gk in sd and vk in sd:
            g, v = _t(sd[gk]), _t(sd[vk])
            # fold over whichever dims weight_norm normalized: g is size-1
            # there (HF pos conv uses dim=2 -> g (1,1,k); plain convs dim=0
            # -> g (out,1,1))
            dims = tuple(i for i, s in enumerate(g.shape) if s == 1)
            norm = np.sqrt((v ** 2).sum(axis=dims, keepdims=True)) + 1e-12
            return g * v / norm
    return None


def import_utmos_strong(sd: Dict, cfg: Optional[Dict] = None) -> Tuple[Dict, Dict]:
    """Map a torch UTMOS-strong/wav2vec2 state_dict onto UTMOSStrong params.

    Returns (params, info) where info lists unmapped torch keys.  Accepts
    HF naming (attention.q_proj / feed_forward.intermediate_dense) and
    fairseq naming (self_attn.q_proj / fc1 / fc2); the wav2vec2 subtree
    may carry any of the usual prefixes (wav2vec2., ssl_model.model., ...).
    """
    sd = {_strip(k): v for k, v in sd.items()}
    p: Dict = {"ssl": {"feature_extractor": {}, "feature_projection": {},
                       "pos_conv_embed": {}}}
    used = set()

    def take(key):
        used.add(key)
        return _t(sd[key])

    def ln(dst, src):
        if src + ".weight" in sd:
            dst["scale"] = take(src + ".weight")
            dst["bias"] = take(src + ".bias")

    def dense(dst_parent, name, src):
        if src + ".weight" in sd:
            dst_parent[name] = {"kernel": take(src + ".weight").T,
                                "bias": take(src + ".bias")}

    ssl = p["ssl"]
    # --- conv feature encoder -------------------------------------------
    i = 0
    while True:
        base = f"feature_extractor.conv_layers.{i}"
        w = None
        for cand in (base + ".conv", base + ".0"):
            if cand + ".weight" in sd:
                w = take(cand + ".weight")
                break
        if w is None:
            break
        # torch (out, in, k) -> flax (k, in, out)
        ssl["feature_extractor"][f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0)}
        if i == 0:
            gn = {}
            for cand in (base + ".layer_norm", base + ".2"):
                if cand + ".weight" in sd:
                    gn = {"scale": take(cand + ".weight"),
                          "bias": take(cand + ".bias")}
                    break
            if gn:
                ssl["feature_extractor"]["group_norm"] = gn
        i += 1

    # --- feature projection ----------------------------------------------
    fp = ssl["feature_projection"]
    fp["layer_norm"] = {}
    ln(fp["layer_norm"], "feature_projection.layer_norm")
    if not fp["layer_norm"]:
        ln(fp["layer_norm"], "layer_norm")  # fairseq: top-level pre-proj LN
    dense(fp, "projection", "feature_projection.projection")
    if "projection" not in fp and "post_extract_proj.weight" in sd:
        dense(fp, "projection", "post_extract_proj")

    # --- positional conv (weight-normed, grouped) ------------------------
    for cand in ("encoder.pos_conv_embed.conv", "encoder.pos_conv.0"):
        w = _fold_weight_norm(sd, cand)
        if w is not None:
            for suffix in (".weight", ".weight_g", ".weight_v", ".bias",
                           ".parametrizations.weight.original0",
                           ".parametrizations.weight.original1"):
                used.add(cand + suffix)
            # torch grouped conv (out, in/groups, k) -> flax (k, in/groups, out)
            ssl["pos_conv_embed"]["conv"] = {
                "kernel": w.transpose(2, 1, 0),
                "bias": _t(sd[cand + ".bias"]),
            }
            break

    # --- transformer stack ------------------------------------------------
    ln_top = {}
    ln(ln_top, "encoder.layer_norm")
    if ln_top:
        ssl["encoder_layer_norm"] = ln_top
    i = 0
    while f"encoder.layers.{i}.final_layer_norm.weight" in sd:
        base = f"encoder.layers.{i}"
        L: Dict = {}
        attn = base + (".attention" if base + ".attention.q_proj.weight" in sd
                       else ".self_attn")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            dense(L, proj, f"{attn}.{proj}")
        hf = base + ".feed_forward.intermediate_dense.weight" in sd
        dense(L, "intermediate_dense",
              base + (".feed_forward.intermediate_dense" if hf else ".fc1"))
        dense(L, "output_dense",
              base + (".feed_forward.output_dense" if hf else ".fc2"))
        L["layer_norm"] = {}
        ln(L["layer_norm"],
           base + (".layer_norm" if hf or base + ".layer_norm.weight" in sd
                   else ".self_attn_layer_norm"))
        if not L["layer_norm"]:
            ln(L["layer_norm"], base + ".self_attn_layer_norm")
        L["final_layer_norm"] = {}
        ln(L["final_layer_norm"], base + ".final_layer_norm")
        ssl[f"layer_{i}"] = L
        i += 1

    # --- head -------------------------------------------------------------
    for name, keys in (("domain_emb", ("domain_emb.weight", "domain_embedding.weight")),
                       ("judge_emb", ("judge_emb.weight", "judge_embedding.weight"))):
        for k in keys:
            if k in sd:
                emb = take(k)
                p[name] = emb.reshape(-1) if emb.ndim == 1 else emb[0].reshape(-1)
                break
    if "blstm.weight_ih_l0" in sd:
        bl = {}
        for tag, suf in (("fwd", ""), ("bwd", "_reverse")):
            bl[f"w_ih_{tag}"] = take(f"blstm.weight_ih_l0{suf}").T
            bl[f"w_hh_{tag}"] = take(f"blstm.weight_hh_l0{suf}").T
            bl[f"b_{tag}"] = (take(f"blstm.bias_ih_l0{suf}")
                              + take(f"blstm.bias_hh_l0{suf}"))
        p["blstm"] = bl
    for name, cands in (("proj_in", ("projection.0", "decoder.0", "output_layers.0")),
                        ("proj_out", ("projection.3", "projection.2",
                                      "decoder.3", "output_layers.2"))):
        for c in cands:
            if c + ".weight" in sd:
                dense(p, name, c)
                break

    info = {"unmapped": sorted(k for k in sd if k not in used)}
    return p, info


def load_utmos_checkpoint(ckpt_path: str) -> Tuple[Dict, Dict]:
    """torch.load (weights_only) a UTMOS-strong checkpoint and import it."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_utmos_strong(sd)


def looks_like_ssl_checkpoint(sd: Dict) -> bool:
    return any("feature_extractor.conv_layers" in _strip(k) for k in sd)


def model_from_params(params: Dict, heads: Optional[int] = None) -> UTMOSStrong:
    """Build a UTMOSStrong with sizes inferred from imported param shapes
    (head count is not recoverable from shapes; defaults to 12 when it
    divides the hidden size, as in wav2vec2 base)."""
    ssl = params["ssl"]
    hidden = ssl["feature_projection"]["projection"]["kernel"].shape[1]
    layers = sum(1 for k in ssl if k.startswith("layer_"))
    ffn = ssl["layer_0"]["intermediate_dense"]["kernel"].shape[1] if layers else 4 * hidden
    conv_dims = tuple(
        ssl["feature_extractor"][f"conv_{i}"]["kernel"].shape[2]
        for i in range(sum(1 for k in ssl["feature_extractor"] if k.startswith("conv_")))
    )
    if heads is None:
        heads = 12 if hidden % 12 == 0 else max(
            h for h in (8, 6, 4, 2, 1) if hidden % h == 0
        )
    cond_dim = params["domain_emb"].shape[0] if "domain_emb" in params else 128
    blstm_hidden = (params["blstm"]["w_hh_fwd"].shape[0]
                    if "blstm" in params else 512)
    proj_hidden = (params["proj_in"]["kernel"].shape[1]
                   if "proj_in" in params else 2048)
    pos_kernel = ssl["pos_conv_embed"]["conv"]["kernel"].shape[0] \
        if "conv" in ssl["pos_conv_embed"] else 128
    pos_in = ssl["pos_conv_embed"]["conv"]["kernel"].shape[1] \
        if "conv" in ssl["pos_conv_embed"] else hidden // 16
    return UTMOSStrong(
        hidden=hidden, layers=layers, heads=heads, ffn=ffn,
        conv_dims=conv_dims, cond_dim=cond_dim, blstm_hidden=blstm_hidden,
        proj_hidden=proj_hidden, pos_kernel=pos_kernel,
        pos_groups=max(1, hidden // max(1, pos_in)),
    )


class SSLMOSPredictor:
    """Callable (wav, sr) -> MOS using the imported UTMOS-strong model."""

    def __init__(self, params: Dict, model: Optional[UTMOSStrong] = None):
        self.model = model or UTMOSStrong()
        self.params = params
        self._apply = jax.jit(
            lambda w: self.model.apply({"params": self.params}, w)
        )

    def __call__(self, wav: np.ndarray, sr: int) -> float:
        wav = np.asarray(wav, np.float32)
        if sr != 16000:  # linear resample; SSL stack expects 16 kHz
            n = int(round(len(wav) * 16000 / sr))
            wav = np.interp(
                np.linspace(0.0, len(wav) - 1.0, n),
                np.arange(len(wav)), wav,
            ).astype(np.float32)
        return float(self._apply(wav[None])[0])
