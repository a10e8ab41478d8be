"""Checkpointing: Orbax save/restore + PyTorch weight import.

Orbax replaces Lightning's ModelCheckpoint stack (reference train.py:48-60,
callbacks/custom_callbacks.py): top-k retention on a monitored metric,
save-last, and best-copy naming are handled by a CheckpointManager policy.

The torch importers cover the reference's external pretrained weights
(SURVEY.md C28): `facetts_lrs3.pt` generator warm-start with
discriminator-key stripping and strict=False semantics (train.py:110-121,
inference.py:54-68), the SyncNet checkpoint (syncnet_hifigan.py:87-99), and
the bshall HiFi-GAN-16k vocoder (inference.py:79) including weight-norm
folding."""

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


# ---------------------------------------------------------------------------
# Orbax
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 3):
    """Save TrainState at `step`, keeping the newest `keep` checkpoints."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))


class CheckpointPolicy:
    """The reference's full retention policy (train.py:48-60,
    callbacks/custom_callbacks.py:110-163,288-304) on persistent Orbax
    managers:

    - ``<work>/checkpoints``: top-k ranked BY METRIC (``val/total_loss``,
      min) — the worst checkpoint is evicted when a better one arrives,
      regardless of age.
    - ``<work>/last``: the newest periodic step save (Lightning
      ``save_last`` analog), always restorable after a crash.
    - ``<work>/snapshots/epoch_<e>``: fixed-epoch snapshots (reference
      SaveEpochZero / SaveEpoch96 callbacks).
    - ``<work>/best``: the best-so-far state, plus a reference-style
      ``best_epoch_<E>_step_<S>`` symlink next to it
      (custom_callbacks.py:139-163 copies the file under that name).

    Managers are created once and reused — no per-save directory rescan."""

    def __init__(
        self,
        work_dir: str,
        keep_top_k: int = 3,
        monitor: str = "total_loss",
        snapshot_epochs: Tuple[int, ...] = (0, 96),
    ):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.work_dir = os.path.abspath(work_dir)
        self.monitor = monitor
        self.snapshot_epochs = set(snapshot_epochs)
        self.best = float("inf")
        self.best_name: Optional[str] = None
        self.top_mgr = ocp.CheckpointManager(
            os.path.join(self.work_dir, "checkpoints"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_top_k,
                best_fn=lambda m: m[monitor],
                best_mode="min",
                keep_checkpoints_without_metrics=False,
                create=True,
            ),
        )
        self.last_mgr = ocp.CheckpointManager(
            os.path.join(self.work_dir, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )
        self.best_mgr = ocp.CheckpointManager(
            os.path.join(self.work_dir, "best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )

    def save_step(self, state, step: int) -> None:
        """Periodic mid-epoch save -> <work>/last (newest only)."""
        self.last_mgr.save(step, args=self._ocp.args.StandardSave(state))

    def snapshot(self, state, step: int, epoch: int) -> None:
        """Fixed-epoch snapshot (reference SaveEpochZero/SaveEpoch96) — a
        no-op unless ``epoch`` is in ``snapshot_epochs``."""
        if epoch not in self.snapshot_epochs:
            return
        snap_dir = os.path.join(self.work_dir, "snapshots", f"epoch_{epoch}")
        with self._ocp.CheckpointManager(
            snap_dir,
            options=self._ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        ) as snap:
            snap.save(step, args=self._ocp.args.StandardSave(state))

    def save_epoch(self, state, step: int, epoch: int,
                   metrics: Dict[str, float], with_snapshot: bool = True) -> bool:
        """Ranked save with the monitored metric; snapshots + best copy.
        Fired at epoch end (monitor="total_loss") or at eval intervals
        (monitor = an in-train eval key, with_snapshot=False so eval-interval
        saves don't re-trigger the epoch snapshot mid-epoch).

        Returns True when the monitored value improved."""
        value = float(metrics[self.monitor])
        self.top_mgr.save(
            step,
            args=self._ocp.args.StandardSave(state),
            metrics={self.monitor: value},
        )
        if with_snapshot:
            self.snapshot(state, step, epoch)
        improved = value < self.best
        if improved:
            self.best = value
            self.best_mgr.save(step, args=self._ocp.args.StandardSave(state))
            self.best_mgr.wait_until_finished()
            # reference-style named pointer (best_epoch_X_step_Y.ckpt)
            if self.best_name:
                old = os.path.join(self.work_dir, self.best_name)
                if os.path.islink(old):
                    os.unlink(old)
            self.best_name = f"best_epoch_{epoch}_step_{step}"
            link = os.path.join(self.work_dir, self.best_name)
            try:
                os.symlink(os.path.join("best", str(step)), link)
            except OSError:
                pass  # fs without symlinks: the best/ dir is authoritative
        return improved

    def close(self) -> None:
        for mgr in (self.top_mgr, self.last_mgr, self.best_mgr):
            mgr.wait_until_finished()
            mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def restore_checkpoint(ckpt_dir: str, target, step: Optional[int] = None):
    """Restore the latest (or given-step) TrainState."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore(target))


def restore_generator_variables(ckpt_dir: str, step: Optional[int] = None):
    """Restore just the generator variables dict ({params, batch_stats...})
    from an orbax TrainState checkpoint WITHOUT a target pytree — inference
    doesn't have (and shouldn't build) optimizer state to restore into."""
    import orbax.checkpoint as ocp

    import jax

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
    if step is None:
        return None
    # a zero numpy target built from the checkpoint's own metadata sidesteps
    # orbax's restore-to-recorded-device behavior (the saving process's
    # device names need not exist in this process)
    item = os.path.join(path, str(step), "default")
    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(item)
    tree = meta.item_metadata.tree if hasattr(meta, "item_metadata") else meta
    target = jax.tree.map(
        lambda m: np.zeros(m.shape, m.dtype) if hasattr(m, "shape") else m,
        tree, is_leaf=lambda m: hasattr(m, "shape"),
    )
    raw = ckptr.restore(item, target)
    variables = {"params": raw["params"]}
    if raw.get("model_state"):
        variables.update(raw["model_state"])
    return variables


# ---------------------------------------------------------------------------
# torch -> flax conversion helpers
# ---------------------------------------------------------------------------

def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def conv2d_kernel(w) -> np.ndarray:
    """(Cout, Cin, kh, kw) -> (kh, kw, Cin, Cout)."""
    return _t(w).transpose(2, 3, 1, 0)


def conv1d_kernel(w) -> np.ndarray:
    """(Cout, Cin, k) -> (k, Cin, Cout)."""
    return _t(w).transpose(2, 1, 0)


def conv1x1_dense(w) -> np.ndarray:
    """Conv with k=1 used as a Dense: (Cout, Cin, 1...) -> (Cin, Cout)."""
    w = _t(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def dense_kernel(w) -> np.ndarray:
    """torch Linear (Cout, Cin) -> (Cin, Cout)."""
    return _t(w).T


def convtranspose2d_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> ops.convt (kh, kw, Cin, Cout)."""
    return _t(w).transpose(2, 3, 0, 1)


def convtranspose1d_kernel(w) -> np.ndarray:
    """torch ConvTranspose1d (Cin, Cout, k) -> (k, Cin, Cout)."""
    return _t(w).transpose(2, 0, 1)


def fold_weight_norm(sd: Dict[str, Any], prefix: str) -> Optional[np.ndarray]:
    """Fold torch weight_norm (weight_g, weight_v) into a plain weight."""
    if prefix + ".weight" in sd:
        return _t(sd[prefix + ".weight"])
    g, v = _t(sd[prefix + ".weight_g"]), _t(sd[prefix + ".weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / norm


# ---------------------------------------------------------------------------
# component importers
# ---------------------------------------------------------------------------

def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def import_syncnet(sd: Dict[str, Any], prefix: str = "syncnet.") -> Tuple[Dict, Dict]:
    """Reference SyncNet state_dict -> (params, batch_stats) subtrees.

    Sequential index maps (reference syncnet_hifigan.py:21-84):
    netcnnaud convs at 0,4,8,12,15,19 / BNs at 1,5,9,13,16,20;
    netcnnimg convs at 0,4,8,11,14,18 / BNs at 1,5,9,12,15,19."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    aud_conv_idx = [0, 4, 8, 12, 15, 19]
    aud_bn_idx = [1, 5, 9, 13, 16, 20]
    img_conv_idx = [0, 4, 8, 11, 14, 18]
    img_bn_idx = [1, 5, 9, 12, 15, 19]

    for n, (ci, bi) in enumerate(zip(aud_conv_idx, aud_bn_idx), start=1):
        bnp, bns = _bn(sd, f"{prefix}netcnnaud.{bi}")
        params[f"aud_c{n}"] = {
            "conv": {
                "kernel": conv2d_kernel(sd[f"{prefix}netcnnaud.{ci}.weight"]),
                "bias": _t(sd[f"{prefix}netcnnaud.{ci}.bias"]),
            },
            "bn": bnp,
        }
        stats[f"aud_c{n}"] = {"bn": bns}
    for n, (ci, bi) in enumerate(zip(img_conv_idx, img_bn_idx), start=1):
        bnp, bns = _bn(sd, f"{prefix}netcnnimg.{bi}")
        params[f"img_c{n}"] = {
            "conv": {
                "kernel": conv2d_kernel(sd[f"{prefix}netcnnimg.{ci}.weight"]),
                "bias": _t(sd[f"{prefix}netcnnimg.{ci}.bias"]),
            },
            "bn": bnp,
        }
        stats[f"img_c{n}"] = {"bn": bns}

    for head, tname in (("aud_head", "netfcaud"), ("img_head", "netfcimg")):
        bnp, bns = _bn(sd, f"{prefix}{tname}.1")
        params[head] = {
            "fc1": {
                "kernel": conv1x1_dense(sd[f"{prefix}{tname}.0.weight"]),
                "bias": _t(sd[f"{prefix}{tname}.0.bias"]),
            },
            "bn": bnp,
            "fc2": {
                "kernel": conv1x1_dense(sd[f"{prefix}{tname}.3.weight"]),
                "bias": _t(sd[f"{prefix}{tname}.3.bias"]),
            },
        }
        stats[head] = {"bn": bns}
    return params, stats


def import_text_encoder(sd: Dict[str, Any], prefix: str = "encoder.") -> Dict[str, Any]:
    """Reference TextEncoder state_dict -> params subtree
    (module layout: model/text_encoder.py:349-422)."""
    p: Dict[str, Any] = {}
    p["emb"] = {"embedding": _t(sd[f"{prefix}emb.weight"])}

    prenet: Dict[str, Any] = {}
    i = 0
    while f"{prefix}prenet.conv_layers.{i}.weight" in sd:
        prenet[f"conv_{i}"] = {
            "kernel": conv1d_kernel(sd[f"{prefix}prenet.conv_layers.{i}.weight"]),
            "bias": _t(sd[f"{prefix}prenet.conv_layers.{i}.bias"]),
        }
        prenet[f"norm_{i}"] = {
            "gamma": _t(sd[f"{prefix}prenet.norm_layers.{i}.gamma"]),
            "beta": _t(sd[f"{prefix}prenet.norm_layers.{i}.beta"]),
        }
        i += 1
    prenet["proj"] = {
        "kernel": conv1x1_dense(sd[f"{prefix}prenet.proj.weight"]),
        "bias": _t(sd[f"{prefix}prenet.proj.bias"]),
    }
    p["prenet"] = prenet

    enc: Dict[str, Any] = {}
    i = 0
    while f"{prefix}encoder.attn_layers.{i}.conv_q.weight" in sd:
        a = f"{prefix}encoder.attn_layers.{i}."
        enc[f"attn_{i}"] = {
            "conv_q": {"kernel": conv1x1_dense(sd[a + "conv_q.weight"]), "bias": _t(sd[a + "conv_q.bias"])},
            "conv_k": {"kernel": conv1x1_dense(sd[a + "conv_k.weight"]), "bias": _t(sd[a + "conv_k.bias"])},
            "conv_v": {"kernel": conv1x1_dense(sd[a + "conv_v.weight"]), "bias": _t(sd[a + "conv_v.bias"])},
            "conv_o": {"kernel": conv1x1_dense(sd[a + "conv_o.weight"]), "bias": _t(sd[a + "conv_o.bias"])},
            "emb_rel_k": _t(sd[a + "emb_rel_k"])[0],  # heads_share: drop head dim
            "emb_rel_v": _t(sd[a + "emb_rel_v"])[0],
        }
        f = f"{prefix}encoder.ffn_layers.{i}."
        enc[f"ffn_{i}"] = {
            "conv_1": {"kernel": conv1d_kernel(sd[f + "conv_1.weight"]), "bias": _t(sd[f + "conv_1.bias"])},
            "conv_2": {"kernel": conv1d_kernel(sd[f + "conv_2.weight"]), "bias": _t(sd[f + "conv_2.bias"])},
        }
        for nsrc, ndst in ((f"norm_layers_1.{i}", f"norm1_{i}"), (f"norm_layers_2.{i}", f"norm2_{i}")):
            enc[ndst] = {
                "gamma": _t(sd[f"{prefix}encoder.{nsrc}.gamma"]),
                "beta": _t(sd[f"{prefix}encoder.{nsrc}.beta"]),
            }
        i += 1
    p["encoder"] = enc

    p["proj_m"] = {
        "kernel": conv1x1_dense(sd[f"{prefix}proj_m.weight"]),
        "bias": _t(sd[f"{prefix}proj_m.bias"]),
    }
    w = f"{prefix}proj_w."
    p["proj_w"] = {
        "conv_1": {"kernel": conv1d_kernel(sd[w + "conv_1.weight"]), "bias": _t(sd[w + "conv_1.bias"])},
        "norm_1": {"gamma": _t(sd[w + "norm_1.gamma"]), "beta": _t(sd[w + "norm_1.beta"])},
        "conv_2": {"kernel": conv1d_kernel(sd[w + "conv_2.weight"]), "bias": _t(sd[w + "conv_2.bias"])},
        "norm_2": {"gamma": _t(sd[w + "norm_2.gamma"]), "beta": _t(sd[w + "norm_2.beta"])},
        "proj": {"kernel": conv1x1_dense(sd[w + "proj.weight"]), "bias": _t(sd[w + "proj.bias"])},
    }
    return p


def _resnet_block(sd, prefix) -> Dict[str, Any]:
    out = {
        "mlp": {
            "kernel": dense_kernel(sd[f"{prefix}.mlp.1.weight"]),
            "bias": _t(sd[f"{prefix}.mlp.1.bias"]),
        },
    }
    for b in ("block1", "block2"):
        out[b] = {
            "conv": {
                "kernel": conv2d_kernel(sd[f"{prefix}.{b}.block.0.weight"]),
                "bias": _t(sd[f"{prefix}.{b}.block.0.bias"]),
            },
            "norm": {
                "scale": _t(sd[f"{prefix}.{b}.block.1.weight"]),
                "bias": _t(sd[f"{prefix}.{b}.block.1.bias"]),
            },
        }
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = {
            "kernel": conv1x1_dense(sd[f"{prefix}.res_conv.weight"]),
            "bias": _t(sd[f"{prefix}.res_conv.bias"]),
        }
    return out


def _attn_block(sd, prefix) -> Dict[str, Any]:
    # Residual(Rezero(LinearAttention)): torch path <prefix>.fn.fn.*
    # (1x1 convs land in Dense layers in the flax module)
    return {
        "g": _t(sd[f"{prefix}.fn.g"]),
        "fn": {
            "to_qkv": {"kernel": conv1x1_dense(sd[f"{prefix}.fn.fn.to_qkv.weight"])},
            "to_out": {
                "kernel": conv1x1_dense(sd[f"{prefix}.fn.fn.to_out.weight"]),
                "bias": _t(sd[f"{prefix}.fn.fn.to_out.bias"]),
            },
        },
    }


def import_unet(sd: Dict[str, Any], prefix: str = "decoder.estimator.") -> Dict[str, Any]:
    """Reference GradLogPEstimator2d state_dict -> params subtree
    (module layout: model/diffusion.py:33-101)."""
    p: Dict[str, Any] = {}
    if f"{prefix}spk_mlp.0.weight" in sd:
        p["spk_mlp_1"] = {"kernel": dense_kernel(sd[f"{prefix}spk_mlp.0.weight"]), "bias": _t(sd[f"{prefix}spk_mlp.0.bias"])}
        p["spk_mlp_2"] = {"kernel": dense_kernel(sd[f"{prefix}spk_mlp.2.weight"]), "bias": _t(sd[f"{prefix}spk_mlp.2.bias"])}
    p["mlp_1"] = {"kernel": dense_kernel(sd[f"{prefix}mlp.0.weight"]), "bias": _t(sd[f"{prefix}mlp.0.bias"])}
    p["mlp_2"] = {"kernel": dense_kernel(sd[f"{prefix}mlp.2.weight"]), "bias": _t(sd[f"{prefix}mlp.2.bias"])}

    n_levels = 0
    while f"{prefix}downs.{n_levels}.0.mlp.1.weight" in sd:
        n_levels += 1
    for i in range(n_levels):
        p[f"down_{i}_res1"] = _resnet_block(sd, f"{prefix}downs.{i}.0")
        p[f"down_{i}_res2"] = _resnet_block(sd, f"{prefix}downs.{i}.1")
        p[f"down_{i}_attn"] = _attn_block(sd, f"{prefix}downs.{i}.2")
        if f"{prefix}downs.{i}.3.conv.weight" in sd:
            p[f"down_{i}_ds"] = {
                "conv": {
                    "kernel": conv2d_kernel(sd[f"{prefix}downs.{i}.3.conv.weight"]),
                    "bias": _t(sd[f"{prefix}downs.{i}.3.conv.bias"]),
                }
            }
    p["mid_res1"] = _resnet_block(sd, f"{prefix}mid_block1")
    p["mid_attn"] = _attn_block(sd, f"{prefix}mid_attn")
    p["mid_res2"] = _resnet_block(sd, f"{prefix}mid_block2")

    j = 0
    while f"{prefix}ups.{j}.0.mlp.1.weight" in sd:
        p[f"up_{j}_res1"] = _resnet_block(sd, f"{prefix}ups.{j}.0")
        p[f"up_{j}_res2"] = _resnet_block(sd, f"{prefix}ups.{j}.1")
        p[f"up_{j}_attn"] = _attn_block(sd, f"{prefix}ups.{j}.2")
        p[f"up_{j}_us"] = {
            "kernel": convtranspose2d_kernel(sd[f"{prefix}ups.{j}.3.conv.weight"]),
            "bias": _t(sd[f"{prefix}ups.{j}.3.conv.bias"]),
        }
        j += 1

    p["final_block"] = {
        "conv": {
            "kernel": conv2d_kernel(sd[f"{prefix}final_block.block.0.weight"]),
            "bias": _t(sd[f"{prefix}final_block.block.0.bias"]),
        },
        "norm": {
            "scale": _t(sd[f"{prefix}final_block.block.1.weight"]),
            "bias": _t(sd[f"{prefix}final_block.block.1.bias"]),
        },
    }
    p["final_conv"] = {
        "kernel": conv1x1_dense(sd[f"{prefix}final_conv.weight"]),
        "bias": _t(sd[f"{prefix}final_conv.bias"]),
    }
    return p


def import_facetts(ckpt_path: str, target_variables=None) -> Tuple[Dict, Dict]:
    """Load a reference FaceTTS/.ckpt/.pt checkpoint -> (params, batch_stats).

    Applies the reference's GAN-aware filtering: discriminator and
    feature_extractor keys are stripped (inference.py:54-64, train.py:110-121)
    and unused keys (spk_fc, syncnet loss scalars wI/bI) are dropped —
    strict=False semantics."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {
        k: v for k, v in sd.items()
        if not k.startswith(("discriminator", "feature_extractor"))
    }
    params = {
        "encoder": import_text_encoder(sd, "encoder."),
        "decoder": {"estimator": import_unet(sd, "decoder.estimator.")},
    }
    syn_params, syn_stats = import_syncnet(sd, "syncnet.")
    params["syncnet"] = syn_params
    batch_stats = {"syncnet": syn_stats}

    params = jnp_tree(params)
    batch_stats = jnp_tree(batch_stats)
    if target_variables is not None:
        _check_shapes(target_variables["params"], params)
    return params, batch_stats


def import_syncnet_checkpoint(ckpt_path: str) -> Tuple[Dict, Dict]:
    """Standalone SyncNet pretrained checkpoint (reference config syncnet_ckpt,
    loaded by name-matching in syncnet_hifigan.py:91-99)."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    params, stats = import_syncnet(sd, prefix="")
    return jnp_tree(params), jnp_tree(stats)


def import_hifigan(ckpt_path: str) -> Dict[str, Any]:
    """bshall/hifigan generator checkpoint file -> HiFiGANGenerator params."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("generator", raw.get("state_dict", raw))
    sd = {re.sub(r"^(module\.|generator\.)", "", k): v for k, v in sd.items()}
    return import_hifigan_state_dict(sd)


def import_hifigan_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """HiFi-GAN V1 generator state_dict -> params.

    Folds weight norm; maps conv_pre / ups.N / resblocks.{n_res*i+j} /
    conv_post (standard HiFi-GAN module naming, n_res inferred)."""
    p: Dict[str, Any] = {
        "conv_pre": {
            "kernel": conv1d_kernel(fold_weight_norm(sd, "conv_pre")),
            "bias": _t(sd["conv_pre.bias"]),
        },
        "conv_post": {
            "kernel": conv1d_kernel(fold_weight_norm(sd, "conv_post")),
            "bias": _t(sd["conv_post.bias"]),
        },
    }
    n_ups = 0
    while f"ups.{n_ups}.bias" in sd:
        n_ups += 1
    n_blocks = 0
    while f"resblocks.{n_blocks}.convs1.0.bias" in sd:
        n_blocks += 1
    n_res = n_blocks // max(n_ups, 1)
    for i in range(n_ups):
        p[f"up_{i}_kernel"] = convtranspose1d_kernel(fold_weight_norm(sd, f"ups.{i}"))
        p[f"up_{i}_bias"] = _t(sd[f"ups.{i}.bias"])
        for j in range(n_res):
            rb = f"resblocks.{n_res * i + j}"
            blk: Dict[str, Any] = {}
            k = 0
            while f"{rb}.convs1.{k}.bias" in sd:
                blk[f"convs1_{k}"] = {
                    "kernel": conv1d_kernel(fold_weight_norm(sd, f"{rb}.convs1.{k}")),
                    "bias": _t(sd[f"{rb}.convs1.{k}.bias"]),
                }
                blk[f"convs2_{k}"] = {
                    "kernel": conv1d_kernel(fold_weight_norm(sd, f"{rb}.convs2.{k}")),
                    "bias": _t(sd[f"{rb}.convs2.{k}.bias"]),
                }
                k += 1
            p[f"res_{i}_{j}"] = blk
    return jnp_tree(p)


def import_discriminator(sd: Dict[str, Any], prefix: str = "discriminator.") -> Dict[str, Any]:
    """Reference SpectrogramDiscriminator state_dict -> params subtree
    (module layout: model/discriminator.py:24-43, weight-norm path).

    torch weight_norm keeps (weight_g, weight_v); flax WeightNorm keeps the
    direction under the conv's kernel and the per-output-channel scale under
    WeightNorm_{i}/<name>/kernel/scale.  Call-order WN indices: conv_prev=0,
    conv_0..conv_{n-1}=1..n, post_0=n+1, post_1=n+2 (no speaker path, as in
    GAN training where the discriminator is called without speaker_emb)."""

    def wn(torch_name: str):
        v = _t(sd[f"{prefix}{torch_name}.weight_v"])
        g = _t(sd[f"{prefix}{torch_name}.weight_g"])
        return conv2d_kernel(v), g.reshape(-1)

    p: Dict[str, Any] = {}
    names = [("conv_prev", "conv_prev")]
    i = 0
    while f"{prefix}convs.{i}.weight_v" in sd:
        names.append((f"convs.{i}", f"conv_{i}"))
        i += 1
    names += [("conv_post.0", "post_0"), ("conv_post.1", "post_1")]
    for wn_idx, (tname, fname) in enumerate(names):
        kernel, scale = wn(tname)
        p[fname] = {"kernel": kernel, "bias": _t(sd[f"{prefix}{tname}.bias"])}
        p[f"WeightNorm_{wn_idx}"] = {f"{fname}/kernel/scale": scale}
    return jnp_tree(p)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def jnp_tree(tree):
    import jax

    return jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), tree)


def _check_shapes(target, got):
    t = traverse_util.flatten_dict(target)
    g = traverse_util.flatten_dict(got)
    problems = []
    for k, v in g.items():
        if k not in t:
            problems.append(f"unexpected key {'/'.join(k)}")
        elif tuple(t[k].shape) != tuple(v.shape):
            problems.append(
                f"shape mismatch {'/'.join(k)}: ckpt {v.shape} vs model {t[k].shape}"
            )
    if problems:
        raise ValueError("torch import mismatch:\n  " + "\n  ".join(problems))


def merge_imported(target_params, imported):
    """strict=False merge: imported leaves override target leaves that exist;
    everything else keeps its (freshly initialized) value — the semantics of
    reference train.py:110-121."""
    t = traverse_util.flatten_dict(target_params)
    for k, v in traverse_util.flatten_dict(imported).items():
        if k in t and tuple(t[k].shape) == tuple(np.shape(v)):
            t[k] = v
    return traverse_util.unflatten_dict(t)
