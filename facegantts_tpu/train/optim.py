"""Optimizer / LR-schedule factory.

Mirrors the reference factory (utils/scheduler.py:12-71): adam / adamw /
adam_diff (syncnet LR x 1e-7) / sgd crossed with constant / cosine / linear /
polynomial-decay-with-warmup schedules selected by `decay_power` (the
reference overloads that key as the selector), plus the GAN pair of plain
Adams (face_tts_w_discriminator.py:116-125).

Parameter partitioning replaces torch's requires_grad mutation: the frozen
SyncNet audio trunk (reference face_tts.py:81-82) — or the whole SyncNet in
GAN mode, whose optimizer covers encoder+decoder only — is routed to
`optax.set_to_zero()` via multi_transform labels.
"""

from typing import Any, Callable, Dict

import optax
from flax import traverse_util

from facegantts_tpu.config import Config


def build_schedule(cfg: Config) -> optax.Schedule:
    lr, end_lr = cfg.learning_rate, cfg.end_lr
    warmup = int(cfg.warmup_steps)
    total = max(cfg.max_steps, warmup + 1)
    sel = cfg.decay_power  # reference scheduler.py:51-70 switches on this
    warm = optax.linear_schedule(0.0, lr, max(warmup, 1))
    if sel == "cosine":
        main = optax.cosine_decay_schedule(lr, total - warmup)
    elif sel == "linear":
        main = optax.linear_schedule(lr, 0.0, total - warmup)
    elif sel == "constant":
        main = optax.constant_schedule(lr)
    else:  # polynomial decay to end_lr with power=decay_power
        main = optax.polynomial_schedule(
            init_value=lr, end_value=end_lr, power=float(sel),
            transition_steps=total - warmup,
        )
    if warmup <= 0:
        return main
    return optax.join_schedules([warm, main], [warmup])


def _label_params(params: Dict[str, Any], is_frozen: Callable[[tuple], bool]):
    flat = traverse_util.flatten_dict(params)
    labels = {k: ("frozen" if is_frozen(k) else "train") for k in flat}
    return traverse_util.unflatten_dict(labels)


def frozen_aud_trunk(path: tuple) -> bool:
    """Plain-FaceTTS freeze rule: only the SyncNet audio CNN is frozen
    (reference face_tts.py:81-82 freezes netcnnaud; the fc head trains)."""
    return len(path) >= 2 and path[0] == "syncnet" and str(path[1]).startswith("aud_c")


def frozen_all_syncnet(path: tuple) -> bool:
    """GAN-mode rule: generator optimizer covers encoder+decoder only
    (reference face_tts_w_discriminator.py:120-123)."""
    return len(path) >= 1 and path[0] == "syncnet"


def _base_optimizer(cfg: Config, schedule) -> optax.GradientTransformation:
    if cfg.optim_type == "adamw":
        return optax.adamw(schedule, b1=0.9, b2=0.98, eps=1e-8, weight_decay=cfg.weight_decay)
    if cfg.optim_type == "sgd":
        return optax.chain(
            optax.add_decayed_weights(1e-5), optax.sgd(schedule, momentum=0.9)
        )
    # adam / adam_diff
    return optax.adam(schedule, eps=cfg.gen_eps)


def build_generator_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    """Optimizer for the full generator (plain FaceTTS training path)."""
    schedule = build_schedule(cfg)
    base = _base_optimizer(cfg, schedule)
    if cfg.optim_type == "adam_diff":
        # syncnet params at lr * 1e-7 (reference scheduler.py:29-45)
        slow_schedule = build_schedule(cfg.replace(learning_rate=cfg.learning_rate * 1e-7))
        slow = optax.adam(slow_schedule, eps=cfg.gen_eps)
        flat = traverse_util.flatten_dict(params)
        labels = traverse_util.unflatten_dict(
            {k: ("syncnet" if (len(k) >= 1 and k[0] == "syncnet") else "train") for k in flat}
        )
        tx = optax.multi_transform({"train": base, "syncnet": slow}, labels)
    else:
        labels = _label_params(params, frozen_aud_trunk)
        tx = optax.multi_transform({"train": base, "frozen": optax.set_to_zero()}, labels)
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)


def build_gan_generator_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    """Plain Adam over encoder+decoder only (reference
    face_tts_w_discriminator.py:120-123).

    The reference clips the ENCODER and DECODER gradient norms SEPARATELY
    (`clip_grad_norm_(encoder.parameters(), 1)` then the same for decoder,
    face_tts_w_discriminator.py:312-313) and its optimizer never sees
    syncnet parameters — so each group gets its own clip-then-adam chain
    here, and syncnet gradients play no role at all (the train step
    stop-gradients that frozen subtree so XLA drops its backward
    entirely)."""
    flat = traverse_util.flatten_dict(params)

    def label(path: tuple) -> str:
        if frozen_all_syncnet(path):
            return "frozen"
        return str(path[0]) if path[0] in ("encoder", "decoder") else "encoder"

    labels = traverse_util.unflatten_dict({k: label(k) for k in flat})

    def group_tx():
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(cfg.learning_rate, eps=cfg.gen_eps),
        )

    return optax.multi_transform(
        {"encoder": group_tx(), "decoder": group_tx(),
         "frozen": optax.set_to_zero()},
        labels,
    )


def build_discriminator_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(
            cfg.disc_learning_rate, b1=cfg.disc_betas_0, b2=cfg.disc_betas_1,
            eps=cfg.disc_eps,
        ),
    )
