"""Capture a device trace of the GAN training step and rank op costs.

Runs the bench-shape GAN step (batch 32 = 2 micro-batches of 16, tx=128,
ty=436, T=10, R1 on) under ``jax.profiler.trace`` on the real chip, then
parses the dumped ``*.trace.json.gz`` and prints the top device ops by
total self-time — the evidence base for kernel-fusion work (VERDICT r1
next-step #4).

Usage:  python scripts/profile_gan_step.py [out_dir] [top_n]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(out_dir: str, n_steps: int = 3):
    import time

    import jax
    import jax.numpy as jnp

    from facegantts_tpu.config import default_config
    from facegantts_tpu.train import init_state, make_gan_train_step
    from facegantts_tpu.train.state import Batch
    from facegantts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.monotonic()
    hb = lambda s: print(f"[profile +{time.monotonic()-t0:6.1f}s] {s}",  # noqa: E731
                         flush=True)
    # config overrides via PROF_OVERRIDES={"key": "val", ...} (JSON) so the
    # matrix winner can be traced without editing this file
    import json as _json

    overrides = _json.loads(os.environ.get("PROF_OVERRIDES", "{}"))
    cfg = default_config(env={}, overrides=overrides)
    if overrides:
        hb(f"overrides: {overrides}")
    b, tx, ty = cfg.micro_batch_size * 2, 128, 436
    rng = jax.random.PRNGKey(0)
    batch = Batch(
        x=jax.random.randint(rng, (b, tx), 0, 100),
        x_len=jnp.full((b,), tx, jnp.int32),
        y=jax.random.normal(rng, (b, cfg.n_mels, ty)),
        y_len=jnp.full((b,), ty, jnp.int32),
        spk=jax.random.normal(rng, (b, cfg.image_size, cfg.image_size, 3)),
    )
    hb("init_state (jitted)")
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    step, _ = make_gan_train_step(cfg)
    hb("compile + first step")
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["g_loss"])  # materialize (block_until_ready is async on axon)
    hb("tracing")
    jax.profiler.start_trace(out_dir)
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        float(m["g_loss"])
    jax.profiler.stop_trace()
    hb("trace done")
    return n_steps


def summarize(out_dir: str, n_steps: int, top_n: int = 40):
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no trace files under {out_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process name mentions TPU/device XLA ops
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA Ops" in n}
    agg = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            # strip uniquifying suffices: fusion.123 -> fusion
            name = e["name"].split(".")[0]
            agg[name] += e["dur"]
            counts[name] += 1
    total = sum(agg.values())
    print(f"\ntrace: {path}")
    print(f"device self-time total: {total/1e3/n_steps:.1f} ms/step over {n_steps} steps")
    print(f"{'op':<40}{'ms/step':>10}{'%':>7}{'count/step':>12}")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name:<40}{us/1e3/n_steps:>10.2f}{100*us/total:>6.1f}%"
              f"{counts[name]/n_steps:>12.1f}")
    # also: top individual (un-stripped) events, to find single hot fusions
    solo = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            solo[e["name"]] += e["dur"]
    print("\ntop individual ops:")
    for name, us in sorted(solo.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name:<56}{us/1e3/n_steps:>10.2f} ms/step")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gan_step_trace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n = run_and_trace(out)
    summarize(out, n, top)
