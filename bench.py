"""North-star benchmark: clips/sec/chip fwd+bwd on 16×224×224 clips.

Runs the flagship ViViT training step (fwd + bwd + optimizer update, bf16,
Pallas flash attention) on the local accelerator and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against the BASELINE.json north-star target of
1,500 clips/sec/chip (the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_CLIPS_PER_SEC = 1500.0


def run_bench(batch_size: int = 32, frames: int = 16, image: int = 224,
              iters: int = 20, warmup: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from devt_tpu.config import Config
    from devt_tpu.models.vivit import ViViT
    from devt_tpu.parallel.train_step import make_train_step
    from devt_tpu.train.optimizers import build_optimizer
    from devt_tpu.train.state import TrainState

    cfg = Config(model="vivit", batch_size=batch_size, frame_len=frames,
                 n_classes=19, opt="adamW", learning_rate=1e-4,
                 precision="bf16", accum_steps=1)
    model = ViViT(image_size=image, patch_size=16, num_classes=19,
                  num_frames=frames, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch = {
        "vid": jnp.asarray(rng.standard_normal(
            (batch_size, frames, 3, image, image), dtype=np.float32),
            jnp.bfloat16),
        "label": jnp.asarray(
            (rng.random((batch_size, 19)) < 0.3).astype(np.float32)),
    }

    variables = model.init(jax.random.PRNGKey(0), batch["vid"])
    tx = build_optimizer(cfg)
    state = TrainState.create(variables["params"], tx)
    train_step = make_train_step(model, cfg)
    step_rng = jax.random.PRNGKey(1)

    # NOTE: block_until_ready is unreliable on the tunneled axon platform
    # (returns before execution completes) — a host readback of the loss is
    # the trustworthy sync point.  The loss of step N depends on the state
    # chain through all prior steps, so one readback times the whole run.
    for _ in range(warmup):
        state, metrics = train_step(state, batch, step_rng)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, step_rng)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = batch_size * iters / dt
    return {
        "metric": "clips/sec/chip fwd+bwd (16x224x224 clips, ViViT bf16)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 4),
        "detail": {
            "batch_size": batch_size,
            "frames": frames,
            "image": image,
            "iters": iters,
            "step_ms": round(dt / iters * 1e3, 3),
            "backend": jax.default_backend(),
            "loss_finite": bool(jnp.isfinite(metrics["loss"])),
        },
    }


def main():
    try:
        result = run_bench()
    except Exception as e:  # still emit one parseable line on failure
        result = {"metric": "clips/sec/chip fwd+bwd (16x224x224 clips)",
                  "value": 0.0, "unit": "clips/sec/chip",
                  "vs_baseline": 0.0, "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(result))
    return 0 if result.get("value", 0) > 0 else 1


def _watchdog_main(timeout_s: int = 1500) -> int:
    """Run the bench in a subprocess with a hard timeout.

    The tunneled TPU backend can wedge indefinitely (in-flight remote
    compiles survive client death — see .claude/skills/verify/SKILL.md);
    a hang must still produce one parseable JSON line.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--inner"],
            capture_output=True, text=True, timeout=timeout_s)
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line)
                return proc.returncode
        print(json.dumps({
            "metric": "clips/sec/chip fwd+bwd (16x224x224 clips)",
            "value": 0.0, "unit": "clips/sec/chip", "vs_baseline": 0.0,
            "error": f"no JSON emitted; stderr tail: "
                     f"{(proc.stderr or '')[-300:]}"}))
        return 1
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "clips/sec/chip fwd+bwd (16x224x224 clips)",
            "value": 0.0, "unit": "clips/sec/chip", "vs_baseline": 0.0,
            "error": f"bench timed out after {timeout_s}s (TPU backend "
                     f"unresponsive)"}))
        return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        sys.exit(main())
    sys.exit(_watchdog_main())
