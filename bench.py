"""Headline benchmark: denoise steps/sec/chip on the flagship v1-size model
(latent 6x16x16x64, UNet base_units 256, depth [4,4], axial attention),
producing 6x128x128 SEVIR-LR forecasts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 50 denoise steps/sec/chip.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from prediff_tpu.config import prediff_default_config
    from prediff_tpu.factory import build_pipeline

    cfg = prediff_default_config()
    rng = jax.random.PRNGKey(0)
    ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)

    B = 1
    y = jnp.asarray(
        np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32)
    )

    n_steps = 100  # measure a 100-step scanned chain, report per-step rate

    def run(seed):
        out = ld.sample(
            params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
            timesteps=n_steps, return_decoded=True,
        )
        # Device-side reduction, then fetch the 4-byte scalar: still forces
        # the whole pipeline to execute (the sum depends on every output
        # element; async relays can make block_until_ready unreliable), but
        # doesn't charge the benchmark for shipping the full video through
        # the host tunnel (~30-40 ms at relay bandwidth).
        return jnp.sum(out)

    out = run(0)  # compile + warmup
    _ = float(np.asarray(out))

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(np.asarray(run(i + 1)))
    dt = (time.perf_counter() - t0) / iters

    steps_per_sec = n_steps / dt
    result = {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s/chip (v1 UNet, B=1, 6x16x16x64 latent, incl. VAE enc+dec)",
        "vs_baseline": round(steps_per_sec / 50.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
