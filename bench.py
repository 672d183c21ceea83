"""Headline benchmark: denoise steps/sec/chip on the flagship v1-size model
(latent 6x16x16x64, UNet base_units 256, depth [4,4], axial attention),
producing 6x128x128 SEVIR-LR forecasts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 50 denoise steps/sec/chip.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def _wait_for_tpu(total_budget_s=900.0, sleep_s=30.0):
    """Block until the axon TPU relay initializes, or the budget runs out.

    The relay occasionally drops for minutes at a time (observed 2026-08-20:
    libtpu init failed with TPU_ACCELERATOR_TYPE/TPU_WORKER_HOSTNAMES errors
    and jax silently fell back to CPU, recording 0.13 steps/s as the
    headline).  Backend selection is sticky per-process, so probe in a
    subprocess and only import jax here once a probe sees a TPU.

    Returns True if a TPU backend is available, False if the budget expired.
    """
    total_budget_s = float(os.environ.get("BENCH_TPU_WAIT_S", total_budget_s))
    probe = (
        "import jax, sys; "
        "sys.exit(0 if jax.default_backend() == 'tpu' else 1)"
    )
    deadline = time.monotonic() + total_budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=300,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        print(
            f"bench: TPU backend unavailable (probe attempt {attempt}); "
            f"retrying for another {remaining:.0f}s",
            file=sys.stderr,
        )
        time.sleep(min(sleep_s, max(remaining, 1.0)))

# Structural fingerprint of the compiled v1 sampler: pallas_call count per
# kernel name in the traced jaxpr, with per-call-site MULTIPLICITY (shared
# tracing-cache jaxprs are counted once per reference; the denoise scan's
# body still counts once — these are the static counts of one UNet + VAE
# program).  A silent kernel-gate regression — e.g. round-3's f32-counted
# VMEM gate pushing 24 stage-1 FFN sites to XLA, a 10% bench loss found
# only by a manual xplane hunt (probe62) — changes these counts, and the
# bench fails loudly instead (VERDICT r3 #7).  Re-pin deliberately when
# gates change; set BENCH_SKIP_GATE_GUARD=1 to bypass for experiments.
EXPECTED_PALLAS_COUNTS = {
    "fused_groupnorm_silu": 66,
    "fused_axial_attention_5d": 48,
    "fused_ffn": 48,
}


def main():
    have_tpu = _wait_for_tpu()
    if not have_tpu:
        print(
            "bench: TPU relay still down after the wait budget; running on "
            "the fallback backend — the reported number is NOT a TPU "
            "measurement.",
            file=sys.stderr,
        )

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

    if (jax.default_backend() == "tpu"
            and not os.environ.get("BENCH_SKIP_GATE_GUARD")):
        from prediff_tpu.utils.profiling import count_pallas_calls

        got = count_pallas_calls(run, 0)
        if got != EXPECTED_PALLAS_COUNTS:
            print(
                "KERNEL GATE GUARD FAILED: pallas_call fingerprint of the "
                f"v1 sampler changed.\n  expected: {EXPECTED_PALLAS_COUNTS}"
                f"\n  got:      {got}\n"
                "A gate silently (de)activated a fused kernel (cf. probe62, "
                "a 10% regression).  If the change is deliberate, re-pin "
                "EXPECTED_PALLAS_COUNTS in bench.py.",
                file=sys.stderr,
            )
            raise SystemExit(2)

    out = run(0)  # compile + warmup
    _ = float(np.asarray(out))

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(np.asarray(run(i + 1)))
    dt = (time.perf_counter() - t0) / iters

    steps_per_sec = n_steps / dt
    unit = "steps/s/chip (v1 UNet, B=1, 6x16x16x64 latent, incl. VAE enc+dec)"
    if jax.default_backend() != "tpu":
        unit += " [NON-TPU FALLBACK: relay was down; not a TPU measurement]"
    result = {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": unit,
        "vs_baseline": round(steps_per_sec / 50.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
