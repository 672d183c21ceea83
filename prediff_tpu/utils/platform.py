"""Platform selection helper.

Some environments register an accelerator plugin in sitecustomize and
force-override jax's platform config at import; this restores the standard
behavior that the JAX_PLATFORMS env var wins (e.g. JAX_PLATFORMS=cpu for
CI/smoke runs)."""
import os


def respect_jax_platforms_env():
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        jax.config.update("jax_platforms", env)
    except Exception:
        pass
