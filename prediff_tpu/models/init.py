"""Weight-init modes matching the reference's `apply_initialization`
(ref: src/prediff/models/utils.py:273-341), expressed as flax initializers.

Modes:
  linear "0": kaiming-normal, fan_in, linear gain         -> N(0, 1/fan_in)
  linear "1": kaiming-normal, fan_out, leaky_relu(a=0.1)  -> N(0, 2/(1.01*fan_out))
  linear "2": zeros
  conv   "0": torch Conv default (kaiming-uniform a=sqrt5) -> U(+-sqrt(1/fan_in))
  conv   "1": kaiming-normal fan_out leaky_relu(a=0.1)
  conv   "2": zeros
  embed  "0": trunc-normal std=0.02
"""
from jax.nn import initializers as jinit


def linear_init(mode: str):
    if mode == "0":
        return jinit.variance_scaling(1.0, "fan_in", "normal")
    if mode == "1":
        return jinit.variance_scaling(2.0 / (1.0 + 0.1**2), "fan_out", "normal")
    if mode == "2":
        return jinit.zeros
    raise NotImplementedError(f"linear init mode '{mode}'")


def conv_init(mode: str):
    if mode == "0":
        # torch default: kaiming_uniform(a=sqrt(5)) == U(-b, b), b = sqrt(1/fan_in)
        return jinit.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    if mode == "1":
        return jinit.variance_scaling(2.0 / (1.0 + 0.1**2), "fan_out", "normal")
    if mode == "2":
        return jinit.zeros
    raise NotImplementedError(f"conv init mode '{mode}'")


def embed_init(mode: str = "0", std: float = 0.02):
    if mode == "0":
        return jinit.truncated_normal(stddev=std)
    raise NotImplementedError(f"embed init mode '{mode}'")


def trunc_normal(std: float = 0.02):
    return jinit.truncated_normal(stddev=std)
