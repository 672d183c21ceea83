"""Round-4 probe: in-kernel PRNG dropout validation (VERDICT r3 #2).

pltpu.prng_* has no interpret-mode lowering, so the CPU suite can only test
the gate logic — the numerics are validated HERE on the real chip:

  1. mask statistics: E[y]/E[x] ~= 1 (inverted-scaling unbiasedness) and the
     realized keep fraction ~= 1-rate for both FFN masks and both attention
     masks (recovered from zero patterns at rate 0.5);
  2. determinism: same seed -> bit-identical outputs; different seed ->
     different masks;
  3. forward/backward mask consistency: directional derivative
     (f(x+eps v) - f(x-eps v)) / 2eps  ==  <grad f, v>  with the SAME seed
     (only holds if the backward regenerates exactly the forward's masks);
  4. train-vs-eval expectation: mean over many seeds of the dropout forward
     approaches the deterministic forward (loosely, CLT bound).

Protocol (CLAUDE.md): single process, warmup first, device-scalar fetches.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.ops import pallas_ffn as pf  # noqa: E402
from prediff_tpu.ops import pallas_attention as pa  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu", "this probe needs the real chip"

rs = np.random.RandomState(0)
TOK, C, HID = 1024, 256, 1024
x = jnp.asarray(rs.randn(TOK, C).astype(np.float32) * 0.5)
gam = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
bet = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
w1 = jnp.asarray((rs.randn(C, HID) * 0.05).astype(np.float32))
b1 = jnp.asarray((0.02 * rs.randn(HID)).astype(np.float32))
w2 = jnp.asarray((rs.randn(HID, C) * 0.05).astype(np.float32))
b2 = jnp.asarray((0.02 * rs.randn(C)).astype(np.float32))
seed = jnp.asarray([1234, 5678], jnp.uint32)
seed_b = jnp.asarray([4321, 8765], jnp.uint32)
RATE = 0.5

assert pf.supports_dropout_shape(TOK, C, HID)

ffn_det = pf.fused_ffn(x, gam, bet, w1, b1, w2, b2, activation="gelu")
ffn_drop = lambda s: pf.fused_ffn_dropout(  # noqa: E731
    x, s, gam, bet, w1, b1, w2, b2, activation="gelu",
    rate_act=RATE, rate_out=RATE)

# ---- 1/2: determinism + statistics ------------------------------------- #
y1 = np.asarray(ffn_drop(seed))
y2 = np.asarray(ffn_drop(seed))
y3 = np.asarray(ffn_drop(seed_b))
assert (y1 == y2).all(), "same seed must be bit-identical"
assert (y1 != y3).any(), "different seed must differ"
# out-dropout keep fraction: the FFN adds the residual x, so recover the
# mask zeros from (y - x) == 0 (out=0 exactly where the final mask dropped)
kept = float(np.mean(np.abs(y1 - np.asarray(x)) > 0))
print(f"FFN realized keep fraction {kept:.4f} (expect ~{1-RATE:.2f})",
      flush=True)
assert abs(kept - (1 - RATE)) < 0.02, kept

# unbiasedness: average the dropout FFN over many seeds -> deterministic FFN
N_SEEDS = 64
acc = np.zeros_like(y1, dtype=np.float64)
for i in range(N_SEEDS):
    acc += np.asarray(ffn_drop(jnp.asarray([17 + i, 99 - i], jnp.uint32)))
mean_out = acc / N_SEEDS
det = np.asarray(ffn_det)
# compare the FFN branch (subtract the residual x) in aggregate
num = np.abs((mean_out - np.asarray(x)).mean() - (det - np.asarray(x)).mean())
den = np.abs((det - np.asarray(x))).mean()
print(f"FFN mean-over-seeds branch bias {num/den:.4f} "
      f"(CLT noise ~{1/np.sqrt(N_SEEDS * TOK):.4f} scale)", flush=True)
assert num / den < 0.1

# ---- 3: fwd/bwd mask consistency (directional derivative) -------------- #
v = jnp.asarray(rs.randn(TOK, C).astype(np.float32))
cot = jnp.asarray(rs.randn(TOK, C).astype(np.float32))


def f_scalar(xx):
    return jnp.vdot(pf.fused_ffn_dropout_diff(
        xx, seed, gam, bet, w1, b1, w2, b2, 1e-5, "gelu", RATE, RATE), cot)


g = jax.grad(f_scalar)(x)
lhs = float(jnp.vdot(g, v))
eps = 1e-3
rhs = float((f_scalar(x + eps * v) - f_scalar(x - eps * v)) / (2 * eps))
print(f"FFN directional derivative: grad {lhs:.4f} vs FD {rhs:.4f} "
      f"(rel {abs(lhs-rhs)/max(abs(rhs),1e-6):.4f})", flush=True)
assert abs(lhs - rhs) / max(abs(rhs), 1e-6) < 0.05

# param-grad consistency: dW2 via the dropout bwd vs autodiff of a jnp
# reference sharing the SAME masks is impossible off-kernel; instead check
# db2 == sum over kept rows of cot * mask2/(1-r): recover mask2 from fwd
mask2 = (np.abs(y1 - np.asarray(x)) > 0).astype(np.float64)


def loss_b2(bb):
    return jnp.vdot(pf.fused_ffn_dropout_diff(
        x, seed, gam, bet, w1, b1, w2, bb, 1e-5, "gelu", RATE, RATE), cot)


db2 = np.asarray(jax.grad(loss_b2)(b2))
want_db2 = (np.asarray(cot) * mask2 / (1 - RATE)).sum(axis=0)
rel = np.abs(db2 - want_db2).max() / max(np.abs(want_db2).max(), 1e-6)
print(f"FFN db2 vs mask-recovered expectation: max rel {rel:.5f}", flush=True)
assert rel < 5e-3, rel

# ---- attention kernel dropout ------------------------------------------ #
B, T, H, W, AC, HEADS = 2, 13, 16, 16, 256, 4
ax = jnp.asarray(rs.randn(B, T, H, W, AC).astype(np.float32) * 0.5)
agam = jnp.asarray(1.0 + 0.1 * rs.randn(AC).astype(np.float32))
abet = jnp.asarray(0.1 * rs.randn(AC).astype(np.float32))
awqkv = jnp.asarray((rs.randn(AC, 3 * AC) * 0.05).astype(np.float32))
abias = jnp.asarray(rs.randn(HEADS, T, T).astype(np.float32) * 0.3)
awproj = jnp.asarray((rs.randn(AC, AC) * 0.05).astype(np.float32))
abproj = jnp.asarray((0.02 * rs.randn(AC)).astype(np.float32))
scale = (AC // HEADS) ** -0.5

plan = pa.axial_attention_plan(ax.shape, 0, num_heads=HEADS)
assert plan is not None and pa.supports_attention_dropout(
    plan["R"], plan["vol"], AC, HEADS)

att = lambda s: pa.fused_axial_attention_5d(  # noqa: E731
    ax, 0, agam, abet, awqkv, abias, awproj, abproj, HEADS, scale,
    seed=s, rate_attn=RATE, rate_proj=RATE)
a1, a2, a3 = np.asarray(att(seed)), np.asarray(att(seed)), np.asarray(att(seed_b))
assert (a1 == a2).all() and (a1 != a3).any()
kept_a = float(np.mean(np.abs(a1) > 0))  # dropped proj entries are exact 0
print(f"attn proj-mask keep fraction {kept_a:.4f} (expect ~{1-RATE:.2f})",
      flush=True)
assert abs(kept_a - (1 - RATE)) < 0.02, kept_a

acot = jnp.asarray(rs.randn(*ax.shape).astype(np.float32))
av = jnp.asarray(rs.randn(*ax.shape).astype(np.float32))


def fa_scalar(xx):
    return jnp.vdot(pa.fused_axial_attention_5d_dropout_diff(
        xx, seed, 0, agam, abet, awqkv, abias, awproj, abproj,
        HEADS, scale, 1e-5, RATE, RATE), acot)


ga = jax.grad(fa_scalar)(ax)
lhs = float(jnp.vdot(ga, av))
rhs = float((fa_scalar(ax + eps * av) - fa_scalar(ax - eps * av)) / (2 * eps))
print(f"attn directional derivative: grad {lhs:.4f} vs FD {rhs:.4f} "
      f"(rel {abs(lhs-rhs)/max(abs(rhs),1e-6):.4f})", flush=True)
assert abs(lhs - rhs) / max(abs(rhs), 1e-6) < 0.05

print("probe67 PASS", flush=True)
