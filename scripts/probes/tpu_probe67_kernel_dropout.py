"""Round-4 probe: in-kernel PRNG dropout validation (VERDICT r3 #2).

pltpu.prng_* has no interpret-mode lowering, so the CPU suite can only test
the gate logic — the numerics are validated HERE on the real chip:

  1. mask statistics: realized keep fraction ~= 1-rate, and the mean over
     many seeds of the dropout forward approaches the deterministic forward
     (inverted-scaling unbiasedness, CLT bound);
  2. determinism: same seed -> bit-identical outputs AND grads; different
     seed -> different masks;
  3. forward/backward mask consistency — EXACT checks (a directional
     derivative is useless here: the axon terminal compiles with
     --xla_allow_excess_precision=true, the forward carries ~1e-3 relative
     bf16 rounding whatever mxu dtype is requested, and /(2 eps) amplifies
     that to ~10-100%% of the true derivative; first probe67 run read pure
     noise):
       a. rate 0: the dropout backward must be BIT-IDENTICAL to the
          independently validated (probe65 + interpret-mode A/B) full
          backward, for dx and every parameter grad;
       b. m2 (out mask): db2 == sum_rows cot*m2/(1-r) with m2 recovered
          exactly from the forward's zero pattern;
       c. m1 (hidden mask): with w2 = I (HID == C) and rate_out = 0, the
          forward's zero pattern recovers m1 exactly; all kernel grads are
          then compared against jnp autodiff of a reference carrying the
          recovered m1 (bf16-rounding tolerance);
       d. attention: rate0 bit-equality vs the validated full backward +
          db_proj exactness.  db_proj also pins the PRNG stream POSITION:
          the proj mask is drawn AFTER the H head-mask draws in both
          kernels, so a backward that drew head masks in a different
          order/shape would read its proj mask from a shifted stream and
          fail this check.

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

cot = jnp.asarray(rs.randn(TOK, C).astype(np.float32))

# ---- 3a: rate0 — dropout bwd == validated full bwd, every output ------- #
grads_drop0 = jax.grad(
    lambda *p: jnp.vdot(pf.fused_ffn_dropout_diff(
        p[0], seed, *p[1:], 1e-5, "gelu", 0.0, 0.0), cot),
    argnums=tuple(range(7)))(x, gam, bet, w1, b1, w2, b2)
grads_ref0 = jax.grad(
    lambda *p: jnp.vdot(pf.fused_ffn_diff(
        *p, 1e-5, "gelu", "bfloat16", False, True), cot),
    argnums=tuple(range(7)))(x, gam, bet, w1, b1, w2, b2)
for name, a, b in zip(("dx", "dgam", "dbet", "dw1", "db1", "dw2", "db2"),
                      grads_drop0, grads_ref0):
    d = float(jnp.max(jnp.abs(a - b)))
    assert d == 0.0, (name, d)
print("FFN rate0: dropout bwd BIT-IDENTICAL to validated full bwd "
      "(7/7 grads)", flush=True)

# ---- 3b: m2 exactness — db2 == sum cot*m2/(1-r) ------------------------ #
mask2 = (np.abs(y1 - np.asarray(x)) > 0).astype(np.float64)


def loss_b2(bb):
    return jnp.vdot(pf.fused_ffn_dropout_diff(
        x, seed, gam, bet, w1, b1, w2, bb, 1e-5, "gelu", RATE, RATE), cot)


db2 = np.asarray(jax.grad(loss_b2)(b2))
want_db2 = (np.asarray(cot) * mask2 / (1 - RATE)).sum(axis=0)
rel = np.abs(db2 - want_db2).max() / max(np.abs(want_db2).max(), 1e-6)
print(f"FFN db2 vs mask-recovered expectation: max rel {rel:.5f}", flush=True)
assert rel < 5e-3, rel

# grad determinism: same seed -> identical grads, different seed -> differ
g1 = np.asarray(jax.grad(lambda q: jnp.vdot(pf.fused_ffn_dropout_diff(
    q, seed, gam, bet, w1, b1, w2, b2, 1e-5, "gelu", RATE, RATE), cot))(x))
g2 = np.asarray(jax.grad(lambda q: jnp.vdot(pf.fused_ffn_dropout_diff(
    q, seed, gam, bet, w1, b1, w2, b2, 1e-5, "gelu", RATE, RATE), cot))(x))
g3 = np.asarray(jax.grad(lambda q: jnp.vdot(pf.fused_ffn_dropout_diff(
    q, seed_b, gam, bet, w1, b1, w2, b2, 1e-5, "gelu", RATE, RATE), cot))(x))
assert (g1 == g2).all() and (g1 != g3).any()
print("FFN grad determinism: same-seed identical, cross-seed differs",
      flush=True)

# ---- 3c: m1 consistency — w2=I recovery + jnp reference grads ---------- #
CI = C  # HID == C so w2 can be the identity
assert pf.supports_dropout_shape(TOK, CI, CI)
w1s = jnp.asarray((rs.randn(CI, CI) * 0.05).astype(np.float32))
b1s = jnp.asarray((0.02 * rs.randn(CI)).astype(np.float32))
eye = jnp.eye(CI, dtype=jnp.float32)
zb = jnp.zeros((CI,), jnp.float32)
y_id = np.asarray(pf.fused_ffn_dropout(
    x, seed, gam, bet, w1s, b1s, eye, zb, activation="gelu",
    rate_act=RATE, rate_out=0.0))
m1 = (np.abs(y_id - np.asarray(x)) > 0).astype(np.float32)  # exact
kept1 = float(m1.mean())
print(f"FFN act-mask keep fraction {kept1:.4f} (expect ~{1-RATE:.2f})",
      flush=True)
assert abs(kept1 - (1 - RATE)) < 0.02, kept1
m1j = jnp.asarray(m1)


def ref_with_m1(xx, gg, bb, ww1, bb1, ww2, bb2):
    mu = jnp.mean(xx, -1, keepdims=True)
    var = jnp.mean(jnp.square(xx - mu), -1, keepdims=True)
    ln = (xx - mu) * jax.lax.rsqrt(var + 1e-5) * gg + bb
    z = ln @ ww1 + bb1
    a = z * 0.5 * (1.0 + jax.lax.erf(z * (2.0 ** -0.5)))
    a = a * m1j / (1 - RATE)
    return xx + a @ ww2 + bb2


args = (x, gam, bet, w1s, b1s, eye, zb)
gk = jax.grad(lambda *p: jnp.vdot(pf.fused_ffn_dropout_diff(
    p[0], seed, *p[1:], 1e-5, "gelu", RATE, 0.0), cot),
    argnums=tuple(range(7)))(*args)
gr = jax.grad(lambda *p: jnp.vdot(ref_with_m1(*p), cot),
              argnums=tuple(range(7)))(*args)
for name, a, b in zip(("dx", "dgam", "dbet", "dw1", "db1", "dw2", "db2"),
                      gk, gr):
    aa, bb_ = np.asarray(a, np.float64), np.asarray(b, np.float64)
    rel = np.abs(aa - bb_).max() / max(np.abs(bb_).max(), 1e-6)
    print(f"  m1-chain {name}: max rel {rel:.5f}", flush=True)
    # bf16-rounding scale; a mask mismatch would be O(1) on masked entries
    assert rel < 0.03, (name, rel)
print("FFN m1 fwd/bwd consistency: kernel grads match jnp reference "
      "carrying the forward-recovered mask", flush=True)

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
APARAMS = (ax, agam, abet, awqkv, abias, awproj, abproj)

# rate0: dropout bwd == validated full bwd, bit-identical, all grads
gad = jax.grad(lambda *p: jnp.vdot(pa.fused_axial_attention_5d_dropout_diff(
    p[0], seed, 0, *p[1:], HEADS, scale, 1e-5, 0.0, 0.0), acot),
    argnums=tuple(range(7)))(*APARAMS)
gar = jax.grad(lambda *p: jnp.vdot(pa.fused_axial_attention_5d_diff(
    p[0], 0, *p[1:], HEADS, scale, 1e-5, "bfloat16", False, True), acot),
    argnums=tuple(range(7)))(*APARAMS)
for name, a, b in zip(("dx", "dgam", "dbet", "dwqkv", "dbias", "dwproj",
                       "dbproj"), gad, gar):
    d = float(jnp.max(jnp.abs(a - b)))
    assert d == 0.0, (name, d)
print("attn rate0: dropout bwd BIT-IDENTICAL to validated full bwd "
      "(7/7 grads)", flush=True)

# db_proj exactness (validates m_proj AND the stream position after the
# H head-mask draws)
mask_p = (np.abs(a1) > 0).astype(np.float64).reshape(-1, AC)


def loss_bp(bb):
    return jnp.vdot(pa.fused_axial_attention_5d_dropout_diff(
        ax, seed, 0, agam, abet, awqkv, abias, awproj, bb,
        HEADS, scale, 1e-5, RATE, RATE), acot)


dbp = np.asarray(jax.grad(loss_bp)(abproj))
want_dbp = (np.asarray(acot).reshape(-1, AC) * mask_p / (1 - RATE)).sum(axis=0)
rel = np.abs(dbp - want_dbp).max() / max(np.abs(want_dbp).max(), 1e-6)
print(f"attn db_proj vs mask-recovered expectation: max rel {rel:.5f}",
      flush=True)
assert rel < 5e-3, rel

# grad determinism across seeds
ag1 = np.asarray(jax.grad(lambda q: jnp.vdot(
    pa.fused_axial_attention_5d_dropout_diff(
        q, seed, 0, agam, abet, awqkv, abias, awproj, abproj,
        HEADS, scale, 1e-5, RATE, RATE), acot))(ax))
ag2 = np.asarray(jax.grad(lambda q: jnp.vdot(
    pa.fused_axial_attention_5d_dropout_diff(
        q, seed_b, 0, agam, abet, awqkv, abias, awproj, abproj,
        HEADS, scale, 1e-5, RATE, RATE), acot))(ax))
assert (ag1 != ag2).any()
print("attn grad determinism: cross-seed differs", flush=True)

print("probe67 PASS", flush=True)
