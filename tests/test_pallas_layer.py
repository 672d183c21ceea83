"""Fused whole-attention-layer kernel (v3) equivalence in interpret mode."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.ops.pallas_attention import fused_cuboid_attention_layer


def reference_layer(x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
                    num_heads, scale, eps=1e-5):
    B, nC, vol, C = x.shape
    hc = C // num_heads
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ln = (x - mu) / jnp.sqrt(var + eps) * ln_scale + ln_bias
    qkv = ln @ w_qkv
    qkv = qkv.reshape(B, nC, vol, 3, num_heads, hc)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    s = jnp.einsum("bnihc,bnjhc->bnhij", q * scale, k) + bias[None, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnhij,bnjhc->bnihc", p, v).reshape(B, nC, vol, C)
    return o @ w_proj + b_proj


@pytest.mark.parametrize("B,nC,vol,C,heads,G", [
    (1, 16, 13, 64, 4, 16),
    (2, 13, 16, 64, 4, 16),  # nC prime -> G falls to 1
    (1, 8, 16, 32, 2, 4),
])
def test_fused_layer_matches_reference(B, nC, vol, C, heads, G):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, nC, vol, C).astype(np.float32))
    ln_scale = jnp.asarray(rng.randn(C).astype(np.float32))
    ln_bias = jnp.asarray(rng.randn(C).astype(np.float32))
    w_qkv = jnp.asarray((rng.randn(C, 3 * C) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, vol, vol).astype(np.float32))
    w_proj = jnp.asarray((rng.randn(C, C) * 0.05).astype(np.float32))
    b_proj = jnp.asarray(rng.randn(C).astype(np.float32))
    scale = (C // heads) ** -0.5
    got = fused_cuboid_attention_layer(
        x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
        num_heads=heads, scale=scale, cuboids_per_block=G, interpret=True,
    )
    expected = reference_layer(x, ln_scale, ln_bias, w_qkv, bias, w_proj,
                               b_proj, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("B,nC,vol,C,heads", [
    (1, 16, 13, 128, 4),   # axial-T-like, G=16 -> R=208
    (1, 13, 16, 128, 4),   # nC=13 prime, G=13 -> R=208
    (2, 8, 16, 256, 4),    # G=8 -> R=128
])
def test_fused_layer_v4_matches_reference(B, nC, vol, C, heads):
    from prediff_tpu.ops.pallas_attention import fused_cuboid_attention_layer_v4

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, nC, vol, C).astype(np.float32))
    ln_scale = jnp.asarray(rng.randn(C).astype(np.float32))
    ln_bias = jnp.asarray(rng.randn(C).astype(np.float32))
    w_qkv = jnp.asarray((rng.randn(C, 3 * C) * 0.05).astype(np.float32))
    bias = jnp.asarray(rng.randn(heads, vol, vol).astype(np.float32))
    w_proj = jnp.asarray((rng.randn(C, C) * 0.05).astype(np.float32))
    b_proj = jnp.asarray(rng.randn(C).astype(np.float32))
    scale = (C // heads) ** -0.5
    got = fused_cuboid_attention_layer_v4(
        x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
        num_heads=heads, scale=scale, mxu_dtype_name="float32", interpret=True,
    )
    expected = reference_layer(x, ln_scale, ln_bias, w_qkv, bias, w_proj,
                               b_proj, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=5e-4, atol=5e-4)


def test_pick_cuboid_group_and_biasmask():
    from prediff_tpu.ops.pallas_attention import (
        pick_cuboid_group, build_blockdiag_biasmask, NEG_INF,
    )

    assert pick_cuboid_group(256, 13) == 16   # R=208
    assert pick_cuboid_group(208, 16) == 16   # R=256
    assert pick_cuboid_group(104, 8) == 26    # R=208 (26 divides 104)
    assert pick_cuboid_group(7, 3) is None    # 21 rows: no 8-aligned option

    bias = jnp.asarray(np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3))
    m = np.asarray(build_blockdiag_biasmask(bias, G=2))
    assert m.shape == (2, 6, 6)
    np.testing.assert_array_equal(m[:, :3, :3], np.asarray(bias))
    np.testing.assert_array_equal(m[:, 3:, 3:], np.asarray(bias))
    assert (m[:, :3, 3:] == NEG_INF).all() and (m[:, 3:, :3] == NEG_INF).all()


def _randomize(params, seed=7, scale=0.06):
    """Randomize EVERY param leaf.  The v1 init zero-initializes the
    attention proj (init mode "2"), which would make fused-vs-einsum
    comparisons vacuous — the attention output would be multiplied by 0."""
    import jax.numpy as jnp
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    leaves = [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * scale)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_layer_mode_v4_matches_einsum_path_dim128():
    """use_pallas_attention='layer' routes through v4 on an eligible config
    (C=128, no shift) and matches the einsum path with shared params."""
    from prediff_tpu.models.cuboid_attention import CuboidSelfAttentionLayer

    kw = dict(dim=128, num_heads=4, cuboid_size=(4, 1, 1), shift_size=(0, 0, 0),
              strategy=("l", "l", "l"), padding_type="zeros",
              attn_drop=0.0, proj_drop=0.0)
    base = CuboidSelfAttentionLayer(**kw)
    fused = CuboidSelfAttentionLayer(use_pallas_attention="layer", **kw)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 4, 8, 8, 128).astype(np.float32))
    params = _randomize(base.init(jax.random.PRNGKey(0), x)["params"])
    out_base = base.apply({"params": params}, x)
    out_fused = fused.apply({"params": params}, x)
    # v4 uses bf16 MXU operands (XLA's default f32 matmul precision on TPU)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               rtol=3e-2, atol=3e-2)
    params_fused = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_fused)


@pytest.mark.parametrize("axis,cuboid", [
    (0, (13, 1, 1)),   # axial-T: reorder would transpose; 5-D path avoids it
    (1, (1, 8, 1)),    # axial-H
    (2, (1, 1, 8)),    # axial-W
])
def test_layer_mode_axial_5d_matches_einsum_path(axis, cuboid):
    """The natural-layout axial kernel matches the einsum path with shared
    params for every axis of the v1 'axial' pattern."""
    from prediff_tpu.models.cuboid_attention import CuboidSelfAttentionLayer
    from prediff_tpu.ops.pallas_attention import axial_attention_plan

    assert axial_attention_plan((1, 13, 8, 8, 128), axis) is not None
    kw = dict(dim=128, num_heads=4, cuboid_size=cuboid, shift_size=(0, 0, 0),
              strategy=("l", "l", "l"), padding_type="zeros",
              attn_drop=0.0, proj_drop=0.0)
    base = CuboidSelfAttentionLayer(**kw)
    fused = CuboidSelfAttentionLayer(use_pallas_attention="layer", **kw)
    x = jnp.asarray(np.random.RandomState(6 + axis).randn(1, 13, 8, 8, 128)
                    .astype(np.float32))
    params = _randomize(base.init(jax.random.PRNGKey(0), x)["params"])
    out_base = base.apply({"params": params}, x)
    out_fused = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               rtol=3e-2, atol=3e-2)
    params_fused = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_fused)


def test_axial_plan_row_structures():
    from prediff_tpu.ops.pallas_attention import axial_attention_plan, NEG_INF

    # axial-H at the stage-1 shape: one full t-slice per cell
    p = axial_attention_plan((1, 13, 16, 16, 256), 1)
    assert p["R"] == 256 and p["vol"] == 16 and p["grid_tail"] == (13,)
    # row r = h*16 + w: same cuboid iff same w
    m = p["maskadd"]
    assert m[0, 16] == 0.0 and m[0, 1] == NEG_INF
    assert p["rep"][17, 1] == 1.0  # r=17 -> h=1
    # axial-T at the stage-1 shape: 13 x wb rows
    p = axial_attention_plan((1, 13, 16, 16, 256), 0)
    assert p["vol"] == 13 and p["R"] % 8 == 0
    # axial-W: cuboid-major already
    p = axial_attention_plan((1, 13, 16, 16, 256), 2)
    assert p["vol"] == 16 and p["R"] % 16 == 0


def test_layer_mode_matches_einsum_path():
    from prediff_tpu.models.cuboid_attention import CuboidSelfAttentionLayer

    kw = dict(dim=32, num_heads=4, cuboid_size=(4, 1, 1), shift_size=(0, 0, 0),
              strategy=("l", "l", "l"), padding_type="zeros",
              attn_drop=0.0, proj_drop=0.0)
    base = CuboidSelfAttentionLayer(**kw)
    fused = CuboidSelfAttentionLayer(use_pallas_attention="layer", **kw)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 8, 8, 32).astype(np.float32))
    params = _randomize(base.init(jax.random.PRNGKey(0), x)["params"])
    out_base = base.apply({"params": params}, x)
    out_fused = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               rtol=5e-4, atol=5e-4)
    # param trees must be identical regardless of which path initializes
    params_fused = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_fused)


def _rand_layer_inputs(B, nC, vol, C, heads, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, nC, vol, C).astype(np.float32) * 0.5),
        jnp.asarray((1.0 + 0.1 * rng.randn(C)).astype(np.float32)),
        jnp.asarray((0.1 * rng.randn(C)).astype(np.float32)),
        jnp.asarray((rng.randn(C, 3 * C) * 0.05).astype(np.float32)),
        jnp.asarray(rng.randn(heads, vol, vol).astype(np.float32) * 0.3),
        jnp.asarray((rng.randn(C, C) * 0.05).astype(np.float32)),
        jnp.asarray((0.1 * rng.randn(C)).astype(np.float32)),
    )


@pytest.mark.parametrize("B,nC,vol,C,heads", [
    (1, 16, 13, 128, 4),
    (2, 8, 16, 256, 4),
])
def test_v4_diff_grads_match_xla_autodiff(B, nC, vol, C, heads):
    """custom_vjp of the v4 layer (Pallas dx kernel + XLA param grads) vs
    jax.grad of the jnp reference over ALL inputs (round-3 verdict #1)."""
    from prediff_tpu.ops.pallas_attention import (
        fused_cuboid_attention_layer_v4_diff, cuboid_layer_attention_reference,
    )

    args = _rand_layer_inputs(B, nC, vol, C, heads, seed=11)
    scale = (C // heads) ** -0.5
    g_out = jnp.asarray(np.random.RandomState(12).randn(B, nC, vol, C)
                        .astype(np.float32))

    def loss_fused(*a):
        out = fused_cuboid_attention_layer_v4_diff(
            *a, heads, scale, 1e-5, "float32", True
        )
        return jnp.sum(out * g_out)

    def loss_ref(*a):
        return jnp.sum(
            cuboid_layer_attention_reference(*a, heads, scale) * g_out
        )

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ("dx", "dgamma", "dbeta", "dwqkv", "dbias", "dwproj", "dbproj")
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=n)


@pytest.mark.parametrize("B,nC,vol,C,heads", [
    (1, 48, 13, 128, 4),   # multi-cell grid: accumulation across 48/G cells
    (2, 8, 16, 256, 4),    # multi-batch: accumulation across the B axis too
])
def test_v4_full_bwd_grads_match_xla_autodiff(B, nC, vol, C, heads):
    """ONE-kernel all-grads backward (full_bwd=True, round-4 VERDICT #1) vs
    jax.grad of the jnp reference over ALL inputs, incl. multi-tile f32
    accumulation across the sequential grid."""
    from prediff_tpu.ops.pallas_attention import (
        fused_cuboid_attention_layer_v4_diff, cuboid_layer_attention_reference,
        pick_cuboid_group, supports_v4_full_bwd,
    )

    G = pick_cuboid_group(nC, vol, C=C, num_heads=heads)
    assert G is not None and supports_v4_full_bwd(G * vol, vol, C, heads)
    assert nC // G > 1 or B > 1, "test must exercise accumulation"
    args = _rand_layer_inputs(B, nC, vol, C, heads, seed=31)
    scale = (C // heads) ** -0.5
    g_out = jnp.asarray(np.random.RandomState(32).randn(B, nC, vol, C)
                        .astype(np.float32))

    def loss_fused(*a):
        out = fused_cuboid_attention_layer_v4_diff(
            *a, heads, scale, 1e-5, "float32", True, True
        )
        return jnp.sum(out * g_out)

    def loss_ref(*a):
        return jnp.sum(
            cuboid_layer_attention_reference(*a, heads, scale) * g_out
        )

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ("dx", "dgamma", "dbeta", "dwqkv", "dbias", "dwproj", "dbproj")
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=n)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_axial_full_bwd_grads_match_xla_autodiff(axis):
    """Natural-layout axial ONE-kernel all-grads backward vs reorder +
    reference autodiff (round-4 VERDICT #1)."""
    from prediff_tpu.ops.pallas_attention import (
        fused_axial_attention_5d_diff, cuboid_layer_attention_reference,
        _AXIAL_CUBOID_SIZE,
    )
    from prediff_tpu.ops.cuboid import cuboid_reorder, cuboid_reorder_reverse

    B, T, H, W, C, heads = 2, 13, 8, 8, 128, 4
    rng = np.random.RandomState(40 + axis)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.5)
    vol = (T, H, W)[axis]
    _, gam, bet, wq, _, wp, bp = _rand_layer_inputs(1, 1, vol, C, heads, seed=41)
    bias = jnp.asarray(rng.randn(heads, vol, vol).astype(np.float32) * 0.3)
    scale = (C // heads) ** -0.5
    g_out = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32))
    cs = _AXIAL_CUBOID_SIZE[axis](T, H, W)

    def loss_fused(x, gam, bet, wq, bias, wp, bp):
        out = fused_axial_attention_5d_diff(
            x, axis, gam, bet, wq, bias, wp, bp, heads, scale, 1e-5,
            "float32", True, True,
        )
        return jnp.sum(out * g_out)

    def loss_ref(x, gam, bet, wq, bias, wp, bp):
        xr = cuboid_reorder(x, cuboid_size=cs, strategy=("l", "l", "l"))
        o = cuboid_layer_attention_reference(xr, gam, bet, wq, bias, wp, bp,
                                             heads, scale)
        o = cuboid_reorder_reverse(o, cuboid_size=cs, strategy=("l", "l", "l"),
                                   orig_data_shape=(T, H, W))
        return jnp.sum(o * g_out)

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(x, gam, bet, wq, bias, wp, bp)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(x, gam, bet, wq, bias, wp, bp)
    for n, a, b in zip(("dx", "dgamma", "dbeta", "dwqkv", "dbias", "dwproj",
                        "dbproj"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=n)


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_axial_diff_grads_match_xla_autodiff(axis):
    """Natural-layout axial custom_vjp vs reorder + reference autodiff."""
    from prediff_tpu.ops.pallas_attention import (
        fused_axial_attention_5d_diff, cuboid_layer_attention_reference,
        _AXIAL_CUBOID_SIZE,
    )
    from prediff_tpu.ops.cuboid import cuboid_reorder, cuboid_reorder_reverse

    B, T, H, W, C, heads = 1, 13, 8, 8, 128, 4
    rng = np.random.RandomState(20 + axis)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.5)
    vol = (T, H, W)[axis]
    _, gam, bet, wq, _, wp, bp = _rand_layer_inputs(1, 1, vol, C, heads, seed=21)
    bias = jnp.asarray(rng.randn(heads, vol, vol).astype(np.float32) * 0.3)
    scale = (C // heads) ** -0.5
    g_out = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32))
    cs = _AXIAL_CUBOID_SIZE[axis](T, H, W)

    def loss_fused(x, gam, bet, wq, bias, wp, bp):
        out = fused_axial_attention_5d_diff(
            x, axis, gam, bet, wq, bias, wp, bp, heads, scale, 1e-5,
            "float32", True,
        )
        return jnp.sum(out * g_out)

    def loss_ref(x, gam, bet, wq, bias, wp, bp):
        xr = cuboid_reorder(x, cuboid_size=cs, strategy=("l", "l", "l"))
        o = cuboid_layer_attention_reference(xr, gam, bet, wq, bias, wp, bp,
                                             heads, scale)
        o = cuboid_reorder_reverse(o, cuboid_size=cs, strategy=("l", "l", "l"),
                                   orig_data_shape=(T, H, W))
        return jnp.sum(o * g_out)

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(x, gam, bet, wq, bias, wp, bp)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(x, gam, bet, wq, bias, wp, bp)
    for n, a, b in zip(("dx", "dgamma", "dbeta", "dwqkv", "dbias", "dwproj",
                        "dbproj"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=n)


def test_layer_train_mode_grads_match_einsum_path():
    """Module-level: with dropout 0 the fused path now serves TRAINING —
    grads wrt params and input match the einsum path (bf16 MXU tolerance)."""
    from prediff_tpu.models.cuboid_attention import CuboidSelfAttentionLayer

    kw = dict(dim=128, num_heads=4, cuboid_size=(4, 1, 1), shift_size=(0, 0, 0),
              strategy=("l", "l", "l"), padding_type="zeros",
              attn_drop=0.0, proj_drop=0.0)
    base = CuboidSelfAttentionLayer(**kw)
    fused = CuboidSelfAttentionLayer(use_pallas_attention="layer", **kw)
    x = jnp.asarray(np.random.RandomState(31).randn(1, 4, 8, 8, 128)
                    .astype(np.float32))
    params = _randomize(base.init(jax.random.PRNGKey(0), x)["params"])
    g_out = jnp.asarray(np.random.RandomState(32).randn(*x.shape)
                        .astype(np.float32))

    def loss(model):
        def f(p, xx):
            out = model.apply({"params": p}, xx, deterministic=False)
            return jnp.sum(out * g_out)
        return f

    (gp_f, gx_f) = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    (gp_b, gx_b) = jax.grad(loss(base), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_b),
                               rtol=3e-2, atol=3e-2)
    flat_f = jax.tree_util.tree_leaves_with_path(gp_f)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gp_b))
    # atol 8e-2: since round-4 the train path takes the ONE-kernel all-grads
    # backward, whose param-grad contractions run on bf16 MXU operands (the
    # base path accumulates them in f32) — grads here are O(10), so this is
    # still a ~1e-2 relative bound; exact-math equivalence is pinned
    # separately by test_v4_full_bwd_grads_match_xla_autodiff (f32 kernel).
    for path, leaf in flat_f:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), rtol=3e-2, atol=8e-2,
            err_msg=str(path),
        )


def test_layer_mode_falls_back_on_shift():
    from prediff_tpu.models.cuboid_attention import CuboidSelfAttentionLayer

    kw = dict(dim=32, num_heads=4, cuboid_size=(2, 4, 4), shift_size=(1, 2, 2),
              strategy=("l", "l", "l"), padding_type="ignore",
              attn_drop=0.0, proj_drop=0.0)
    base = CuboidSelfAttentionLayer(**kw)
    fused = CuboidSelfAttentionLayer(use_pallas_attention="layer", **kw)
    x = jnp.asarray(np.random.RandomState(4).randn(1, 4, 8, 8, 32).astype(np.float32))
    params = _randomize(base.init(jax.random.PRNGKey(0), x)["params"])
    out_base = base.apply({"params": params}, x)
    out_fused = fused.apply({"params": params}, x)  # falls back to v2 kernel
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               rtol=5e-4, atol=5e-4)
