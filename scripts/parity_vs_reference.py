#!/usr/bin/env python
"""Weights-parity harness vs the PyTorch reference (BASELINE.md north star).

Runs the moment the released checkpoints are available:

    python scripts/parity_vs_reference.py --pt-dir /path/to/pt \\
        [--cfg configs/prediff_sevirlr_v1.yaml] [--run-eval --synthetic] \\
        [--expected-metrics ref_metrics.json --tol 0.01]

Steps:
  1. load each .pt (names: utils/download.py:5-25 of the reference) into BOTH
     the torch reference modules and (via prediff_tpu.utils.convert) the flax
     models — strict key matching;
  2. A/B the deterministic component forwards (VAE encode/decode moments,
     UNet eps-prediction, alignment readout); max |rel err| must be under
     --component-tol (default 1e-3, the parity-test bar);
  3. with --run-eval: run the full JAX-side test eval
     (train_sevirlr_prediff --test --pretrained-dir ...) and print the
     CSI/CRPS/SSIM table;
  4. with --expected-metrics: assert each shared CSI/CRPS key agrees within
     --tol relative (default 1%, the BASELINE.md target).  The JSON is
     whatever the torch reference's test run logged (key: value).

Smoke mode (no weights in this environment — offline):

    python scripts/parity_vs_reference.py --smoke

builds reference-architecture modules at the tiny config scale with random
init, saves them as .pt, and runs steps 1-2 — proving the whole harness
machinery end-to-end.
"""
import argparse
import json
import os
import sys
import types

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
REFERENCE_SRC = "/root/reference/src"

PT_NAMES = {
    "vae": "pretrained_sevirlr_vae_8x8x64_v1.pt",
    "unet": "pretrained_sevirlr_earthformerunet_v1.pt",
    "align": "pretrained_sevirlr_alignment_avg_x_cuboid_v1.pt",
}


def import_reference():
    """Reference import with the torchvision/torchmetrics stubs the tests use
    (tests/conftest.py::import_reference) — the LPIPS/FID import chains are
    never executed here."""
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.vgg16 = None

        class _FakeWeights:
            IMAGENET1K_V1 = None

        tv_models.VGG16_Weights = _FakeWeights
        tv.models = tv_models
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv.transforms
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class _Metric:
            full_state_update = True

            def __init__(self, *a, **k):
                pass

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

        tm.Metric = _Metric
        tm.__path__ = []
        tm_metric = types.ModuleType("torchmetrics.metric")
        tm_metric.Metric = _Metric
        tm.metric = tm_metric
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.metric"] = tm_metric


def _filt(cls, kw):
    import inspect

    sig = inspect.signature(cls.__init__)
    return {k: v for k, v in kw.items() if k in sig.parameters}


def build_reference_models(cfg):
    """Torch reference modules from OUR config tree (the factory's kwarg
    mapping mirrors the reference driver, train_sevirlr_prediff.py:91-206)."""
    import_reference()
    from prediff.models.cuboid_transformer.cuboid_transformer_unet import (
        CuboidTransformerUNet as RefUNet,
    )
    from prediff.taming.autoencoder_kl import AutoencoderKL as RefVAE
    from prediff.diffusion.knowledge_alignment.models import (
        NoisyCuboidTransformerEncoder as RefEnc,
    )

    m = cfg.model.latent_model
    pattern = m.self_pattern
    nb = len(m.depth)
    unet_kw = dict(
        input_shape=tuple(m.input_shape), target_shape=tuple(m.target_shape),
        base_units=m.base_units, scale_alpha=m.scale_alpha,
        num_heads=m.num_heads, attn_drop=m.attn_drop, proj_drop=m.proj_drop,
        ffn_drop=m.ffn_drop, downsample=m.downsample,
        downsample_type=m.downsample_type, upsample_type=m.upsample_type,
        upsample_kernel_size=m.upsample_kernel_size, depth=list(m.depth),
        block_attn_patterns=[pattern] * nb if isinstance(pattern, str) else list(pattern),
        num_global_vectors=m.num_global_vectors,
        use_global_vector_ffn=m.use_global_vector_ffn,
        use_global_self_attn=m.use_global_self_attn,
        separate_global_qkv=m.separate_global_qkv,
        global_dim_ratio=m.global_dim_ratio,
        ffn_activation=m.ffn_activation, gated_ffn=m.gated_ffn,
        norm_layer=m.norm_layer, padding_type=m.padding_type,
        checkpoint_level=0, pos_embed_type=m.pos_embed_type,
        use_relative_pos=m.use_relative_pos,
        self_attn_use_final_proj=m.self_attn_use_final_proj,
        time_embed_channels_mult=m.time_embed_channels_mult,
        time_embed_use_scale_shift_norm=m.time_embed_use_scale_shift_norm,
        time_embed_dropout=m.time_embed_dropout,
        unet_res_connect=m.unet_res_connect,
    )
    v = cfg.model.vae
    vae_kw = dict(
        in_channels=v.in_channels, out_channels=v.out_channels,
        down_block_types=tuple(v.down_block_types),
        up_block_types=tuple(v.up_block_types),
        block_out_channels=tuple(v.block_out_channels),
        layers_per_block=v.layers_per_block, latent_channels=v.latent_channels,
        norm_num_groups=v.norm_num_groups, act_fn="silu",
    )
    a = cfg.model.align.model_args
    align_kw = dict(
        input_shape=tuple(a.input_shape), out_channels=a.out_channels,
        base_units=a.base_units, scale_alpha=a.scale_alpha,
        depth=list(a.depth), downsample=a.downsample,
        downsample_type=a.downsample_type,
        block_attn_patterns=a.block_attn_patterns, num_heads=a.num_heads,
        attn_drop=a.attn_drop, proj_drop=a.proj_drop, ffn_drop=a.ffn_drop,
        ffn_activation=a.ffn_activation, gated_ffn=a.gated_ffn,
        norm_layer=a.norm_layer, use_inter_ffn=a.use_inter_ffn,
        hierarchical_pos_embed=a.hierarchical_pos_embed,
        pos_embed_type=a.pos_embed_type, padding_type=a.padding_type,
        checkpoint_level=0, use_relative_pos=a.use_relative_pos,
        self_attn_use_final_proj=a.self_attn_use_final_proj,
        num_global_vectors=a.num_global_vectors,
        use_global_vector_ffn=a.use_global_vector_ffn,
        use_global_self_attn=a.use_global_self_attn,
        separate_global_qkv=a.separate_global_qkv,
        global_dim_ratio=a.global_dim_ratio,
        time_embed_channels_mult=a.time_embed_channels_mult,
        time_embed_use_scale_shift_norm=a.time_embed_use_scale_shift_norm,
        time_embed_dropout=a.time_embed_dropout, pool=a.pool,
        readout_seq=a.readout_seq, out_len=a.out_len,
    )
    return (
        RefUNet(**_filt(RefUNet, unet_kw)).eval(),
        RefVAE(**_filt(RefVAE, vae_kw)).eval(),
        RefEnc(**_filt(RefEnc, align_kw)).eval(),
    )


def _rel_err(a, b):
    denom = max(float(np.abs(b).max()), 1e-8)
    return float(np.abs(np.asarray(a) - np.asarray(b)).max()) / denom


def run_component_parity(cfg, pt_dir, tol):
    """Steps 1-2: load .pt into both frameworks, compare forwards.  Returns
    (results, loaded) — ``loaded`` carries the weight-loaded modules for the
    chain-parity stage so the .pt files are read once."""
    import torch
    import jax
    import jax.numpy as jnp
    from prediff_tpu.factory import build_unet, build_vae, build_alignment_model
    from prediff_tpu.models.vae import AutoencoderKL
    from prediff_tpu.utils.convert import convert_torch_state_dict

    ref_unet, ref_vae, ref_align = build_reference_models(cfg)
    results = {}
    loaded = {"ref_unet": ref_unet, "ref_vae": ref_vae, "ref_align": ref_align}
    rng = jax.random.PRNGKey(0)
    d = cfg.model.diffusion

    # --- UNet eps-prediction -------------------------------------------- #
    sd = torch.load(os.path.join(pt_dir, PT_NAMES["unet"]), map_location="cpu")
    sd = sd.get("state_dict", sd)
    ref_unet.load_state_dict(sd)
    ours = build_unet(cfg)
    rs = np.random.RandomState(0)
    x = rs.randn(1, *d.latent_shape).astype(np.float32)
    zc = rs.randn(1, *d.latent_cond_shape).astype(np.float32)
    t = np.array([57], np.int64)
    variables = jax.jit(ours.init)(rng, jnp.asarray(x), jnp.asarray(t), jnp.asarray(zc))
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(sd, variables["params"]))
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(zc))
    with torch.no_grad():
        want = ref_unet(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(zc)).numpy()
    results["unet"] = _rel_err(got, want)
    loaded["unet"], loaded["unet_params"] = ours, params

    # --- VAE encode moments + decode ------------------------------------ #
    sd = torch.load(os.path.join(pt_dir, PT_NAMES["vae"]), map_location="cpu")
    sd = sd.get("state_dict", sd)
    ref_vae.load_state_dict(sd)
    vae = build_vae(cfg)
    frame = rs.randn(1, cfg.layout.img_height, cfg.layout.img_width,
                     cfg.model.vae.in_channels).astype(np.float32)
    variables = jax.jit(vae.init)(rng, jnp.asarray(frame))
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(sd, variables["params"]))
    post = vae.apply({"params": params}, jnp.asarray(frame),
                     method=AutoencoderKL.encode)
    with torch.no_grad():
        ref_post = ref_vae.encode(torch.from_numpy(frame.transpose(0, 3, 1, 2)))
        ref_mean = ref_post.mean.numpy().transpose(0, 2, 3, 1)
        ref_dec = ref_vae.decode(ref_post.mode()).numpy().transpose(0, 2, 3, 1)
    results["vae_encode"] = _rel_err(post.mean, ref_mean)
    dec = vae.apply({"params": params}, post.mode(), method=AutoencoderKL.decode)
    results["vae_decode"] = _rel_err(dec, ref_dec)

    # --- alignment readout ---------------------------------------------- #
    sd = torch.load(os.path.join(pt_dir, PT_NAMES["align"]), map_location="cpu")
    sd = sd.get("state_dict", sd)
    # the published .pt loads bare into the net (ref sevir.py:38); strip a
    # Lightning 'torch_nn_module.' wrapper if a training ckpt is passed
    if any(k.startswith("torch_nn_module.") for k in sd):
        sd = {k[len("torch_nn_module."):]: v for k, v in sd.items()
              if k.startswith("torch_nn_module.")}
    ref_align.load_state_dict(sd)
    align = build_alignment_model(cfg)
    a = cfg.model.align.model_args
    zt = rs.randn(1, *a.input_shape).astype(np.float32)
    variables = jax.jit(align.init)(rng, jnp.asarray(zt), jnp.asarray(t))
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(sd, variables["params"]))
    got = align.apply({"params": params}, jnp.asarray(zt), jnp.asarray(t))
    with torch.no_grad():
        want = ref_align(torch.from_numpy(zt), torch.from_numpy(t)).numpy()
    results["alignment"] = _rel_err(got, want)
    loaded["align"], loaded["align_params"] = align, params

    print("component max-rel-err vs torch reference (same .pt):")
    ok = True
    for k, v in results.items():
        status = "OK" if v < tol else "FAIL"
        ok &= v < tol
        print(f"  {k:12s} {v:.3e}  [{status}]  (tol {tol})")
    if not ok:
        raise SystemExit("component parity FAILED")
    return results, loaded


def run_chain_parity(cfg, loaded, tol, chain_T=4, seed=0):
    """Guided DDPM chain parity: run a short reverse chain with IDENTICAL
    injected noise through both frameworks and compare the final latent.

    The torch side is an explicit p_sample loop stated directly from the
    reference formulas (latent_diffusion.py:568-631 eps-parameterization +
    posterior step; knowledge_alignment/sevir.py:55-104 +
    alignment_pl.py:423-446 guidance mean shift), driving the weight-loaded
    reference UNet + alignment net.  The JAX side drives our schedule/core/
    KnowledgeAlignment building blocks.  This exercises every piece of the
    sampling math end-to-end beyond per-component forwards — only the file
    download remains untested offline (VERDICT r3 next-round #4)."""
    import torch
    import jax
    import jax.numpy as jnp
    from prediff.diffusion.utils import make_beta_schedule as ref_make_betas
    from prediff_tpu.diffusion import core
    from prediff_tpu.diffusion.knowledge_alignment import KnowledgeAlignment
    from prediff_tpu.diffusion.schedule import make_gaussian_schedule

    d = cfg.model.diffusion
    guide_scale = float(cfg.model.align.guide_scale)
    rs = np.random.RandomState(seed)
    B = 1
    z_T = rs.randn(B, *d.latent_shape).astype(np.float32)
    zc = rs.randn(B, *d.latent_cond_shape).astype(np.float32)
    step_noise = rs.randn(chain_T, B, *d.latent_shape).astype(np.float32)
    avg_x_gt = np.full((B, 1), 0.37, np.float32)

    # ---- torch reference chain ----------------------------------------- #
    betas = np.asarray(
        ref_make_betas(d.beta_schedule, chain_T, linear_start=d.linear_start,
                       linear_end=d.linear_end), np.float64,
    )
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    sqrt_recip = np.sqrt(1.0 / ac).astype(np.float32)
    sqrt_recipm1 = np.sqrt(1.0 / ac - 1.0).astype(np.float32)
    coef1 = (betas * np.sqrt(ac_prev) / (1.0 - ac)).astype(np.float32)
    coef2 = ((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)).astype(np.float32)
    post_logvar = np.log(
        np.maximum(betas * (1.0 - ac_prev) / (1.0 - ac), 1e-20)
    ).astype(np.float32)

    ref_unet, ref_align = loaded["ref_unet"], loaded["ref_align"]
    zt = torch.from_numpy(z_T.copy())
    zc_t = torch.from_numpy(zc)
    gt_t = torch.from_numpy(avg_x_gt)
    for i in reversed(range(chain_T)):
        t = torch.full((B,), i, dtype=torch.int64)
        with torch.no_grad():
            eps = ref_unet(zt, t, zc_t)
            x0 = sqrt_recip[i] * zt - sqrt_recipm1[i] * eps
            mean = coef1[i] * x0 + coef2[i] * zt
        with torch.enable_grad():
            z_in = zt.detach().requires_grad_(True)
            pred = ref_align(z_in, t).mean(dim=1)  # (B,T,1) -> (B,1)
            energy = torch.linalg.vector_norm(pred - gt_t, ord=2)
            grad = torch.autograd.grad(energy, z_in)[0]
        mean = mean - float(np.exp(0.5 * post_logvar[i])) * guide_scale * grad
        if i > 0:
            zt = mean + float(np.exp(0.5 * post_logvar[i])) * torch.from_numpy(
                step_noise[i]
            )
        else:
            zt = mean
    want = zt.detach().numpy()

    # ---- JAX chain over our building blocks ------------------------------ #
    sched = make_gaussian_schedule(
        beta_schedule=d.beta_schedule, timesteps=chain_T,
        linear_start=d.linear_start, linear_end=d.linear_end,
    )
    unet, unet_params = loaded["unet"], loaded["unet_params"]
    align, align_params = loaded["align"], loaded["align_params"]
    ka = KnowledgeAlignment(
        params=align_params, guide_scale=guide_scale,
        apply_fn=lambda v, zt_, t_, zc=None, y=None: align.apply(v, zt_, t_),
    )

    @jax.jit
    def jax_step(z, t_arr, noise):
        eps = unet.apply({"params": unet_params}, z, t_arr, jnp.asarray(zc))
        mean, _, logvar, _ = core.p_mean_variance(sched, eps, z, t_arr)
        shift = ka.get_mean_shift(z, t_arr, jnp.asarray(avg_x_gt))
        mean = mean - jnp.exp(0.5 * logvar) * shift
        keep_noise = (t_arr[0] > 0).astype(z.dtype)
        return mean + keep_noise * jnp.exp(0.5 * logvar) * noise

    z = jnp.asarray(z_T)
    for i in reversed(range(chain_T)):
        z = jax_step(z, jnp.full((B,), i, jnp.int32), jnp.asarray(step_noise[i]))
    got = np.asarray(z)

    err = _rel_err(got, want)
    status = "OK" if err < tol else "FAIL"
    print(f"guided {chain_T}-step chain max-rel-err {err:.3e}  [{status}]  "
          f"(tol {tol})")
    if err >= tol:
        raise SystemExit("chain parity FAILED")
    return err


def run_smoke(cfg_path, chain_tol=1e-3):
    """Build reference-architecture modules at the given config scale with
    random init, save them as .pt, run component parity AND the guided-chain
    parity.  ``cfg_path=None`` = the flagship v1 defaults (full 7x16x16x64
    shapes, base_units 256 — VERDICT r3 next-round #4)."""
    import tempfile
    import torch
    from prediff_tpu.config import load_config, prediff_default_config

    cfg = load_config(prediff_default_config, cfg_path)
    ref_unet, ref_vae, ref_align = build_reference_models(cfg)
    # perturb EVERY parameter: the reference zero-initializes its output
    # layers, which would make the UNet/alignment comparisons vacuous
    # (both sides exactly 0)
    torch.manual_seed(0)
    with torch.no_grad():
        for mod in (ref_unet, ref_vae, ref_align):
            for prm in mod.parameters():
                prm.add_(0.02 * torch.randn_like(prm))
    tmp = tempfile.mkdtemp(prefix="parity_smoke_")
    torch.save(ref_unet.state_dict(), os.path.join(tmp, PT_NAMES["unet"]))
    torch.save(ref_vae.state_dict(), os.path.join(tmp, PT_NAMES["vae"]))
    torch.save(ref_align.state_dict(), os.path.join(tmp, PT_NAMES["align"]))
    print(f"smoke .pt files written to {tmp}")
    _, loaded = run_component_parity(cfg, tmp, tol=1e-3)
    run_chain_parity(cfg, loaded, tol=chain_tol)
    print("SMOKE PASS: harness machinery verified with random weights")


def compare_metrics(ours: dict, theirs: dict, tol: float,
                    keys=("csi", "crps")) -> list:
    """Assert each shared CSI/CRPS metric agrees within ``tol`` relative;
    returns the list of failing keys (unit-tested in
    tests/test_cli_smoke.py)."""
    bad = []
    for k, v_ref in theirs.items():
        if k not in ours or not any(s in k for s in keys):
            continue
        rel = abs(ours[k] - v_ref) / max(abs(v_ref), 1e-9)
        mark = "OK" if rel <= tol else "FAIL"
        print(f"  {k}: ours {ours[k]:.4f} ref {v_ref:.4f} "
              f"rel {rel:.4f} [{mark}]")
        if rel > tol:
            bad.append(k)
    return bad


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pt-dir", default=None)
    p.add_argument("--cfg", default=None,
                   help="config YAML (default: flagship v1 defaults)")
    p.add_argument("--component-tol", type=float, default=1e-3)
    p.add_argument("--run-eval", action="store_true",
                   help="also run the full JAX-side test eval")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sevir-dir", default=None)
    p.add_argument("--ddim-steps", type=int, default=None)
    p.add_argument("--expected-metrics", default=None,
                   help="JSON of the torch reference's test metrics")
    p.add_argument("--tol", type=float, default=0.01,
                   help="relative tolerance for CSI/CRPS parity (1%%)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny-config smoke with random weights")
    p.add_argument("--smoke-v1", action="store_true",
                   help="smoke at the FULL v1 shapes (7x16x16x64, base 256; "
                        "slow on CPU — several minutes)")
    args = p.parse_args()

    from prediff_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()

    if args.smoke or args.smoke_v1:
        if args.smoke_v1:
            run_smoke(args.cfg)  # None = flagship v1 defaults
        else:
            run_smoke(args.cfg
                      or os.path.join(REPO_ROOT, "configs", "tiny_smoke.yaml"))
        return

    assert args.pt_dir, "--pt-dir required (or --smoke)"
    from prediff_tpu.config import load_config, prediff_default_config

    cfg = load_config(prediff_default_config, args.cfg)
    _, loaded = run_component_parity(cfg, args.pt_dir, args.component_tol)
    run_chain_parity(cfg, loaded, tol=args.component_tol)

    if args.run_eval:
        import subprocess

        cmd = [sys.executable,
               os.path.join(REPO_ROOT, "scripts", "train_sevirlr_prediff.py"),
               "--save", "parity_eval", "--test",
               "--pretrained-dir", args.pt_dir]
        if args.cfg:
            cmd += ["--cfg", args.cfg]
        if args.synthetic:
            cmd += ["--synthetic"]
        if args.sevir_dir:
            cmd += ["--sevir-dir", args.sevir_dir]
        if args.ddim_steps:
            cmd += ["--ddim-steps", str(args.ddim_steps)]
        print("running:", " ".join(cmd))
        subprocess.run(cmd, check=True)
        metrics_path = os.path.join("experiments", "parity_eval", "metrics.jsonl")
        with open(metrics_path) as f:
            ours = json.loads(f.readlines()[-1])
        if args.expected_metrics:
            with open(args.expected_metrics) as f:
                theirs = json.load(f)
            bad = compare_metrics(ours, theirs, args.tol)
            if bad:
                raise SystemExit(f"metric parity FAILED: {bad}")
            print(f"METRIC PARITY OK (tol {args.tol})")


if __name__ == "__main__":
    main()
