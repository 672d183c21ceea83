#!/usr/bin/env python
"""Train/evaluate PreDiff (latent diffusion) on SEVIR-LR.

Parity with the reference driver (scripts/prediff/sevirlr/train_sevirlr_prediff.py):
YAML-over-defaults config, pretrained VAE/alignment loading, training with
AdamW+EMA+accum, validation/test with CSI/POD/SUCR/BIAS + MSE/MAE/SSIM (+CRPS),
optional knowledge-aligned sampling, example-forecast PNG export.

Usage:
  python scripts/train_sevirlr_prediff.py --save exp0 --cfg configs/prediff_sevirlr_v1.yaml
  python scripts/train_sevirlr_prediff.py --save exp0 --test --pretrained-dir /path/to/pt
  python scripts/train_sevirlr_prediff.py --save smoke --synthetic --max-steps 10
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--save", default="tmp_prediff", type=str)
    p.add_argument("--cfg", default=None, type=str)
    p.add_argument("--test", action="store_true")
    p.add_argument("--ckpt-name", default=None, type=str)
    p.add_argument("--pretrained-dir", default=None, type=str,
                   help="directory with the published .pt weights")
    p.add_argument("--sevir-dir", default=None, type=str)
    p.add_argument("--synthetic", action="store_true",
                   help="use a generated synthetic SEVIR-LR dataset")
    p.add_argument("--latents", default=None, type=str,
                   help="train from a pre-encoded VAE latent cache "
                        "(scripts/precompute_latents.py) — drops the frozen "
                        "encoder from the train step (~14%% device time)")
    p.add_argument("--max-steps", default=None, type=int)
    p.add_argument("--nodes", default=1, type=int)
    p.add_argument("--num-samples", default=None, type=int,
                   help="override eval.num_samples_per_context (ensemble size)")
    p.add_argument("--ddim-steps", default=None, type=int,
                   help="evaluate with the DDIM fast sampler")
    p.add_argument("--timesteps", default=None, type=int,
                   help="truncate the DDPM chain during eval")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host pod; the DDP "
                        "process-group equivalent)")
    p.add_argument("--coordinator", default=None, type=str,
                   help="coordinator address for --multihost on "
                        "bring-your-own clusters (host:port)")
    return p.parse_args()


def main():
    args = parse_args()
    from prediff_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    if args.multihost:
        from prediff_tpu.parallel.mesh import init_distributed
        init_distributed(coordinator_address=args.coordinator)
    import jax
    import jax.numpy as jnp

    from prediff_tpu.config import prediff_default_config, load_config, save_yaml
    from prediff_tpu.factory import build_pipeline, build_unet, build_vae, build_alignment_model
    from prediff_tpu.parallel.mesh import make_data_mesh, shard_batch
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer
    from prediff_tpu.training.loop import fit, MetricLogger
    from prediff_tpu.datasets import SEVIRDataModule, make_synthetic_sevir_lr
    from prediff_tpu.utils.checkpoint import (
        load_pretrained_torch, save_checkpoint, restore_checkpoint, PRETRAINED_NAMES,
    )
    from prediff_tpu.utils.layout import layout_to_in_out_slice

    cfg = load_config(prediff_default_config, args.cfg)
    save_dir = os.path.join("experiments", args.save)
    os.makedirs(save_dir, exist_ok=True)
    save_yaml(cfg, os.path.join(save_dir, "cfg.yaml"))

    rng = jax.random.PRNGKey(cfg.optim.seed)

    # ---- data ----
    sevir_dir = args.sevir_dir
    if args.synthetic:
        sevir_dir = os.path.join(save_dir, "synthetic_sevirlr")
        if not os.path.exists(sevir_dir):
            make_synthetic_sevir_lr(sevir_dir, num_events=16,
                                    H=cfg.layout.img_height,
                                    W=cfg.layout.img_width, T=25)
    dm = SEVIRDataModule(
        seq_len=cfg.dataset.seq_len,
        stride=cfg.dataset.stride,
        layout=cfg.dataset.layout,
        aug_mode=cfg.dataset.aug_mode,
        dataset_name=cfg.dataset.dataset_name,
        sevir_dir=sevir_dir,
        start_date=cfg.dataset.start_date,
        train_test_split_date=cfg.dataset.train_test_split_date,
        end_date=cfg.dataset.end_date,
        val_ratio=cfg.dataset.val_ratio,
        batch_size=cfg.optim.micro_batch_size,
        seed=cfg.optim.seed,
        num_shard=jax.process_count(),
        rank=jax.process_index(),
    )
    dm.setup()

    # ---- models / pipeline ----
    use_align = cfg.model.align.alignment_type is not None
    ld, params = build_pipeline(cfg, rng=rng, with_alignment=use_align)
    if args.pretrained_dir:
        vae = build_vae(cfg)
        params["vae"] = load_pretrained_torch(
            os.path.join(args.pretrained_dir, PRETRAINED_NAMES["vae"]),
            params["vae"],
        )
        if args.test:
            params["unet"] = load_pretrained_torch(
                os.path.join(args.pretrained_dir, PRETRAINED_NAMES["earthformerunet"]),
                params["unet"],
            )
        if use_align:
            params["align"] = load_pretrained_torch(
                os.path.join(args.pretrained_dir, PRETRAINED_NAMES["alignment"]),
                params["align"],
            )
            ld.alignment = ld.alignment.replace(params=params["align"])

    mesh = make_data_mesh(cfg.optim.micro_batch_size)
    n_dev = len(mesh.devices.ravel())
    accum = max(1, cfg.optim.total_batch_size
                // (cfg.optim.micro_batch_size * n_dev * args.nodes))
    total_steps = args.max_steps or (
        dm.num_train_samples * cfg.optim.max_epochs
        // max(1, cfg.optim.micro_batch_size)
    )
    trainer = DiffusionTrainer(
        ld, params["vae"],
        optim_config=dict(
            lr=cfg.optim.lr, total_num_steps=total_steps,
            method=cfg.optim.method, wd=cfg.optim.wd,
            betas=tuple(cfg.optim.betas),
            gradient_clip_val=cfg.optim.gradient_clip_val,
            warmup_percentage=cfg.optim.warmup_percentage,
            lr_scheduler_mode=cfg.optim.lr_scheduler_mode,
            min_lr_ratio=cfg.optim.min_lr_ratio,
            warmup_min_lr_ratio=cfg.optim.warmup_min_lr_ratio,
            accum_steps=accum,
            state_dtype=cfg.optim.get("state_dtype", None),
        ),
        use_ema=cfg.model.diffusion.use_ema,
        mesh=mesh,
        # Lightning semantics: track_grad_norm=-1 is off, p>=1 logs norms
        track_grad_norm=cfg.logging.track_grad_norm != -1,
        prng_impl=cfg.optim.get("prng_impl", "auto"),
        flat_update=cfg.optim.get("flat_update", False),
        pack_small_thr=cfg.optim.get("pack_small_thr", 0),
        matmul_precision=cfg.optim.get("matmul_precision", None),
        conv3d_impl=cfg.optim.get("conv3d_impl", "auto"),
        latent_inputs=args.latents is not None,
        ema_dtype=cfg.optim.get("ema_dtype", None),
    )

    in_slice, out_slice = layout_to_in_out_slice(
        cfg.layout.layout, cfg.layout.in_len, cfg.layout.out_len
    )

    def split_batch(batch):
        batch = jnp.asarray(batch)
        return batch[out_slice], batch[in_slice]  # x (target), y (context)

    if args.test:
        run_eval(args, cfg, ld, params, dm, save_dir, split_batch, mesh)
        return

    state = trainer.create_state(params["unet"])
    if args.ckpt_name:
        state = restore_checkpoint(os.path.join(save_dir, args.ckpt_name), state)

    train_example = {}  # first train batch of the epoch, for periodic vis

    latent_cache = None
    if args.latents:
        from prediff_tpu.datasets.latents import LatentCache

        latent_cache = LatentCache(args.latents)

    from prediff_tpu.datasets.prefetch import prefetch_to_device
    from prediff_tpu.parallel.mesh import batch_sharding, chunk_sharding

    # K>1: scan K optimizer steps per dispatch (DiffusionTrainer.
    # make_train_step_scan) from K host batches stacked in the producer
    # thread BEFORE the device transfer; amortizes per-dispatch host
    # overhead (probe71).  Identical math to K single steps (tested).
    steps_per_call = int(cfg.optim.get("steps_per_call", 1))

    def chunked(gen):
        """Stack K (x, y) host batches to ((K,B,...), (K,B,...)); ragged
        epoch tails are dropped like ragged batches above."""
        buf = []
        for xy in gen:
            buf.append(xy)
            if len(buf) == steps_per_call:
                yield tuple(np.stack([b[i] for b in buf])
                            for i in range(len(buf[0])))
                buf = []

    def train_batches(epoch):
        """Host-side read/aug/split runs in a producer thread with
        double-buffered sharded device_put (datasets/prefetch.py), so input
        latency overlaps device compute."""
        sharding = (chunk_sharding(mesh) if steps_per_call > 1
                    else batch_sharding(mesh))
        if latent_cache is not None:
            # latent mode: (mx, my) cached-moments windows; validation below
            # stays pixel-based (it samples + scores forecasts)
            def gen():
                for mom, _fm in dm.train_latent_batches(latent_cache, epoch):
                    if mom.shape[0] != cfg.optim.micro_batch_size:
                        continue
                    yield mom[out_slice], mom[in_slice]

            g = chunked(gen()) if steps_per_call > 1 else gen()
            yield from prefetch_to_device(g, size=2, sharding=sharding)
            return

        def gen():
            for b in dm.train_batches(epoch):
                if b.shape[0] != cfg.optim.micro_batch_size:
                    continue  # drop ragged tail for static shapes
                yield b[out_slice], b[in_slice]  # x (target), y (context)

        g = chunked(gen()) if steps_per_call > 1 else gen()
        for i, xy in enumerate(
            prefetch_to_device(g, size=2, sharding=sharding)
        ):
            if i == 0:
                # periodic train vis wants one (B, ...) batch
                train_example["xy"] = (
                    tuple(a[0] for a in xy) if steps_per_call > 1 else xy)
            yield xy

    # ---- validation: diffusion loss + sampled-forecast skill scores ----
    # The reference's validation_step draws num_samples_per_context forecasts
    # on the example indices, accumulates SEVIRSkillScore/MSE/MAE, and selects
    # checkpoints on valid_loss_epoch = -CSI_avg (ref :813-899, monitor :510).
    from prediff_tpu.diffusion.knowledge_alignment import get_alignment_kwargs_avg_x
    from prediff_tpu.evaluation import ForecastEvalSuite

    suite_names = (
        (["aligned"] if use_align and cfg.eval.eval_aligned else [])
        + (["unaligned"] if cfg.eval.eval_unaligned else [])
    )
    val_ddim = cfg.eval.val_ddim_steps
    val_sampler_kwargs = (
        dict(sampler="ddim", ddim_steps=int(val_ddim))
        if val_ddim and val_ddim < cfg.model.diffusion.timesteps else {}
    )
    vis_dir = os.path.join(save_dir, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    val_counter = {"n": 0}

    def make_suite():
        return ForecastEvalSuite(
            layout=cfg.layout.layout, metrics_mode=cfg.dataset.metrics_mode,
            seq_len=cfg.layout.out_len,
            threshold_list=tuple(cfg.dataset.threshold_list),
            metrics_list=tuple(cfg.dataset.metrics_list),
        )

    # validation always scores pixel batches, even when training from latents
    val_step = (trainer.make_val_step(latent_inputs=False)
                if args.latents else trainer.val_step)

    def val_fn(state):
        val_counter["n"] += 1
        vals = []
        suites = {name: make_suite() for name in suite_names}
        vis_saved = False
        for bidx, b in enumerate(dm.val_batches()):
            if b.shape[0] != cfg.optim.micro_batch_size:
                continue
            x, y = split_batch(b)
            m = val_step(state, rng, shard_batch(x, mesh), shard_batch(y, mesh))
            vals.append({k: float(v) for k, v in m.items()})
            data_idx = bidx * cfg.optim.micro_batch_size
            if cfg.eval.eval_example_only and (
                data_idx not in cfg.eval.val_example_data_idx_list
            ):
                continue
            # sample with the current (non-EMA) params, as the reference does
            sample_rng = jax.random.fold_in(rng, 7919 * val_counter["n"] + bidx)
            vis_preds, vis_labels = [], []
            for name, suite in suites.items():
                kwargs = dict(val_sampler_kwargs)
                if name == "aligned":
                    kwargs.update(use_alignment=True,
                                  alignment_kwargs=get_alignment_kwargs_avg_x(x))
                preds = ld.sample_ensemble(
                    state.params["unet"], params["vae"], sample_rng, y,
                    num_samples=cfg.eval.num_samples_per_context,
                    mesh=mesh, **kwargs,
                )
                suite.update(preds, x)
                vis_preds.append(preds[0])
                vis_labels.append(f"{name}_pred")
            if not vis_saved:
                try:
                    save_example_vis(
                        save_dir, cfg, y, x, vis_preds, vis_labels,
                        f"vis/val_epoch{val_counter['n']}_data{data_idx}",
                    )
                except Exception as e:  # vis must never break training
                    print(f"val vis failed: {e}")
                vis_saved = True
        # train-batch example forecast (parity: save_vis_step_end on train
        # example indices, ref :763-809)
        if "xy" in train_example:
            x, y = train_example["xy"]
            pred = ld.sample_ensemble(
                state.params["unet"], params["vae"],
                jax.random.fold_in(rng, 2_000_003 + val_counter["n"]), y,
                num_samples=1, mesh=mesh, **val_sampler_kwargs,
            )
            try:
                save_example_vis(save_dir, cfg, y, x, [pred[0]], ["train_pred"],
                                 f"vis/train_epoch{val_counter['n']}")
            except Exception as e:
                print(f"train vis failed: {e}")
        out = (
            {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
            if vals else {}
        )
        for name, suite in suites.items():
            # multi-host: reduce metric state across processes (each host saw
            # only its input shard; ref torchmetrics sync_dist=True)
            suite.cross_process_reduce()
            out.update(suite.compute(
                "valid" if name == "unaligned" else "valid_aligned"
            ))
        return out

    logger = MetricLogger(
        save_dir, use_wandb=cfg.logging.use_wandb,
        run_name=cfg.logging.logging_prefix, config=cfg.to_dict())
    state = fit(
        state=state,
        train_step=trainer.train_step,
        train_step_scan=(trainer.train_step_scan if steps_per_call > 1
                         else None),
        steps_per_call=steps_per_call,
        train_batches_fn=train_batches,
        make_batch_args=lambda b: b,
        max_epochs=cfg.optim.max_epochs,
        save_dir=save_dir,
        rng=rng,
        val_fn=val_fn,
        check_val_every_n_epoch=cfg.trainer.check_val_every_n_epoch,
        monitor=cfg.optim.monitor,
        save_top_k=cfg.optim.save_top_k,
        early_stop=cfg.optim.early_stop,
        early_stop_patience=cfg.optim.early_stop_patience,
        max_steps=args.max_steps,
        logger=logger,
    )
    save_checkpoint(os.path.join(save_dir, "ckpt_last"), state)
    print(f"training done at step {int(jax.device_get(state.step))}; "
          f"checkpoints in {save_dir}")


def build_fvd_feature_fn(cfg, pretrained_dir):
    """Shared, jitted I3D feature extractor for FVD
    (ref train_sevirlr_prediff.py:238-269, 942-1015).

    Loads the published Kinetics I3D weights from ``pretrained_dir`` when
    present; otherwise runs with a randomly initialized I3D so the FVD wiring
    stays exercisable offline (sanity mode, like the reference's missing-VAE
    warning at :156).  Returned fn is shared by the aligned and unaligned
    suites so the I3D compiles once."""
    import jax
    import jax.numpy as jnp
    from prediff_tpu.evaluation import InceptionI3d, preprocess_video
    from prediff_tpu.utils.checkpoint import PRETRAINED_NAMES

    nf = int(cfg.eval.fvd_features)
    res = int(cfg.eval.fvd_resolution)
    model = InceptionI3d(num_classes=nf)
    t_init = 2 * cfg.layout.out_len if cfg.layout.out_len < 9 else cfg.layout.out_len
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, t_init, res, res, 3)), train=False
    )
    name = PRETRAINED_NAMES.get(f"i3d{nf}")
    path = os.path.join(pretrained_dir, name) if pretrained_dir and name else None
    if path and os.path.exists(path):
        from prediff_tpu.utils.convert import (
            convert_torch_state_dict, convert_torch_batch_stats,
            load_torch_checkpoint,
        )
        sd = load_torch_checkpoint(path)
        variables = {
            "params": convert_torch_state_dict(
                sd, variables["params"],
                skip_suffixes=("num_batches_tracked", "running_mean",
                               "running_var"),
            ),
            "batch_stats": convert_torch_batch_stats(sd, variables["batch_stats"]),
        }
    else:
        print("WARNING: Kinetics I3D weights not found — FVD uses a randomly "
              "initialized I3D (relative values meaningless; wiring-only mode)")

    def feature_fn(videos):
        return model.apply(variables, preprocess_video(videos, res), train=False)

    return jax.jit(feature_fn), nf


def run_eval(args, cfg, ld, params, dm, save_dir, split_batch, mesh):
    """Test-set evaluation: batched-ensemble sampling + CSI/MSE/MAE/SSIM/CRPS
    (+FVD, +aligned variants, +.npy prediction dumps).

    Parity: test_step/on_test_epoch_end (ref :905-1015) — ensemble members are
    folded into the batch axis via ``sample_ensemble`` (one compiled dispatch
    per batch per suite) instead of the reference's per-member Python loop."""
    import jax
    from prediff_tpu.evaluation import ForecastEvalSuite, FrechetVideoDistance
    from prediff_tpu.diffusion.knowledge_alignment import get_alignment_kwargs_avg_x
    from prediff_tpu.training.loop import MetricLogger

    rng = jax.random.PRNGKey(cfg.optim.seed)
    use_align = cfg.model.align.alignment_type is not None and cfg.eval.eval_aligned
    sampler_kwargs = {}
    if args.ddim_steps:
        sampler_kwargs = dict(sampler="ddim", ddim_steps=args.ddim_steps)
    if args.timesteps:
        sampler_kwargs["timesteps"] = args.timesteps
    names = (["aligned"] if use_align else []) + (
        ["unaligned"] if cfg.eval.eval_unaligned else []
    )
    fvd_feature_fn = nf = None
    if cfg.eval.fvd:
        fvd_feature_fn, nf = build_fvd_feature_fn(cfg, args.pretrained_dir)
    suites = {
        name: ForecastEvalSuite(
            layout=cfg.layout.layout, metrics_mode=cfg.dataset.metrics_mode,
            seq_len=cfg.layout.out_len,
            threshold_list=tuple(cfg.dataset.threshold_list),
            metrics_list=tuple(cfg.dataset.metrics_list),
            fvd=FrechetVideoDistance(
                feature_fn=fvd_feature_fn, num_features=nf, auto_t=True,
                reset_real_features=False,
            ) if fvd_feature_fn is not None else None,
        )
        for name in names
    }
    npy_dir = os.path.join(save_dir, "npy")
    if cfg.logging.save_npy:
        os.makedirs(npy_dir, exist_ok=True)
    rank = jax.process_index()
    logger = MetricLogger(save_dir)
    n_samples = args.num_samples or cfg.eval.num_samples_per_context
    for bidx, batch in enumerate(dm.test_batches()):
        data_idx = bidx * cfg.optim.micro_batch_size
        if cfg.eval.eval_example_only and (
            data_idx not in cfg.eval.test_example_data_idx_list
        ):
            continue
        x, y = split_batch(batch)
        vis_preds, vis_labels = [], []
        for name, suite in suites.items():
            kwargs = dict(sampler_kwargs)
            if name == "aligned":
                kwargs.update(
                    use_alignment=True,
                    alignment_kwargs=get_alignment_kwargs_avg_x(x),
                )
            preds = ld.sample_ensemble(
                params["unet"], params["vae"],
                jax.random.fold_in(rng, bidx), y,
                num_samples=n_samples, mesh=mesh, **kwargs,
            )  # (M, B, T, H, W, C)
            suite.update(preds, x)
            if cfg.logging.save_npy:  # ref :931-934 naming
                suffix = "_aligned" if name == "aligned" else ""
                for i, p in enumerate(preds):
                    np.save(
                        os.path.join(
                            npy_dir,
                            f"batch{bidx}_rank{rank}_sample{i}{suffix}.npy",
                        ),
                        np.asarray(p),
                    )
            vis_preds.append(preds[0])
            vis_labels.append(f"{name}_pred")
        if vis_preds:
            try:
                save_example_vis(save_dir, cfg, y, x, vis_preds, vis_labels,
                                 f"test_example_{data_idx}")
            except Exception as e:  # visualization must not break eval
                print(f"vis failed: {e}")
    results = {}
    for name, suite in suites.items():
        # multi-host: sum metric states across processes before compute()
        # (the reference's torchmetrics sync_dist=True, ref :818-819)
        suite.cross_process_reduce()
        results.update(
            suite.compute("test" if name == "unaligned" else "test_aligned")
        )
    logger.log(0, results)
    for k in sorted(results):
        print(f"{k}: {results[k]:.4f}")


def save_example_vis(save_dir, cfg, y, x, preds, labels, tag):
    """Example-forecast PNG (parity: save_vis_step_end,
    train_sevirlr_prediff.py:1017-1074)."""
    import numpy as np
    from prediff_tpu.datasets.visualization import vis_sevir_seq

    vis_sevir_seq(
        f"{save_dir}/{tag}.png",
        seq=[np.asarray(y[0]), np.asarray(x[0])] + [np.asarray(p[0]) for p in preds],
        label=["context", "target"] + list(labels),
        interval_real_time=cfg.dataset.interval_real_time,
        plot_stride=cfg.dataset.plot_stride,
        fs=cfg.eval.fs,
    )


if __name__ == "__main__":
    main()
