"""Config system: nested defaults-in-code merged with YAML overrides.

Reference parity: the OmegaConf pattern in the driver scripts
(train_sevirlr_prediff.py:286-553 builds `get_*_config` defaults then merges a
YAML file).  Shipped parity configs live in /configs (v1 values mirror
scripts/{prediff,vae,alignment}/sevirlr/*_v1.yaml)."""
import copy
from typing import Dict, Optional

import yaml


class ConfigDict(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def wrap(cls, d):
        if isinstance(d, dict):
            return cls({k: cls.wrap(v) for k, v in d.items()})
        if isinstance(d, list):
            return [cls.wrap(v) for v in d]
        return d

    def to_dict(self) -> Dict:
        def unwrap(v):
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def deep_merge(base: Dict, override: Optional[Dict]) -> Dict:
    """Recursive merge; override wins, dicts merge, everything else replaces."""
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def save_yaml(cfg: Dict, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict() if isinstance(cfg, ConfigDict) else cfg, f,
                       sort_keys=False)


# --------------------------------------------------------------------- #
# Default config trees (PreDiff SEVIR-LR v1 values)
# --------------------------------------------------------------------- #

def layout_default() -> Dict:
    return dict(in_len=7, out_len=6, img_height=128, img_width=128,
                data_channels=1, layout="NTHWC")


def dataset_default() -> Dict:
    return dict(
        dataset_name="sevirlr", img_height=128, img_width=128, in_len=7,
        out_len=6, seq_len=13, plot_stride=1, interval_real_time=10,
        sample_mode="sequent", stride=6, layout="NTHWC", start_date=None,
        train_test_split_date=[2019, 6, 1], end_date=None, val_ratio=0.1,
        metrics_mode="0", metrics_list=["csi", "pod", "sucr", "bias"],
        threshold_list=[16, 74, 133, 160, 181, 219], aug_mode="2",
    )


def optim_default() -> Dict:
    return dict(
        total_batch_size=64, micro_batch_size=2, seed=0,
        float32_matmul_precision="high",  # torch knob; informational here
        # 'auto' -> TPU hardware RNG ('rbg') for per-step training randomness
        # (dropout masks, q_sample noise, t draws); threefry elsewhere.
        # Motivation: probe40c measured the v1 (dropout .1) train step 25-50%
        # slower than dropout-0 — threefry mask generation is the suspect;
        # probe43 quantifies the rbg effect.
        prng_impl="auto",
        # steps_per_call (optional key, default 1): scan K optimizer steps
        # per device dispatch from K host-stacked batches (loop.py::fit +
        # DiffusionTrainer.make_train_step_scan).  Identical math to K
        # single steps (tested); amortizes per-dispatch host overhead.
        # Metrics still log on the per-step cadence; max_steps rounds up to
        # the chunk boundary; ragged epoch tails (< K batches) are dropped.
        # flat_update: run clip/adam/EMA on ONE raveled param vector (one
        # fused kernel) instead of ~4 tiny fusions per param leaf.  Measured
        # 7% SLOWER on a v5e (probe45: 22.4 vs 24.2 samples/s at B=8 — the
        # ravel concatenate copies outweigh the dispatch savings), so default
        # off; the option stays for param-count-heavy configs.
        # matmul_precision: 'bfloat16' wraps the loss in
        # jax.default_matmul_precision; measured a no-op on the v1 config
        # (probe45: identical time AND loss — XLA already picks bf16 MXU
        # passes for these convs), so default off.
        flat_update=False,
        # pack_small_thr: pack param leaves with <= this many elements into
        # ONE flat vector for the clip/adam/EMA update (the flat_update
        # middle ground — probe61 attributed ~22.5 ms/step to per-leaf
        # optimizer/EMA traffic across 640 leaves; at 65536 the v1 UNet
        # packs 454 leaves holding 1.3% of elements, so the ravel-copy cost
        # that sank flat_update stays negligible).  0 = per-leaf updates.
        # probe66 measures the win; see EmaTrainState.pack_small_thr.
        pack_small_thr=0,
        matmul_precision=None,
        # Round-5 opt-ins (VERDICT r4 #4) — STORAGE dtype for optimizer /
        # EMA state on the diffusion step.  probe70/78 named f32 opt/EMA
        # HBM traffic as the step's residual cost; these halve it:
        #   state_dtype: 'bfloat16' stores BOTH Adam moments in bf16
        #     (per-step arithmetic stays f32 — optim._scale_by_adam_state_dtype)
        #   ema_dtype: 'bfloat16' stores the EMA shadow in bf16
        #     (ema_update computes f32, rounds only the store)
        # Accuracy + speed A/B: scripts/probes/bf16_state_ab.py (measured:
        # +1.0% step, same loss plateau — COVERAGE round-5 item 10).
        # Defaults stay None = f32: reference semantics out of the box.
        state_dtype=None,
        ema_dtype=None,
        # vae_compute_dtype (VAE-GAN training only): 'bfloat16' runs the
        # autoencoder fwd/bwd with bf16 params+activations (loss math, KL,
        # adaptive weight, discriminator, optimizer all stay f32); 'auto' =
        # bf16 on real TPUs.  probe75 measures the win; default off until
        # recorded (see VAETrainer.compute_dtype).
        vae_compute_dtype=None,
        # conv3d_impl: the 3-D conv lowering for the TRAIN step only.  'auto'
        # = XLA's native 3-D conv on real TPUs when the per-device batch is
        # >= 8 (probe49: +3.6% whole-step at B=8 but -7.6% at B=2, where
        # t2d's folded-T batching wins), t2d elsewhere; the sampler always
        # keeps t2d (near-roofline ~133 TF/s at B=1, probe53).
        conv3d_impl="auto",
        method="adamw",
        lr=1.0e-3, wd=1.0e-5, betas=[0.9, 0.999], gradient_clip_val=1.0,
        max_epochs=2000, loss_type="l2", warmup_percentage=0.1,
        lr_scheduler_mode="cosine", min_lr_ratio=1.0e-3,
        warmup_min_lr_ratio=0.1, monitor="valid_loss_epoch", early_stop=False,
        early_stop_mode="min", early_stop_patience=100, save_top_k=3,
    )


def diffusion_default() -> Dict:
    return dict(
        data_shape=[6, 128, 128, 1], timesteps=1000, beta_schedule="linear",
        use_ema=True, log_every_t=100, clip_denoised=False, linear_start=1e-4,
        linear_end=2e-2, cosine_s=8e-3, given_betas=None,
        original_elbo_weight=0.0, v_posterior=0.0, l_simple_weight=1.0,
        parameterization="eps", learn_logvar=True, logvar_init=0.0,
        latent_shape=[6, 16, 16, 64], cond_stage_model="__is_first_stage__",
        num_timesteps_cond=None, cond_stage_trainable=False,
        cond_stage_forward=None, scale_by_std=False, scale_factor=1.0,
        latent_cond_shape=[7, 16, 16, 64],
        # frames per lax.map chunk in decode (the reference's use_slicing
        # memory escape hatch, taming/autoencoder_kl.py:91-113); None = all
        decode_chunk_size=None,
        # frozen-VAE *encode* compute dtype; 'auto' = bf16 on real TPUs
        # (f32 HBM traffic on (B*T,128,128,C) activations dominates the
        # encoder, probe44), f32 on CPU/tests.  Decode stays f32.
        first_stage_dtype="auto",
    )


def latent_model_default() -> Dict:
    return dict(
        input_shape=[7, 16, 16, 64], target_shape=[6, 16, 16, 64],
        base_units=256, block_units=None, scale_alpha=1.0, num_heads=4,
        attn_drop=0.1, proj_drop=0.1, ffn_drop=0.1, downsample=2,
        downsample_type="patch_merge", upsample_type="upsample",
        upsample_kernel_size=3, depth=[4, 4], self_pattern="axial",
        num_global_vectors=0, use_dec_self_global=False,
        dec_self_update_global=True, use_dec_cross_global=False,
        use_global_vector_ffn=False, use_global_self_attn=True,
        separate_global_qkv=True, global_dim_ratio=1, ffn_activation="gelu",
        gated_ffn=False, norm_layer="layer_norm", padding_type="zeros",
        pos_embed_type="t+h+w", checkpoint_level=0, use_relative_pos=True,
        self_attn_use_final_proj=True,
        attn_linear_init_mode="0", ffn_linear_init_mode="0",
        ffn2_linear_init_mode="2", attn_proj_linear_init_mode="2",
        conv_init_mode="0", down_up_linear_init_mode="0",
        global_proj_linear_init_mode="2", norm_init_mode="0",
        time_embed_channels_mult=4,
        time_embed_use_scale_shift_norm=False, time_embed_dropout=0.0,
        unet_res_connect=True,
        # Optional keys NOT in the defaults tree (kept out so the config
        # stays tree-equal to the reference v1 YAMLs); the factory reads
        # them with .get():
        #   use_pallas_attention: False | True | "layer" | "auto" (default
        #       "auto" = v4 whole-layer kernel on real TPU backends)
        #   use_pallas_ffn:       False | True | "auto" (default "auto")
        #   use_pallas_dropout:   False | True | "auto" (default "auto" —
        #       in-kernel PRNG dropout so the fused FFN/attention kernels
        #       serve ACTIVE-dropout training (v1 recipe); real TPU only,
        #       masks from the TPU PRNG stream, not flax Dropout draws.
        #       probe68: v1 recipe 37.96 samples/s vs 26.12 on the XLA
        #       path at B=8; probe67 validates mask statistics, fwd/bwd
        #       mask identity, and rate0 bit-equality on the real chip)
        #   use_pallas_gn:        False | True | "auto" (default "auto")
        #   use_pallas_conv:      False | True | "auto" (default "auto" —
        #       fused 3x3x3 conv on eligible shapes; the trainer's
        #       optim.conv3d_impl context override wins in the train step)
        #   use_pallas_resblock:  False | True | "auto" (default "auto" —
        #       whole-TimeEmbedResBlock fused kernel; only small volumes
        #       fit its VMEM budget, i.e. the alignment network's blocks.
        #       The same key under model.align.model_args governs the
        #       alignment network, where it is the guidance op-count lever)
        # All fused kernels are differentiable (custom_vjp, round-3) and
        # fall back per-layer on ineligible shapes; see
        # prediff_tpu/ops/pallas_*.py.
    )


def vae_default() -> Dict:
    return dict(
        pretrained_ckpt_path="pretrained_sevirlr_vae_8x8x64_v1.pt",
        data_channels=1,
        down_block_types=["DownEncoderBlock2D"] * 4,
        in_channels=1,
        block_out_channels=[128, 256, 512, 512],
        act_fn="silu",
        latent_channels=64,
        up_block_types=["UpDecoderBlock2D"] * 4,
        norm_num_groups=32,
        layers_per_block=2,
        out_channels=1,
        # False / True / "auto" (real TPU only): sub-pixel decoder
        # upsamplers — exact reformulation, 2.25x fewer upsampler MACs
        # (ops/subpixel.py; probe79).  Param tree unchanged.  Default
        # "auto": probe80 whole-step A/B measured +4.8% (f32) / +7.5%
        # (bf16 compute) on VAE-GAN training, neutral on decode-only.
        decoder_subpixel="auto",
    )


def align_default() -> Dict:
    return dict(
        alignment_type="avg_x",
        guide_scale=50.0,
        model_type="cuboid",
        model_args=dict(
            input_shape=[6, 16, 16, 64], out_channels=1, base_units=128,
            scale_alpha=1.0, depth=[1, 1], downsample=2,
            downsample_type="patch_merge", block_attn_patterns="axial",
            num_heads=4, attn_drop=0.1, proj_drop=0.1, ffn_drop=0.1,
            ffn_activation="gelu", gated_ffn=False, norm_layer="layer_norm",
            use_inter_ffn=True, hierarchical_pos_embed=False,
            pos_embed_type="t+h+w", padding_type="zeros", checkpoint_level=0,
            use_relative_pos=True, self_attn_use_final_proj=True,
            num_global_vectors=0, use_global_vector_ffn=True,
            use_global_self_attn=False, separate_global_qkv=False,
            global_dim_ratio=1,
            attn_linear_init_mode="0", ffn_linear_init_mode="0",
            ffn2_linear_init_mode="2", attn_proj_linear_init_mode="2",
            conv_init_mode="0", down_linear_init_mode="0",
            global_proj_linear_init_mode="2", norm_init_mode="0",
            time_embed_channels_mult=4,
            time_embed_use_scale_shift_norm=False, time_embed_dropout=0.0,
            pool="attention", readout_seq=True, out_len=6,
        ),
        model_ckpt_path="pretrained_sevirlr_alignment_avg_x_cuboid_v1.pt",
    )


def eval_default() -> Dict:
    return dict(
        train_example_data_idx_list=[0],
        val_example_data_idx_list=[0, 16, 32, 48, 64, 72, 96, 108, 128],
        test_example_data_idx_list=[0, 16, 32, 48, 64, 72, 96, 108, 128],
        eval_example_only=True, eval_aligned=True, eval_unaligned=True,
        num_samples_per_context=1, fs=20, label_offset=[-0.5, 0.5],
        label_avg_int=False, fvd_features=400, fvd=True, fvd_resolution=224,
        # Validation-time forecasts use DDIM-k: checkpoint selection only needs
        # the CSI *ranking*, which DDIM-50 preserves at ~1/20 the cost of the
        # reference's 1000-step DDPM; test eval still defaults to full DDPM.
        val_ddim_steps=50,
    )


def logging_default() -> Dict:
    return dict(logging_prefix="PreDiff", monitor_lr=True, monitor_device=False,
                track_grad_norm=-1, use_wandb=False, profiler=None, save_npy=True)


def trainer_default() -> Dict:
    return dict(check_val_every_n_epoch=50, log_step_ratio=0.001, precision=32,
                find_unused_parameters=False, num_sanity_val_steps=2)


def prediff_default_config() -> ConfigDict:
    """Full default tree == scripts/prediff/sevirlr/prediff_sevirlr_v1.yaml."""
    return ConfigDict.wrap(
        dict(
            dataset=dataset_default(),
            layout=layout_default(),
            optim=optim_default(),
            logging=logging_default(),
            trainer=trainer_default(),
            eval=eval_default(),
            model=dict(
                diffusion=diffusion_default(),
                align=align_default(),
                latent_model=latent_model_default(),
                vae=vae_default(),
            ),
        )
    )


def vae_training_default_config() -> ConfigDict:
    """Defaults matching scripts/vae/sevirlr/vae_sevirlr_v1.yaml."""
    return ConfigDict.wrap(
        dict(
            # frame-level data: seq_len=1 windows, NHWC (ref vae_sevirlr_v1.yaml)
            dataset=deep_merge(dataset_default(), dict(
                aug_mode="1", in_len=0, out_len=1, seq_len=1, stride=1,
            )),
            layout=deep_merge(layout_default(), dict(layout="NHWC")),
            optim=deep_merge(optim_default(), dict(lr=5.0e-5, total_batch_size=128,
                                                   micro_batch_size=8)),
            logging=logging_default(),
            trainer=trainer_default(),
            eval=eval_default(),
            model=dict(
                vae=vae_default(),
                loss=dict(
                    disc_start=50001, kl_weight=1e-6, disc_weight=0.5,
                    disc_factor=1.0, disc_loss="hinge", logvar_init=0.0,
                    perceptual_weight=0.0, disc_in_channels=1,
                    disc_num_layers=3, use_actnorm=False,
                ),
            ),
        )
    )


def alignment_default_config() -> ConfigDict:
    return ConfigDict.wrap(
        dict(
            dataset=dataset_default(),
            layout=layout_default(),
            optim=deep_merge(optim_default(), dict(lr=1.0e-4)),
            logging=logging_default(),
            trainer=trainer_default(),
            eval=eval_default(),
            model=dict(
                diffusion=diffusion_default(),
                align=align_default(),
                vae=vae_default(),
            ),
        )
    )


def load_config(default_fn, yaml_path: Optional[str] = None) -> ConfigDict:
    cfg = default_fn().to_dict()
    if yaml_path:
        cfg = deep_merge(cfg, load_yaml(yaml_path))
    return ConfigDict.wrap(cfg)
