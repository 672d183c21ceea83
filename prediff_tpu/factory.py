"""Factories: config tree -> models / pipeline / trainers.

The reference builds these inside each driver script
(train_sevirlr_prediff.py:91-206); centralizing keeps CLIs thin and makes the
pipeline constructible in one call for serving."""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ConfigDict
from .models.unet import CuboidTransformerUNet
from .models.vae import AutoencoderKL
from .models.alignment import NoisyCuboidTransformerEncoder
from .diffusion.latent_diffusion import LatentDiffusion
from .diffusion.knowledge_alignment import KnowledgeAlignment


# 'auto' pallas flags are passed through to the modules verbatim and resolved
# at TRACE time (ops/dispatch.py), so the kernel on/off decision tracks the
# backend the model actually runs under, not the backend at build time
# (advisor round-2 finding).


def build_unet(cfg: ConfigDict) -> CuboidTransformerUNet:
    """cfg = full config; uses cfg.model.latent_model (ref :91-139)."""
    m = cfg.model.latent_model
    num_blocks = len(m.depth)
    pattern = m.self_pattern
    block_attn_patterns = [pattern] * num_blocks if isinstance(pattern, str) else list(pattern)
    return CuboidTransformerUNet(
        input_shape=tuple(m.input_shape),
        target_shape=tuple(m.target_shape),
        base_units=m.base_units,
        block_units=m.get("block_units"),
        scale_alpha=m.scale_alpha,
        num_heads=m.num_heads,
        attn_drop=m.attn_drop,
        proj_drop=m.proj_drop,
        ffn_drop=m.ffn_drop,
        downsample=m.downsample,
        downsample_type=m.downsample_type,
        upsample_type=m.upsample_type,
        upsample_kernel_size=m.upsample_kernel_size,
        depth=list(m.depth),
        block_attn_patterns=block_attn_patterns,
        num_global_vectors=m.num_global_vectors,
        use_global_vector_ffn=m.use_global_vector_ffn,
        use_global_self_attn=m.use_global_self_attn,
        separate_global_qkv=m.separate_global_qkv,
        global_dim_ratio=m.global_dim_ratio,
        ffn_activation=m.ffn_activation,
        gated_ffn=m.gated_ffn,
        norm_layer=m.norm_layer,
        padding_type=m.padding_type,
        checkpoint_level=m.checkpoint_level,
        pos_embed_type=m.pos_embed_type,
        use_relative_pos=m.use_relative_pos,
        use_pallas_attention=m.get("use_pallas_attention", "auto"),
        use_pallas_ffn=m.get("use_pallas_ffn", "auto"),
        use_pallas_dropout=m.get("use_pallas_dropout", "auto"),
        use_pallas_gn=m.get("use_pallas_gn", "auto"),
        use_pallas_conv=m.get("use_pallas_conv", False),
        use_pallas_resblock=m.get("use_pallas_resblock", "auto"),
        self_attn_use_final_proj=m.self_attn_use_final_proj,
        attn_linear_init_mode=m.get("attn_linear_init_mode", "0"),
        ffn_linear_init_mode=m.get("ffn_linear_init_mode", "0"),
        ffn2_linear_init_mode=m.get("ffn2_linear_init_mode", "2"),
        attn_proj_linear_init_mode=m.get("attn_proj_linear_init_mode", "2"),
        conv_init_mode=m.get("conv_init_mode", "0"),
        down_linear_init_mode=m.get("down_up_linear_init_mode", "0"),
        up_linear_init_mode=m.get("down_up_linear_init_mode", "0"),
        global_proj_linear_init_mode=m.get("global_proj_linear_init_mode", "2"),
        norm_init_mode=m.get("norm_init_mode", "0"),
        time_embed_channels_mult=m.time_embed_channels_mult,
        time_embed_use_scale_shift_norm=m.time_embed_use_scale_shift_norm,
        time_embed_dropout=m.time_embed_dropout,
        unet_res_connect=m.unet_res_connect,
    )


def build_vae(cfg: ConfigDict) -> AutoencoderKL:
    v = cfg.model.vae
    return AutoencoderKL(
        in_channels=v.in_channels,
        out_channels=v.out_channels,
        down_block_types=tuple(v.down_block_types),
        up_block_types=tuple(v.up_block_types),
        block_out_channels=tuple(v.block_out_channels),
        layers_per_block=v.layers_per_block,
        latent_channels=v.latent_channels,
        norm_num_groups=v.norm_num_groups,
        decoder_subpixel=v.get("decoder_subpixel", "auto"),
    )


def build_alignment_model(cfg: ConfigDict) -> NoisyCuboidTransformerEncoder:
    a = cfg.model.align.model_args
    return NoisyCuboidTransformerEncoder(
        input_shape=tuple(a.input_shape),
        out_channels=a.out_channels,
        base_units=a.base_units,
        scale_alpha=a.scale_alpha,
        depth=list(a.depth),
        downsample=a.downsample,
        downsample_type=a.downsample_type,
        block_attn_patterns=a.block_attn_patterns,
        num_heads=a.num_heads,
        attn_drop=a.attn_drop,
        proj_drop=a.proj_drop,
        ffn_drop=a.ffn_drop,
        ffn_activation=a.ffn_activation,
        gated_ffn=a.gated_ffn,
        norm_layer=a.norm_layer,
        use_inter_ffn=a.use_inter_ffn,
        hierarchical_pos_embed=a.hierarchical_pos_embed,
        pos_embed_type=a.pos_embed_type,
        padding_type=a.padding_type,
        checkpoint_level=a.checkpoint_level,
        use_relative_pos=a.use_relative_pos,
        # the fused kernels carry a custom_vjp since round-3, so guidance
        # (jax.grad through this network) works with them on — default 'auto'
        use_pallas_attention=a.get("use_pallas_attention", "auto"),
        use_pallas_ffn=a.get("use_pallas_ffn", "auto"),
        use_pallas_dropout=a.get("use_pallas_dropout", "auto"),
        use_pallas_gn=a.get("use_pallas_gn", "auto"),
        use_pallas_conv=a.get("use_pallas_conv", False),
        use_pallas_resblock=a.get("use_pallas_resblock", "auto"),
        self_attn_use_final_proj=a.self_attn_use_final_proj,
        attn_linear_init_mode=a.get("attn_linear_init_mode", "0"),
        ffn_linear_init_mode=a.get("ffn_linear_init_mode", "0"),
        ffn2_linear_init_mode=a.get("ffn2_linear_init_mode", "2"),
        attn_proj_linear_init_mode=a.get("attn_proj_linear_init_mode", "2"),
        conv_init_mode=a.get("conv_init_mode", "0"),
        down_linear_init_mode=a.get("down_linear_init_mode", "0"),
        global_proj_linear_init_mode=a.get("global_proj_linear_init_mode", "2"),
        norm_init_mode=a.get("norm_init_mode", "0"),
        num_global_vectors=a.num_global_vectors,
        use_global_vector_ffn=a.use_global_vector_ffn,
        use_global_self_attn=a.use_global_self_attn,
        separate_global_qkv=a.separate_global_qkv,
        global_dim_ratio=a.global_dim_ratio,
        time_embed_channels_mult=a.time_embed_channels_mult,
        time_embed_use_scale_shift_norm=a.time_embed_use_scale_shift_norm,
        time_embed_dropout=a.time_embed_dropout,
        pool=a.pool,
        readout_seq=a.readout_seq,
        out_len=a.out_len,
    )


def init_model_params(model, rng, *example_inputs):
    # jit the init: eager init dispatches thousands of tiny ops, which is
    # pathological on remote/tunneled accelerators
    return jax.jit(model.init)(rng, *example_inputs)["params"]


def build_pipeline(
    cfg: ConfigDict,
    unet_params=None,
    vae_params=None,
    align_params=None,
    rng: Optional[jax.Array] = None,
    with_alignment: Optional[bool] = None,
) -> Tuple[LatentDiffusion, Dict[str, Any]]:
    """Build the full sampling/training pipeline; initializes any params not
    provided.  Returns (pipeline, params_dict)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    d = cfg.model.diffusion
    unet = build_unet(cfg)
    vae = build_vae(cfg)
    latent_shape = tuple(d.latent_shape)
    cond_latent_shape = tuple(d.latent_cond_shape)
    if unet_params is None:
        unet_params = init_model_params(
            unet, rng,
            jnp.zeros((1,) + latent_shape),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,) + cond_latent_shape),
        )
    if vae_params is None:
        H = cfg.layout.img_height
        vae_params = init_model_params(
            vae, rng, jnp.zeros((1, H, H, cfg.model.vae.in_channels))
        )

    alignment = None
    use_align = (
        with_alignment
        if with_alignment is not None
        else cfg.model.get("align", {}).get("alignment_type") is not None
    )
    if use_align:
        align_model = build_alignment_model(cfg)
        if align_params is None:
            align_params = init_model_params(
                align_model, rng,
                jnp.zeros((1,) + tuple(cfg.model.align.model_args.input_shape)),
                jnp.zeros((1,), jnp.int32),
            )
        alignment = KnowledgeAlignment(
            params=align_params,
            guide_scale=cfg.model.align.guide_scale,
            apply_fn=align_model.apply,
            alignment_type=cfg.model.align.alignment_type,
            # optional key (kept out of the defaults tree like use_pallas_*).
            # Default f32: probe58 measured the bf16 shift slightly SLOWER
            # in-chain (130.6-131.3 vs 132.3-132.5 guided steps/s) — the
            # guidance overhead is op sequencing, not HBM traffic.
            compute_dtype=cfg.model.align.get("compute_dtype", "float32"),
        )

    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=lambda v, x: vae.apply(v, x, method=AutoencoderKL.encode_moments),
        vae_apply_decode=lambda v, z: vae.apply(v, z, method=AutoencoderKL.decode),
        timesteps=d.timesteps,
        beta_schedule=d.beta_schedule,
        linear_start=d.linear_start,
        linear_end=d.linear_end,
        cosine_s=d.cosine_s,
        given_betas=d.given_betas,
        v_posterior=d.v_posterior,
        parameterization=d.parameterization,
        learn_logvar=d.learn_logvar,
        logvar_init=d.logvar_init,
        layout=cfg.layout.layout,
        data_shape=tuple(d.data_shape),
        latent_shape=latent_shape,
        cond_latent_shape=cond_latent_shape,
        scale_factor=d.scale_factor,
        clip_denoised=d.clip_denoised,
        log_every_t=d.log_every_t,
        alignment=alignment,
        decode_chunk_size=d.get("decode_chunk_size"),
        first_stage_dtype=d.get("first_stage_dtype", "auto"),
    )
    params = {"unet": unet_params, "vae": vae_params}
    if align_params is not None:
        params["align"] = align_params
    return ld, params
