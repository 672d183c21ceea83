"""PreDiff-TPU: a TPU-native (JAX/XLA/Pallas) framework for latent-diffusion
precipitation nowcasting, with the full capability surface of gaozhihan/PreDiff
(NeurIPS 2023) re-designed TPU-first.

Component map (reference parity, see SURVEY.md §2):
  - ``prediff_tpu.models.vae``            : frame-wise KL autoencoder (ref: src/prediff/taming/)
  - ``prediff_tpu.models.unet``           : Earthformer cuboid-transformer UNet denoiser
                                            (ref: cuboid_transformer_unet.py)
  - ``prediff_tpu.models.cuboid_attention``: cuboid self-attention (ref: cuboid_transformer.py:595)
  - ``prediff_tpu.models.alignment``      : knowledge-alignment encoder (ref: knowledge_alignment/models.py)
  - ``prediff_tpu.diffusion``             : DDPM/DDIM schedules + scanned samplers
                                            (ref: diffusion/latent_diffusion.py)
  - ``prediff_tpu.training``              : train loops (diffusion / VAE-GAN / alignment)
  - ``prediff_tpu.parallel``              : mesh + sharding utilities (DDP equivalent via pjit)
  - ``prediff_tpu.datasets``              : SEVIR/SEVIR-LR HDF5 pipeline
  - ``prediff_tpu.evaluation``            : CSI/POD/SUCR/BIAS, MSE/MAE/SSIM, CRPS, FVD
"""

__version__ = "0.1.0"
