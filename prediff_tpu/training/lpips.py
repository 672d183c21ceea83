"""LPIPS perceptual loss (VGG16 backbone + learned 1x1 heads) in flax.

Reference parity: taming/losses/lpips.py (itself a stripped
richzhang/PerceptualSimilarity).  Channel-last NHWC; torch VGG16 ImageNet
weights and the published vgg_lpips head checkpoint convert via
prediff_tpu.utils.convert (module names mirror the torch Sequential indices:
slice1/0, slice2/5, ... lin0/model/1).

The SEVIR-LR v1 recipe trains with perceptual_weight=0, so LPIPS is optional;
plug an instance into VAETrainer(perceptual_fn=...) when weights are present.
"""
import jax
import jax.numpy as jnp
from flax import linen as nn

# conv layer indices within torchvision vgg16 .features per slice
_SLICES = {
    "slice1": (0, 2),                # convs at features[0], features[2]
    "slice2": (5, 7),
    "slice3": (10, 12, 14),
    "slice4": (17, 19, 21),
    "slice5": (24, 26, 28),
}
_CHANNELS = {
    "slice1": (64, 64),
    "slice2": (128, 128),
    "slice3": (256, 256, 256),
    "slice4": (512, 512, 512),
    "slice5": (512, 512, 512),
}
LPIPS_CHNS = (64, 128, 256, 512, 512)

# ImageNet scaling constants used by LPIPS (lpips.py:60-66)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """VGG16 feature slices returning (relu1_2, relu2_2, relu3_3, relu4_3,
    relu5_3); maxpool between slices."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        outs = []
        for si, (slice_name, conv_idxs) in enumerate(_SLICES.items()):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for idx, ch in zip(conv_idxs, _CHANNELS[slice_name]):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"{slice_name}_{idx}")(x)
                x = jax.nn.relu(x)
            outs.append(x)
        return tuple(outs)


class NetLinLayer(nn.Module):
    """1x1 conv head; the conv is named model_1 to mirror the torch
    Sequential [Dropout, Conv] indices."""

    @nn.compact
    def __call__(self, x):
        return nn.Conv(1, (1, 1), use_bias=False, name="model_1")(x)


class LPIPS(nn.Module):
    """Learned perceptual distance between NHWC images in [-1, 1] (3-channel).
    Returns (B, 1, 1, 1) like the reference."""

    @nn.compact
    def __call__(self, input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        def scaling(x):
            return (x - _SHIFT) / _SCALE

        net = VGG16Features(name="net")
        outs0 = net(scaling(input))
        outs1 = net(scaling(target))

        def unit_normalize(x, eps=1e-10):
            n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
            return x / (n + eps)

        val = 0.0
        for kk, ch in enumerate(LPIPS_CHNS):
            f0 = unit_normalize(outs0[kk])
            f1 = unit_normalize(outs1[kk])
            diff = jnp.square(f0 - f1)
            w = NetLinLayer(name=f"lin{kk}")(diff)
            val = val + w.mean(axis=(1, 2), keepdims=True)
        return val.transpose(0, 3, 1, 2)  # (B, 1, 1, 1) channel-first like ref
