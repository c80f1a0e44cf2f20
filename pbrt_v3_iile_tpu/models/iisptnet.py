"""IISPTNet: the IILE indirect-illumination U-Net, in flax.

Exact topology of the reference's PyTorch model (ref: ml/iispt_net.py:6-109):
7->3 channel U-Net on 32x32 hemispherical G-buffers; encoders
K/2K/4K/8K with MaxPool downsamples, LeakyReLU(0.2) + BatchNorm, bilinear
2x upsamples, skip concats, ConvTranspose(3x3, stride 1) decoder blocks,
final 1x1 conv + ReLU.  NHWC layout (TPU-native); inference runs fused
inside the render graph — the reference's per-thread Python child process
and stdio float32 pipe (ref: tools/childprocess.hpp, Doc.md:1-33)
disappear entirely.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

K = 64


class IISPTNet(nn.Module):
    k: int = K

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, 32, 32, 7) -> (B, 32, 32, 3)."""
        k = self.k
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        bn = lambda v: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5)(v)
        conv = lambda f: nn.Conv(f, (3, 3), padding="SAME")
        convt = lambda f: nn.ConvTranspose(f, (3, 3), padding="SAME")
        pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))

        def up2(v):
            b, h, w, c = v.shape
            return jax.image.resize(v, (b, 2 * h, 2 * w, c), "bilinear")

        # encoder0 (32x32, 7->K)
        x0 = lrelu(conv(k)(x))
        x0 = lrelu(conv(k)(x0))
        # encoder1 (->16x16, 2K)
        x1 = pool(x0)
        x1 = bn(lrelu(conv(2 * k)(x1)))
        x1 = lrelu(conv(2 * k)(x1))
        # encoder2 (->8x8, 4K)
        x2 = pool(x1)
        x2 = bn(lrelu(conv(4 * k)(x2)))
        x2 = lrelu(conv(4 * k)(x2))
        # encoder3 (->4x4 -> up to 8x8, 4K)
        x3 = pool(x2)
        x3 = bn(lrelu(conv(8 * k)(x3)))
        x3 = lrelu(conv(4 * k)(x3))
        x3 = up2(x3)
        # decoder0: cat(x3, x2) -> 16x16
        x4 = jnp.concatenate([x3, x2], axis=-1)
        x4 = bn(lrelu(convt(4 * k)(x4)))
        x4 = lrelu(convt(2 * k)(x4))
        x4 = up2(x4)
        # decoder1: cat(x4, x1) -> 32x32
        x5 = jnp.concatenate([x4, x1], axis=-1)
        x5 = bn(lrelu(convt(2 * k)(x5)))
        x5 = lrelu(convt(k)(x5))
        x5 = up2(x5)
        # decoder2: cat(x5, x0) -> output
        x6 = jnp.concatenate([x5, x0], axis=-1)
        x6 = lrelu(convt(k)(x6))
        x6 = lrelu(convt(k)(x6))
        x6 = nn.Conv(3, (1, 1))(x6)
        return nn.relu(x6)


def init_params(key, hemi_size: int = 32, k: int = K):
    net = IISPTNet(k=k)
    variables = net.init(key, jnp.zeros((1, hemi_size, hemi_size, 7)),
                         train=False)
    return net, variables
