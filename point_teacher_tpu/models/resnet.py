"""ResNet backbone (flax, NHWC, bf16-friendly).

Capability target: HBB_TOD/mmdet/models/backbones/resnet.py (depth 50,
out_indices (0,1,2,3), frozen_stages=1, BN frozen — config
aitodv2_point_teacher_0%.py:28-39). Differences by design:
- NHWC layout (TPU-native) instead of NCHW.
- BatchNorm is always frozen on the Point-Teacher path (`norm_eval=True`,
  `requires_grad=False`), so it is implemented as a constant affine
  (FrozenBN); there is no train/eval mode split. Freezing of stem/stage-1
  weights is enforced by the optimizer mask (train/optim.py), keeping the
  module pure.
- caffe vs pytorch style: stride placement on the 1x1 (caffe) vs 3x3
  (pytorch) bottleneck conv.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
BOTTLENECK_DEPTHS = (50, 101)


class FrozenBN(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * gamma + beta with all four frozen.

    Parameters live in the 'params' collection (so EMA/teacher copies see
    them) but are excluded from optimizer updates by the 'bn' path mask.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        # fold into a single scale/shift (XLA fuses this into the conv)
        scale = (gamma / jnp.sqrt(var + self.eps)).astype(x.dtype)
        shift = (beta - mean * gamma / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return x * scale + shift


class _StemKernel(nn.Module):
    """Holds the stem conv kernel in nn.Conv's layout/init so the
    space-to-depth stem is parameter-compatible with the plain one."""

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    style: str = "caffe"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        out_c = self.planes * 4

        identity = x
        h = nn.Conv(self.planes, (1, 1), strides=(s1, s1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = FrozenBN(name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=(s2, s2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBN(name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = FrozenBN(name="bn3")(h)

        if x.shape[-1] != out_c or self.stride != 1:
            identity = nn.Conv(out_c, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBN(name="downsample_bn")(identity)
        return nn.relu(h + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    style: str = "pytorch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = FrozenBN(name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = FrozenBN(name="bn2")(h)
        if x.shape[-1] != self.planes or self.stride != 1:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBN(name="downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    """ResNet with multi-stage outputs.

    Returns features for out_indices: stage i has stride 4 * 2^i and
    channels (256, 512, 1024, 2048) * expansion for depth >= 50.
    """

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = "caffe"
    # torch `_freeze_stages` semantics (resnet.py frozen_stages): 0 freezes the
    # stem, k>=1 additionally freezes layers 1..k. Frozen params get exactly
    # zero gradients (requires_grad=False skips their backward in torch); here
    # a stop_gradient at the frozen/trainable boundary lets XLA dead-code the
    # frozen prefix's backward pass — the optimizer mask (train/optim.py)
    # independently guarantees no updates either way.
    frozen_stages: int = -1
    # Space-to-depth stem: compute the 7x7/s2 stem conv as an exactly
    # equivalent 4x4/s1 conv on 2x2 space-to-depth input (kernel zero-padded
    # to 8x8 and repacked; parameters stay in the [7,7,3,64] layout so
    # torch-port/checkpoints are unaffected). MEASURED SLOWER on the v5e at
    # the bench geometry (dense fwd+bwd B=8 800px: 84 ms vs 72 ms plain —
    # XLA already lowers the strided 7x7 well and the s2d pad+transpose of
    # the full input costs more than it saves; NOTES_r3.md), so the default
    # stays False. Kept selectable for other geometries/backends.
    s2d_stem: bool = False
    dtype: Any = jnp.float32

    def _stem_conv(self, x: Array) -> Array:
        if not self.s2d_stem:
            return nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                           use_bias=False, dtype=self.dtype,
                           name="stem_conv")(x)
        # param lives at backbone/stem_conv/kernel in the SAME [7,7,3,64]
        # layout as the plain nn.Conv (torch-port + checkpoint compatible)
        k = _StemKernel(name="stem_conv")()
        # y[i,j] = sum_{dy,dx<7} k[dy,dx] xpad3[2i+dy, 2j+dx]
        #        = sum_{e,f<8} kp[e,f] xpad4[2i+e, 2j+f],  kp[1:,1:] = k
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        # e = 2e'+p: [8,8,3,64] -> [4,2,4,2,3,64] -> [4,4,(2,2,3),64]
        kp = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        kp = kp.reshape(4, 4, 12, 64).astype(self.dtype)
        b, hh, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        xs = xp.reshape(b, (hh + 6) // 2, 2, (ww + 6) // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (hh + 6) // 2, (ww + 6) // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            xs, kp, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )

    @nn.compact
    def __call__(self, x: Array):
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = Bottleneck if self.depth in BOTTLENECK_DEPTHS else BasicBlock

        h = self._stem_conv(x.astype(self.dtype))
        h = FrozenBN(name="stem_bn")(h)
        h = nn.relu(h)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            h = jax.lax.stop_gradient(h)

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                h = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    style=self.style,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(h)
            if self.frozen_stages >= stage + 1:
                h = jax.lax.stop_gradient(h)
            if stage in self.out_indices:
                outs.append(h)
            planes *= 2
        return tuple(outs)
