"""Shared NN building blocks.

Torch-parity primitives used across the model zoo:

- :class:`BatchNorm`: cross-replica (SyncBN) capable batch norm with
  torch running-stat semantics (momentum 0.1 meaning
  ``new = 0.9*old + 0.1*batch``, *unbiased* batch variance for the
  running update, biased for normalization). Rebuilds
  ``nn.SyncBatchNorm.convert_sync_batchnorm`` (main_avss.py:135,143) as
  an ``axis_name`` psum inside the jitted step — the TPU-native form of
  cross-replica BN statistics.
- torch-default initializers (kaiming-uniform a=sqrt(5) + fan-in bias
  bounds) so training-from-scratch matches reference init statistics.

All convolutional models here are NHWC (TPU-native layout); the
checkpoint converter transposes torch OIHW weights to HWIO.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def acc_dtype(dtype: Dtype) -> Dtype:
    """Accumulation dtype for norm/loss math: at least f32 (bf16/f32
    inputs accumulate in f32, unchanged on TPU), but follows f64 when
    the x64 train-parity harness drives the model in double."""
    return jnp.promote_types(dtype, jnp.float32)


def _compute_fans(shape: Sequence[int]) -> Tuple[int, int]:
    """fan_in/fan_out for HWIO conv kernels or (in, out) dense kernels."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_uniform(a: float = math.sqrt(5.0)) -> Callable:
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) — the Conv2d/Linear default."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _compute_fans(shape)
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_out() -> Callable:
    """torch kaiming_normal_(mode="fan_out", nonlinearity="relu")."""

    def init(key, shape, dtype=jnp.float32):
        _, fan_out = _compute_fans(shape)
        std = math.sqrt(2.0 / max(fan_out, 1))
        return jax.random.normal(key, shape, dtype) * std

    return init


def torch_bias_init(kernel_shape: Sequence[int]) -> Callable:
    """torch Conv/Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in, _ = _compute_fans(kernel_shape)
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """NHWC conv with torch-style symmetric integer padding + defaults."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    groups: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.strides,) * 2 if isinstance(self.strides, int) else tuple(self.strides)
        pd = (self.padding,) * 2 if isinstance(self.padding, int) else tuple(self.padding)
        dl = (self.dilation,) * 2 if isinstance(self.dilation, int) else tuple(self.dilation)
        kshape = ks + (x.shape[-1] // self.groups, self.features)
        kernel = self.param("kernel", kaiming_uniform(), kshape, self.param_dtype)
        dtype = self.dtype or x.dtype
        # Heavily-dilated 3x3 convs at small maps (layer4 surgery d=2/4/8,
        # ASPP rates 6/12/18 at 14x14) waste most MXU work on zero padding;
        # rewrite them exactly as center-matmul + sliced edge-tap matmuls
        # when the useful-FLOP fraction is low (ops/dilated.py).
        from cavp_tpu.ops import dilated as _dilated
        if (_dilated.ENABLED and ks == (3, 3) and st == (1, 1)
                and self.groups == 1 and dl == pd and max(dl) > 1
                and _dilated.should_decompose(x.shape[1], x.shape[2], dl)):
            y = _dilated.conv3x3_dilated_taps(
                x.astype(dtype), kernel.astype(dtype), dl)
            if self.use_bias:
                bias = self.param("bias", torch_bias_init(kshape),
                                  (self.features,), self.param_dtype)
                y = y + bias.astype(dtype)
            return y
        # Stride-2 3x3 convs (deep-stem conv1, layer2/3 first-block
        # conv2) pay 4x zero-stuffing waste in their input-gradient if
        # XLA lowers the transposed conv naively; opt-in exact phase
        # decomposition (ops/stride2.py, --s2_phase_bwd).
        from cavp_tpu.ops import stride2 as _s2
        _s2_args = (ks, st, pd, dl, self.groups, x.shape[1], x.shape[2])
        if _s2.applicable(*_s2_args) or _s2.applicable_1x1(*_s2_args):
            fn = (_s2.conv3x3_s2 if ks == (3, 3) else _s2.conv1x1_s2)
            y = fn(x.astype(dtype), kernel.astype(dtype))
            if self.use_bias:
                bias = self.param("bias", torch_bias_init(kshape),
                                  (self.features,), self.param_dtype)
                y = y + bias.astype(dtype)
            return y
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=st,
            padding=((pd[0], pd[0]), (pd[1], pd[1])),
            rhs_dilation=dl,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(kshape), (self.features,),
                              self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class ConvKernel(nn.Module):
    """Param-holder that owns a conv kernel under the same path/init a
    ``Conv`` child would ("<name>/kernel", kaiming-uniform, HWIO) so a
    parent can run a custom lowering (e.g. the merged ASPP centers,
    ops/dilated.py) without changing the checkpoint structure."""

    shape: Sequence[int]
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("kernel", kaiming_uniform(), tuple(self.shape),
                          self.param_dtype)


class Dense(nn.Module):
    """Linear layer with torch default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kshape = (x.shape[-1], self.features)
        kernel = self.param("kernel", kaiming_uniform(), kshape, self.param_dtype)
        dtype = self.dtype or x.dtype
        y = jnp.matmul(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(kshape), (self.features,),
                              self.param_dtype)
            y = y + bias.astype(dtype)
        return y


class BatchNorm(nn.Module):
    """Torch-parity batch norm over NHWC (axis=-1), SyncBN-capable.

    - ``momentum`` follows the torch convention (0.1 default):
      ``running = (1-momentum)*running + momentum*batch``.
    - running variance update uses the *unbiased* batch variance
      (torch semantics); normalization uses the biased one.
    - ``axis_name``: when set and present in the current mesh context,
      batch statistics are psum-reduced across that axis — SyncBN.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (features,))
        dtype = self.dtype or x.dtype

        adt = acc_dtype(x.dtype)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            n = float(np.prod([x.shape[a] for a in reduce_axes]))
            xf = x.astype(adt)
            s1 = jnp.sum(xf, axis=reduce_axes)
            s2 = jnp.sum(xf * xf, axis=reduce_axes)
            if self.axis_name is not None:
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                n = n * jax.lax.psum(1.0, self.axis_name)
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var.astype(adt) + self.epsilon)
        mean = mean.astype(adt)
        scale = inv
        shift = -mean * inv
        if self.use_scale:
            gamma = self.param("scale", nn.initializers.ones, (features,),
                               self.param_dtype).astype(adt)
            scale = scale * gamma
            shift = shift * gamma
        if self.use_bias:
            beta = self.param("bias", nn.initializers.zeros, (features,),
                              self.param_dtype).astype(adt)
            shift = shift + beta
        # The per-channel affine is computed in f32 but applied in the
        # activation dtype: keeping the elementwise chain in bf16 lets
        # XLA fuse conv->BN->ReLU without f32 round-trips (bandwidth).
        return x * scale.astype(dtype) + shift.astype(dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch eps default 1e-5, fp32 math."""

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        xf = x.astype(acc_dtype(x.dtype))
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(dtype)


def max_pool(x, window: int, stride: int, padding: int):
    """torch MaxPool2d(window, stride, padding) over NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def global_max_pool(x):
    return jnp.max(x, axis=(1, 2), keepdims=True)


class Mlp(nn.Module):
    """timm-style Mlp (Linear -> GELU -> Linear), drop rates are 0 in CAVP."""

    hidden_features: int
    out_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x
