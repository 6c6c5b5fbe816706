"""Functional layer primitives with explicit param pytrees.

The TPU-native replacement for the reference's tf_util.py layer library
(utils/tf_util.py:101-669). Key differences by design:

  * No variable scopes / graph state: every layer is (init, apply) over an
    explicit params dict, so composition, freezing, and sharding are plain
    pytree operations.
  * The reference's conv2d-with-[1,W]-kernel idiom (pointwise MLPs over
    point clouds) is expressed directly as dense matmuls on the feature
    axis — identical math, but XLA sees clean MXU-sized matmuls instead of
    degenerate convolutions.
  * Initializers match TF semantics (xavier_initializer uniform with conv
    fan rules; zeros bias) so training dynamics are comparable.

BatchNorm carries its EMA state separately from params (state in, state
out), mirroring tf.contrib.layers.batch_norm with updates applied inline
(utils/tf_util.py:558-577). The reference's canonical config runs BN off.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    """TF xavier_initializer: U(-limit, limit), limit = sqrt(6/(fan_in+fan_out))."""
    limit = math.sqrt(6.0 / float(fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def truncated_normal(key, shape, stddev, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, *, conv_fan: Tuple[int, int] | None = None,
               dtype=jnp.float32):
    """Dense layer params.

    conv_fan: optional (fan_in, fan_out) override reproducing TF's conv
    xavier fans when the reference layer was a [1, W] conv over 1 channel
    (fan_in = W*C_in, fan_out = W*C_out; cf. tf_util.conv2d:157-230).
    """
    if conv_fan is None:
        fan_in, fan_out = in_dim, out_dim
    else:
        fan_in, fan_out = conv_fan
    w = xavier_uniform(key, (in_dim, out_dim), fan_in, fan_out, dtype)
    b = jnp.zeros((out_dim,), dtype)
    return {"w": w, "b": b}


def dense_apply(params, x, *, precision=None):
    return jnp.matmul(x, params["w"], precision=precision) + params["b"]


# ---------------------------------------------------------------------------
# Conv3D (channels-last NDHWC, SAME padding) — used by inception/resnet paths
# ---------------------------------------------------------------------------

def conv3d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int, int],
                dtype=jnp.float32):
    kd, kh, kw = kernel
    rf = kd * kh * kw
    w = xavier_uniform(key, (kd, kh, kw, in_ch, out_ch), rf * in_ch, rf * out_ch, dtype)
    b = jnp.zeros((out_ch,), dtype)
    return {"w": w, "b": b}


def conv3d_apply(params, x, *, stride: Tuple[int, int, int] = (1, 1, 1),
                 padding: str = "SAME"):
    """x: (B, D, H, W, C) -> (B, D', H', W', C')."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + params["b"]


def conv2d_init(key, in_ch: int, out_ch: int, kernel: Tuple[int, int],
                dtype=jnp.float32):
    """tf_util.conv2d parity (utils/tf_util.py:161-229): xavier over the
    full receptive field."""
    kh, kw = kernel
    rf = kh * kw
    w = xavier_uniform(key, (kh, kw, in_ch, out_ch), rf * in_ch, rf * out_ch,
                       dtype)
    return {"w": w, "b": jnp.zeros((out_ch,), dtype)}


def conv2d_apply(params, x, *, stride: Tuple[int, int] = (1, 1),
                 padding: str = "SAME"):
    """x: (B, H, W, C) -> (B, H', W', C')."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"]


def conv2d_transpose_apply(params, x, *, stride: Tuple[int, int] = (2, 2),
                           padding: str = "SAME"):
    """Transposed conv (tf_util.conv2d_transpose, utils/tf_util.py:231-301).

    Shares conv2d_init parameters; output spatial dims = input * stride for
    SAME padding, matching the reference's get_deconv_dim arithmetic.
    """
    kh, kw, in_ch, out_ch = params["w"].shape
    y = jax.lax.conv_transpose(
        x, params["w"], strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"]


def _pool(x, window, stride, padding, *, op, ndim):
    dims = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    if op == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides,
                                     padding)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding)
    if padding == "VALID":
        return s / float(math.prod(window))
    ones = jnp.ones_like(x)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, padding)
    return s / cnt


def max_pool2d(x, window=(2, 2), *, stride=None, padding="VALID"):
    """(B, H, W, C) max pool (tf_util.max_pool2d, utils/tf_util.py:410-433)."""
    return _pool(x, window, stride or window, padding, op="max", ndim=2)


def avg_pool2d(x, window=(2, 2), *, stride=None, padding="VALID"):
    """(B, H, W, C) avg pool (tf_util.avg_pool2d, utils/tf_util.py:435-459)."""
    return _pool(x, window, stride or window, padding, op="avg", ndim=2)


def max_pool3d(x, window=(2, 2, 2), *, stride=None, padding="VALID"):
    """(B, D, H, W, C) max pool (tf_util.max_pool3d, utils/tf_util.py:461-484)."""
    return _pool(x, window, stride or window, padding, op="max", ndim=3)


def avg_pool3d(x, window=(2, 2, 2), *, stride=None, padding="VALID"):
    """(B, D, H, W, C) avg pool (tf_util.avg_pool3d, utils/tf_util.py:486-510)."""
    return _pool(x, window, stride or window, padding, op="avg", ndim=3)


# ---------------------------------------------------------------------------
# BatchNorm (feature-axis, EMA running stats)
# ---------------------------------------------------------------------------

def batchnorm_init(dim: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((dim,), dtype), "offset": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)}
    return params, state


def batchnorm_apply(params, state, x, *, train: bool, momentum=0.9, eps: float = 1e-3):
    """Normalize over all axes except the last.

    momentum here is the EMA decay (the reference's bn_decay schedule value,
    train_multi_gpu_pc_compare_dist.py:992-1000). eps matches
    tf.contrib.layers.batch_norm's default 1e-3.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["scale"] + params["offset"]
    return y, new_state


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------

def dropout(key, x, keep_prob: float, *, train: bool):
    """Inverted dropout (tf_util.dropout parity, utils/tf_util.py:615-637)."""
    if not train or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# MLP helper (dense chain with ReLU, optional BN, linear last layer optional)
# ---------------------------------------------------------------------------

def mlp_init(key, in_dim: int, widths: Sequence[int], *, conv_fan_first=None,
             use_bn: bool = False, dtype=jnp.float32):
    """Stack of dense layers. widths includes the output layer."""
    keys = jax.random.split(key, len(widths))
    layers = []
    bns_p, bns_s = [], []
    d = in_dim
    for i, (k, w) in enumerate(zip(keys, widths)):
        fan = conv_fan_first if i == 0 else None
        layers.append(dense_init(k, d, w, conv_fan=fan, dtype=dtype))
        if use_bn:
            bp, bs = batchnorm_init(w, dtype)
            bns_p.append(bp)
            bns_s.append(bs)
        d = w
    params = {"layers": layers}
    state = {}
    if use_bn:
        params["bn"] = bns_p
        state["bn"] = bns_s
    return params, state


def mlp_apply(params, state, x, *, train: bool = False, bn_momentum=0.9,
              final_activation=None, precision=None):
    """Apply dense chain: ReLU (+BN if present) after every layer except the
    last, which gets final_activation (None = linear).

    Matches the reference decoder structure (dpdist_util.DPDist:513-547):
    conv2d default relu activation on hidden layers, activation_fn=None on
    the output layer. When BN is on, it is applied before the ReLU exactly
    as tf_util.conv2d does.
    """
    layers = params["layers"]
    use_bn = "bn" in params
    new_bn_state = []
    n = len(layers)
    for i, lp in enumerate(layers):
        x = dense_apply(lp, x, precision=precision)
        if i < n - 1:
            if use_bn:
                x, s = batchnorm_apply(
                    params["bn"][i], state["bn"][i], x, train=train, momentum=bn_momentum
                )
                new_bn_state.append(s)
            x = jax.nn.relu(x)
        else:
            if use_bn:
                x, s = batchnorm_apply(
                    params["bn"][i], state["bn"][i], x, train=train, momentum=bn_momentum
                )
                new_bn_state.append(s)
            if final_activation is not None:
                x = final_activation(x)
    new_state = {"bn": new_bn_state} if use_bn else {}
    return x, new_state
