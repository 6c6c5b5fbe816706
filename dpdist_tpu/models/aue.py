"""Point-cloud autoencoders (the reference's downstream comparison task).

Reference: get_model_aue_pn (models/dpdist_and_aue.py:88-145) — PointNet
encoder (64, 64, 64, 128, 1024 + max pool) and FC decoder
(1024, 1024, N*3) with tanh output; and get_model_aue_3dmfv (:147-180) —
3DmFV grid encoder + one 3D inception block + FC decoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpdist_tpu.configs import AUEConfig
from dpdist_tpu.nn.layers import (
    dense_init,
    dense_apply,
    batchnorm_init,
    batchnorm_apply,
    conv3d_init,
    conv3d_apply,
)
from dpdist_tpu.ops.threedmfv import threedmfv


def _bn_dense_chain_init(key, in_dim, widths, *, conv_fan_first=None, bn_flags=None):
    keys = jax.random.split(key, len(widths))
    layers, bns_p, bns_s = [], [], []
    bn_flags = bn_flags or [True] * len(widths)
    d = in_dim
    for i, (k, w) in enumerate(zip(keys, widths)):
        fan = conv_fan_first if i == 0 else None
        layers.append(dense_init(k, d, w, conv_fan=fan))
        if bn_flags[i]:
            bp, bs = batchnorm_init(w)
        else:
            bp, bs = None, None
        bns_p.append(bp)
        bns_s.append(bs)
        d = w
    return layers, bns_p, bns_s


def init_aue(key, cfg: AUEConfig):
    params, state = {}, {}
    k_enc, k_dec, k_inc = jax.random.split(key, 3)
    N = cfg.num_point

    if cfg.encoder == "pn":
        enc_widths = [64, 64, 64, 128, 1024]
        layers, bp, bs = _bn_dense_chain_init(
            k_enc, 3, enc_widths, conv_fan_first=(3, 3 * 64)
        )
        params["encoder"] = {"layers": layers, "bn": bp}
        state["encoder"] = {"bn": bs}
        dec_in = 1024
    else:  # 3dmfv + inception decoder
        g = round(cfg.n_gaussians ** (1 / 3))
        fv_ch = 20
        ikeys = jax.random.split(k_inc, 4)
        nf = 256
        params["inception"] = {
            "conv1": conv3d_init(ikeys[0], fv_ch, nf, (1, 1, 1)),
            "conv2": conv3d_init(ikeys[1], nf, nf // 2, (3, 3, 3)),
            "conv3": conv3d_init(ikeys[2], nf, nf // 2, (5, 5, 5)),
            "conv4": conv3d_init(ikeys[3], fv_ch, nf, (1, 1, 1)),
        }
        bps, bss = [], []
        for w in (nf, nf // 2, nf // 2, nf):
            p, s = batchnorm_init(w)
            bps.append(p)
            bss.append(s)
        params["inception"]["bn"] = bps
        state["inception"] = {"bn": bss}
        dec_in = g * g * g * (nf + nf // 2 + nf // 2 + nf)

    if cfg.encoder == "pn":
        # fc1/fc2 with BN, fc3 linear without (dpdist_and_aue.py:136-140).
        dec_widths = [1024, 1024, N * 3]
        bn_flags = [True, True, False]
    else:
        # The 3dmfv AUE decoder is TWO layers and keeps BN on the N*3
        # layer (activation_fn=None but bn=True, dpdist_and_aue.py:171-175).
        dec_widths = [1024, N * 3]
        bn_flags = [True, True]
    layers, bp, bs = _bn_dense_chain_init(
        k_dec, dec_in, dec_widths, bn_flags=bn_flags
    )
    params["decoder"] = {"layers": layers, "bn": bp}
    state["decoder"] = {"bn": bs}
    return params, state


def _apply_chain(p, s, x, *, train, bn_momentum, final_linear=True):
    new_bn = []
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = dense_apply(lp, x)
        bn_p = p["bn"][i]
        if bn_p is not None:
            x, ns = batchnorm_apply(bn_p, s["bn"][i], x, train=train,
                                    momentum=bn_momentum)
            new_bn.append(ns)
        else:
            new_bn.append(None)
        if not (final_linear and i == n - 1):
            x = jax.nn.relu(x)
    return x, {"bn": new_bn}


def apply_aue(params, state, cfg: AUEConfig, points, *, train: bool = False,
              bn_momentum=0.9):
    """points (B, N, 3) -> reconstruction (B, N, 3) in [-1, 1] (tanh)."""
    B, N, _ = points.shape
    new_state = {}

    if cfg.encoder == "pn":
        feat, ns = _apply_chain(params["encoder"], state["encoder"], points,
                                train=train, bn_momentum=bn_momentum,
                                final_linear=False)
        new_state["encoder"] = ns
        z = jnp.max(feat, axis=1)  # (B, 1024)
    else:
        fv = threedmfv(points, cfg.n_gaussians, 0.0625)
        g = round(cfg.n_gaussians ** (1 / 3))
        # (B, V, 20) -> (B, g, g, g, 20); reference reshapes channel-first
        # then transposes — net effect is the same volume layout.
        vol = fv.reshape(B, g, g, g, -1)
        ip = params["inception"]
        istate = state["inception"]
        one, s0 = batchnorm_apply(ip["bn"][0], istate["bn"][0],
                                  conv3d_apply(ip["conv1"], vol), train=train,
                                  momentum=bn_momentum)
        one = jax.nn.relu(one)
        three, s1 = batchnorm_apply(ip["bn"][1], istate["bn"][1],
                                    conv3d_apply(ip["conv2"], one), train=train,
                                    momentum=bn_momentum)
        three = jax.nn.relu(three)
        five, s2 = batchnorm_apply(ip["bn"][2], istate["bn"][2],
                                   conv3d_apply(ip["conv3"], one), train=train,
                                   momentum=bn_momentum)
        five = jax.nn.relu(five)
        avg = jax.lax.reduce_window(
            vol, 0.0, jax.lax.add, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "SAME"
        ) / 27.0
        avgc, s3 = batchnorm_apply(ip["bn"][3], istate["bn"][3],
                                   conv3d_apply(ip["conv4"], avg), train=train,
                                   momentum=bn_momentum)
        avgc = jax.nn.relu(avgc)
        z = jnp.concatenate([one, three, five, avgc], axis=-1).reshape(B, -1)
        new_state["inception"] = {"bn": [s0, s1, s2, s3]}

    rec, ns = _apply_chain(params["decoder"], state["decoder"], z,
                           train=train, bn_momentum=bn_momentum)
    new_state["decoder"] = ns
    rec = jnp.tanh(rec).reshape(B, N, 3)
    return rec, new_state
