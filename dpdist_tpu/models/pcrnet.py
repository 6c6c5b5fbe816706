"""Iterative PCRNet — point-cloud registration with an on-device loop.

Reference: pcrnet-registration/models/ipcr_model.py (siamese PointNet
encoder :198-233, pose head :273-283, quat limiting :285-294) and the
training/eval refinement loops (iterative_PCRNet_ours.py:414-468,
results_itrPCRNet_no_stop.py:335-378) which ping-pong between sess.run and
host numpy per iteration.

TPU-first redesign: refinement is a jax.lax.scan carrying the source cloud
and the cumulative 4x4 transform, entirely on device; the per-iteration
pose history comes back as scan outputs for the evaluator's error curves.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dpdist_tpu.configs import PCRNetConfig
from dpdist_tpu.geometry.rotations import normalize_quat
from dpdist_tpu.geometry.se3 import apply_quat, pose7_to_matrix, compose_transforms
from dpdist_tpu.nn.layers import dense_init, dense_apply, dropout
from dpdist_tpu.ops.threedmfv import threedmfv


#: EMA momentum for the 3dmfv-encoder batch norms. The reference schedules
#: bn_decay from 0.5 toward 0.99 (get_bn_decay,
#: train_multi_gpu_pc_compare_dist.py:992-1000); a fixed mid-schedule value
#: keeps the state pytree free of a step counter.
BN_MOMENTUM = 0.9


def init_pcrnet(key, cfg: PCRNetConfig):
    keys = jax.random.split(key, 10)
    params = {}
    state = {}
    if cfg.encoder == "3dmfv":
        # 6-block 3D inception encoder (ipcr_model.get_3dmfv_encoder:29-52):
        # filters (64,)*5 + (out/16,), stride-2 maxpools after blocks 2, 4.
        from dpdist_tpu.nn.layers import conv3d_init

        blocks = []
        bn_state = []
        bkeys = jax.random.split(keys[0], 6)
        in_ch = 20
        filters = [64, 64, 64, 64, 64, cfg.out_features // 16]
        for bk, nf in zip(bkeys, filters):
            ck = jax.random.split(bk, 4)
            blocks.append({
                "one": conv3d_init(ck[0], in_ch, nf, (1, 1, 1)),
                "three": conv3d_init(ck[1], nf, nf, (3, 3, 3)),
                "five": conv3d_init(ck[2], nf, nf, (5, 5, 5)),
                "avg": conv3d_init(ck[3], in_ch, nf, (1, 1, 1)),
            })
            bn_state.append({
                name: {"mean": jnp.zeros(nf), "var": jnp.ones(nf)}
                for name in ("one", "three", "five", "avg")
            })
            in_ch = 4 * nf
        params["mfv_blocks"] = blocks
        state["mfv_bn"] = bn_state
        # spatial 8 -> 4 -> 2 after two stride-2 pools; flattened feature:
        feat_dim = 8 * 4 * filters[-1]  # 2^3 * (4 * out/16) = out/2 * 4
    else:
        enc_widths = [64, 64, 64, 128, cfg.out_features]
        enc = []
        d = 3
        for i, w in enumerate(enc_widths):
            fan = (3, 3 * 64) if i == 0 else None
            enc.append(dense_init(keys[i], d, w, conv_fan=fan))
            d = w
        params["encoder"] = enc
        feat_dim = cfg.out_features

    head = []
    d = 2 * feat_dim
    hkeys = jax.random.split(keys[5], len(cfg.head_widths))
    for hk, w in zip(hkeys, cfg.head_widths):
        head.append(dense_init(hk, d, w))
        d = w
    out = dense_init(keys[8], d, 7)
    params["head"] = head
    params["out"] = out
    return params, state


def _encode(params, cfg: PCRNetConfig, points):
    """Siamese PointNet branch: (B, N, 3) -> (B, out_features).

    The reference concatenates source+template on the batch axis before the
    shared conv stack (ipcr_model.pointnet:199); with BN off everywhere in
    this encoder (bn=False, ipcr_model.py:206-225) the two-branch call is
    mathematically identical.
    """
    x = points
    for lp in params["encoder"]:
        x = jax.nn.relu(dense_apply(lp, x))
    if cfg.encoder == "pointnet_avg":
        return jnp.mean(x, axis=1)
    return jnp.max(x, axis=1)


def _quat_limit(pose_raw, rot_lim_deg: float):
    """tanh-limited axis-angle parameterization (ipcr_model.py:285-294)."""
    t, ang, direc = pose_raw[..., :3], pose_raw[..., 3:4], pose_raw[..., 4:7]
    ang = jnp.tanh(ang) * (jnp.pi / 180.0 * rot_lim_deg)
    dn = jnp.linalg.norm(direc, axis=-1, keepdims=True) + 1e-6
    direc = direc / dn * jnp.sin(ang / 2.0)
    w = jnp.cos(ang / 2.0)
    t = jnp.tanh(t) * 0.1
    return jnp.concatenate([t, w, direc], axis=-1)


def template_feats_invariant(cfg: PCRNetConfig, state, train: bool) -> bool:
    """True when the template's encoder features cannot depend on the
    source half of the batch, i.e. when they are loop-invariant across
    refinement iterations and safe to hoist out of the scan/while_loop.

    Train mode is never invariant for the 3dmfv encoder: the reference
    encodes source+template as ONE batch through shared BN'd convs
    (ipcr_model.py:199-205), so training batch statistics couple the two
    clouds. Eval with running statistics (state carries mfv_bn) decouples
    them; eval with state=None falls back to batch statistics and stays
    coupled. The pointnet encoder encodes the clouds separately, so it is
    always invariant."""
    if cfg.encoder != "3dmfv":
        return True
    return (not train) and state is not None and state.get("mfv_bn") is not None


def encode_template(params, cfg: PCRNetConfig, template, *, state=None):
    """Encode the template once, for reuse across refinement iterations.

    Only valid under `template_feats_invariant` conditions (eval/serving);
    produces the same per-row features as the concat-batch path because
    running-stats BN and the conv stack are per-sample."""
    if cfg.encoder == "3dmfv":
        feats, _ = _encode_3dmfv(params, cfg, template, state=state,
                                 train=False)
        return feats
    return _encode(params, cfg, template)


def apply_pcrnet(params, cfg: PCRNetConfig, source, template, *,
                 train: bool = False, dropout_key: Optional[jax.Array] = None,
                 state=None, return_state: bool = False,
                 template_feats=None):
    """Predict a 7-dof pose (tx, ty, tz, qw, qx, qy, qz) for one iteration.

    state carries the 3dmfv-encoder BN running statistics (init_pcrnet's
    second return). train=True normalizes with batch statistics and EMA-
    updates the returned state (tf_util.batch_norm is_training=True,
    utils/tf_util.py:515-577); train=False uses the running statistics so
    eval output does not depend on batch composition. state=None falls
    back to batch statistics (pre-state checkpoints).

    template_feats: precomputed `encode_template` output — the template
    encoding is loop-invariant across refinement iterations in eval mode,
    so pcrnet_refine hoists it out of the scan (XLA does not move code
    across scan iterations); passing it halves the per-iteration encoder
    work. Only legal when `template_feats_invariant(cfg, state, train)`.
    """
    if template_feats is not None:
        if not template_feats_invariant(cfg, state, train):
            raise ValueError(
                "template_feats passed but the template encoding is not "
                "batch-independent here (3dmfv train mode, or eval without "
                "running BN statistics)")
        if cfg.encoder == "3dmfv":
            sf, new_state = _encode_3dmfv(params, cfg, source, state=state,
                                          train=False)
        else:
            sf, new_state = _encode(params, cfg, source), state
        tf_ = template_feats
    elif cfg.encoder == "3dmfv":
        # the reference encodes source+template as ONE batch through the
        # shared (BN'd) conv stack (ipcr_model.py:199-205), so BN batch
        # statistics span both clouds — concat before encoding.
        both = jnp.concatenate([source, template], axis=0)
        feats, new_state = _encode_3dmfv(params, cfg, both, state=state,
                                         train=train)
        sf, tf_ = jnp.split(feats, 2, axis=0)
    else:
        sf = _encode(params, cfg, source)
        tf_ = _encode(params, cfg, template)
        new_state = state
    x = jnp.concatenate([sf, tf_], axis=-1)
    for lp in params["head"]:
        x = jax.nn.relu(dense_apply(lp, x))
    if train and dropout_key is not None:
        x = dropout(dropout_key, x, cfg.dropout_keep, train=True)
    pose = dense_apply(params["out"], x)
    if cfg.lim_rot > 0:
        pose = _quat_limit(pose, cfg.lim_rot)
    if return_state:
        return pose, new_state
    return pose


def _encode_3dmfv(params, cfg: PCRNetConfig, points, *, state=None,
                  train: bool = False):
    """3DmFV + 6-block 3D inception encoder
    (ipcr_model.get_3dmfv_encoder:29-52): FV volume -> inception blocks
    (1x1, 3x3 and 5x5 off the 1x1, avg-pool+1x1; concat) with stride-2
    maxpools after blocks 2 and 4 -> flatten.

    The reference applies BN inside each conv (tf_util.conv3d bn=True).
    Returns (features, new_state); new_state carries EMA-updated running
    statistics when train=True, else the input state unchanged.
    """
    from dpdist_tpu.nn.layers import conv3d_apply

    B = points.shape[0]
    g = cfg.mfv_grid
    fv = threedmfv(points, g ** 3, cfg.sigma3dmfv)          # (B, V, 20)
    x = fv.reshape(B, g, g, g, -1)

    bn_in = state.get("mfv_bn") if state else None
    bn_out = [] if bn_in is not None else None

    def bn(h, i, name):
        if bn_in is None:
            m = jnp.mean(h, axis=(0, 1, 2, 3))
            v = jnp.var(h, axis=(0, 1, 2, 3))
        elif train:
            m = jnp.mean(h, axis=(0, 1, 2, 3))
            v = jnp.var(h, axis=(0, 1, 2, 3))
            old = bn_in[i][name]
            bn_out[i][name] = {
                "mean": BN_MOMENTUM * old["mean"] + (1 - BN_MOMENTUM) * m,
                "var": BN_MOMENTUM * old["var"] + (1 - BN_MOMENTUM) * v,
            }
        else:
            m, v = bn_in[i][name]["mean"], bn_in[i][name]["var"]
        return (h - m) * jax.lax.rsqrt(v + 1e-3)

    for i, blk in enumerate(params["mfv_blocks"]):
        if bn_out is not None:
            bn_out.append(dict(bn_in[i]))
        one = jax.nn.relu(bn(conv3d_apply(blk["one"], x), i, "one"))
        three = jax.nn.relu(bn(conv3d_apply(blk["three"], one), i, "three"))
        five = jax.nn.relu(bn(conv3d_apply(blk["five"], one), i, "five"))
        avg = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1), "SAME"
        ) / 27.0
        avgc = jax.nn.relu(bn(conv3d_apply(blk["avg"], avg), i, "avg"))
        x = jnp.concatenate([one, three, five, avgc], axis=-1)
        if i in (2, 4):
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
                "SAME",
            )
    new_state = state
    if bn_out is not None and train:
        new_state = dict(state)
        new_state["mfv_bn"] = bn_out
    return x.reshape(B, -1), new_state


def pcrnet_iteration(params, cfg: PCRNetConfig, src, template, *,
                     state=None, train: bool = False, template_feats=None):
    """One refinement iteration: predict a 7-dof pose from (src,
    template) and apply it to src. The single step shared by
    pcrnet_refine's scan and the serving export's early-exit while_loop
    (serving.export_registration) so the two cannot diverge.

    template_feats: see apply_pcrnet — hoisted loop-invariant template
    encoding (eval/serving only).

    Returns (pose (B,7), new_src (B,N,3), state)."""
    pose, st = apply_pcrnet(params, cfg, src, template, state=state,
                            train=train, return_state=True,
                            template_feats=template_feats)
    new_src = apply_quat(src, normalize_quat(pose[..., 3:7]), pose[..., :3])
    return pose, new_src, st


def pcrnet_refine(params, cfg: PCRNetConfig, source, template, *,
                  iterations: int, stop_gradient_iters: bool = True,
                  return_trajectory: bool = False,
                  state=None, train: bool = False,
                  return_state: bool = False):
    """On-device iterative refinement.

    Args:
      source, template: (B, N, 3).
      iterations: number of refinement steps (static).
      stop_gradient_iters: if True, gradients only flow through the final
        iteration — matching the reference's default training scheme,
        which runs MAX_LOOPS-1 inference-only iterations host-side and
        trains on the last one (iterative_PCRNet_ours.py:414-468). False
        backpropagates through the whole refinement (the reference's
        --train_single mode trains every iteration, :313-318).
      return_trajectory: also return the per-iteration transformed
        sources (iterations, B, N, 3) — used by train_single losses.
      state / train: BN running statistics for the 3dmfv encoder (see
        apply_pcrnet). train=True EMA-updates the state on every
        refinement iteration (the reference updates once, on the final
        train pass — a slightly faster effective decay, documented).
      return_state: append the updated state to the returned tuple.

    Returns:
      (transformed_source, T_total, poses[, trajectory][, state]) where
      T_total is (B, 4, 4) and poses (iterations, B, 7) the pose history.
    """
    B = source.shape[0]
    T0 = jnp.broadcast_to(jnp.eye(4, dtype=source.dtype), (B, 4, 4))
    carry_state = state is not None and train and cfg.encoder == "3dmfv"
    # Loop-invariant code motion XLA cannot do across scan iterations:
    # in eval mode the template's encoder features never change, so
    # encode once here instead of `iterations` times inside the scan —
    # the encoder dominates the iteration cost, so this roughly halves
    # eval/registration refinement time. Train mode keeps the reference's
    # coupled batch statistics (see template_feats_invariant).
    tfeats = (encode_template(params, cfg, template, state=state)
              if template_feats_invariant(cfg, state, train) else None)

    def step(carry, i):
        src, T, st = carry
        is_last = i == iterations - 1
        pose, new_src, st = pcrnet_iteration(params, cfg, src, template,
                                             state=st, train=train,
                                             template_feats=tfeats)
        T_new = compose_transforms(pose7_to_matrix(pose), T)
        if stop_gradient_iters:
            # detach all but the final iteration
            new_src = jnp.where(is_last, new_src,
                                jax.lax.stop_gradient(new_src))
            T_new = jnp.where(is_last, T_new, jax.lax.stop_gradient(T_new))
        if not carry_state:
            st = carry[2]
        out = (pose, new_src) if return_trajectory else pose
        return (new_src, T_new, st), out

    (src_out, T_out, state_out), ys = jax.lax.scan(
        step, (source, T0, state), jnp.arange(iterations)
    )
    ret = (src_out, T_out)
    if return_trajectory:
        poses, trajectory = ys
        ret += (poses, trajectory)
    else:
        ret += (ys,)
    if return_state:
        ret += (state_out,)
    return ret
