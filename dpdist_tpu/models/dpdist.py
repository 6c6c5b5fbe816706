"""DPDist: learned point-cloud-to-surface distance.

Reference assembly: models/dpdist_and_aue.py:31-86 (get_model) wiring
get_3dmfv_tf -> local_z -> DPDist (utils/dpdist_util.py:412-700).

Forward semantics (k > 0, conv_version 1, the canonical config):
  1. Encode each cloud into a (B, V, 20) Fisher-vector volume.
  2. Extract k^3 local patches per voxel -> (B, V, 2500) table.
  3. For each *query* point of the opposite cloud: find its voxel, fetch
     that voxel's patch, concat [delta_xyz, patch] -> (B, N, 2503).
  4. Both directions stacked into one 2B batch through the implicit MLP
     (1024, 1024, 1024) -> output channels; relu6(x)/3 output in [0, 2];
     outside-grid query points zeroed by the membership mask.

Direction naming matches the reference: pred_AB scores the points of B
against the surface encoded from A (dpdist_util.py:494-496), and is the
prediction trained against the GT distance labels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.nn.layers import (
    dense_init,
    dense_apply,
    mlp_init,
    mlp_apply,
    batchnorm_init,
    batchnorm_apply,
    conv3d_init,
    conv3d_apply,
)
from dpdist_tpu.ops.threedmfv import threedmfv
from dpdist_tpu.ops.voxel import voxel_assign, extract_patches, gather_patches


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_dpdist(key, cfg: DPDistConfig):
    """Create (params, state) for the DPDist model."""
    keys = jax.random.split(key, 4)
    params, state = {}, {}

    if cfg.encoder == "pointnet":
        pkeys = jax.random.split(keys[0], 4)
        widths = [128, 128, 512, cfg.pointnet_embedding]
        layers = []
        bns_p, bns_s = [], []
        d = cfg.dims
        for i, (k, w) in enumerate(zip(pkeys, widths)):
            # First layer was a [1, D] conv over 1 channel in the reference
            # (pointnet_basic_model, dpdist_util.py:715-736).
            fan = (d, d * w) if i == 0 else None
            layers.append(dense_init(k, d, w, conv_fan=fan))
            if cfg.use_bn and i > 0:  # reference: bn=False on conv1
                bp, bs = batchnorm_init(w)
                bns_p.append(bp)
                bns_s.append(bs)
            d = w
        params["pointnet"] = {"layers": layers}
        state["pointnet"] = {}
        if cfg.use_bn:
            params["pointnet"]["bn"] = bns_p
            state["pointnet"]["bn"] = bns_s

    if cfg.conv_version == 3 and cfg.k > 0:
        # 3D-CNN decoder over the k^3 patch then FC with the coords
        # (dpdist_util.py:640-687: conv3d 64 -> resnet3d x2 -> conv3d 16
        # -> concat delta -> conv mlp[2] -> output). The reference slices
        # the concatenated input as [:E]/[E:], which with its [pc, emb]
        # concat order actually mixes coords into the "embedding" slice —
        # we implement the evident intent (emb -> CNN, coords -> FC).
        C = cfg.fv_channels
        ck = jax.random.split(keys[1], 8)
        dec = {
            "conv0": conv3d_init(ck[0], C, 64, (1, 1, 1)),
            "res1a": conv3d_init(ck[1], 64, 64, (3, 3, 3)),
            "res1b": conv3d_init(ck[2], 64, 64, (3, 3, 3)),
            "res2a": conv3d_init(ck[3], 64, 64, (3, 3, 3)),
            "res2b": conv3d_init(ck[4], 64, 64, (3, 3, 3)),
            "conv3": conv3d_init(ck[5], 64, 16, (1, 1, 1)),
            "fc": dense_init(ck[6], 16 * cfg.k ** 3 + cfg.dims, cfg.mlp[2]),
            "out": dense_init(ck[7], cfg.mlp[2], cfg.output_channels),
        }
        if cfg.output_act == "relu":
            # same dead-zone mitigation as the MLP decoder (see below)
            dec["out"]["b"] = dec["out"]["b"] + 0.45
        params["decoder"] = dec
        state["decoder"] = {}
        return params, state

    in_dim = cfg.patch_dim + cfg.dims
    widths = tuple(cfg.mlp) + (cfg.output_channels,)
    if cfg.k > 0:
        # Reference first layer: conv kernel [1, E+D] over 1 channel.
        conv_fan_first = (in_dim, in_dim * widths[0])
    else:
        conv_fan_first = (in_dim, widths[0])
    dec_p, dec_s = mlp_init(
        keys[1], in_dim, widths, conv_fan_first=conv_fan_first, use_bn=cfg.use_bn
    )
    if cfg.output_act == "relu":
        # relu6(x)/3 head with zero bias starts at the boundary of its dead
        # zone; the L1 loss's zero-label surface points then push the whole
        # head below zero where gradients vanish — a data-dependent trap
        # (observed: multi-category training froze at loss = mean|label|
        # while chair escaped by luck; the reference's lr-sensitivity note
        # at train_multi_gpu_pc_compare_dist.py:52 is the same hazard).
        # Start mid-range: pre-act +0.45 -> initial prediction 0.15.
        dec_p["layers"][-1]["b"] = dec_p["layers"][-1]["b"] + 0.45
    params["decoder"] = dec_p
    state["decoder"] = dec_s
    return params, state


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _pointnet_encode(params, state, cfg: DPDistConfig, points, *, train, bn_momentum):
    x = points
    layers = params["layers"]
    use_bn = "bn" in params
    new_bn = []
    bn_i = 0
    for i, lp in enumerate(layers):
        x = dense_apply(lp, x)
        if use_bn and i > 0:
            x, s = batchnorm_apply(params["bn"][bn_i], state["bn"][bn_i], x,
                                   train=train, momentum=bn_momentum)
            new_bn.append(s)
            bn_i += 1
        x = jax.nn.relu(x)
    emb = jnp.max(x, axis=1)  # (B, E) global max pool
    new_state = {"bn": new_bn} if use_bn else {}
    return emb, new_state


def dpdist_embed(params, state, cfg: DPDistConfig, points, *, train: bool = False,
                 bn_momentum=0.9):
    """Encode a cloud into its queryable representation.

    Returns (table, new_state):
      k > 0: table is the (B, V, k^3*C) local-patch table;
      k == 0: table is the (B, E) global embedding.

    With cfg.dtype != float32 the patch table is emitted in cfg.dtype:
    the FV cast fuses into the patch-extraction copy so the (B, V, k^3*C)
    table — the forward's largest tensor, ~1.3 GB at B=256 in f32 — is
    written and re-read at half the bytes, and the one-hot gather matmul
    runs on the MXU in cfg.dtype. The 3DmFV math itself stays exact f32
    (bf16 responsibility logits are too coarse; see ops/threedmfv.py).
    """
    if cfg.encoder == "pointnet":
        emb, ns = _pointnet_encode(params["pointnet"], state.get("pointnet", {}),
                                   cfg, points, train=train, bn_momentum=bn_momentum)
        return emb, {"pointnet": ns}
    fv = threedmfv(points, cfg.embedding_size, cfg.sigma,
                   flatten=(cfg.k == 0), full_fv=cfg.full_fv)
    dtype = jnp.dtype(cfg.dtype)
    if dtype != jnp.float32:
        fv = fv.astype(dtype)
    if cfg.k == 0:
        return fv, {}
    if cfg.dims == 2:
        from dpdist_tpu.ops.voxel import extract_patches_2d

        return extract_patches_2d(fv, cfg.grid_size, cfg.k), {}
    table = extract_patches(fv, cfg.grid_size, cfg.k)
    return table, {}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _output_activation(x, output_act: str):
    if output_act == "tanh":
        return jnp.tanh(x)
    if output_act == "relu":
        # relu6(x)/3 -> range [0, 2] (dpdist_util.py:690-691)
        return jnp.clip(x, 0.0, 6.0) / 3.0
    # (-1, 1) centered variant (dpdist_util.py:693)
    return jnp.clip(x + 3.0, 0.0, 6.0) / 3.0 - 1.0


def _conv3d_decode(dec, cfg: DPDistConfig, x):
    """conv_version=3 decoder (see init_dpdist; dpdist_util.py:640-687)."""
    TB, N, _ = x.shape
    k, C = cfg.k, cfg.fv_channels
    delta = x[..., : cfg.dims]
    emb = x[..., cfg.dims:]
    vol = emb.reshape(TB * N, k, k, k, C)
    h = jax.nn.relu(conv3d_apply(dec["conv0"], vol))
    r = jax.nn.relu(conv3d_apply(dec["res1a"], h))
    h = h + jax.nn.relu(conv3d_apply(dec["res1b"], r))
    r = jax.nn.relu(conv3d_apply(dec["res2a"], h))
    h = h + jax.nn.relu(conv3d_apply(dec["res2b"], r))
    h = jax.nn.relu(conv3d_apply(dec["conv3"], h))
    flat = h.reshape(TB, N, -1)
    feat = jnp.concatenate([flat, delta], axis=-1)
    feat = jax.nn.relu(dense_apply(dec["fc"], feat))
    return dense_apply(dec["out"], feat)


def _decoder_inputs(cfg: DPDistConfig, queries, table):
    """Build (B, N, in_dim) decoder inputs + (B, N) mask for one direction.

    The assembled input follows the table's dtype (bf16 tables produce
    bf16 decoder inputs; coordinates/membership are computed in f32 and
    the delta cast down at the concat)."""
    if cfg.k > 0:
        vox, mask, delta = voxel_assign(queries, cfg.grid_size)
        emb = gather_patches(table, vox, mask)
        x = jnp.concatenate([delta.astype(table.dtype), emb], axis=-1)
        return x, mask
    B, N, _ = queries.shape
    emb = jnp.broadcast_to(table[:, None, :], (B, N, table.shape[-1]))
    x = jnp.concatenate([queries.astype(table.dtype), emb], axis=-1)
    return x, jnp.ones((B, N), queries.dtype)


def _decoder_inputs_fused(cfg: DPDistConfig, queries, fv):
    """Fused-gather variant: consumes the raw (B, V, C) FV volume and
    assembles each query's patch in VMEM (kernels/gather_pallas.py),
    skipping the (B, V, k^3*C) patch table entirely."""
    from dpdist_tpu.kernels.gather_pallas import gather_patches_fused

    vox, mask, delta = voxel_assign(queries, cfg.grid_size)
    emb = gather_patches_fused(fv, vox, mask, grid_size=cfg.grid_size,
                               k=cfg.k)
    x = jnp.concatenate([delta, emb], axis=-1)
    return x, mask


def _decoder_inputs_table_vmem(cfg: DPDistConfig, queries, fv):
    """VMEM-table variant (kernels/table_gather_pallas.py): the k^3 patch
    table is built in VMEM per cloud and the one-hot gather runs there —
    the (B, V, k^3*C) table never touches HBM. Round 3: the fused
    table_gather_x kernel also computes the voxel assignment + delta and
    emits x = [delta, patch] directly, so the decoder input never exists
    as an XLA concat copy; voxel_assign here only feeds the mask (its
    other outputs dead-code-eliminate).

    Size dispatch: beyond one query tile (N > 128) the x-kernel must
    tile its query axis to fit the 16 MB scoped-VMEM budget, and the
    tiled variant measured ~8% slower at np=256 than the UNTILED plain
    table kernel + XLA concat (which fits because it carries no
    query/delta blocks) — so large N takes the two-step path."""
    from dpdist_tpu.kernels.table_gather_pallas import table_gather, table_gather_x

    if queries.shape[1] <= 128:
        _, mask, _ = voxel_assign(queries, cfg.grid_size)
        x = table_gather_x(fv, queries, cfg.grid_size, cfg.k)
        return x, mask
    vox, mask, delta = voxel_assign(queries, cfg.grid_size)
    emb = table_gather(fv, vox, cfg.grid_size, cfg.k)
    x = jnp.concatenate([delta.astype(fv.dtype), emb], axis=-1)
    return x, mask


def _decoder_inputs_mfv(cfg: DPDistConfig, points_enc, queries):
    """Round-5 fully-fused front half (kernels/mfv_gather_pallas.py):
    3DmFV encode + patch table + voxel assign + gather + concat in one
    VMEM kernel per direction — the raw FV volume and every encode
    intermediate never touch HBM. Valid at N <= 128 (one query tile)."""
    from dpdist_tpu.kernels.mfv_gather_pallas import mfv_table_gather_x

    _, mask, _ = voxel_assign(queries, cfg.grid_size)
    x = mfv_table_gather_x(points_enc, queries, cfg.embedding_size,
                           cfg.sigma, cfg.grid_size, cfg.k,
                           dtype=jnp.dtype(cfg.dtype))
    return x, mask


def _fused_gather_mode(cfg: DPDistConfig) -> str:
    """Resolve cfg.fused_gather to 'off' | 'on' (per-query VMEM gather) |
    'table' (VMEM patch table) | 'mfv' (encode + table in one kernel) |
    'full' (table + whole decoder in VMEM)."""
    if cfg.k <= 0 or cfg.dims != 3 or cfg.encoder != "3dmfv":
        return "off"
    if cfg.fused_gather == "mfv":
        # Requires the canonical full-FV normalized encode whose math the
        # kernel implements; anything else takes the table path.
        return "mfv" if cfg.full_fv else "table"
    if cfg.fused_gather == "full":
        # Serving path: eval-only (no VJP), bf16, canonical decoder.
        ok = (cfg.conv_version == 1 and not cfg.use_bn
              and jnp.dtype(cfg.dtype) == jnp.bfloat16)
        return "full" if ok else "table"
    if cfg.fused_gather in ("on", "table"):
        return cfg.fused_gather
    # auto, measured on v5e (B=256, N=64, C=20, canonical config):
    #   * per-query fused kernel ('on'): lane-starved C=20 matmul loses to
    #     the XLA table path (14.3 vs 12.6 ms full forward);
    #   * VMEM-table kernel ('table'): keeps full k^3*C-wide lanes and
    #     removes the table's HBM round trip — 12.7 -> 10.4 ms with EXACT
    #     (bit-equal) outputs;
    #   * round 5, points-level fused kernel ('mfv',
    #     kernels/mfv_gather_pallas.py): also folds the 3DmFV encode,
    #     voxel assign, and concat into the same program — BIDIRECTIONAL
    #     forward 1.5-1.6x over 'table' (6.0 vs 9.7 ms f32 full fwd,
    #     idle-chip; parity <= 7.6e-6 on chip). auto picks it for full-FV
    #     configs; queries beyond one tile (N > 128) fall back to 'table'
    #     at apply time. The XLA path remains the CPU/test path (the
    #     kernels fall back to interpret mode off-TPU, which is slower
    #     than XLA for real workloads).
    #   * GRADIENT contexts are the opposite (idle-chip interleaved A/B,
    #     results/idle_r5/ab_grad_paths.jsonl): 'table' wins the
    #     param-grad train step 1.29x (33.3k vs 25.8k pairs/s f32) and the
    #     frozen src-grad 1.37x (11.1k vs 8.1k). Two mechanisms: (a) the
    #     2B fused kernel is opaque to XLA, so a loss that consumes one
    #     direction (the trainer's l1 on pred_AB) still pays for both,
    #     while the XLA/table path dead-code-eliminates the unused
    #     direction; (b) the mfv custom VJP must replay the 3DmFV encode
    #     forward inside the backward (the fused kernel never materializes
    #     the FV volume to save as a residual). Call sites that build
    #     differentiated computations resolve 'auto' with
    #     resolve_for_grad() below.
    from dpdist_tpu.ops.threedmfv import _on_tpu

    if not _on_tpu():
        return "off"
    return "mfv" if cfg.full_fv else "table"


def resolve_for_grad(cfg: DPDistConfig) -> DPDistConfig:
    """Resolve fused_gather='auto' for a computation that will be
    differentiated (training losses, frozen-loss composition).

    Idle-chip A/B (results/idle_r5/ab_grad_paths.jsonl): the 'table'
    dispatch beats the 'mfv' fused kernel on every gradient path — train
    param-grad step 33.3k vs 25.8k pairs/s (f32), frozen src-grad 11.1k
    vs 8.1k — while 'mfv' wins the pure bidirectional forward 1.5x. See
    the mechanism notes in _fused_gather_mode. Explicit (non-'auto')
    settings are respected unchanged; off-TPU the 'auto' path already
    resolves to the XLA implementation, which is also the right grad
    path there.
    """
    if cfg.fused_gather != "auto":
        return cfg
    from dpdist_tpu.ops.threedmfv import _on_tpu

    if not _on_tpu():
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, fused_gather="table")


def apply_dpdist(params, state, cfg: DPDistConfig, pcA, pcB, *,
                 noise: Optional[jax.Array] = None, train: bool = False,
                 bn_momentum=0.9):
    """Full bidirectional forward pass.

    Args:
      pcA, pcB: (B, N, D) point clouds. Noise (if given) is added to pcA
        only for the *encoder* input, exactly like the reference
        (dpdist_and_aue.py:45: pcA_noise feeds the encoder; DPDist still
        receives the raw clouds as queries).

    Returns:
      (pred_AB, pred_BA, new_state) with preds (B, N, output_channels):
      pred_AB = distances of B's points to surface(A), mask-zeroed.
    """
    pcA_enc = pcA if noise is None else pcA + noise
    fused_mode = _fused_gather_mode(cfg)
    if fused_mode == "full" and not train:
        # Serving fast path: table + gather + decoder in one kernel per
        # direction; non-differentiable by design (see
        # kernels/fused_forward_pallas.py).
        from dpdist_tpu.kernels.fused_forward_pallas import fused_forward
        from dpdist_tpu.ops.threedmfv import _on_tpu

        dtype = jnp.dtype(cfg.dtype)
        fvA = threedmfv(pcA_enc, cfg.embedding_size, cfg.sigma,
                        full_fv=cfg.full_fv).astype(dtype)
        fvB = threedmfv(pcB, cfg.embedding_size, cfg.sigma,
                        full_fv=cfg.full_fv).astype(dtype)
        voxB, maskAB, deltaB = voxel_assign(pcB, cfg.grid_size)
        voxA, maskBA, deltaA = voxel_assign(pcA, cfg.grid_size)
        fv2 = jnp.concatenate([fvA, fvB], 0)
        vox2 = jnp.concatenate([voxB, voxA], 0)
        delta2 = jnp.concatenate([deltaB, deltaA], 0)
        y = fused_forward(fv2, vox2, delta2, params["decoder"]["layers"],
                          cfg.grid_size, cfg.k, interpret=not _on_tpu())
        y = _output_activation(y, cfg.output_act)
        pred_AB, pred_BA = jnp.split(y, 2, axis=0)
        pred_AB = pred_AB * maskAB[..., None]
        pred_BA = pred_BA * maskBA[..., None]
        return pred_AB, pred_BA, {"decoder": {}}
    x2 = None
    if fused_mode == "mfv" and pcA.shape[1] <= 128 and pcB.shape[1] <= 128:
        # Points -> decoder input directly; no XLA encode stage at all.
        nsB = {}
        if pcA.shape == pcB.shape:
            # Both directions in ONE kernel call (2B grid): encode
            # [A; B], query [B; A]. Halves the dispatch count and the
            # emitted (2B, N, 3+E) batch feeds the decoder in one call —
            # no concat copy ever exists (the BN-on 2B semantics and the
            # BN-off math coincide; each decoder row is independent).
            from dpdist_tpu.kernels.mfv_gather_pallas import mfv_table_gather_x

            pts2 = jnp.concatenate([pcA_enc, pcB], axis=0)
            q2 = jnp.concatenate([pcB, pcA], axis=0)
            x2 = mfv_table_gather_x(pts2, q2, cfg.embedding_size, cfg.sigma,
                                    cfg.grid_size, cfg.k,
                                    dtype=jnp.dtype(cfg.dtype))
            _, maskAB, _ = voxel_assign(pcB, cfg.grid_size)
            _, maskBA, _ = voxel_assign(pcA, cfg.grid_size)
        else:
            xAB, maskAB = _decoder_inputs_mfv(cfg, pcA_enc, pcB)
            xBA, maskBA = _decoder_inputs_mfv(cfg, pcB, pcA)
    elif fused_mode != "off":
        # Raw FV volumes only; the patch assembles in VMEM.
        dtype = jnp.dtype(cfg.dtype)
        fvA = threedmfv(pcA_enc, cfg.embedding_size, cfg.sigma,
                        full_fv=cfg.full_fv).astype(dtype)
        fvB = threedmfv(pcB, cfg.embedding_size, cfg.sigma,
                        full_fv=cfg.full_fv).astype(dtype)
        nsB = {}
        # 'full' in a train/grad pass degrades to the table kernel (the
        # differentiable VMEM path), NOT the per-query 'on' kernel; 'mfv'
        # above a single query tile likewise.
        inputs_fn = (_decoder_inputs_fused if fused_mode == "on"
                     else _decoder_inputs_table_vmem)
        xAB, maskAB = inputs_fn(cfg, pcB, fvA)
        xBA, maskBA = inputs_fn(cfg, pcA, fvB)
    else:
        tableA, nsA = dpdist_embed(params, state, cfg, pcA_enc, train=train,
                                   bn_momentum=bn_momentum)
        tableB, nsB = dpdist_embed(params, state, cfg, pcB, train=train,
                                   bn_momentum=bn_momentum)
        # NOTE: the reference shares encoder BN state across the two calls
        # via variable reuse; with BN off (canonical config) the calls are
        # pure. We keep the second call's state (TF last-update-wins EMA).

        xAB, maskAB = _decoder_inputs(cfg, pcB, tableA)  # B's pts vs surf(A)
        xBA, maskBA = _decoder_inputs(cfg, pcA, tableB)  # A's pts vs surf(B)

    dtype = jnp.dtype(cfg.dtype)
    dec_params = params["decoder"]
    if dtype != jnp.float32:
        # True low-precision decoder: cast inputs AND params so the
        # matmuls run natively in cfg.dtype (casting only x would promote
        # straight back to fp32).
        dec_params = jax.tree_util.tree_map(lambda w: w.astype(dtype),
                                            dec_params)

    def _decode(xx):
        if dtype != jnp.float32:
            xx = xx.astype(dtype)
        if cfg.conv_version == 3 and cfg.k > 0:
            return _conv3d_decode(dec_params, cfg, xx), {}
        return mlp_apply(dec_params, state.get("decoder", {}), xx,
                         train=train, bn_momentum=bn_momentum)

    if x2 is not None:
        # mfv 2B path: the kernel already emitted both directions as one
        # batch; decode once and split the predictions.
        y, dec_state = _decode(x2)
        yAB, yBA = jnp.split(y, 2, axis=0)
    elif cfg.use_bn:
        # One 2B batch through the decoder — preserves BN-on batch
        # statistics semantics of the reference's tf.concat([net, netB],
        # 0) (dpdist_util.py:511).
        y, dec_state = _decode(jnp.concatenate([xAB, xBA], axis=0))
        yAB, yBA = jnp.split(y, 2, axis=0)
    else:
        # BN off (the canonical config): each decoder row is independent,
        # so the directions decode separately — the (2B, N, 3+E) concat
        # copy disappears and XLA can overlap direction AB's decode with
        # direction BA's gather.
        yAB, dec_state = _decode(xAB)
        yBA, _ = _decode(xBA)
    pred_AB = _output_activation(yAB.astype(jnp.float32), cfg.output_act)
    pred_BA = _output_activation(yBA.astype(jnp.float32), cfg.output_act)
    if cfg.k > 0:
        pred_AB = pred_AB * maskAB[..., None]
        pred_BA = pred_BA * maskBA[..., None]

    new_state = dict(nsB) if cfg.encoder == "pointnet" else {}
    new_state["decoder"] = dec_state
    return pred_AB, pred_BA, new_state


def dpdist_distance(params, state, cfg: DPDistConfig, pcA, pcB, *,
                    per_example: bool = False):
    """The scalar learned distance used as a downstream loss.

    loss_pred = (mean(pred_AB[..., 0]) + mean(pred_BA[..., 0])) / 2
    (dpdist_util.get_loss:976-979). Differentiable w.r.t. pcA/pcB; freeze
    params with jax.lax.stop_gradient at the call site (see
    losses/dpdist_loss.py) for frozen-loss composition.
    """
    pred_AB, pred_BA, _ = apply_dpdist(params, state, cfg, pcA, pcB, train=False)
    if per_example:
        return (jnp.mean(pred_AB[..., 0], axis=-1) + jnp.mean(pred_BA[..., 0], axis=-1)) / 2.0
    return (jnp.mean(pred_AB[..., 0]) + jnp.mean(pred_BA[..., 0])) / 2.0
