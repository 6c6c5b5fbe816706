"""Serving export (dpdist_tpu/serving.py): the jax.export freeze that
replaces the reference's meta-graph handoff
(iterative_PCRNet_ours.py:229-231)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dpdist_tpu import serving
from dpdist_tpu.configs import DPDistConfig
from dpdist_tpu.losses.dpdist_loss import make_frozen_dpdist_loss
from dpdist_tpu.models import init_dpdist, dpdist_distance

CFG = DPDistConfig(num_point=16, embedding_size=64, k=3, mlp=(32, 32, 32))


def _setup():
    params, state = init_dpdist(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.8, 0.8, (2, 16, 3)).astype(np.float32))
    return params, state, a, b


def test_export_roundtrip_matches_direct_call(tmp_path):
    params, state, a, b = _setup()
    exp = serving.export_frozen_distance(params, state, CFG, batch=2)
    want = dpdist_distance(params, state, CFG, a, b, per_example=True)
    np.testing.assert_allclose(np.asarray(exp.call(a, b)),
                               np.asarray(want), rtol=1e-6, atol=1e-8)
    # serialize -> deserialize -> identical results, no package needed
    path = str(tmp_path / "model.dpdist")
    serving.save_exported(exp, path)
    reloaded = serving.load_exported(path)
    np.testing.assert_allclose(np.asarray(reloaded.call(a, b)),
                               np.asarray(want), rtol=1e-6, atol=1e-8)
    assert os.path.getsize(path) > 0


def test_export_symbolic_batch_serves_any_size():
    params, state, a, b = _setup()
    exp = serving.export_frozen_distance(params, state, CFG)  # batch=None
    assert "b" in str(exp.in_avals[0].shape[0])
    for B in (1, 3, 5):
        out = exp.call(jnp.tile(a[:1], (B, 1, 1)), jnp.tile(b[:1], (B, 1, 1)))
        assert out.shape == (B,)
        # every row is the same pair => identical scores
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(out)[0] * np.ones(B),
                                   rtol=1e-6)


def test_export_with_grad_matches_frozen_loss(tmp_path):
    params, state, a, b = _setup()
    exp = serving.export_frozen_distance(params, state, CFG, batch=2,
                                         with_grad=True)
    vals, grads = exp.call(a, b)
    assert vals.shape == (2,) and grads.shape == (2, 16, 3)

    loss_fn = make_frozen_dpdist_loss(params, state, CFG)
    for i in range(2):
        want_v = loss_fn(a[i:i + 1], b[i:i + 1])
        want_g = jax.grad(lambda x: loss_fn(x, b[i:i + 1]))(a[i:i + 1])
        np.testing.assert_allclose(np.asarray(vals[i]), np.asarray(want_v),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(grads[i]),
                                   np.asarray(want_g[0]),
                                   rtol=1e-5, atol=1e-7)


def test_export_cli(tmp_path):
    from dpdist_tpu.train.checkpoint import save_checkpoint
    from dpdist_tpu.cli.export_serving import main

    params, state, a, b = _setup()
    ck = str(tmp_path / "ckpt_1")
    save_checkpoint(ck, {"params": params, "state": state},
                    metadata={"model_config": CFG.to_json()})
    out = str(tmp_path / "model.dpdist")
    main(["--dpdist_ckpt", ck, "--out", out, "--batch", "2"])
    reloaded = serving.load_exported(out)
    want = dpdist_distance(params, state, CFG, a, b, per_example=True)
    np.testing.assert_allclose(np.asarray(reloaded.call(a, b)),
                               np.asarray(want), rtol=1e-6, atol=1e-8)


def test_export_registration_policy(tmp_path):
    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.geometry.se3 import invert_transform
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.models.pcrnet import pcrnet_refine
    from dpdist_tpu.train.checkpoint import save_checkpoint
    from dpdist_tpu.cli.export_serving import main

    pcfg = PCRNetConfig(num_point=32, out_features=64, max_loops=2,
                        eval_iterations=3, head_widths=(64, 32))
    params, state = init_pcrnet(jax.random.PRNGKey(1), pcfg)
    rng = np.random.default_rng(3)
    tpl = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32))

    exp = serving.export_registration(params, pcfg, batch=2)
    T_pred, aligned = exp.call(tpl, src)
    assert T_pred.shape == (2, 4, 4) and aligned.shape == (2, 32, 3)
    want_aligned, T_total, _ = pcrnet_refine(
        params, pcfg, src, tpl, iterations=pcfg.eval_iterations,
        stop_gradient_iters=False)
    np.testing.assert_allclose(np.asarray(T_pred),
                               np.asarray(invert_transform(T_total)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(want_aligned),
                               rtol=1e-5, atol=1e-6)

    # CLI path round-trips through a real checkpoint file
    ck = str(tmp_path / "pcrnet_ckpt_best")
    save_checkpoint(ck, {"params": params, "state": state},
                    metadata={"pcrnet_config": pcfg.to_json()})
    out = str(tmp_path / "policy.dpdist")
    main(["--pcrnet_ckpt", ck, "--out", out, "--batch", "2",
          "--iterations", "3"])
    T2, al2 = serving.load_exported(out).call(tpl, src)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(T_pred),
                               rtol=1e-5, atol=1e-6)


def test_export_registration_stop_protocol(tmp_path):
    """A stop-aware export must match the evaluator's frozen transforms:
    threshold 0 never fires (== fixed-iteration policy); an infinite
    threshold with chamfer selection on a self-aligned pair freezes the
    identity, so T_pred == I and aligned == source."""
    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.models import init_pcrnet

    pcfg = PCRNetConfig(num_point=32, out_features=64, max_loops=2,
                        eval_iterations=3, head_widths=(64, 32))
    params, _ = init_pcrnet(jax.random.PRNGKey(1), pcfg)
    rng = np.random.default_rng(3)
    tpl = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 32, 3)).astype(np.float32))

    base = serving.export_registration(params, pcfg, batch=2)
    never = serving.export_registration(params, pcfg, batch=2,
                                        stop_threshold=0.0)
    Tb, ab = base.call(tpl, src)
    Tn, an = never.call(tpl, src)
    np.testing.assert_allclose(np.asarray(Tn), np.asarray(Tb),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(an), np.asarray(ab),
                               rtol=1e-5, atol=1e-6)

    cyc = serving.export_registration(params, pcfg, batch=2,
                                      stop_threshold=float("inf"),
                                      stop_period=1, stop_select="chamfer")
    Tc, ac = cyc.call(tpl, tpl)  # source == template: identity is optimal
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4))
    np.testing.assert_allclose(np.asarray(Tc), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ac), np.asarray(tpl), atol=1e-5)

    # early-exit while_loop variant must be output-identical to the
    # masked fixed-length scan, whether the batch freezes immediately
    # (inf), never (0 -> runs all iterations), or mid-way (chamfer)
    for kw in ({"stop_threshold": float("inf")},
               {"stop_threshold": 0.0},
               {"stop_threshold": float("inf"), "stop_period": 2,
                "stop_select": "chamfer"}):
        masked = serving.export_registration(params, pcfg, batch=2, **kw)
        ee = serving.export_registration(params, pcfg, batch=2,
                                         early_exit=True, **kw)
        Tm, am = masked.call(tpl, src)
        Te, ae = ee.call(tpl, src)
        np.testing.assert_allclose(np.asarray(Te), np.asarray(Tm),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ae), np.asarray(am),
                                   rtol=1e-5, atol=1e-6)


def test_export_canonical_config_traces():
    """The portable export must trace + serialize at the CANONICAL config
    (512 Gaussians, k=5, MLP 1024^3) — tracing only, nothing executed, so
    this is cheap even on CPU. Guards against the export path silently
    depending on toy shapes."""
    cfg = DPDistConfig()  # canonical
    params, state = init_dpdist(jax.random.PRNGKey(0), cfg)
    exp = serving.export_frozen_distance(params, state, cfg)  # symbolic B
    assert exp.in_avals[0].shape[1:] == (64, 3)
    data = exp.serialize()
    assert len(data) > 1_000_000  # the 1024^3 MLP weights are baked in


def test_run_serving_cli_registration(tmp_path, capsys):
    """run_serving: the import/run side of the handoff — loads a saved
    registration artifact, feeds .ply clouds (with static-batch padding
    and point resampling), and writes the aligned cloud + JSON report."""
    import json

    from dpdist_tpu.configs import PCRNetConfig
    from dpdist_tpu.data.io import write_ply
    from dpdist_tpu.models import init_pcrnet
    from dpdist_tpu.cli.run_serving import main as run_main

    pcfg = PCRNetConfig(num_point=32, out_features=64, max_loops=2,
                        eval_iterations=3, head_widths=(64, 32))
    params, _ = init_pcrnet(jax.random.PRNGKey(1), pcfg)
    exp = serving.export_registration(params, pcfg, batch=2)
    art = str(tmp_path / "policy.pcrnet")
    serving.save_exported(exp, art)

    # one 48-point pair on disk -> resampled to 32, padded to batch 2,
    # outputs sliced back to batch 1
    rng = np.random.default_rng(5)
    tpl_p = str(tmp_path / "t.ply")
    src_p = str(tmp_path / "s.ply")
    write_ply(tpl_p, rng.uniform(-0.5, 0.5, (48, 3)).astype(np.float32))
    write_ply(src_p, rng.uniform(-0.5, 0.5, (48, 3)).astype(np.float32))
    out_json = str(tmp_path / "res.json")
    out_ply = str(tmp_path / "aligned.ply")
    run_main(["--artifact", art, "--template", tpl_p, "--source", src_p,
              "--resample", "--out_json", out_json,
              "--out_aligned", out_ply])
    res = json.load(open(out_json))
    assert res["batch"] == 1 and res["num_point"] == 32
    assert np.asarray(res["T_pred"]).shape == (1, 4, 4)
    assert np.asarray(res["euler_deg"]).shape == (1, 3)
    from dpdist_tpu.data.io import read_ply

    assert read_ply(out_ply).shape == (32, 3)
    brief = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "T_pred" not in brief and brief["num_point"] == 32

    # synthetic smoke + bench timing field
    run_main(["--artifact", art, "--synthetic", "chair", "--bench", "2"])
    brief = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert brief["batch"] == 2 and "bench_ms_per_call" in brief


def test_run_serving_cli_distance_with_grad(tmp_path, capsys):
    import json

    from dpdist_tpu.cli.run_serving import main as run_main

    params, state, a, b = _setup()
    exp = serving.export_frozen_distance(params, state, CFG, batch=2,
                                         with_grad=True)
    art = str(tmp_path / "model.dpdist")
    serving.save_exported(exp, art)
    np.save(str(tmp_path / "t.npy"), np.asarray(a))
    np.save(str(tmp_path / "s.npy"), np.asarray(b))
    run_main(["--artifact", art, "--template", str(tmp_path / "t.npy"),
              "--source", str(tmp_path / "s.npy")])
    brief = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(brief["distance"]) == 2
    assert len(brief["grad_norm_per_pair"]) == 2
    want = np.asarray(exp.call(a, b)[0])
    np.testing.assert_allclose(brief["distance"], want, rtol=1e-5)
