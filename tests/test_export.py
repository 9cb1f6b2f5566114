"""jax.export deployment artifacts (eval/export.py): roundtrip equality,
symbolic-batch polymorphism, CLI --export flag, error paths."""

import numpy as np
import pytest
import yaml

import jax


def _tiny_flagship():
    from jspsr_tpu.models.jspsr import JSPSR

    model = JSPSR({"lr_dem": 1, "image": 3}, num_feature=8,
                  layers=(1, 1, 1, 1), spn=True)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    return model, params, bn_state


def _inputs(batch, size=32, seed=0):
    rng = np.random.default_rng(seed)
    dem = rng.uniform(0.3, 0.7, (batch, size, size, 1)).astype(np.float32)
    img = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    return [dem, img]


def test_export_roundtrip_and_symbolic_batch(tmp_path):
    """serialize -> deserialize -> run equals the direct forward, at the
    export example's batch AND a different batch size (the batch dim is
    exported symbolically, so one artifact serves any batch)."""
    from jspsr_tpu.eval.export import (export_inference, load_exported,
                                       save_exported)
    from jspsr_tpu.ops.deform_conv import force_deform_impl

    model, params, bn_state = _tiny_flagship()
    blob = export_inference(model, params, bn_state, _inputs(1))
    assert isinstance(blob, bytes) and len(blob) > 1000

    path = tmp_path / "flagship"
    out = save_exported(path, model, params, bn_state, _inputs(1))
    # (serialization is not byte-deterministic across export() calls, so
    # compare sizes, not bytes)
    assert out.suffix == ".stablehlo" and out.stat().st_size > 1000

    fn = load_exported(out)
    for batch in (1, 3):  # 3 != export example's batch: symbolic dim
        xs = _inputs(batch, seed=batch)
        got = np.asarray(fn(*xs))
        # reference run with the SAME deform impl the artifact pinned
        # ('mxu'); the auto CPU choice ('gather') agrees to float tolerance
        with force_deform_impl("mxu"):
            want, _ = model(params, bn_state, xs, train=False)
        assert got.shape == (batch, 32, 32, 1)
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)

    # and against the default (gather) impl: same math, float tolerance
    want_auto, _ = model(params, bn_state, _inputs(3, seed=3), train=False)
    np.testing.assert_allclose(np.asarray(fn(*_inputs(3, seed=3))),
                               np.asarray(want_auto), atol=1e-4)


def test_export_artifact_is_self_contained(tmp_path):
    """Deserialization + execution touch only jax.export — no model class,
    registry, or checkpoint machinery (the deployment contract)."""
    from jax import export as jexport

    from jspsr_tpu.eval.export import save_exported

    model, params, bn_state = _tiny_flagship()
    out = save_exported(tmp_path / "art", model, params, bn_state,
                        _inputs(1))
    exported = jexport.deserialize(bytearray(out.read_bytes()))
    assert "cpu" in exported.platforms and "tpu" in exported.platforms
    pred = jax.jit(exported.call)(*_inputs(2))
    assert np.asarray(pred).shape == (2, 32, 32, 1)


def test_cli_export_flag(tmp_path):
    """--export builds the model from the config, loads the checkpoint, and
    writes the artifact; without a checkpoint it raises ValueError."""
    from jspsr_tpu.cli.main import main
    from jspsr_tpu.train.checkpoint import save_checkpoint

    model, params, bn_state = _tiny_flagship()
    ckpt = tmp_path / "m.npz"
    save_checkpoint(str(ckpt), params, bn_state)

    cfg = {
        "name": "export_smoke", "verbose": False, "dataset": "DFC30",
        "resolution": 8, "patch_size": 32,
        "input_data": {"lr_dem": 1, "image": 3},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8,
                         "pretrained": False, "checkpoint": str(ckpt)},
        "optimizer_kwargs": {"lr": 1e-3},  # create_config dereferences it
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = main(["--config", str(cfg_path),
                "--export", str(tmp_path / "deploy"),
                "--result-dir", str(tmp_path / "run")])
    assert out.exists() and out.stat().st_size > 1000

    cfg["model_kwargs"]["checkpoint"] = None
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="--export requires"):
        main(["--config", str(cfg_path),
              "--export", str(tmp_path / "deploy2"),
              "--result-dir", str(tmp_path / "run2")])


def test_cli_export_platforms_routing(tmp_path, monkeypatch):
    """`export_platforms: [tpu]` in the YAML routes --export to the
    TPU-only fast artifact (keeps the Pallas custom call: deform_impl
    None); the default stays the portable CPU+TPU mxu-pinned lowering.
    Wiring-only test — the TPU lowering itself needs libtpu, so
    save_exported is captured, not executed."""
    import jspsr_tpu.cli.main as cli_main
    from jspsr_tpu.train.checkpoint import save_checkpoint

    model, params, bn_state = _tiny_flagship()
    ckpt = tmp_path / "m.npz"
    save_checkpoint(str(ckpt), params, bn_state)
    seen = {}

    def fake_save(path, model, params, bn_state, inputs, platforms=None,
                  deform_impl="mxu"):
        seen["platforms"], seen["deform_impl"] = platforms, deform_impl
        out = tmp_path / "fake.stablehlo"
        out.write_bytes(b"x" * 2000)
        return out

    monkeypatch.setattr("jspsr_tpu.eval.export.save_exported", fake_save)
    base = {
        "name": "export_route", "verbose": False, "dataset": "DFC30",
        "resolution": 8, "patch_size": 32,
        "input_data": {"lr_dem": 1, "image": 3},
        "model_name": "JSPSR",
        "model_kwargs": {"num_block": 1, "num_feature": 8,
                         "pretrained": False, "checkpoint": str(ckpt)},
        "optimizer_kwargs": {"lr": 1e-3},
    }
    for platforms, want_impl in ((None, "mxu"), (["tpu"], None),
                                 (["cpu", "tpu"], "mxu")):
        cfg = dict(base)
        if platforms is not None:
            cfg["export_platforms"] = platforms
        cfg_path = tmp_path / "cfg.yml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        cli_main.main(["--config", str(cfg_path),
                       "--export", str(tmp_path / "deploy"),
                       "--result-dir", str(tmp_path / "run")])
        assert seen["platforms"] == tuple(platforms or ("cpu", "tpu"))
        assert seen["deform_impl"] == want_impl


def test_export_tpu_only_variant_guard():
    """deform_impl=None (the Pallas-keeping TPU-only artifact flavor,
    PERF.md 'Exported artifact vs in-process') demands platforms=('tpu',):
    a platform-neutral artifact cannot carry a tpu_custom_call."""
    from jspsr_tpu.eval.export import export_inference

    model, params, bn = _tiny_flagship()
    inputs = _inputs(1)
    with pytest.raises(AssertionError, match="tpu"):
        export_inference(model, params, bn, inputs,
                         platforms=("cpu", "tpu"), deform_impl=None)
