"""End-to-end CLI smoke: `fit -c configs/smoke/sd15-tiny.yaml` runs one step
on a generated tiny image folder (the reference's fast_dev_run analog)."""


import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture()
def smoke_data(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(3):
        arr = (rng.rand(80, 96, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
        (tmp_path / f"img_{i}.txt").write_text(f"tag{i}, a test image, simple")
    return tmp_path


def test_cli_fit_smoke(smoke_data, monkeypatch):
    from neurosis_tpu.trainer.cli import main

    monkeypatch.setenv("NEUROSIS_SMOKE_DATA", str(smoke_data))
    rc = main(["fit", "-c", "configs/smoke/sd15-tiny.yaml", "--fast-dev-run"])
    assert rc == 0


def test_config_loader_interpolation(tmp_path):
    from neurosis_tpu.config import load_config

    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(
        "a:\n  b: hello\nc: ${a.b}\nd: ${oc.env:NEUROSIS_TEST_ENVVAR,fallback}\n"
    )
    cfg = load_config(cfg_path)
    assert cfg["c"] == "hello"
    assert cfg["d"] == "fallback"


def test_registry_resolves_reference_paths():
    from neurosis_tpu.config import resolve_class_path
    from neurosis_tpu.models.unet import UNetModel

    assert resolve_class_path("neurosis.modules.diffusion.UNetModel") is UNetModel
    # fallback import path
    import optax

    assert resolve_class_path("optax.adamw") is optax.adamw


def test_cli_validate_smoke(smoke_data, monkeypatch, capsys):
    from neurosis_tpu.trainer.cli import main

    monkeypatch.setenv("NEUROSIS_SMOKE_DATA", str(smoke_data))
    rc = main(["validate", "-c", "configs/smoke/sd15-tiny.yaml", "--max-batches", "2"])
    assert rc == 0
    import json

    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "val/loss" in metrics and np.isfinite(metrics["val/loss"])


def test_cli_test_smoke(smoke_data, monkeypatch, capsys):
    """`test` subcommand (LightningCLI surface): eval on data_test/data split."""
    from neurosis_tpu.trainer.cli import main

    monkeypatch.setenv("NEUROSIS_SMOKE_DATA", str(smoke_data))
    rc = main(["test", "-c", "configs/smoke/sd15-tiny.yaml", "--max-batches", "2"])
    assert rc == 0
    import json

    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "test/loss" in metrics and np.isfinite(metrics["test/loss"])


def test_cli_predict_smoke(smoke_data, monkeypatch, tmp_path):
    from neurosis_tpu.trainer.cli import main

    monkeypatch.setenv("NEUROSIS_SMOKE_DATA", str(smoke_data))
    out_dir = tmp_path / "preds"
    rc = main(
        [
            "predict",
            "-c",
            "configs/smoke/sd15-tiny.yaml",
            "--prompt",
            "a tiny test prompt",
            "--size",
            "64",
            "--steps",
            "4",
            "--out",
            str(out_dir),
        ]
    )
    assert rc == 0
    assert (out_dir / "sample_000.png").exists()
    assert (out_dir / "grid.png").exists()


def test_engine_dispatch_rejects_unknown():
    from neurosis_tpu.trainer.builder import build_engine

    with pytest.raises(NotImplementedError):
        build_engine({"class_path": "neurosis.models.SomethingElse"})
