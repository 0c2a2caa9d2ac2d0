"""CLI driver tests (L6 entry points)."""

import json

import numpy as np
import pytest

from cvad_tpu.cli import main


def test_cli_train_synthetic(tmp_path, capsys):
    rc = main(["train", "--preset", "avenue_improved", "--epochs", "1",
               "--out", str(tmp_path), "--n-synthetic", "8",
               "--set", "data.batch_size=4", "--set", "data.frame_size=16,16",
               "--set", "train.log_every=1000000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["final_loss"]) and out["epochs"] == 1
    assert (tmp_path / "config.json").exists()
    assert (tmp_path / "improved_training_history.json").exists()


def test_cli_eval_checkpoint(tmp_path, capsys):
    """`cvad eval` restores a run's checkpoint and reports the family's
    eval metrics (reference test_model analog as a standalone driver)."""
    common = ["--out", str(tmp_path), "--n-synthetic", "8",
              "--set", "data.batch_size=4", "--set", "data.frame_size=16,16"]
    assert main(["train", "--preset", "avenue_improved", "--epochs", "1",
                 "--set", "train.save_interval=1",
                 "--set", "train.log_every=1000000"] + common) == 0
    capsys.readouterr()
    rc = main(["eval", "--preset", "avenue_improved", "--step", "latest"]
              + common)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epoch"] == 1
    assert np.isfinite(out["mean_score"])  # family-D 8-metric eval surface
    assert (tmp_path / "eval_metrics.json").exists()

    # the 'best' checkpoint (saved by the epoch-1 eval) is addressable too
    rc = main(["eval", "--preset", "avenue_improved", "--step", "best"]
              + common)
    assert rc == 0
    best = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert best["checkpoint"] == "best" and np.isfinite(best["mean_score"])

    # missing checkpoint -> rc 1, structured error
    rc = main(["eval", "--preset", "avenue_improved",
               "--out", str(tmp_path / "empty"), "--n-synthetic", "8",
               "--set", "data.batch_size=4",
               "--set", "data.frame_size=16,16"])
    assert rc == 1

    # an EXPLICIT missing step ('mid' was removed by the completed fit)
    # must also yield the structured error, not an orbax traceback
    capsys.readouterr()
    rc = main(["eval", "--preset", "avenue_improved", "--step", "mid"]
              + common)
    assert rc == 1
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert err["error"] == "no checkpoint found" and err["step"] == "mid"


def test_cli_doctor(capsys):
    """`cvad doctor` reports environment health as one JSON object; the
    device probe runs in a subprocess with a timeout so a wedged PJRT relay
    can't hang the diagnosis itself."""
    import os

    env = {k: os.environ.get(k) for k in ("PYTHONPATH", "JAX_PLATFORMS")}
    os.environ["PYTHONPATH"] = ""  # probe subprocess: clean CPU env
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        rc = main(["doctor", "--probe-timeout", "90"])
    finally:
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["device_probe"] == "ok"
    assert out["native_decoder"] and ".tif" in out["native_formats"]
    assert out["reference_present"] in (True, False)


def test_cli_bad_override(tmp_path):
    with pytest.raises(AttributeError):
        main(["train", "--out", str(tmp_path), "--set", "optim.nonexistent=1"])


def test_cli_diagnose_and_plots(tmp_path, capsys):
    hist = {"epochs": [1, 2], "train_losses": [1.0, 0.5],
            "loss_components": [{"anomaly_loss": 1.0}] * 2,
            "evaluation_metrics": [{"mean_score": 0.3, "score_range": 0.2}],
            "learning_rates": [1e-3, 1e-3]}
    p = tmp_path / "hist.json"
    p.write_text(json.dumps(hist))
    assert main(["diagnose", str(p)]) == 0
    capsys.readouterr()
    out_png = tmp_path / "dash.png"
    assert main(["plots", str(p), "--out", str(out_png)]) == 0
    assert out_png.stat().st_size > 0


def test_cli_convert(tmp_path, capsys):
    import os

    if not os.path.exists("/root/reference/best_improved_model.pth"):
        pytest.skip("reference checkpoint absent")
    rc = main(["convert", "/root/reference/best_improved_model.pth",
               "--out", str(tmp_path / "ckpt")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["params"] == 188_849


def test_cli_export(tmp_path, capsys):
    import os

    import numpy as np

    if not os.path.exists("/root/reference/best_improved_model.pth"):
        pytest.skip("reference checkpoint absent")
    dest = tmp_path / "scorer.jaxexport"
    rc = main(["export", "/root/reference/best_improved_model.pth",
               "--out", str(dest), "--platforms", "cpu"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bytes"] == dest.stat().st_size > 100_000
    # the artifact scores clips with no model code or checkpoint import
    from cvad_tpu.evaluation.serving import load_scorer

    score = load_scorer(dest.read_bytes())
    s, adj = score(np.random.default_rng(7).uniform(
        0, 1, (3, 8, 64, 64, 3)).astype(np.float32))
    assert s.shape == (3,) and adj.shape == (3, 16, 16)
    assert np.isfinite(s).all()


def test_cli_export_family_c(tmp_path, capsys):
    import numpy as np

    torch = pytest.importorskip("torch")
    from tests.conftest import load_reference_module

    try:
        ref = load_reference_module("minicausal_vad_complete3")
    except Exception:
        pytest.skip("reference module absent")
    torch.manual_seed(0)
    tm = ref.SimpleVideoAnomalyDetector()
    tm.eval()
    ckpt = tmp_path / "c.pth"
    torch.save(tm.state_dict(), ckpt)

    dest = tmp_path / "c.jaxexport"
    rc = main(["export", str(ckpt), "--family", "c",
               "--out", str(dest), "--platforms", "cpu"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bytes"] == dest.stat().st_size > 10_000

    from cvad_tpu.evaluation.serving import load_scorer

    x = np.random.default_rng(3).uniform(0, 1, (5, 8, 64, 64, 1)).astype(np.float32)
    s = load_scorer(dest.read_bytes())(x)
    with torch.no_grad():
        ts = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    np.testing.assert_allclose(s, ts.reshape(-1), atol=3e-5)


def test_cli_export_family_e(tmp_path, capsys):
    import numpy as np

    torch = pytest.importorskip("torch")
    from tests.conftest import load_reference_module

    try:
        ref = load_reference_module("avenue_training_script_bbox")
    except Exception:
        pytest.skip("reference module absent")
    torch.manual_seed(1)
    tm = ref.CausalAnomalyDetector()
    tm.eval()
    ckpt = tmp_path / "e.pth"
    torch.save(tm.state_dict(), ckpt)

    dest = tmp_path / "e.jaxexport"
    rc = main(["export", str(ckpt), "--family", "e",
               "--out", str(dest), "--platforms", "cpu"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["bytes"] == dest.stat().st_size > 10_000

    from cvad_tpu.evaluation.serving import load_scorer

    x = np.random.default_rng(8).uniform(0, 1, (5, 8, 64, 64, 3)).astype(np.float32)
    s, adj = load_scorer(dest.read_bytes())(x)
    with torch.no_grad():
        ts, tadj, _ = tm(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(s, ts.numpy().reshape(-1), atol=3e-4)
    np.testing.assert_allclose(adj, tadj.numpy(), atol=3e-4)


def test_cli_synth_then_train(tmp_path, capsys):
    """'cvad synth' writes a tif tree that the real disk -> decode -> train
    path consumes end to end (UCSD .tif like the actual dataset)."""
    rc = main(["synth", "--out", str(tmp_path / "tree"), "--format", "tif",
               "--videos", "1", "--frames", "16"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files"] == 2 * 1 * 16

    rc = main(["train", "--preset", "mini3d",
               "--dataset", "ucsd_ped2_simple",
               "--data-root", str(tmp_path / "tree"),
               "--out", str(tmp_path / "run"), "--epochs", "1",
               "--set", "data.batch_size=2"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["epochs"] == 1 and res["final_loss"] > 0


def test_cli_smoke(capsys):
    import json as _json

    from cvad_tpu.cli import main

    assert main(["smoke"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["output_shape"] == [2, 1]


def test_cli_plots_block_correlation(tmp_path, capsys):
    """`cvad plots --block-correlation`: the reference's per-block
    feature-correlation figure (Figure 2025-09-04 180626.png, SURVEY §2.4 —
    its producing script is lost upstream) from a trained family-C run."""
    out_dir = tmp_path / "run"
    common = ["--set", "data.batch_size=4", "--set", "data.frame_size=32,32",
              "--set", "train.log_every=1000000"]
    assert main(["train", "--preset", "mini3d", "--epochs", "1",
                 "--out", str(out_dir), "--n-synthetic", "8",
                 "--set", "train.save_interval=1"] + common) == 0
    capsys.readouterr()
    fig = tmp_path / "blocks.png"
    rc = main(["plots", "--block-correlation", "--run", str(out_dir),
               "--step", "latest", "--out", str(fig),
               "--set", "data.batch_size=4",
               "--set", "data.frame_size=32,32"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    if rc != 0 and out.get("out") is None:
        pytest.skip("matplotlib unavailable")
    assert rc == 0
    assert out["blocks"] == [8, 16, 32]  # reference channel widths
    assert out["restored"] is not None
    assert fig.exists() and fig.stat().st_size > 0
    # correlations are well-formed: symmetric, unit diagonal
    assert all(0.0 <= v <= 1.0 for v in out["mean_abs_offdiag"])


def test_cli_plots_block_correlation_fresh_init(tmp_path, capsys):
    """Without --run the tool renders a fresh-init structure figure."""
    fig = tmp_path / "blocks.png"
    rc = main(["plots", "--block-correlation", "--out", str(fig),
               "--set", "data.batch_size=4",
               "--set", "data.frame_size=32,32"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    if rc != 0 and out.get("out") is None:
        pytest.skip("matplotlib unavailable")
    assert rc == 0 and out["blocks"] == [8, 16, 32]
