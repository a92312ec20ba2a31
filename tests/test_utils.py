"""Utilities: serialization, timers, loss logging, file helpers, CLI."""

import json
import time

import numpy as np
import pytest

from gpras_tpu.utils.file_utils import detect_file_properties, get_filename
from gpras_tpu.utils.profiling import PhaseTimers, log_fit_losses
from gpras_tpu.utils.serialization import load_artifact, save_artifact


def test_save_load_artifact_round_trip(tmp_path):
    meta = {"kernel": "RBF", "count": 3, "nested": {"a": [1, 2]}}
    arrays = {"x": np.arange(6).reshape(2, 3).astype(np.float32),
              "names": np.array(["AD", "TF"], dtype="<U2")}
    path = tmp_path / "artifact.npz"
    save_artifact(path, meta, arrays)
    meta2, arrays2 = load_artifact(path)
    assert meta2 == meta
    np.testing.assert_array_equal(arrays2["x"], arrays["x"])
    np.testing.assert_array_equal(arrays2["names"], arrays["names"])


def test_phase_timers(tmp_path):
    t = PhaseTimers()
    with t.phase("load_data"):
        time.sleep(0.01)
    t.start("fit_model")
    time.sleep(0.01)
    t.stop("fit_model")
    assert t.elapsed["load_data"] >= 0.01
    assert t.elapsed["fit_model"] >= 0.01
    out = tmp_path / "timers.json"
    t.to_file(out)
    assert set(json.loads(out.read_text())) == {"load_data", "fit_model"}


def test_log_fit_losses_handles_batched_and_padded():
    losses = np.full((3, 10), np.nan)
    losses[:, :4] = np.arange(4)[None, :] + np.arange(3)[:, None]
    hist = log_fit_losses({"losses": losses})
    assert len(hist) == 4
    np.testing.assert_allclose(hist[0], 1.0)  # mean over modes at step 0


def test_get_filename_local_and_s3():
    assert get_filename("/a/b/model.p01.hdf") == "model.p01.hdf"
    assert get_filename("s3://bucket/key/model.u01") == "model.u01"


def test_detect_file_properties(tmp_path):
    p = tmp_path / "crlf.txt"
    p.write_bytes(b"a=1\r\nb=2\r\n")
    enc, newline = detect_file_properties(p)
    assert newline == "\r\n"
    p2 = tmp_path / "lf.txt"
    p2.write_bytes("caf\xe9=1\n".encode("latin-1"))
    enc2, newline2 = detect_file_properties(p2)
    assert enc2 == "latin-1"
    assert newline2 == "\n"


def test_cli_describe_config(capsys):
    from gpras_tpu.__main__ import main

    assert main(["describe-config"]) == 0
    out = capsys.readouterr().out
    assert "working_directory" in out
    assert "kernel" in out


def test_cli_select_events(tmp_path):
    from test_tooling import make_sst_parquet

    from gpras_tpu.__main__ import main

    pq = tmp_path / "sst.pq"
    make_sst_parquet(pq)
    out = tmp_path / "events.stac.json"
    rc = main(["select-events", str(pq), str(out), "--n-train", "12",
               "--n-test", "4", "--target-rps", "2,5,10",
               "--test-rp-range", "1.5,50"])
    assert rc == 0
    stac = json.loads(out.read_text())
    assert stac["properties"]["train_event_count"] == 12


def test_package_lazy_exports():
    """The documented import surface (docs/migration.md): top-level model
    classes and the pipeline entry points resolve lazily, and unknown
    attributes raise AttributeError (not ImportError)."""
    import gpras_tpu
    import gpras_tpu.pipeline as pl

    assert gpras_tpu.GPRAS.__name__ == "GPRAS"
    assert gpras_tpu.PreProcessor.__name__ == "PreProcessor"
    assert gpras_tpu.HmsPreProcessor.__name__ == "HmsPreProcessor"
    assert pl.Config.__name__ == "Config"
    assert callable(pl.pipeline)
    # the submodule gpras_tpu.pipeline.pipeline shares the attribute name:
    # importing it binds the MODULE onto the package, which must not shadow
    # the documented function export (property on the package module class)
    import gpras_tpu.pipeline.pipeline  # noqa: F401

    assert callable(pl.pipeline) and pl.pipeline.__name__ == "pipeline"
    with pytest.raises(AttributeError):
        _ = gpras_tpu.not_a_symbol
    with pytest.raises(AttributeError):
        _ = pl.not_a_symbol
