"""The examples/quickstart.py walkthrough must stay executable end to end
(the reference pins its README quickstart the same way — reference:
tests/integration/test_readme_quickstart_e2e.py)."""

from __future__ import annotations

import importlib.util
import os


def test_quickstart_runs_end_to_end(spark, tmp_path, capsys):
    # Import the example as a module and drive its run() against tmp_path;
    # the shared session fixture keeps it one JVM.
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "quickstart.py")
    spec = importlib.util.spec_from_file_location("quickstart_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.run(str(tmp_path))
    out = capsys.readouterr().out
    assert "Quickstart complete." in out
    assert "aggregated frame 5m" in out
    assert "report written to" in out
    # artifacts on disk: raw lake, aggregated frames, control stores, report
    assert os.path.isdir(tmp_path / "data" / "raw")
    assert os.path.isdir(tmp_path / "data" / "agg")
    assert (tmp_path / "validation_report.csv").exists()


def test_analytics_tour_runs_end_to_end(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "analytics_tour.py")
    spec = importlib.util.spec_from_file_location("analytics_tour_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.run(str(tmp_path), spark=spark)
    out = capsys.readouterr().out
    assert "analytics tour complete" in out
    assert "skip stats" in out


def test_training_data_pipeline_runs_end_to_end(spark, tmp_path, capsys):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "training_data_pipeline.py")
    spec = importlib.util.spec_from_file_location("training_data_pipeline_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.run(str(tmp_path), spark=spark)
    printed = capsys.readouterr().out
    assert out["exported"] > 0 and out["exported"] <= out["raw"]
    assert set(out["splits"]) == {"train", "val", "test"}
    assert "roundtrip OK" in printed and "pipeline complete" not in printed


def test_relational_mining_tour_runs_end_to_end(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "relational_mining_tour.py")
    spec = importlib.util.spec_from_file_location("relational_mining_tour_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.run(str(tmp_path), spark=spark)
    out = capsys.readouterr().out
    assert "relational mining tour complete." in out
    assert "communities" in out
    assert "frontier" in out


def test_snapshot_tables_tour_runs_end_to_end(spark, tmp_path, capsys):
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "snapshot_tables_tour.py")
    spec = importlib.util.spec_from_file_location("snapshot_tables_tour_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.run(str(tmp_path), spark=spark)
    out = capsys.readouterr().out
    assert "snapshot tour complete" in out
    assert "time travel to v1" in out
    assert "'version': 3" in out
