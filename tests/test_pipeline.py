"""Pipeline writer tests: resume, statistics store, report generation."""

import json
import os

import numpy as np
import pytest

from katsdpimager_tpu import pipeline, report, simulate


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("sim") / "multi.h5"
    simulate.make_sim_dataset(str(path), num_antennas=12, num_times=12,
                              num_channels=2, max_radius=600.0)
    return str(path)


def run_pipeline(sim_dataset, outdir, extra=()):
    return pipeline.main([
        sim_dataset, outdir, "--pixels", "256", "--kernel-width", "12",
        "--minor", "50", "--no-thumbnails", *extra,
    ])


class TestPipeline:
    def test_products_and_stats(self, sim_dataset, tmp_path):
        outdir = str(tmp_path / "out")
        assert run_pipeline(sim_dataset, outdir) == 0
        assert os.path.exists(os.path.join(outdir, "image_00000_clean.fits"))
        assert os.path.exists(os.path.join(outdir, "image_00001_clean.fits"))
        with open(os.path.join(outdir, "state.json")) as f:
            state = json.load(f)
        assert state["status/0"] == "complete"
        assert state["status/1"] == "complete"
        assert "noise" in state["stats/0"]
        assert state["stats/0"]["frequency"] > 0
        assert os.path.exists(os.path.join(outdir, "metadata.json"))
        # observation geometry summary recorded for QA plots
        assert "uvw_samples" in state["observation"]

    def test_resume_skips_done(self, sim_dataset, tmp_path, caplog):
        outdir = str(tmp_path / "out")
        assert run_pipeline(sim_dataset, outdir) == 0
        fits0 = os.path.join(outdir, "image_00000_clean.fits")
        mtime = os.path.getmtime(fits0)
        assert run_pipeline(sim_dataset, outdir) == 0
        # untouched on rerun: channel was skipped
        assert os.path.getmtime(fits0) == mtime

    def test_report(self, sim_dataset, tmp_path):
        outdir = str(tmp_path / "out")
        assert run_pipeline(sim_dataset, outdir) == 0
        out_html = str(tmp_path / "report.html")
        assert report.main([os.path.join(outdir, "state.json"),
                            out_html]) == 0
        with open(out_html) as f:
            doc = f.read()
        assert "Per-channel statistics" in doc
        assert "data:image/png;base64," in doc
        # UV-coverage plot rendered from the recorded observation summary
        assert doc.count("data:image/png;base64,") >= 4

    def test_observation_plots_geometry(self, tmp_path):
        """Elevation/parallactic-angle plots render when antenna geometry
        and a time range are recorded (reference report.py:362-418)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        obs = {
            "antenna_positions": (np.array(
                [[5109224.0, 2006790.0, -3239100.0]] * 3)
                + np.arange(3)[:, None] * 50).tolist(),
            "phase_centre": [0.9, -0.7],
            "time_range": [1590969600.0, 1590973200.0],
            "uvw_samples": np.random.default_rng(0).uniform(
                -500, 500, (100, 3)).tolist(),
        }
        plots = report.observation_plots(obs, plt, 1.4e9)
        assert len(plots) == 2  # uv coverage + elevation/PA pair

    def test_sefd_model(self):
        model = report.meerkat_sefd_model("L")
        sefd = model(1.4e9)
        assert 300 < float(sefd) < 2000
        assert np.isnan(model(5e9))
        noise = report.predicted_noise(500.0, 64, 208e3, 8 * 3600)
        assert 0 < noise < 1e-3
