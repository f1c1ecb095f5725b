"""Percentile (outlier-robust) int8 calibration: ``pct=`` spec query.

Min/max calibration lets a single activation spike stretch the u8 grid and
crush resolution where the distribution's mass lives — the classic failure
on transformer residual streams.  ``calibrate(percentile=...)`` takes
two-sided percentile ranges instead (ort's Percentile calibrater is the
reference analog to its default MinMax, onnxruntime quantization docs);
the ``pct=`` spec query exposes it on every native ``family:int8`` spec.
"""

import numpy as np
import pytest

from infur_tpu.errors import ModelLoadError
from infur_tpu.model_stage import Load, ModelStage
from infur_tpu.onnx import GraphBuilder, import_model, run_model
from infur_tpu.onnx.quantize import calibrate, quantize_static
from infur_tpu.processing import Cell, Frame


def _passthrough_model():
    """Conv with identity 1x1 kernel: output == input, so quantization
    error is directly measurable against the feed itself."""
    g = GraphBuilder("ident")
    x = g.input("x", np.float32, (1, 2, 8, 8))
    w = g.init("w", np.eye(2, dtype=np.float32).reshape(2, 2, 1, 1))
    y = g.node("Conv", [x, w], outputs=["out"])
    g.output(y, np.float32, (1, 2, 8, 8))
    return g.model()


def _outlier_feeds(rng, n=4, spike=1000.0):
    """Bulk uniform in [-1, 1]; ONE spiked element per feed."""
    feeds = []
    for _ in range(n):
        x = rng.uniform(-1, 1, (1, 2, 8, 8)).astype(np.float32)
        x[0, 0, 0, 0] = spike
        feeds.append({"x": x})
    return feeds


class TestCalibrate:
    def test_percentile_clips_outliers(self, rng):
        model = _passthrough_model()
        feeds = _outlier_feeds(rng)
        minmax = calibrate(model, feeds)
        # 1 spike per 128-element feed = 0.78% outlier mass; a 2.5% tail
        # clips it with margin (99.5% would sit exactly on the boundary)
        pct = calibrate(model, feeds, percentile=95.0)
        assert minmax["x"][1] == pytest.approx(1000.0)
        assert pct["x"][1] < 2.0
        assert pct["x"][0] >= minmax["x"][0]

    def test_none_percentile_is_exact_minmax(self, rng):
        model = _passthrough_model()
        feeds = _outlier_feeds(rng)
        ranges = calibrate(model, feeds)
        lo, hi = ranges["x"]
        allv = np.concatenate([f["x"].ravel() for f in feeds])
        assert lo == pytest.approx(float(allv.min()))
        assert hi == pytest.approx(float(allv.max()))

    @pytest.mark.parametrize("bad", [0.0, 50.0, 100.5, -1.0])
    def test_percentile_validation(self, rng, bad):
        with pytest.raises(ValueError, match="percentile"):
            calibrate(_passthrough_model(), _outlier_feeds(rng),
                      percentile=bad)

    def test_bulk_fidelity_improves_under_outliers(self, rng):
        """The decisive property: with a spiked distribution, percentile
        ranges reconstruct the BULK of the values far better (the spike
        itself saturates, which is the accepted trade)."""
        model = _passthrough_model()
        feeds = _outlier_feeds(rng)
        probe = feeds[0]
        bulk = probe["x"].ravel()[1:]  # everything but the spike

        def bulk_err(percentile):
            q = quantize_static(model, feeds, percentile=percentile)
            out = np.asarray(run_model(q, probe)["out"]).ravel()[1:]
            return float(np.abs(out - bulk).mean())

        err_minmax = bulk_err(None)
        err_pct = bulk_err(95.0)
        # u8 over [-1000, 1000] has ~7.8 step size: bulk is destroyed;
        # over ~[-1, 1] the step is ~0.008
        assert err_pct < err_minmax / 50


def _passthrough_model_32():
    """Dense variant of the identity conv: 2048 values per feed.  KL
    calibration is SHAPE-based — it needs enough samples per histogram
    bin to see the distribution (the sparse-pool fallback is exact
    min/max), so its tests feed bigger tensors than the percentile ones."""
    g = GraphBuilder("ident32")
    x = g.input("x", np.float32, (1, 2, 32, 32))
    w = g.init("w", np.eye(2, dtype=np.float32).reshape(2, 2, 1, 1))
    y = g.node("Conv", [x, w], outputs=["out"])
    g.output(y, np.float32, (1, 2, 32, 32))
    return g.model()


def _gauss_outlier_feeds(rng, n=4, spike=1000.0):
    """Gaussian bulk (entropy calibration needs SHAPE to preserve — a
    uniform bulk survives coarse codes unchanged, so KL would rightly
    keep the full range there); ONE spiked element per feed."""
    feeds = []
    for _ in range(n):
        x = (rng.normal(size=(1, 2, 32, 32)) * 0.5).astype(np.float32)
        x[0, 0, 0, 0] = spike
        feeds.append({"x": x})
    return feeds


class TestEntropy:
    def test_entropy_clips_outliers(self, rng):
        """KL-optimal ranges drop the spike: keeping it would smear the
        gaussian bulk into a handful of coarse codes."""
        model = _passthrough_model_32()
        feeds = _gauss_outlier_feeds(rng)
        minmax = calibrate(model, feeds)
        ent = calibrate(model, feeds, entropy=True)
        assert minmax["x"][1] == pytest.approx(1000.0)
        assert ent["x"][1] < 10.0

    def test_entropy_keeps_compact_range(self, rng):
        """No outliers -> no catastrophic clipping: the bulk of a plain
        gaussian stays inside the chosen range."""
        model = _passthrough_model_32()
        feeds = [{"x": (rng.normal(size=(1, 2, 32, 32)) * 0.5)
                  .astype(np.float32)} for _ in range(4)]
        ent = calibrate(model, feeds, entropy=True)
        lo, hi = ent["x"]
        assert hi >= 0.75 and lo <= -0.75  # >= 1.5 sigma on both sides

    def test_entropy_sparse_pool_falls_back_to_minmax(self, rng):
        """Too few samples for shape-based KL -> exact min/max, not a
        noisy histogram guess (the 8x8 feeds pool only 512 values)."""
        model = _passthrough_model()
        feeds = _outlier_feeds(rng)
        ent = calibrate(model, feeds, entropy=True)
        assert ent["x"][1] == pytest.approx(1000.0)

    def test_entropy_bulk_fidelity_improves(self, rng):
        """The decisive property, like the percentile test: bulk
        reconstruction error collapses once the spike stops stretching
        the u8 grid."""
        model = _passthrough_model_32()
        feeds = _gauss_outlier_feeds(rng)
        probe = feeds[0]
        bulk = probe["x"].ravel()[1:]

        def bulk_err(**kw):
            q = quantize_static(model, feeds, **kw)
            out = np.asarray(run_model(q, probe)["out"]).ravel()[1:]
            return float(np.abs(out - bulk).mean())

        assert bulk_err(entropy=True) < bulk_err() / 50

    def test_entropy_excludes_percentile(self, rng):
        with pytest.raises(ValueError, match="mutually exclusive"):
            calibrate(_passthrough_model(), _gauss_outlier_feeds(rng),
                      percentile=99.9, entropy=True)

    def test_cal_spec_validated(self):
        with pytest.raises(ModelLoadError, match="minmax|entropy"):
            ModelStage().control(Load("lraspp:int8?cal=median"))
        with pytest.raises(ModelLoadError, match="only meaningful"):
            ModelStage().control(Load("lraspp?cal=entropy"))
        with pytest.raises(ModelLoadError, match="mutually exclusive"):
            ModelStage().control(Load("lraspp:int8?cal=entropy&pct=99.9"))

    def test_lraspp_int8_entropy_serves(self, small_clip):
        """End-to-end: entropy calibration on real decoded frames, then a
        frame through the quantized executable."""
        path, _, _ = small_clip
        st = ModelStage()
        st.control(Load(f"lraspp:int8?calib={path}&cal=entropy"))
        cell = Cell()
        st.advance(Frame(1, np.zeros((48, 64, 3), np.uint8)), cell)
        out = np.asarray(cell.value.outputs["out"])
        assert out.shape[1:] == (48, 64) and np.isfinite(out).all()


class TestSpecQuery:
    def test_pct_requires_int8(self):
        with pytest.raises(ModelLoadError, match="only meaningful"):
            ModelStage().control(Load("lraspp?pct=99.9"))

    @pytest.mark.parametrize("bad", ["abc", "42", "101"])
    def test_pct_value_validated(self, bad):
        with pytest.raises(ModelLoadError, match="pct"):
            ModelStage().control(Load(f"lraspp:int8?pct={bad}"))

    def test_pct_rejected_for_imported_onnx(self, tmp_path):
        from infur_tpu.onnx import save_model
        g = GraphBuilder("m")
        x = g.input("x", np.float32, (1, 3, 8, 8))
        y = g.node("Relu", [x])
        g.output(y, np.float32, (1, 3, 8, 8))
        path = tmp_path / "m.onnx"
        save_model(g.model(), str(path))
        with pytest.raises(ModelLoadError, match="native-family"):
            ModelStage().control(Load(f"{path}?pct=99.9"))

    def test_lraspp_int8_pct_serves(self, small_clip):
        """End-to-end: percentile calibration on real decoded frames, then
        a frame through the quantized executable."""
        path, _, _ = small_clip
        st = ModelStage()
        st.control(Load(f"lraspp:int8?calib={path}&pct=99.5"))
        cell = Cell()
        st.advance(Frame(1, np.zeros((48, 64, 3), np.uint8)), cell)
        out = np.asarray(cell.value.outputs["out"])
        assert out.shape[1:] == (48, 64) and np.isfinite(out).all()

    def test_pct_flows_into_sized_family_ranges(self, monkeypatch):
        """segformer:int8 (lazy size path) must calibrate with the pct."""
        from infur_tpu import model_stage as ms
        seen = {}
        real = calibrate

        def spy(model, feeds, percentile=None, **kw):
            seen["pct"] = percentile
            return real(model, feeds, percentile=percentile, **kw)

        monkeypatch.setattr("infur_tpu.onnx.quantize.calibrate", spy)
        st = ModelStage()
        st.control(Load("segformer:b0:int8?pct=99.9"))
        cell = Cell()
        st.advance(Frame(1, np.zeros((32, 32, 3), np.uint8)), cell)
        assert seen["pct"] == 99.9
        assert np.isfinite(np.asarray(cell.value.primary)).all()

    def test_entropy_flows_into_sized_family_ranges(self, monkeypatch):
        """segformer:int8 (lazy size path) must calibrate with the
        entropy estimator when cal=entropy is given."""
        from infur_tpu.onnx import quantize as qz
        seen = {}
        real = calibrate

        def spy(model, feeds, percentile=None, entropy=False, **kw):
            seen["entropy"] = entropy
            return real(model, feeds, percentile=percentile,
                        entropy=entropy, **kw)

        monkeypatch.setattr(qz, "calibrate", spy)
        st = ModelStage()
        st.control(Load("segformer:b0:int8?cal=entropy"))
        cell = Cell()
        st.advance(Frame(1, np.zeros((32, 32, 3), np.uint8)), cell)
        assert seen["entropy"] is True
        assert np.isfinite(np.asarray(cell.value.primary)).all()
