"""Foreign-artifact ONNX lane: import graphs produced by torch's exporter.

Every other ONNX test feeds the importer graphs built by this package's own
GraphBuilder; a shared blind spot would never surface.  The reference's test
philosophy is the opposite — it loads a *real zoo file* produced by an
exporter its authors don't control (reference infur/src/predict_onnx.rs:
357-381, infur-test-gen/build.rs:64-94).  CPU torch ships its own C++ ONNX
serializer, so a torch-exported file is this environment's genuine foreign
artifact: torch picks the decompositions (LayerNorm -> ReduceMean/Sub/Pow/
Sqrt chains at opset 13, interpolate -> dynamic Resize fed by a Shape/
Slice/Concat chain, hardswish -> HardSigmoid*x, ...), the attribute
spellings, and the initializer layout.  The oracle cross-checks each graph
too, so one artifact exercises proto decode, NumPy oracle, and JAX importer
against torch's forward as ground truth.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from infur_tpu.onnx import import_model, load_model, run_model
from infur_tpu.onnx.torch_export import export_torch_module

torch.manual_seed(0)


def _roundtrip(module: nn.Module, x: torch.Tensor, tmp_path, *,
               dynamic_hw: bool = False, atol: float = 1e-4,
               opset: int = 13):
    """Export via torch, import via infur_tpu, compare all three executors."""
    module = module.eval()
    path = str(tmp_path / "m.onnx")
    dyn = ({"x": {0: "n", 2: "h", 3: "w"}} if dynamic_hw else None)
    export_torch_module(module, (x,), path, input_names=["x"],
                        output_names=["y"], dynamic_axes=dyn, opset=opset)
    model = load_model(path)
    assert model.producer_name == "pytorch"
    with torch.no_grad():
        want = module(x).numpy()
    feed = {"x": x.numpy()}
    got_jax = np.asarray(import_model(model)(feed)["y"])
    got_oracle = np.asarray(run_model(model, feed)["y"])
    np.testing.assert_allclose(got_jax, want, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(got_oracle, want, atol=atol, rtol=1e-3)
    return model


class TestCnnPatterns:
    def test_conv_bn_pool_classifier(self, tmp_path):
        """Conv/BN(folded)/MaxPool/GlobalAvgPool/Flatten/Gemm — the classic
        image-classifier spine as torch spells it."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.c1 = nn.Conv2d(3, 8, 3, stride=2, padding=1)
                self.b1 = nn.BatchNorm2d(8)
                self.c2 = nn.Conv2d(8, 16, 3, padding=1)
                self.fc = nn.Linear(16, 5)

            def forward(self, x):
                x = F.relu(self.b1(self.c1(x)))
                x = F.max_pool2d(x, 2)
                x = F.relu(self.c2(x))
                x = F.adaptive_avg_pool2d(x, 1).flatten(1)
                return self.fc(x)

        m = _roundtrip(M(), torch.randn(2, 3, 32, 32), tmp_path)
        ops = {n.op_type for n in m.graph.node}
        assert "Gemm" in ops or "MatMul" in ops

    def test_depthwise_hardswish_mobilenet_block(self, tmp_path):
        """Depthwise conv (group=C) + hardswish/hardsigmoid SE gate — the
        LRASPP/MobileNet idiom in torch's own export spelling."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.pw = nn.Conv2d(4, 8, 1)
                self.dw = nn.Conv2d(8, 8, 3, padding=1, groups=8)
                self.se = nn.Conv2d(8, 8, 1)

            def forward(self, x):
                x = F.hardswish(self.pw(x))
                x = self.dw(x)
                gate = torch.sigmoid(self.se(F.adaptive_avg_pool2d(x, 1)))
                return x * gate

        _roundtrip(M(), torch.randn(1, 4, 16, 16), tmp_path)

    def test_transposed_conv_decoder(self, tmp_path):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.up = nn.ConvTranspose2d(6, 3, 4, stride=2, padding=1)

            def forward(self, x):
                return self.up(x)

        _roundtrip(M(), torch.randn(1, 6, 8, 8), tmp_path)


class TestSegmentationPatterns:
    def test_unet_skip_with_bilinear_upsample(self, tmp_path):
        """Encoder/decoder with a bilinear x2 Resize and a Concat skip."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.enc = nn.Conv2d(3, 8, 3, stride=2, padding=1)
                self.mid = nn.Conv2d(8, 8, 3, padding=1)
                self.dec = nn.Conv2d(8 + 3, 4, 1)

            def forward(self, x):
                e = F.relu(self.enc(x))
                u = F.interpolate(F.relu(self.mid(e)), scale_factor=2,
                                  mode="bilinear", align_corners=False)
                return self.dec(torch.cat([u, x], dim=1))

        _roundtrip(M(), torch.randn(1, 3, 24, 24), tmp_path)

    def test_fcn_head_resize_to_input_size(self, tmp_path):
        """torchvision's FCN/DeepLab head upsamples the logits to the
        *runtime* input size: torch exports that as a Shape -> Slice ->
        Concat chain feeding Resize's ``sizes`` input (the exact pattern of
        the reference's zoo artifact).  Exported with dynamic H/W so the
        chain cannot be constant-folded away by torch itself."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.back = nn.Conv2d(3, 8, 3, stride=4, padding=1)
                self.head = nn.Conv2d(8, 6, 1)

            def forward(self, x):
                feat = F.relu(self.back(x))
                logits = self.head(feat)
                return F.interpolate(logits, size=x.shape[-2:],
                                     mode="bilinear", align_corners=False)

        m = _roundtrip(M(), torch.randn(1, 3, 32, 48), tmp_path,
                       dynamic_hw=True)
        ops = [n.op_type for n in m.graph.node]
        assert "Resize" in ops
        assert "Shape" in ops  # proves the dynamic-size chain survived

    def test_aspp_style_dilated_branches(self, tmp_path):
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.b1 = nn.Conv2d(4, 4, 3, padding=2, dilation=2)
                self.b2 = nn.Conv2d(4, 4, 3, padding=4, dilation=4)
                self.out = nn.Conv2d(8, 2, 1)

            def forward(self, x):
                return self.out(torch.cat([self.b1(x), self.b2(x)], 1))

        _roundtrip(M(), torch.randn(1, 4, 16, 16), tmp_path)


class TestTransformerPatterns:
    def test_layernorm_mha_gelu_block(self, tmp_path):
        """Pre-LN transformer block via nn.MultiheadAttention: covers
        torch's LayerNormalization (or its ReduceMean decomposition),
        qkv MatMul/Transpose/Reshape plumbing, Softmax, and Gelu/Erf."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                d = 16
                self.ln1 = nn.LayerNorm(d)
                self.attn = nn.MultiheadAttention(d, 4, batch_first=True)
                self.ln2 = nn.LayerNorm(d)
                self.mlp = nn.Sequential(
                    nn.Linear(d, 4 * d), nn.GELU(), nn.Linear(4 * d, d))

            def forward(self, x):
                h = self.ln1(x)
                a, _ = self.attn(h, h, h, need_weights=False)
                x = x + a
                return x + self.mlp(self.ln2(x))

        # nn.MultiheadAttention lowers through aten::scaled_dot_product_
        # attention, which torch only exports at opset >= 14
        _roundtrip(M(), torch.randn(2, 10, 16), tmp_path, atol=5e-4,
                   opset=14)

    def test_chunked_qkv_and_softmax(self, tmp_path):
        """Hand-rolled attention with a fused qkv Linear split by chunk —
        exports Split/Transpose/MatMul/Mul/Softmax exactly as HF-style
        vision transformers do."""
        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(12, 36)
                self.proj = nn.Linear(12, 12)

            def forward(self, x):
                b, l, d = x.shape
                q, k, v = self.qkv(x).chunk(3, dim=-1)
                att = torch.softmax(q @ k.transpose(1, 2) / d ** 0.5, -1)
                return self.proj(att @ v)

        _roundtrip(M(), torch.randn(1, 7, 12), tmp_path)


class TestModelStageEndToEnd:
    def test_torch_exported_file_serves_through_model_stage(self, tmp_path):
        """The full user path of the reference: point the model stage at a
        foreign .onnx file on disk and run frames through it (reference
        infur/src/processing.rs model-load command)."""
        from infur_tpu.model_stage import Load, ModelStage
        from infur_tpu.processing import Cell, Frame

        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.back = nn.Conv2d(3, 8, 3, stride=2, padding=1)
                self.head = nn.Conv2d(8, 4, 1)

            def forward(self, x):
                y = self.head(F.relu(self.back(x)))
                return F.interpolate(y, size=x.shape[-2:], mode="bilinear",
                                     align_corners=False)

        path = str(tmp_path / "foreign.onnx")
        export_torch_module(M().eval(), (torch.randn(1, 3, 24, 32),), path,
                            input_names=["input"], output_names=["out"],
                            dynamic_axes={"input": {0: "n", 2: "h", 3: "w"}})

        stage = ModelStage()
        stage.control(Load(path))
        img = np.random.default_rng(0).integers(
            0, 255, (20, 28, 3), dtype=np.uint8)
        cell = Cell()
        stage.advance(Frame(1, img), cell)
        pred = cell.value
        assert pred is not None
        scores = np.asarray(pred.primary)
        assert scores.shape == (4, 20, 28)
        assert np.argmax(scores, axis=0).max() < 4


class TestShimContract:
    def test_shim_is_removed_after_export(self, tmp_path):
        import importlib.util
        import sys
        export_torch_module(nn.Identity().eval(), (torch.randn(1, 3),),
                            str(tmp_path / "id.onnx"), input_names=["x"],
                            output_names=["y"])
        assert "onnx" not in sys.modules or importlib.util.find_spec("onnx")

    def test_real_package_wins_when_present(self):
        """onnx_shim must be a no-op if a real onnx package exists."""
        import sys
        import types
        from infur_tpu.onnx.torch_export import onnx_shim
        real = types.ModuleType("onnx")
        sys.modules["onnx"] = real
        try:
            with onnx_shim():
                import onnx
                assert onnx is real
        finally:
            del sys.modules["onnx"]

    def test_custom_function_refusal(self):
        from infur_tpu.onnx.torch_export import _NoFunctions
        fns = _NoFunctions()
        fns.extend([])  # empty extend is the standard-model path
        with pytest.raises(NotImplementedError):
            fns.extend([object()])
