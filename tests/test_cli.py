"""CLI frontend: headless play with file sinks (the reference's only
frontend is the egui window; the CLI drives the same proc loop)."""

import numpy as np

from infur_tpu.cli import main


def test_play_writes_rvf_video(tmp_path):
    out = tmp_path / "seg.rvf"
    rc = main(["play", "synth:64x48@10:4f", "--max-frames", "4",
               "--scale", "1.0", "--out-video", str(out), "--timeout", "60"])
    assert rc == 0
    from infur_tpu.video.rvf import read_rvf
    hdr, frames = read_rvf(out)
    assert (hdr.width, hdr.height, hdr.count) == (64, 48, 4)
    assert frames.dtype == np.uint8
    # replayable through the decoder facade
    from infur_tpu.video.decoder import open_video
    d = open_video([str(out)])
    buf = d.empty_image()
    assert d.read_frame_into(buf) == 1
    np.testing.assert_array_equal(buf, frames[0])
    d.close()


def test_play_png_sink_and_config_save(tmp_path):
    outdir = tmp_path / "frames"
    cfg = tmp_path / "cfg.json"
    rc = main(["play", "synth:32x24@10:2f", "--max-frames", "2",
               "--out", str(outdir), "--scale", "0.5",
               "--config", str(cfg), "--timeout", "60"])
    assert rc == 0
    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == 2
    assert cfg.exists()  # persisted on clean shutdown (gui.rs:349-352)
    import json
    assert json.loads(cfg.read_text())["scale"] == 0.5


def test_eval_subcommand(tmp_path, capsys, rng):
    d = tmp_path / "val.npz"
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.integers(-1, 21, size=(2, 32, 32)).astype(np.int32)
    np.savez(d, x=x, y=y)
    rc = main(["eval", "lraspp", str(d), "--batch", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "miou" in out and "pixel_acc" in out


def test_play_profile_capture(tmp_path):
    prof = tmp_path / "trace"
    rc = main(["play", "synth:32x24@10:2f", "--max-frames", "2",
               "--profile", str(prof), "--timeout", "60"])
    assert rc == 0
    assert any(prof.rglob("*.pb")) or any(prof.rglob("*.trace*")) \
        or any(prof.iterdir())  # profiler wrote something
