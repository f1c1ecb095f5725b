"""Headless CLI frontend.

The reference's only frontend is an egui window (reference
infur/src/gui.rs); this framework is headless-first: the CLI drives the
same proc loop a GUI would (same channels, same commands) and sinks frames
to files or nowhere (benchmark mode).  Typed per-stage errors arrive over
the result channel and print as status lines, mirroring the GUI's
per-stage status widgets (gui.rs:206-251).

Usage:
    python -m infur_tpu play synth:640x480@30:5 --model fcn_resnet50 \
        --scale 0.5 --max-frames 60 --out /tmp/out --stats
    python -m infur_tpu info model.onnx
"""

from __future__ import annotations

import argparse
import os
import queue
import sys
import time

import numpy as np

from infur_tpu.app import AppInfo, GUIFrame, ModelCmd, ScaleCmd
from infur_tpu.errors import InfurError
from infur_tpu.processing import Pause, Play
from infur_tpu.runtime.config import ProcConfig
from infur_tpu.runtime.loop import start_proc
from infur_tpu.runtime.metrics import FrameCounter


def _save_png(path: str, rgba: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(rgba, "RGBA").save(path)


def cmd_play(args: argparse.Namespace) -> int:
    cfg = ProcConfig.load(args.config) if args.config else ProcConfig()
    if args.inputs:
        cfg.video_input = args.inputs
    if args.scale is not None:
        cfg.scale = args.scale
    if args.model is not None:
        cfg.model_input = args.model
    cfg.paused = False
    if args.pix_fmt is not None:
        cfg.pix_fmt = args.pix_fmt
    if args.model_bucket is not None:
        cfg.model_bucket = args.model_bucket or None  # 0 disables
    if not cfg.video_input:
        print("error: no video input (give one or use --config)", file=sys.stderr)
        return 2

    import contextlib

    from infur_tpu.app import ProcessingApp
    from infur_tpu.runtime.trace import profile_trace
    prof_ctx = profile_trace(args.profile) if args.profile \
        else contextlib.nullcontext()
    # the CLI sinks composited (buffer as its no-model fallback): skip the
    # decoded plane; --wire rle keeps dense RGBA planes off the D2H link
    handle = start_proc(ProcessingApp(model_bucket=cfg.model_bucket,
                                      wire=args.wire,
                                      planes={"composited"}))
    for cmd in cfg.commands():
        handle.send(cmd)
    if args.softmax:
        from infur_tpu.app import ColorCmd
        handle.send(ColorCmd(softmax=True))

    if args.out:
        os.makedirs(args.out, exist_ok=True)
    vid_writer = None       # lazily opened on the first frame (dims unknown)
    vid_warned = False
    counter = FrameCounter()
    n = 0
    exit_code = 0
    state = {"eof": False, "was_playing": False}
    # --timeout is an IDLE timeout: the longest gap between frames
    # (refreshed on every frame, so long runs and slow compiles both work)
    deadline = time.monotonic() + args.timeout
    prof_ctx.__enter__()  # --profile: jax.profiler trace around the run
    try:
        while n < args.max_frames:
            try:
                result = handle.frame_rx.get(timeout=0.5)
            except KeyboardInterrupt:
                print("\ninterrupted — stopping", file=sys.stderr)
                break
            except queue.Empty:
                # also surface control-channel results while idle
                _drain_ctrl(handle, args, state)
                if state["eof"] and n > 0:
                    break  # clean end of stream: all frames delivered
                if time.monotonic() > deadline:
                    print("timeout waiting for frames", file=sys.stderr)
                    exit_code = 2
                    break
                continue
            if isinstance(result, InfurError):
                print(f"[{result.stage}] {result}", file=sys.stderr)
                exit_code = 1
                if time.monotonic() > deadline:  # persistent per-frame errors
                    print("giving up: errors without frames for "
                          f"{args.timeout:.0f}s", file=sys.stderr)
                    break
                continue
            frame: GUIFrame = result
            n += 1
            deadline = time.monotonic() + args.timeout
            counter.count(frame.id)
            if args.out:
                # frames arrive host-materialized (runtime/loop.py), so no
                # device lock is needed here
                img = frame.composited if frame.composited is not None \
                    else frame.buffer
                _save_png(f"{args.out}/frame_{frame.id:06d}.png",
                          np.asarray(img))
            if args.out_video:
                img = np.asarray(frame.composited
                                 if frame.composited is not None
                                 else frame.buffer)
                bgr = np.ascontiguousarray(img[:, :, 2::-1])  # RGBA -> BGR
                if vid_writer is None:
                    from infur_tpu.video.rvf import RvfWriter
                    h, w = bgr.shape[:2]
                    vid_writer = RvfWriter(args.out_video, w, h, fps=30)
                if bgr.shape == (vid_writer._hdr.height,
                                 vid_writer._hdr.width, 3):
                    vid_writer.write_frame(bgr)
                elif not vid_warned:
                    vid_warned = True
                    print("warning: frame size changed mid-run; "
                          "--out-video keeps the initial geometry "
                          "(mismatched frames skipped)", file=sys.stderr)
            if args.stats and (stats := counter.stats()) is not None:
                caption = ""
                if frame.class_counts is not None:
                    from infur_tpu.ops.colorcode import class_labels
                    counts = np.asarray(frame.class_counts)
                    names = class_labels(len(counts))
                    top = [f"{names[k]} {100 * counts[k] / max(counts.sum(), 1):.0f}%"
                           for k in np.argsort(counts)[::-1][:3] if counts[k]]
                    caption = "  " + ", ".join(top)
                print(f"fps {stats.shown_fps:6.1f} shown "
                      f"{stats.received_fps:6.1f} recv "
                      f"{stats.drops:5.1f} drop{caption}", flush=True)
            _drain_ctrl(handle, args, state)
    finally:
        prof_ctx.__exit__(None, None, None)
        handle.stop()
        if vid_writer is not None:
            vid_writer.close()
    # persist settings on clean shutdown (the reference saves ProcConfig on
    # close, gui.rs:349-352): always when a config file is in play, or to
    # the default location with --save-config
    if args.config or args.save_config:
        from infur_tpu.runtime.config import DEFAULT_PATH
        try:
            cfg.save(args.config or DEFAULT_PATH)
        except OSError as e:
            print(f"warning: could not save config: {e}", file=sys.stderr)
    print(f"processed {n} frames")
    return exit_code


def _drain_ctrl(handle, args, state: dict | None = None) -> None:
    while True:
        try:
            r = handle.ctrl_result_rx.get_nowait()
        except queue.Empty:
            return
        if isinstance(r, InfurError):
            print(f"[{r.stage}] {r}", file=sys.stderr)
        elif isinstance(r, AppInfo):
            if state is not None:
                if r.playing:
                    state["was_playing"] = True
                elif state["was_playing"]:
                    state["eof"] = True  # True -> False = end of stream
        if isinstance(r, AppInfo) and args.stats:
            geo = r.geometry
            t = " ".join(f"{k}={v:.1f}ms"
                         for k, v in (r.timings_ms or {}).items())
            print(f"state: playing={r.playing} paused={r.paused} "
                  f"scale={r.scale} geo={geo} "
                  f"model={r.model.spec if r.model else None} {t}", flush=True)


def cmd_info(args: argparse.Namespace) -> int:
    """Introspect a model the way the reference surfaces ModelInfo."""
    from infur_tpu.model_stage import Load, ModelStage
    stage = ModelStage()
    try:
        stage.control(Load(args.model))
    except InfurError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    info = stage.info()
    if info is None:
        print("error: empty model spec (nothing to introspect)",
              file=sys.stderr)
        return 1
    print(f"spec:    {info.spec}")
    print(f"layout:  {info.layout}  dtype: {info.dtype}")
    print(f"outputs: {', '.join(info.outputs)}")
    return 0


def cmd_view(args: argparse.Namespace) -> int:
    from infur_tpu.viewer import serve
    cfg = ProcConfig.load(args.config) if args.config else ProcConfig()
    if args.inputs:
        cfg.video_input = args.inputs
    if args.scale is not None:
        cfg.scale = args.scale
    if args.model is not None:
        cfg.model_input = args.model
    if args.model_bucket is not None:
        cfg.model_bucket = args.model_bucket or None
    from infur_tpu.runtime.config import DEFAULT_PATH
    print(f"viewer at http://{args.host}:{args.port}/", flush=True)
    serve(args.host, args.port, config=cfg,
          config_path=args.config or DEFAULT_PATH, wire=args.wire)
    return 0


def cmd_window(args: argparse.Namespace) -> int:
    from infur_tpu.runtime.config import DEFAULT_PATH
    from infur_tpu.window import run_window
    cfg = ProcConfig.load(args.config) if args.config else ProcConfig()
    if args.inputs:
        cfg.video_input = args.inputs
    if args.scale is not None:
        cfg.scale = args.scale
    if args.model is not None:
        cfg.model_input = args.model
    if args.model_bucket is not None:
        cfg.model_bucket = args.model_bucket or None
    w, h = (int(v) for v in args.size.split("x"))
    run_window(config=cfg, width=w, height=h, wire=args.wire,
               config_path=args.config or DEFAULT_PATH,
               max_seconds=args.max_seconds)
    return 0


def cmd_eval(args: argparse.Namespace) -> int:
    """Segmentation metrics (mIoU / pixel accuracy) for a model over a
    labeled dataset: one or more ``.npz`` files with ``x`` (N, H, W, 3
    float32, model-ready) and ``y`` (N, H, W int; -1 = void)."""
    import glob

    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.train import evaluate

    paths: list[str] = []
    for p in args.data:
        paths.extend(sorted(glob.glob(p)) if any(c in p for c in "*?[") else [p])
    if not paths:
        print("error: no data files matched", file=sys.stderr)
        return 2
    stage = ModelStage()
    try:
        stage.control(Load(args.model))
    except InfurError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    backend = stage._backend

    def batches():
        for p in paths:
            with np.load(p) as z:
                x, y = z["x"], z["y"]
            for i in range(0, len(x), args.batch):
                yield (x[i:i + args.batch].astype(np.float32),
                       y[i:i + args.batch].astype(np.int32))

    out = evaluate(lambda _p, xx: backend(xx), None, batches(),
                   num_classes=args.num_classes)
    print(f"pixel_acc {out['pixel_acc']:.4f}  miou {out['miou']:.4f}")
    return 0


def cmd_finetune(args: argparse.Namespace) -> int:
    """Finetune a native family on a dataset (.npz with images/labels u8,
    or a directory with images/ + labels/ pairs — infur_tpu.data)."""
    import logging

    from infur_tpu.data import Augment, batches, load_data
    from infur_tpu.model_stage import Load, ModelStage
    from infur_tpu.train import finetune

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    try:
        data = load_data(args.data)
    except (OSError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    stage = ModelStage()
    try:
        stage.control(Load(args.model))
    except InfurError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    backend = stage._backend
    if getattr(backend, "params", None) is None:
        print("error: finetune needs a native family spec", file=sys.stderr)
        return 2
    crop = None
    if args.crop:
        h, w = (int(v) for v in args.crop.split("x"))
        crop = (h, w)
    aug = Augment(hflip=not args.no_aug,
                  brightness=0.0 if args.no_aug else 0.2,
                  contrast=0.0 if args.no_aug else 0.2,
                  crop_hw=crop)
    data_iter = batches(data, args.batch, augment=aug, seed=args.seed)
    params, losses = finetune(
        lambda p, x: backend._apply(p, x), backend.params, data_iter,
        steps=args.steps, learning_rate=args.lr,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup,
        checkpoint_path=args.out, state_path=args.state,
        resume=args.resume, checkpoint_every=args.checkpoint_every)
    if losses:
        print(f"final loss {losses[-1]:.4f}"
              + (f"  saved {args.out}" if args.out else ""))
    return 0


def cmd_testgen(args: argparse.Namespace) -> int:
    from infur_tpu.testgen import generate
    h, w = (int(v) for v in args.model_size.split("x"))
    paths = generate(args.root, model_hw=(h, w), long_secs=args.long_secs)
    for name, path in paths.items():
        size = os.path.getsize(path)
        print(f"{name}: {path} ({size/1e6:.1f} MB)")
    return 0


def main(argv: list[str] | None = None) -> int:
    # persistent XLA compile cache: scale-slider / model-swap recompiles hit
    # disk instead of recompiling (first compile of a big model is minutes).
    # jax is already imported by the module imports above, so the env var
    # would be ignored — the config update is the reliable path.
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/infur_tpu/jax"))
    p = argparse.ArgumentParser(prog="infur_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    play = sub.add_parser("play", help="run the pipeline headlessly")
    play.add_argument("inputs", nargs="*", help="video or image inputs "
                      "(synth:WxH@FPS:D | *.rvf | *.png/jpg/npy | "
                      "anything ffmpeg opens)")
    play.add_argument("--model", default=None,
                      help="*.onnx | native family (fcn_resnet50[:bf16])")
    play.add_argument("--scale", type=float, default=None)
    play.add_argument("--max-frames", type=int, default=10 ** 9)
    play.add_argument("--out", default=None, help="PNG output directory")
    play.add_argument("--out-video", default=None,
                      help="write composited frames to an .rvf video "
                      "(replayable: python -m infur_tpu play out.rvf)")
    play.add_argument("--profile", default=None, metavar="DIR",
                      help="capture a jax.profiler device trace of the run "
                      "(TensorBoard format) into DIR")
    play.add_argument("--softmax", action="store_true",
                      help="softmax the model logits for the overlay alpha "
                      "(reference README todo, here a live control)")
    play.add_argument("--stats", action="store_true")
    play.add_argument("--config", default=None, help="JSON config path")
    play.add_argument("--save-config", action="store_true")
    play.add_argument("--timeout", type=float, default=120.0)
    play.add_argument("--pix-fmt", default=None,
                      choices=["bgr24", "yuv420p"],
                      help="frame wire format (yuv420p halves H2D bytes)")
    play.add_argument("--model-bucket", type=int, default=None,
                      help="round model input dims up to this multiple "
                      "(caps scale-slider recompiles; 0 disables)")
    play.add_argument("--wire", default="dense", choices=["dense", "rle"],
                      help="display transport: dense RGBA planes (device "
                      "composite) or run-coded mask + host composite "
                      "(~30x fewer D2H bytes; for bandwidth-starved links)")
    play.set_defaults(fn=cmd_play)

    info = sub.add_parser("info", help="introspect a model")
    info.add_argument("model")
    info.set_defaults(fn=cmd_info)

    view = sub.add_parser("view", help="serve the web viewer")
    view.add_argument("inputs", nargs="*")
    view.add_argument("--model", default=None)
    view.add_argument("--scale", type=float, default=None)
    view.add_argument("--config", default=None)
    view.add_argument("--host", default="127.0.0.1")
    view.add_argument("--port", type=int, default=8793)
    view.add_argument("--model-bucket", type=int, default=32,
                      help="model-input rounding multiple (the slider "
                      "would otherwise compile per position; 0 disables)")
    view.add_argument("--wire", default="dense", choices=["dense", "rle"],
                      help="display transport (see play --wire)")
    view.set_defaults(fn=cmd_view)

    win = sub.add_parser("window", help="open the native desktop window "
                         "(SDL; headless machines can use "
                         "SDL_VIDEODRIVER=dummy)")
    win.add_argument("inputs", nargs="*")
    win.add_argument("--model", default=None)
    win.add_argument("--scale", type=float, default=None)
    win.add_argument("--config", default=None)
    win.add_argument("--size", default="1024x640", help="window WxH")
    win.add_argument("--model-bucket", type=int, default=32,
                     help="model-input rounding multiple (0 disables)")
    win.add_argument("--wire", default="dense", choices=["dense", "rle"],
                     help="display transport (see play --wire)")
    win.add_argument("--max-seconds", type=float, default=None,
                     help="auto-exit bound (headless smoke runs)")
    win.set_defaults(fn=cmd_window)

    ev = sub.add_parser("eval", help="mIoU/pixel-acc over labeled .npz data")
    ev.add_argument("model", help="model spec (family or .onnx)")
    ev.add_argument("data", nargs="+",
                    help=".npz files (x: N,H,W,3 f32; y: N,H,W int) or globs")
    ev.add_argument("--batch", type=int, default=8)
    ev.add_argument("--num-classes", type=int, default=None)
    ev.set_defaults(fn=cmd_eval)

    ft = sub.add_parser("finetune", help="finetune a native family on a "
                        "dataset (infur_tpu.data loaders + augmentation)")
    ft.add_argument("model", help="native family spec (e.g. fcn_resnet50"
                    "[@ckpt.npz])")
    ft.add_argument("data", help=".npz (images/labels u8) or a directory "
                    "with images/ + labels/")
    ft.add_argument("--steps", type=int, default=100)
    ft.add_argument("--batch", type=int, default=4)
    ft.add_argument("--lr", type=float, default=1e-3)
    ft.add_argument("--lr-schedule", default="poly",
                    choices=["poly", "constant"])
    ft.add_argument("--warmup", type=int, default=0)
    ft.add_argument("--crop", default=None, metavar="HxW",
                    help="random-crop size (required for mixed-size data)")
    ft.add_argument("--no-aug", action="store_true",
                    help="disable flip/jitter augmentation")
    ft.add_argument("--seed", type=int, default=0)
    ft.add_argument("--out", default=None,
                    help="params checkpoint (loadable via family@ckpt)")
    ft.add_argument("--state", default=None,
                    help="full train state for --resume")
    ft.add_argument("--resume", action="store_true")
    ft.add_argument("--checkpoint-every", type=int, default=100)
    ft.set_defaults(fn=cmd_finetune)

    tg = sub.add_parser("testgen", help="generate test fixtures "
                        "(videos + f32/int8 FCN models)")
    tg.add_argument("--root", default="fixtures")
    tg.add_argument("--model-size", default="120x160",
                    help="HxW of the fixture model input")
    tg.add_argument("--long-secs", type=float, default=40.0)
    tg.set_defaults(fn=cmd_testgen)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
