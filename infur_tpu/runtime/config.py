"""Persisted app config, replayed as commands on startup.

The reference persists ``ProcConfig`` via eframe storage and *replays* it as
ordinary commands when the GUI starts — config IS an initial command script,
not separate state (reference infur/src/gui.rs:91-103, 148-155,
main.rs:120-129).  Same design here with a JSON file.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


DEFAULT_PATH = os.path.expanduser("~/.config/infur_tpu/config.json")


@dataclass
class ProcConfig:
    video_input: list[str] = field(default_factory=list)
    scale: float = 0.5          # reference default (gui.rs:101)
    paused: bool = False
    model_input: str = ""
    pix_fmt: str = "bgr24"      # "yuv420p" = decode-native planar frames
    # viewer-side UI state, persisted like eframe storage persists the
    # whole surface (reference gui.rs:349-352): softmax-alpha checkbox and
    # the last seek position (restored after Play on startup)
    softmax: bool = False
    seek_secs: float = 0.0
    # Round model input dims up to this multiple.  Default ON for the
    # interactive frontends (CLI/viewer construct their app from this
    # config): a continuous scale slider otherwise compiles one executable
    # per position, ~20-40 s each on TPU (SURVEY §7 hard part 3).  Exact-
    # shape mode (None / CLI --model-bucket 0) remains for parity tests.
    model_bucket: int | None = 32

    @classmethod
    def load(cls, path: str = DEFAULT_PATH) -> "ProcConfig":
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            return cls()
        known = {k: v for k, v in data.items() if k in cls.__dataclass_fields__}
        return cls(**known)

    def save(self, path: str = DEFAULT_PATH) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, path)

    def commands(self) -> list:
        """The startup command script (reference gui.rs:148-155 order:
        Scale, Play, Pause, Load)."""
        from infur_tpu.app import ColorCmd, ModelCmd, ScaleCmd
        from infur_tpu.processing import Pause, Play, Seek

        cmds: list = [ScaleCmd(self.scale)]
        if self.video_input:
            cmds.append(Play(self.video_input, pix_fmt=self.pix_fmt))
            if self.seek_secs > 0:
                cmds.append(Seek(self.seek_secs))
        cmds.append(Pause(self.paused))
        if self.model_input:
            cmds.append(ModelCmd(self.model_input))
        if self.softmax:
            cmds.append(ColorCmd(softmax=True))
        return cmds
