"""Scene .conf loaders.

Two formats exist in the reference:
  1. geometry lists (data/geom/*.conf): comment header then lines of
     `path lox loy loz hix hiy hiz` — each file is one domain; consumed by
     the ply/obj apps.
  2. the full ConfigFileLoader format (data/README.conf): width/height,
     view angle, camera/focus/up, render + schedule type, sample rate,
     brick topology, data file — the reference's loader is bit-rotted
     (ConfigFileLoader marked "TODO update to new context",
     CMakeLists.txt:77-80); this one is live.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import List, Tuple


@dataclasses.dataclass
class GeomEntry:
    path: str
    lo: Tuple[float, float, float]
    hi: Tuple[float, float, float]


def read_geom_conf(path: str) -> List[GeomEntry]:
    """Format 1: lines of `file lox loy loz hix hiy hiz` (bunny.conf)."""
    base = pathlib.Path(path).parent
    out = []
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        nums = [float(x) for x in parts[1:7]]
        out.append(GeomEntry(str(base / parts[0]),
                             tuple(nums[:3]), tuple(nums[3:])))
    return out


@dataclasses.dataclass
class RenderConfig:
    width: int = 512
    height: int = 512
    view_angle: float = 45.0         # degrees, as the .conf files store it
    camera: Tuple = (0.0, 0.0, 0.0)
    focus: Tuple = (0.0, 0.0, -1.0)
    up: Tuple = (0.0, 1.0, 0.0)
    render_type: str = "Volume"      # Volume | Surface | Manta
    schedule_type: str = "Image"
    sample_rate: float = 1.0
    topology: Tuple[int, int, int] = (1, 1, 1)
    datafile: str = ""


def read_render_conf(path: str) -> RenderConfig:
    """Format 2 (README.conf order; 'brittle, all arguments in order')."""
    toks: List[str] = []
    for line in pathlib.Path(path).read_text().splitlines():
        line = line.split("#")[0].strip()
        if line:
            toks.extend(line.split())
    c = RenderConfig()
    i = 0
    c.width, c.height = int(toks[i]), int(toks[i + 1]); i += 2
    c.view_angle = float(toks[i]); i += 1
    c.camera = tuple(float(x) for x in toks[i:i + 3]); i += 3
    c.focus = tuple(float(x) for x in toks[i:i + 3]); i += 3
    c.up = tuple(float(x) for x in toks[i:i + 3]); i += 3
    c.render_type = toks[i]; i += 1
    c.schedule_type = toks[i]; i += 1
    c.sample_rate = float(toks[i]); i += 1
    c.topology = tuple(int(x) for x in toks[i:i + 3]); i += 3
    if i < len(toks):
        c.datafile = toks[i]
    return c
