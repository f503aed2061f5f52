"""D-NeRF dataparser (ref: data/dataparsers/dnerf_dataparser.py).

Blender-synthetic layout plus a per-frame ``time`` field; the Blender
parser here already lifts ``time`` into Cameras, so D-NeRF is an alias
with its own default paths.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from soccernerfs_tpu.data.dataparsers.blender import Blender, BlenderDataParserConfig


@dataclass
class DNeRFDataParserConfig(BlenderDataParserConfig):
    """(ref: dnerf_dataparser.py:36-48)."""

    data: Path = Path("data/dnerf/lego")

    def setup(self):
        return Blender(self)
