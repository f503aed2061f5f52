"""Dataparser registry (ref: data/datamanagers/base_datamanager.py:81-104).

Maps CLI subcommand names to dataparser config classes; mirrors the
reference's AnnotatedDataParserUnion surface.
"""
from soccernerfs_tpu.data.dataparsers.blender import BlenderDataParserConfig
from soccernerfs_tpu.data.dataparsers.nerfstudio_parser import NerfstudioDataParserConfig
from soccernerfs_tpu.data.dataparsers.soccer import (
    BroadcaststyleDataParserConfig,
    CloseupDataParserConfig,
    DynamicDataParserConfig,
    StadiumDataParserConfig,
    StadiumwideDataParserConfig,
)
from soccernerfs_tpu.data.dataparsers.dnerf import DNeRFDataParserConfig
from soccernerfs_tpu.data.dataparsers.hypernerf import HyperNeRFDataParserConfig
from soccernerfs_tpu.data.dataparsers.minimal import MinimalDataParserConfig
from soccernerfs_tpu.data.dataparsers.instant_ngp_data import InstantNGPDataParserConfig
from soccernerfs_tpu.data.dataparsers.sitcoms3d import Sitcoms3DDataParserConfig
from soccernerfs_tpu.data.dataparsers.misc_parsers import (
    ARKitScenesDataParserConfig,
    DycheckDataParserConfig,
    NuScenesDataParserConfig,
    PhototourismDataParserConfig,
    ScanNetDataParserConfig,
    SDFStudioDataParserConfig,
)

DATAPARSERS = {
    "nerfstudio-data": NerfstudioDataParserConfig,
    "blender-data": BlenderDataParserConfig,
    "stadium-data": StadiumDataParserConfig,
    "closeup-data": CloseupDataParserConfig,
    "broadcaststyle-data": BroadcaststyleDataParserConfig,
    "stadiumwide-data": StadiumwideDataParserConfig,
    "dynamic-data": DynamicDataParserConfig,
    "hypernerf-data": HyperNeRFDataParserConfig,
    "dnerf-data": DNeRFDataParserConfig,
    "minimal-parser": MinimalDataParserConfig,
    "instant-ngp-data": InstantNGPDataParserConfig,
    "sitcoms3d-data": Sitcoms3DDataParserConfig,
    "phototourism-data": PhototourismDataParserConfig,
    "dycheck-data": DycheckDataParserConfig,
    "sdfstudio-data": SDFStudioDataParserConfig,
    "scannet-data": ScanNetDataParserConfig,
    "arkitscenes-data": ARKitScenesDataParserConfig,
    "nuscenes-data": NuScenesDataParserConfig,
}
