from soccernerfs_tpu.core.rays import Frustums, RayBundle, RaySamples
from soccernerfs_tpu.core.scene_box import SceneBox

__all__ = ["Frustums", "RayBundle", "RaySamples", "SceneBox"]
