"""Single-agent PointPillars detector (lidar-only baseline family).

Encoder -> 1x1 anchor heads, with a ``return_features`` switch so the same
module serves as the LiDAR branch of every fusion model (reference:
opencood/models/point_pillar.py:9-62).
"""
from __future__ import annotations

from flax import linen as nn

from .layers import DetectionHead
from .pillar_encoder import PointPillarEncoder


class PointPillarDetector(nn.Module):
    config: dict
    return_features: bool = False

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        x = PointPillarEncoder(self.config)(points, points_mask, train)
        if self.return_features:
            return x
        psm, rm = DetectionHead(self.config["anchor_number"])(x)
        # heads emit NHWC; the loss/postprocess contract is NCHW maps
        return {
            "psm": psm.transpose(0, 3, 1, 2),
            "rm": rm.transpose(0, 3, 1, 2),
        }
