"""Shared tiny HM-ViT config for fast CPU tests."""
RANGE = [-20.48, -20.48, -3.0, 20.48, 20.48, 1.0]

TINY_CFG = {
    "lidar": {
        "voxel_size": [0.64, 0.64, 4.0],
        "lidar_range": RANGE,
        "anchor_number": 2,
        "pillar_vfe": {"use_norm": True, "with_distance": False,
                       "use_absolute_xyz": True, "num_filters": [32]},
        "point_pillar_scatter": {"num_features": 32, "grid_size": [64, 64, 1]},
        "base_bev_backbone": {
            "layer_nums": [1, 1, 1],
            "layer_strides": [2, 2, 2],
            "num_filters": [32, 32, 32],
            "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [32, 32, 32],
        },
        "shrink_header": {"kernal_size": [3], "stride": [2], "padding": [1],
                          "dim": [64], "input_dim": 96},
    },
    "camera": {"dim": 32, "bev_size": 4, "out_dim": 64, "num_blocks": 1,
               "decoder_layers": 2, "encoder_channels": (16, 32, 32, 32)},
    "compression": 0,
    "hetero_fusion": {
        "num_iters": 1,
        "hetero_fusion_block": {
            "spatial_transform": {"downsample_rate": 4,
                                  "voxel_size": [0.64, 0.64, 4]},
            "architect_mode": "sequential",
            "input_dim": 64,
            "mlp_dim": 64,
            "window_size": 4,
            "dim_head": 16,
            "drop_out": 0.0,
        },
    },
    "hetero_decoder": {"input_dim": 64, "num_layer": 1, "num_ch_dec": [64],
                       "anchor_number": 2},
}

ANCHOR_ARGS = {
    "cav_lidar_range": RANGE,
    "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
    "feature_stride": 4, "num": 2,
    "vw": 0.64, "vh": 0.64, "vd": 4, "W": 64, "H": 64, "D": 1,
}

POSTPROCESS_CFG = {
    "anchor_args": ANCHOR_ARGS,
    "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                    "score_threshold": 0.27},
    "order": "hwl",
    "nms_thresh": 0.15,
    "max_num": 100,
}
