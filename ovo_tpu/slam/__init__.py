from .vanilla import VanillaMapper  # noqa: F401


def get_slam_backbone(config, dataset, cam_intrinsics):
    """Backbone factory (reference: ovomapping.py:18-27)."""
    backbone = config["slam"].get("slam_module", "vanilla")
    if backbone == "gaussian_slam":
        from .gaussian import WrapperGaussianSLAM

        return WrapperGaussianSLAM(config, cam_intrinsics)
    if backbone.startswith("orbslam"):
        from .orbslam import WrapperORBSLAM

        return WrapperORBSLAM(config, cam_intrinsics,
                              world_ref=dataset[0][3])
    return VanillaMapper(config, cam_intrinsics)
