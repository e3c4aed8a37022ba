"""Incremental Structure-from-Motion pipeline (Phase1 driver)."""

from sfm_nerf_tpu.sfm.pipeline import SfMPipeline  # noqa: F401
