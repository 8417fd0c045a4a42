"""Video panoptic segmentation subsystem (Panoptic FPN + fusion)."""
