"""Data layer: dataset readers, augmentation, frame-graph sampling."""
