# Reference-parity CLI package (NeRF train/test/gif). Console commands:
# sfm-nerf-train, sfm-nerf-render, sfm-nerf-gif (pyproject.toml).
