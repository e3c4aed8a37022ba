# Reference-parity CLI package (SfM driver). The `sfm-nerf-sfm` console
# command maps to Phase1.Wrapper:main (pyproject.toml).
