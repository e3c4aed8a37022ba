"""Pure-functional JAX ops: epipolar geometry, triangulation, PnP, bundle
adjustment, ray generation and volume rendering.

Everything here is jit-safe (static shapes, lax control flow) and batched —
the reference's per-point Python loops become single vmapped device launches.
"""
