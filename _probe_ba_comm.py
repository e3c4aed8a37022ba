#!/usr/bin/env python
"""Comm/compute split of the point-sharded BA, measured structurally.

Counts the all-reduce ops in the COMPILED SPMD HLO of
``bundle_adjust_sharded`` on an 8-virtual-device CPU mesh and prints the
per-LM-iteration collective payload.  The claim being verified: the four
point-axis reductions (U, g_cam, S_off, rhs2) are bundled into exactly ONE
all-reduce inside the scan body, whose payload is (36*N^2 + 48*N) floats —
independent of the point count M, so scaling M out over devices costs no
extra communication.

Reference anchor: the dense scipy BA this replaces,
/root/reference/Phase1/BundleAdjustment.py:122-160.

Run: python _probe_ba_comm.py   (forces CPU; safe next to a TPU job)
"""

import re

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    assert jax.device_count() >= 8, (
        "run under tests' conftest env or XLA_FLAGS="
        "--xla_force_host_platform_device_count=8"
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sfm_nerf_tpu.parallel.ba import bundle_adjust_sharded

    n_cam, n_pts, n_iters = 20, 256, 5
    rng = np.random.default_rng(0)
    K = jnp.asarray([[720.0, 0, 400], [0, 720, 300], [0, 0, 1]])
    cams = jnp.asarray(rng.normal(0, 0.1, (n_cam, 6)))
    pts = jnp.asarray(rng.normal(0, 1.0, (n_pts, 3)) + [0, 0, 6.0])
    obs = jnp.asarray(rng.uniform(0, 800, (n_cam, n_pts, 2)))
    vis = jnp.asarray((rng.uniform(size=(n_cam, n_pts)) < 0.6).astype(float))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    fn = jax.jit(
        lambda *a: bundle_adjust_sharded(
            *a, mesh=mesh, axis="data", n_iters=n_iters
        )
    )
    hlo = fn.lower(K, cams, pts, obs, vis).compile().as_text()

    # all-reduce ops and their result shapes (tuple all-reduces list every
    # operand shape in the result tuple)
    ars = re.findall(r"(\S+) = \(?([^)=]*)\)? all-reduce\(", hlo)
    print(f"all-reduce ops in compiled HLO: {len(ars)}")
    for name, shapes in ars:
        print(f"  {name}: {shapes.strip()}")

    n_bytes = lambda N: (36 * N * N + 48 * N) * 4
    print("\nper-LM-iteration collective payload (f32, bundled psum):")
    for N in (5, 50, 200, 1000):
        print(f"  {N:5d} cams: {n_bytes(N)/1e6:10.3f} MB")
    print(
        "\npayload is independent of the point count M; per-device compute "
        "scales 1/D with M sharded."
    )


if __name__ == "__main__":
    main()
