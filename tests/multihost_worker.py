"""Worker process for the 2-process multihost test (test_parallel.py).

Each process owns 4 virtual CPU devices; jax.distributed stitches them into
an 8-device world; make_multihost_mesh builds the ('dcn'=2,'data'=4,
'model'=1) mesh through its REAL n_proc>1 branch; one dp train step runs
with gradients reduced over ('dcn','data').  Prints one JSON line with the
loss and a parameter checksum for the parent to compare against its
single-process flat-mesh result.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    f"localhost:{port}", num_processes=n_proc, process_id=pid)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from util_synthetic import tiny_pipeline_setup  # noqa: E402

from sfm_nerf_tpu.parallel.mesh import make_multihost_mesh  # noqa: E402
from sfm_nerf_tpu.parallel.train_step import make_dp_train_step  # noqa: E402


def main():
    mesh = make_multihost_mesh(dp_per_host=4, tp=1)
    assert dict(mesh.shape) == {"dcn": n_proc, "data": 4, "model": 1}
    cfg, tx, params, opt_state, images, poses, K = tiny_pipeline_setup()
    step = make_dp_train_step(cfg, tx, mesh)
    key = jax.random.key(7)
    params, opt_state, loss = step(params, opt_state, key, images, poses, K)
    checksum = float(
        sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(params))
    )
    print(json.dumps({
        "pid": pid, "loss": float(loss), "checksum": checksum,
        "n_proc": jax.process_count(), "devices": jax.device_count(),
    }), flush=True)


main()
