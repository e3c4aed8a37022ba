"""On-chip inference timings: fused vs XLA full-frame renders.

Covers the new fused-inference envelope: legacy arch (real chair .pth),
flat active arch, hierarchical active, and aux maps.  Prints one line per
measurement; forces host transfer for timing (axon enqueue caveat).
"""
import os
import time

import numpy as np

from sfm_nerf_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from sfm_nerf_tpu.config import (NeRFModelConfig, NeRFPipelineConfig,
                                 RenderConfig)
from sfm_nerf_tpu.models import init_nerf_params
from sfm_nerf_tpu.models.convert import convert_pth
from sfm_nerf_tpu.train.nerf_trainer import (make_render_image,
                                             make_render_image_aux)

H = W = int(os.environ.get("BI_RES", 400))
CAM = 0.6911112070083618
f = 0.5 * CAM * W / np.tan(0.5 * CAM)
K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
pose = jnp.asarray(np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32))
pose = pose.at[2, 3].set(4.0)


def timeit(fn, *args, reps=3):
    img = np.asarray(fn(*args))           # compile + warm
    t0 = time.time()
    for _ in range(reps):
        img = np.asarray(fn(*args))
    dt = (time.time() - t0) / reps
    assert np.isfinite(img).all()
    return dt, img


def report(tag, cfg, params):
    r = make_render_image(cfg)
    dt, img = timeit(r, params, K, pose, H, W)
    print(f"{tag}: {dt*1000:.0f} ms/frame  (std {img.std():.4f})", flush=True)
    return dt


# 1) real chair checkpoint (legacy arch), fused vs XLA
params_c, mcfg_c = convert_pth(
    "/root/reference/Phase2/checkpoints/chair/final_model.pth")
params_c = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                  params_c)
rc = dict(n_sample=256, near=2.0, far=6.0, perturb=False, variant="legacy")
cfg_cf = NeRFPipelineConfig(model=mcfg_c,
                            render=RenderConfig(use_fused_kernel=True, **rc))
cfg_cx = NeRFPipelineConfig(model=mcfg_c,
                            render=RenderConfig(use_fused_kernel=False, **rc))
t_fused = report("chair legacy FUSED 400^2x256", cfg_cf, params_c)
t_xla = report("chair legacy XLA   400^2x256", cfg_cx, params_c)
print(f"chair speedup: {t_xla / t_fused:.2f}x; 10-frame gif fused ~"
      f"{10 * t_fused:.1f}s / XLA ~{10 * t_xla:.1f}s", flush=True)

# fused-vs-XLA parity on the real ckpt (deterministic z)
imf = np.asarray(make_render_image(cfg_cf)(params_c, K, pose, H, W))
imx = np.asarray(make_render_image(cfg_cx)(params_c, K, pose, H, W))
mse = float(np.mean((imf - imx) ** 2))
print(f"chair fused-vs-XLA PSNR {-10 * np.log10(max(mse, 1e-12)):.1f} dB",
      flush=True)

# 2) active arch flat (serving config)
mcfg_a = NeRFModelConfig(arch="active")
params_a = init_nerf_params(jax.random.key(0), mcfg_a)
ra = dict(n_sample=256, near=2.0, far=6.0, perturb=False)
cfg_af = NeRFPipelineConfig(model=mcfg_a,
                            render=RenderConfig(use_fused_kernel=True, **ra))
report("active flat FUSED 400^2x256", cfg_af, params_a)

# 3) hierarchical active (256 coarse + 128 importance), fused vs XLA
rh = dict(n_sample=256, n_importance=128, near=2.0, far=6.0, perturb=False)
cfg_hf = NeRFPipelineConfig(model=mcfg_a,
                            render=RenderConfig(use_fused_kernel=True, **rh))
cfg_hx = NeRFPipelineConfig(model=mcfg_a,
                            render=RenderConfig(use_fused_kernel=False, **rh))
params_h = {"coarse": init_nerf_params(jax.random.key(0), mcfg_a),
            "fine": init_nerf_params(jax.random.key(1), mcfg_a)}
t_hf = report("active hier FUSED 400^2x(256+128)", cfg_hf, params_h)
t_hx = report("active hier XLA   400^2x(256+128)", cfg_hx, params_h)
print(f"hier speedup: {t_hx / t_hf:.2f}x", flush=True)
ihf = np.asarray(make_render_image(cfg_hf)(params_h, K, pose, H, W))
ihx = np.asarray(make_render_image(cfg_hx)(params_h, K, pose, H, W))
mse = float(np.mean((ihf - ihx) ** 2))
print(f"hier fused-vs-XLA PSNR {-10 * np.log10(max(mse, 1e-12)):.1f} dB",
      flush=True)

# 4) aux maps fused vs XLA (flat active)
raux_f = make_render_image_aux(cfg_af)
raux_x = make_render_image_aux(
    NeRFPipelineConfig(model=mcfg_a,
                       render=RenderConfig(use_fused_kernel=False, **ra)))
dtf, _ = timeit(lambda *a: raux_f(*a)[0], params_a, K, pose, H, W)
dtx, _ = timeit(lambda *a: raux_x(*a)[0], params_a, K, pose, H, W)
print(f"aux maps FUSED {dtf*1000:.0f} ms vs XLA {dtx*1000:.0f} ms "
      f"({dtx/dtf:.2f}x)", flush=True)
of = raux_f(params_a, K, pose, H, W)
ox = raux_x(params_a, K, pose, H, W)
for name, a, b in zip(("rgb", "depth", "disp", "acc"), of, ox):
    err = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
    print(f"aux {name} max abs diff {err:.2e}", flush=True)
print("DONE", flush=True)
