"""Typed configuration for the whole framework.

The reference scatters configuration over two argparse CLIs
(Phase2/train.py:792-816, Phase2/Wrapper.py:538-554) and hardcoded paths
(Phase1/Wrapper.py:627-636).  Here every knob lives in one frozen dataclass
tree; the CLI shims in Phase1/ and Phase2/ map the reference's flag names onto
these fields 1:1 so the reference CLIs keep working.
"""

from __future__ import annotations

import dataclasses



@dataclasses.dataclass(frozen=True)
class NeRFModelConfig:
    """Architecture of the NeRF MLP.

    ``arch='active'`` mirrors the reference's live class
    (Phase2/NeRFModel.py:101-202): 1+4 layers, skip after the 4th, 3 more
    layers, softplus density head, feature layer, 2-layer RGB head.

    ``arch='legacy'`` mirrors the commented-out Sequential variant
    (Phase2/NeRFModel.py:7-99) whose state dict all shipped checkpoints
    serialize: fc1, block1 (``n_block1_layers`` Linears), optional skip layer,
    block2 ending in a 257-wide ReLU layer whose channel 0 is the density
    (post-ReLU, no softplus), and the same RGB head.
    """

    n_pos_freq: int = 10          # --n_pos_freq  (L for position PE)
    n_dir_freq: int = 4           # --n_dirc_freq (L for direction PE)
    hidden: int = 256             # --hidden_size
    pos_encoding: bool = True     # pos_encoding ablation switch
    arch: str = "active"          # 'active' | 'legacy'
    # legacy-arch structure knobs (to ingest every shipped .pth layout):
    n_block1_layers: int = 3
    has_skip: bool = True
    # ADDITION (no reference counterpart; the reference never trains a
    # sparse scene): initial bias of the density head.  0.0 keeps the
    # reference init.  On mostly-empty scenes (a dark single object on a
    # black background — chair800) the default init collapses: ~87% of
    # rays want zero density, the first ~100 steps push every density
    # pre-activation far negative, and the softplus gradient (~e^x)
    # asymptotically dies before the object can form — measured: 20k
    # steps stuck at the near-all-black plateau, rendered views exactly
    # black.  A positive bias starts the field as thin fog everywhere so
    # every ray carries gradient until geometry carves it away.  Init-
    # level only: both the XLA and fused-Pallas paths get it for free.
    density_bias_init: float = 0.0

    @property
    def pos_dim(self) -> int:
        return 3 * (2 * self.n_pos_freq + 1) if self.pos_encoding else 3

    @property
    def dir_dim(self) -> int:
        return 3 * (2 * self.n_dir_freq + 1) if self.pos_encoding else 3


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Sampling + volume-rendering behaviour.

    ``variant='train'`` is the reference's live renderer
    (Phase2/train.py:187-271): linspace-in-[0,1] stratified bins,
    dists = diff(z) with 1e-3 appended, exclusive transmittance
    ``T[:,1:] = cumprod(1-a+1e-10)[:, :-1]``.

    ``variant='legacy'`` is the gif renderer (Phase2/Wrapper.py:129-186):
    per-bin jitter ``t = near+(far-near)(i+u)/n``, dists appended with 1.0,
    and NON-shifted (inclusive) transmittance ``w = a*cumprod(1-a+1e-10)``.
    """

    n_sample: int = 256           # --n_sample
    n_importance: int = 0         # fine-pass importance samples (0 = off;
                                  # the reference has no hierarchical path)
    near: float = 2.0             # --near  (legacy default: 1.0)
    far: float = 6.0              # --far   (legacy default: 10.0)
    perturb: bool = True          # --perturb
    # sample linearly in INVERSE depth (vanilla NeRF's real-scene option;
    # the reference has no analog — its Blender scenes sit in a 2..6 shell).
    # Essential for SfM->NeRF bridge scenes whose triangulated depth spans
    # decades (bundled data: near 0.21 / far 57.7); uniform-in-z would
    # spend ~99% of samples past the visible structure.  Requires near > 0.
    lindisp: bool = False
    chunk_size: int = 32768       # --chunk_size (grid/tile size on TPU)
    variant: str = "train"        # 'train' | 'legacy'
    white_background: bool = False
    # fused Pallas render kernel for full-frame renders (active arch,
    # any n_sample via exact no-op sample padding; 1.36x+ the XLA path on v5e)
    use_fused_kernel: bool = False
    # training fast path: merged fwd+bwd step kernel (one launch, no
    # backward recompute — the MSE cotangent is computed in-kernel).
    # False falls back to the two-kernel custom-VJP path.
    fused_merged_step: bool = True
    fused_ray_tile: int = 4        # rays per subtile (VMEM-bound: ~2.8 MB
                                   # of stored activations per ray @256x256)
    fused_sample_chunk: int = 128  # samples per matmul block; the merged
                                   # kernel stores ALL chunks' activations
                                   # anyway, so bigger chunks cost no extra
                                   # VMEM and make every dot taller
    fused_tiles_per_program: int = 32
    fused_vmem_mb: int = 100       # Mosaic vmem_limit_bytes for the kernel
    # run the fused kernels in Pallas INTERPRET mode (pure-XLA emulation):
    # lets the 8-virtual-CPU test mesh execute the EXACT fused code paths
    # (shard_map composition, custom VJPs, envelope routing) without TPU
    # hardware — the multi-device fused tests and dryrun_multichip set it.
    # Interpret mode also lifts the 128-lane sample_chunk alignment, so
    # tiny test shapes run unpadded.  Never set in production configs.
    fused_interpret: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (Phase2/train.py:401-404 + CLI defaults)."""

    lrate: float = 5e-4           # --lrate
    lrate_decay: float = 0.1      # --lrate_decay  (StepLR gamma)
    lrate_decay_steps: int = 50000  # --lrate_decay_steps
    n_rays_batch: int = 8192      # --n_rays_batch (32*32*8)
    max_iters: int = 200001       # --max_iters
    save_ckpt_iter: int = 1000    # --save_ckpt_iter
    log_every: int = 100          # TB scalar cadence (train.py:474)
    val_every: int = 1000         # validation render cadence (train.py:483)
    n_val_images: int = 5
    seed: int = 0
    # TPU execution shape: train steps fused into one device call via
    # lax.scan — amortizes host dispatch and lets XLA pipeline steps.
    steps_per_call: int = 1
    # checkpointing backend: 'npz' (one transparent file per step) or
    # 'orbax' (async saves that overlap training; multi-host coordinated)
    ckpt_backend: str = "npz"
    # numerics
    compute_dtype: str = "float32"   # 'float32' | 'bfloat16' for activations
    debug_nans: bool = False         # analog of torch detect_anomaly (train.py:390)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout.  The reference is single-device (SURVEY §2.3)."""

    data_axis: str = "data"       # rays sharded here; grads psum over it
    model_axis: str = "model"     # MLP hidden channels sharded here (tp)
    dp: int = 0                   # 0 -> use all devices on the data axis
    tp: int = 1


@dataclasses.dataclass(frozen=True)
class NeRFPipelineConfig:
    model: NeRFModelConfig = NeRFModelConfig()
    render: RenderConfig = RenderConfig()
    train: TrainConfig = TrainConfig()
    parallel: ParallelConfig = ParallelConfig()
    # IO (reference flag names)
    data_path: str = "./Phase2/nerf_synthetic/lego/"
    mode: str = "train"
    logs_path: str = "./logs/"
    log_id: str = ""
    exp_name: str = "lego_experiment"
    checkpoint_path: str = "./Phase2/checkpoints_new_2/"
    load_checkpoint: bool = True
    images_path: str = "./image/"


@dataclasses.dataclass(frozen=True)
class SfMConfig:
    """Phase1 pipeline knobs (reference values hardcoded in-code)."""

    data_path: str = "Phase1/Data"
    num_images: int = 5
    # F-RANSAC (Phase1/Fundamental.py:60)
    ransac_iters: int = 50000
    ransac_threshold: float = 5e-4   # Sampson distance in normalized coords
    normalize: bool = True
    # hypothesis ranking: 'msac' (truncated-loss sum; platform-stable
    # winner) or 'count' (the reference's raw inlier count — near-tied
    # hypotheses make the winner flip under one ulp of rounding; see
    # ops/epipolar.py:_ransac_score).  Applies to F-RANSAC and PnP RANSAC.
    ransac_scoring: str = "msac"
    # >1: shard the hypothesis axis over that many devices
    # (parallel/ransac.py; bit-equal to single-device for the same key
    # WHEN the device count divides ceil(n_iters/chunk) — otherwise the
    # chunk count rounds up and extra hypotheses are drawn)
    ransac_devices: int = 1
    # > 0: adaptive early termination (H&Z Alg. 4.5) for F-RANSAC and PnP
    # RANSAC at this confidence — ransac_iters/pnp_iters become CAPS, and
    # at the bundled data's inlier ratios ~25x fewer hypotheses are
    # scored.  0 (default) keeps the reference's fixed iteration counts.
    # Mutually exclusive with ransac_devices > 1.
    ransac_confidence: float = 0.0
    # adaptive driver: None auto-selects — host chunk loop on CPU (one
    # launch per chunk, cheap locally), device lax.while_loop on any
    # accelerator (one launch total; the tunneled TPU pays RTT per launch,
    # which erased adaptivity's ~25x saving with the host loop).  Same
    # winners either way (pinned by test).
    ransac_adaptive_device: "bool | None" = None
    # batch every pair's F-RANSAC into ONE device launch per shape bucket
    # (ops/epipolar.py:ransac_fundamental_pairs_bucketed; bit-equal per
    # pair to the sequential loop for the same key stream).  The per-pair
    # host loop pays one relay round-trip per pair — on the tunneled TPU
    # that RTT dominates the refine stage.  Composes with adaptive
    # confidence (stage-level exit on the slowest pair); mutually
    # exclusive with ransac_devices > 1 (hypothesis sharding stays
    # per-pair).
    ransac_batch_pairs: bool = True
    # PnP RANSAC (Phase1/PnP.py:160)
    pnp_iters: int = 10000
    pnp_threshold: float = 10.0      # squared px reprojection error
    # ADDITION: when the device PnP RANSAC fails its inlier gate on an
    # f32 accelerator run, retry the camera with the pure-numpy float64
    # host solver (ops/pnp.py:pnp_ransac_f64_host) before skipping it.
    # The measured f32 consensus collapse costs 2/200 and 8/500 cameras
    # at scale (PERFORMANCE.md round-5 tables); the rescue is per-failed-
    # camera host work (~1-2 s).  'auto' activates it only when the
    # process is NOT already running x64 (CPU-f64 runs keep reference-
    # parity behavior unchanged); 'on'/'off' force it.
    pnp_f64_rescue: str = "auto"
    # two-view pose recovery (reference quirks available as switches)
    essential_cleanup: bool = True     # project E singulars to (1,1,0)
    center_convention: str = "hz"      # 'hz' (correct) | 'reference' (quirk)
    # E estimation: 'from_f' conjugates the 8-point F (reference behavior);
    # '5pt' runs the Stewenius minimal solver directly (ops/essential5.py)
    essential_method: str = "from_f"
    e5_ransac_iters: int = 1000
    e5_threshold_px: float = 1.0
    # nonlinear refinement
    two_view_refine_pose: bool = True  # joint pose+points BA after two-view
    tri_refine_iters: int = 20       # LM steps for per-point triangulation
    # ADDITION: incremental (re-)triangulations only enter the map when
    # the refined point reprojects within this many px in BOTH source
    # views (0 = off).  A diverged refinement reprojects 12-95 px in its
    # own views while healthy points stay < ~3 px even under drifted
    # poses (triangulation minimizes exactly these residuals) — without
    # the gate such points pollute every later camera's PnP set.  The
    # reference-parity two-view path is NOT gated.
    tri_reproj_gate_px: float = 10.0
    # ADDITION: when the single registration sweep ends with skipped
    # images, re-attempt them in up to this many extra passes (after an
    # intermediate BA when ba_interval > 0).  A PnP failure at chain
    # depth 100+ is usually drift at that MOMENT, not a property of the
    # image — by the time the sweep finishes, more neighbors are
    # registered and the map has been re-adjusted.  A pass that registers
    # nothing ends the retries early; 0 restores the reference's strict
    # single-visit order (Wrapper.py:679).
    registration_retries: int = 2
    pnp_refine_iters: int = 50       # LM steps for pose refinement
    ba_max_iters: int = 50           # LM steps for bundle adjustment
    ba_rounds: int = 2               # BA / outlier-prune alternations
    ba_prune_px: float = 3.0         # drop observations above this reproj err
    ba_loss: str = "linear"          # 'linear' (reference parity) | 'huber'
    ba_huber_delta: float = 3.0      # px; robust-loss transition
    # ADDITION (no reference counterpart): run a light global BA after
    # every `ba_interval` camera registrations (0 = off).  Incremental
    # chaining compounds pose error camera-by-camera; at reference scale
    # (5 cams) the final BA absorbs it, but at 100+ cameras the drifted
    # initial geometry (measured: 24.7 px RMS at 200 cams) strands the
    # final BA in a poor basin.  Shapes are pow2-bucketed (cams AND
    # points) so a growing reconstruction reuses O(log) compiled programs.
    ba_interval: int = 0
    ba_interval_iters: int = 10      # LM steps per intermediate BA
    # >1: shard the POINT axis of global BA over that many devices
    # (parallel/ba.py: point blocks device-local, camera system psummed;
    # matches single-device results to reduction-order rounding)
    ba_devices: int = 1
    # ADDITION (reference treats K as fixed): comma-set of
    # {f, fx, fy, pp, cx, cy, k1, k2} — free the shared intrinsics
    # (focals, principal point, radial distortion) as one extra global
    # block in the global BA's Schur system ('' = off).  Refined values
    # are printed and recorded in stats['ba']['intrinsics'].
    ba_refine_intrinsics: str = ""
    # global rotation averaging before BA (ADDITION: re-initializes all
    # camera rotations jointly from pairwise essentials; the reference's
    # incremental chaining compounds error camera-by-camera)
    global_rotation_init: bool = False
    # full global-SfM initialization: rotation averaging + translation
    # averaging (pairwise baseline directions -> joint camera centers) ->
    # re-triangulation -> BA.  Implies global_rotation_init.
    global_init: bool = False
    # pair-axis chunk for the pose-graph build (ops.relative_pose_pairs):
    # one batched dispatch per chunk instead of ~6 eager dispatches per
    # pair (round 5: the per-pair loop was 1,270 s of the 200-camera TPU
    # pipeline — relay RTT x 1,373 pairs).  0 restores the per-pair loop.
    global_init_batch_pairs: int = 256
    # keyframe / view selection (ADDITION; the reference hardcodes the
    # initial pair to (1,2) and registers strictly by image index,
    # Phase1/Wrapper.py:666,679):
    #   init_pair='auto'    scores candidate pairs by inlier support x
    #                       median triangulation parallax and initializes
    #                       from the best-conditioned one;
    #   view_order='greedy' registers the unmapped image with the most
    #                       2D-3D correspondences next (next-best-view),
    #                       retrying images that index order would skip.
    init_pair: str = "fixed"         # 'fixed' (reference) | 'auto'
    view_order: str = "index"        # 'index' (reference) | 'greedy'
    min_parallax_deg: float = 1.0    # init-pair gate: median ray parallax
    # track merging across matching files (ADDITION: the reference's
    # per-file feature namespace never reconciles re-detections)
    merge_tracks: bool = False
    merge_tol: float = 0.5           # px; detector re-runs emit identical
    # point-axis pow2-bucket floor (utils/buckets.py): -1 auto-selects
    # 4096 on any accelerator backend and leaves the CPU at the per-op
    # default 64; 0 forces the per-op default everywhere; >0 is explicit.
    # On a relay-attached chip every distinct executable pays a one-time
    # per-process load, so merging the 512..4096 point buckets into one
    # cuts the new-process launch count ~3x per op at negligible padded
    # compute; winners/results are bucket-invariant (n_valid is data).
    bucket_floor: int = -1
    seed: int = 0
    output_dir: str = "."
    show: bool = False               # headless by default (no cv2.imshow)

    def __post_init__(self):
        # fail at CONFIG time, not minutes later inside the first bucketed
        # RANSAC call (ops/epipolar.py re-checks as a backstop)
        if self.ransac_confidence > 0.0 and self.ransac_devices > 1:
            raise ValueError(
                "adaptive RANSAC (ransac_confidence > 0) and hypothesis "
                "sharding (ransac_devices > 1) are mutually exclusive — "
                "drop --ransac_devices or --ransac_confidence"
            )
        if self.ba_refine_intrinsics:
            # validate the token set now, not at the global-BA stage after
            # the whole reconstruction has run (lazy import: ops pulls jax)
            from sfm_nerf_tpu.ops.ba import intrinsics_free_mask

            intrinsics_free_mask(self.ba_refine_intrinsics)
