"""Configuration schema for the TPU-native multi-view Mask R-CNN framework.

Mirrors the subclass-and-override API of the reference Config
(/root/reference/mrcnn/config.py:17-236) while fixing its latent trap of
ad-hoc multi-view attributes added without base-class defaults
(reference interior_multi.py:379-393): every multi-view key is a first-class,
validated attribute here.

All values that shape compiled programs (shapes, counts, modes) are static
Python values; jitted functions close over them so XLA sees static shapes.
"""

from __future__ import annotations

import numpy as np

_VALID_BACKBONES = ("resnet50", "resnet101")
_VALID_FUSIONS = ("add", "mean", "ident", "conv3d", "lstm3d", "transformer")
_VALID_RESIZE_MODES = ("none", "square", "pad64", "crop")


class Config:
    """Base configuration. Subclass and override, then instantiate.

    Computed attributes (BATCH_SIZE, IMAGE_SHAPE, IMAGE_META_SIZE) are set in
    __init__ as in the reference (config.py:213-228).
    """

    NAME = None

    # Device / batch geometry. GPU_COUNT is kept for API parity with the
    # reference (config.py:28); on TPU it means "number of data-parallel
    # replicas" and feeds BATCH_SIZE the same way.
    GPU_COUNT = 1
    IMAGES_PER_GPU = 1

    STEPS_PER_EPOCH = 1000
    VALIDATION_STEPS = 50

    # Backbone
    BACKBONE = "resnet101"
    BACKBONE_STRIDES = [4, 8, 16, 32, 64]
    FPN_CLASSIF_FC_LAYERS_SIZE = 1024
    TOP_DOWN_PYRAMID_SIZE = 256

    NUM_CLASSES = 1  # incl. background; override

    # Anchors
    RPN_ANCHOR_SCALES = (32, 64, 128, 256, 512)
    RPN_ANCHOR_RATIOS = [0.5, 1, 2]
    RPN_ANCHOR_STRIDE = 1
    RPN_NMS_THRESHOLD = 0.7
    RPN_TRAIN_ANCHORS_PER_IMAGE = 256

    PRE_NMS_LIMIT = 6000
    POST_NMS_ROIS_TRAINING = 2000
    POST_NMS_ROIS_INFERENCE = 1000

    USE_MINI_MASK = True
    MINI_MASK_SHAPE = (56, 56)

    # Image molding (host side)
    IMAGE_RESIZE_MODE = "square"
    IMAGE_MIN_DIM = 800
    IMAGE_MAX_DIM = 1024
    IMAGE_MIN_SCALE = 0
    IMAGE_CHANNEL_COUNT = 3
    MEAN_PIXEL = np.array([123.7, 116.8, 103.9])

    # ROI heads
    TRAIN_ROIS_PER_IMAGE = 200
    ROI_POSITIVE_RATIO = 0.33
    POOL_SIZE = 7
    MASK_POOL_SIZE = 14
    MASK_SHAPE = [28, 28]
    MAX_GT_INSTANCES = 100

    RPN_BBOX_STD_DEV = np.array([0.1, 0.1, 0.2, 0.2])
    BBOX_STD_DEV = np.array([0.1, 0.1, 0.2, 0.2])

    DETECTION_MAX_INSTANCES = 100
    DETECTION_MIN_CONFIDENCE = 0.7
    DETECTION_NMS_THRESHOLD = 0.3

    # Optimization
    LEARNING_RATE = 0.001
    LEARNING_MOMENTUM = 0.9
    WEIGHT_DECAY = 0.0001
    LOSS_WEIGHTS = {
        "rpn_class_loss": 1.0,
        "rpn_bbox_loss": 1.0,
        "mrcnn_class_loss": 1.0,
        "mrcnn_bbox_loss": 1.0,
        "mrcnn_mask_loss": 1.0,
    }
    USE_RPN_ROIS = True
    TRAIN_BN = False
    GRADIENT_CLIP_NORM = 5.0
    # Serving-time BatchNorm folding: with frozen BNs (TRAIN_BN=False,
    # inference) bake gamma/sqrt(var+eps) into the preceding conv's
    # kernel/bias (utils/bn_fold.py) and run BNs as pre-folded affines.
    # Removes the per-BN rsqrt/mul chains from the compiled graph
    # (~1.5 ms/frame on the flagship trace). Training is unaffected —
    # the fold only applies to training=False applies.
    FOLD_BN = False

    # Serving-time lowering of the U-Net's Conv3DTranspose up-convs as 8
    # output-parity phase convs + depth-to-space interleave
    # (models/fusion.py::PhaseConvTranspose3D). The lhs-dilated lowering
    # multiplies ~3.4x mostly-zero taps; the phase form computes only the
    # true FLOPs. Identical parameters, same math up to summation order
    # (exactness: tests/test_phase_deconv.py). Inference-only; training
    # always uses nn.ConvTranspose.
    PHASE_DECONV = False

    # Serving-time z-major lowering of the conv3d U-Net's 3D convs
    # (models/fusion.py::ZfoldConv3D / ZfoldPhaseConvTranspose3D): the
    # kernel's z taps fold into input channels and Z folds into batch,
    # so every U-Net conv runs through XLA:TPU's strong 2D emitters
    # instead of the weak 3D path (round-4 trace: the U-Net was 2.8 ms
    # of the 7.2 ms flagship frame; probe_zfold.py measured down1
    # 0.369 -> 0.111 ms, up1 0.081 -> 0.016 ms standalone). Identical
    # parameters, same math up to summation order (exactness:
    # tests/test_zfold_fusion.py). Inference-only; training always uses
    # the standard convs. Supersedes PHASE_DECONV for the U-Net when on
    # (the z-fold up-convs are already phase-decomposed).
    # Measured in-graph on v5e (flagship 2-view 640^2, same-session
    # pairs): batch 1 149.2 -> 194.3 fps (+30%, ~88% of the HBM byte
    # floor); batch 4 183.9 -> 174.3 (NEGATIVE: the z-slab concats add
    # ~1.5x the U-Net input bytes, which amortizing batch no longer
    # repays). Serve with it at batch <= 2; bench.py/profile_variants
    # default it batch-aware.
    ZFOLD_FUSION = False

    # Same lowering for the mask head's 2x2/2 deconv
    # (models/heads.py::_PhaseDeconv2x2 — with k == s it is a pure 1x1
    # conv + depth-to-space). Measured NEGATIVE on v5e at the flagship
    # shapes (133.7 vs 147.3 fps b1: the interleave relayout on
    # [100,14,14,2,2,256] costs more than the dilated conv saves at
    # N=100 ROIs), so it is a separate, default-off switch.
    PHASE_DECONV_MASK = False

    # Serving-time hoisted ConvLSTM input conv (models/fusion.py::
    # ConvLSTM3D.hoist_input): the fused gate conv is linear in the
    # channel concat — conv([x,h], W) == conv(x, Wx) + conv(h, Wh) — so
    # the x-side gates of ALL views run as ONE [B*V]-batched conv
    # outside the lax.scan and only the h-side recurrence stays
    # sequential (the standard cuDNN RNN decomposition; halves the
    # per-view sequential conv channels). Identical parameters, same
    # math up to summation order
    # (tests/test_nn_modules.py::test_convlstm_hoist_matches_scan).
    # Measured NEGATIVE on v5e at the flagship lstm3d shape (21.1 vs
    # 18.5 ms/frame, lstm3d4): the 40^3-voxel gate convs already
    # saturate the MXU (the decomposition cuts sequential latency, not
    # FLOPs) and the hoisted [B*V, 40^3, 4F] gate tensor round-trips
    # HBM instead of fusing the gate math into the conv epilogue. Kept
    # default-off for small-grid / short-latency deployments where the
    # batching win dominates. Inference-only; training always scans the
    # fused-gate cell (recurrent.py:443-478 semantics).
    LSTM_HOIST_INPUT = False

    # Serving-time space-to-depth stem (models/resnet.py::_S2DStemConv):
    # the 7x7/2 C_in=3 stem conv re-expressed as a 4x4/1 C_in=12 conv on
    # 2x2-phase-blocked input — identical parameters and output, 4x the
    # MXU input-lane utilization (tests/test_stem_s2d.py). Inference-only.
    STEM_S2D = False

    # Serving-time cross-level fusion: run the per-level conv3d/ident
    # GridFusions of all active pyramid levels as ONE set of grouped convs
    # (feature_group_count = #levels) over the channel-concatenated voxel
    # grids — the levels share the [nvox, nvox, nvox_z] grid shape, so the
    # per-level U-Net dispatches collapse into single larger ops
    # (models/fusion.py::GroupedGridFusion). Inference-only; requires
    # BN-folded weights (utils/bn_fold.py::group_fusion_variables builds
    # the grouped tree from the trained per-level weights). Training and
    # checkpoints always use the per-level form.
    CROSS_LEVEL_FUSION = False

    # ------------------------------------------------------------------
    # Multi-view keys — first-class here, ad hoc in the reference
    # (interior_multi.py:379-393, interior_transformer.py:386-407).
    # ------------------------------------------------------------------
    NUM_VIEWS = 1            # V; 1 == single-view Mask R-CNN
    GRID_REAS = "conv3d"     # fusion mode: add|mean|ident|conv3d|lstm3d|transformer
    VANILLA = False          # reference semantics are inverted (model_multi.py:2406-2422):
                             # False -> projected multi-view path with PG2/PG3 zeroed,
                             # True  -> bypass projection, use main-view features.
    ZERO_PG_LEVELS = (0, 1)  # pyramid levels (0=P2) zeroed in multi-view
                             # modes — the reference's memory cap
                             # (model_multi.py:2406-2422). NOTE: the FPN
                             # level-assignment routes ROIs smaller than
                             # ~224px*(image/1024) to P2/P3, so with the
                             # faithful default those heads see zeros; set
                             # () to project every level (costs memory at
                             # high resolution).
    TRANSFORMER = False      # transformer view fusion on P5 (model_transformer.py:2419-2438)

    # Voxel grid (model_multi.py:157-169)
    nvox = 40                # grid cells in x and y
    nvox_z = 40              # grid cells in z
    vmin = -2.5              # x,y extent [vmin, vmax] in meters
    vmax = 2.5
    vmin_z = 1.0             # z (depth) extent
    vmax_z = 10.0
    samples = 20             # depth samples per ray in reprojection
    GRID_DIST = 6.0          # camera-anchored grid distance — consumed by
                             # ops.projection.camera_anchored_grid_points /
                             # examples/projection_playground.py
                             # --camera-anchored (Notebook/projection.py:
                             # 86-97; the reference's model files never
                             # read it either — sandbox-only knob)

    # Transformer fusion hyperparameters — hardcoded at the call site in the
    # reference (model_transformer.py:361); configurable here.
    XFORMER_NUM_LAYERS = 6
    XFORMER_D_MODEL = 72
    XFORMER_NUM_HEADS = 8
    XFORMER_DFF = 256
    XFORMER_TARGET_SIZE = 20   # tokens project to TARGET_SIZE^2 (=P5 grid)
    XFORMER_DROPOUT = 0.1
    XFORMER_KEEP_MAIN_LEVELS = False  # reference zeroes P2/P3/P4/P6 in the
                                      # transformer variant; True keeps the
                                      # main view's features there (opt-in
                                      # fix for small-object regimes)
    XFORMER_FAITHFUL_PAIRING = False  # parity-golden mode: reproduce the
                               # reference unproj_vector's feature-scale
                               # ray vectors and transposed ray/feature
                               # pairing plus the transposed output
                               # unflattening (model_transformer.py:
                               # 355-364, 396-407 — two real bugs, see
                               # ops/projection.py::unproject_rays).
                               # Default False = correct pinhole geometry
                               # with each token paired to its own ray.
    XFORMER_ZERO_INIT = False  # zero-init the fusion's final token
                               # projection so the residual branch starts
                               # silent (ReZero-style). Needed to train the
                               # faithful P5-only protocol FROM SCRATCH: the
                               # post-LN encoder emits unit-scale tokens
                               # that drown an untrained main P5 (see
                               # models/transformer.py). The reference
                               # avoids this only by fine-tuning from COCO
                               # weights. Default False = faithful init.

    # ------------------------------------------------------------------
    # TPU-native knobs (no reference analog)
    # ------------------------------------------------------------------
    COMPUTE_DTYPE = "float32"   # "bfloat16" for MXU-friendly inference/training
    REMAT = False               # rematerialize backbone blocks + voxel fusion
                                # in the backward pass. Measured NEUTRAL at the
                                # reference config (19.5 vs 19.8 steps/s —
                                # BENCH_NOTES): XLA already schedules near the
                                # HBM floor there. Enable for memory-constrained
                                # configs (V=4, bigger grids/batches) where the
                                # activation footprint, not step time, binds.
    UINT8_IMAGE_TRANSFER = False  # ship batch["images"] host->device as raw
                                # resized uint8 and mold (mean-subtract +
                                # cast) ON DEVICE. 4x fewer bytes over
                                # PCIe/the tunnel per step; bit-identical to
                                # host-side molding because resize_image
                                # returns uint8 either way (molding.py:98).
    CLIP_PROJECTION = False     # True: mask out-of-frustum voxels (the reference
                                # has no OOB handling - a latent bug, see
                                # model_multi.py:192-220); False keeps reference
                                # semantics via index clamping.
    TRILINEAR_REPROJECTION = False  # reference uses nearest (model_multi.py:357-369)
    EXPOSE_FUSED_PYRAMID = False  # True: run_graph/ancestor also return the
                                # post-fusion PG2..PG5 maps (debug/parity
                                # bisection; ~35 MB extra HBM output
                                # buffers per 640^2 image when on)
    USE_PALLAS = True           # use Pallas kernels where available (TPU only)
    MESH_DATA_AXIS = "data"     # device mesh axis names
    MESH_VIEW_AXIS = "view"
    VIEW_SHARDING = False       # shard the view axis across MESH_VIEW_AXIS

    def __init__(self):
        self.BATCH_SIZE = self.IMAGES_PER_GPU * self.GPU_COUNT
        if self.IMAGE_RESIZE_MODE == "crop":
            self.IMAGE_SHAPE = np.array(
                [self.IMAGE_MIN_DIM, self.IMAGE_MIN_DIM, self.IMAGE_CHANNEL_COUNT])
        else:
            self.IMAGE_SHAPE = np.array(
                [self.IMAGE_MAX_DIM, self.IMAGE_MAX_DIM, self.IMAGE_CHANNEL_COUNT])
        # image meta: id(1) + original_shape(3) + image_shape(3) + window(4)
        # + scale(1) + active class ids(NUM_CLASSES)
        self.IMAGE_META_SIZE = 1 + 3 + 3 + 4 + 1 + self.NUM_CLASSES
        # voxel sizes (reference computes these in the CLI config,
        # interior_multi.py:388-389)
        self.vsize = float(self.vmax - self.vmin) / self.nvox
        self.vsize_z = float(self.vmax_z - self.vmin_z) / self.nvox_z
        self.validate()

    # Identity hash/eq so a Config can be carried as static metadata on Flax
    # modules (numpy-array attributes make value-equality ill-defined).
    __hash__ = object.__hash__
    __eq__ = object.__eq__

    def validate(self):
        assert self.BACKBONE in _VALID_BACKBONES or callable(self.BACKBONE), \
            f"BACKBONE must be one of {_VALID_BACKBONES}"
        assert self.GRID_REAS in _VALID_FUSIONS, \
            f"GRID_REAS must be one of {_VALID_FUSIONS}"
        assert self.IMAGE_RESIZE_MODE in _VALID_RESIZE_MODES
        assert self.NUM_VIEWS >= 1
        assert self.NUM_CLASSES >= 1
        assert self.vmax > self.vmin and self.vmax_z > self.vmin_z
        assert self.nvox >= 1 and self.nvox_z >= 1 and self.samples >= 1
        assert self.ROI_POSITIVE_RATIO > 0
        if self.IMAGE_RESIZE_MODE in ("square",):
            # FPN needs /64 divisibility (model_multi.py:2327-2332)
            assert self.IMAGE_MAX_DIM % 64 == 0, \
                "IMAGE_MAX_DIM must be a multiple of 64"
        if self.TRANSFORMER:
            # The fused P5 tokens are added back onto the FPN P5 map, so
            # d_model must equal the pyramid width; the 3-axis sinusoidal
            # PE splits d_model in 3; attention splits it over heads.
            assert self.XFORMER_D_MODEL == self.TOP_DOWN_PYRAMID_SIZE, (
                f"TRANSFORMER fusion requires XFORMER_D_MODEL "
                f"({self.XFORMER_D_MODEL}) == TOP_DOWN_PYRAMID_SIZE "
                f"({self.TOP_DOWN_PYRAMID_SIZE}): the fused tokens are "
                f"added onto P5")
            assert self.XFORMER_D_MODEL % 3 == 0, (
                f"XFORMER_D_MODEL ({self.XFORMER_D_MODEL}) must be "
                f"divisible by 3 (three-axis positional encoding)")
            assert self.XFORMER_D_MODEL % self.XFORMER_NUM_HEADS == 0, (
                f"XFORMER_D_MODEL ({self.XFORMER_D_MODEL}) must be "
                f"divisible by XFORMER_NUM_HEADS ({self.XFORMER_NUM_HEADS})")
            # the depth-conditioned lift has exactly ONE measured depth
            # per ray (unproject_rays): samples > 1 would only duplicate
            # every token `samples` times, multiplying attention cost
            # with zero information gain. The reference's transformer
            # config runs samples=1 (interior_transformer.py:378-407).
            assert self.samples == 1, (
                f"TRANSFORMER fusion requires samples == 1 "
                f"(got {self.samples}): depth-conditioned tokens have "
                f"one depth per ray")

    def to_dict(self):
        return {
            a: getattr(self, a)
            for a in dir(self)
            if not a.startswith("__") and not callable(getattr(self, a))
        }

    def display(self):
        """Display configuration values (reference config.py:230-236)."""
        print("\nConfigurations:")
        for k, v in self.to_dict().items():
            print("{:30} {}".format(k, v))
        print("\n")
