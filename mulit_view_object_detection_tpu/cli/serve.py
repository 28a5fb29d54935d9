"""Serve a trained multi-view detector over HTTP.

    python -m mulit_view_object_detection_tpu.cli.serve \\
        --weights ./logs/interior20xxxxxx/  --port 8080 \\
        --num-classes 23 --num-views 2 --image-size 640 --batch 4

The endpoint micro-batches concurrent POST /detect requests into one
fixed-size device batch (serve/batcher.py); see serve/http_server.py for
the wire protocol and `serve.detect_remote` for a client helper. The
reference has no serving path at all — its inference is a bare python
loop (model.py:2510-2545).
"""

from __future__ import annotations

import argparse


def build_config(args):
    from ..config import Config

    class ServeConfig(Config):
        NAME = "serve"
        NUM_CLASSES = args.num_classes
        NUM_VIEWS = args.num_views
        BACKBONE = args.backbone
        TOP_DOWN_PYRAMID_SIZE = args.pyramid_size
        IMAGE_MIN_DIM = args.image_size
        IMAGE_MAX_DIM = args.image_size
        GRID_REAS = args.grid_reas
        nvox = args.nvox
        nvox_z = args.nvox
        samples = args.samples
        COMPUTE_DTYPE = "bfloat16"
        FOLD_BN = True               # serving mode: BNs folded into convs
        # must match the checkpoint's backbone: interior checkpoints use
        # the multi-view fork's 5-block stage 4 (model_multi.py:596);
        # a mismatch fails Orbax restore on the param-tree structure
        RESNET50_STAGE4_BLOCKS = args.stage4_blocks

    ServeConfig.IMAGES_PER_GPU = args.batch
    return ServeConfig()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", required=True,
                        help="Orbax checkpoint dir or keras .h5 file")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--batch", type=int, default=4,
                        help="dispatch batch size (one compiled shape)")
    parser.add_argument("--max-delay-ms", type=float, default=10.0)
    parser.add_argument("--num-classes", type=int, default=23)
    parser.add_argument("--num-views", type=int, default=2)
    parser.add_argument("--image-size", type=int, default=640)
    parser.add_argument("--backbone", default="resnet50")
    parser.add_argument("--pyramid-size", type=int, default=64)
    parser.add_argument("--grid-reas", default="conv3d")
    parser.add_argument("--nvox", type=int, default=40)
    parser.add_argument("--samples", type=int, default=20)
    parser.add_argument("--stage4-blocks", type=int, default=5,
                        help="resnet50 stage-4 block count; 5 = the "
                             "multi-view fork (interior checkpoints), "
                             "3 = the single-view reference backbone")
    args = parser.parse_args(argv)

    from ..compat.model import MaskRCNN
    from ..serve import serve_forever

    cfg = build_config(args)
    engine = MaskRCNN("inference", cfg, "/tmp/serve_logs")
    engine.load_weights(args.weights)
    print(f"serving on :{args.port} (batch={args.batch}, "
          f"{args.image_size}^2 x {args.num_views} views)", flush=True)
    serve_forever(engine, args.port, batch_size=args.batch,
                  max_delay_ms=args.max_delay_ms)


if __name__ == "__main__":
    main()
