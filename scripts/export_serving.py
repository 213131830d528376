"""Export an AOT serving artifact for the streaming SR step.

Usage:
    python scripts/export_serving.py --ckpt G_iterN.npz --out model.tecosrv \
        --height 134 --width 320 --frames 64 [--streams 1] [--chunk 16] \
        [--scale 4] [--degradation BD] [--nf 64] [--nb 10] \
        [--platforms tpu]

The artifact embeds the generator weights by default (a self-contained
serving bundle; `--no_embed_params` to opt out) and is served either by
the bundled host CLI:

    python -m tecogan_tpu.serve model.tecosrv lr_dir out_dir

or programmatically:

    from tecogan_tpu.serving import load_artifact
    run, meta, params = load_artifact("model.tecosrv")
    sr = run(params, lr_batch)        # uint8 (n, t, s*h, s*w, 3)

`--platforms tpu` exports from a CPU box for TPU serving hosts (and vice
versa); default is the current backend.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="generator checkpoint (.npz) — fixes the param "
                         "tree structure/dtypes baked into the artifact")
    ap.add_argument("--out", required=True)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--frames", type=int, required=True)
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--degradation", default="BD", choices=["BD", "BI"])
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--nb", type=int, default=10)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="target platform(s), e.g. tpu; default: current "
                         "backend")
    ap.add_argument("--no_embed_params", action="store_true",
                    help="ship a weights-free artifact (the serving host "
                         "must pass --ckpt / its own params)")
    args = ap.parse_args()

    from tecogan_tpu.models.networks import FRNetConfig
    from tecogan_tpu.serving import export_stream, save_artifact
    from tecogan_tpu.utils.ckpt import load_generator_params

    params = load_generator_params(args.ckpt, nb=args.nb, scale=args.scale)
    cfg = FRNetConfig(nf=args.nf, nb=args.nb, scale=args.scale,
                      degradation=args.degradation,
                      compute_dtype=args.compute_dtype)
    blob = export_stream(params, cfg, args.streams, args.frames,
                         args.height, args.width, chunk=args.chunk,
                         platforms=args.platforms)
    meta = {"n": args.streams, "t": args.frames, "h": args.height,
            "w": args.width, "scale": args.scale, "chunk": args.chunk,
            "degradation": args.degradation, "nf": args.nf, "nb": args.nb,
            "compute_dtype": args.compute_dtype,
            "platforms": list(args.platforms or [])}
    save_artifact(args.out, blob, meta,
                  params=None if args.no_embed_params else params)
    print(f"exported {len(blob) / 1e6:.1f} MB artifact -> {args.out}")
    print(f"meta: {meta}")


if __name__ == "__main__":
    main()
