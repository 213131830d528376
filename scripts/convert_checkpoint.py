"""Checkpoint conversion CLI: reference PyTorch .pth <-> native .npz.

  # import a reference generator checkpoint
  python scripts/convert_checkpoint.py --src G_iter400000.pth --dst G.npz \
      --kind frnet --nb 10 --scale 4
  # export a native checkpoint back to reference format
  python scripts/convert_checkpoint.py --src G.npz --dst G.pth --kind frnet
  # import a torchvision VGG19 for the perceptual loss
  python scripts/convert_checkpoint.py --src vgg19.pth --dst \
      pretrained_models/vgg19.npz --kind vgg19
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tecogan_tpu.models import convert  # noqa: E402
from tecogan_tpu.utils.ckpt import load_pytree, save_pytree  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--kind", default="frnet",
                   choices=["frnet", "stnet", "vgg19"])
    p.add_argument("--nb", type=int, default=10)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--spatial_size", type=int, default=128)
    args = p.parse_args()

    if args.src.endswith(".pth"):
        sd = convert.load_state_dict(args.src)
        if args.kind == "frnet":
            tree = convert.convert_frnet(sd, args.nb, args.scale)
        elif args.kind == "stnet":
            tree = convert.convert_stnet(sd, args.spatial_size)
        else:
            tree = convert.convert_vgg19(sd)
        save_pytree(tree, args.dst)
    else:
        assert args.kind == "frnet", "only frnet export is supported"
        import torch

        tree = load_pytree(args.src)
        sd = convert.export_frnet(tree, args.nb, args.scale)
        torch.save(sd, args.dst)
    print(f"{args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
